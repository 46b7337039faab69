"""Multimodal (image/audio/video) column support (SURVEY §2.2.10).

Design: media are opaque ``BinaryType`` payload columns travelling next
to a typed metadata struct — the layout every large-scale multimodal
corpus uses (payload bytes + {modality, mime, width/height/duration}).
Spark moves the bytes; only explicitly-invoked transforms look inside.

The decode stage is STUBBED: the real image/audio codecs (Pillow,
libav) are not in this environment, so ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (byte-histogram "pixels") exercises the full
Spark plumbing — schemas, Arrow batches, ``mapInPandas`` signatures,
partition shapes — with real data movement.  Swapping in a real codec
is a one-function change inside the pandas iterator.

Scale posture:
- payloads stay in the JVM/Arrow layer until a pandas batch needs them;
- ``mapInPandas`` streams Arrow batches, so executor memory is bounded
  by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x max payload, not
  by partition size;
- content-addressed ids (sha2 of payload) make downstream exact dedup a
  narrow groupBy, identical to text dedup (operators/dedup.py).

Reference parity note: the reference system (/root/reference/dpp.py) has
no binary/media handling; this is the "Multimodal columns" row of
SURVEY §2.2.10.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

__all__ = [
    "FEATURE_DIM",
    "decode_media",
    "media_features",
    "media_fingerprint",
    "pack_media",
    "resize_media",
    "sample_frames",
]

FEATURE_DIM = 16


def pack_media(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    *,
    modality: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Normalize a raw binary column into the engine's media layout:
    (media_id, payload BINARY, meta STRUCT<modality, mime, n_bytes,
    content_sha> ).

    ``content_sha`` is the content address — sha2-256 of the payload —
    computed JVM-side so exact dedup / integrity checks never deserialize
    the payload into Python.
    """
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("content_sha"),
        ).alias("meta"),
    )


def media_fingerprint(media: DataFrame) -> DataFrame:
    """(media_id, n_bytes, content_sha) — integrity projection.

    Pure column pruning: at 100 TB the parquet reader materializes only
    the meta struct fields, never the payload bytes.
    """
    return media.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_sha").alias("content_sha"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: 16-bin byte histogram,
    normalized to frequencies.  Same output on every engine/platform."""
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    n = max(len(payload), 1)
    return [c / n for c in counts]


def decode_media(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode payloads to fixed-dim feature vectors:
    (media_id, features ARRAY<DOUBLE>).

    Runs as ``mapInPandas`` — each Arrow batch of payloads is decoded in
    one Python call, never row-at-a-time through pickling.  With
    ``fake=False`` this raises ``NotImplementedError`` (real codecs are
    not installed here); ``fake=True`` uses the deterministic
    byte-histogram decoder so the full distributed path is testable.
    """
    if not fake:
        raise NotImplementedError(
            "real media codecs (Pillow/libav) are not available in this "
            "environment; pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": pdf["payload"].map(
                        lambda p: _fake_decode(bytes(p))
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema="media_id long, features array<double>"
    )


def resize_media(
    media: DataFrame, *, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize payloads to a ``width×height`` thumbnail:
    (media_id, thumb BINARY, meta STRUCT<width, height, n_bytes,
    content_sha>).

    The resample itself is the codec-dependent stage and is STUBBED
    like :func:`decode_media` (no Pillow/libav here): ``fake=True``
    substitutes a deterministic crop-to-``width*height``-bytes
    "thumbnail" so the distributed shape is fully exercised — Arrow
    batches through ``mapInPandas``, bounded per-item output size
    (a thumbnail is ≤ width×height regardless of source size, which is
    what makes the output safely re-shuffleable at 100 TB), and the
    thumbnail metadata (length, content sha) computed JVM-side AFTER
    the Python stage so no hashing happens in Python."""
    if not fake:
        raise NotImplementedError(
            "real media codecs (Pillow/libav) are not available in this "
            "environment; pass fake=True for the deterministic stub"
        )
    target = width * height

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": pdf["payload"].map(
                        lambda p: bytes(p)[:target]
                    ),
                }
            )

    out = media.select("media_id", "payload").mapInPandas(
        batches, schema="media_id long, thumb binary"
    )
    return out.select(
        "media_id",
        "thumb",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.length("thumb").alias("n_bytes"),
            F.sha2(F.col("thumb"), 256).alias("content_sha"),
        ).alias("meta"),
    )


def sample_frames(
    media: DataFrame,
    *,
    frame_bytes: int = 64,
    max_frames: int | None = None,
    fake: bool = False,
) -> DataFrame:
    """Sample frames from each payload — the 1→N expansion stage of a
    video pipeline: (media_id, frame_idx, frame BINARY).

    Real frame extraction is codec-bound and stubbed; ``fake=True``
    chunks the payload into consecutive ``frame_bytes`` windows (one
    "frame" per chunk, at least one even for empty payloads) — the
    batch shape is the real one: a single ``mapInPandas`` pass where
    each input row yields a variable number of output rows inside the
    same Arrow batch, no explode/join, no shuffle.  ``max_frames``
    bounds the expansion factor (the knob that keeps a pathological
    10-hour video from emitting 10⁶ rows into one task's output)."""
    if not fake:
        raise NotImplementedError(
            "real media codecs (Pillow/libav) are not available in this "
            "environment; pass fake=True for the deterministic stub"
        )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                n = max(1, -(-len(b) // frame_bytes))  # ceil, ≥1
                if max_frames is not None:
                    n = min(n, max_frames)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema="media_id long, frame_idx int, frame binary"
    )


def media_features(
    media: DataFrame, *, fake: bool = True
) -> DataFrame:
    """Decode + per-item summary stats: (media_id, dim, f_max, f_argmax).

    The downstream-friendly projection of the decoded features —
    ``f_argmax`` is the dominant histogram bin (a stand-in for e.g. a
    dominant-color or top-logit label).
    """
    feats = decode_media(media, fake=fake)
    idx = F.expr(
        "array_position(features, array_max(features))"
    )
    return feats.select(
        "media_id",
        F.size("features").alias("dim"),
        F.array_max("features").alias("f_max"),
        idx.cast("int").alias("f_argmax"),
    )
