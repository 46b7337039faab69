"""Archive & web-crawl ingestion: zip / tar.gz expansion, WARC parsing.

Real corpora do not arrive as loose parquet: web crawls ship as WARC
files (Common Crawl), paper/code dumps as tar.gz, and document
collections as zip — so the first stage of a 100 TB text pipeline is
"binary archive column → one row per member/record".  These operators
implement that stage with stdlib codecs only (zipfile / tarfile / gzip
/ manual WARC framing), Arrow-batched through ``mapInPandas``:

* one input row (an archive payload) → N output rows (members), so the
  expansion is a safe 1→N flatMap — no shuffle of its own, and the
  output re-partitions downstream like any other fact table;
* per-task memory is bounded by one archive at a time (ZipFile/TarFile
  stream from an in-memory buffer; members are materialized one by
  one, never the whole archive at once);
* corrupt archives raise (task error), matching the codec contract
  everywhere else in ``operators/``.

Reference parity: the reference DSL (dpp.py) has no I/O at all; this
is part of the §2.2.10 LLM-pipeline surface (SURVEY.md — "operations a
large-scale training-data pipeline would need").
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

__all__ = [
    "expand_zip",
    "expand_tar",
    "parse_warc",
    "zip_bytes",
    "tar_gz_bytes",
    "warc_bytes",
]


# ---------------------------------------------------------------------- #
# builders (deterministic fixtures + the encode half of round-trips)     #
# ---------------------------------------------------------------------- #

_EPOCH = (1980, 1, 1, 0, 0, 0)  # zip's epoch: deterministic timestamps


def zip_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """A DEFLATE zip archive with pinned timestamps — bit-stable for a
    given member list, so fixtures are reproducible."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            info = zipfile.ZipInfo(name, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()


def tar_gz_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """A gzipped POSIX tar with zeroed mtimes (deterministic)."""
    import gzip
    import io
    import tarfile

    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    return gzip.compress(tbuf.getvalue(), compresslevel=6, mtime=0)


def warc_bytes(records: list[tuple[str, str, bytes]]) -> bytes:
    """A WARC/1.0 file from (warc_type, target_uri, payload) records —
    standard framing: version line, named headers, CRLF blank line,
    exactly Content-Length payload bytes, CRLF CRLF separator."""
    out = bytearray()
    for rec_type, uri, payload in records:
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rec_type}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        )
        out += head.encode("utf-8") + payload + b"\r\n\r\n"
    return bytes(out)


# ---------------------------------------------------------------------- #
# expansion operators                                                    #
# ---------------------------------------------------------------------- #

_MEMBER_SCHEMA = (
    "archive_id long, member_name string, n_bytes long, content binary"
)


def expand_zip(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(archive_id, member_name, n_bytes, content) — one row per zip
    member, decompressed (real stdlib DEFLATE), directory entries
    skipped.  1→N flatMap through Arrow batches; memory bounded by one
    member at a time."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import zipfile

        import pandas as pd

        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[payload_col]):
                with zipfile.ZipFile(io.BytesIO(bytes(p))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        data = zf.read(info.filename)
                        rows.append(
                            (int(aid), info.filename, len(data), data)
                        )
            yield pd.DataFrame(
                rows,
                columns=["archive_id", "member_name", "n_bytes", "content"],
            )

    return media.select(id_col, payload_col).mapInPandas(
        batches, schema=_MEMBER_SCHEMA
    )


def expand_tar(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    *,
    gzipped: bool = True,
) -> DataFrame:
    """(archive_id, member_name, n_bytes, content) — one row per
    regular-file tar member; ``gzipped=True`` transparently inflates
    .tar.gz payloads first (stdlib gzip)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import gzip
        import io
        import tarfile

        import pandas as pd

        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                if gzipped:
                    raw = gzip.decompress(raw)
                with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
                    for info in tf:
                        if not info.isreg():
                            continue
                        data = tf.extractfile(info).read()
                        rows.append(
                            (int(aid), info.name, len(data), data)
                        )
            yield pd.DataFrame(
                rows,
                columns=["archive_id", "member_name", "n_bytes", "content"],
            )

    return media.select(id_col, payload_col).mapInPandas(
        batches, schema=_MEMBER_SCHEMA
    )


def parse_warc(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(archive_id, record_idx, warc_type, target_uri, n_bytes,
    payload) — one row per WARC/1.0 record: version line checked,
    headers parsed case-insensitively until the CRLF blank line,
    exactly Content-Length payload bytes consumed, CRLFCRLF separator
    enforced.  Malformed framing raises ValueError (task error), never
    silent truncation — a crawl file that lies about Content-Length is
    corrupt data, not data."""

    def parse_one(raw: bytes):
        pos = 0
        idx = 0
        out = []
        n = len(raw)
        while pos < n:
            end = raw.index(b"\r\n\r\n", pos)
            head = raw[pos:end].decode("utf-8")
            lines = head.split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(
                    f"bad WARC version line at offset {pos}"
                )
            hdrs = {}
            for line in lines[1:]:
                k, _, v = line.partition(":")
                hdrs[k.strip().lower()] = v.strip()
            length = int(hdrs["content-length"])
            body_start = end + 4
            body = raw[body_start : body_start + length]
            if len(body) != length:
                raise ValueError("truncated WARC payload")
            if raw[body_start + length : body_start + length + 4] != b"\r\n\r\n":
                raise ValueError("missing WARC record separator")
            out.append((
                idx,
                hdrs.get("warc-type", ""),
                hdrs.get("warc-target-uri", ""),
                length,
                body,
            ))
            idx += 1
            pos = body_start + length + 4
        return out

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[payload_col]):
                for rec in parse_one(bytes(p)):
                    rows.append((int(aid),) + rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "archive_id", "record_idx", "warc_type",
                    "target_uri", "n_bytes", "payload",
                ],
            )

    return media.select(id_col, payload_col).mapInPandas(
        batches,
        schema="archive_id long, record_idx long, warc_type string, "
               "target_uri string, n_bytes long, payload binary",
    )
