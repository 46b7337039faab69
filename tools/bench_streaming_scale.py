#!/usr/bin/env python
"""Streaming at-scale session (round 10, VERDICT r9 #4): the one family
with no sf1+ measurement.  The fixture events table is capped at 100 k
rows at every SF, so this synthesizes a DETERMINISTIC sf1-scale replay
in Spark (no randomness — xxhash64-derived session times):

    user u = id %% n_users;  seq = id // n_users;  session s = seq // 5
    session start = hash(u, s) mapped into the 30-day horizon
    event ts = session start + (seq %% 5) * 5 min   (5-event sessions)

staged as ``n_files`` event-time-contiguous parquet files with strictly
increasing mtimes (same arrival-order discipline as
``prepare_events_stream_dir`` — FileStreamSource replays oldest first,
so the watermark advances with event time and closed sessions are
EVICTED from the store batch by batch).

Measured path: session windows (30-min gap, 1-h watermark) over a
stream-static join against a user dim — the SURVEY §2.2.9 micro-batch
shape — with ``maxFilesPerTrigger=1`` forcing ≥ ``n_files``
micro-batches.  Evidence captured per micro-batch from
``lastProgress.stateOperators``:

  * state rows total (must PLATEAU under eviction, not grow with the
    replayed volume — the bounded-state contract at 100 TB),
  * state memory bytes,
  * watermark progression.

Usage:  python tools/bench_streaming_scale.py [n_events n_files]
        default: 5_000_000 events, 25 files
Writes BENCH_streaming[_<n>m]_<tag>.json
(tag from SPARK_GRAFT_BENCH_TAG, default "r11").
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F

HORIZON_S = 30 * 24 * 3600          # 30-day event-time horizon
SESSION_EVENTS = 5
EVENT_SPACING_S = 300               # 5 min between session events
N_USERS = 150_000


def synth_events(spark, n_events):
    ids = spark.range(n_events)
    u = F.pmod(F.col("id"), F.lit(N_USERS))
    seq = (F.col("id") / N_USERS).cast("long")
    s = (seq / SESSION_EVENTS).cast("long")
    off = F.pmod(seq, F.lit(SESSION_EVENTS))
    base_s = F.pmod(F.xxhash64(u, s), F.lit(HORIZON_S - 3600))
    ts = F.timestamp_seconds(
        F.lit(1704067200)  # 2024-01-01 UTC
        + base_s + off * EVENT_SPACING_S
    )
    return ids.select(
        F.col("id").alias("event_id"),
        ts.alias("ts"),
        u.alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.pmod(F.xxhash64("id"), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).cast("double")
         / 100.0).alias("value"),
    )


def stage_time_ordered(df, out, n_files):
    """Write ``df`` as n_files event-time-contiguous parquet files with
    strictly increasing mtimes — arrival order == event-time order.

    r11: EXACT per-bucket layout.  The r10 staging used
    ``repartitionByRange(n_files, "_bucket")``, whose sampled range
    boundaries can merge two ntile buckets into one partition — the
    20 M replay landed a single 1.6 M-row file that showed up as the
    batch-5 state spike (see SCALE.md §5).  ``partitionBy("_bucket")``
    after a hash repartition ON the bucket makes the layout exact by
    construction: each bucket lives in exactly one task, each task
    writes one file per bucket directory, and the files are renamed
    flat so the file stream sees n_files uniform inputs."""
    import glob
    import shutil

    from pyspark.sql.window import Window

    staged = out + "__stage"
    (
        df.withColumn(
            "_bucket",
            F.ntile(n_files).over(Window.orderBy("ts", "event_id")),
        )
        .repartition(n_files, "_bucket")
        # leading _bucket satisfies the dynamic-partition writer's
        # required ordering, so it inserts no sort of its own and the
        # (ts, event_id) order survives into each file
        .sortWithinPartitions("_bucket", "ts", "event_id")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(staged)
    )
    os.makedirs(out, exist_ok=True)
    parts = []
    for i in range(1, n_files + 1):
        files = glob.glob(os.path.join(staged, f"_bucket={i}", "*.parquet"))
        assert len(files) == 1, (
            f"bucket {i}: expected exactly 1 file, got {len(files)}"
        )
        fname = f"part-{i - 1:05d}.parquet"
        shutil.move(files[0], os.path.join(out, fname))
        parts.append(fname)
    shutil.rmtree(staged)
    with open(os.path.join(out, "_SUCCESS"), "w"):
        pass
    t0 = time.time() - 60.0
    for i, fname in enumerate(parts):
        fp = os.path.join(out, fname)
        os.utime(fp, (t0 + 10.0 * i, t0 + 10.0 * i))
    return parts


def main(argv) -> int:
    from data_pipeline_package_for_python_spark.session import get_spark
    from data_pipeline_package_for_python_spark import streaming as ST

    n_events = int(argv[1]) if len(argv) > 1 else 5_000_000
    n_files = int(argv[2]) if len(argv) > 2 else 25

    spark = get_spark(app_name="bench-streaming-scale")
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(tempfile.gettempdir(),
                       f"dpp_stream_scale_{n_events}_{n_files}")
    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        stage_time_ordered(synth_events(spark, n_events), src, n_files)
    t_stage = time.perf_counter() - t0

    # static user dim (re-planned per micro-batch; broadcastable)
    users = spark.range(N_USERS).select(
        F.col("id").alias("user_id"),
        F.element_at(
            F.array(F.lit("free"), F.lit("pro"), F.lit("team")),
            (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(3)) + 1).cast("int"),
        ).alias("tier"),
    ).localCheckpoint(eager=True)

    stream = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    enriched = ST.stream_static_join(stream, users, on="user_id")
    sessions = (
        enriched.withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("sw"),
            "user_id", "tier",
        )
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("v"))
        .select(
            "user_id", "tier",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "cnt", "v",
        )
    )

    progress: list = []
    t0 = time.perf_counter()
    out_df = ST.run_available_now(
        sessions, timeout_s=1800, state_partitions=32,
        progress_out=progress,
    )
    t_drain = time.perf_counter() - t0
    n_sessions = out_df.count()

    batches = []
    for p in progress:
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        op = ops[0]
        batches.append({
            "batch": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "state_rows": op.get("numRowsTotal"),
            "state_mem_mb": round(
                (op.get("memoryUsedBytes") or 0) / 1e6, 1),
            "rows_removed": op.get("numRowsRemoved"),
            "watermark": (p.get("eventTime") or {}).get("watermark"),
        })
    state_rows = [b["state_rows"] for b in batches if b["state_rows"]]
    out = {
        "metric": "streaming_scale",
        "n_events": n_events,
        "n_files": n_files,
        "n_users": N_USERS,
        "sec_stage_once": round(t_stage, 2),
        "sec_drain": round(t_drain, 2),
        "events_per_sec": round(n_events / t_drain),
        "n_micro_batches": len(progress),
        "n_sessions_emitted": n_sessions,
        "state_rows_max": max(state_rows) if state_rows else None,
        "state_rows_final": state_rows[-1] if state_rows else None,
        "state_rows_curve": [b["state_rows"] for b in batches],
        "rows_removed_total": sum(
            b["rows_removed"] or 0 for b in batches),
        "state_mem_mb_max": max(
            (b["state_mem_mb"] for b in batches), default=None),
        "batches": batches,
    }
    suffix = "" if n_events == 5_000_000 else f"_{n_events // 1_000_000}m"
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "r11")
    with open(
        os.path.join(ROOT, f"BENCH_streaming{suffix}_{tag}.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "batches"}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
