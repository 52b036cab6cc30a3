"""Subprocess body for test_streaming_kill_restart_recovery.

The r9 verdict's remaining resilience gap: retry-idempotence was proven
for single TASK failures, but not a full QUERY death — the executor/
driver loss a long-running 100 TB ingest stream will eventually suffer.
This script runs one mode per process:

* ``victim``  — starts the stateful pipeline (dropDuplicatesWithinWatermark
  → session_window aggregation, both real streaming state) over a
  time-ordered multi-file source at one file per micro-batch, and after
  ≥3 committed micro-batches HARD-KILLS the process with ``os._exit``
  (no stop(), no cleanup, checkpoint left mid-flight) — the crash case,
  not a graceful restart (tests/test_streaming.py already covers that).
* ``resume``  — same query, same checkpoint + sink: Structured Streaming
  must replant state from the checkpoint, skip committed batches, and
  drain the rest (availableNow).
* ``clean``   — fresh checkpoint + sink, same input: the uninterrupted
  twin.

The test asserts the resumed sink equals the clean sink row-for-row
(the parquet file sink's _spark_metadata log is the exactly-once
boundary) — i.e. kill-and-restart is invisible in the results.

    python tests/streaming_recovery_script.py MODE SF_DIR WORK_DIR
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

N_CHUNKS = 12
KILL_AFTER_BATCHES = 3


def get_session(name: str) -> SparkSession:
    return (
        SparkSession.builder.master("local[4]")
        .appName(name)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def stage_chunks(spark: SparkSession, sf_dir: str, stage: str) -> None:
    """Time-ordered chunk files (chunk k = k-th time slice, doubled rows
    so the dedup operator has real duplicates to suppress). Time order
    keeps the watermark advancing identically in every leg — no
    run-dependent late-row drops to muddy the equality assertion."""
    if os.path.isdir(stage) and any(
        f.endswith(".parquet") for f in os.listdir(stage)
    ):
        return
    from sql_query_engine_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    per = (total + N_CHUNKS - 1) // N_CHUNKS
    ranked = ev.select(
        "event_id", "user_id", "event_type", "value", "ts_utc",
        (
            (F.row_number().over(Window.orderBy("ts_utc", "event_id")) - 1)
            / per
        ).cast("int").alias("chunk"),
    )
    doubled = ranked.unionAll(ranked)  # every event arrives twice
    for k in range(N_CHUNKS):
        (
            doubled.filter(F.col("chunk") == k)
            .drop("chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(stage, f"tmp_{k:02d}"))
        )
    # flatten to lexicographically-ordered single files
    import glob
    import shutil

    for k in range(N_CHUNKS):
        src = glob.glob(os.path.join(stage, f"tmp_{k:02d}", "part-*.parquet"))
        assert len(src) == 1
        shutil.move(src[0], os.path.join(stage, f"chunk_{k:02d}.parquet"))
        shutil.rmtree(os.path.join(stage, f"tmp_{k:02d}"))


def build_query(spark: SparkSession, stage: str):
    schema = spark.read.parquet(stage).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    # two chained stateful operators — exactly the legs the verdict
    # names: dedup-within-watermark, then session-window aggregation
    return (
        raw.withWatermark("ts_utc", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy(
            F.session_window("ts_utc", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def read_sink(spark: SparkSession, out: str) -> list:
    df = spark.read.parquet(out)  # honors the sink's _spark_metadata log
    return sorted(
        (
            r.session_start_us,
            r.session_end_us,
            r.user_id,
            r.n_events,
            round(r.sum_value, 6),
        )
        for r in df.collect()
    )


def main() -> int:
    mode, sf_dir, work = sys.argv[1], sys.argv[2], sys.argv[3]
    stage = os.path.join(work, "stage")
    leg = "clean" if mode == "clean" else "kill"
    ckpt = os.path.join(work, f"ckpt_{leg}")
    out = os.path.join(work, f"out_{leg}")
    spark = get_session(f"recovery-{mode}")
    stage_chunks(spark, sf_dir, stage)
    os.makedirs(out, exist_ok=True)

    if mode == "victim":
        q = (
            build_query(spark, stage)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            # count DATA batches only: Spark emits no-data micro-batches
            # to advance watermarks, and >= 0 would count those (review
            # r10) — the kill must land after 3 batches that actually
            # committed rows, or the resume leg has nothing to prove
            done = len([p for p in q.recentProgress if p["numInputRows"] > 0])
            if done >= KILL_AFTER_BATCHES:
                # crash, don't stop: no graceful shutdown, no JVM exit
                # hooks — the checkpoint is whatever the last commit wrote
                sys.stdout.write(json.dumps({"killed_after": done}) + "\n")
                sys.stdout.flush()
                os._exit(137)
            time.sleep(0.5)
        raise TimeoutError("victim never reached the kill point")

    q = (
        build_query(spark, stage)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = read_sink(spark, out)
    print(json.dumps({"mode": mode, "n_rows": len(rows), "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
