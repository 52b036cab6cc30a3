"""1M-event streaming soak for the keyed-state operators.

Replays 1M synthetic events (10k users) through the
``applyInPandasWithState`` token bucket as EIGHT real micro-batches
(event-time-ordered files, availableNow + maxFilesPerTrigger=1) and
checks the three production claims at scale:

* correctness — every per-event (admitted, tokens_after) equals a
  fresh-state batch fold of the same transition function, compared
  DISTRIBUTED (join + mismatch count, nothing collected);
* bounded state — stateOperators.numRowsTotal never exceeds the user
  count at any batch (O(1) per key, not per event);
* throughput — rows/s across the whole run, recorded per batch.

    python tools/stream_soak_r07.py [--out FILE.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.streaming import stateful  # noqa: E402

N_EVENTS = 1_000_000
N_USERS = 10_000
N_FILES = 8


def main() -> int:
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("stream-soak-r07")
    report: dict = {"n_events": N_EVENTS, "n_users": N_USERS,
                    "n_batches": N_FILES}

    # deterministic corpus: event time strictly increases with event_id,
    # so id-range files preserve per-user event-time order across
    # micro-batches (the replay contract of an ordered log)
    events = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        (F.col("id") % N_USERS).alias("user_id"),
        # per-user gaps cycle 290s/340s/240s around the 300s refill
        # period, so buckets genuinely drain and refill (nanos)
        (F.col("id") * 29_000_000
         + (F.expr(f"(id div {N_USERS}) % 3") * 50_000_000_000)).alias("ts"),
    )

    work = tempfile.mkdtemp(prefix="soak_")
    try:
        step = N_EVENTS // N_FILES
        for i in range(N_FILES):
            events.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ).coalesce(4).write.parquet(os.path.join(work, f"b{i}"))
            time.sleep(1.05)  # distinct mtimes => deterministic order

        stream = (
            spark.readStream.schema("event_id long, user_id long, ts long")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(work, "b*"))
        )
        t0 = time.monotonic()
        q = (
            stateful.token_bucket_stream(stream)
            .writeStream.format("parquet")
            .option("path", os.path.join(work, "out"))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        wall = time.monotonic() - t0
        report["stream_wall_s"] = round(wall, 2)
        report["rows_per_s"] = int(N_EVENTS / wall)

        progs = [p for p in q.recentProgress if p["stateOperators"]]
        state_rows = [p["stateOperators"][0]["numRowsTotal"] for p in progs]
        report["batches_with_state"] = len(progs)
        report["state_rows_per_batch"] = state_rows
        assert len(progs) >= N_FILES - 1
        assert all(0 < s <= N_USERS for s in state_rows), state_rows
        assert state_rows[-1] == N_USERS

        got = spark.read.parquet(os.path.join(work, "out"))
        assert got.count() == N_EVENTS

        # fresh-state batch fold of the SAME transition — ground truth
        schema = ("event_id long, user_id long, admitted int, "
                  "tokens_after long")

        def fold(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            _, _, adm, aft = stateful._tb_transition(
                stateful.TB_CAP, -1,
                pdf["ts_us"].tolist(), pdf["event_id"].tolist(),
            )
            return pd.DataFrame({
                "event_id": pdf["event_id"].values,
                "user_id": pdf["user_id"].values,
                "admitted": adm,
                "tokens_after": aft,
            })

        expected = (
            events.select("event_id", "user_id",
                          F.expr("ts DIV 1000").alias("ts_us"))
            .groupBy("user_id").applyInPandas(fold, schema)
        )
        mismatches = (
            got.alias("g")
            .join(expected.alias("e"), "event_id")
            .filter(
                (F.col("g.admitted").cast("int") != F.col("e.admitted"))
                | (F.col("g.tokens_after") != F.col("e.tokens_after"))
            )
            .count()
        )
        report["mismatches"] = mismatches
        assert mismatches == 0
        n_admitted = got.filter(F.col("admitted") == 1).count()
        report["admitted"] = n_admitted
        assert 0 < n_admitted < N_EVENTS  # the bucket genuinely throttles
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(report, indent=1))
    if out:
        json.dump(report, open(out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
