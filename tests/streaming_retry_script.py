"""Subprocess body for test_streaming_survives_task_failure.

Runs a Structured Streaming aggregation under a master that permits
task retries (``local[4,3]`` — maxFailures=3; the shared test session's
``local[*]`` fails the whole job on first task failure, which is why
this runs in its own process) and injects EXACTLY ONE transient task
failure mid-stream via a flag file. The query must retry the task,
complete, and produce results identical to the batch twin — the
executor-loss resilience claim a 1000-executor cluster depends on.

    python tests/streaming_retry_script.py SF_DIR CKPT_DIR FLAG_FILE
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    sf_dir, ckpt, flag = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = (
        SparkSession.builder.master("local[4,3]")
        .appName("streaming-retry-soak")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from sql_query_engine_spark.catalog import (
        load_table,
        normalize_events,
        raw_schema,
    )

    def flaky(batches):
        tc = TaskContext.get()
        for pdf in batches:
            # fail once, ever: first attempt of partition 0 plants the
            # flag file and dies; the retry (attemptNumber > 0) and all
            # other partitions pass the rows through untouched
            if (
                tc.partitionId() == 0
                and tc.attemptNumber() == 0
                and not os.path.exists(flag)
            ):
                with open(flag, "w") as f:
                    f.write("injected")
                raise RuntimeError("injected transient task failure")
            yield pdf

    # stage the single-file events parquet into a directory — file-source
    # streams read directories
    import shutil

    stage = os.path.join(ckpt + "_stage")
    os.makedirs(stage, exist_ok=True)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stage, "events.parquet"),
    )

    stream = (
        normalize_events(
            spark.readStream.schema(raw_schema(spark, sf_dir, "events"))
            .parquet(stage)
        )
        .select("event_type")
        .mapInPandas(flaky, "event_type string")
        .groupBy("event_type")
        .count()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("retried")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(300)

    got = {
        r.event_type: r["count"]
        for r in spark.sql("SELECT * FROM retried").collect()
    }
    want = {
        r.event_type: r["count"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    report = {
        "failure_injected": os.path.exists(flag),
        "streamed_equals_batch": got == want,
        "n_types": len(got),
    }
    print(json.dumps(report))
    assert report["failure_injected"], "flaky task never ran"
    assert report["streamed_equals_batch"], (got, want)
    assert report["n_types"] > 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
