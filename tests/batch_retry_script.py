"""Subprocess body for test_batch_survives_task_failure.

The streaming twin (tests/streaming_retry_script.py) proved a stream
retries a transient task failure and matches its batch twin. This is
the BATCH side of the r8 verdict's ask (#4): run the engine's heavy
batch shapes under a master that permits task retries (``local[4,3]``
— maxFailures=3) with EXACTLY ONE injected transient task failure per
leg, and assert results identical to the clean run in the same session.

Two legs, covering the two retry-idempotence claims:

* dedup leg — MinHash shingling → banded LSH pairs → connected-
  components canonicalization with ``driver_threshold=0`` (forces the
  distributed min-label loop, whose per-round ``localCheckpoint``
  truncation is exactly the lineage a retried task must not corrupt).
* decode leg — synthesize real PNG/JPEG/GIF bytes per doc and decode
  them back through the Arrow ``mapInPandas`` stage (the multimodal hot
  path); the injection fires inside the Arrow batch iterator itself.

The flaky wrapper is itself an Arrow ``mapInPandas`` passthrough: first
attempt of partition 0 plants a flag file and dies; the retry (and all
other partitions) pass rows through untouched. A separate flag per leg
guarantees each leg really did retry.

    python tests/batch_retry_script.py SF_DIR FLAG_DIR
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import TaskContext
from pyspark.sql import SparkSession


def flaky_passthrough(flag: str):
    def _flaky(batches):
        tc = TaskContext.get()
        for pdf in batches:
            if (
                tc.partitionId() == 0
                and tc.attemptNumber() == 0
                and not os.path.exists(flag)
            ):
                with open(flag, "w") as f:
                    f.write("injected")
                raise RuntimeError("injected transient task failure")
            yield pdf

    return _flaky


def main() -> int:
    sf_dir, flag_dir = sys.argv[1], sys.argv[2]
    spark = (
        SparkSession.builder.master("local[4,3]")
        .appName("batch-retry-soak")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from sql_query_engine_spark.catalog import load_table
    from sql_query_engine_spark.functions import dedup, multimodal

    docs = load_table(spark, sf_dir, "documents")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"

    def run_dedup(input_docs):
        pairs = dedup.minhash_lsh_pairs(input_docs)
        clusters = dedup.dedup_clusters(input_docs, pairs, driver_threshold=0)
        return sorted(
            (r.doc_id, r.cluster_id) for r in clusters.collect()
        )

    def run_decode(input_docs):
        decoded = multimodal.decode_media(multimodal.synthesize_media(input_docs))
        return sorted(
            tuple(r) for r in decoded.collect()
        )

    flag_dedup = os.path.join(flag_dir, "dedup.flag")
    flag_decode = os.path.join(flag_dir, "decode.flag")

    clean_dedup = run_dedup(docs)
    faulty_dedup = run_dedup(
        docs.mapInPandas(flaky_passthrough(flag_dedup), schema)
    )
    clean_decode = run_decode(docs)
    faulty_decode = run_decode(
        docs.mapInPandas(flaky_passthrough(flag_decode), schema)
    )

    report = {
        "dedup_failure_injected": os.path.exists(flag_dedup),
        "decode_failure_injected": os.path.exists(flag_decode),
        "dedup_equal": faulty_dedup == clean_dedup,
        "decode_equal": faulty_decode == clean_decode,
        "n_clusters": len(clean_dedup),
        "n_decoded": len(clean_decode),
    }
    print(json.dumps(report))
    assert report["dedup_failure_injected"], "dedup flaky task never ran"
    assert report["decode_failure_injected"], "decode flaky task never ran"
    assert report["dedup_equal"]
    assert report["decode_equal"]
    assert report["n_clusters"] > 0 and report["n_decoded"] > 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
