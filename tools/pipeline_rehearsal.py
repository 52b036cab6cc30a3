"""Chunk+pack scale rehearsal — proves the round-1 packing fix at volume.

Round 1 packed sequences through ONE global window (a single task seeing
every chunk — the classic 100 TB killer); the replacement is the
two-phase shard-parallel prefix sum in functions/packing.py. This
rehearsal runs the chunk → pack pipeline over a synthetic corpus two to
three orders of magnitude past the gate data and asserts the invariants
that matter at scale:

* token conservation — sum of pack tokens == sum of chunk tokens
  (nothing dropped, nothing double-packed);
* pack occupancy — every pack except possibly the last per shard is
  filled to ≥ 50% of seq_len (greedy packing can't do worse than 2×),
  and no pack exceeds seq_len + max_chunk;
* the only global exchange carries one row per shard (the offsets
  table), never chunk data — re-checked on the physical plan.

    python tools/pipeline_rehearsal.py [n_docs] [--out FILE.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.functions import chunking, packing  # noqa: E402
from sql_query_engine_spark.rehearsal import synth_documents  # noqa: E402

SEQ_LEN = 512


def run(spark, n_docs: int) -> dict:
    report: dict = {"n_docs": n_docs, "seq_len": SEQ_LEN}
    docs = synth_documents(spark, n_docs).select("doc_id", "text").persist()
    docs.count()

    t0 = time.monotonic()
    chunks = chunking.chunk_documents_sql(docs).persist()
    chunk_stats = chunks.agg(
        F.count("*").alias("n"),
        F.sum("n_tokens").alias("tok"),
        F.max("n_tokens").alias("mx"),
    ).collect()[0]
    report["t_chunk_s"] = round(time.monotonic() - t0, 2)
    report["n_chunks"] = chunk_stats["n"]
    report["chunk_tokens"] = chunk_stats["tok"]

    t0 = time.monotonic()
    packs = packing.pack_chunks(chunks, seq_len=SEQ_LEN, with_doc_count=True)
    pstats = packs.agg(
        F.count("*").alias("n_packs"),
        F.sum("pack_tokens").alias("tok"),
        F.max("pack_tokens").alias("max_pack"),
        F.min("pack_tokens").alias("min_pack"),
        F.sum((F.col("pack_tokens") < SEQ_LEN // 2).cast("long")).alias(
            "under_half"
        ),
    ).collect()[0]
    report["t_pack_s"] = round(time.monotonic() - t0, 2)
    report["n_packs"] = pstats["n_packs"]
    report["max_pack_tokens"] = pstats["max_pack"]
    report["underfilled_packs"] = pstats["under_half"]

    # token conservation — the pack assignment is a partition of chunks
    assert pstats["tok"] == chunk_stats["tok"], (
        f"token leak: packed {pstats['tok']} != chunked {chunk_stats['tok']}"
    )
    # greedy bound: a pack never exceeds seq_len + the largest chunk
    assert pstats["max_pack"] <= SEQ_LEN + chunk_stats["mx"], "pack overflow"
    # occupancy: underfilled packs are bounded by the shard count (at most
    # the tail pack of each shard can be light)
    n_shards = report["n_chunks"] // packing.SHARD_WIDTH + 1
    assert pstats["under_half"] <= n_shards + 1, (
        f"{pstats['under_half']} underfilled packs vs {n_shards} shards"
    )
    report["n_shards"] = n_shards

    # plan shape: the one partitionless exchange carries shard totals only
    from sql_query_engine_spark.plans.inspect import formatted_plan

    plan = formatted_plan(packing.pack_chunks(chunks, seq_len=SEQ_LEN))
    report["single_partition_exchanges"] = plan.count("SinglePartition")
    assert plan.count("SinglePartition") <= 2, "chunk data crossed a global exchange"

    docs.unpersist()
    chunks.unpersist()
    return report


def main() -> int:
    argv = sys.argv[1:]
    skip = {i + 1 for i, a in enumerate(argv) if a == "--out"}
    args = [
        a
        for i, a in enumerate(argv)
        if not a.startswith("--") and i not in skip
    ]
    n_docs = int(args[0]) if args else 1_000_000
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("pipeline-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    report = run(spark, n_docs)
    line = json.dumps(report)
    print(line)
    if out:
        with open(out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
