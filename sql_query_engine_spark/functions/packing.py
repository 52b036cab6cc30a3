"""Sequence packing — two-phase distributed prefix sum.

Packing chunks into ~512-token training sequences needs a running token
sum over the global (doc_id, chunk_idx) order. The naive formulation —
``Window.orderBy(...)`` with **no** partition spec — is correct but pulls
every chunk row into ONE task (Spark plans a single-partition sort of the
entire table): fine at sf0.1, fatal at 100 TB.

This module computes the *identical* result with a two-phase prefix sum:

1. **Shard** by ``doc_id DIV shard_width``. The shard function is
   MONOTONE in doc_id, so the composite order (shard, doc_id, chunk_idx)
   is the very same total order as (doc_id, chunk_idx) — the output is
   bit-identical to the global window, and the DuckDB oracle keeps its
   plain global ``SUM() OVER (ORDER BY ...)``.
2. **Local pass**: per-shard running sums via
   ``Window.partitionBy(shard)`` — embarrassingly parallel.
3. **Shard totals**: the per-shard total is ``max(local_cum)`` (the
   running sum is nondecreasing because n_tokens ≥ 0), taken from the
   SAME shard-partitioned exchange the window uses — ReuseExchange makes
   the expensive upstream chunk computation happen once.
4. **Offsets**: exclusive prefix sum of shard totals over shard order.
   This window IS global — over ``n_docs / shard_width`` rows (one per
   shard), a few MB even at billions of documents; plan-audit exempts it
   as a documented tiny-side global window.
5. **Broadcast** the offsets back onto the local pass and add.

No stage touches more than one shard's rows per task; the only global
structures are one row per shard.

Tuning ``shard_width`` at scale: the offsets table has
``max_doc_id / shard_width`` rows and must stay broadcast-sized, while a
single shard's chunks must fit one task's sort buffer. For ~50 B docs,
width ≈ 1 M keeps both (≈50 K offset rows, ≈1 M-doc sorts); the default
1024 suits test/bench scale. If both constraints ever conflict (≫100 B
docs), apply the same two-phase scheme recursively to the offsets table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cumulative_tokens", "pack_chunks", "SHARD_WIDTH", "SEQ_LEN"]

SHARD_WIDTH = 1024  # documents per shard; each shard is one window task
SEQ_LEN = 512       # target tokens per packed training sequence


def cumulative_tokens(chunks: DataFrame, shard_width: int = SHARD_WIDTH) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens) → + cum_tokens, the running global
    token sum in (doc_id, chunk_idx) order, computed shard-parallel.

    Output is bit-identical to
    ``sum(n_tokens) OVER (ORDER BY doc_id, chunk_idx ROWS UNBOUNDED
    PRECEDING)`` because the shard key is monotone in doc_id.
    """
    # Explicit repartition (not ENSURE_REQUIREMENTS) so the local-window
    # branch and the shard-totals branch hit ReuseExchange: the expensive
    # upstream chunk computation is shuffled ONCE and both branches read
    # the same exchange (verified in the physical plan; implicit
    # exchanges were not deduplicated under AQE).
    n_part = int(chunks.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    # The isNotNull filter pre-empts the IsNotNull(join key) predicate the
    # broadcast join would otherwise infer into ONLY the join branch —
    # without it the two exchange subtrees canonicalize differently and
    # ReuseExchange misses.
    sharded = (
        chunks.withColumn("__shard", F.expr(f"doc_id DIV {shard_width}"))
        .filter(F.col("__shard").isNotNull())
        .repartition(n_part, "__shard")
    )

    w_local = (
        Window.partitionBy("__shard")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sharded.select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        "__shard",
        F.sum("n_tokens").over(w_local).alias("__local_cum"),
    )

    # Per-shard totals from the same exchange (max of a nondecreasing
    # running sum == the shard total). groupBy on the window's own
    # partition key adds no new shuffle.
    totals = local.groupBy("__shard").agg(F.max("__local_cum").alias("__shard_total"))

    # Exclusive prefix sum over shards: deliberately global, but over one
    # row PER SHARD (tiny by construction — see module docstring).
    w_off = Window.orderBy("__shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__shard",
        F.coalesce(F.sum("__shard_total").over(w_off), F.lit(0)).alias("__offset"),
    )

    return local.join(F.broadcast(offsets), "__shard").select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        (F.col("__local_cum") + F.col("__offset")).alias("cum_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    seq_len: int = SEQ_LEN,
    shard_width: int = SHARD_WIDTH,
    with_doc_count: bool = False,
) -> DataFrame:
    """Greedy sequence packing: assign each chunk to pack
    ``(cum_tokens - n_tokens) DIV seq_len`` and aggregate per pack."""
    ordered = cumulative_tokens(chunks, shard_width)
    aggs = [
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").alias("pack_tokens"),
    ]
    if with_doc_count:
        aggs.append(F.count_distinct("doc_id").alias("n_docs"))
    return ordered.groupBy(
        F.expr(f"CAST((cum_tokens - n_tokens) DIV {seq_len} AS BIGINT)").alias("pack_id")
    ).agg(*aggs)
