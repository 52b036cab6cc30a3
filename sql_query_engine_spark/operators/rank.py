"""Scalable global ranking — two-pass range-partitioned row numbering.

Exact global rank functions (``row_number``/``percent_rank``/``cume_dist``/
``ntile`` over an empty PARTITION BY) force Spark to sort the entire input
in ONE task. This module computes the identical numbers with no global
sort, the same shape as the packing prefix sum (functions/packing.py):

1. ``repartitionByRange`` on the order keys — Spark samples the keys and
   builds range boundaries, so partition *p* holds keys ≤ partition *p+1*
   (a distributed sort's first phase, parallel at any scale).
2. Local ``row_number`` per range partition (``spark_partition_id`` is the
   partition key — each task ranks only its own range).
3. Per-partition row counts → exclusive prefix sum over partition ids.
   This window IS global but runs over one row per partition (a few
   hundred rows on a real cluster) — broadcast-sized by construction.
4. Broadcast the offsets back and add: ``global_rn = offset + local_rn``.

With a tie-breaking (unique) order key, ``rank == row_number``, so
``percent_rank = (rn-1)/(n-1)``, ``cume_dist = rn/n`` and
``ntile(k) = floor(((rn-1)*k)/n) + 1``-with-remainder follow arithmetically
— all exact, all parallel. (Without a tie-breaker, ties spanning a range
boundary would need a follow-up min-over-key pass; the engine's rank
queries always order by a unique key suffix.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_number", "ntile_from_rn", "percent_rank_from_rn"]


def global_row_number(
    df: DataFrame,
    *order: Column | str,
    num_partitions: int | None = None,
    out: str = "rn",
) -> DataFrame:
    """Add an exact global row number in ``order`` without a global sort.

    ``order`` must be a total order (include a unique tie-breaker) — the
    range partitioner splits ties at boundaries arbitrarily, which is only
    safe when no two rows compare equal.
    """
    n_part = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ranged = df.repartitionByRange(n_part, *order).withColumn(
        "__pid", F.spark_partition_id()
    )

    w_local = Window.partitionBy("__pid").orderBy(*order)
    local = ranged.withColumn("__lrn", F.row_number().over(w_local))

    counts = local.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    # global window over one row per range partition — tiny by construction
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__offset"),
    )

    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.col("__offset") + F.col("__lrn")).cast("int"))
        .drop("__pid", "__lrn", "__offset")
    )


def percent_rank_from_rn(rn: Column, n: Column) -> Column:
    """percent_rank for a unique order: (rn - 1) / (n - 1)."""
    return (rn - F.lit(1)).cast("double") / (n - F.lit(1)).cast("double")


def ntile_from_rn(rn: Column, n: Column, k: int) -> Column:
    """ANSI ntile(k) from a global row number: the first ``n % k`` buckets
    get ``ceil(n/k)`` rows, the rest ``floor(n/k)`` — pure arithmetic."""
    big = (n / k).cast("int") + F.lit(1)  # ceil size while remainder lasts
    small = (n / k).cast("int")
    rem = n % k
    cutoff = rem * big  # rows covered by the oversized buckets
    return (
        F.when(rn <= cutoff, ((rn - 1) / big).cast("int") + 1)
        .otherwise(rem + ((rn - cutoff - 1) / small).cast("int") + 1)
        .cast("int")
    )
