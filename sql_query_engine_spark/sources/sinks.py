"""Sinks — the Spark-native replacement for the reference's outputs.

The reference has two terminal behaviors (SURVEY.md §2.2 S3/S4):
``collect()`` + print-first-10 on the Spark backend
(ra2spark/ra2spark.py:117-118), and per-operator HDFS/local tmp-file
materialization on the MR backend (ra2mr/ra2mr.py:96-101). The first maps
to :func:`show_sample`; the second is an anti-goal (Spark pipelines stages
in memory) — real persistence is the writer API below.

Scale notes baked into the writers:

* ``partition_by`` → directory-partitioned parquet, the layout that makes
  *partition pruning* work for downstream readers (a filter on the
  partition column never opens non-matching directories).
* ``bucket_by`` (table sink) → pre-shuffled, co-located layout: two tables
  bucketed on the same key join WITHOUT a shuffle — the 100 TB answer to
  repeated fact-fact joins.
* ``max_records_per_file`` guards against the few-huge-files failure mode
  that serializes downstream scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "show_sample",
    "write_parquet",
    "write_bucketed_table",
    "write_training_shards",
]


def show_sample(df: DataFrame, n: int = 10) -> int:
    """Reference S3 parity: print n rows + return the count."""
    df.show(n, truncate=False)
    return df.count()


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Columnar sink with optional directory partitioning."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned + sorted parquet layout for data skipping.

    ``repartitionByRange`` clusters rows by the sort key across files and
    ``sortWithinPartitions`` orders them inside each file, so parquet
    row-group min/max statistics become near-disjoint ranges — a reader
    filtering on the sort column skips whole row groups / files without
    touching them. This is the (single-column) Z-order story: at 100 TB,
    laying the table out by its dominant filter column turns selective
    scans from full reads into a handful of row groups.
    """
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_training_shards(
    packed: DataFrame,
    path: str,
    n_shards: int = 64,
    pack_col: str = "pack_id",
    mode: str = "overwrite",
) -> None:
    """The training-data pipeline's terminal sink: packed sequences →
    fixed-count shards a data loader can stream round-robin.

    ``shard = pack_id % n_shards`` gives every shard an equal share of
    packs regardless of corpus size (training loaders want a FIXED shard
    count with growing shard size, not the reverse), ``partitionBy``
    writes one directory per shard so loader workers claim shards by
    directory, and sorting within shards by pack id keeps each file in
    curriculum order. One shuffle total — the modulo repartition — at any
    scale; no global sort anywhere.
    """
    (
        packed.repartition(n_shards, F.pmod(F.col(pack_col), F.lit(n_shards)))
        .withColumn("shard", F.pmod(F.col(pack_col), F.lit(n_shards)).cast("int"))
        .sortWithinPartitions(pack_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed-table sink: co-located storage for shuffle-free
    joins/aggregations on the bucket key (requires a warehouse-backed
    session; used where the same join key is hit repeatedly)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table, format="parquet")
