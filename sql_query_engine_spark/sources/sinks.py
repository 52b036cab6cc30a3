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
    "write_orc",
    "write_bucketed_table",
    "write_training_shards",
    "write_zorder_parquet",
    "zorder_key",
    "compact_parquet",
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


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """ORC sink — same contract as :func:`write_parquet`.

    ORC is the other first-class columnar format Spark ships a native
    vectorized reader/writer for; some warehouses standardize on it.
    Directory partitioning, predicate pushdown, and column pruning all
    behave as in the parquet path (pinned in test_sources.py: the ORC
    scan plan shows PushedFilters for a filter on a data column and never
    opens non-matching partition directories).
    """
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


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


def zorder_key(col_a: str, col_b: str, bits: int = 8) -> "F.Column":
    """Morton (Z-order) key: interleave ``bits`` bits of two columns —
    one pure expression, no UDF.

    Both columns MUST already be normalized into ``[0, 2^bits)``: with
    unequal ranges the wider column would own every high interleaved bit
    and the narrow column would never cluster (the classic z-order
    pitfall). :func:`write_zorder_parquet` does the normalization.
    """
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, i) -> acc"
        f" + shiftleft(cast(({col_a} >> i) & 1 as bigint), 2 * i)"
        f" + shiftleft(cast(({col_b} >> i) & 1 as bigint), 2 * i + 1))"
    )


def hilbert_cols(df: DataFrame, col_a: str, col_b: str,
                 bits: int = 8, out: str = "hilbert") -> DataFrame:
    """Hilbert-curve key for two normalized columns — the space-filling
    curve with strictly better locality than Morton/Z-order (adjacent
    key values are always grid-adjacent; Z-order jumps at power-of-two
    seams, so range scans on the sort key touch fewer distinct value
    regions under Hilbert).

    The classic xy2d walk (one step per bit, high to low: quadrant
    digit d += s^2 * ((3*rx) XOR ry), then reflect+swap when ry=0) is
    unrolled into ``bits`` chained projections of pure integer
    arithmetic — no UDF, no loop at runtime; the XOR is restated as
    CASE WHEN rx = 0 THEN ry ELSE 3 - ry END so the SQL oracle can
    reproduce it verbatim. Both columns MUST be in [0, 2^bits)
    (same contract as zorder_key)."""
    n = 1 << bits  # full-grid reflection keeps coords in [0, n): no
    # negative operands, so div/% agree across engines
    df = df.withColumn("_hx", F.col(col_a).cast("bigint")) \
           .withColumn("_hy", F.col(col_b).cast("bigint")) \
           .withColumn(out, F.lit(0).cast("bigint"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        df = (
            df.withColumn("_rx", F.expr(f"(_hx div {s}) % 2"))
            .withColumn("_ry", F.expr(f"(_hy div {s}) % 2"))
            .withColumn(
                out,
                F.expr(
                    f"{out} + {s * s} *"
                    " (CASE WHEN _rx = 0 THEN _ry ELSE 3 - _ry END)"
                ),
            )
            .withColumn(
                "_fx",
                F.expr(
                    f"CASE WHEN _ry = 0 AND _rx = 1 THEN {n - 1} - _hx"
                    " ELSE _hx END"
                ),
            )
            .withColumn(
                "_fy",
                F.expr(
                    f"CASE WHEN _ry = 0 AND _rx = 1 THEN {n - 1} - _hy"
                    " ELSE _hy END"
                ),
            )
            .withColumn("_nx", F.expr("CASE WHEN _ry = 0 THEN _fy ELSE _fx END"))
            .withColumn("_ny", F.expr("CASE WHEN _ry = 0 THEN _fx ELSE _fy END"))
            .withColumn("_hx", F.col("_nx"))
            .withColumn("_hy", F.col("_ny"))
        )
    return df.drop("_hx", "_hy", "_rx", "_ry", "_fx", "_fy", "_nx", "_ny")


def duck_hilbert_ctes(col_a: str, col_b: str, bits: int = 8,
                      source: str = "pts") -> str:
    """The DuckDB twin of :func:`hilbert_cols`: one chained CTE per bit,
    identical arithmetic. ``source`` must expose (key, x, y); the final
    CTE ``h0`` exposes (key, hd)."""
    n = 1 << bits
    parts = []
    prev = source
    first = True
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        hx = "x" if first else "hx"
        hy = "y" if first else "hy"
        hd = "0" if first else "hd"
        parts.append(f"""h{i} AS (
    SELECT key,
           CASE WHEN ({hy} // {s}) % 2 = 0
                THEN CASE WHEN ({hx} // {s}) % 2 = 1
                          THEN {n - 1} - {hy} ELSE {hy} END
                ELSE {hx} END AS hx,
           CASE WHEN ({hy} // {s}) % 2 = 0
                THEN CASE WHEN ({hx} // {s}) % 2 = 1
                          THEN {n - 1} - {hx} ELSE {hx} END
                ELSE {hy} END AS hy,
           {hd} + {s * s} *
           (CASE WHEN ({hx} // {s}) % 2 = 0 THEN ({hy} // {s}) % 2
                 ELSE 3 - ({hy} // {s}) % 2 END) AS hd
    FROM {prev})""")
        prev = f"h{i}"
        first = False
    return ",\n".join(parts)


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-ordered parquet layout: multi-column data skipping.

    ``write_sorted_parquet`` makes row-group min/max stats near-disjoint
    for ONE column; sorting by the Morton key does it for two at once —
    a selective filter on either column (or both) skips most row groups.
    At 100 TB this is the layout decision that turns point lookups on two
    access paths into a handful of row-group reads without storing the
    table twice.

    Each dimension is min-max scaled into the ``bits`` budget first (a
    broadcast 1-row stats aggregate — lazy, one extra pass at write time)
    so both columns contribute equally to every z-value bit level.
    """
    cap = 1 << bits
    stats = df.agg(
        F.min(col_a).alias("__min_a"),
        F.max(col_a).alias("__max_a"),
        F.min(col_b).alias("__min_b"),
        F.max(col_b).alias("__max_b"),
    )
    norm_a = (
        f"cast(({col_a} - __min_a) * {cap} / (__max_a - __min_a + 1) as bigint)"
    )
    norm_b = (
        f"cast(({col_b} - __min_b) * {cap} / (__max_b - __min_b + 1) as bigint)"
    )
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__na", F.expr(norm_a))
        .withColumn("__nb", F.expr(norm_b))
        .withColumn("__z", zorder_key("__na", "__nb", bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__na", "__nb", "__min_a", "__max_a", "__min_b", "__max_b")
        .write.mode(mode)
        .parquet(path)
    )


def write_hilbert_parquet(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Hilbert-ordered parquet layout — :func:`write_zorder_parquet`
    with the Morton key swapped for the Hilbert key
    (:func:`hilbert_cols`).

    Same two-column data-skipping goal, strictly better locality: every
    consecutive Hilbert value is grid-adjacent, where Z-order jumps at
    power-of-two seams — so a 2-D range predicate maps to FEWER, LONGER
    contiguous key runs, i.e. fewer admitted row groups for the same
    row-group size. Same min-max normalization contract as the z-order
    writer.
    """
    cap = 1 << bits
    stats = df.agg(
        F.min(col_a).alias("__min_a"),
        F.max(col_a).alias("__max_a"),
        F.min(col_b).alias("__min_b"),
        F.max(col_b).alias("__max_b"),
    )
    norm_a = (
        f"cast(({col_a} - __min_a) * {cap} / (__max_a - __min_a + 1) as bigint)"
    )
    norm_b = (
        f"cast(({col_b} - __min_b) * {cap} / (__max_b - __min_b + 1) as bigint)"
    )
    out = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__na", F.expr(norm_a))
        .withColumn("__nb", F.expr(norm_b))
    )
    out = hilbert_cols(out, "__na", "__nb", bits=bits, out="__h")
    (
        out.repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h", "__na", "__nb", "__min_a", "__max_a", "__min_b", "__max_b")
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


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target)`` files; returns the file count.

    Streaming sinks and fine-grained partitioned writes accumulate many
    small files; at scale the scan's task-per-file overhead dominates.
    Sizing from the source's actual bytes (Hadoop FS metadata — works on
    HDFS/S3/local alike) keeps output files near the target regardless of
    row width. Uses ``coalesce`` (no shuffle) since compaction only needs
    fewer files, not a new distribution.
    """
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hadoop_path.getFileSystem(jsc.hadoopConfiguration())
    total = fs.getContentSummary(hadoop_path).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src_path).coalesce(n_files).write.mode(
        "overwrite"
    ).parquet(dst_path)
    return n_files


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
