"""Reference-parity relational operators, Spark-first.

Each function here re-expresses one operator from the reference inventory
(SURVEY.md §2.2) on the DataFrame API. The reference executes these as
row-at-a-time Python closures over RDDs (ra2spark/ra2spark.py:48-104) or as
one Hadoop-streaming job per operator (ra2mr/ra2mr.py:108-129); here every
operator stays declarative so Catalyst plans it (predicate pushdown, column
pruning, join-strategy selection, whole-stage codegen all apply).

Scale notes per operator are inline — the point of this module is not the
one-liners, it is pinning the *semantics* (incl. intentional deviations,
SURVEY.md §7.1) and the plan shape we expect at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "scan",
    "filter_rows",
    "project",
    "project_distinct",
    "rename",
    "cross_product",
    "equi_join",
    "theta_join",
]


def scan(df: DataFrame, alias: str | None = None) -> DataFrame:
    """Base-table access (reference S1: ra2spark/ra2spark.py:54-66).

    The reference reads CSV with a header of dot-qualified names and builds
    a dict per row; here qualification is ``df.alias(rel)`` so self-joins
    resolve via ``col("A.x")`` without literal dots in column names
    (SURVEY.md §7.4 risk 1).
    """
    return df.alias(alias) if alias else df


def filter_rows(df: DataFrame, predicate: Column | str) -> DataFrame:
    """σ — filter (reference F1/F2: ra2spark/ra2spark.py:49-52,
    ra2mr/ra2mr.py:216-252).

    The reference predicate language is only ``attr = literal`` /
    ``attr = attr`` joined by AND (sql2ra/functionality.py:74-78). Spark's
    full expression language is a strict superset; filters expressed here
    reach the parquet scan as PushedFilters (verified in tests/test_plans.py)
    so at 100 TB the row groups that fail the predicate are never read.
    """
    return df.filter(predicate)


def project(df: DataFrame, cols: Sequence[Column | str]) -> DataFrame:
    """π without dedup — plain column selection.

    Column pruning propagates to the scan (ReadSchema), so projecting 2 of
    40 columns reads 2 columns' pages off disk.
    """
    return df.select(*cols)


def project_distinct(df: DataFrame, cols: Sequence[Column | str]) -> DataFrame:
    """π + dedup — the reference's Project (P1/P2) always deduplicates
    (ra2spark/ra2spark.py:89-93 uses .distinct(); ra2mr/ra2mr.py:302-306
    dedups in the reducer) because its SQL surface is SELECT DISTINCT only.

    Spark plans distinct as a two-phase hash aggregate (partial map-side,
    final after shuffle) with spill — unlike the MR reducer's unbounded
    in-memory ``set`` per key.
    """
    return df.select(*cols).distinct()


def rename(
    df: DataFrame,
    relname: str | None = None,
    attrnames: dict[str, str] | None = None,
) -> DataFrame:
    """ρ — rename relation and/or attributes (reference R1:
    ra2spark/ra2spark.py:95-101, ra2mr/ra2mr.py:254-277).

    Relation rename is ``alias`` (pure metadata, no job); attribute rename
    is ``withColumnsRenamed`` (projection, also free at runtime).
    """
    if attrnames:
        df = df.withColumnsRenamed(attrnames)
    if relname:
        df = df.alias(relname)
    return df


def cross_product(left: DataFrame, right: DataFrame) -> DataFrame:
    """× — cartesian product (reference J4: sql2ra/functionality.py:100-102).

    The MR backend outright rejects crosses ("too expensive",
    ra2mr/ra2mr.py:127-129). Spark requires them to be explicit — and when a
    conjunctive equality predicate sits above a cross, Catalyst rewrites it
    into a join (the reference needed a hand-written rule for that,
    raopt/raopt.py:274-306; see tests/test_plans.py::test_cross_becomes_join).
    """
    return left.crossJoin(right)


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[tuple[str, str]],
    how: str = "inner",
) -> DataFrame:
    """⋈ — (multi-key) equi-join (reference J1/J3: ra2spark/ra2spark.py:68-77).

    ``on`` is a list of (left_col, right_col) name pairs — the composite
    tuple key of the reference becomes a conjunction of equalities. The
    reference hard-codes a repartition join (rdd.join); here Catalyst
    picks broadcast-hash for small sides (region/nation/supplier), else
    shuffled-hash/sort-merge, and AQE splits skewed partitions at runtime.

    Deviation (documented, SURVEY.md §7.1): no per-key dedup of joined
    tuples — the reference's MR join dedups inside the reducer
    (ra2mr/ra2mr.py:205-213), which is not ANSI join semantics.
    """
    cond = None
    for lc, rc in on:
        eq = left[lc] == right[rc]
        cond = eq if cond is None else (cond & eq)
    return left.join(right, cond, how)


def theta_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """θ-join with *correct* ANSI semantics — intentional fix of reference
    J5, which is broken on both backends: the Spark backend silently
    degenerates a non-equi condition to an unfiltered cross product
    (ra2spark/ra2spark.py:72-77) and the MR backend silently returns empty
    (ra2mr/ra2mr.py:165-174).

    Catalyst plans a pure-theta condition as BroadcastNestedLoopJoin (fine
    when one side broadcasts); a mixed equi+theta condition keeps the hash
    join on the equi part with the theta residual as a post-filter — the
    shape that scales.
    """
    return left.join(right, condition, how)
