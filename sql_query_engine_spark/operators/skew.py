"""Skew-resilient join: key salting.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime, but it only applies to sort-merge joins and only when
partition-size statistics expose the skew. Salting is the explicit,
planner-independent fallback for the pathological case — one join key
carrying an outsized share of the fact rows (the classic 100 TB
null-key / power-law-key failure).

Mechanics: the fact side gets a deterministic salt in [0, n) derived by
hashing the whole row's unique carrier column; the dimension side is
replicated n× (explode over the salt range); the join key becomes
(key, salt), splitting each hot key's rows across n partitions. Cost:
n× replication of the *smaller* side — choose n ≈ hot-key rows /
target-partition rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_collect_set", "salted_join"]

_SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[tuple[str, str]],
    n_salt: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` with the hot-key load split ``n_salt`` ways.

    ``on`` is a list of (fact_col, dim_col) pairs. ``salt_source`` names a
    high-cardinality fact column (an id) used to derive the salt; the
    default hashes ALL fact columns. The salt must vary *within* a join
    key — hashing the join key itself would put every row of the hot key
    into one salt bucket and change nothing. Output columns match a plain
    ``fact.join(dim, ...)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")

    salt_cols = [salt_source] if salt_source else list(fact.columns)
    salted_fact = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt))
    )
    salted_dim = dim.withColumn(
        _SALT, F.explode(F.array([F.lit(i) for i in range(n_salt)]))
    )

    cond: Column = salted_fact[_SALT] == salted_dim[_SALT]
    for fk, dk in on:
        cond = cond & (salted_fact[fk] == salted_dim[dk])
    return salted_fact.join(salted_dim, cond, how).drop(_SALT)


def salted_collect_set(
    df: DataFrame, key: str, col: str, n_salt: int = 16, out: str | None = None
) -> DataFrame:
    """``groupBy(key).agg(collect_set(col))`` with the hot key's
    accumulation split ``n_salt`` ways — the AGGREGATION shape AQE
    cannot rescue.

    Plain sums/counts are skew-immune (map-side partial aggregation
    collapses each partition's hot-key rows to one row before the
    shuffle), and rank-filtered window top-k gets the same protection
    from WindowGroupLimit's partial mode. collect_set/collect_list are
    the exception: their partial state is the VALUE SET itself, so every
    row of the hot key still lands in one reducer task, and AQE's skew
    split cannot divide a single group. This is the documented reserve
    case for salting (REHEARSAL_r07_skew_10m showed AQE beating salting
    for JOIN skew; REHEARSAL_r08_skew_agg measures this agg shape).

    Two-level plan: salt on a hash of the VALUE (so duplicates of one
    value land in the same salt bucket and partial sets stay small) →
    ``collect_set`` per (key, salt) → flatten the ≤ n_salt partial sets
    per key. The per-value hash makes the result exactly equal to the
    plain collect_set (same distinct set; array order is normalized by
    ``array_sort`` on both paths' consumers).
    """
    out = out or f"{col}_set"
    part = (
        df.withColumn(_SALT, F.pmod(F.xxhash64(F.col(col)), F.lit(n_salt)))
        .groupBy(key, _SALT)
        .agg(F.collect_set(col).alias("_part"))
    )
    return part.groupBy(key).agg(
        F.flatten(F.collect_list("_part")).alias(out)
    )
