"""Bloom-filter semi-join: sketch-prefiltered shuffle reduction.

The 100 TB problem this solves: a semi-join of a huge fact table against
a selective dimension normally shuffles EVERY fact row to the join —
including the vast majority that match nothing. Spark's own runtime
row-level filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``)
does exactly this transform, but only activates above multi-GB scan
thresholds that local test scale can never reach (see COVERAGE.md), so
this module is the explicit, always-available form of the same idea:

1. build a Bloom bitmap over the dimension's join keys — a distributed
   ``bit_or`` aggregate, map-side combinable, whose result is m/64 longs
   (a few KB–MB: sketch-sized, like a broadcast-hash-join build but
   constant-size in the number of keys);
2. probe the bitmap in the fact scan as a whole-stage-codegen projection
   predicate (xxhash64 + element_at over an array literal — no Python,
   no shuffle), dropping ~(1-fpp) of non-matching rows BEFORE the
   shuffle;
3. finish with the exact semi-join on the survivors, so false positives
   are eliminated and the result is bit-identical to the plain semi-join.

The reference engine has no sketch pre-filtering (its joins ship every
row to the reducer — ra2mr/ra2mr.py mapper/reducer join); this is the
Spark-first scale path for the same logical semi-join semantics.

Sizing: m ≈ -n·ln(p) / (ln 2)², k ≈ (m/n)·ln 2 for n expected keys and
false-positive rate p. The default (m=2^17, k=5) holds p < 1% up to
~13k keys — right for the gate's dimensions; at 100 TB pass the real
key count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_bitmap", "bloom_probe", "bloom_semi_join"]


def _positions(key: str, n_bits: int, n_hashes: int) -> list[str]:
    """SQL expressions for the k bit positions of ``key``.

    Double hashing (Kirsch–Mitzenmaucher): pos_i = h1 + i·h2 mod m, from
    two independent xxhash64 seeds — k positions for two hash evaluations.
    Each hash reduces mod m before combining so the sum stays far from
    int64 range (the session runs ANSI mode; raw hash sums would overflow).
    """
    h1 = f"pmod(xxhash64({key}, 1), {n_bits})"
    h2 = f"pmod(xxhash64({key}, 2), {n_bits})"
    return [f"pmod({h1} + {i} * {h2}, {n_bits})" for i in range(n_hashes)]


def bloom_bitmap(
    dim: DataFrame, key: str, n_bits: int = 1 << 17, n_hashes: int = 5
) -> list[int]:
    """Distributed Bloom build → bitmap as ``n_bits/64`` Python ints.

    The per-key bit positions explode map-side, ``bit_or`` partials
    combine before the (tiny, ≤ n_bits/64-row) shuffle, and only the
    finished words reach the driver — the same driver-side footprint as
    a broadcast join build, but constant in the dimension's row count.
    """
    n_words = (n_bits + 63) // 64
    pos = F.explode(
        F.array([F.expr(p) for p in _positions(key, n_bits, n_hashes)])
    ).alias("pos")
    words = (
        dim.select(pos)
        .groupBy(F.expr("cast(pos div 64 as int)").alias("word"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))")
            ).alias("bits")
        )
        .collect()
    )
    bitmap = [0] * n_words
    for row in words:
        bitmap[row["word"]] = row["bits"]
    return bitmap


def bloom_probe(
    fact: DataFrame,
    key: str,
    bitmap: list[int],
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Keep fact rows whose ``key`` MAY be in the bloomed dimension.

    The bitmap rides the plan as one array<bigint> literal (the local
    stand-in for a broadcast variable); each probe is pure JVM
    arithmetic inside whole-stage codegen, evaluated before any shuffle.
    May pass false positives — compose with an exact join for exactness.
    """
    bm = F.lit(bitmap)
    pred: Column | None = None
    for p in _positions(key, n_bits, n_hashes):
        word = F.expr(f"cast(({p}) div 64 as int)")
        mask = F.expr(f"shiftleft(cast(1 as bigint), cast(({p}) % 64 as int))")
        bit = F.element_at(bm, word + F.lit(1)).bitwiseAND(mask) != F.lit(0)
        pred = bit if pred is None else (pred & bit)
    return fact.filter(pred)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Exact ``fact ⋉ dim``: Bloom prefilter, then the real semi-join.

    Result is identical to ``fact.join(dim, fact[k]==dim[k], "left_semi")``
    — the final semi-join removes the Bloom's false positives — but the
    shuffle (or broadcast probe) only sees the prefiltered survivors.
    """
    bitmap = bloom_bitmap(dim.select(dim_key).distinct(), dim_key, n_bits, n_hashes)
    survivors = bloom_probe(fact, fact_key, bitmap, n_bits, n_hashes)
    return survivors.join(
        dim.select(dim_key).distinct(),
        survivors[fact_key] == dim[dim_key],
        "left_semi",
    )
