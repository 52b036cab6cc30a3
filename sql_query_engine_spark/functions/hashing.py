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
    "spark_trigrams",
    "duck_trigrams",
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


def spark_trigrams(toks: str) -> str:
    """Distinct word 3-gram shingles from a token array (Spark).

    Note: Spark's ``sequence(1, 0)`` is *descending* [1, 0], so short docs
    need an explicit empty-array guard.
    """
    tri = (
        f"transform(sequence(1, size({toks}) - 2), "
        f"i -> concat_ws(' ', element_at({toks}, i), "
        f"element_at({toks}, i + 1), element_at({toks}, i + 2)))"
    )
    return f"array_distinct(case when size({toks}) < 3 then array() else {tri} end)"


def duck_trigrams(toks: str) -> str:
    """Same shingles, DuckDB dialect (generate_series(1,0) is already [])."""
    tri = (
        f"list_transform(generate_series(1, greatest(len({toks}) - 2, 0)), "
        f"i -> concat({toks}[i], ' ', {toks}[i + 1], ' ', {toks}[i + 2]))"
    )
    return f"list_distinct({tri})"
