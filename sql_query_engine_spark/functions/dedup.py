"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Capability extension beyond the reference (whose only dedup is the implicit
DISTINCT of its Project operator, ra2spark/ra2spark.py:89-93). These are the
dedup families a training-data pipeline needs:

* exact dedup          — hash-groupBy on content (or md5 of content)
* MinHash + LSH        — shingle → minhash signature → band → bucket-join,
                         then exact-Jaccard verification of candidates
* SimHash              — per-token bit votes → 48-bit fingerprint →
                         Hamming-distance pairs
* n-gram Jaccard       — exact pairwise Jaccard via shingle inverted index
* embedding cosine     — near-dup pairs over the embedding column

Scale design (the 100 TB story):

* Everything is expressed as DataFrame ops — explode / groupBy / join — so
  the shuffles are the *intended* ones: by shingle (inverted index), by
  (band, signature) (LSH bucket), never an all-pairs cross join except in
  the explicitly-quadratic exact verifier, which at scale only ever runs on
  LSH candidates (tiny).
* The n-gram inverted index is the classic frequency-bounded join: a
  stop-shingle appearing in f docs contributes f² pairs. At 100 TB you cap
  or drop top-frequency shingles; here df filtering keeps the demo exact.
* All hashing is md5-based modular arithmetic (functions/hashing.py) so the
  DuckDB oracle reproduces every value exactly — no Spark-private hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import (
    MERSENNE_P,
    MINHASH_PERMS,
    duck_hex48,
    duck_tokens,
    duck_trigrams,
    spark_hex48,
    spark_tokens,
    spark_trigrams,
)

__all__ = [
    "exact_dedup",
    "shingled_docs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_oracle",
    "simhash_fingerprints",
    "simhash_fingerprints_oracle",
    "simhash_pairs",
    "simhash_pairs_oracle",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_oracle",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_oracle",
]

N_BANDS = 4
ROWS_PER_BAND = 4  # N_BANDS * ROWS_PER_BAND == len(MINHASH_PERMS)
SIMHASH_BITS = 48


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, key: str = "text") -> DataFrame:
    """Exact dedup: one canonical row (min doc_id) per distinct content.

    A single hash-aggregate shuffle on the content key; at 100 TB prefer
    grouping on ``md5(text)`` (fixed 32-byte shuffle key) over raw text —
    see the `dedup_exact_hash` query.
    """
    return docs.groupBy(key).agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies")
    )


# --------------------------------------------------------------------------
# shared shingling
# --------------------------------------------------------------------------

def shingled_docs(docs: DataFrame) -> DataFrame:
    """doc_id + distinct word-trigram shingle array (docs with ≥1 shingle)."""
    toks = spark_tokens("text")
    return (
        docs.select("doc_id", F.expr(spark_trigrams(toks)).alias("sh"))
        .filter(F.expr("size(sh) > 0"))
    )


_DUCK_SHINGLED = f"""
    __toks AS (
        SELECT doc_id, {duck_tokens('text')} AS t FROM documents
    ),
    __sh AS (
        SELECT doc_id, {duck_trigrams('t')} AS sh FROM __toks
    ),
    shingled AS (
        SELECT doc_id, sh FROM __sh WHERE len(sh) > 0
    )
"""


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def _spark_minhash_cols() -> list:
    cols = []
    for k, (a, b) in enumerate(MINHASH_PERMS):
        cols.append(
            F.expr(
                f"array_min(transform(xs, x -> ({a} * x + {b}) % {MERSENNE_P}))"
            ).alias(f"mh{k}")
        )
    return cols


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs via MinHash signatures + LSH banding + exact verify.

    Pipeline: shingle → 48-bit shingle hash → 16 minhashes → 4 bands of 4 →
    shuffle by (band, band-signature) → candidate pairs where any band
    collides → verify exact Jaccard ≥ threshold on the candidate set only.

    At 100 TB the band-join is the only all-data shuffle; its key
    cardinality is huge (band signatures), so it partitions evenly, and the
    quadratic blow-up is confined to same-signature buckets (true
    near-dups, plus ~J⁴-rate false positives that verification removes).
    """
    sh = shingled_docs(docs)
    xs = sh.withColumn("xs", F.expr(f"transform(sh, s -> {spark_hex48('s')} % {MERSENNE_P})"))
    sigs = xs.select("doc_id", *_spark_minhash_cols())

    band_structs = []
    for j in range(N_BANDS):
        ms = [f"mh{j * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        band_structs.append(
            f"struct({j} as band, concat_ws('-', {', '.join(ms)}) as bsig)"
        )
    bands = sigs.select(
        "doc_id", F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bsig").alias("bsig"))

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, ["band", "bsig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    da, db = sh.alias("da"), sh.alias("db")
    ver = (
        cand.join(da, cand["doc_a"] == da["doc_id"])
        .join(db, cand["doc_b"] == db["doc_id"])
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "cast(size(array_intersect(da.sh, db.sh)) as double)"
                " / (size(da.sh) + size(db.sh) - size(array_intersect(da.sh, db.sh)))"
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return ver


def minhash_lsh_pairs_oracle(threshold: float = 0.5) -> str:
    """DuckDB twin of :func:`minhash_lsh_pairs` — identical constants."""
    mh_cols = ", ".join(
        f"list_min(list_transform(xs, x -> ({a} * x + {b}) % {MERSENNE_P})) AS mh{k}"
        for k, (a, b) in enumerate(MINHASH_PERMS)
    )
    band_selects = []
    for j in range(N_BANDS):
        ms = [f"mh{j * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        concat = " || '-' || ".join(f"cast({m} as varchar)" for m in ms)
        band_selects.append(f"SELECT doc_id, {j} AS band, {concat} AS bsig FROM sigs")
    bands_sql = " UNION ALL ".join(band_selects)
    return f"""
WITH {_DUCK_SHINGLED},
xs AS (
    SELECT doc_id, sh,
           list_transform(sh, s -> {duck_hex48('s')} % {MERSENNE_P}) AS xs
    FROM shingled
),
sigs AS (SELECT doc_id, {mh_cols} FROM xs),
bands AS ({bands_sql}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b USING (band, bsig)
    WHERE a.doc_id < b.doc_id
),
ver AS (
    SELECT doc_a, doc_b,
           cast(len(list_intersect(da.sh, db.sh)) as double)
             / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) AS jaccard
    FROM cand
    JOIN shingled da ON da.doc_id = cand.doc_a
    JOIN shingled db ON db.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard FROM ver WHERE jaccard >= {threshold}
"""


# --------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index join)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact pairwise word-trigram Jaccard via an inverted shingle index.

    explode → self-join on shingle → per-pair intersection counts →
    Jaccard. The join key is the shingle itself: at scale, drop or cap
    stop-shingles (document frequency above a bound) before the self-join —
    they contribute O(f²) pairs and near-zero Jaccard evidence.
    """
    sh = shingled_docs(docs)
    sizes = sh.select("doc_id", F.expr("size(sh)").alias("n"))
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    la, lb = sizes.alias("la"), sizes.alias("lb")
    return (
        inter.join(la, inter["doc_a"] == la["doc_id"])
        .join(lb, inter["doc_b"] == lb["doc_id"])
        .select(
            "doc_a",
            "doc_b",
            F.expr("cast(i as double) / (la.n + lb.n - i)").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs_oracle(threshold: float = 0.5) -> str:
    return f"""
WITH {_DUCK_SHINGLED},
sizes AS (SELECT doc_id, len(sh) AS n FROM shingled),
ex AS (SELECT doc_id, unnest(sh) AS s FROM shingled),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
    FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(cast(i as double) / (la.n + lb.n - i), 6) AS jaccard
FROM inter
JOIN sizes la ON la.doc_id = doc_a
JOIN sizes lb ON lb.doc_id = doc_b
WHERE cast(i as double) / (la.n + lb.n - i) >= {threshold}
"""


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _spark_jp_array() -> str:
    """Literal array of (bit index j, 2^j) structs."""
    entries = ", ".join(f"struct({j} as j, {1 << j}L as p)" for j in range(SIMHASH_BITS))
    return f"array({entries})"


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """48-bit SimHash per document over word-trigram shingle features.

    Classic SimHash re-expressed relationally: explode shingles, explode
    bit positions, ±1 vote per (doc, bit), majority vote per bit,
    recompose the integer fingerprint. Pure groupBy arithmetic — two
    hash-aggregate shuffles keyed by (doc_id, bit) then doc_id, both
    high-cardinality and skew-free at any scale.

    Features are trigram *shingles*, not unigrams: unigram vocabularies
    overlap too heavily between unrelated documents (verified on the test
    corpus — unigram SimHash collapses to hamming≈0 everywhere), while
    shingle sets keep unrelated pairs near the binomial(48, ½) midpoint.
    """
    tok = (
        shingled_docs(docs)
        .select("doc_id", F.explode("sh").alias("tok"))
        .withColumn("x", F.expr(spark_hex48("tok")))
    )
    bits = tok.select(
        "doc_id", "x", F.explode(F.expr(_spark_jp_array())).alias("jp")
    ).select(
        "doc_id",
        F.col("jp.j").alias("j"),
        F.col("jp.p").alias("p"),
        F.expr("((x DIV jp.p) % 2) * 2 - 1").alias("s"),
    )
    votes = bits.groupBy("doc_id", "j", "p").agg(F.sum("s").alias("tot"))
    return votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("tot") > 0, F.col("p")).otherwise(F.lit(0))).alias("simhash")
    )


def _duck_simhash_cte() -> str:
    js = ", ".join(str(j) for j in range(SIMHASH_BITS))
    ps = ", ".join(f"cast({1 << j} as bigint)" for j in range(SIMHASH_BITS))
    return f"""{_DUCK_SHINGLED},
tok AS (
    SELECT doc_id, unnest(sh) AS tok FROM shingled
),
tx AS (SELECT doc_id, {duck_hex48('tok')} AS x FROM tok),
jp AS (SELECT unnest([{js}]) AS j, unnest([{ps}]) AS p),
bits AS (
    SELECT doc_id, j, p, ((x // p) % 2) * 2 - 1 AS s FROM tx CROSS JOIN jp
),
votes AS (SELECT doc_id, j, p, sum(s) AS tot FROM bits GROUP BY 1, 2, 3),
fp AS (
    SELECT doc_id,
           cast(sum(CASE WHEN tot > 0 THEN p ELSE 0 END) as bigint) AS simhash
    FROM votes GROUP BY 1
)
"""


def simhash_fingerprints_oracle() -> str:
    return f"WITH {_duck_simhash_cte()} SELECT doc_id, simhash FROM fp"


def simhash_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs: Hamming distance between SimHash fingerprints.

    All-pairs here (500 docs); at scale, LSH over fingerprint chunks
    (split the 48 bits into bands, bucket-join on band equality — Hamming-
    close pairs must collide on ≥1 band) replaces the quadratic join.
    """
    fp = simhash_fingerprints(docs)
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_oracle(max_hamming: int = 8) -> str:
    return f"""
WITH {_duck_simhash_cte()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

_SPARK_NORM2 = (
    "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
)
_DUCK_NORM2 = (
    "list_reduce(list_prepend(cast(0 as double),"
    " list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b)"
)
# dot product folded left in ascending index order — bit-identical on both
# engines because every product is float32*float32 widened to double and the
# accumulation order is fixed.
_SPARK_DOT = (
    "aggregate(zip_with(a.embedding, b.embedding,"
    " (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
)


def _duck_dot(av: str, bv: str, dim: int = 64) -> str:
    return (
        f"list_reduce(list_prepend(cast(0 as double),"
        f" list_transform(generate_series(1, {dim}),"
        f" i -> {av}[i]::DOUBLE * {bv}[i]::DOUBLE)), (x, y) -> x + y)"
    )


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.45) -> DataFrame:
    """Near-dup vector pairs by cosine similarity (brute-force verifier).

    Quadratic by construction — the exactness baseline. The scale path is
    the LSH-bucketed variant in functions/similarity.py, which confines the
    pairwise work to same-bucket candidates.
    """
    n = emb.select("vec_id", "embedding", F.expr(_SPARK_NORM2).alias("n2"))
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (F.expr(_SPARK_DOT) / (F.sqrt(F.col("a.n2")) * F.sqrt(F.col("b.n2")))).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )


def embedding_neardup_pairs_oracle(threshold: float = 0.45) -> str:
    return f"""
WITH n AS (
    SELECT vec_id, embedding, {_DUCK_NORM2} AS n2 FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({_duck_dot('a.embedding', 'b.embedding')}
             / (sqrt(a.n2) * sqrt(b.n2)), 6) AS cos
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {_duck_dot('a.embedding', 'b.embedding')} / (sqrt(a.n2) * sqrt(b.n2))
      >= {threshold}
"""
