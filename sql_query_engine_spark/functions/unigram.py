"""Unigram-LM (SentencePiece-style) Viterbi segmentation.

The second major subword-tokenizer family beside BPE (functions/bpe.py):
instead of greedy merges, each word is segmented into the MINIMUM-COST
sequence of vocabulary pieces by Viterbi dynamic programming — the
inference step of Kudo's unigram language model (ACL 2018, public
literature; SentencePiece's default algorithm). Production pipelines
price corpora under candidate tokenizers before committing to one, so
the per-doc piece/cost accounting is a first-class curation signal.

Determinism contract (the repo's exactness discipline):

* piece costs are INTEGER milli-nats — a fixed literal vocabulary, no
  floats anywhere, so cross-engine ties are impossible by construction;
* the DP state is ONE packed integer,
  ``(cost << 20) + (n_pieces << 10) + n_fallback``: a single ``min()``
  minimizes cost, breaks cost ties toward fewer pieces, and breaks
  those toward fewer single-char fallbacks — the whole tie law is one
  integer comparison, identical in both engines (the winnowing pack
  trick applied to Viterbi);
* every [a-z0-9] character is in the vocabulary as a high-cost
  fallback, so every word the shared pretokenizer emits segments;
* words of ``MAX_WORD_LEN`` (1000) chars or more are dropped by BOTH
  engines identically — the 10-bit piece/fallback fields bound the
  packing (cost ≤ 4e6 milli → packed < 2^43, far under bigint).

The Spark side runs the DP in an Arrow-batched ``mapInPandas`` stage
(the bpe.py plumbing — one Python worker per partition, zero shuffles);
the DuckDB oracle replays it as a recursive CTE walking one character
per iteration, carrying the last ``MAX_PIECE_LEN`` best states as
columns (a bounded horizon needs no recursive aggregation), with
``least()`` over the per-length candidates as the packed min (NULL
candidates — piece not in vocab — drop out).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

# (piece, cost in milli-nats). Fixed literal vocabulary: common English
# subwords at plausible relative costs + every [a-z0-9] char as a
# high-cost fallback so segmentation never fails. Costs are synthetic
# but ORDERED like a real unigram LM (frequent pieces cheap).
_MULTI: tuple[tuple[str, int], ...] = (
    ("the", 1500), ("ing", 1700), ("tion", 1900), ("and", 1600),
    ("er", 1200), ("in", 1100), ("re", 1250), ("on", 1300),
    ("at", 1350), ("en", 1400), ("an", 1320), ("es", 1280),
    ("or", 1450), ("te", 1550), ("ed", 1380), ("st", 1420),
    ("ar", 1480), ("ou", 1520), ("al", 1460), ("to", 1340),
    ("it", 1360), ("is", 1330), ("of", 1310), ("le", 1440),
    ("ment", 2100), ("able", 2200), ("ness", 2300), ("ter", 1800),
    ("ers", 1850), ("ent", 1750), ("ion", 1720), ("pre", 1950),
    ("con", 1900), ("com", 1920), ("ver", 1880), ("der", 1860),
)
_FALLBACK_COST = 4000  # per single character
VOCAB: dict[str, int] = {
    **{c: _FALLBACK_COST for c in "abcdefghijklmnopqrstuvwxyz0123456789"},
    **dict(_MULTI),
}
MAX_PIECE_LEN = max(len(p) for p in VOCAB)
MAX_WORD_LEN = 1000  # keeps the 10-bit piece/fallback fields exact
_P_SHIFT = 1 << 10   # n_pieces field
_C_SHIFT = 1 << 20   # cost field sits above pieces+fallback


def _step(ln: int) -> int:
    """Packed increment for taking one piece of length ``ln`` (cost is
    added separately): one piece, plus one fallback when single-char."""
    return _P_SHIFT + (1 if ln == 1 else 0)


def viterbi_word(word: str) -> tuple[int, int, int]:
    """(total_cost_milli, n_pieces, n_fallback) of the packed-optimal
    segmentation. Pure reference implementation; the Arrow stage and
    the SQL oracle must match it bit for bit."""
    n = len(word)
    if n == 0 or n >= MAX_WORD_LEN:
        return 0, 0, 0
    best = [None] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        b = None
        for ln in range(1, min(MAX_PIECE_LEN, i) + 1):
            prev = best[i - ln]
            cost = VOCAB.get(word[i - ln : i])
            if prev is None or cost is None:
                continue
            cand = prev + cost * _C_SHIFT + _step(ln)
            if b is None or cand < b:
                b = cand
        best[i] = b
    packed = best[n]
    return (
        packed // _C_SHIFT,
        (packed % _C_SHIFT) // _P_SHIFT,
        packed % _P_SHIFT,
    )


_OUT_SCHEMA = (
    "doc_id long, n_words long, n_pieces long,"
    " total_cost_milli long, n_fallback long"
)


def segment_counts(docs: "DataFrame") -> "DataFrame":
    """Per-doc unigram-LM accounting: words, optimal piece count, total
    segmentation cost (milli-nats), single-char fallback count — the
    tokenizer-pricing signals a corpus report needs (high fallback
    fraction = out-of-vocabulary-heavy text). Pretokenization is the
    shared ``[a-z0-9]+`` lowercase rule, so the word universe matches
    every other text operator."""
    import re

    import pandas as pd

    tok = re.compile(r"[a-z0-9]+")

    def _encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {
                "doc_id": [], "n_words": [], "n_pieces": [],
                "total_cost_milli": [], "n_fallback": [],
            }
            for doc_id, txt in zip(pdf["doc_id"], pdf["text"]):
                words = [
                    w for w in tok.findall((txt or "").lower())
                    if len(w) < MAX_WORD_LEN
                ]
                c = p = f = 0
                for w in words:
                    wc, wp, wf = viterbi_word(w)
                    c += wc
                    p += wp
                    f += wf
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(words))
                out["n_pieces"].append(p)
                out["total_cost_milli"].append(c)
                out["n_fallback"].append(f)
            yield pd.DataFrame(out)

    src = docs.select("doc_id", "text")
    par = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    return src.mapInPandas(_encode, _OUT_SCHEMA)


def _cost_case(expr: str, ln: int) -> str:
    """CASE lookup of the piece cost for all vocabulary entries of
    length ``ln`` (NULL when absent — the DP candidate drops out)."""
    items = sorted((p, c) for p, c in VOCAB.items() if len(p) == ln)
    whens = " ".join(f"WHEN '{p}' THEN {c}" for p, c in items)
    return f"(CASE {expr} {whens} ELSE NULL END)"


def segment_counts_oracle() -> str:
    """DuckDB twin: the packed Viterbi DP as a recursive CTE advancing
    one character per iteration, carrying best states for the last
    MAX_PIECE_LEN positions as columns (b1 = current position, b2..b4
    the three before); ``least()`` over the per-length candidates IS
    the packed min, and NULL (out-of-vocab) candidates drop out. The
    DISTINCT-word vocabulary keeps the recursion per unique word, not
    per occurrence (the bpe-oracle trick). Validated char-exact against
    the brute-force enumeration of all segmentations in tests."""
    cands = []
    for ln in range(1, MAX_PIECE_LEN + 1):
        sub = f"substr(word, i + 2 - {ln}, {ln})"
        cands.append(
            f"CASE WHEN i + 1 >= {ln} THEN b{ln}"
            f" + cast({_cost_case(sub, ln)} as bigint) * {_C_SHIFT}"
            f" + {_step(ln)} ELSE NULL END"
        )
    least = "least(" + ",\n                 ".join(cands) + ")"
    return f"""
WITH RECURSIVE
docs_w AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
    FROM documents),
kept AS (SELECT doc_id, word FROM docs_w WHERE len(word) < {MAX_WORD_LEN}),
words AS (SELECT DISTINCT word FROM kept),
dp AS (
    SELECT word, 0 AS i,
           cast(0 as bigint) AS b1, cast(NULL as bigint) AS b2,
           cast(NULL as bigint) AS b3, cast(NULL as bigint) AS b4
    FROM words
    UNION ALL
    SELECT word, i + 1,
           {least} AS b1,
           b1 AS b2, b2 AS b3, b3 AS b4
    FROM dp WHERE i < len(word)),
word_stats AS (
    SELECT word,
           b1 // {_C_SHIFT} AS cost,
           (b1 % {_C_SHIFT}) // {_P_SHIFT} AS pieces,
           b1 % {_P_SHIFT} AS fallback
    FROM dp WHERE i = len(word)),
agg AS (
    SELECT k.doc_id,
           count(*) AS n_words,
           sum(ws.pieces) AS n_pieces,
           sum(ws.cost) AS total_cost_milli,
           sum(ws.fallback) AS n_fallback
    FROM kept k JOIN word_stats ws ON ws.word = k.word
    GROUP BY k.doc_id)
SELECT d.doc_id,
       cast(coalesce(a.n_words, 0) as bigint) AS n_words,
       cast(coalesce(a.n_pieces, 0) as bigint) AS n_pieces,
       cast(coalesce(a.total_cost_milli, 0) as bigint) AS total_cost_milli,
       cast(coalesce(a.n_fallback, 0) as bigint) AS n_fallback
FROM documents d LEFT JOIN agg a USING (doc_id)
"""
