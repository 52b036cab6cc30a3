"""Real greedy BPE tokenization as an Arrow-batched ``mapInPandas`` stage.

The engine's JVM-side token statistics (functions/text.py: whitespace +
BPE-ish regex pretokenizer counts) cover the cheap 99% of token
accounting. This module is the remaining 1%: an actual byte-pair-merge
tokenizer with a fixed merge table, exercised through the same plumbing a
production tokenizer (e.g. a HuggingFace fast tokenizer) would use —
``mapInPandas`` over Arrow record batches, one Python worker per input
partition, zero driver involvement. The only possible exchange is a
single round-robin rebalance, taken only when the scan yields fewer
partitions than cores (a one-file local fixture would otherwise run the
Python stage serially); on a real cluster with a many-file table the
stage is shuffle-free. Swapping ``_bpe_word`` for a real tokenizer
library changes nothing about the Spark plan.

SQL expressibility: greedy BPE is an iterative, data-dependent merge
loop — no single relational expression computes it, but a RECURSIVE CTE
does (r9 verdict #5): each recursion step merges the lowest-rank
leftmost adjacent pair (rank*K + position packed into one integer so a
single ``list_min`` implements the rank-then-leftmost rule exactly as
:func:`bpe_word`'s scan does), the frontier drops words with no
applicable merge, and a word's final state is its minimum-length parts
row. :func:`encode_counts_oracle` emits that DuckDB form over the
DISTINCT word vocabulary (the merge loop runs once per unique word, not
per occurrence) — so the query is value-exact oracle-checked, not
rows-only, from r10 on. The pure-Python row-level pin in tests remains
as an independent third implementation.

The merge table is a FIXED literal (deterministic across engines, runs,
partitionings) covering common English digraphs — enough to produce a
non-trivial compression ratio on the gate corpus without pretending to
be a trained vocabulary.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

# (pair) -> priority; lower = merged earlier. Fixed literal table.
MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("e", "n"), ("a", "t"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("a", "r"), ("o", "u"), ("in", "g"),
    ("a", "l"), ("t", "o"), ("i", "t"), ("e", "d"), ("i", "s"),
    ("an", "d"), ("l", "e"), ("o", "f"), ("r", "o"),
)

_RANK = {pair: i for i, pair in enumerate(MERGES)}


def bpe_word(word: str) -> list[str]:
    """Greedy BPE: repeatedly merge the lowest-rank adjacent pair."""
    parts = list(word)
    while len(parts) > 1:
        best_i, best_r = -1, len(_RANK)
        for i in range(len(parts) - 1):
            r = _RANK.get((parts[i], parts[i + 1]), len(_RANK))
            if r < best_r:
                best_i, best_r = i, r
        if best_i < 0 or best_r >= len(_RANK):
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


_OUT_SCHEMA = (
    "doc_id long, n_words long, n_chars_tok long, n_bpe_tokens long"
)

# pack rank*K + (i-1) so one list_min picks (min rank, then leftmost);
# K only needs to exceed the longest possible word (regexp tokens are
# bounded by document length — 2^20 is comfortably past any of them)
_ORACLE_K = 1 << 20


def encode_counts_oracle() -> str:
    """Value-exact DuckDB twin of :func:`encode_counts`: the greedy
    merge loop as a recursive CTE over the distinct word vocabulary.
    Validated against both engines AND the raw pure-Python
    :func:`bpe_word` on the gate corpora (0 mismatches at sf0.01)."""
    case = " ".join(
        f"WHEN '{a}|{b}' THEN {r}" for r, (a, b) in enumerate(MERGES)
    )
    k = _ORACLE_K
    return f"""
WITH RECURSIVE
docs_w AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
    FROM documents),
vocab AS (SELECT DISTINCT word FROM docs_w),
bpe AS (
    SELECT word, regexp_extract_all(word, '.') AS parts
    FROM vocab
    UNION ALL
    SELECT word,
           list_concat(
               list_concat(
                   parts[1:(best % {k})],
                   [parts[(best % {k}) + 1] || parts[(best % {k}) + 2]]),
               parts[(best % {k}) + 3:]) AS parts
    FROM (
        SELECT word, parts,
               list_min(list_transform(range(1, len(parts)),
                   i -> (CASE concat(parts[i], '|', parts[i + 1])
                         {case} ELSE NULL END) * {k} + (i - 1))) AS best
        FROM bpe) t
    WHERE best IS NOT NULL),
word_tok AS (
    SELECT word, min(len(parts)) AS n_bpe, min(len(word)) AS n_chars
    FROM bpe GROUP BY word)
SELECT d.doc_id,
       cast(coalesce(count(w.word), 0) as bigint) AS n_words,
       cast(coalesce(sum(t.n_chars), 0) as bigint) AS n_chars_tok,
       cast(coalesce(sum(t.n_bpe), 0) as bigint) AS n_bpe_tokens
FROM documents d
LEFT JOIN docs_w w USING (doc_id)
LEFT JOIN word_tok t ON t.word = w.word
GROUP BY d.doc_id
"""


def encode_counts(docs: "DataFrame") -> "DataFrame":
    """Per-doc BPE token accounting: words, kept chars, BPE token count.

    Pretokenization matches the JVM tokenizer (lowercase ``[a-z0-9]+``,
    functions/hashing.py) so the word universe is identical to every
    other text operator; each word is then BPE-merged independently
    (standard word-level BPE semantics — merges never cross word
    boundaries).
    """
    import re

    import pandas as pd

    tok = re.compile(r"[a-z0-9]+")

    def _encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"doc_id": [], "n_words": [], "n_chars_tok": [], "n_bpe_tokens": []}
            for doc_id, txt in zip(pdf["doc_id"], pdf["text"]):
                words = tok.findall((txt or "").lower())
                n_bpe = sum(len(bpe_word(w)) for w in words)
                out["doc_id"].append(doc_id)
                out["n_words"].append(len(words))
                out["n_chars_tok"].append(sum(len(w) for w in words))
                out["n_bpe_tokens"].append(n_bpe)
            yield pd.DataFrame(out)

    src = docs.select("doc_id", "text")
    par = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        # One-file local fixtures scan as a single partition, which would
        # serialize the Python stage; rebalance once. Many-file cluster
        # tables skip this branch — the stage is then shuffle-free.
        src = src.repartition(par)
    return src.mapInPandas(_encode, _OUT_SCHEMA)
