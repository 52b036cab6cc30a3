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

Why not SQL: greedy BPE is an iterative, data-dependent merge loop
(apply the highest-priority applicable merge, rescan, repeat) — there is
no relational rewrite, which is exactly why this query is registered
rows-only (the honest boundary the oracle gate documents). Correctness
is pinned row-level against an independent pure-Python reference in
tests instead.

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
