"""Document chunking — Python UDTF surface.

Chunking long documents into overlapping fixed-token windows is a core
LLM-training-data operation (context-length packing, RAG indexing). It is
also the engine's demonstration of the Python **UDTF** surface
(SURVEY.md §2.3 lists UDF/UDAF/UDTF as wholly absent in the reference):
one input row → many output rows with custom logic, invoked from SQL via
``LATERAL``.

The chunk content is plain token-slice joins, so a DuckDB oracle can
reproduce it exactly (generate_series over chunk starts + list slicing) —
the UDTF is the *mechanism* being exercised, not an excuse for
unverifiable output.

Scale: UDTF evaluation is row-at-a-time Python — fine here because the
fan-out logic is trivial and per-doc; for bulk chunking of 100 TB prefer
the pure-SQL formulation (also provided: :func:`chunk_expr_sql`) which
stays in the JVM. Both produce identical rows; tests assert it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

__all__ = ["ChunkText", "register_chunk_udtf", "chunk_documents_udtf", "chunk_documents_sql"]

CHUNK_SIZE = 40
CHUNK_STRIDE = 30  # 10-token overlap


def _check_params(size: int, stride: int) -> None:
    """Overlapping windows require stride ≤ size: a larger stride leaves
    token gaps the last-window break logic silently never covers (found
    by probing; the UDTF and SQL twin disagreed on gapped configs)."""
    if stride < 1 or size < 1:
        raise ValueError("chunk size and stride must be ≥ 1")
    if stride > size:
        raise ValueError(f"stride ({stride}) must be ≤ chunk size ({size})")


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """UDTF: (text, size, stride) → one row per overlapping token window."""

    def eval(self, text: str, size: int, stride: int):
        if text is None:
            return
        _check_params(size, stride)
        # split(' ') + empty-filter == the SQL twin's split on ' +'
        # (runs of spaces); str.split() with no arg would diverge on
        # tabs/newlines, which the SQL/oracle tokenizers treat as
        # ordinary characters.
        tokens = [t for t in text.lower().split(" ") if t]
        if not tokens:
            return
        idx = 0
        for start in range(0, len(tokens), stride):
            window = tokens[start : start + size]
            yield idx, " ".join(window), len(window)
            idx += 1
            if start + size >= len(tokens):
                break


def register_chunk_udtf(spark: SparkSession) -> None:
    spark.udtf.register("chunk_text", ChunkText)


def chunk_documents_udtf(
    spark: SparkSession, docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Chunk via the registered UDTF with a LATERAL correlated call."""
    _check_params(size, stride)
    register_chunk_udtf(spark)
    docs.createOrReplaceTempView("__docs_to_chunk")
    return spark.sql(
        f"""SELECT d.doc_id, c.chunk_idx, c.chunk, c.n_tokens
            FROM __docs_to_chunk d,
            LATERAL chunk_text(d.text, {size}, {stride}) c"""
    )


def chunk_documents_sql(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """JVM-only twin: same chunks via sequence + slice (the bulk path)."""
    _check_params(size, stride)
    toks = docs.select(
        "doc_id", F.expr("filter(split(lower(text), ' +'), t -> t != '')").alias("toks")
    ).filter(F.expr("size(toks) > 0"))
    n_chunks = f"1 + greatest(0, cast(ceil((size(toks) - {size}) / cast({stride} as double)) as int))"
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("chunk_idx"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.expr(
            f"array_join(slice(toks, chunk_idx * {stride} + 1, {size}), ' ')"
        ).alias("chunk"),
        F.expr(f"size(slice(toks, chunk_idx * {stride} + 1, {size}))").alias("n_tokens"),
    )
