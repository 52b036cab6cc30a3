"""Text-analysis operators over the ``documents`` table.

Capability extension beyond the reference (which has zero scalar functions
— its expression language is attr/literal/EQ/AND only,
ra2spark/ra2spark.py:26-45). These are the text-pipeline primitives a
training-data curation job needs: language ID, quality scoring, token
counting, fingerprinting.

All of them are pure Spark SQL expressions (JVM-side, whole-stage codegen,
no Python in the hot path) and each has an exact DuckDB twin so the oracle
can verify values bit-for-bit. At 100 TB these are embarrassingly parallel
map-only operators — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "LANG_MARKERS",
    "with_lang_id",
    "with_quality",
    "with_token_counts",
    "with_fingerprint",
    "ORACLE_EXPRS",
]

# Stopword markers per language for the n-gram language-ID heuristic.
# Counting is substring-occurrence arithmetic (length-difference trick) so
# any SQL engine reproduces it exactly.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " a ", " is "),
    "es": (" el ", " la ", " que "),
    "fr": (" le ", " les ", " est "),
    "de": (" der ", " die ", " und "),
}

_TOKEN_RE = "[a-z0-9]+"
# BPE-ish pretokenizer (GPT-2 shape, sans contractions — apostrophes would
# need dialect-divergent quote escaping): space-prefixed letter runs, digit
# runs, punctuation runs, residual whitespace runs. Both Java regex (Spark)
# and RE2 (DuckDB) use leftmost-first alternation, so the two engines
# produce the same token stream.
_BPE_RE = r" ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+|\s+"
_FP_MOD = 1_000_000_007


def _occ(dialect: str, text: str, sub: str) -> str:
    """Occurrence count of ``sub`` in ``text`` — integer, both dialects."""
    lit = sub.replace("'", "''")
    n = len(sub)
    diff = f"(length({text}) - length(replace({text}, '{lit}', '')))"
    return f"({diff} DIV {n})" if dialect == "spark" else f"({diff} // {n})"


def _lang_count(dialect: str, text: str, lang: str) -> str:
    padded = f"concat(' ', lower({text}), ' ')"
    return "(" + " + ".join(_occ(dialect, padded, m) for m in LANG_MARKERS[lang]) + ")"


def _lang_case(dialect: str, text: str) -> str:
    """Arg-max over marker counts → language code; 'und' when all zero."""
    counts = {lg: _lang_count(dialect, text, lg) for lg in LANG_MARKERS}
    branches = []
    langs = list(LANG_MARKERS)
    for i, lg in enumerate(langs):
        others = [counts[o] for o in langs[i + 1 :]]
        cond = " AND ".join([f"{counts[lg]} > 0"] + [f"{counts[lg]} >= {o}" for o in others])
        branches.append(f"WHEN {cond} THEN '{lg}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


def _token_count(dialect: str, text: str) -> str:
    if dialect == "spark":
        return f"size(regexp_extract_all(lower({text}), '{_TOKEN_RE}', 0))"
    return f"len(regexp_extract_all(lower({text}), '{_TOKEN_RE}'))"


def _quality(dialect: str, text: str) -> str:
    """Quality score: alpha-density × capped mean token length.

    Integer ingredients, one double division at the end → deterministic
    across engines.
    """
    ntok = _token_count(dialect, text)
    nchar = f"length({text})"
    # DuckDB regexp_replace is first-match-only without the 'g' flag
    flags = "" if dialect == "spark" else ", 'g'"
    nalpha = f"length(regexp_replace({text}, '[^a-zA-Z0-9]', ''{flags}))"
    return (
        f"round(cast({nalpha} as double) / {nchar} "
        f"* least(cast({nalpha} as double) / greatest({ntok}, 1), 8.0) / 8.0, 6)"
    )


def _fp_rolling(dialect: str, text: str) -> str:
    """Polynomial rolling hash over characters, mod 1e9+7 (left fold)."""
    if dialect == "spark":
        chars = f"transform(sequence(1, length({text})), i -> ascii(substring({text}, i, 1)))"
        return f"aggregate({chars}, 0L, (acc, x) -> (acc * 31 + x) % {_FP_MOD})"
    chars = f"list_transform(generate_series(1, length({text})), i -> ascii({text}[i]))"
    return (
        f"list_reduce(list_prepend(cast(0 as bigint), {chars}), "
        f"(acc, x) -> (acc * 31 + x) % {_FP_MOD})"
    )


def _count_re(dialect: str, text: str, pattern: str, lower: bool = False) -> str:
    src = f"lower({text})" if lower else text
    if dialect == "spark":
        return f"size(regexp_extract_all({src}, '{pattern}', 0))"
    return f"len(regexp_extract_all({src}, '{pattern}'))"


def _readability(dialect: str, text: str) -> str:
    """Flesch-Kincaid grade from three regexp counts (words, sentence
    terminators, vowel groups as the standard syllable proxy) — integer
    ingredients, double divisions with literal coefficients, identical
    in both engines."""
    words = f"greatest({_token_count(dialect, text)}, 1)"
    sents = f"greatest({_count_re(dialect, text, '[.!?]+')}, 1)"
    sylls = f"greatest({_count_re(dialect, text, '[aeiouy]+', lower=True)}, 1)"
    return (
        f"round(cast(0.39 as double) * {words} / {sents} "
        f"+ cast(11.8 as double) * {sylls} / {words} "
        f"- cast(15.59 as double), 6)"
    )


# name → (spark_sql_expr, duckdb_sql_expr); input column is always `text`.
ORACLE_EXPRS: dict[str, tuple[str, str]] = {
    "lang_id": (_lang_case("spark", "text"), _lang_case("duck", "text")),
    "quality": (_quality("spark", "text"), _quality("duck", "text")),
    "n_tokens": (_token_count("spark", "text"), _token_count("duck", "text")),
    "n_ws_tokens": (
        "size(split(text, ' '))",
        "len(string_split(text, ' '))",
    ),
    "n_bpe_tokens": (
        f"size(regexp_extract_all(lower(text), '{_BPE_RE}', 0))",
        f"len(regexp_extract_all(lower(text), '{_BPE_RE}'))",
    ),
    "fp": (_fp_rolling("spark", "text"), _fp_rolling("duck", "text")),
    "fk_grade": (_readability("spark", "text"), _readability("duck", "text")),
    "n_sentences": (
        _count_re("spark", "text", "[.!?]+"),
        _count_re("duck", "text", "[.!?]+"),
    ),
    "n_syllables": (
        _count_re("spark", "text", "[aeiouy]+", lower=True),
        _count_re("duck", "text", "[aeiouy]+", lower=True),
    ),
}


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_id", F.expr(_lang_case("spark", text_col)))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("quality", F.expr(_quality("spark", text_col)))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        df.withColumn("n_tokens", F.expr(_token_count("spark", text_col)))
        .withColumn("n_ws_tokens", F.expr(f"size(split({text_col}, ' '))"))
        .withColumn(
            "n_bpe_tokens",
            F.expr(f"size(regexp_extract_all(lower({text_col}), '{_BPE_RE}', 0))"),
        )
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fp", F.expr(_fp_rolling("spark", text_col)))
