"""Zero-cost pipeline observability via ``Dataset.observe``.

A 100 TB curation job cannot afford a second scan just to know what it
did — "how many docs did the quality gate reject, and why" must ride the
SAME job that produces the output. Spark's ``observe()`` API attaches
named aggregate metrics to a point in the plan; they are computed by the
executors as rows stream past (accumulator-style) and surface on the
driver after the action, costing zero extra passes and zero extra
shuffles.

``observed_quality_gate`` wraps the corpus quality gate (the same
predicate ``pipeline_training_data`` applies) with admission metrics:

    gated, obs = observed_quality_gate(docs)
    gated.write.parquet(...)          # one job
    obs.get                           # {'n_seen': ..., 'n_admitted': ...}

The metrics are exact (they see every row of the observed plan node,
whatever happens downstream) and work identically under batch and
foreachBatch streaming sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from . import text

__all__ = [
    "quality_keep_predicate",
    "observed_quality_gate",
    "observed_quality_gate_stream",
]


def quality_keep_predicate():
    """The pipeline's admission predicate (same as pipeline_training_data)."""
    ntok = F.expr(text.ORACLE_EXPRS["n_tokens"][0])
    qual = F.expr(text.ORACLE_EXPRS["quality"][0])
    lang = F.expr(text.ORACLE_EXPRS["lang_id"][0])
    return (ntok >= 20) & (ntok <= 1000) & (qual > 0.3) & (lang != "und")


def observed_quality_gate(
    docs: DataFrame, name: str = "quality_gate"
) -> tuple[DataFrame, Observation]:
    """Apply the quality gate and observe admission metrics in-flight.

    Returns (admitted_df, observation). The observation reports, from
    the one job that executes ``admitted_df``:

    * ``n_seen`` — rows that reached the gate,
    * ``n_admitted`` — rows that passed,
    * ``n_too_short`` / ``n_too_long`` / ``n_low_quality`` /
      ``n_lang_unknown`` — rejection reasons (a row may count in several),
    * ``sum_admitted_chars`` — admitted payload volume.
    """
    ntok = F.expr(text.ORACLE_EXPRS["n_tokens"][0])
    qual = F.expr(text.ORACLE_EXPRS["quality"][0])
    lang = F.expr(text.ORACLE_EXPRS["lang_id"][0])
    keep = quality_keep_predicate()

    obs = Observation(name)
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_seen"),
        F.sum(keep.cast("long")).alias("n_admitted"),
        F.sum((ntok < 20).cast("long")).alias("n_too_short"),
        F.sum((ntok > 1000).cast("long")).alias("n_too_long"),
        F.sum((qual <= 0.3).cast("long")).alias("n_low_quality"),
        F.sum((lang == "und").cast("long")).alias("n_lang_unknown"),
        F.sum(F.when(keep, F.length("text")).otherwise(0)).alias(
            "sum_admitted_chars"
        ),
    )
    return observed.filter(keep), obs


def observed_quality_gate_stream(docs_stream: DataFrame, name: str = "quality_gate") -> DataFrame:
    """Streaming form: string-named ``observe`` on the stream itself.

    ``Observation.get`` blocks on batch-action completion and is not the
    streaming surface; for streams the metrics arrive per micro-batch in
    each progress event (``query.recentProgress[i]["observedMetrics"]
    [name]``) — the supported monitoring channel. Same metric set as the
    batch gate, same zero extra passes.
    """
    ntok = F.expr(text.ORACLE_EXPRS["n_tokens"][0])
    qual = F.expr(text.ORACLE_EXPRS["quality"][0])
    lang = F.expr(text.ORACLE_EXPRS["lang_id"][0])
    keep = quality_keep_predicate()
    observed = docs_stream.observe(
        name,
        F.count(F.lit(1)).alias("n_seen"),
        F.sum(keep.cast("long")).alias("n_admitted"),
        F.sum((ntok < 20).cast("long")).alias("n_too_short"),
        F.sum((ntok > 1000).cast("long")).alias("n_too_long"),
        F.sum((qual <= 0.3).cast("long")).alias("n_low_quality"),
        F.sum((lang == "und").cast("long")).alias("n_lang_unknown"),
        F.sum(F.when(keep, F.length("text")).otherwise(0)).alias(
            "sum_admitted_chars"
        ),
    )
    return observed.filter(keep)
