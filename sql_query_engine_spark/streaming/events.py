"""Windowed / sessionized operators over the ``events`` table.

Capability extension (the reference has no streaming of any kind,
SURVEY.md §2.3). Every operator here is written batch-first against the
same DataFrame expressions Structured Streaming executes, so:

* the DuckDB oracle can verify the batch result exactly, and
* the identical transformation runs under ``spark.readStream`` (see
  :func:`stream_tumbling_counts` and tests/test_streaming.py, which runs
  the real streaming engine with an availableNow trigger and asserts
  batch/stream equivalence).

Timestamp discipline: ``catalog.normalize_events`` guarantees ``ts`` is
int64 epoch *nanoseconds* regardless of the parquet's physical timestamp
unit. Window bucketing is done in pure int64 nanosecond arithmetic (exact,
and exactly reproducible in DuckDB via ``epoch_ns``); the derived
``ts_utc`` microsecond timestamp (catalog.py) drives the real event-time
APIs (window / session_window / watermarks).

Scale: tumbling/sliding aggregation shuffles on (bucket, key) — a
high-cardinality composite, skew-safe; session windows shuffle on user_id.
In true streaming these become incremental state-store updates bounded by
the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "HOUR_NS",
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "stream_tumbling_counts",
    "CM_D",
    "CM_W",
    "countmin_partials",
    "countmin_user_estimates",
    "stream_countmin_partials",
]

HOUR_NS = 3_600_000_000_000
HALF_HOUR_NS = 1_800_000_000_000
SESSION_GAP_NS = 30 * 60 * 1_000_000_000


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Per-hour tumbling windows: event counts + exact value sums by type.

    Bucket = ts // 1h in int64 nanoseconds. Sums go through DECIMAL so the
    result is order-independent (parallel-aggregation-safe) and
    oracle-exact, then surface as double.
    """
    return (
        events.groupBy(
            (F.col("ts") - (F.col("ts") % F.lit(HOUR_NS))).alias("window_start_ns"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 windows).

    Expressed with the real ``window()`` API over the derived microsecond
    timestamp — the exact operator Structured Streaming runs — then the
    window start is surfaced as int64 nanoseconds for oracle parity.
    """
    return (
        events.groupBy(
            F.window("ts_utc", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            (F.unix_micros(F.col("w.start")) * F.lit(1000)).alias("window_start_ns"),
            "event_type",
            "n_events",
        )
    )


def session_stats(events: DataFrame, gap_ns: int = SESSION_GAP_NS) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Sessionization as a window-function cascade (lag → gap flag → running
    session counter → group), in exact int64 nanosecond arithmetic. This is
    the batch semantics of ``F.session_window``; the lag/cumsum form is
    used so the DuckDB oracle can run the identical query. The shuffle key
    is user_id (high-cardinality); per-user state is a sort — at 100 TB
    this is the standard sessionize pattern, or
    ``applyInPandasWithState`` when run as a true stream.
    """
    from pyspark.sql import Window

    # microsecond resolution: the driver's TIMESTAMP(NANOS) truncates to µs
    # in engines without nanosecond timestamps (DuckDB), so the oracle can
    # only see µs — we truncate identically.
    ev = events.select("user_id", F.expr("ts DIV 1000").alias("ts_us"))
    w_user = Window.partitionBy("user_id").orderBy("ts_us")
    w_run = w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.select(
        "user_id",
        "ts_us",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w_user)) > F.lit(gap_ns // 1000), 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            "session_start_us",
            "session_end_us",
            "n_events",
        )
    )


def session_stats_oracle(gap_ns: int = SESSION_GAP_NS) -> str:
    """DuckDB twin of :func:`session_stats` (events.ts is TIMESTAMP there)."""
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
flagged AS (
    SELECT user_id, ts_us,
           CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                     > {gap_ns // 1000} THEN 1 ELSE 0 END AS new_session
    FROM e
),
numbered AS (
    SELECT user_id, ts_us,
           cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
               AS session_id
    FROM flagged
)
SELECT user_id,
       min(ts_us) AS session_start_us,
       max(ts_us) AS session_end_us,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


def stream_tumbling_counts(
    spark: SparkSession, events_path: str, schema
) -> DataFrame:
    """The same tumbling aggregation as a *real* streaming DataFrame.

    ``readStream`` over the parquet directory with a 1-hour watermark on
    event time; callers attach ``writeStream.trigger(availableNow=True)``
    to drain it as an incremental batch (tests do exactly that). The
    aggregation state is bounded by the watermark — late events beyond 1h
    are dropped, which is the documented streaming deviation from the
    batch oracle (none are late in the driver data).
    """
    from ..catalog import normalize_events

    raw = spark.readStream.schema(schema).parquet(events_path)
    withts = normalize_events(raw)
    return (
        withts.withWatermark("ts_utc", "1 hour")
        .groupBy(F.window("ts_utc", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            (F.unix_micros(F.col("w.start")) * F.lit(1000)).alias("window_start_ns"),
            "event_type",
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Streaming count-min partials (mergeable sketch maintenance)
# --------------------------------------------------------------------------

CM_D = 4
CM_W = 1024


def _cm_user_bucket(row: int) -> str:
    """Engine-neutral md5 bucket of user_id for CM hash row ``row``.

    Reuses :func:`hashing.spark_hex48` so the bucket is an exact BIGINT
    column (conv() returns STRING; without the cast the modulo coerces
    through DOUBLE, which diverges from the batch ``agg_countmin_topk``
    pattern and breaks under ``spark.sql.ansi.enabled``)."""
    from ..functions.hashing import spark_hex48

    inner = f"concat(cast(user_id as string), ':scm{row}')"
    return f"{spark_hex48(inner)} % {CM_W}"


def countmin_partials(events: DataFrame) -> DataFrame:
    """Per-hour count-min partials over ``user_id``: (hour_start_ns,
    row_id, bucket, cnt).

    This is exactly what an incremental sketch maintainer emits per
    window: a fixed-size grid fragment (≤ D×W cells per hour) that
    downstream consumers merge CELL-WISE (CM merging is exact — only
    estimates are approximate). Works identically on batch and streaming
    frames: one map-side-combinable hash aggregate, no joins, no state
    beyond the aggregation itself.
    """
    rows = None
    for r in range(CM_D):
        p = events.select(
            (F.col("ts") - (F.col("ts") % F.lit(HOUR_NS))).alias("hour_start_ns"),
            F.lit(r).alias("row_id"),
            F.expr(_cm_user_bucket(r)).alias("bucket"),
        )
        rows = p if rows is None else rows.unionByName(p)
    return rows.groupBy("hour_start_ns", "row_id", "bucket").agg(
        F.count("*").alias("cnt")
    )


def countmin_user_estimates(events: DataFrame, top_k: int = 5) -> DataFrame:
    """Merge the hourly partials cell-wise and probe the exact top-k
    users: (user_id, true_cnt, est_cnt), est ≥ true one-sided."""
    merged = (
        countmin_partials(events)
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    truth = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "user_id")
        .limit(top_k)
    )
    probes = None
    for r in range(CM_D):
        p = truth.select(
            "user_id",
            "true_cnt",
            F.lit(r).alias("row_id"),
            F.expr(_cm_user_bucket(r)).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        F.broadcast(probes)
        .join(merged, ["row_id", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
        .select(
            "user_id",
            F.col("true_cnt").cast("bigint").alias("true_cnt"),
            "est_cnt",
        )
    )


def stream_countmin_partials(
    spark: SparkSession, events_path: str, schema
) -> DataFrame:
    """The hourly CM partials as a *real* streaming DataFrame: readStream
    with a 1-hour watermark; each drained micro-batch updates the hourly
    grid fragments, which a downstream merger sums cell-wise. The sketch
    IS the aggregation state — fixed D×W cells per open hour, bounded by
    the watermark."""
    from ..catalog import normalize_events

    raw = spark.readStream.schema(schema).parquet(events_path)
    withts = normalize_events(raw)
    rows = None
    for r in range(CM_D):
        p = withts.select(
            "ts_utc",
            F.lit(r).alias("row_id"),
            F.expr(_cm_user_bucket(r)).alias("bucket"),
        )
        rows = p if rows is None else rows.unionByName(p)
    return (
        rows.withWatermark("ts_utc", "1 hour")
        .groupBy(F.window("ts_utc", "1 hour").alias("w"), "row_id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .select(
            (F.unix_micros(F.col("w.start")) * F.lit(1000)).alias("hour_start_ns"),
            "row_id",
            "bucket",
            "cnt",
        )
    )
