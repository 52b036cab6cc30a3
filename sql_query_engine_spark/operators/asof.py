"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For each left row, attach the latest right row with the same key whose
timestamp is ≤ the left timestamp. The canonical time-series/feature-store
lookup ("what was the last known state when this event happened").

Spark has no ASOF JOIN operator (DuckDB does — the oracle uses it), so
this composes one from primitives, the scale-correct way:

* tag and UNION the two inputs (no join at all),
* one window pass per key ordered by (t, side): ``last(right_value,
  ignorenulls)`` over an unbounded-preceding frame carries the most
  recent right row forward onto every left row,
* filter back to left rows.

Cost: a single shuffle on the key + a sort within partitions — identical
asymptotics to a sort-merge join, with no range-explosion. This is the
standard formulation for large-scale point-in-time correctness (the
alternative — theta join ``l.t >= r.t`` + argmax — explodes quadratically
per key before aggregating).

Right-side timestamp ties are broken by the largest tiebreak column so
the result is deterministic (and matches the oracle, which pre-dedupes
to one right row per (key, t) the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str,
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: latest right row (by ``right_ts``, ≤ ``left_ts``) per key.

    Returns all left columns plus ``value_cols`` from the matched right
    row (NULL where no right row precedes the left row). ``tiebreak``
    resolves multiple right rows sharing (key, ts): the max wins.
    ``tolerance`` (same units as the timestamps) voids matches staler
    than ``left_ts - tolerance`` — the feature-store freshness bound; the
    matched timestamp rides the same window pass, so tolerance adds no
    extra shuffle.

    ``direction="forward"`` flips the lookup: the EARLIEST right row at
    or after ``left_ts`` — the lookahead-labeling join ("did this event
    lead to an order, and when"), same single window pass with the frame
    mirrored; ``tolerance`` then bounds how far ahead a match may be.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # one right row per (key, ts): keep the max-tiebreak row
    w_dedup = Window.partitionBy(right_key, right_ts).orderBy(F.col(tiebreak).desc())
    right_1 = (
        right.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right_1.select(F.struct(*value_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tagged = right_1.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*value_cols).alias("__r"),
    )

    if direction == "backward":
        # rights sort before lefts at equal t → "at or before" includes ties
        w = (
            Window.partitionBy("__k")
            .orderBy("__t", "__is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last
    else:
        # mirrored: lefts sort before rights at equal t, frame looks ahead
        w = (
            Window.partitionBy("__k")
            .orderBy("__t", F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", carry("__r", ignorenulls=True).over(w))
        .withColumn(
            "__match_t",
            carry(
                F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("__is_left") == 1)
    )
    if tolerance is not None:
        # the carried __match/__match_t come from the same matched right
        # row, so one staleness predicate voids both together; gap is
        # (left - match) looking back, (match - left) looking ahead
        gap = (
            F.col("__t") - F.col("__match_t")
            if direction == "backward"
            else F.col("__match_t") - F.col("__t")
        )
        carried = carried.withColumn(
            "__match",
            F.when(gap <= F.lit(tolerance), F.col("__match")),
        )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns] + [
        F.col(f"__match.{c}").alias(c) for c in value_cols
    ]
    return carried.select(*out_cols)
