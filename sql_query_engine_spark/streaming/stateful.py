"""Custom stateful streaming operators via ``applyInPandasWithState``.

This is the escape hatch for streaming semantics the built-in operators
can't express (SURVEY.md §7.3: "custom state only if session-window
semantics need applyInPandasWithState"). The worked example is a per-user
*running profile* — event count, value sum, last-seen timestamp, and a
count of "bursts" (events within 60 s of the previous one) — state that a
windowed aggregate cannot carry across triggers.

Design notes:

* State is keyed by user_id → the shuffle key; state size is O(1) per
  user (four scalars), so 10⁹ users is gigabytes of state store, spread
  across executors — the pattern scales.
* A GroupStateTimeout of EventTimeTimeout + watermark would expire idle
  users in production; the test path uses NoTimeout for determinism on
  bounded input.
* The same ``_update_profile`` function also powers a batch twin
  (``profile_batch``) through plain ``applyInPandas`` grouping — which is
  what the oracle checks; the streaming path is asserted equal to the
  batch path in tests (availableNow trigger).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["PROFILE_SCHEMA", "profile_stream", "profile_batch", "BURST_GAP_US"]

BURST_GAP_US = 60_000_000  # events closer than 60s count as a burst

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), True),
        StructField("last_ts_us", LongType(), True),
        StructField("n_bursts", LongType(), False),
    ]
)

# state tuple layout: (n_events, sum_value, last_ts_us, n_bursts)
_STATE_SCHEMA = "n bigint, s double, last bigint, bursts bigint"


def _fold_profile(
    n: int, s: float, last: int | None, bursts: int, ts_us: list[int], values: list[float]
) -> tuple[int, float, int | None, int]:
    """Pure fold of a sorted event batch into the profile state."""
    for t, v in zip(ts_us, values):
        if last is not None and (t - last) <= BURST_GAP_US:
            bursts += 1
        n += 1
        s += v
        last = t
    return n, s, last, bursts


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, last, bursts = state.get
    else:
        n, s, last, bursts = 0, 0.0, None, 0
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_us")
    n, s, last, bursts = _fold_profile(
        n, s, last, bursts, batch["ts_us"].tolist(), batch["value"].tolist()
    )
    state.update((n, s, last, bursts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "last_ts_us": [last],
            "n_bursts": [bursts],
        }
    )


def _with_ts_us(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id", F.expr("ts DIV 1000").alias("ts_us"), "value"
    )


def profile_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user profile with explicit keyed state.

    Input: a streaming events DataFrame with raw nanosecond ``ts``.
    Each trigger folds the new events into per-user state and emits the
    updated profile row.
    """
    return (
        _with_ts_us(events_stream)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def profile_batch(events: DataFrame) -> DataFrame:
    """Batch twin: identical fold via applyInPandas (no state store)."""

    def _one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts_us")
        n, s, last, bursts = _fold_profile(
            0, 0.0, None, 0, pdf["ts_us"].tolist(), pdf["value"].tolist()
        )
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [n],
                "sum_value": [s],
                "last_ts_us": [last],
                "n_bursts": [bursts],
            }
        )

    return _with_ts_us(events).groupBy("user_id").applyInPandas(
        _one_group, PROFILE_SCHEMA
    )
