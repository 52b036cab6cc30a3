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


# ---------------------------------------------------------------------------
# Streaming token bucket — the applyInPandasWithState twin of the batch
# stream_token_bucket query (queries.py): a NON-associative per-key
# recurrence whose state (remaining tokens + last event time) must carry
# across triggers; no windowed aggregate can express it.
# ---------------------------------------------------------------------------

TB_CAP = 3
TB_REFILL_US = 300_000_000

TOKEN_BUCKET_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("admitted", LongType(), False),  # 0/1
        StructField("tokens_after", LongType(), False),
    ]
)

_TB_STATE_SCHEMA = "tokens bigint, last_us bigint"


def _tb_transition(tokens, last, us_seq, ids):
    """Shared transition: integer-floor refill per gap, admit iff a
    token is available. ``last`` is -1 for a fresh bucket."""
    adm, aft = [], []
    for us in us_seq:
        if last >= 0:
            tokens = min(TB_CAP, tokens + (int(us) - last) // TB_REFILL_US)
        ok = 1 if tokens >= 1 else 0
        tokens -= ok
        adm.append(ok)
        aft.append(tokens)
        last = int(us)
    return tokens, last, adm, aft


def token_bucket_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming admission control with explicit keyed state. Events
    inside a trigger are folded in (event time, id) order; the bucket
    level and last-seen time persist in the state store across
    triggers — exactly what distinguishes this from a window."""

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            tokens, last = state.get
        else:
            tokens, last = TB_CAP, -1
        pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        tokens, last, adm, aft = _tb_transition(
            tokens, last, pdf["ts_us"].tolist(), pdf["event_id"].tolist()
        )
        state.update((tokens, last))
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].values,
                "user_id": [key[0]] * len(pdf),
                "admitted": adm,
                "tokens_after": aft,
            }
        )

    ev = events_stream.select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("ts_us")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=TOKEN_BUCKET_SCHEMA,
        stateStructType=_TB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
