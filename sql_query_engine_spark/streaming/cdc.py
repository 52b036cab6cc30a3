"""Streaming CDC compaction: last-writer-wins keyed state with tombstones.

The streaming twin of ``queries.pipeline_cdc_upsert`` (batch MERGE
semantics): a changelog arrives as micro-batches, per-key state holds the
current winning (sequence, row) and each trigger emits the keys whose
snapshot row CHANGED — i.e. a continuously-maintained materialized view
of the upsert log, the streaming answer to "keep a 100 TB snapshot fresh
without recompacting the log".

Mechanics mirror ``stateful.py``'s profile operator:

* keyed by ``user_id`` → the state-store shard key; O(1) state per key
  (one winning row), so state size is bounded by the KEY space, not the
  log length — the property that lets the view run forever;
* sequence order is ``(t_us, event_id)`` — a late row with a smaller
  sequence than the stored winner is ignored, which makes the operator
  insensitive to cross-batch arrival order (pinned in tests by feeding
  chronological thirds);
* 'error' rows are DELETE tombstones: state remembers the tombstone (so
  an even-later update can resurrect the key) and the emitted row flags
  ``deleted`` — downstream readers drop flagged keys from the view.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["CDC_SCHEMA", "cdc_stream", "cdc_batch"]

CDC_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("last_event_type", StringType(), True),
        StructField("last_value", DoubleType(), True),
        StructField("last_t_us", LongType(), True),
        StructField("deleted", BooleanType(), False),
    ]
)

# winning row: (t_us, event_id, event_type, value)
_STATE_SCHEMA = "t bigint, eid bigint, et string, v double"


def _fold_winner(
    state_row: tuple | None, pdf: pd.DataFrame
) -> tuple[int, int, str, float]:
    """Pure fold: the (t, event_id)-max row across state and batch."""
    best = state_row
    for t, eid, et, v in zip(
        pdf["t_us"], pdf["event_id"], pdf["event_type"], pdf["value"]
    ):
        cand = (int(t), int(eid), str(et), float(v))
        if best is None or (cand[0], cand[1]) > (best[0], best[1]):
            best = cand
    return best


def _update_cdc(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    prev = state.get if state.exists else None
    batch = pd.concat(list(pdfs), ignore_index=True)
    best = _fold_winner(prev, batch)
    state.update(best)
    t, eid, et, v = best
    deleted = et == "error"
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "last_event_type": [None if deleted else et],
            "last_value": [None if deleted else v],
            "last_t_us": [None if deleted else t],
            "deleted": [deleted],
        }
    )


def _changelog(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        F.expr("ts DIV 1000").alias("t_us"),
        "event_id",
        "event_type",
        "value",
    )


def cdc_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming last-writer-wins view maintenance (update mode: each
    trigger emits the keys it touched)."""
    return (
        _changelog(events_stream)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_cdc,
            outputStructType=CDC_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def cdc_batch(events: DataFrame) -> DataFrame:
    """Batch twin: identical fold via applyInPandas over the whole log."""

    def _one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        best = _fold_winner(None, pdf)
        t, eid, et, v = best
        deleted = et == "error"
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "last_event_type": [None if deleted else et],
                "last_value": [None if deleted else v],
                "last_t_us": [None if deleted else t],
                "deleted": [deleted],
            }
        )

    return _changelog(events).groupBy("user_id").applyInPandas(
        _one_group, CDC_SCHEMA
    )
