"""Per-key admission quotas: keyed streaming state, two API generations.

The corpus-mixing problem this solves: while ingesting a document firehose,
cap each source at N admitted documents — the live form of the mixture
step (``pipeline_dataset_mixture`` decides rates offline; this enforces a
hard per-source budget in arrival order as data lands). The reference has
no streaming surface at all (its ra2mr Luigi tasks are batch-only), so
this is a Spark-first extension.

Two streaming implementations, same semantics:

* ``quota_stream`` — ``applyInPandasWithState`` (Spark 3.4+), the API the
  container can always run; this is what the micro-batch equivalence test
  drives.
* ``quota_stream_tws`` — ``transformWithStateInPandas`` (Spark 4.x
  arbitrary-state API: typed ValueState handles, timers, TTL). Its state
  server speaks protobuf, which this container lacks, so the operator
  gates on ``HAS_PROTOBUF`` and its test skips when unavailable — the
  plumbing (processor class, state schema, output contract) is real and
  identical in semantics to the supported path.

Scale shape: state is one counter per source key, shuffled by key into
the state store — O(#sources) state, O(batch) work per trigger. Admission
is deterministic given arrival order: within a micro-batch ties break by
doc_id, across batches by trigger order.

The batch twin (``quota_batch``) is the same semantics on a bounded
corpus: rank by doc_id within source, keep rank ≤ cap — pure JVM window,
oracle-expressible (the ``pipeline_source_quota`` registry entry).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType
from pyspark.sql.window import Window

try:  # transformWithState needs protobuf for its state-server protocol
    import google.protobuf  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False

__all__ = [
    "HAS_PROTOBUF",
    "QUOTA_SCHEMA",
    "QuotaProcessor",
    "quota_stream",
    "quota_stream_tws",
    "quota_batch",
]

QUOTA_SCHEMA = StructType(
    [
        StructField("source", StringType(), True),
        StructField("doc_id", LongType(), True),
        StructField("n_chars", LongType(), True),
        StructField("admit_rank", LongType(), True),
    ]
)

_STATE_SCHEMA = "taken bigint"


def _admit(batch: pd.DataFrame, source, taken: int, cap: int) -> tuple[pd.DataFrame, int]:
    """Pure admission fold: first (cap - taken) rows by doc_id."""
    batch = batch.sort_values("doc_id")
    admitted = batch.head(max(cap - taken, 0))
    out = pd.DataFrame(
        {
            "source": admitted["source"],
            "doc_id": admitted["doc_id"],
            "n_chars": admitted["n_chars"],
            "admit_rank": range(taken + 1, taken + len(admitted) + 1),
        }
    )
    return out, taken + len(admitted)


def _make_update_fn(cap: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        taken = state.get[0] if state.exists else 0
        if taken < cap:
            batch = pd.concat(list(pdfs), ignore_index=True)
            out, taken = _admit(batch, source, taken, cap)
            if len(out):
                yield out
        state.update((taken,))

    return _update


def quota_stream(docs_stream: DataFrame, cap: int = 10) -> DataFrame:
    """Streaming quota enforcement keyed by source (applyInPandasWithState).

    NoTimeout keeps exhausted counters forever — correct for bounded
    test input; production would expire idle sources with
    ProcessingTimeTimeout once their budget can no longer change.
    """
    return (
        docs_stream.select("source", "doc_id", "n_chars")
        .groupBy("source")
        .applyInPandasWithState(
            _make_update_fn(cap),
            outputStructType=QUOTA_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class QuotaProcessor:
    """Spark 4 ``StatefulProcessor`` for the same admission semantics.

    Defined lazily (plain class here, registered as a StatefulProcessor
    subclass in ``quota_stream_tws``) so importing this module never
    requires the protobuf-backed API to exist.
    """

    def __init__(self, cap: int):
        self.cap = cap

    def init(self, handle) -> None:
        self._taken = handle.getValueState("taken", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        taken = self._taken.get()[0] if self._taken.exists() else 0
        if taken >= self.cap:
            return iter(())
        batch = pd.concat(list(rows), ignore_index=True)
        out, taken = _admit(batch, key[0], taken, self.cap)
        self._taken.update((taken,))
        return iter((out,))

    def close(self) -> None:
        pass


def quota_stream_tws(docs_stream: DataFrame, cap: int = 10) -> DataFrame:
    """Quota via ``transformWithStateInPandas`` (requires protobuf)."""
    if not HAS_PROTOBUF:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package for its "
            "state-server protocol; not installed in this container. Use "
            "quota_stream (applyInPandasWithState) — identical semantics."
        )
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc = type("_QuotaTws", (QuotaProcessor, StatefulProcessor), {})(cap)
    return (
        docs_stream.select("source", "doc_id", "n_chars")
        .groupBy("source")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=QUOTA_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def quota_batch(docs: DataFrame, cap: int = 10) -> DataFrame:
    """Batch twin: doc_id-rank within source, keep the first ``cap``.

    One hash-partitioned window per source — no global sort, no state;
    the exact bounded-input equivalent of the streaming admission when
    rows arrive in doc_id order.
    """
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("admit_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("admit_rank") <= cap)
    )
