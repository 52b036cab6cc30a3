"""Exactly-once streaming delivery via idempotent per-batch sinks.

Structured Streaming's checkpoint guarantees each micro-batch is
processed AT LEAST once: after a crash between "sink wrote" and
"checkpoint committed", the batch REPLAYS with the same ``batch_id``.
End-to-end exactly-once therefore comes from the sink being idempotent
on ``batch_id`` — a replay must overwrite, not append. (This is the same
contract Spark's own file sink implements internally with its
_spark_metadata transaction log; spelling it out as a ``foreachBatch``
writer makes the mechanism testable and portable to any sink that can
upsert or overwrite by key.)

At 100 TB the pattern matters doubly: long-running jobs WILL restart,
and a duplicated micro-batch in a training corpus is silent data
poisoning — the dedup pipeline can't catch it because the rows are
byte-identical yet legitimately repeated at source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["idempotent_parquet_sink"]


def idempotent_parquet_sink(out_dir: str):
    """A ``foreachBatch`` writer that is a pure function of batch_id.

    Each micro-batch lands in its own ``batch_id=N`` directory with
    ``overwrite`` mode, so a replayed batch (same id, same data — the
    streaming engine's replay contract) rewrites the same files instead
    of appending duplicates. Readers see the union via partition
    discovery on ``out_dir`` and can also prune by ``batch_id``.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return write_batch
