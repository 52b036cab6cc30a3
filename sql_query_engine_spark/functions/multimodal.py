"""Multimodal (binary) column plumbing.

Capability extension: treat image/audio/video payloads as opaque ``binary``
columns with a typed metadata struct, and run decode / feature-extraction as
Arrow-batched ``mapInPandas`` stages.

The decode step itself is STUBBED — the real image/audio libraries are not
in this container — but everything Spark-side is real and tested: the
schema contract, the Arrow batch shape, the UDF signature, and the
partitioning story. Swapping ``_decode_stub`` for a real decoder (PIL,
soundfile, av) changes zero lines of Spark plumbing.

Scale notes: binary payloads ride the scan; ``mapInPandas`` streams Arrow
batches so executor memory is bounded by batch size × payload size — set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for large blobs.
Feature extraction is map-only (no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "attach_binary_payload",
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "extract_features",
    "sample_frames",
    "decode_real",
]

# Output contract of the feature extractor.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("first_byte", IntegerType(), True),
    ]
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary column + typed metadata struct.

    Stands in for reading real blobs: payload = utf-8 bytes of ``text``.
    The metadata struct is the pattern for multimodal tables at scale —
    filterable typed fields ride next to the opaque payload so partition
    pruning / predicate pushdown never touch the bytes.
    """
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length("text").alias("orig_chars"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> bytes:
    """Deterministic stand-in for a media decoder (identity)."""
    return payload


def decode_real(payload: bytes):  # pragma: no cover - documented stub
    """Real media decode — requires image/audio libs not in this container."""
    raise NotImplementedError(
        "media decode requires PIL/soundfile/av; wire the real decoder here"
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_md5", StringType(), False),
        StructField("frame_bytes", LongType(), False),
    ]
)

FRAME_SIZE = 100
FRAME_STRIDE = 250


def sample_frames(
    with_payload: DataFrame,
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame-sampling over opaque binary payloads (video-style decode).

    Every ``stride`` bytes, cut a ``frame_size``-byte frame and emit its
    fingerprint — the plumbing shape of video frame extraction (a real
    decoder would seek keyframes instead of fixed offsets; the slicing,
    fan-out schema, and Arrow batching are identical). One input row →
    many frame rows, Arrow-batched, map-only.
    """
    import hashlib

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                blob = _decode_stub(payload)
                idx = 0
                for pos in range(0, len(blob), stride):
                    frame = blob[pos : pos + frame_size]
                    if not frame:
                        break
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
                    out["frame_bytes"].append(len(frame))
                    idx += 1
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(_frames, FRAME_SCHEMA)


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame; the
    extractor emits one feature row per payload. Deterministic fake
    features (byte length, first byte) keep the pipeline testable and
    oracle-checkable.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": decoded.map(len).astype("int64"),
                    "first_byte": decoded.map(
                        lambda b: int(b[0]) if len(b) else None
                    ).astype("Int32"),
                }
            )

    return with_payload.mapInPandas(_extract, FEATURE_SCHEMA)
