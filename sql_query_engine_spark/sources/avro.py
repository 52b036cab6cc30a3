"""From-spec Apache Avro Object Container File source/sink.

The reference engine's source story is hand-rolled wire formats behind a
schema dictionary (SURVEY.md S1/S2: qualified-header CSV at
``utils/tbl_to_csv.py:18``, tagged JSON-lines at
``utils/tbl_to_json.py:8-14``); this module extends the same discipline
to a real interchange format: Avro OCF per the public Apache Avro 1.11
specification (magic ``Obj\\x01``, file-metadata map carrying
``avro.schema``/``avro.codec``, zigzag-varint longs, little-endian IEEE
doubles, length-prefixed UTF-8 strings, per-block record counts and the
16-byte sync marker) — no ``spark-avro`` jar, no third-party codec.

Write path: one ``.avro`` file per partition via ``foreachPartition``
(the executor-local write pattern every sink in ``sources/sinks.py``
uses — on a real cluster the target is a shared filesystem). Read path:
``binaryFile`` datasource (one row per file → parallelism across files,
exactly how Spark schedules small-file container formats) feeding an
Arrow ``mapInPandas`` decoder that enforces magic, schema, codec, and
per-block sync markers; a corrupt container raises with the offending
path so a bad file is attributable, not silent.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

AVRO_MAGIC = b"Obj\x01"
# fixed marker keeps the corpus byte-deterministic across runs
_SYNC = bytes(range(16))

AvroFields = List[Tuple[str, str]]  # (name, "long" | "double" | "string")


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def avro_schema_json(name: str, fields: AvroFields) -> str:
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        }
    )


def _encode_value(t: str, v) -> bytes:
    if t == "long":
        return _zigzag_encode(int(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(f"unsupported avro type {t!r}")


def _decode_value(t: str, buf: bytes, pos: int):
    if t == "long":
        return _zigzag_decode(buf, pos)
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        ln, pos = _zigzag_decode(buf, pos)
        return buf[pos : pos + ln].decode("utf-8"), pos + ln
    raise ValueError(f"unsupported avro type {t!r}")


def write_avro_bytes(name: str, fields: AvroFields, rows,
                     block_rows: int = 1000, codec: str = "null") -> bytes:
    """Serialize rows (sequences ordered like ``fields``) into one
    spec-conformant OCF byte string. ``codec`` is "null" or "deflate"
    (raw zlib stream, no header/checksum — the Avro spec's framing)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    out = io.BytesIO()
    out.write(AVRO_MAGIC)
    meta = {
        "avro.schema": avro_schema_json(name, fields).encode(),
        "avro.codec": codec.encode(),
    }
    # file metadata: an avro map<bytes> — one block then the 0 terminator
    out.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out.write(_zigzag_encode(len(kb)) + kb)
        out.write(_zigzag_encode(len(v)) + v)
    out.write(_zigzag_encode(0))
    out.write(_SYNC)

    buf = bytearray()
    count = 0

    def flush():
        nonlocal buf, count
        if count:
            body = bytes(buf)
            if codec == "deflate":
                # spec: raw DEFLATE, i.e. zlib without header/checksum
                body = zlib.compress(body)[2:-4]
            out.write(_zigzag_encode(count))
            out.write(_zigzag_encode(len(body)))
            out.write(body)
            out.write(_SYNC)
            buf = bytearray()
            count = 0

    for row in rows:
        for (n, t), v in zip(fields, row):
            buf += _encode_value(t, v)
        count += 1
        if count >= block_rows:
            flush()
    flush()
    return out.getvalue()


def decode_avro_bytes(payload: bytes, path: str = "<bytes>"):
    """Parse one OCF: validate magic/codec, read the embedded schema,
    walk blocks verifying each sync marker. Returns (fields, rows)."""
    b = payload
    if b[:4] != AVRO_MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    pos = 4
    meta: dict[str, bytes] = {}
    nkeys, pos = _zigzag_decode(b, pos)
    while nkeys:
        if nkeys < 0:
            # Avro spec: a negative block count is followed by the
            # block's byte size (a long) before the |count| entries —
            # read and discard it so spec-valid third-party OCFs parse.
            _blocksize, pos = _zigzag_decode(b, pos)
        for _ in range(abs(nkeys)):
            kl, pos = _zigzag_decode(b, pos)
            k = b[pos : pos + kl].decode()
            pos += kl
            vl, pos = _zigzag_decode(b, pos)
            meta[k] = b[pos : pos + vl]
            pos += vl
        nkeys, pos = _zigzag_decode(b, pos)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"{path}: unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    fields: AvroFields = [(f["name"], f["type"]) for f in schema["fields"]]
    sync = b[pos : pos + 16]
    pos += 16
    rows = []
    while pos < len(b):
        count, pos = _zigzag_decode(b, pos)
        size, pos = _zigzag_decode(b, pos)
        block = b[pos : pos + size]
        pos += size
        if b[pos : pos + 16] != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        pos += 16
        if codec == b"deflate":
            try:
                block = zlib.decompress(block, wbits=-15)  # raw DEFLATE
            except zlib.error as e:
                raise ValueError(f"{path}: deflate block corrupt: {e}")
        bp = 0
        for _ in range(count):
            row = []
            for _, t in fields:
                v, bp = _decode_value(t, block, bp)
                row.append(v)
            rows.append(tuple(row))
        if bp != len(block):
            raise ValueError(f"{path}: block size mismatch")
    return fields, rows


def write_avro_dataset(df: DataFrame, out_dir: str, name: str,
                       fields: AvroFields, n_files: int = 4) -> None:
    """One OCF per partition, written executor-side."""
    cols = [n for n, _ in fields]
    sel = df.select(*cols)

    def _write(pid: int, it):
        rows = [tuple(r) for r in it]
        data = write_avro_bytes(name, fields, rows)
        with open(os.path.join(out_dir, f"part-{pid:05d}.avro"), "wb") as f:
            f.write(data)
        return iter(())

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    sel.repartition(n_files).rdd.mapPartitionsWithIndex(_write).count()


_SPARK_TYPES = {"long": LongType(), "double": DoubleType(),
                "string": StringType()}


def read_avro(spark: SparkSession, path_glob: str,
              fields: AvroFields) -> DataFrame:
    """binaryFile scan → Arrow mapInPandas decode to typed columns."""
    schema = StructType(
        [StructField(n, _SPARK_TYPES[t], True) for n, t in fields]
    )
    files = spark.read.format("binaryFile").load(path_glob)

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                got_fields, rows = decode_avro_bytes(bytes(content), path)
                if [n for n, _ in got_fields] != [n for n, _ in fields]:
                    raise ValueError(f"{path}: schema mismatch")
                yield pd.DataFrame(rows or None,
                                   columns=[n for n, _ in fields])

    return files.select("path", "content").mapInPandas(_dec, schema)
