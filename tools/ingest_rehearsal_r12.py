"""Crawl-ingest throughput rehearsal (r12): the integrity + metadata legs.

The r11 rehearsal measured the bare three-layer ingest. r12 added the
integrity contract (ISO 28500 labelled block/payload digests, RFC 7230
trailer-declared X-Len/X-Payload-SHA256) and the metadata plane (WAT
sidecars) — this rehearsal measures what that costs at 4× the 500k
base scale and proves the verification actually runs on every row:

* write leg — N docs written as .warc.gz shards; every record now
  computes sha256 twice (block + entity) plus the chunked trailer
  digest. Compare docs/s against REHEARSAL_r11_ingest.json to price
  the integrity layer.
* read leg — read_warc_gz: block digests + trailer digests verified on
  every record (the layer-owned checks), rows verified map-side
  against the builder arithmetic.
* meta leg — read_warc_gz_meta: additionally recomputes and checks the
  payload digest per record and surfaces (charset, payload_sha256,
  digest_verified); every row's digest column is verified map-side
  against sha256 of the regenerated expected text.
* wat leg — write_wat_sidecar + read_wat: sidecar emission throughput,
  sidecar-to-shard byte ratio (the "thin scan" claim, measured), and
  every sidecar row's digest verified against the expected text.
* corruption leg — one flipped byte inside a member: the meta read
  must fail attributably (path in the exception).

    python tools/ingest_rehearsal_r12.py [n_docs] [--out FILE.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.sources import warc  # noqa: E402

from ingest_rehearsal_r11 import synth_docs  # noqa: E402

N_DOCS = 2_000_000
N_FILES = 64


def main() -> int:
    global N_DOCS
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    skip = {sys.argv.index("--out") + 1} if "--out" in sys.argv else set()
    pos = [a for i, a in enumerate(sys.argv[1:], 1)
           if not a.startswith("--") and i not in skip]
    if pos:
        N_DOCS = int(pos[0])
    spark = get_spark("ingest-rehearsal-r12")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"n_docs": N_DOCS, "n_files": N_FILES}
    docs = synth_docs(spark, N_DOCS)
    d = F.col("doc_id")
    expected_text = F.concat(
        F.repeat(F.lit("lorem ipsum & <dolor> "),
                 (d % 19 + 1).cast("int")),
        F.lit("доc ☃ "), d.cast("string"))
    expected_len = F.octet_length(expected_text)

    # ---- write (digests + trailers included since r12) -----------------
    out_dir = os.path.join(tempfile.gettempdir(), "ingest_rehearsal_r12")
    t0 = time.time()
    warc.write_warc_gz_dataset(docs, out_dir, n_files=N_FILES)
    t_write = time.time() - t0
    shard_bytes = sum(os.path.getsize(p)
                      for p in glob.glob(os.path.join(out_dir, "*.warc.gz")))
    report["write"] = {
        "t_s": round(t_write, 2),
        "docs_per_s": int(N_DOCS / t_write),
        "disk_mb": round(shard_bytes / 1e6, 1),
    }
    print(json.dumps(report["write"]), flush=True)

    # ---- plain read (block + trailer digests verified per record) ------
    t0 = time.time()
    back = warc.read_warc_gz(spark, f"{out_dir}/*.warc.gz")
    agg = back.select(
        ((F.col("content_length") == expected_len.cast("long"))
         & (F.md5("text") == F.md5(expected_text)))
        .cast("long").alias("ok"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok")).collect()[0]
    t_read = time.time() - t0
    assert agg.rows == N_DOCS and agg.ok == N_DOCS, (agg.rows, agg.ok)
    report["read_verify"] = {
        "t_s": round(t_read, 2),
        "docs_per_s": int(N_DOCS / t_read),
        "rows_verified": int(agg.ok),
    }
    print(json.dumps(report["read_verify"]), flush=True)

    # ---- meta read (payload digest recomputed + checked per record) ----
    t0 = time.time()
    meta = warc.read_warc_gz_meta(spark, f"{out_dir}/*.warc.gz")
    agg = meta.select(
        (F.col("digest_verified")
         & (F.col("charset") == "utf-8")
         & (F.col("payload_sha256") == F.sha2(expected_text, 256))
         & (F.md5("text") == F.md5(expected_text)))
        .cast("long").alias("ok"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok")).collect()[0]
    t_meta = time.time() - t0
    assert agg.rows == N_DOCS and agg.ok == N_DOCS, (agg.rows, agg.ok)
    report["meta_read_verify"] = {
        "t_s": round(t_meta, 2),
        "docs_per_s": int(N_DOCS / t_meta),
        "rows_verified": int(agg.ok),
    }
    print(json.dumps(report["meta_read_verify"]), flush=True)

    # ---- WAT sidecar emission + thin scan ------------------------------
    t0 = time.time()
    warc.write_wat_sidecar(spark, out_dir)
    t_wat_write = time.time() - t0
    wat_bytes = sum(os.path.getsize(p)
                    for p in glob.glob(os.path.join(out_dir, "*.wat.jsonl")))
    t0 = time.time()
    wat = warc.read_wat(spark, f"{out_dir}/*.wat.jsonl")
    agg = wat.select(
        ((F.col("content_length") == expected_len.cast("long"))
         & (F.col("payload_sha256") == F.sha2(expected_text, 256)))
        .cast("long").alias("ok"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok")).collect()[0]
    t_wat_read = time.time() - t0
    assert agg.rows == N_DOCS and agg.ok == N_DOCS, (agg.rows, agg.ok)
    report["wat"] = {
        "t_emit_s": round(t_wat_write, 2),
        "emit_docs_per_s": int(N_DOCS / t_wat_write),
        "t_scan_s": round(t_wat_read, 2),
        "scan_docs_per_s": int(N_DOCS / t_wat_read),
        "sidecar_mb": round(wat_bytes / 1e6, 1),
        "sidecar_to_shard_ratio": round(wat_bytes / shard_bytes, 4),
        "rows_verified": int(agg.ok),
    }
    print(json.dumps(report["wat"]), flush=True)

    # ---- corruption: one flipped byte must fail with the shard path ----
    victim = sorted(glob.glob(os.path.join(out_dir, "*.warc.gz")))[0]
    raw = bytearray(open(victim, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(raw))
    survived = False
    try:
        warc.read_warc_gz_meta(spark, f"{out_dir}/*.warc.gz") \
            .agg(F.count("*")).collect()
        survived = True
    except Exception as e:  # noqa: BLE001 - py4j wraps the ValueError
        attributable = os.path.basename(victim) in str(e)
        report["corruption"] = {"attributable": attributable}
        assert attributable, f"exception lacks shard path: {e}"
    if survived:
        report["corruption"] = {"attributable": False}
        raise AssertionError("corrupted shard read did not fail")
    print(json.dumps(report["corruption"]), flush=True)

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    if out:
        json.dump(report, open(out, "w"), indent=1)
    print(json.dumps({"ok": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
