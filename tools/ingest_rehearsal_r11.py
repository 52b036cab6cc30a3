"""Crawl-ingest throughput rehearsal (r11): .warc.gz + HTML extraction.

The round's two new front-door operators at 1000× the driver fixture:

* warc_gz leg — N synthetic documents (multi-byte UTF-8, entity-trap
  characters, doc_id-derived lengths) are written as .warc.gz shards
  (ONE gzip member per record, HTTP chunked/CL payloads — the Common
  Crawl layout) and read back through all three framing layers. Every
  row is verified map-side against the doc_id arithmetic: target URI,
  chunk count, entity byte length, and md5 of the recovered text vs
  the regenerated expected text — zero mismatches tolerated. Reports
  write and read+verify throughput plus on-disk bytes.
* html leg — the same N docs flow through the JVM-side page builder →
  Arrow tokenizer; censuses and the escape→tokenize→unescape md5
  roundtrip verified map-side for every row; zero nulls tolerated.
* corruption leg — one byte flipped inside one shard's member: the
  read must fail ATTRIBUTABLY (exception carries the shard path) —
  the source contract, unlike the media decoders' reject-to-NULL.

Parallelism note for the 100 TB read: the gzip-member layout makes
records independently decodable, but this reader's split unit is the
FILE (binaryFile + mapInPandas) — shard sizing happens at write time
(one file per partition), which is how the real corpora are shipped
(~1 GB shards). Nothing here is driver-side.

    python tools/ingest_rehearsal_r11.py [n_docs] [--out FILE.json]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.functions import html as H  # noqa: E402
from sql_query_engine_spark.sources import warc  # noqa: E402

N_DOCS = 500_000
N_FILES = 64


def synth_docs(spark, n):
    d = F.col("doc_id")
    text = F.concat(
        F.repeat(F.lit("lorem ipsum & <dolor> "),
                 (d % 19 + 1).cast("int")),
        F.lit("доc ☃ "),
        d.cast("string"),
    )
    return (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
    )


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
    spark = get_spark("ingest-rehearsal-r11")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"n_docs": N_DOCS, "n_files": N_FILES}
    docs = synth_docs(spark, N_DOCS)

    # ---- warc.gz write -------------------------------------------------
    out_dir = os.path.join(tempfile.gettempdir(), "ingest_rehearsal_warc_gz")
    t0 = time.time()
    warc.write_warc_gz_dataset(docs, out_dir, n_files=N_FILES)
    t_write = time.time() - t0
    disk_bytes = sum(os.path.getsize(p)
                     for p in glob.glob(os.path.join(out_dir, "*.warc.gz")))

    # ---- warc.gz read + full map-side verification ---------------------
    d = F.col("doc_id")
    expected_text = F.concat(
        F.repeat(F.lit("lorem ipsum & <dolor> "),
                 (d % 19 + 1).cast("int")),
        F.lit("доc ☃ "), d.cast("string"))
    expected_len = F.octet_length(expected_text)
    expected_chunks = F.when(d % 3 == 0, F.lit(0)).otherwise(
        F.least(d % 4 + 1, expected_len.cast("long")))
    t0 = time.time()
    back = warc.read_warc_gz(spark, f"{out_dir}/*.warc.gz")
    agg = back.select(
        "doc_id",
        (
            (F.col("target_uri")
             == F.concat(F.lit("http://example.com/doc/"),
                         d.cast("string")))
            & (F.col("http_status")
               == F.when(d % 11 == 0, 404).otherwise(200))
            & (F.col("n_chunks") == expected_chunks)
            & (F.col("content_length") == expected_len.cast("long"))
            & (F.md5("text") == F.md5(expected_text))
        ).cast("long").alias("ok"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok"),
          F.count_distinct("doc_id").alias("uniq")).collect()[0]
    t_read = time.time() - t0
    assert agg.rows == N_DOCS == agg.uniq, (agg.rows, agg.uniq)
    assert agg.ok == N_DOCS, f"{N_DOCS - agg.ok} rows failed verification"
    report["warc_gz"] = {
        "t_write_s": round(t_write, 2),
        "t_read_verify_s": round(t_read, 2),
        "write_docs_per_s": int(N_DOCS / t_write),
        "read_docs_per_s": int(N_DOCS / t_read),
        "disk_mb": round(disk_bytes / 1e6, 1),
        "rows_verified": int(agg.ok),
    }
    print(json.dumps(report["warc_gz"]), flush=True)

    # ---- HTML extraction leg -------------------------------------------
    t0 = time.time()
    ext = H.html_extract_stats(H.synthesize_html_pages(docs))
    agg = ext.select(
        "doc_id",
        (
            F.col("title").isNotNull()
            & (F.col("title") == F.concat(F.lit("doc & "),
                                          d.cast("string")))
            & (F.col("n_links") == (d % 7).cast("int"))
            & (F.col("n_tags") == (d % 7 + 8).cast("int"))
            & (F.col("n_comments") == 1)
            & (F.md5("text") == F.md5(expected_text))
        ).cast("long").alias("ok"),
        F.col("title").isNull().cast("long").alias("nul"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok"),
          F.sum("nul").alias("nulls")).collect()[0]
    t_html = time.time() - t0
    assert agg.rows == N_DOCS and agg.nulls == 0, (agg.rows, agg.nulls)
    assert agg.ok == N_DOCS, f"{N_DOCS - agg.ok} html rows failed"
    report["html"] = {
        "t_s": round(t_html, 2),
        "docs_per_s": int(N_DOCS / t_html),
        "nulls": int(agg.nulls),
        "rows_verified": int(agg.ok),
    }
    print(json.dumps(report["html"]), flush=True)

    # ---- fused admission leg (extract + links + robots, one stage) ------
    from sql_query_engine_spark.functions import robots as R

    docs_src = docs.withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 20)
                           .cast("string")))
    t0 = time.time()
    adm = R.admission_stats(docs_src).agg(
        F.count("*").alias("rows"),
        F.sum(F.col("allowed").cast("long")).alias("n_allowed"),
        F.sum(F.col("text_len").isNull().cast("long")).alias("nulls"),
    ).collect()[0]
    t_adm = time.time() - t0
    assert adm.rows == N_DOCS and adm.nulls == 0, (adm.rows, adm.nulls)
    assert 0 < adm.n_allowed < N_DOCS  # both decisions occur
    report["admission"] = {
        "t_s": round(t_adm, 2),
        "docs_per_s": int(N_DOCS / t_adm),
        "allowed_frac": round(adm.n_allowed / N_DOCS, 4),
    }
    print(json.dumps(report["admission"]), flush=True)

    # ---- corruption leg: one flipped byte fails attributably ------------
    victim = sorted(glob.glob(os.path.join(out_dir, "*.warc.gz")))[0]
    raw = bytearray(open(victim, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(raw))
    try:
        warc.read_warc_gz(spark, f"{out_dir}/*.warc.gz").agg(
            F.count("*")).collect()
        report["corruption"] = {"failed_attributably": False}
        raise SystemExit("corrupted shard read did NOT fail")
    except Exception as e:  # noqa: BLE001 — py4j wraps the ValueError
        msg = str(e)
        report["corruption"] = {
            "failed_attributably": os.path.basename(victim) in msg,
        }
    assert report["corruption"]["failed_attributably"], \
        "exception did not name the corrupted shard"
    shutil.rmtree(out_dir, ignore_errors=True)

    print(json.dumps(report))
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
