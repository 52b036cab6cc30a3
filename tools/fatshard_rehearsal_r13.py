"""Fat-shard leg of the r13 ingest rehearsal: shard-size INDEPENDENCE.

The r13 streaming scan's claim is that per-task memory is O(one
inflated member), not O(shard) — the whole-shard binaryFile form OOM'd
an 8 GiB JVM at 8M docs / 64 shards (57 MB each). This leg writes the
SAME 8M docs into just 8 shards (~450 MB each, the Common-Crawl-scale
shard shape) and re-runs read_verify + meta on the same heap: a reader
whose footprint scales with shard bytes dies 8× harder here; the
streaming walk must not notice. Merges a ``8m_fat_shards`` leg into
REHEARSAL_r13_ingest.json.

    python tools/fatshard_rehearsal_r13.py [--out FILE.json]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.sources import warc  # noqa: E402

from ingest_rehearsal_r11 import synth_docs  # noqa: E402

N_DOCS = 8_000_000
N_FILES = 8


def main() -> int:
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("fatshard-rehearsal-r13")
    spark.sparkContext.setLogLevel("ERROR")
    d = F.col("doc_id")
    expected_text = F.concat(
        F.repeat(F.lit("lorem ipsum & <dolor> "),
                 (d % 19 + 1).cast("int")),
        F.lit("доc ☃ "), d.cast("string"))
    expected_len = F.octet_length(expected_text)

    out_dir = os.path.join(tempfile.gettempdir(), "fatshard_r13")
    t0 = time.time()
    warc.write_warc_gz_dataset(synth_docs(spark, N_DOCS), out_dir,
                               n_files=N_FILES)
    t_write = time.time() - t0
    shards = glob.glob(os.path.join(out_dir, "*.warc.gz"))
    shard_mb = [round(os.path.getsize(p) / 1e6, 1) for p in sorted(shards)]
    leg = {"n_docs": N_DOCS, "n_files": N_FILES,
           "shard_mb_min_max": [min(shard_mb), max(shard_mb)],
           "write": {"t_s": round(t_write, 2),
                     "docs_per_s": int(N_DOCS / t_write)}}
    print(json.dumps(leg), flush=True)

    t0 = time.time()
    back = warc.read_warc_gz(spark, f"{out_dir}/*.warc.gz")
    agg = back.select(
        ((F.col("content_length") == expected_len.cast("long"))
         & (F.md5("text") == F.md5(expected_text)))
        .cast("long").alias("ok"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok")).collect()[0]
    t_read = time.time() - t0
    assert agg.rows == N_DOCS and agg.ok == N_DOCS, (agg.rows, agg.ok)
    leg["read_verify"] = {
        "t_s": round(t_read, 2),
        "docs_per_s": int(N_DOCS / t_read),
        "rows_verified": int(agg.ok),
    }
    print(json.dumps(leg["read_verify"]), flush=True)

    t0 = time.time()
    meta = warc.read_warc_gz_meta(spark, f"{out_dir}/*.warc.gz")
    agg = meta.select(
        (F.col("digest_verified")
         & (F.col("payload_sha256") == F.sha2(expected_text, 256)))
        .cast("long").alias("ok"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok")).collect()[0]
    t_meta = time.time() - t0
    assert agg.rows == N_DOCS and agg.ok == N_DOCS, (agg.rows, agg.ok)
    leg["meta_read_verify"] = {
        "t_s": round(t_meta, 2),
        "docs_per_s": int(N_DOCS / t_meta),
        "rows_verified": int(agg.ok),
    }
    print(json.dumps(leg["meta_read_verify"]), flush=True)

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    if out:
        report = json.load(open(out)) if os.path.exists(out) else {"legs": {}}
        report["legs"]["8m_fat_shards"] = leg
        json.dump(report, open(out, "w"), indent=1)
    print(json.dumps({"ok": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
