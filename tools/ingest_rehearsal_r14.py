"""Crawl-ingest rehearsal (r14): revisit/segment planes at 8M + the
streaming landing tail on FAT shards.

Two claims to price and prove (VERDICT r13 asks #3 and #6):

* planes at 8M (r13 priced them at 2M) — ``revisits=True,
  segments=16`` at 8M docs = **500k 3-member segment chains** and
  **800k revisit members** interleaved with the responses. Legs:
  write → read_reassemble (every response row md5-exact against the
  builder arithmetic, chains invisible) → revisit_scan (exactly the
  every-10th rows with the shared digest). Done-bar: flat per-doc cost
  vs the r13 2M reading, 100% verified.

* streaming tail on fat shards — r14 moved ``read_warc_gz_stream``
  off the whole-shard ``content`` column (the form the r13 rehearsal
  proved OOMs an 8 GiB heap at 452 MB shards) to a path-only
  projection + the same O(member) walker the batch readers use. This
  leg writes ~450 MB shards and tails them in a SUBPROCESS pinned to
  a 3 GiB driver heap — a reader whose footprint scales with shard
  bytes cannot survive that heap; the streamed walk must not notice.
  Every row is md5-verified through ``foreachBatch`` and one
  micro-batch per shard is asserted (maxFilesPerTrigger=1).

    python tools/ingest_rehearsal_r14.py [--out FILE.json]
    python tools/ingest_rehearsal_r14.py --stream-leg DIR N  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.sources import warc  # noqa: E402

from ingest_rehearsal_r11 import synth_docs  # noqa: E402
from ingest_rehearsal_r13 import planes_leg  # noqa: E402

N_PLANES = 8_000_000
N_STREAM = 2_000_000
N_STREAM_FILES = 2  # ~450 MB/shard — the Common-Crawl-scale shape
STREAM_HEAP = "3g"  # whole-shard form cannot survive this


def _expected(d):
    return F.concat(
        F.repeat(F.lit("lorem ipsum & <dolor> "),
                 (d % 19 + 1).cast("int")),
        F.lit("доc ☃ "), d.cast("string"))


def stream_leg_child(out_dir: str, n_docs: int) -> int:
    """Runs INSIDE the 3 GiB subprocess: tail the fat shards with the
    streaming source, verify every row, print one JSON line."""
    spark = get_spark("stream-fatshard-r14")
    spark.sparkContext.setLogLevel("ERROR")
    d = F.col("doc_id")
    expected_text = _expected(d)
    acc = {"rows": 0, "ok": 0}

    def _fb(bdf, _bid):
        r = (bdf.select(
                ((F.md5("text") == F.md5(expected_text))
                 & (F.col("content_length")
                    == F.octet_length(expected_text).cast("long")))
                .cast("long").alias("ok"))
             .agg(F.count("*").alias("n"), F.sum("ok").alias("ok"))
             .collect()[0])
        acc["rows"] += int(r.n)
        acc["ok"] += int(r.ok or 0)

    t0 = time.time()
    with tempfile.TemporaryDirectory() as ckpt:
        stream = warc.read_warc_gz_stream(
            spark, f"{out_dir}/*.warc.gz", maxFilesPerTrigger=1)
        q = (stream.writeStream.foreachBatch(_fb)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        batches = len([p for p in q.recentProgress
                       if p["numInputRows"] > 0])
    t_s = time.time() - t0
    assert acc["rows"] == n_docs and acc["ok"] == n_docs, acc
    assert batches >= N_STREAM_FILES, batches
    print(json.dumps({
        "t_s": round(t_s, 2),
        "docs_per_s": int(n_docs / t_s),
        "rows_verified": acc["ok"],
        "micro_batches": batches,
        "driver_heap": STREAM_HEAP,
    }), flush=True)
    return 0


def main() -> int:
    if "--stream-leg" in sys.argv:
        i = sys.argv.index("--stream-leg")
        return stream_leg_child(sys.argv[i + 1], int(sys.argv[i + 2]))

    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    report: dict = {"legs": {}}
    spark = get_spark("ingest-rehearsal-r14")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- revisit/segment planes at 8M (500k chains, 800k revisits) ---
    planes_leg(spark, report, n_docs=N_PLANES, leg_name="planes_8m")
    print(json.dumps({"leg_planes_8m": "done"}), flush=True)

    # ---- streaming landing tail on fat shards -------------------------
    out_dir = os.path.join(tempfile.gettempdir(), "stream_fatshard_r14")
    t0 = time.time()
    warc.write_warc_gz_dataset(synth_docs(spark, N_STREAM), out_dir,
                               n_files=N_STREAM_FILES,
                               revisits=True, segments=16)
    t_write = time.time() - t0
    import glob as _glob

    shard_mb = [round(os.path.getsize(p) / 1e6, 1) for p in
                sorted(_glob.glob(os.path.join(out_dir, "*.warc.gz")))]
    leg = {"n_docs": N_STREAM, "n_files": N_STREAM_FILES,
           "shard_mb_min_max": [min(shard_mb), max(shard_mb)],
           "write": {"t_s": round(t_write, 2),
                     "docs_per_s": int(N_STREAM / t_write)}}
    print(json.dumps(leg["write"]), flush=True)

    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=STREAM_HEAP)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--stream-leg", out_dir, str(N_STREAM)],
        capture_output=True, text=True, env=env, timeout=3600)
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, proc.returncode
    leg["stream_tail"] = json.loads(
        proc.stdout.strip().splitlines()[-1])
    print(json.dumps(leg["stream_tail"]), flush=True)

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    report["legs"]["stream_tail_fat_shards"] = leg

    if out:
        json.dump(report, open(out, "w"), indent=1)
    print(json.dumps({"ok": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
