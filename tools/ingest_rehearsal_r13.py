"""Crawl-ingest throughput rehearsal (r13): the 8M-doc ladder leg +
the new record planes at scale.

Two claims to price and prove:

* 8M leg (VERDICT r12 #5) — the r12 round moved WAT emission from the
  RDD bridge (OOM'd at 4M) to Arrow ``mapInPandas`` with the claim
  that per-task footprint is corpus-size-independent; the next
  doubling tests it. Runs the full r12 ladder (write → read_verify →
  meta → WAT → corruption) at 8M docs by reusing
  ``ingest_rehearsal_r12.main`` verbatim.
* revisit/segment leg (VERDICT r12 #3 at scale) — the r13 response
  walk reassembles segmented records and skips/scans the revisit
  plane; this leg writes 2M docs with ``revisits=True, segments=16``
  (200k revisit members, 125k 3-member segment chains interleaved)
  and verifies: every response row reassembles byte-exact (md5
  against the builder arithmetic), the revisit scan surfaces exactly
  the expected rows with the shared digest, and throughput stays in
  family with the unsegmented read.

    python tools/ingest_rehearsal_r13.py [--out FILE.json]
"""

from __future__ import annotations

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

import ingest_rehearsal_r12 as r12  # noqa: E402
from ingest_rehearsal_r11 import synth_docs  # noqa: E402

N_LADDER = 8_000_000
N_PLANES = 2_000_000
N_FILES = 64


def planes_leg(spark, report: dict, n_docs: int = N_PLANES,
               leg_name: str = "planes_2m") -> None:
    """Parametrized since r14 (the r14 rehearsal re-runs this same leg
    at 8M docs / 500k chains — VERDICT r13 ask #6)."""
    N_PLANES = n_docs  # noqa: N806 — shadow the module default locally
    docs = synth_docs(spark, N_PLANES)
    d = F.col("doc_id")
    expected_text = F.concat(
        F.repeat(F.lit("lorem ipsum & <dolor> "),
                 (d % 19 + 1).cast("int")),
        F.lit("доc ☃ "), d.cast("string"))

    out_dir = os.path.join(tempfile.gettempdir(),
                           f"ingest_rehearsal_planes_{leg_name}")
    t0 = time.time()
    warc.write_warc_gz_dataset(docs, out_dir, n_files=N_FILES,
                               revisits=True, segments=16)
    t_write = time.time() - t0
    leg = {"n_docs": N_PLANES, "n_files": N_FILES,
           "write": {"t_s": round(t_write, 2),
                     "docs_per_s": int(N_PLANES / t_write)}}
    print(json.dumps(leg["write"]), flush=True)

    # response plane: reassembly must be invisible — every row byte-
    # exact against the builder arithmetic, count exactly N (no revisit
    # leaks into the response walk, no segment chain dropped)
    t0 = time.time()
    back = warc.read_warc_gz(spark, f"{out_dir}/*.warc.gz")
    agg = back.select(
        (F.md5("text") == F.md5(expected_text)).cast("long").alias("ok"),
        (d % 16 == 0).cast("long").alias("seg"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok"),
          F.sum("seg").alias("segmented")).collect()[0]
    t_read = time.time() - t0
    assert agg.rows == N_PLANES and agg.ok == N_PLANES, (agg.rows, agg.ok)
    leg["read_reassemble"] = {
        "t_s": round(t_read, 2),
        "docs_per_s": int(N_PLANES / t_read),
        "rows_verified": int(agg.ok),
        "segmented_rows": int(agg.segmented),
    }
    print(json.dumps(leg["read_reassemble"]), flush=True)

    # revisit plane: exactly the every-10th rows, each carrying the
    # original's URI and the shared entity digest
    t0 = time.time()
    revs = warc.read_warc_revisits(spark, f"{out_dir}/*.warc.gz")
    agg = revs.select(
        ((d % 10 == 0)
         & (F.col("refers_to_uri")
            == F.concat(F.lit("http://example.com/doc/"),
                        d.cast("string")))
         & (F.col("payload_sha256") == F.sha2(expected_text, 256)))
        .cast("long").alias("ok"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok")).collect()[0]
    t_rev = time.time() - t0
    want = (N_PLANES + 9) // 10
    assert agg.rows == want and agg.ok == want, (agg.rows, agg.ok, want)
    leg["revisit_scan"] = {
        "t_s": round(t_rev, 2),
        "rows": int(agg.rows),
        "rows_verified": int(agg.ok),
    }
    print(json.dumps(leg["revisit_scan"]), flush=True)

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    report["legs"][leg_name] = leg


def main() -> int:
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    report: dict = {"legs": {}}
    spark = get_spark("ingest-rehearsal-r13")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 8M ladder leg: the r12 rehearsal, unchanged, at 2x ----------
    with tempfile.NamedTemporaryFile(suffix=".json", mode="r") as tf:
        sys.argv = [sys.argv[0], str(N_LADDER), "--out", tf.name]
        rc = r12.main()
        assert rc == 0
        report["legs"]["8m"] = json.load(open(tf.name))
    print(json.dumps({"leg_8m": "done"}), flush=True)

    # ---- revisit/segment planes at 2M ---------------------------------
    planes_leg(spark, report)

    if out:
        json.dump(report, open(out, "w"), indent=1)
    print(json.dumps({"ok": True}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
