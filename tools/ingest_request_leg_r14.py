"""Request-plane ingest leg (r14 addendum): price the new
``requests=True`` writer + ``read_warc_requests`` scan at 2M docs and
prove the request members leave the response plane unperturbed.

Verification is total, not sampled: every request row's method /
target / agent / body-length / chunk-count / concurrent-to columns are
recomputed from the builder arithmetic Spark-side and summed — one
wrong byte in any of the 2M parsed client messages fails the assert —
and the response walk over the same shards must still count exactly N.

    python tools/ingest_request_leg_r14.py [--out FILE.json]

Appends leg ``request_plane_2m`` to REHEARSAL_r14_ingest.json.
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

from ingest_rehearsal_r11 import synth_docs  # noqa: E402

N_DOCS = 2_000_000
N_FILES = 16


def request_leg(spark, report: dict, n_docs: int = N_DOCS) -> None:
    docs = synth_docs(spark, n_docs)
    out_dir = os.path.join(tempfile.gettempdir(),
                           "ingest_rehearsal_requests_r14")
    try:
        _request_leg_body(spark, report, n_docs, docs, out_dir)
    finally:
        # the ~GB corpus must not survive a FAILED verification either
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)


def _request_leg_body(spark, report, n_docs, docs, out_dir) -> None:
    d = F.col("doc_id")
    t0 = time.time()
    warc.write_warc_gz_dataset(docs, out_dir, n_files=N_FILES,
                               requests=True)
    t_write = time.time() - t0
    leg = {"n_docs": n_docs, "n_files": N_FILES,
           "write": {"t_s": round(t_write, 2),
                     "docs_per_s": int(n_docs / t_write)}}
    print(json.dumps(leg["write"]), flush=True)

    # request plane: every column recomputed from builder arithmetic
    body_len = F.length(F.concat(
        F.lit("q="), d.cast("string"),
        F.lit("&page="), (d % 7).cast("string")))
    exp_body_len = F.when(d % 5 == 0, body_len).otherwise(F.lit(0))
    exp_chunks = F.when(
        d % 10 == 0, F.least(d % 3 + 1, body_len)).otherwise(F.lit(0))
    t0 = time.time()
    reqs = warc.read_warc_requests(spark, f"{out_dir}/*.warc.gz")
    agg = reqs.select(
        ((F.col("method")
          == F.when(d % 5 == 0, F.lit("POST")).otherwise(F.lit("GET")))
         & (F.col("request_target")
            == F.concat(F.lit("/doc/"), d.cast("string")))
         & (F.col("http_version") == "HTTP/1.1")
         & (F.col("user_agent")
            == F.concat(F.lit("sqes-crawler/"), (d % 3).cast("string")))
         & (F.col("body_len") == exp_body_len)
         & (F.col("n_chunks") == exp_chunks)
         & (F.col("concurrent_to")
            == F.concat(F.lit("<urn:uuid:00000000-0000-0000-0000-"),
                        F.format_string("%012d", d), F.lit(">"))))
        .cast("long").alias("ok"),
    ).agg(F.count("*").alias("rows"), F.sum("ok").alias("ok")).collect()[0]
    t_req = time.time() - t0
    assert agg.rows == n_docs and agg.ok == n_docs, (agg.rows, agg.ok)
    leg["request_scan"] = {
        "t_s": round(t_req, 2),
        "docs_per_s": int(n_docs / t_req),
        "rows_verified": int(agg.ok),
    }
    print(json.dumps(leg["request_scan"]), flush=True)

    # response plane unperturbed: the interleaved request members must
    # be invisible to the response walk — exactly N rows
    t0 = time.time()
    n_resp = warc.read_warc_gz(spark, f"{out_dir}/*.warc.gz").count()
    t_resp = time.time() - t0
    assert n_resp == n_docs, n_resp
    leg["response_scan_unperturbed"] = {
        "t_s": round(t_resp, 2), "rows": int(n_resp)}
    print(json.dumps(leg["response_scan_unperturbed"]), flush=True)

    report.setdefault("legs", {})["request_plane_2m"] = leg


def main() -> int:
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "REHEARSAL_r14_ingest.json")
    if "--out" in sys.argv:
        i = sys.argv.index("--out")
        if i + 1 >= len(sys.argv):
            print("usage: ingest_request_leg_r14.py [--out FILE.json]",
                  file=sys.stderr)
            return 2
        out = sys.argv[i + 1]
    spark = get_spark("ingest-request-leg-r14")
    spark.sparkContext.setLogLevel("ERROR")
    report = json.load(open(out)) if os.path.exists(out) else {"legs": {}}
    request_leg(spark, report)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
