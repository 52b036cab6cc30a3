"""1M-vector exact-AUC rehearsal: the two-pass Mann-Whitney rank AUC
(pipeline_classifier_auc's shape — per-partition sort + offset rejoin,
never a global sort) over a synthetic scored corpus with a planted
signal, asserted against the closed-form expectation band.

    python tools/auc_rehearsal.py [n_vecs] [--out FILE.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
        argv = [a for a in argv if a != out]
    n = int(argv[0]) if argv else 1_000_000
    spark = get_spark("auc-rehearsal")

    # planted signal: positives (10%) score uniformly higher on average
    scored = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 10 == 0).cast("int").alias("label"),
        (
            (F.col("id") * 2654435761 % 1_000_003).cast("double") / 1_000_003
            + (F.col("id") % 10 == 0).cast("int") * 0.5
        ).alias("score"),
    )

    t0 = time.monotonic()
    # exact Mann-Whitney: rank every score (ties impossible here by
    # construction), AUC = (sum of positive ranks - npos*(npos+1)/2)
    # / (npos * nneg) — the rank comes from a per-partition sort plus a
    # partition-offset rejoin, never one global sort task
    part = scored.repartitionByRange(32, "score")
    w = Window.partitionBy(F.spark_partition_id()).orderBy("score")
    local = part.select(
        "label",
        F.spark_partition_id().alias("pid"),
        F.row_number().over(w).alias("lr"),
    )
    sizes = local.groupBy("pid").agg(F.count("*").alias("cnt"))
    woff = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = sizes.select(
        "pid", F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("off")
    )
    ranked = local.join(F.broadcast(offsets), "pid").select(
        "label", (F.col("lr") + F.col("off")).alias("rank")
    )
    agg = ranked.groupBy().agg(
        F.sum(F.when(F.col("label") == 1, F.col("rank"))).alias("rsum"),
        F.sum("label").alias("npos"),
        F.count("*").alias("ntot"),
    ).collect()[0]
    npos, nneg = agg.npos, agg.ntot - agg.npos
    auc = (agg.rsum - npos * (npos + 1) / 2) / (npos * nneg)
    t = round(time.monotonic() - t0, 2)

    report = {"n_vecs": n, "n_pos": int(npos), "n_neg": int(nneg),
              "auc": round(float(auc), 6), "t_auc_s": t}
    # uniform(0,1) vs uniform(0.5,1.5): P(pos > neg) = 7/8
    assert abs(auc - 0.875) < 0.01, report
    line = json.dumps(report)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
