"""ANN planner rehearsal at 1M vectors (r10).

The r10 planner (similarity.ann_plan / ann_topk) is unit-tested at 50k;
this rehearses the full decision surface at 1M — the scale the r9 IVF
curve was calibrated at — and measures the NEW hamming_prefilter_topk
fallback against the exact int8 scan on the corpus geometry it exists
for (uniform, no cluster structure, one-off batch):

* plan(clustered @1M)            → must choose "ivf"
* plan(uniform  @1M, amortized)  → must choose "ivf_wide" (≥50% probes)
* plan(uniform  @1M, one-off)    → r11: cost-modeled — "exact" under
  the n·d threshold (1M×64 is CPU-bound; exact dominates), "hamming"
  past it; the forced-threshold leg exercises the I/O-bound branch
* hamming_prefilter_topk vs int8_topk on uniform @1M: recall@10 +
  wall clock — the quality/cost point of the fallback.

    python tools/ann_planner_rehearsal.py [--n 1000000] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark import get_spark  # noqa: E402


def main() -> int:
    n = (
        int(sys.argv[sys.argv.index("--n") + 1])
        if "--n" in sys.argv
        else 1_000_000
    )
    out = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else None
    spark = get_spark("ann-planner-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    from sql_query_engine_spark.functions import similarity as S
    from sql_query_engine_spark.rehearsal import (
        synth_clustered_embeddings,
        synth_embeddings,
    )

    report: dict = {"n": n}

    clustered = synth_clustered_embeddings(spark, n).persist()
    clustered.count()
    t0 = time.monotonic()
    p_c = S.ann_plan(clustered)
    report["clustered_plan"] = {
        "strategy": p_c["strategy"],
        "est_recall": round(p_c["est_recall"], 4),
        "n_cells": len(p_c["centroid_ids"]),
        "n_probes": p_c["n_probes"],
        "t_plan_s": round(time.monotonic() - t0, 2),
    }
    assert p_c["strategy"] == "ivf", p_c["strategy"]
    clustered.unpersist()

    uniform = synth_embeddings(spark, n).persist()
    uniform.count()
    t0 = time.monotonic()
    p_u = S.ann_plan(uniform)
    report["uniform_plan_amortized"] = {
        "strategy": p_u["strategy"],
        "est_recall": round(p_u["est_recall"], 4),
        "n_cells": len(p_u["centroid_ids"]),
        "n_probes": p_u["n_probes"],
        "t_plan_s": round(time.monotonic() - t0, 2),
    }
    assert p_u["strategy"] == "ivf_wide", p_u["strategy"]
    assert p_u["n_probes"] >= len(p_u["centroid_ids"]) // 2

    # r11 cost boundary: a one-off uniform batch under the n·d
    # threshold plans exact (CPU-bound — recall 1.0 at ~hamming's wall
    # time); forcing the threshold to 0 exercises the I/O-bound branch
    p_u1 = S.ann_plan(uniform, amortized=False)
    report["uniform_plan_oneoff"] = {
        "strategy": p_u1["strategy"],
        "reason": p_u1["reason"],
        "nd": n * 64,
    }
    expected = "exact" if n * 64 <= 256_000_000 else "hamming"
    assert p_u1["strategy"] == expected, p_u1["strategy"]
    p_u1_io = S.ann_plan(uniform, amortized=False, exact_nd_threshold=0)
    report["uniform_plan_oneoff_io_bound"] = {
        "strategy": p_u1_io["strategy"],
        "reason": p_u1_io["reason"],
    }
    assert p_u1_io["strategy"] == "hamming", p_u1_io["strategy"]

    # the fallback's quality/cost point: hamming prefilter + exact int8
    # rescore vs the exact int8 full scan, uniform corpus, k=10, 8 queries
    t0 = time.monotonic()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.int8_topk(uniform).collect()
    }
    report["t_exact_int8_s"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    ham = {
        (r.query_id, r.neighbor_id)
        for r in S.hamming_prefilter_topk(uniform).collect()
    }
    report["t_hamming_prefilter_s"] = round(time.monotonic() - t0, 2)
    report["hamming_recall_at_10"] = round(len(ham & exact) / len(exact), 4)
    uniform.unpersist()

    print(json.dumps(report))
    if out:
        json.dump(report, open(out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
