"""IVF probes-vs-recall curve on the UNIFORM worst-case corpus.

The r8 rehearsal (tools/ivf_rehearsal_r08.py) fixed the production
operating point at √N cells / √cells probes and measured recall@10 =
1.0 on the clustered (production-geometry) corpus — but only 0.588@1M /
0.55@4M on uniform random noise, IVF's adversarial worst case, where no
cell layout concentrates true neighbors. The r8 verdict (#3) asks for
the full curve: sweep the probe count on the uniform corpus and either
find a knee where recall ≥ 0.9 is affordable, or document that none
exists and prescribe the fallback.

Method: build the index ONCE (cell assignment is probe-independent),
persist it, then sweep n_probes ∈ {31, 62, 125, 250, 500, 1000} — 31 =
the √cells production point, 1000 = every cell = a full scan routed
through the index. Per point: recall@10 against the exact int8 full
scan, max/mean candidate-pool fraction, and per-batch query wall time.
The exact full scan itself is the fallback baseline: recall 1.0 by
construction at a cost the curve lets you compare directly.

Expected (and r9-measured) shape: on uniform data recall grows roughly
linearly with scanned fraction — there is no knee. The documented
operating rule that follows (also in ivf_operating_point's docstring):
IVF requires cluster structure; when a corpus has none (recall on a
held-out sample ≪ the clustered expectation at the same scan fraction),
run the exact int8 full scan (sim_int8_topk — recall 1.0, ~17 s at
1M×128 on local[32]) or a binary-Hamming prefilter (sim_hamming_topk
shape), both of which beat a ~90%-scan IVF on total cost.

    python tools/ivf_rehearsal_r09_uniform.py [n_vecs] [--out FILE.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.functions import similarity  # noqa: E402
from sql_query_engine_spark.rehearsal import synth_embeddings  # noqa: E402

N_VECS = 1_000_000
PROBE_SWEEP = (31, 62, 125, 250, 500, 1000)


def main() -> int:
    global N_VECS
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    skip = {sys.argv.index("--out") + 1} if "--out" in sys.argv else set()
    pos = [a for i, a in enumerate(sys.argv[1:], 1)
           if not a.startswith("--") and i not in skip]
    if pos:
        N_VECS = int(pos[0])
    spark = get_spark("ivf-rehearsal-r09-uniform")

    cent_ids, base_probes = similarity.ivf_operating_point(N_VECS)
    emb = synth_embeddings(spark, N_VECS).persist()
    emb.count()

    report: dict = {
        "n_vecs": N_VECS,
        "corpus": "uniform (adversarial worst case)",
        "n_cells": len(cent_ids),
        "production_probes": base_probes,
    }

    # exact full scan = ground truth AND the fallback baseline
    t0 = time.monotonic()
    exact = similarity.int8_topk(emb, k=10, n_queries=8).collect()
    report["exact_full_scan_s"] = round(time.monotonic() - t0, 2)
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    t0 = time.monotonic()
    assign, qn = similarity.ivf_int8_index(
        emb, centroid_ids=cent_ids, assign_method="arrow"
    )
    assign = assign.persist()
    qn = qn.persist()
    assign.count()
    qn.count()
    report["index_build_s"] = round(time.monotonic() - t0, 2)

    curve = []
    for n_probes in PROBE_SWEEP:
        if n_probes > len(cent_ids):
            continue
        point: dict = {"n_probes": n_probes}
        t0 = time.monotonic()
        got = similarity.ivf_int8_topk(
            emb, k=10, n_queries=8, n_probes=n_probes,
            centroid_ids=cent_ids, index=(assign, qn),
        ).collect()
        point["query_s"] = round(time.monotonic() - t0, 2)
        pools = {
            r.query_id: r["count"]
            for r in similarity.ivf_int8_topk(
                emb, k=10**9, n_queries=8, n_probes=n_probes,
                centroid_ids=cent_ids, index=(assign, qn),
            ).groupBy("query_id").count().collect()
        }
        point["mean_pool_frac"] = round(
            sum(pools.values()) / len(pools) / N_VECS, 4
        )
        point["max_pool_frac"] = round(max(pools.values()) / N_VECS, 4)
        hits = total = 0
        for qid, nbrs in exact_sets.items():
            two = {r.neighbor_id for r in got if r.query_id == qid}
            hits += len(two & nbrs)
            total += len(nbrs)
        point["recall_at_10"] = round(hits / total, 3)
        curve.append(point)
        print(json.dumps(point), flush=True)

    report["curve"] = curve

    # the documented boundary: scan fraction needed for recall >= 0.9 on
    # uniform data vs what the exact fallback costs
    ok = [p for p in curve if p["recall_at_10"] >= 0.9]
    report["min_probes_for_recall_0.9"] = ok[0]["n_probes"] if ok else None
    report["fallback"] = (
        "exact int8 full scan (sim_int8_topk): recall 1.0 at "
        f"{report['exact_full_scan_s']}s — use it (or a binary-Hamming "
        "prefilter) whenever the corpus lacks cluster structure"
    )

    print(json.dumps(report, indent=1))
    if out:
        json.dump(report, open(out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
