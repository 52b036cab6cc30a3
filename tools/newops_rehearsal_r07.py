"""1M-scale probes for the round-7 operators.

Leg 1: sim_ivf_int8_topk two-stage retrieval at 1M vectors — the claim
under test is SUB-LINEAR SCAN VOLUME: candidate pools confined to probed
IVF cells (n_probes/n_cells of the corpus) versus the full-corpus pass
the exact int8 rescorer makes (27.7s at 1M in REHEARSAL_r06). Asserts
the planted near-duplicate neighbor is recovered, candidate pools stay
well under the corpus size, and records wall times for both paths.

    python tools/newops_rehearsal_r07.py [n_vecs] [--out FILE.json]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.functions import similarity  # noqa: E402
from sql_query_engine_spark.rehearsal import synth_embeddings  # noqa: E402

N_VECS = 1_000_000
N_CELLS = 64
N_PROBES = 8


def main() -> int:
    global N_VECS, N_CELLS
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    skip = {sys.argv.index("--out") + 1} if "--out" in sys.argv else set()
    pos = [a for i, a in enumerate(sys.argv[1:], 1)
           if not a.startswith("--") and i not in skip]
    if pos:
        N_VECS = int(pos[0])
        # keep pool fractions comparable: cells scale ~ sqrt growth
        N_CELLS = max(64, int(64 * (N_VECS / 1_000_000) ** 0.5))
    spark = get_spark("newops-rehearsal-r07")
    report: dict = {"n_vecs": N_VECS, "n_cells": N_CELLS, "n_probes": N_PROBES}

    emb = synth_embeddings(spark, N_VECS).persist()
    emb.count()

    cent_ids = tuple(sorted(random.Random(0xCE11).sample(
        range(8, N_VECS), N_CELLS)))

    # exact full-scan rescorer (the r6 baseline being composed away)
    t0 = time.monotonic()
    exact = similarity.int8_topk(emb, k=10, n_queries=8).collect()
    report["exact_full_scan_s"] = round(time.monotonic() - t0, 2)
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

    # index build (assignment fold + int8 codes): the ONE-TIME cost a
    # production deployment amortizes across query batches
    t0 = time.monotonic()
    assign_all, qn = similarity.ivf_int8_index(emb, centroid_ids=cent_ids)
    assign_all = assign_all.persist()
    qn = qn.persist()
    assign_all.count()
    qn.count()
    report["index_build_s"] = round(time.monotonic() - t0, 2)

    # query path against the persisted index — the per-batch cost that
    # must beat the exact full scan
    t0 = time.monotonic()
    got = similarity.ivf_int8_topk(
        emb, k=10, n_queries=8, n_probes=N_PROBES,
        centroid_ids=cent_ids, index=(assign_all, qn),
    ).collect()
    report["two_stage_query_s"] = round(time.monotonic() - t0, 2)

    # scan volume: per-query candidate pool vs corpus
    cand = (
        similarity.ivf_int8_topk(
            emb, k=10**9, n_queries=8, n_probes=N_PROBES,
            centroid_ids=cent_ids, index=(assign_all, qn),
        )
        .groupBy("query_id").count().collect()
    )
    pools = {r.query_id: r["count"] for r in cand}
    report["candidate_pools"] = pools
    report["max_pool_frac"] = round(max(pools.values()) / N_VECS, 4)
    assert max(pools.values()) < N_VECS * 0.5, pools

    # the planted near-duplicate (vec 1 = noisy copy of vec 0) must
    # surface for query 0 in the two-stage result — centroids partition
    # near-identical vectors into the same cell by construction
    got0 = {r.neighbor_id for r in got if r.query_id == 0}
    report["planted_recovered"] = 1 in got0
    assert 1 in got0

    # recall@10 vs the exact full scan
    hits = total = 0
    for qid, nbrs in exact_sets.items():
        two = {r.neighbor_id for r in got if r.query_id == qid}
        hits += len(two & nbrs)
        total += len(nbrs)
    report["recall_at_10"] = round(hits / total, 3)

    print(json.dumps(report, indent=1))
    if out:
        json.dump(report, open(out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
