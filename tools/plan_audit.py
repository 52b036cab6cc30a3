"""Plan-shape audit across the whole query inventory.

Flags plans that would not survive scale: unexpected CartesianProduct,
nested-loop joins outside the known theta/all-pairs verifiers, and
sort-merge joins where a broadcast was expected. Run after adding or
changing operators:

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.plans.inspect import (  # noqa: E402
    formatted_plan,
    join_strategies,
)
from sql_query_engine_spark.queries import registry  # noqa: E402

# queries whose plans legitimately contain a nested-loop / cartesian /
# sort-merge join, with the reason
EXPECTED = {
    "ref_cross_product": "explicit cartesian is the operator",
    "ref_theta_join_pure": "pure non-equi join → broadcast NLJ by design",
    "dedup_embedding_cosine": "all-pairs exactness baseline (scale path is LSH)",
    "dedup_simhash_pairs": "all-pairs Hamming verifier (scale path is "
    "dedup_simhash_lsh banding)",
    "text_idf": "crossJoin of a broadcast 1-row corpus-count aggregate — "
    "the lazy replacement for an eager driver-side count()",
    "sim_cosine_topk": "broadcast NLJ of tiny query set vs corpus — correct",
    "join_full_outer": "full outer cannot broadcast; SMJ is the right strategy",
    "join_range_bands": "theta join against a 5-row broadcast band table — "
    "BNLJ here IS the lookup",
    "sim_ivf_topk": "corpus-side joins shuffle (SMJ) by design — sizes are "
    "unknown past the mapInPandas boundary, and at scale the cell join is "
    "a shuffle anyway",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = 0
    for q in registry():
        try:
            df = q.spark(spark, sf_dir)
            plan = formatted_plan(df)
            js = join_strategies(df)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {q.name}: {e}")
            flagged += 1
            continue
        problems = []
        if "CartesianProduct" in plan:
            problems.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in js:
            problems.append(f"BNLJ×{js.count('BroadcastNestedLoopJoin')}")
        if "SortMergeJoin" in js:
            problems.append(f"SMJ×{js.count('SortMergeJoin')}")
        if problems and q.name in EXPECTED:
            print(f"ok   {q.name}: {problems} — {EXPECTED[q.name]}")
        elif problems:
            print(f"FLAG {q.name}: {problems} joins={js}")
            flagged += 1
    print(f"\naudited {len(registry())} queries, {flagged} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
