"""Skew rehearsal for the AGGREGATION shape AQE cannot split.

REHEARSAL_r07_skew_10m measured JOIN skew: AQE's runtime skew split
(3.9 s) beat dim-replicating salting (43.5 s), so salting was reserved
"for shapes AQE can't split". This rehearsal quantifies that reserve
case: ``groupBy(hot_key).agg(collect_set(v))``. Plain sums are
skew-immune (map-side partials collapse hot-key rows before the
shuffle) and rank-filter top-k gets WindowGroupLimit's partial mode,
but a collect-style aggregate's partial state is the value set itself —
every row of the hot key lands in ONE reducer task, a single group AQE
cannot divide. ``operators.skew.salted_collect_set`` splits the
accumulation per value-hash salt and flattens the ≤ n_salt partials.

Measures, on a fact table with one key holding ``hot_share`` of all
rows: plain collect_set wall vs salted, result equality (sorted-set
checksum), and the hot key's task split.

    python tools/skew_agg_rehearsal_r08.py [n_rows] [--out FILE.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.operators.skew import salted_collect_set  # noqa: E402

N_ROWS = 10_000_000
HOT_SHARE = 0.9  # the pathological shape: one key carries 90% of rows
N_KEYS = 100_000
N_VALUES = 2_000_000


def checksum(df, set_col):
    # order-insensitive fingerprint: per-key sorted set -> hash -> sum
    return (
        df.select(
            F.xxhash64(F.col("k"), F.array_join(
                F.transform(F.array_sort(set_col), lambda x: x.cast("string")),
                ",",
            )).alias("h")
        )
        .agg(F.sum(F.col("h") % 1_000_003).alias("c"))
        .collect()[0]["c"]
    )


def main() -> int:
    global N_ROWS
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    skip = {sys.argv.index("--out") + 1} if "--out" in sys.argv else set()
    pos = [a for i, a in enumerate(sys.argv[1:], 1)
           if not a.startswith("--") and i not in skip]
    if pos:
        N_ROWS = int(pos[0])
    spark = get_spark("skew-agg-rehearsal")
    report: dict = {"n_rows": N_ROWS, "hot_share": HOT_SHARE,
                    "n_keys": N_KEYS, "n_values": N_VALUES}

    # string values: collect_set accumulation cost per row is what the
    # hot reducer task pays — int payloads are cheap enough that
    # local[32] hides a 50% hot key (measured 1.12×); the 90%-hot
    # string-set shape is where the single-task accumulation dominates
    hot_every = max(1, int(round(1 / (1 - HOT_SHARE))))
    fact = spark.range(N_ROWS).select(
        F.when(F.col("id") % hot_every != 0, F.lit(1))
        .otherwise(F.col("id") % N_KEYS)
        .alias("k"),
        F.concat(F.lit("value-"), (F.col("id") % N_VALUES)).alias("v"),
    ).persist()
    fact.count()

    t0 = time.monotonic()
    plain = fact.groupBy("k").agg(F.collect_set("v").alias("vs")).persist()
    c_plain = checksum(plain, F.col("vs"))
    report["plain_collect_set_s"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    salted = salted_collect_set(fact, "k", "v", n_salt=32).persist()
    c_salted = checksum(salted, F.col("v_set"))
    report["salted_collect_set_s"] = round(time.monotonic() - t0, 2)

    report["checksum_plain"] = str(c_plain)
    report["checksum_salted"] = str(c_salted)
    report["equal"] = c_plain == c_salted
    report["n_groups"] = plain.count()
    hot_n = fact.filter("k = 1").count()
    report["hot_key_rows"] = hot_n
    report["note"] = (
        "collect-style agg is the AQE-unsplittable skew shape; the "
        "salted two-level form distributes the hot key's accumulation"
    )
    assert report["equal"], report
    print(json.dumps(report, indent=1))
    if out:
        json.dump(report, open(out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
