"""Join-scale rehearsal: salted-skew and Bloom-prefilter legs, measured.

Counterpart of tools/scale_rehearsal.py for the join operators whose
whole reason to exist is 100 TB behavior:

* **salted skew join** (operators/skew.py) — a synthetic power-law fact
  (30% of all rows on ONE key) joined to a dimension; the rehearsal
  asserts value-equality with the plain join and measures how the salt
  spreads the hot key's rows across buckets (the property that at
  cluster scale turns one straggler task into n_salt parallel ones).
* **Bloom semi-join** (operators/bloom.py) — a selective dimension
  against a wide fact; the rehearsal measures the survivor fraction the
  sketch passes to the exact join (vs the full fact scan a plain
  semi-join shuffles) and asserts zero false negatives at row level.

    python tools/join_rehearsal.py [n_fact_rows] [--out FILE.json]

Prints one JSON line. Wall times are local[32] and only meaningful
relative to each other; the structural numbers (spread, survivor
fraction, equality) are the scale claims.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.operators.bloom import (  # noqa: E402
    bloom_bitmap,
    bloom_probe,
    bloom_semi_join,
)
from sql_query_engine_spark.operators.skew import salted_join  # noqa: E402

HOT_SHARE = 0.3
N_SALT = 16


def run(spark, n_fact: int) -> dict:
    report: dict = {"n_fact": n_fact, "hot_share": HOT_SHARE, "n_salt": N_SALT}

    # --- salted skew join --------------------------------------------------
    # key 1 carries 30% of the fact; the rest spread over 100k keys
    fact = spark.range(n_fact).select(
        F.when(F.col("id") % 10 < 10 * HOT_SHARE, F.lit(1))
        .otherwise(F.pmod(F.xxhash64("id"), 100_000) + 2)
        .alias("k"),
        F.col("id").alias("row_id"),
    )
    dim = spark.range(100_002).select(
        F.col("id").alias("dk"), (F.col("id") * 3).alias("payload")
    )

    t0 = time.monotonic()
    plain = (
        fact.join(dim, fact["k"] == dim["dk"])
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
        .collect()[0]
    )
    report["t_plain_join_s"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    salted = (
        salted_join(fact, dim, [("k", "dk")], n_salt=N_SALT, salt_source="row_id")
        .agg(F.count("*").alias("n"), F.sum("payload").alias("s"))
        .collect()[0]
    )
    report["t_salted_join_s"] = round(time.monotonic() - t0, 2)
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"]), (
        "salted join changed the result"
    )
    report["join_rows"] = plain["n"]

    # hot-key spread: rows per salt bucket for the hot key
    spread = (
        fact.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("row_id"), F.lit(N_SALT)).alias("salt"))
        .groupBy("salt")
        .count()
        .agg(
            F.max("count").alias("mx"),
            F.min("count").alias("mn"),
            F.count("*").alias("buckets"),
        )
        .collect()[0]
    )
    hot_rows = int(n_fact * HOT_SHARE)
    report["hot_rows"] = hot_rows
    report["salt_buckets_used"] = spread["buckets"]
    report["salt_spread_max_over_even"] = round(
        spread["mx"] / (hot_rows / N_SALT), 3
    )
    assert spread["buckets"] == N_SALT, "hot key did not reach every bucket"
    assert spread["mx"] / (hot_rows / N_SALT) < 1.1, "salt skewed"

    # --- bloom prefiltered semi-join --------------------------------------
    # 1k-key selective dimension vs n_fact-row fact over 1M key space
    bfact = spark.range(n_fact).select(
        F.pmod(F.xxhash64("id"), 1_000_000).alias("fk"), F.col("id").alias("rid")
    )
    bdim = spark.range(1_000).select((F.col("id") * 997).alias("dk"))

    t0 = time.monotonic()
    exact = bfact.join(bdim, bfact["fk"] == bdim["dk"], "left_semi").count()
    report["t_plain_semi_s"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    bm = bloom_bitmap(bdim, "dk")
    survivors = bloom_probe(bfact, "fk", bm).count()
    bloomed = bloom_semi_join(bfact, bdim, "fk", "dk").count()
    report["t_bloom_semi_s"] = round(time.monotonic() - t0, 2)

    assert bloomed == exact, "bloom semi-join changed the result"
    report["semi_matches"] = exact
    report["bloom_survivors"] = survivors
    report["survivor_fraction"] = round(survivors / n_fact, 6)
    report["shuffle_cut_factor"] = round(n_fact / max(survivors, 1), 1)
    assert survivors >= exact, "bloom dropped a matching row"
    # m=2^17/k=5 over 1k keys → fpp ~1e-5; survivors ≈ matches
    assert survivors < exact + n_fact * 0.001, "false-positive rate blown"

    # --- CDC changelog compaction (the pipeline_cdc_upsert shape) ---------
    # n_fact-row changelog over 10k keys: rn=1 plans as WindowGroupLimit,
    # so each map partition forwards at most one candidate row per key it
    # holds. The structural claim: reduce-side input is bounded by
    # (partitions × keys), not log length — measured directly below.
    from pyspark.sql import Window

    n_keys = 10_000
    log = spark.range(n_fact).select(
        F.pmod(F.xxhash64("id"), n_keys).alias("key"),
        F.pmod(F.xxhash64("id", F.lit(1)), 1_000_000_000).alias("seq"),
        F.col("id").alias("payload"),
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc(), F.col("payload").desc())
    t0 = time.monotonic()
    compacted = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "seq", "payload")
    )
    got = compacted.agg(
        F.count("*").alias("n"), F.sum("payload").alias("chk")
    ).collect()[0]
    report["t_cdc_compact_s"] = round(time.monotonic() - t0, 2)

    # independent reduction: max_by over the same (seq, payload) order
    want = (
        log.groupBy("key")
        .agg(F.max(F.struct("seq", "payload")).alias("m"))
        .agg(F.count("*").alias("n"), F.sum("m.payload").alias("chk"))
        .collect()[0]
    )
    assert (got["n"], got["chk"]) == (want["n"], want["chk"]), (
        "window compaction != max_by reduction"
    )
    report["cdc_log_rows"] = n_fact
    report["cdc_keys"] = got["n"]
    # what WindowGroupLimit forwards: ≤1 row per (map partition, key)
    forwarded = (
        log.select(F.spark_partition_id().alias("pid"), "key")
        .distinct()
        .count()
    )
    report["cdc_forwarded_upper"] = forwarded
    report["cdc_shuffle_cut_factor"] = round(n_fact / forwarded, 1)
    assert forwarded < n_fact / 5, "compaction forwards too much"
    plan = compacted._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, "rn=1 did not plan as WindowGroupLimit"
    return report


def main() -> int:
    argv = sys.argv[1:]
    skip = {i + 1 for i, a in enumerate(argv) if a == "--out"}
    args = [
        a
        for i, a in enumerate(argv)
        if not a.startswith("--") and i not in skip
    ]
    n_fact = int(args[0]) if args else 5_000_000
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("join-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    report = run(spark, n_fact)
    line = json.dumps(report)
    print(line)
    if out:
        with open(out, "w") as fh:
            fh.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
