"""r16 item-1 probe: isolate the per-Python-stage fixed cost.

Measures, in ONE process per config variant:
  * a JVM-only action (range.sum) — the no-Python floor
  * an identity mapInPandas over N rows at P partitions
  * an identity mapInArrow over the same
for P in {1, 4, 8, 16, 32} — repeated, min-of-k — under config variants
passed as KEY=VALUE args (applied via session extra_conf; session-level
confs only take effect when they are session-scoped, so each variant
should run as its own process).

Usage:
    python tools/overhead_probe_r16.py [k=v ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sql_query_engine_spark import get_spark  # noqa: E402


def timeit(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    extra = {}
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        extra[k] = v
    spark = get_spark("overhead-probe-r16", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd  # noqa: F401

    def ident_pandas(it):
        for pdf in it:
            yield pdf

    def ident_arrow(it):
        for rb in it:
            yield rb

    out: dict[str, float] = {}
    # warm the JVM + python worker pool once
    spark.range(0, 1000, 1, 4).mapInPandas(ident_pandas, "id long").count()

    out["jvm_range_sum_32p"] = timeit(
        lambda: spark.range(0, 1_000_000, 1, 32).groupBy().sum().collect()
    )
    for p in (1, 4, 8, 16, 32):
        base = spark.range(0, 100_000, 1, p)
        out[f"mapInPandas_p{p}"] = timeit(
            lambda b=base: b.mapInPandas(ident_pandas, "id long").count()
        )
        out[f"mapInArrow_p{p}"] = timeit(
            lambda b=base: b.mapInArrow(ident_arrow, "id long").count()
        )
    # two chained python stages at 32p — the fusion-motivating shape
    base32 = spark.range(0, 100_000, 1, 32)
    out["two_chained_p32"] = timeit(
        lambda: base32.mapInPandas(ident_pandas, "id long")
        .mapInPandas(ident_pandas, "id long")
        .count()
    )
    print(json.dumps({"conf": extra, "timings": out}, indent=1))


if __name__ == "__main__":
    main()
