"""CLI for the dedup/ANN scale rehearsal (see sql_query_engine_spark.rehearsal).

    python tools/scale_rehearsal.py [n_docs] [--out REHEARSAL.json]
    python tools/scale_rehearsal.py 10000000 --leg lsh --out lsh.json

Generates the planted synthetic corpus (default 100k docs — ~200× the
driver testdata), runs MinHash-LSH dedup → connected components and
multi-probe hyperplane-LSH ANN end-to-end, asserts the scale properties
(sub-quadratic candidates, ≥0.95 planted recall, O(diameter) CC rounds,
≥0.9 ANN recall), and prints the measured report as one JSON line.

``--leg {lsh,families,ann}`` runs ONE section in this process — the 10M
point needs it: local-mode shuffle files accumulate on disk until the
context ends, so the full suite's later legs inherit every earlier
leg's spill (r7 finding: a 48g driver filled the container disk at
10M). One fresh process per leg frees the spill between legs. Merge the
per-leg JSONs with tools/merge_rehearsal.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.rehearsal import (  # noqa: E402
    run_rehearsal,
    run_span_rehearsal,
    run_winnow_rehearsal,
)


def main() -> int:
    argv = sys.argv[1:]
    skip = {i + 1 for i, a in enumerate(argv) if a in ("--out", "--leg")}
    args = [
        a
        for i, a in enumerate(argv)
        if not a.startswith("--") and i not in skip
    ]
    n_docs = int(args[0]) if args else 100_000
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    legs = None
    if "--leg" in sys.argv:
        legs = (sys.argv[sys.argv.index("--leg") + 1],)

    spark = get_spark("scale-rehearsal")
    t0 = time.monotonic()
    if "--winnow" in sys.argv:
        report = run_winnow_rehearsal(spark, n_docs=n_docs)
    elif "--span" in sys.argv:
        report = run_span_rehearsal(spark, n_docs=n_docs)
    elif legs is not None:
        report = run_rehearsal(spark, n_docs=n_docs, legs=legs)
    else:
        report = run_rehearsal(spark, n_docs=n_docs)
    report["t_total_s"] = round(time.monotonic() - t0, 2)
    line = json.dumps(report)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
