"""CLI for the dedup/ANN scale rehearsal (see sql_query_engine_spark.rehearsal).

    python tools/scale_rehearsal.py [n_docs] [--out REHEARSAL.json]

Generates the planted synthetic corpus (default 100k docs — ~200× the
driver testdata), runs MinHash-LSH dedup → connected components and
multi-probe hyperplane-LSH ANN end-to-end, asserts the scale properties
(sub-quadratic candidates, ≥0.95 planted recall, O(diameter) CC rounds,
≥0.9 ANN recall), and prints the measured report as one JSON line.
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
    skip = {i + 1 for i, a in enumerate(argv) if a == "--out"}
    args = [
        a
        for i, a in enumerate(argv)
        if not a.startswith("--") and i not in skip
    ]
    n_docs = int(args[0]) if args else 100_000
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    spark = get_spark("scale-rehearsal")
    t0 = time.monotonic()
    if "--winnow" in sys.argv:
        report = run_winnow_rehearsal(spark, n_docs=n_docs)
    elif "--span" in sys.argv:
        report = run_span_rehearsal(spark, n_docs=n_docs)
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
