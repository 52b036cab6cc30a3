"""Memory-pressure rehearsal: the heaviest legs under a constrained heap.

The r8 ENOSPC lesson covered DISK pressure (raw shingle strings filled
the container; fixed by the 48-bit hash-carry). This rehearsal covers
the HEAP: run the three heaviest legs in the engine under a
deliberately small ``spark.driver.memory`` (local mode: driver heap IS
the executor heap) and record that they complete by SPILLING instead of
OOMing — the behavior a 100 TB job depends on when a stage's working
set exceeds executor memory.

One leg per process (local-mode shuffle files persist until the context
ends — the r7 finding), launched by tools/run_spill_rehearsal.sh with
``SPARK_GRAFT_DRIVER_MEM`` set to the leg's documented floor:

* ``minhash`` — the MinHash→banded-LSH pairs leg (the engine's biggest
  shuffle) at 3M docs under a 4g heap (48g was the comfortable 10M
  configuration; 4g at 3M is ~1/4 the per-core budget).
* ``winnow``  — winnowing fingerprints + self-join at 1M docs, 4g.
* ``pagerank`` — graph_pagerank at sf0.1 under a 1g heap (iterative
  loop + localCheckpoint blocks competing with execution memory).

Spill evidence comes from the Spark status REST API (the UI is enabled
on a random port for this process only): per-stage
``memoryBytesSpilled`` / ``diskBytesSpilled`` summed across the leg.
A leg passes when it completes its correctness assertions AND the
process never OOMs; the recorded spill bytes document that the heap was
genuinely undersized (a zero-spill run proves nothing).

    python tools/spill_rehearsal_r09.py --leg minhash [--n 3000000] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark import get_spark  # noqa: E402

DEFAULT_N = {"minhash": 3_000_000, "winnow": 1_000_000, "pagerank": 0}


def rest_spill_totals(spark) -> dict:
    """Sum spill/peak-memory metrics across completed stages via the
    status REST API — public, version-stable, and the same numbers the
    UI renders."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url, timeout=30))
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    peak = max((s.get("peakExecutionMemory", 0) for s in stages), default=0)
    return {
        "n_stages": len(stages),
        "memory_spilled_mb": round(mem / 2**20, 1),
        "disk_spilled_mb": round(disk / 2**20, 1),
        "max_stage_peak_execution_mb": round(peak / 2**20, 1),
    }


def main() -> int:
    leg = sys.argv[sys.argv.index("--leg") + 1]
    out = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else None
    n = (
        int(sys.argv[sys.argv.index("--n") + 1])
        if "--n" in sys.argv
        else DEFAULT_N[leg]
    )
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        f"spill-rehearsal-{leg}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )

    report: dict = {"leg": leg, "heap": heap, "n": n}
    t0 = time.monotonic()
    if leg == "minhash":
        from sql_query_engine_spark.rehearsal import run_rehearsal

        inner = run_rehearsal(spark, n_docs=n, legs=("pairs",))
        report["recall"] = inner.get("recall")
        report["inner_t_s"] = inner.get("t_minhash_lsh_s")
    elif leg == "winnow":
        from sql_query_engine_spark.rehearsal import run_winnow_rehearsal

        inner = run_winnow_rehearsal(spark, n_docs=n)
        report["pairs_found"] = inner["pairs_found"]
        report["inner_t_s"] = inner.get("t_winnow_s")
    elif leg == "pagerank":
        from sql_query_engine_spark.queries import queries

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        rows = queries()["graph_pagerank"](spark, sf_dir).collect()
        report["n"] = len(rows)
        assert len(rows) > 0
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown leg {leg!r}")
    report["wall_s"] = round(time.monotonic() - t0, 2)
    report.update(rest_spill_totals(spark))

    print(json.dumps(report))
    if out:
        json.dump(report, open(out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
