"""TIFF-LZW decode throughput rehearsal (r10).

The new TIFF pixel path (multi-strip IFD walk + from-spec TIFF-6.0 LZW)
joins the media family's scale story: map-only, payloads never leave
the Arrow stage. Two legs at N docs (default 1M):

* clean leg — `synthesize_tiff_pixels(compression=5)` →
  `tiff_pixel_stats` fused in one map pass: docs/sec, zero nulls, and
  the channel-sum total cross-checked against the planted-grid
  arithmetic computed relationally (same formula the oracle states).
* corruption leg — one byte inside the FIRST LZW STRIP overwritten in
  10% of payloads (hash-picked): no task may fail and clean rows' sums
  must be unchanged by their neighbors' corruption. TIFF carries no
  integrity data (no CRC, unlike PNG/FLAC/Ogg), so a code-stream flip
  usually breaks the decode (invalid code / wrong decoded length →
  NULL) but CAN decode to same-length garbage — the leg therefore
  asserts the majority of victims reject and reports the exact
  fraction, documenting the format's weaker corruption floor honestly.

    python tools/tiff_rehearsal_r10.py [n_docs] [--out FILE.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.functions import multimodal  # noqa: E402

N_DOCS = 1_000_000


def main() -> int:
    global N_DOCS
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    skip = {sys.argv.index("--out") + 1} if "--out" in sys.argv else set()
    pos = [a for i, a in enumerate(sys.argv[1:], 1)
           if not a.startswith("--") and i not in skip]
    if pos:
        N_DOCS = int(pos[0])
    spark = get_spark("tiff-rehearsal-r10")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    report: dict = {"n_docs": N_DOCS}

    # expected channel-sum totals from the planted grid, computed
    # relationally (the oracle's arithmetic, summed over the corpus)
    grid = docs.select(
        "doc_id",
        ((F.col("doc_id") * 7) % 48 + 8).alias("w"),
        ((F.col("doc_id") * 13) % 32 + 8).alias("h"),
    ).select(
        "doc_id", "w", "h",
        F.explode(F.expr("sequence(0, w - 1)")).alias("x"),
    ).select(
        "doc_id", "w", "h", "x",
        F.explode(F.expr("sequence(0, h - 1)")).alias("y"),
    )
    want = grid.agg(
        F.sum((F.col("doc_id") * 7 + F.col("x") * 3 + F.col("y") * 5) % 256)
        .alias("sr"),
        F.sum((F.col("doc_id") * 11 + F.col("x") + 2 * F.col("y")) % 256)
        .alias("sg"),
        F.sum((F.col("doc_id") * 3 + 5 * F.col("x") + F.col("y")) % 256)
        .alias("sb"),
    ).first()

    t0 = time.monotonic()
    stats = multimodal.tiff_pixel_stats(
        multimodal.synthesize_tiff_pixels(docs, compression=5)
    )
    agg = stats.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("sum_r").isNull(), 1).otherwise(0)).alias("nulls"),
        F.sum("sum_r").alias("sr"),
        F.sum("sum_g").alias("sg"),
        F.sum("sum_b").alias("sb"),
    ).first()
    dt = time.monotonic() - t0
    report["clean"] = {
        "t_s": round(dt, 2),
        "docs_per_s": round(N_DOCS / dt),
        "nulls": agg.nulls,
        "sums_match_grid": (agg.sr, agg.sg, agg.sb)
        == (want.sr, want.sg, want.sb),
    }
    assert agg.n == N_DOCS and agg.nulls == 0
    assert report["clean"]["sums_match_grid"], (
        (agg.sr, agg.sg, agg.sb), (want.sr, want.sg, want.sb),
    )

    # corruption leg: flip one byte deep inside every 10th payload
    victim = "pmod(xxhash64(doc_id), 10) = 0"
    # byte 201 (1-based) sits inside the first LZW strip for every doc
    # in the pixel_dims range (data starts at 144-192; strip 0 is
    # >=110 bytes); overwrite with 0xFF (a 1/256 no-op when the byte
    # already is 0xFF — those victims legitimately stay clean)
    corrupted = multimodal.synthesize_tiff_pixels(docs, compression=5).select(
        "doc_id",
        F.expr(
            f"CASE WHEN {victim} THEN concat(substring(payload, 1, 200),"
            f" X'FF', substring(payload, 202)) ELSE payload END"
        ).alias("payload"),
    )
    t0 = time.monotonic()
    cstats = multimodal.tiff_pixel_stats(corrupted)
    cagg = cstats.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("sum_r").isNull(), 1).otherwise(0)).alias("nulls"),
        F.sum(
            F.when(F.expr(f"NOT ({victim})"), F.col("sum_r")).otherwise(0)
        ).alias("clean_sr"),
    ).first()
    dt = time.monotonic() - t0
    clean_want = (
        stats.filter(F.expr(f"NOT ({victim})"))
        .agg(F.sum("sum_r"))
        .first()[0]
    )
    n_victims = docs.filter(F.expr(victim)).count()
    report["corruption"] = {
        "t_s": round(dt, 2),
        "victims": n_victims,
        "rejected": int(cagg.nulls),
        "rejected_frac": round(cagg.nulls / n_victims, 4),
        "clean_rows_unaffected": cagg.clean_sr == clean_want,
    }
    assert cagg.n == N_DOCS
    assert report["corruption"]["clean_rows_unaffected"], "corruption leaked"
    # no CRC in TIFF: most (not provably all) strip flips must reject
    assert cagg.nulls >= n_victims * 0.5, report["corruption"]

    print(json.dumps(report))
    if out:
        json.dump(report, open(out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
