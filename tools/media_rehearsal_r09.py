"""Multimodal decode throughput rehearsal at 1M documents.

The media family's scale story is "map-only: payloads live inside the
Arrow stage, only typed stats leave" — but every prior measurement was
sf0.1 (5k docs). Two legs at 1M:

* metadata leg — `synthesize_media` → `decode_media` (header walk over
  real PNG/JPEG/GIF containers): docs/sec and a zero null fraction.
* pixel leg — `synthesize_png_pixels` → `pixel_stats` (FULL decode:
  zlib inflate + five-filter unfilter + channel sums): docs/sec, then a
  corruption pass that flips one mid-IDAT byte in 10% of payloads
  (hash-picked) and asserts the 100 TB contract — corrupt rows become
  NULL rows, never task failures, and clean rows' stats are unchanged
  by their neighbors' corruption. (Header-level decoders can't see a
  payload-body flip, which is exactly why the corruption pass must run
  the pixel path.)

    python tools/media_rehearsal_r09.py [n_docs] [--out FILE.json]
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
    spark = get_spark("media-rehearsal-r09")
    docs = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))

    report: dict = {"n_docs": N_DOCS}

    # clean leg: synthesize + decode fused in one map-only pass
    t0 = time.monotonic()
    decoded = multimodal.decode_media(multimodal.synthesize_media(docs))
    agg = decoded.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("format").isNull(), 1).otherwise(0)).alias("nulls"),
        F.sum("width").alias("sw"),
        F.sum("height").alias("sh"),
    ).collect()[0]
    wall = time.monotonic() - t0
    report["clean"] = {
        "wall_s": round(wall, 2),
        "docs_per_sec": int(N_DOCS / wall),
        "null_fraction": agg["nulls"] / agg["n"],
        "sum_width": agg["sw"],
        "sum_height": agg["sh"],
    }
    assert agg["n"] == N_DOCS
    assert agg["nulls"] == 0, report

    # pixel leg: FULL decode (zlib + unfilter + sums) at scale
    t0 = time.monotonic()
    px = multimodal.pixel_stats(multimodal.synthesize_png_pixels(docs))
    aggp = px.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("width").isNull(), 1).otherwise(0)).alias("nulls"),
        F.sum(F.when(F.col("doc_id") % 10 != 0, F.col("width"))).alias("sw_clean"),
    ).collect()[0]
    wall = time.monotonic() - t0
    report["pixels"] = {
        "wall_s": round(wall, 2),
        "docs_per_sec": int(N_DOCS / wall),
        "null_fraction": aggp["nulls"] / aggp["n"],
    }
    assert aggp["n"] == N_DOCS and aggp["nulls"] == 0, report

    # corruption pass: flip one mid-IDAT byte in 10% of payloads — the
    # zlib stream (or its checksum) breaks, the row must become NULL,
    # and no task may fail
    def _flip(batches):
        for pdf in batches:
            flipped = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if int(doc_id) % 10 == 0:
                    b = bytearray(payload)
                    b[len(b) // 2] ^= 0xFF
                    flipped.append(bytes(b))
                else:
                    flipped.append(payload)
            pdf = pdf.copy()
            pdf["payload"] = flipped
            yield pdf

    t0 = time.monotonic()
    corrupted = multimodal.synthesize_png_pixels(docs).mapInPandas(
        _flip, "doc_id long, payload binary"
    )
    agg2 = multimodal.pixel_stats(corrupted).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("width").isNull(), 1).otherwise(0)).alias("nulls"),
        F.sum(F.when(F.col("doc_id") % 10 != 0, F.col("width"))).alias("sw_clean"),
    ).collect()[0]
    n_victims = (N_DOCS + 9) // 10  # doc_id % 10 == 0 over range(N)
    report["corrupted"] = {
        "wall_s": round(time.monotonic() - t0, 2),
        "null_rows": agg2["nulls"],
        "victim_rows": n_victims,
    }
    assert agg2["n"] == N_DOCS
    # a mid-IDAT flip corrupts the deflate stream or a CRC; nearly every
    # victim must reject (a flip can land on a byte zlib tolerates, so
    # allow a small survivor margin), and never MORE than the victims
    assert agg2["nulls"] <= n_victims, report
    assert agg2["nulls"] >= int(n_victims * 0.9), report
    report["corrupted"]["reject_fraction_of_victims"] = round(
        agg2["nulls"] / n_victims, 4
    )

    # clean rows' stats unchanged by neighbors' corruption
    assert agg2["sw_clean"] == aggp["sw_clean"], (
        agg2["sw_clean"], aggp["sw_clean"]
    )
    report["clean_rows_unaffected"] = True

    print(json.dumps(report, indent=1))
    if out:
        json.dump(report, open(out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
