"""1M-scale probes for the round-6 corpus operators.

Each probe rebuilds the operator's exact plan shape on a synthetic
1M-row input (spark.range — no driver data) and asserts the structural
invariants that matter at scale: output cardinality bounds, planted
values recovered, and wall time recorded. Mirrors the round-5 probe
discipline (REHEARSAL_r05_newops_1m.json).

    python tools/newops_rehearsal_r06.py [--out FILE.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sql_query_engine_spark import get_spark  # noqa: E402
from sql_query_engine_spark.rehearsal import synth_documents, synth_embeddings  # noqa: E402

N_DOCS = 1_000_000
N_EVENTS = 1_000_000
N_USERS = 10_000


def main() -> int:
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    spark = get_spark("newops-rehearsal-r06")
    report: dict = {"n_docs": N_DOCS, "n_events": N_EVENTS}

    docs = synth_documents(spark, N_DOCS).select(
        "doc_id",
        "text",
        F.expr("concat('s', cast(doc_id % 1000 as string))").alias("source"),
        F.lit("en").alias("lang"),
    ).persist()
    docs.count()

    # -- span corruption: per-doc windows only ---------------------------
    t0 = time.monotonic()
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    w = Window.partitionBy("doc_id").orderBy("pos")
    marked = toks.select(
        "doc_id", "pos", "tok",
        F.expr("CASE WHEN pos % 7 = 3 THEN 2 WHEN pos % 7 = 4 AND pos > 3"
               " THEN 1 ELSE 0 END").alias("role"),
        F.lead("tok").over(w).alias("nxt"),
    )
    spans = marked.filter(F.col("role") == 2).groupBy("doc_id").count()
    n_span_docs = spans.count()
    report["span_corruption_s"] = round(time.monotonic() - t0, 2)
    report["span_docs"] = n_span_docs
    assert n_span_docs == N_DOCS  # every 104-token doc has spans

    # -- preference pairs: stratum-keyed windows + bounded pair join ------
    t0 = time.monotonic()
    # token count + a deterministic per-doc offset: the synthetic corpus
    # is fixed-length, and identical scores would make the strict-margin
    # filter vacuous — the variance restores a real ranking workload
    scored = docs.select(
        "doc_id", "source", "lang",
        (F.expr("size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))")
         + F.expr("(doc_id div 1000) % 50")).alias("score"),
    )
    wb = Window.partitionBy("source", "lang").orderBy(F.desc("score"),
                                                     "doc_id")
    ww = Window.partitionBy("source", "lang").orderBy("score", "doc_id")
    ranked = scored.select(
        "doc_id", "source", "lang", "score",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    b = ranked.filter(F.col("rb") <= 5).alias("b")
    wv = ranked.filter(F.col("rw") <= 5).alias("w")
    prefs = b.join(
        wv,
        (F.col("b.source") == F.col("w.source"))
        & (F.col("b.lang") == F.col("w.lang"))
        & (F.col("b.rb") == F.col("w.rw")),
    ).filter(F.col("b.score") > F.col("w.score"))
    n_prefs = prefs.count()
    report["preference_pairs_s"] = round(time.monotonic() - t0, 2)
    report["preference_pairs"] = n_prefs
    assert 0 < n_prefs <= 5 * 1000  # bounded by K per stratum, non-vacuous

    # -- group advantage: one moment pass + group join --------------------
    t0 = time.monotonic()
    g = scored.groupBy("source", "lang").agg(
        F.count("*").alias("n"), F.sum("score").alias("s"),
        F.sum(F.col("score") * F.col("score")).alias("ss"),
    ).filter(F.col("n") >= 2)
    adv = scored.join(g, ["source", "lang"]).select(
        "doc_id",
        (F.col("score") - F.col("s").cast("double") / F.col("n"))
        .alias("adv"),
    )
    n_adv = adv.count()
    report["group_advantage_s"] = round(time.monotonic() - t0, 2)
    assert n_adv == N_DOCS

    # -- postings delta: term-keyed lag window + aggregate ----------------
    t0 = time.monotonic()
    ptoks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            )
        ).alias("tok"),
    )
    wp = Window.partitionBy("tok").orderBy("doc_id")
    gaps = ptoks.select(
        "tok",
        F.coalesce(F.col("doc_id") - F.lag("doc_id").over(wp),
                   F.col("doc_id") + 1).alias("g"),
    )
    vb = F.expr("CASE WHEN g < 128 THEN 1 WHEN g < 16384 THEN 2 "
                "WHEN g < 2097152 THEN 3 WHEN g < 268435456 THEN 4 "
                "ELSE 5 END")
    post = gaps.groupBy("tok").agg(F.count("*").alias("df"),
                                   F.sum(vb).alias("bytes"))
    n_terms = post.count()
    report["postings_delta_s"] = round(time.monotonic() - t0, 2)
    report["postings_terms"] = n_terms
    assert n_terms <= 30_000  # vocab-bounded, never corpus-sized

    # -- events: token bucket, late accounting, rolling slope -------------
    ev = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        (F.col("id") % N_USERS).alias("user_id"),
        (F.col("id") * 7919 % 1_000_000_000).alias("us"),
        (F.col("id") % 997).cast("double").alias("value"),
    ).persist()
    ev.count()

    t0 = time.monotonic()
    import pandas as pd
    from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                                   StructField, StructType)

    schema = StructType([
        StructField("event_id", LongType(), False),
        StructField("admitted", BooleanType(), False),
        StructField("tokens_after", IntegerType(), False),
    ])

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"])
        tokens, prev, adm, aft = 3, None, [], []
        for us in pdf["us"]:
            if prev is not None:
                tokens = min(3, tokens + (int(us) - prev) // 300_000_000)
            ok = tokens >= 1
            if ok:
                tokens -= 1
            adm.append(ok)
            aft.append(tokens)
            prev = int(us)
        return pd.DataFrame({"event_id": pdf["event_id"].values,
                             "admitted": adm, "tokens_after": aft})

    tb = ev.groupBy("user_id").applyInPandas(bucket, schema)
    n_tb = tb.count()
    report["token_bucket_s"] = round(time.monotonic() - t0, 2)
    assert n_tb == N_EVENTS

    t0 = time.monotonic()
    # arrival = event time + modular network delay (the real query's
    # shape) — ordering by arrival lets newer events overtake older ones
    eva = ev.withColumn(
        "arrive", F.col("us") + (F.col("event_id") * 37 % 900) * 1_000_000
    )
    wlate = (Window.partitionBy("user_id").orderBy("arrive", "event_id")
             .rowsBetween(Window.unboundedPreceding, -1))
    late = eva.select(
        "event_id", "us", F.max("us").over(wlate).alias("wm")
    ).filter(F.col("wm").isNotNull()
             & (F.col("us") < F.col("wm") - 300_000_000))
    n_late = late.count()
    report["late_accounting_s"] = round(time.monotonic() - t0, 2)
    report["late_events"] = n_late
    assert n_late > 0  # the jitter must actually produce overtakes

    t0 = time.monotonic()
    wr = Window.partitionBy("user_id").orderBy("us", "event_id")
    evx = ev.withColumn("x", F.row_number().over(wr)).withColumn(
        "y", F.col("value").cast("decimal(18,6)"))
    wf = (Window.partitionBy("user_id").orderBy("x")
          .rowsBetween(-9, Window.currentRow))
    slopes = evx.select(
        "event_id",
        F.count("*").over(wf).alias("n"),
        F.sum("x").over(wf).cast("bigint").alias("sx"),
        F.sum("y").over(wf).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(wf).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(wf).cast("double").alias("sxy"),
    ).filter(F.col("n") == 10)
    n_slopes = slopes.count()
    report["rolling_slope_s"] = round(time.monotonic() - t0, 2)
    assert n_slopes == N_EVENTS - 9 * N_USERS

    # -- int8 top-k over 1M vectors ---------------------------------------
    t0 = time.monotonic()
    emb = synth_embeddings(spark, N_DOCS)
    base = emb.select(
        "vec_id",
        F.array_max(F.expr("transform(embedding, x -> abs(x))")).alias("m"),
        "embedding",
    ).filter(F.col("m") > 0).select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(floor(cast(x as double)"
               " * (127.0d / m) + 0.5d) as bigint))").alias("qv"),
    )
    q = base.filter(F.col("vec_id") < 8).alias("q")
    c = base.alias("c")
    scored8 = F.broadcast(q).join(
        c, F.col("q.vec_id") != F.col("c.vec_id")
    ).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        F.expr("aggregate(zip_with(q.qv, c.qv, (x, y) -> x * y), 0L,"
               " (a, v) -> a + v)").alias("dot"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("dot").desc(),
                                                F.col("neighbor_id"))
    topk = scored8.withColumn("rank", F.row_number().over(wk)).filter(
        F.col("rank") <= 10)
    rows = topk.collect()
    report["int8_topk_1m_s"] = round(time.monotonic() - t0, 2)
    # planted neighbor (i, i+1) must be rank 1 for every query i % 10 == 0
    got = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    planted_hits = sum(1 for qid, nid in got.items()
                      if qid % 10 == 0 and nid == qid + 1)
    report["int8_planted_rank1"] = planted_hits
    assert planted_hits >= 1  # query 0 is planted

    line = json.dumps(report)
    print(line)
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
