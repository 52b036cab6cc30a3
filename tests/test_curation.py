"""Curation-operator invariants: the salted-hash decisions must be pure
functions of doc_id (reproducible anywhere — any engine, any partition
layout, any corpus growth), and the shuffle must be a true permutation.

These re-derive the md5 arithmetic in plain Python and compare per-row
against the Spark expressions — the engine-neutrality guarantee the
oracle hash-compare asserts in aggregate, pinned here at row level."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sql_query_engine_spark.catalog import load_table
from sql_query_engine_spark.queries import (
    _SHUFFLE_SHARDS,
    _SPARK_SPLIT_H,
    pipeline_dataset_mixture,
    pipeline_global_shuffle,
    pipeline_train_val_split,
)
from tests.conftest import SF_DIR

_MIX_RATES = {"en": 10000, "de": 5000, "es": 5000, "fr": 5000, "zh": 2500}


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _py_split(doc_id: int) -> str:
    h = _h48(f"{doc_id}:split") % 100
    return "val" if h < 5 else ("test" if h < 10 else "train")


def test_split_hash_matches_python_rowwise(spark):
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"), F.expr(_SPARK_SPLIT_H).alias("h")
    )
    for r in df.collect():
        assert r.h == _h48(f"{r.doc_id}:split") % 100


def test_split_partitions_the_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    split = pipeline_train_val_split(spark, SF_DIR)
    total = split.agg(F.sum("n_docs")).collect()[0][0]
    assert total == docs.count()
    names = {r.split for r in split.select("split").distinct().collect()}
    assert names <= {"train", "val", "test"}


def test_mixture_is_exactly_the_hash_rule(spark):
    docs = {r.doc_id: r.lang for r in
            load_table(spark, SF_DIR, "documents").select("doc_id", "lang").collect()}
    expected = {
        d for d, lang in docs.items()
        if _h48(f"{d}:mix") % 10000 < _MIX_RATES.get(lang, 0)
    }
    got = {r.doc_id for r in pipeline_dataset_mixture(spark, SF_DIR).collect()}
    assert got == expected and len(got) > 0


def test_global_shuffle_is_a_permutation(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = pipeline_global_shuffle(spark, SF_DIR).collect()
    assert {r.doc_id for r in out} == {r.doc_id for r in docs.select("doc_id").collect()}
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r.shard < _SHUFFLE_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, positions in by_shard.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


def test_split_membership_survives_corpus_growth(spark):
    """A doc's split never changes when new docs arrive — recompute the
    split on a half-corpus and on the full corpus; the common docs agree."""
    docs = load_table(spark, SF_DIR, "documents")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    tag = F.expr(_SPARK_SPLIT_H).alias("h")
    full_map = {r.doc_id: r.h for r in docs.select("doc_id", tag).collect()}
    half_map = {r.doc_id: r.h for r in half.select("doc_id", tag).collect()}
    assert all(full_map[d] == h for d, h in half_map.items())


def test_cluster_safe_split_no_neardup_leakage(spark):
    """The property the operator exists for: a near-dup PAIR never
    straddles splits (its two docs hash the same cluster id), while the
    naive per-doc split DOES leak on this corpus — proving the operator
    closes a real hole rather than a hypothetical one. Totals must cover
    the corpus exactly."""
    from sql_query_engine_spark.functions import dedup
    from sql_query_engine_spark.queries import pipeline_cluster_safe_split

    docs = load_table(spark, SF_DIR, "documents")
    pairs = dedup.minhash_lsh_pairs(docs).collect()
    assert pairs, "corpus has no planted near-dups?"

    clusters = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(
            docs.select("doc_id"), dedup.minhash_lsh_pairs(docs)
        ).collect()
    }

    def cluster_split(doc_id: int) -> str:
        h = _h48(f"{clusters[doc_id]}:csplit") % 100
        return "val" if h < 5 else ("test" if h < 10 else "train")

    for r in pairs:
        assert cluster_split(r.doc_a) == cluster_split(r.doc_b)

    # the naive doc-id split leaks at least one near-dup pair across
    # splits on this corpus (if it never leaked, the operator would be
    # indistinguishable from the naive one here)
    leaked = sum(1 for r in pairs if _py_split(r.doc_a) != _py_split(r.doc_b))
    assert leaked > 0

    agg = {r.split: (r.n_docs, r.n_clusters)
           for r in pipeline_cluster_safe_split(spark, SF_DIR).collect()}
    assert sum(n for n, _ in agg.values()) == docs.count()
    assert all(nc <= nd for nd, nc in agg.values())


def test_temperature_mixture_rebalances(spark):
    """α=0.5 temperature mixture: admission rates fall with source size
    (monotone non-increasing in n_src up to the min(1,·) cap), every
    admitted count matches its per-source hash rule, and small sources
    are admitted at a higher rate than large ones."""
    from sql_query_engine_spark.queries import pipeline_temperature_mixture

    rows = pipeline_temperature_mixture(spark, SF_DIR).collect()
    assert rows
    by_size = sorted(rows, key=lambda r: r.n_src)
    # rates monotone non-increasing as source size grows
    for a, b in zip(by_size, by_size[1:]):
        assert a.rate_r6 >= b.rate_r6 - 1e-9
    assert all(0.0 < r.rate_r6 <= 1.0 for r in rows)
    assert all(r.n_admitted <= r.n_src for r in rows)
    # row-level: admission is exactly the salted-hash rule
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    rate = {r.source: r.rate_r6 for r in rows}
    import math
    for r in rows:
        admitted = sum(
            1 for d in docs
            if d.source == r.source
            and _h48(f"{d.doc_id}:temp") % 1000000 < math.floor(rate[d.source] * 1000000)
        )
        # rate_r6 is rounded; tolerate boundary docs whose hash lands
        # within the rounding slack of the threshold
        assert abs(admitted - r.n_admitted) <= 2


def test_sample_stratified_rates_and_layout_independence(spark):
    """Realized per-stratum rates sit near their targets, and the keep
    set is a pure function of doc_id — identical after an arbitrary
    repartition (the property rand()-based sampleBy cannot give)."""
    from sql_query_engine_spark.queries import sample_stratified

    docs = load_table(spark, SF_DIR, "documents")
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = sample_stratified(spark, SF_DIR)
    by_lang = {r["lang"]: r["n"] for r in
               kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    targets = {"en": 0.60, "zh": 0.30, "es": 0.30, "de": 0.30, "fr": 0.30}
    for lang, target in targets.items():
        realized = by_lang.get(lang, 0) / totals[lang]
        assert abs(realized - target) < 0.12, (lang, realized, target)

    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    # same decision after a hostile repartition of the input
    redocs = docs.repartition(17, "source")
    redocs.createOrReplaceTempView("_strat_docs_reparted")
    rates = spark.createDataFrame(
        [("en", 60), ("zh", 30), ("es", 30), ("de", 30), ("fr", 30)],
        "lang string, pct int",
    )
    h = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint)"
    )
    kept2 = redocs.join(F.broadcast(rates), "lang").filter((h % 100) < F.col("pct"))
    ids2 = sorted(r["doc_id"] for r in kept2.select("doc_id").collect())
    assert ids1 == ids2


def test_domain_cap_keeps_hash_minimal_docs_per_source(spark):
    """The cap keeps exactly the K lowest (salted-hash, doc_id) ranks per
    source — re-derived row-by-row in plain Python."""
    from sql_query_engine_spark.queries import _CAP_PER_SOURCE, pipeline_domain_cap

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    by_source: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        by_source.setdefault(r.source, []).append((_h48(f"{r.doc_id}:cap"), r.doc_id))
    expected = {
        d
        for _, rows in by_source.items()
        for _, d in sorted(rows)[:_CAP_PER_SOURCE]
    }

    kept = pipeline_domain_cap(spark, SF_DIR)
    got = {r.doc_id for r in kept.select("doc_id").collect()}
    assert got == expected
    per_source = kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    assert all(r.n <= _CAP_PER_SOURCE for r in per_source)


def test_domain_cap_plan_has_window_group_limit(spark):
    """row_number<=K must trigger WindowGroupLimit: map tasks forward only
    partial top-K per source instead of the full per-source row set."""
    from sql_query_engine_spark.queries import pipeline_domain_cap

    plan = pipeline_domain_cap(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_table_diff_counts_match_modular_rule(spark):
    """added/removed/changed/unchanged counts re-derived from the carve
    arithmetic over the actual doc_id set."""
    from sql_query_engine_spark.queries import catalog_table_diff

    ids = [r.doc_id for r in
           load_table(spark, SF_DIR, "documents").select("doc_id").collect()]
    old = {d for d in ids if d % 11 != 0}
    new = {d for d in ids if d % 13 != 0}
    expected = {
        "added": len(new - old),
        "removed": len(old - new),
        "changed": len({d for d in old & new if d % 17 == 0}),
        "unchanged": len({d for d in old & new if d % 17 != 0}),
    }
    got = {r.change_class: r.n_rows for r in catalog_table_diff(spark, SF_DIR).collect()}
    assert got == {k: v for k, v in expected.items() if v > 0}


def test_heavy_hitters_exact_vs_bruteforce(spark):
    """Every reported word is exactly its brute-force count, the frac
    threshold is honored, and no qualifying word is missing."""
    import re

    from sql_query_engine_spark.queries import _HH_DENOM, agg_heavy_hitters

    texts = [r.text for r in
             load_table(spark, SF_DIR, "documents").select("text").collect()]
    counts: dict[str, int] = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    expected = {w: c for w, c in counts.items() if c * _HH_DENOM >= total}

    got = {r.word: r.cnt for r in agg_heavy_hitters(spark, SF_DIR).collect()}
    assert got == expected


def test_cdc_upsert_matches_python_compaction(spark):
    """Snapshot = last-writer-wins with tombstones, re-derived in Python."""
    from sql_query_engine_spark.queries import pipeline_cdc_upsert

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", F.expr("ts DIV 1000").alias("t"), "event_id", "event_type", "value"
    ).collect()
    last = {}
    for r in ev:
        key = (r.t, r.event_id)
        if r.user_id not in last or key > last[r.user_id][0]:
            last[r.user_id] = (key, r.event_type, r.value)
    expected = {
        u: (et, v, key[0])
        for u, (key, et, v) in last.items()
        if et != "error"  # tombstone: user absent from the snapshot
    }
    got = {
        r.user_id: (r.last_event_type, r.last_value, r.last_t_us)
        for r in pipeline_cdc_upsert(spark, SF_DIR).collect()
    }
    assert got == expected
    # tombstoned users must actually exist in the fixture (delete path hit)
    assert len(expected) < len(last)


def test_incremental_rollup_split_is_nontrivial(spark):
    """The history/delta carve must put rows on BOTH sides — otherwise
    the incremental-equals-full claim the oracle checks is vacuous."""
    from sql_query_engine_spark.queries import _ROLLUP_CUTOFF_DAY

    e = load_table(spark, SF_DIR, "events").select(
        F.expr("ts DIV 86400000000000").alias("day")
    )
    hist_n = e.filter(F.col("day") % 31 < _ROLLUP_CUTOFF_DAY).count()
    delta_n = e.filter(F.col("day") % 31 >= _ROLLUP_CUTOFF_DAY).count()
    assert hist_n > 0 and delta_n > 0


def test_null_safe_join_matches_null_key(spark):
    """The NULL ('error'-sentinel) key row must appear in the join output
    — the exact row plain equality would drop."""
    from sql_query_engine_spark.queries import join_null_safe

    rows = join_null_safe(spark, SF_DIR).collect()
    keys = {r.k for r in rows}
    assert None in keys          # NULL <=> NULL matched
    assert len(keys) == 5        # 4 real feeds + the NULL sentinel


def test_zorder_key_is_bijective_and_matches_python(spark):
    """The Morton key re-derived bit-by-bit in Python; distinct (na, nb)
    pairs map to distinct z (interleave is a bijection)."""
    from sql_query_engine_spark.queries import scalar_zorder_key

    def z_py(a: int, b: int, bits: int = 8) -> int:
        out = 0
        for i in range(bits):
            out += ((a >> i) & 1) << (2 * i)
            out += ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = scalar_zorder_key(spark, SF_DIR).collect()
    seen = {}
    for r in rows:
        assert r.z == z_py(r.na, r.nb), (r.na, r.nb, r.z)
        if (r.na, r.nb) in seen:
            assert seen[(r.na, r.nb)] == r.z
        seen[(r.na, r.nb)] = r.z
    assert len({(na, nb) for na, nb in seen}) == len(set(seen.values()))


def test_feed_freshness_anchored_to_corpus_max(spark):
    from sql_query_engine_spark.queries import catalog_feed_freshness

    rows = catalog_feed_freshness(spark, SF_DIR).collect()
    assert all(r.days_behind >= 0 for r in rows)
    assert any(r.days_behind == 0 for r in rows)  # the freshest feed


def test_token_budget_mixture_exact_and_deterministic(spark):
    """Admissions re-derived in Python: per language, docs in salted-hash
    order admitted while the running token sum stays under budget —
    exact, and the budget is never exceeded."""
    import re

    from sql_query_engine_spark.queries import (
        _TOKEN_BUDGET,
        pipeline_token_budget_mixture,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    by_lang: dict[str, list] = {}
    for r in docs:
        n_tok = len(re.findall(r"[a-z0-9]+", r.text.lower()))
        by_lang.setdefault(r.lang, []).append(
            (_h48(f"{r.doc_id}:budget"), r.doc_id, n_tok)
        )
    expected = {}
    for lang, rows in by_lang.items():
        cum = n = 0
        last = 0
        for _, _, t in sorted(rows):
            if cum + t > _TOKEN_BUDGET:
                break
            cum += t
            n += 1
            last = cum
        if n:
            expected[lang] = (n, last)

    got = {r.lang: (r.n_docs, r.tokens_admitted)
           for r in pipeline_token_budget_mixture(spark, SF_DIR).collect()}
    assert got == expected
    assert all(t <= _TOKEN_BUDGET for _, t in got.values())


def test_gapfill_locf_dense_and_carried(spark):
    """Each user's series is dense over [first, last] day; gap rows carry
    the most recent real value; non-gap rows carry their own."""
    from sql_query_engine_spark.queries import stream_gapfill_locf

    rows = sorted(
        ((r.user_id, r.day, r.v_filled, r.is_gap)
         for r in stream_gapfill_locf(spark, SF_DIR).collect()),
    )
    by_user: dict[int, list] = {}
    for u, d, v, g in rows:
        by_user.setdefault(u, []).append((d, v, g))
    assert by_user
    for u, series in by_user.items():
        days = [d for d, _, _ in series]
        assert days == list(range(days[0], days[-1] + 1))  # dense
        last_real = None
        for d, v, g in series:
            if g:
                assert v == last_real  # carried forward
            else:
                last_real = v
        assert not series[0][2]  # range starts at a REAL observation


def test_mode_and_argmax_vs_python(spark):
    """Mode user (deterministic tie-break) and extreme-value event ids
    re-derived in Python."""
    from sql_query_engine_spark.queries import agg_mode_and_argmax

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "user_id", "event_id", "value"
    ).collect()
    from collections import Counter

    by_feed: dict[str, list] = {}
    counts: dict[str, Counter] = {}
    for r in ev:
        by_feed.setdefault(r.event_type, []).append(r)
        counts.setdefault(r.event_type, Counter())[r.user_id] += 1
    expected = {}
    for feed, rows in by_feed.items():
        c = counts[feed]
        mode_user = min(c, key=lambda u: (-c[u], u))
        top = max(rows, key=lambda r: (r.value, r.event_id))
        bot = min(rows, key=lambda r: (r.value, -r.event_id))
        expected[feed] = (mode_user, c[mode_user], top.event_id, bot.event_id)

    got = {r.event_type: (r.mode_user, r.mode_count, r.top_event_id,
                          r.bottom_event_id)
           for r in agg_mode_and_argmax(spark, SF_DIR).collect()}
    assert got == expected


def test_histogram_quantiles_bracket_exact(spark):
    """The binned sketch's quantile upper edges must bracket the exact
    DISCRETE per-group percentiles (smallest value whose CDF >= q — the
    same ceiling-rank semantics the sketch uses) within one bin width."""
    import math
    import sys

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]
    from sql_query_engine_spark.catalog import load_table
    from tests.conftest import SF_DIR

    got = {r.o_orderpriority: r for r in
           q.agg_histogram_quantiles(spark, SF_DIR).collect()}
    rows = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_grp: dict[str, list[float]] = {}
    for r in rows:
        by_grp.setdefault(r.o_orderpriority, []).append(r.o_totalprice)

    W = 5_000
    for k, vals in by_grp.items():
        vals.sort()
        n = len(vals)
        g = got[k]
        assert g.n_orders == n
        for q100, est in ((50, g.p50_upper), (95, g.p95_upper),
                          (99, g.p99_upper)):
            true = vals[math.ceil(q100 * n / 100) - 1]  # discrete quantile
            # true lives in the bin whose upper edge the sketch reports
            assert est - W <= true < est, (k, q100, est, true)


def test_bitmap_distinct_equals_exact(spark):
    """The bitmap-chunk popcount must equal count(DISTINCT) exactly."""
    import sys

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]
    from sql_query_engine_spark.catalog import load_table
    from tests.conftest import SF_DIR

    got = {r.o_orderpriority: r.n_distinct_custs
           for r in q.agg_bitmap_distinct(spark, SF_DIR).collect()}
    exact = {
        r.o_orderpriority: r.n
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == exact and len(got) == 5


def test_constraint_check_clean_on_driver_data(spark):
    """The driver's star schema satisfies all five constraints; a planted
    orphan FK row must surface as a violation."""
    import sys

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]
    from tests.conftest import SF_DIR

    got = {r.constraint_name: (r.n_checked, r.n_violations)
           for r in q.catalog_constraint_check(spark, SF_DIR).collect()}
    assert set(got) == {
        "customer_pk_unique", "orders_custkey_fk", "lineitem_orderkey_fk",
        "orders_totalprice_positive", "documents_text_nonempty",
    }
    for name, (n, v) in got.items():
        assert n > 0 and v == 0, (name, n, v)

    # planted violation: copy the tables, orphan one orders row
    import tempfile

    from sql_query_engine_spark.catalog import TABLES, load_table

    with tempfile.TemporaryDirectory() as td:
        for t in TABLES:
            df = load_table(spark, SF_DIR, t)
            if t == "orders":
                orphan = df.limit(1).withColumn(
                    "o_custkey", F.lit(999_999_999)
                )
                df = df.unionByName(orphan)
            df.write.mode("overwrite").parquet(f"{td}/{t}.parquet")
        got2 = {r.constraint_name: r.n_violations
                for r in q.catalog_constraint_check(spark, td).collect()}
    assert got2["orders_custkey_fk"] == 1
    assert got2["customer_pk_unique"] == 0


def test_classifier_auc_matches_reference(spark):
    """The distributed two-pass-rank AUC must equal an independent
    pure-Python Mann-Whitney computation on the same score definition."""
    import sys
    from decimal import Decimal

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]
    from sql_query_engine_spark.catalog import load_table
    from tests.conftest import SF_DIR

    rows = load_table(spark, SF_DIR, "embeddings").collect()
    POS = 5
    vecs = {
        r.vec_id: ([Decimal(str(round(float(v), 7))) for v in r.embedding],
                   1 if r.label == POS else 0)
        for r in rows
    }
    dim = len(next(iter(vecs.values()))[0])
    centsum = [
        sum(v[p] for v, y in vecs.values() if y == 1) for p in range(dim)
    ]
    scored = sorted(
        (sum(v[p] * centsum[p] for p in range(dim)), vid, y)
        for vid, (v, y) in vecs.items()
    )
    # average ranks per tied score group
    ranks = {}
    i = 0
    while i < len(scored):
        j = i
        while j < len(scored) and scored[j][0] == scored[i][0]:
            j += 1
        r = (i + 1 + j) / 2  # avg of ranks i+1..j
        for k in range(i, j):
            ranks[scored[k][1]] = r
        i = j
    n_pos = sum(y for _, _, y in scored)
    n_neg = len(scored) - n_pos
    rank_sum = sum(ranks[vid] for _, vid, y in scored if y == 1)
    expected = round(
        (rank_sum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg), 6
    )

    got = q.pipeline_classifier_auc(spark, SF_DIR).collect()[0]
    assert (got.n_pos, got.n_neg) == (n_pos, n_neg)
    assert got.auc == expected
    assert got.auc > 0.6  # the centroid prototype has real signal


def test_classifier_calibration_bins_partition_and_order(spark):
    """Deciles partition the corpus evenly, bin score ranges are
    non-overlapping and increasing, and the overall positive count
    matches the AUC query's."""
    import sys

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]
    from tests.conftest import SF_DIR

    rows = sorted(
        q.pipeline_classifier_calibration(spark, SF_DIR).collect(),
        key=lambda r: r.bin,
    )
    assert [r.bin for r in rows] == list(range(10))
    n = sum(r.n_vecs for r in rows)
    assert max(r.n_vecs for r in rows) - min(r.n_vecs for r in rows) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.score_hi <= b.score_lo  # rank bins ⇒ disjoint score ranges
    auc_row = q.pipeline_classifier_auc(spark, SF_DIR).collect()[0]
    assert sum(r.n_pos for r in rows) == auc_row.n_pos
    assert n == auc_row.n_pos + auc_row.n_neg
    # the prototype score concentrates positives in the top deciles
    assert sum(r.n_pos for r in rows[7:]) > sum(r.n_pos for r in rows[:3])


def test_distribution_drift_psi_small_on_random_split(spark):
    """A random hash split of one corpus must show near-zero PSI (the
    null case); the term signs cancel and |sum| stays far under the 0.2
    alarm threshold."""
    import sys

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]
    from tests.conftest import SF_DIR

    rows = q.catalog_distribution_drift(spark, SF_DIR).collect()
    assert len(rows) >= 5  # enough bins to be meaningful
    total = sum(r.n_ref + r.n_cur for r in rows)
    assert total == 500
    psi = sum(r.psi_term for r in rows)
    # (p-q) and ln(p/q) share sign, so every term is a non-negative
    # divergence contribution; the null case sits far below the alarm
    assert all(r.psi_term >= 0 for r in rows)
    assert 0 <= psi < 0.2


def test_centroid_drift_null_vs_planted_shift(spark):
    """The hash-split null case must read near noise level; planting a
    +1.0 shift on dimension 0 of exactly the 'reference' cohort (same
    md5 rule as the query) must raise that label's drift by ~1."""
    import hashlib
    import sys
    import tempfile

    import pytest

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]

    def cohort(vec_id: int) -> int:
        h = hashlib.md5(f"{vec_id}:edrift".encode()).hexdigest()[:12]
        return 0 if int(h, 16) % 2 == 0 else 1

    def vec(vec_id: int, shift: bool) -> list[float]:
        base = [((vec_id * 31 + p * 7) % 200 - 100) / 100.0 for p in range(8)]
        if shift and cohort(vec_id) == 0:
            base[0] += 1.0
        return base

    rows_null = [(i, vec(i, False), i % 2) for i in range(400)]
    rows_shift = [(i, vec(i, True), i % 2) for i in range(400)]
    schema = "vec_id long, embedding array<float>, label int"

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows_null, schema).write.parquet(
            f"{td}/embeddings.parquet"
        )
        null_drift = {
            r.label: r.l1_drift
            for r in q.emb_centroid_drift(spark, td).collect()
        }
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows_shift, schema).write.parquet(
            f"{td}/embeddings.parquet"
        )
        shift_drift = {
            r.label: r.l1_drift
            for r in q.emb_centroid_drift(spark, td).collect()
        }

    for lbl in (0, 1):
        # planted +1 on dim 0 must add ~1 to the L1 drift of every label
        assert shift_drift[lbl] - null_drift[lbl] == pytest.approx(1.0, abs=0.05)


def test_countmin_one_sided_and_bounded(spark):
    """CM estimates never undercount (one-sided error) and the
    overestimate stays within the d=4, w=1024 sketch's expected bound
    (~2N/w per colliding row, far tighter after the min over 4 rows)."""
    import sys

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]
    from sql_query_engine_spark.catalog import load_table
    from tests.conftest import SF_DIR

    rows = q.agg_countmin_topk(spark, SF_DIR).collect()
    assert len(rows) == 10
    n = load_table(spark, SF_DIR, "orders").count()
    for r in rows:
        assert r.est_cnt >= r.true_cnt  # never undercounts
        assert r.est_cnt - r.true_cnt <= max(10, 2 * n // 1024)


def test_countmin_sketches_merge_exactly(spark):
    """The CM property that matters at scale: sketches built per
    partition (here: per order-priority slice) and merged cell-wise
    equal the sketch built in one pass over everything — incremental
    daily sketch maintenance is exact, only estimates are approximate."""
    import sys

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]
    from sql_query_engine_spark.catalog import load_table
    from sql_query_engine_spark.queries import _CM_D, _cm_bucket_spark
    from tests.conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders")

    def sketch(df):
        parts = None
        for r in range(_CM_D):
            p = df.select(
                F.lit(r).alias("row_id"),
                F.expr(_cm_bucket_spark(r)).alias("bucket"),
            )
            parts = p if parts is None else parts.unionByName(p)
        return {
            (r.row_id, r.bucket): r.cnt
            for r in parts.groupBy("row_id", "bucket")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }

    whole = sketch(o)
    merged: dict = {}
    for pr in [r[0] for r in o.select("o_orderpriority").distinct().collect()]:
        for cell, cnt in sketch(o.filter(F.col("o_orderpriority") == pr)).items():
            merged[cell] = merged.get(cell, 0) + cnt
    assert merged == whole and len(whole) > 0


def test_classifier_train_improves_over_random(spark):
    """The trained weight trajectory must (a) move every iteration —
    gradients are nonzero — and (b) produce scores whose training AUC
    beats random ranking by a margin, i.e. the distributed fit actually
    learns the label signal from the features."""
    from sql_query_engine_spark.queries import pipeline_classifier_train

    rows = sorted(
        pipeline_classifier_train(spark, SF_DIR).collect(),
        key=lambda r: r.iteration,
    )
    assert [r.iteration for r in rows] == [1, 2, 3, 4, 5]
    trajectory = [(r.bias, r.w_len, r.w_ws) for r in rows]
    assert len(set(trajectory)) == 5  # every step moves

    docs = load_table(spark, SF_DIR, "documents")
    feats = docs.select(
        F.expr("CASE WHEN text LIKE '%table%' THEN 1.0 ELSE 0.0 END").alias("y"),
        F.expr("cast(n_chars as double) / 1000.0").alias("x1"),
        F.expr(
            "cast(length(text) - length(replace(text, ' ', '')) as double)"
            " / 100.0"
        ).alias("x2"),
    ).collect()
    b, w1, w2 = trajectory[-1]
    scored = sorted((b + w1 * r.x1 + w2 * r.x2, r.y) for r in feats)
    n_pos = sum(1 for _, y in scored if y == 1.0)
    n_neg = len(scored) - n_pos
    assert n_pos and n_neg
    # Mann-Whitney AUC (ties broken by sort order; ample margin anyway)
    rank_sum = sum(i + 1 for i, (_, y) in enumerate(scored) if y == 1.0)
    auc = (rank_sum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert auc > 0.65, auc
