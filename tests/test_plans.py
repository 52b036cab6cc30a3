"""Optimizer-parity tests: assert Catalyst does what the reference's
hand-written raopt rules did (SURVEY.md §4.1), by inspecting physical
plans — the honest Spark-native replacement for the reference's RA
string-equality tests (tests/test_raopt.py there).

| reference rule (raopt/raopt.py)     | asserted Catalyst behavior        |
|-------------------------------------|-----------------------------------|
| rule_push_down_selections (:97-173) | PushedFilters reach parquet scan  |
| rule_break_up/merge_selections      | single Filter node, conjunctive   |
| rule_introduce_joins (:274-306)     | σ(A×B) plans as a join, no        |
|                                     | CartesianProduct                  |
| (absent) column pruning             | ReadSchema pruned to used columns |
| (absent) join strategy selection    | small dims broadcast              |
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from sql_query_engine_spark.catalog import load_table
from tests.conftest import SF_DIR


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    c = load_table(spark, SF_DIR, "customer")
    df = c.filter(F.col("c_custkey") == 42).select("c_name")
    p = plan_of(df)
    assert "PushedFilters" in p
    assert "EqualTo(c_custkey,42)" in p


def test_column_pruning_reaches_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    p = plan_of(df)
    # ReadSchema contains only the two projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in p


def test_conjunction_stays_one_filter(spark):
    """raopt breaks conjunctions apart, pushes, then re-merges
    (rules 1+3). Catalyst's plan should show one Filter with the whole
    conjunction pushed to the scan."""
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.filter((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05))
    p = plan_of(df)
    import re

    filter_nodes = re.findall(r"\(\d+\) Filter", p)
    assert len(filter_nodes) == 1  # one physical Filter node, merged conjunction
    assert "GreaterThan(l_quantity,30" in p
    assert "LessThan(l_discount,0.05" in p


def test_cross_becomes_join(spark):
    """reference rule_introduce_joins: σ_{a=b}(A × B) → A ⋈ B. In Spark,
    an equality predicate over a crossJoin must plan as a hash join, not
    CartesianProduct / BroadcastNestedLoop."""
    c = load_table(spark, SF_DIR, "customer")
    n = load_table(spark, SF_DIR, "nation")
    df = c.crossJoin(n).filter(F.col("c_nationkey") == F.col("n_nationkey"))
    p = plan_of(df)
    assert "CartesianProduct" not in p
    assert "NestedLoop" not in p
    assert "Join" in p


def test_small_dims_broadcast(spark):
    """nation/region must broadcast under the session's threshold — no
    shuffle of the fact side's join keys."""
    c = load_table(spark, SF_DIR, "customer")
    n = load_table(spark, SF_DIR, "nation")
    r = load_table(spark, SF_DIR, "region")
    df = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey")
    )
    p = plan_of(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_theta_residual_keeps_hash_join(spark):
    """Mixed equi+theta condition: the equi part must still plan a hash
    join with the theta residual as a post-condition — not degrade to a
    nested loop over the full cross space."""
    c = load_table(spark, SF_DIR, "customer").alias("c")
    s = load_table(spark, SF_DIR, "supplier").alias("s")
    df = c.join(
        s,
        (F.col("c.c_nationkey") == F.col("s.s_nationkey"))
        & (F.col("c.c_acctbal") < F.col("s.s_acctbal")),
    )
    p = plan_of(df)
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p or "ShuffledHashJoin" in p or "SortMergeJoin" in p


def test_global_topk_avoids_full_sort(spark):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (per-partition
    heap), not a global Sort."""
    o = load_table(spark, SF_DIR, "orders")
    df = o.orderBy(F.col("o_totalprice").desc()).limit(10)
    p = plan_of(df)
    assert "TakeOrderedAndProject" in p


def test_whole_stage_codegen_on_agg_path(spark):
    """The TPC-H Q1 aggregation path must stay inside whole-stage codegen
    (scan → filter → partial agg)."""
    from sql_query_engine_spark.queries import queries

    df = queries()["agg_pricing_summary"](spark, SF_DIR)
    # AQE: codegen annotations only appear once THIS df's plan is finalized
    # (count() would execute a different, derived plan)
    df.collect()
    p = plan_of(df)
    # formatted explain marks codegen stages with "[codegen id : N]"
    assert "codegen id :" in p


def test_inspect_helpers_api(spark):
    """plans.inspect — the public plan-inspection API — agrees with the
    raw explain text used above."""
    from sql_query_engine_spark.plans.inspect import (
        join_strategies,
        pushed_filters,
        read_schema,
    )

    c = load_table(spark, SF_DIR, "customer")
    n = load_table(spark, SF_DIR, "nation")
    df = (
        c.filter(F.col("c_custkey") < 100)
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .select("c_custkey", "n_name")
    )
    assert any("c_custkey" in f for f in pushed_filters(df))
    assert set(read_schema(df)) == {"c_custkey", "c_nationkey", "n_nationkey", "n_name"}
    assert join_strategies(df) == ["BroadcastHashJoin"]


def test_partial_aggregation_before_shuffle(spark):
    """groupBy on a low-cardinality key must do map-side partial
    aggregation (HashAggregate appears both below and above the
    exchange)."""
    li = load_table(spark, SF_DIR, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    p = plan_of(df)
    assert p.count("HashAggregate") >= 2


def test_query_construction_is_lazy(spark):
    """Building a registry query must launch NO Spark job — the registry
    is a lazy-plan contract (the round-1 text_idf eager count() was the
    one violation; this pins the fix and guards the rest). Queries with
    documented driver-side iteration (clustering, k-means training) are
    exempt."""
    import uuid

    from sql_query_engine_spark.queries import registry

    LAZY_SAMPLE = {
        "text_idf",
        "tpch_q3_shipping_priority",
        "dedup_minhash_lsh",
        "dedup_incremental_stateless",
        "text_pack_sequences",
        "window_distribution_scale",
        "window_ntile_scale",
        "join_asof_tolerance",
        "text_char_entropy",
    }
    sc = spark.sparkContext
    # warm the table schemas first: the FIRST spark.read.parquet of a file
    # runs a one-time footer-reading job, which is scan setup, not query
    # construction
    from sql_query_engine_spark.catalog import TABLES

    for t in TABLES:
        load_table(spark, SF_DIR, t).schema

    for q in registry():
        if q.name not in LAZY_SAMPLE:
            continue
        group = f"lazy-{q.name}-{uuid.uuid4().hex[:8]}"
        sc.setJobGroup(group, "lazy construction check")
        try:
            q.spark(spark, SF_DIR)  # build only — no action
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        assert jobs == [], f"{q.name} ran jobs at construction: {jobs}"


def test_tpch_suite_is_complete_and_dimension_joins_broadcast(spark):
    """All 22 TPC-H shapes are registered (Q1 lives under its round-1 name
    agg_pricing_summary), and the suite's dimension joins broadcast —
    lineitem/orders/customer are the only shuffle participants."""
    from sql_query_engine_spark.plans.inspect import join_strategies
    from sql_query_engine_spark.queries import queries

    qs = queries()
    tpch = {n for n in qs if n.startswith("tpch_")}
    assert len(tpch) == 21
    assert "agg_pricing_summary" in qs  # the Q1 shape

    # Q9: part (LIKE-filtered), supplier, nation all broadcast; the only
    # non-broadcast joins are the fact-fact lineitem⋈orders shuffle.
    strategies = join_strategies(qs["tpch_q9_product_type_profit"](spark, SF_DIR))
    assert strategies.count("BroadcastHashJoin") >= 3
    assert strategies.count("SortMergeJoin") + strategies.count("ShuffledHashJoin") <= 1

    # Q2: the per-part argmax is a partitioned window, never a global one.
    p = plan_of(qs["tpch_q2_min_cost_supplier"](spark, SF_DIR))
    assert "BroadcastHashJoin" in p


def test_curation_plan_shapes(spark):
    """Plan pins for the curation operators: the mixture filter is
    map-only (zero exchanges), the global shuffle's window is partitioned
    (never a one-task global sort), and decontamination's gram join is a
    real equi-join (no nested-loop / cartesian fallback)."""
    from sql_query_engine_spark.plans.inspect import formatted_plan, join_strategies
    from sql_query_engine_spark.queries import queries

    reg = queries()

    mix = formatted_plan(reg["pipeline_dataset_mixture"](spark, SF_DIR))
    assert "Exchange" not in mix  # pure scan→filter→project

    shuf = formatted_plan(reg["pipeline_global_shuffle"](spark, SF_DIR))
    assert "Window" in shuf
    # every Window node must carry a partition spec (shard key)
    for line in shuf.splitlines():
        if line.strip().startswith("Arguments") and "windowspecdefinition" in line:
            assert "hkey" in line  # partitioned by (hkey % shards)

    decon = reg["pipeline_decontaminate"](spark, SF_DIR)
    strategies = join_strategies(decon)
    assert strategies, "expected a join in the decontamination plan"
    assert all(
        s in {"SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"}
        for s in strategies
    ), strategies

    piv = formatted_plan(reg["agg_native_pivot"](spark, SF_DIR))
    assert "CartesianProduct" not in piv and "BroadcastNestedLoopJoin" not in piv


def test_join_strategy_hints_are_respected(spark):
    """Planner control: strategy hints must override the size heuristics —
    the manual override lever when Catalyst's stats mislead at scale
    (stale statistics, exploding intermediate results)."""
    from sql_query_engine_spark.plans.inspect import join_strategies

    li = load_table(spark, SF_DIR, "lineitem")
    n = load_table(spark, SF_DIR, "nation")
    o = load_table(spark, SF_DIR, "orders")

    # nation is broadcast-sized; the merge hint must force SMJ anyway
    merged = li.join(
        n.hint("merge"), li["l_suppkey"] % 25 == n["n_nationkey"]
    )
    assert "SortMergeJoin" in join_strategies(merged)

    hashed = li.join(o.hint("shuffle_hash"), li["l_orderkey"] == o["o_orderkey"])
    assert "ShuffledHashJoin" in join_strategies(hashed)

    bcast = li.join(o.hint("broadcast"), li["l_orderkey"] == o["o_orderkey"])
    assert "BroadcastHashJoin" in join_strategies(bcast)
