"""Contract sanity for the query registry / driver entry points."""

from __future__ import annotations

import re

from sql_query_engine_spark.queries import (
    _GATE_PRIORITY,
    oracle_sql,
    probes,
    queries,
    registry,
)
from tests.conftest import SF_DIR


def test_registry_names_unique():
    names = [q.name for q in registry()]
    assert len(names) == len(set(names))


def test_gate_priority_exact_and_unique():
    """_GATE_PRIORITY must list every registered query exactly once —
    round 8's re-certification backfill was silently inert because 13
    duplicated names ranked at their LAST occurrence (past the driver's
    ~50-row budget), certifying different rows than planned (ADVICE r8).
    Diagnostic probes are retired from the public registry (VERDICT r8
    #1) and must never reappear in it."""
    names = [q.name for q in registry()]
    assert sorted(_GATE_PRIORITY) == sorted(set(_GATE_PRIORITY)) == sorted(names)
    assert not any(n.startswith("probe_") for n in names)
    assert set(probes()) == {
        "probe_hugeint_canary", "probe_epoch_sums", "probe_q12_boundary",
        "probe_late_margin", "probe_q12_robust", "probe_late_robust",
    }


def test_rotation_structural_invariants():
    """The gate rotation can never again ship a window with zero parity
    canaries or with a never-driver-green query deferred (VERDICT r13
    "Next round #2": r12/r13 ran one-round amendments that did exactly
    that; the flags are deleted and the constraints are now assertions
    in tools/rotate_gate.py — this test re-runs them against the live
    CORRECTNESS artifacts on every pytest run AND holds the COMMITTED
    ``_GATE_PRIORITY`` to the same window bars, so a stale or
    hand-edited committed list fails here before the driver sees it."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    import rotate_gate

    names = [q.name for q in registry()]
    # the tool's own invariants (raises AssertionError on violation)
    rotation = rotate_gate.compute_rotation()
    assert sorted(rotation) == sorted(names)

    # the committed list must satisfy the same window constraints
    window = set(_GATE_PRIORITY[: rotate_gate.WINDOW])
    assert (sum(1 for n in window if n.startswith("ref_"))
            >= rotate_gate.MIN_REF_CANARIES), (
        "committed _GATE_PRIORITY window has fewer ref_* parity "
        "canaries than the policy floor")
    for s in rotate_gate.SENTINELS:
        assert s in window, f"sentinel {s} outside the committed window"
    latest = rotate_gate.last_green()
    certifiable = set(oracle_sql())
    never_green = [n for n in names
                   if n in certifiable and n not in latest]
    deferred = [n for n in never_green if n not in window]
    assert not deferred, (
        f"never-driver-green queries outside the committed window: "
        f"{deferred} — regenerate with `python tools/rotate_gate.py "
        f"--emit`")


def test_every_oracle_key_has_query():
    qs, os_ = queries(), oracle_sql()
    assert set(os_) <= set(qs)
    # every registered query carries an oracle (r12: the last rows-only
    # query — agg_approx_count_distinct's raw HLL estimates — was
    # retired as redundant with agg_approx_cd_bounded, which runs the
    # same sketch and hash-checks its accuracy CONTRACT; likewise
    # agg_hll_partial_merge for merge consistency and emb_pca_project
    # for the PCA contract)
    missing = set(qs) - set(os_)
    assert missing == set()


def test_all_queries_run_and_columns_match_oracle_names(spark):
    """Every query builds a plan, returns ≥0 rows at sf0.001, and its
    column names appear verbatim in the oracle SQL (the driver sorts
    columns by name before hashing — a name mismatch breaks the gate)."""
    qs, os_ = queries(), oracle_sql()
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        cols = df.columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns"
        if name in os_:
            sql_text = os_[name].lower()
            for c in cols:
                assert re.search(rf"\b{re.escape(c.lower())}\b", sql_text), (
                    f"{name}: column {c!r} not present in oracle SQL"
                )


def test_no_complex_typed_output_columns(spark):
    """No oracle-checked query may emit an array/map/struct column: the
    driver's pandas canonicalizer sort_values/hashes scalar cells and
    raises `unhashable type: 'list'` on complex ones (the single red row
    in CORRECTNESS_r05 was exactly this). Serialize to a delimited
    string instead (see pipeline_next_event_dataset)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    qs, os_ = queries(), oracle_sql()
    for name, fn in qs.items():
        if name not in os_:
            continue  # rows-only queries never reach the value hasher
        schema = fn(spark, SF_DIR).schema
        for f in schema.fields:
            assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
                f"{name}: column {f.name!r} is {f.dataType.simpleString()} — "
                "driver canonicalizer cannot hash complex types"
            )


def test_catalog_enforces_session_semantics(spark):
    """The engine must survive a session it didn't build: if the caller's
    conf lacks nanosAsLong (events unreadable) or uses a non-UTC zone
    (ntz epoch derivations shift), catalog access restores engine
    semantics."""
    from sql_query_engine_spark.catalog import load_table

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, SF_DIR, "events")
        assert df.count() > 0  # would throw PARQUET_TYPE_ILLEGAL unfixed
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.columns == ["c_custkey"]
    assert df.count() > 0


def test_epoch_us_col_layout_robust(spark, tmp_path):
    """_epoch_us_col (the probe queries' epoch derivation) must produce
    identical µs values whether a timestamp column ships as
    TIMESTAMP(MICROS) (read as ntz) or TIMESTAMP(NANOS) (read as bigint
    nanos under nanosAsLong) — the two generations the driver's parquet
    has shipped. An unconditional cast-through-timestamp would misread
    the nanos layout as seconds."""
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    import sql_query_engine_spark.queries  # noqa: F401
    q = sys.modules["sql_query_engine_spark.queries"]

    vals_us = [1_704_067_200_000_000 + i * 86_400_000_001 for i in range(7)]
    t_us = pa.table({"d": pa.array(vals_us, pa.int64()).cast(pa.timestamp("us"))})
    t_ns = pa.table(
        {"d": pa.array([v * 1000 for v in vals_us], pa.int64()).cast(pa.timestamp("ns"))}
    )
    pq.write_table(t_us, str(tmp_path / "us.parquet"))
    pq.write_table(t_ns, str(tmp_path / "ns.parquet"))

    out = {}
    for name in ("us", "ns"):
        df = spark.read.parquet(str(tmp_path / f"{name}.parquet"))
        out[name] = sorted(
            r[0]
            for r in df.select(q._epoch_us_col(df, "d")).collect()
        )
    assert out["us"] == out["ns"] == sorted(vals_us)


def test_oracle_output_types_driver_safe():
    """No oracle may surface an output type the driver normalizer hasn't
    green-lit. Across r1-r7 the ONLY two driver-red/locally-green rows
    were exactly the only two driver-checked oracles with a raw HUGEINT
    output column (DuckDB's sum(int) result type): our fetchall() yields
    a Python int, but a pandas fetch renders HUGEINT as float64
    ('606.0' vs Spark's '606' — hash mismatch with rows+schema green).
    Reproduced locally on DuckDB 1.0.0 (round 8). DECIMAL outputs were
    never surfaced by a green row either, so they are gated with the
    same rule: CAST integer aggregates to BIGINT, decimal sums to
    DOUBLE. (probe_hugeint_canary — the one sanctioned HUGEINT surface —
    now lives in the probe registry, outside oracle_sql(), so no
    exception is needed here.)"""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from oracle_fragility import scan_output_types

    hits = scan_output_types(SF_DIR)
    assert hits == {}, f"unsafe oracle output types: {hits}"


def test_probe_fingerprints_match_red_queries(spark):
    """The diagnostic probes must stay consistent with the queries they
    instrument: probe_q12_boundary's n_late equals q12's total line
    count, probe_late_margin's n_late equals the stream query's total,
    and the local data exhibits the documented boundary structure (exact
    ties on q12's 60-day boundary; no sub-second margins or arrival
    near-ties for the stream query — which is why no timestamp-read
    drift could ever have flipped it on this data)."""
    qs, ps = queries(), probes()
    b = ps["probe_q12_boundary"](spark, SF_DIR).collect()[0]
    q12 = qs["tpch_q12_late_priority"](spark, SF_DIR).collect()
    assert b["n_late"] == sum(
        r["high_line_count"] + r["low_line_count"] for r in q12
    )
    # (exact boundary ties — n_eq=5 — are an sf0.01 observation; the
    # sf0.001 test slice has none, so only the consistency invariants
    # are asserted here)
    m = ps["probe_late_margin"](spark, SF_DIR).collect()[0]
    late = qs["stream_late_data_accounting"](spark, SF_DIR).collect()
    assert m["n_late"] == sum(r["n_late"] for r in late)
    assert m["n_eq0"] == 0 and m["n_lo_1s"] == 0 and m["n_hi_1s"] == 0
    # canary: both aliases carry the identical value on the Spark side
    c = ps["probe_hugeint_canary"](spark, SF_DIR).collect()[0]
    assert c["sum_bigint"] == c["sum_hugeint"]
