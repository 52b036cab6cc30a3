"""Contract sanity for the query registry / driver entry points."""

from __future__ import annotations

import re

from sql_query_engine_spark.queries import oracle_sql, queries, registry
from tests.conftest import SF_DIR


def test_registry_names_unique():
    names = [q.name for q in registry()]
    assert len(names) == len(set(names))


def test_every_oracle_key_has_query():
    qs, os_ = queries(), oracle_sql()
    assert set(os_) <= set(qs)
    # all but the engine-specific approximations carry an oracle:
    # HLL sketches and k-means centroids have no exact cross-engine twin
    missing = set(qs) - set(os_)
    assert missing == {
        "agg_approx_count_distinct",
        "sim_ivf_topk",
        "sim_pq_topk",
        "sim_ivfpq_topk",
        "emb_pca_project",  # eigensolve — numpy-pinned instead
        "text_bpe_encode",  # iterative merge loop — pure-Python-pinned
        "agg_hll_partial_merge",  # DataSketches bytes — property-pinned
    }


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
