"""Schema registry / catalog — the Spark-native replacement for the
reference's external "data dictionary" JSON.

The reference ships table schemas out-of-band (``--dd_path``; pizza default
at ra2spark/ra2spark.py:122-125, TPC-H dd at tpc-h.json:1-10) and uses them
*only* for optimizer attribute-provenance — execution never enforces types
(SURVEY.md §1.2). Here the catalog is strict: every table is registered as a
temp view with the schema the parquet files actually carry, so Catalyst's
analyzer owns name resolution and typing end-to-end.

Design notes for scale:

* Registration is by *path*, not by materialized data — ``spark.read
  .parquet`` is lazy; partition discovery / predicate pushdown / column
  pruning all happen at the scan.
* ``events`` carries TIMESTAMP(NANOS) which PySpark reads as ``bigint``
  under ``spark.sql.legacy.parquet.nanosAsLong`` (see session.py). The
  catalog keeps the raw ``ts`` nanos column (cheap, exact, great for range
  pruning) and derives ``ts_utc TIMESTAMP`` from it for windowing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TABLES", "load_table", "register_all", "register_dir", "table_path"]

# All driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables a planner should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_semantics(spark: SparkSession) -> None:
    """Engine-owned session semantics, enforced at every catalog access.

    The engine may be handed a session it didn't build (the round driver
    constructs its own). Two settings are load-bearing and runtime-settable:

    * ``nanosAsLong`` — without it, reading events.parquet
      (TIMESTAMP(NANOS)) throws PARQUET_TYPE_ILLEGAL outright;
    * UTC session timezone — ntz→timestamp casts (e.g. the as-of join's
      epoch derivation) follow the session zone; UTC keeps them equal to
      the oracle's naive-as-UTC epoch on any host.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:  # pragma: no cover - conf locked down: keep going
        pass


# (sf_dir, name) → inferred StructType. ``spark.read.parquet`` runs a
# footer-reading schema-inference job on EVERY invocation (it is not
# cached per path); the registry builds hundreds of scans per gate run,
# so caching the schema and passing it back via ``.schema(...)`` removes
# one Spark job per table reference and makes query CONSTRUCTION
# genuinely job-free (pinned by test_plans.py::test_query_construction_is_lazy).
_SCHEMA_CACHE: dict[tuple[str, str], "object"] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one table; normalizes the events timestamp.

    ``events.ts`` is bigint *nanoseconds* under the legacy flag; we expose
    both the raw nanos (exact arithmetic, used by the window bucketers so
    Spark and the DuckDB oracle agree bit-for-bit) and a derived
    ``ts_utc`` timestamp for Structured-Streaming-style operators.
    """
    _ensure_session_semantics(spark)
    key = (sf_dir, name)
    cached = _SCHEMA_CACHE.get(key)
    if cached is None:
        df = spark.read.parquet(table_path(sf_dir, name))
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(cached).parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts_utc", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    return df


def register_dir(
    spark: SparkSession,
    data_dir: str,
    dd: dict[str, dict[str, str]] | None = None,
) -> dict[str, DataFrame]:
    """Register every ``<name>.parquet`` / ``<name>.csv`` under a directory.

    The discovery-based twin of :func:`register_all` for arbitrary corpora
    (e.g. the reference's pizza CSVs) — the CLI entry point uses this so a
    reference user can point ``--data-dir`` at any layout, with an optional
    reference-style data dictionary (``{relation: {attr: type}}``) enforcing
    CSV scan schemas exactly the way ``--dd_path`` did there.
    """
    from .sources.legacy import read_qualified_csv

    _ensure_session_semantics(spark)
    out: dict[str, DataFrame] = {}
    for entry in sorted(os.listdir(data_dir)):
        path = os.path.join(data_dir, entry)
        if entry.endswith(".parquet"):
            name = entry[: -len(".parquet")]
            df = load_table(spark, data_dir, name)
        elif entry.endswith(".csv"):
            name = entry[: -len(".csv")]
            df = read_qualified_csv(
                spark, path, name, (dd or {}).get(name)
            )
        else:
            continue
        df.createOrReplaceTempView(name)
        out[name] = df
    if not out:
        raise FileNotFoundError(f"no .parquet/.csv tables under {data_dir}")
    return out


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view; returns name → DataFrame.

    This is the dd-equivalent entry point: after this, both the DataFrame
    API and ``spark.sql`` see the full star schema.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
