"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the engine's full checked inventory,
delegated to :mod:`sql_query_engine_spark.queries` (one entry per
implemented operator from SURVEY.md §2 plus the north-star extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import importlib  # noqa: E402

# the package re-exports a `queries` *function*, which shadows the
# `queries` submodule on attribute lookup — resolve the module explicitly
_queries_mod = importlib.import_module("sql_query_engine_spark.queries")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's headline shape (test_commands.txt:7): customer ⋈
    nation ⋈ region, DISTINCT customer keys — both dims broadcast.
    """
    return _queries_mod.queries()["ref_q2_cnr_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return _queries_mod.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-checkable query."""
    return _queries_mod.oracle_sql()
