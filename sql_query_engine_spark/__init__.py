"""sql_query_engine_spark — a PySpark-native analytics engine.

From-scratch rebuild of the capabilities of ItachiEU/sql-query-engine
(reference surveyed in SURVEY.md) on idiomatic Spark SQL / DataFrame /
Catalyst, extended with the batch-analytics and LLM-data-pipeline operators
the reference lacks (aggregation, windows, set ops, dedup families,
similarity search, text analysis, streaming).

Public surface:

* :func:`get_spark`                — tuned session factory (session.py)
* :func:`register_all`             — schema-registry / catalog (catalog.py)
* :mod:`~.operators.relational`    — reference-parity operator library
* :mod:`~.functions`               — text / dedup / similarity / multimodal
* :mod:`~.streaming`               — windowed & sessionized event operators
* :func:`queries` / :func:`oracle_sql` — the full checked query inventory
"""

from .catalog import TABLES, load_table, register_all
from .engine import Engine
from .queries import oracle_sql, queries, registry
from .ra import run_ra
from .session import get_spark

__all__ = [
    "Engine",
    "TABLES",
    "get_spark",
    "load_table",
    "register_all",
    "queries",
    "oracle_sql",
    "registry",
    "run_ra",
]
