"""Module CLI — parity with the reference's command-line surface.

The reference's primary UX is ``python main.py --mode spark --dd_path
dd.json "<sql>"`` (reference main.py:7-25): pick a backend, optionally hand
it a data-dictionary JSON, give it a query string. Here the backend is
always Spark, so the switch collapses to:

    python -m sql_query_engine_spark --data-dir /root/testdata/sf0.01 \
        "SELECT DISTINCT c_name FROM customer WHERE c_custkey = 42"

    python -m sql_query_engine_spark --data-dir ./pizza --dd pizza_set.json \
        "\\select_{gender = 'female'} Person;"

* A query starting with a backslash is RA text (the reference's entry
  point 3, ra.py here); anything else is ANSI SQL over the registered
  catalog.
* ``--data-dir`` may contain ``<table>.parquet`` and/or ``<table>.csv``
  (qualified-header CSV, the reference's native format); every table found
  is registered as a temp view under its file stem.
* ``--dd`` is a reference-style data dictionary ``{relation: {attr:
  type}}`` (tpc-h.json:1-10 shape there); when present, CSV scans enforce
  it as the schema instead of inferring.
"""

from __future__ import annotations

import argparse
import sys

from . import catalog as _catalog
from . import ra as _ra
from .session import get_spark
from .sources.legacy import load_dd


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m sql_query_engine_spark",
        description="Spark-native SQL/RA query engine (reference main.py parity)",
    )
    p.add_argument(
        "--data-dir",
        required=True,
        help="directory of <table>.parquet / <table>.csv files to register",
    )
    p.add_argument(
        "--dd",
        default="",
        help="optional data-dictionary JSON ({relation: {attr: type}}) "
        "enforced on CSV scans (reference --dd_path)",
    )
    p.add_argument(
        "--log-level",
        choices=["INFO", "DEBUG", "WARN", "ERROR"],
        default="ERROR",
        help="Spark log level (reference --log_level)",
    )
    p.add_argument(
        "--limit",
        type=int,
        default=20,
        help="max rows to print (the full count is always reported)",
    )
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of rows",
    )
    p.add_argument("query", help="SQL string, or RA text starting with a backslash")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    dd = load_dd(args.dd) if args.dd else None
    spark = get_spark("sql-query-engine-spark-cli")
    spark.sparkContext.setLogLevel(args.log_level)
    _catalog.register_dir(spark, args.data_dir, dd)

    query = args.query.strip()
    if query.startswith("\\"):
        df = _ra.run_ra(spark, query)
    else:
        df = spark.sql(query)

    if args.explain:
        from .plans.inspect import formatted_plan

        print(formatted_plan(df))
        return 0

    rows = df.limit(args.limit).collect()
    header = df.columns
    print("\t".join(header))
    for r in rows:
        print("\t".join("NULL" if v is None else str(v) for v in r))
    total = df.count()
    if total > len(rows):
        print(f"... ({total - len(rows)} more)")
    print(f"-- {total} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
