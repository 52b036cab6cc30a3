"""Physical-plan inspection helpers.

The reference validated its optimizer by string-comparing rewritten RA
trees (tests/test_raopt.py there). The Spark-native equivalent is
asserting on *physical plan properties* — did the filter reach the scan,
did the cross become a join, did the dim broadcast. These helpers back
tests/test_plans.py and are part of the public API: at 100 TB, "is this
the plan I think it is" is an operational question, not just a test one.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema",
    "node_count",
    "has_node",
    "join_strategies",
]


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain`` output as a string (PySpark only prints it)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every scan in the plan, flattened."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if not body:
            continue
        # split on commas, re-joining fragments until parens balance
        # (predicates like LessThan(c_custkey,100) contain commas)
        acc = ""
        for part in body.split(","):
            acc = f"{acc},{part}" if acc else part
            if acc.count("(") == acc.count(")"):
                out.append(acc.strip())
                acc = ""
        if acc:
            out.append(acc.strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names the scans actually read (column-pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(f.split(":")[0] for f in m.group(1).split(",") if f)
    return cols


def node_count(df: DataFrame, node: str) -> int:
    """Number of physical nodes with the given name (exact node header)."""
    plan = formatted_plan(df)
    return len(re.findall(rf"\(\d+\) {re.escape(node)}\b", plan))


def has_node(df: DataFrame, node: str) -> bool:
    return node_count(df, node) > 0


def join_strategies(df: DataFrame) -> list[str]:
    """All join strategy node names appearing in the plan, in order.

    Matches only the detail-section headers ``(N) NodeName`` so each
    physical node counts once (the tree view repeats the names).
    """
    plan = formatted_plan(df)
    return re.findall(
        r"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
