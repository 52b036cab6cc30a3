"""E2E: the module CLI over the pizza fixtures (FIXTURES.md §1 goldens).

Each case shells out ``python -m sql_query_engine_spark`` — a real fresh
process with its own SparkSession, exactly what a reference user migrating
from ``python main.py --mode spark`` would run (reference main.py:7-25).
Kept to two invocations because each one boots a JVM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from conftest import EATS, PERSON, SERVES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pizza_dir(spark, tmp_path_factory):
    """Pizza corpus on disk: parquet for Person/Eats, qualified CSV + dd
    for Serves (the reference's native CSV format, exercised end-to-end)."""
    from sql_query_engine_spark.sources.legacy import write_qualified_csv

    d = tmp_path_factory.mktemp("pizza_cli")
    spark.createDataFrame(
        PERSON, "name string, age int, gender string"
    ).coalesce(1).write.parquet(str(d / "Person.parquet"))
    spark.createDataFrame(EATS, "name string, pizza string").coalesce(
        1
    ).write.parquet(str(d / "Eats.parquet"))
    serves = spark.createDataFrame(
        SERVES, "pizzeria string, pizza string, price double"
    ).coalesce(1)
    write_qualified_csv(serves, str(d / "Serves.csv"), "Serves")
    dd = {
        "Serves": {"pizzeria": "str", "pizza": "str", "price": "double"}
    }
    (d / "dd.json").write_text(json.dumps(dd))
    return d


def run_cli(*args: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-m", "sql_query_engine_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_cli_sql_join_and_csv_dd(pizza_dir):
    # Person ⋈ Eats golden count 20 (reference tests/test_e2e.py:76-79)
    # plus a σ price=9 over the dd-enforced CSV scan (golden 1,
    # tests/test_ra2mr.py:182-185) — both through one CLI process.
    out = run_cli(
        "--data-dir",
        str(pizza_dir),
        "--dd",
        str(pizza_dir / "dd.json"),
        "--limit",
        "30",
        "SELECT p.name, e.pizza FROM Person p JOIN Eats e ON p.name = e.name",
    )
    assert out.strip().endswith("-- 20 rows")
    out2 = run_cli(
        "--data-dir",
        str(pizza_dir),
        "--dd",
        str(pizza_dir / "dd.json"),
        "SELECT pizzeria, pizza FROM Serves WHERE price = 9",
    )
    lines = [ln for ln in out2.strip().splitlines() if ln]
    assert lines[-1] == "-- 1 rows"
    assert any("Pizza Hut\tcheese" == ln for ln in lines)


def test_cli_ra_select(pizza_dir):
    # RA text entry point: σ gender='female' Person — golden 3
    # (reference tests/test_ra2mr.py:144-147).
    out = run_cli(
        "--data-dir",
        str(pizza_dir),
        r"\select_{gender = 'female'} Person;",
    )
    assert out.strip().endswith("-- 3 rows")
