"""Shared fixtures: one SparkSession + the pizza corpus as temp views.

The pizza corpus is the reference's primary unit-test fixture set,
transcribed row-for-row from the MR-backend test harness
(reference tests/test_ra2mr.py:22-102, also shipped as
/root/reference/data/*.csv). The golden cardinalities in
test_pizza_parity.py come from the same suites (FIXTURES.md §1).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_query_engine_spark import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

PERSON = [
    ("Amy", 16, "female"),
    ("Ben", 21, "male"),
    ("Cal", 33, "male"),
    ("Dan", 13, "male"),
    ("Eli", 45, "male"),
    ("Fay", 21, "female"),
    ("Gus", 24, "male"),
    ("Hil", 30, "female"),
    ("Ian", 18, "male"),
]

EATS = [
    ("Amy", "mushroom"),
    ("Amy", "pepperoni"),
    ("Ben", "cheese"),
    ("Ben", "pepperoni"),
    ("Cal", "supreme"),
    ("Dan", "cheese"),
    ("Dan", "mushroom"),
    ("Dan", "pepperoni"),
    ("Dan", "sausage"),
    ("Dan", "supreme"),
    ("Eli", "cheese"),
    ("Eli", "supreme"),
    ("Fay", "mushroom"),
    ("Gus", "cheese"),
    ("Gus", "mushroom"),
    ("Gus", "supreme"),
    ("Hil", "cheese"),
    ("Hil", "supreme"),
    ("Ian", "pepperoni"),
    ("Ian", "supreme"),
]

FREQUENTS = [
    ("Amy", "Pizza Hut"),
    ("Ben", "Pizza Hut"),
    ("Ben", "Chicago Pizza"),
    ("Cal", "Pizza Hut"),
    ("Cal", "New York Pizza"),
    ("Dan", "Straw Hat"),
    ("Dan", "New York Pizza"),
    ("Eli", "Straw Hat"),
    ("Eli", "Chicago Pizza"),
    ("Fay", "Dominos"),
    ("Fay", "Little Ceasars"),
    ("Gus", "Chicago Pizza"),
    ("Gus", "Pizza Hut"),
    ("Hil", "Dominos"),
    ("Hil", "Straw Hat"),
    ("Hil", "Pizza Hut"),
    ("Ian", "New York Pizza"),
    ("Ian", "Straw Hat"),
    ("Ian", "Dominos"),
]

SERVES = [
    ("Chicago Pizza", "cheese", 7.75),
    ("Chicago Pizza", "supreme", 8.5),
    ("Dominos", "cheese", 9.75),
    ("Dominos", "mushroom", 11.0),
    ("Little Ceasars", "cheese", 7.0),
    ("Little Ceasars", "mushroom", 9.25),
    ("Little Ceasars", "pepperoni", 9.75),
    ("Little Ceasars", "sausage", 9.5),
    ("New York Pizza", "cheese", 7.0),
    ("New York Pizza", "pepperoni", 8.0),
    ("New York Pizza", "supreme", 8.5),
    ("Pizza Hut", "cheese", 9.0),
    ("Pizza Hut", "pepperoni", 12.0),
    ("Pizza Hut", "sausage", 12.0),
    ("Pizza Hut", "supreme", 12.0),
    ("Straw Hat", "cheese", 9.25),
    ("Straw Hat", "pepperoni", 8.0),
    ("Straw Hat", "sausage", 9.17),
]


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def pizza(spark):
    """Register the pizza corpus as typed temp views; returns a dict."""
    dfs = {
        "Person": spark.createDataFrame(PERSON, "name string, age int, gender string"),
        "Eats": spark.createDataFrame(EATS, "name string, pizza string"),
        "Frequents": spark.createDataFrame(FREQUENTS, "name string, pizzeria string"),
        "Serves": spark.createDataFrame(SERVES, "pizzeria string, pizza string, price double"),
    }
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
