r"""RA-text front end: reference entry-point-3 parity on the pizza corpus.

The RA strings and expected cardinalities mirror the reference's RA-driven
tests (tests/test_ra2mr.py there drives task_factory from parsed RA; same
golden counts as FIXTURES.md §1)."""

from __future__ import annotations

import pytest

from sql_query_engine_spark.ra import run_ra


CASES = [
    (r"Person;", 9),
    (r"\select_{gender='female'} Person;", 3),
    (r"\select_{age=16 and gender='female'} Person;", 1),
    (r"\select_{price=9} Serves;", 1),
    (r"\project_{name} Person;", 9),
    (r"\project_{gender} Person;", 2),
    (r"Person \cross Eats;", 180),
    (r"\select_{Person.name = Eats.name}(Person \cross Eats);", 20),
    (
        r"\project_{Person.name, Eats.pizza}"
        r"(\select_{Person.name = Eats.name}(Person \cross Eats));",
        20,
    ),
    (r"Person \join_{Person.name = Eats.name} Eats;", 20),
    (
        r"(Person \join_{Person.name = Eats.name} Eats)"
        r" \join_{Person.name = Frequents.name} Frequents;",
        42,
    ),
    (
        r"\rename_{A: *} Eats \join_{A.pizza = B.pizza} \rename_{B: *} Eats;",
        94,
    ),
    (
        r"\rename_{A: *} Person"
        r" \join_{A.gender = B.gender and A.age = B.age} \rename_{B: *} Person;",
        9,
    ),
    (r"Person \join_{Person.name = Serves.pizzeria} Serves;", 0),
    # attr-list rename (reference ra2mr/ra2mr.py:274-276): the count-94
    # self-join expressed through positional attribute renames
    (
        r"\rename_{A: aname, apizza} Eats"
        r" \join_{apizza = bpizza} \rename_{B: bname, bpizza} Eats;",
        94,
    ),
    # theta comparisons — correct semantics (reference J5 was broken)
    (r"\select_{price < 8} Serves;", 3),
    (r"\select_{price >= 12} Serves;", 3),
    (r"Serves \join_{Serves.price < 7.5} Serves;", 0),  # self-join needs renames
]


@pytest.mark.parametrize("ra_text,expected", CASES[:-1])
def test_ra_golden_counts(spark, pizza, ra_text, expected):
    assert run_ra(spark, ra_text).count() == expected


def test_ra_attr_rename(spark, pizza):
    # attrs-only form: \rename_{*: ...} keeps the relation, renames columns
    df = run_ra(spark, r"\rename_{*: who, pie} Eats;")
    assert df.columns == ["who", "pie"]
    assert df.count() == 20
    # arity mismatch is a parse-time error
    with pytest.raises(ValueError):
        run_ra(spark, r"\rename_{A: onlyone} Eats;")


def test_ra_theta_join_filters(spark, pizza):
    df = run_ra(
        spark,
        r"\rename_{A: *} Serves \join_{A.price < B.price} \rename_{B: *} Serves;",
    )
    prices = [r.price for r in pizza["Serves"].collect()]
    assert df.count() == sum(1 for x in prices for y in prices if x < y)


def test_ra_syntax_errors(spark, pizza):
    for bad in [r"\select_{} Person;", r"\badop_{x} Person;", r"Person \cross;", r"(Person;"]:
        with pytest.raises(ValueError):
            run_ra(spark, bad).count()


def test_ra_unknown_relation(spark, pizza):
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        run_ra(spark, r"Nonexistent;").count()
