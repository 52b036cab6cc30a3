"""Golden-cardinality parity with the reference test suites.

Every test re-expresses one reference test query on our operator library
and asserts the reference's expected count (citations per test; summary
table in FIXTURES.md §1). These encode DISTINCT semantics, join-order
invariance, alias scoping, and multi-key joins.

The queries run twice each — once through the DataFrame operator library,
once through spark.sql on the registered views — because the engine's two
entry points (SURVEY.md §3) must agree.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_query_engine_spark.operators import relational as R


def test_filter_female(spark, pizza):
    # reference tests/test_ra2mr.py:144-147
    assert R.filter_rows(pizza["Person"], F.col("gender") == "female").count() == 3
    assert spark.sql("SELECT * FROM Person WHERE gender = 'female'").count() == 3


def test_filter_age_21(spark, pizza):
    # reference tests/test_ra2mr.py:177-180
    assert R.filter_rows(pizza["Person"], F.col("age") == 21).count() == 2


def test_filter_price_9(spark, pizza):
    # reference tests/test_ra2mr.py:182-185 — typed comparison: 9 matches
    # only the 9.0 row (the reference relied on Python int/float equality)
    assert R.filter_rows(pizza["Serves"], F.col("price") == 9).count() == 1


def test_project_distinct_gender(spark, pizza):
    # reference tests/test_ra2mr.py:210-213
    assert R.project_distinct(pizza["Person"], ["gender"]).count() == 2


def test_select_distinct_star(spark, pizza):
    # reference tests/test_e2e.py:50-53
    assert pizza["Person"].distinct().count() == 9


def test_filter_conjunction_age_gender(spark, pizza):
    # reference tests/test_e2e.py:60-63
    df = R.filter_rows(
        pizza["Person"], (F.col("gender") == "female") & (F.col("age") == 16)
    )
    assert df.count() == 1


def test_person_join_eats(spark, pizza):
    # reference tests/test_e2e.py:76-79 — 20 rows
    j = R.equi_join(pizza["Person"], pizza["Eats"].withColumnRenamed("name", "e_name"),
                    [("name", "e_name")])
    assert j.count() == 20


def test_project_join_distinct(spark, pizza):
    # reference tests/test_ra2mr.py:215-218 — π(name, pizza) distinct = 20
    j = R.equi_join(
        pizza["Person"], pizza["Eats"].withColumnRenamed("name", "e_name"),
        [("name", "e_name")],
    )
    assert R.project_distinct(j, ["name", "pizza"]).count() == 20


def test_filtered_join(spark, pizza):
    # reference tests/test_ra2mr.py:220-231 — σ female ⋈ Eats = 5
    females = R.filter_rows(pizza["Person"], F.col("gender") == "female")
    j = R.equi_join(females, pizza["Eats"].withColumnRenamed("name", "e_name"),
                    [("name", "e_name")])
    assert j.count() == 5


def test_three_way_join_order_invariance(spark, pizza):
    # reference tests/test_ra2mr.py:238-251 — Person⋈Eats⋈Frequents = 42 both orders
    p = pizza["Person"]
    e = pizza["Eats"].withColumnRenamed("name", "e_name")
    f = pizza["Frequents"].withColumnRenamed("name", "f_name")
    j1 = R.equi_join(R.equi_join(p, e, [("name", "e_name")]), f, [("name", "f_name")])
    j2 = R.equi_join(R.equi_join(f, e, [("f_name", "e_name")]), p, [("f_name", "name")])
    assert j1.count() == 42
    assert j2.count() == 42


def test_join_with_const_filter_price8(spark, pizza):
    # reference tests/test_ra2mr.py:253-257 — ⋈ σ price=8(Serves) on pizza = 8
    e = pizza["Eats"]
    s = R.filter_rows(pizza["Serves"], F.col("price") == 8).withColumnRenamed(
        "pizza", "s_pizza"
    )
    p = pizza["Person"].withColumnRenamed("name", "p_name")
    j = R.equi_join(
        R.equi_join(p, e, [("p_name", "name")]), s, [("pizza", "s_pizza")]
    )
    assert j.count() == 8


def test_join_with_const_filter_dominos(spark, pizza):
    # reference tests/test_ra2mr.py:259-263 — σ pizzeria='Dominos' = 9
    e = pizza["Eats"]
    s = R.filter_rows(pizza["Serves"], F.col("pizzeria") == "Dominos").withColumnRenamed(
        "pizza", "s_pizza"
    )
    p = pizza["Person"].withColumnRenamed("name", "p_name")
    j = R.equi_join(
        R.equi_join(p, e, [("p_name", "name")]), s, [("pizza", "s_pizza")]
    )
    assert j.count() == 9


def test_self_join_rename(spark, pizza):
    # reference tests/test_ra2mr.py:265-268 — ρA(Eats) ⋈ ρB(Eats) on pizza = 94
    a = R.rename(pizza["Eats"], "A")
    b = R.rename(pizza["Eats"], "B")
    j = R.theta_join(a, b, F.col("A.pizza") == F.col("B.pizza"))
    assert j.count() == 94


def test_multikey_self_join(spark, pizza):
    # reference tests/test_ra2mr.py:270-273 — Person self-join on
    # (gender, age) composite key = 9 (only the Ben/Fay age-21 pair is
    # same-age but they differ in gender, so each person matches itself
    # except Ben=Fay... reference count is 9)
    a = R.rename(pizza["Person"], "A")
    b = R.rename(pizza["Person"], "B")
    j = R.theta_join(
        a,
        b,
        (F.col("A.gender") == F.col("B.gender")) & (F.col("A.age") == F.col("B.age")),
    )
    assert j.count() == 9


def test_empty_join(spark, pizza):
    # reference tests/test_ra2mr.py:233-236 — Person ⋈ Serves on
    # name=pizzeria is empty
    j = R.theta_join(
        pizza["Person"], pizza["Serves"], F.col("name") == F.col("pizzeria")
    )
    assert j.count() == 0


def test_mushroom_lovers(spark, pizza):
    # reference tests/test_e2e.py:93-98 — DISTINCT (name, pizzeria) of the
    # 3-way join with pizza='mushroom' = 8
    df = spark.sql(
        """SELECT DISTINCT Person.name, Serves.pizzeria
           FROM Person, Eats, Serves
           WHERE Person.name = Eats.name AND Eats.pizza = Serves.pizza
             AND Eats.pizza = 'mushroom'"""
    )
    assert df.count() == 8


def test_three_way_join_two_filters(spark, pizza):
    # reference tests/test_e2e.py:101-106 — age=16 + Little Ceasars = 2
    df = spark.sql(
        """SELECT DISTINCT * FROM Person, Eats, Serves
           WHERE Person.name = Eats.name AND Eats.pizza = Serves.pizza
             AND Person.age = 16 AND Serves.pizzeria = 'Little Ceasars'"""
    )
    assert df.count() == 2


def test_theta_join_is_not_cross(spark, pizza):
    """Intentional deviation from reference J5 (SURVEY.md §2.2): a
    non-equi condition must actually filter. The reference's Spark backend
    silently returned the full cross product (ra2spark/ra2spark.py:72-77);
    ours returns only qualifying pairs."""
    a = R.rename(pizza["Serves"], "A")
    b = R.rename(pizza["Serves"], "B")
    j = R.theta_join(a, b, F.col("A.price") < F.col("B.price"))
    n = j.count()
    assert 0 < n < 18 * 18  # strictly fewer than the cross product
    # exact: count pairs with a.price < b.price
    prices = [r.price for r in pizza["Serves"].collect()]
    expected = sum(1 for x in prices for y in prices if x < y)
    assert n == expected
