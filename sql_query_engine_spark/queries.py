"""Query registry: every implemented operator as a (Spark builder, DuckDB
oracle SQL) pair.

This is the engine's public inventory, mirroring SURVEY.md §2:

* ``ref_*``     — reference-parity operators (the reference's own surface,
                  ra2spark/ra2spark.py:48-104, test_commands.txt:1-11)
* ``agg_*``, ``topk_*``, ``setop_*``, ``join_*``, ``scalar_*``, ``window_*``
                — batch capability extensions (SURVEY.md §2.3 — everything
                  the reference lacks that Spark provides built-in)
* ``dedup_*``, ``sim_*``, ``text_*``, ``mm_*``, ``stream_*``
                — LLM-data-pipeline extensions (BASELINE.json north star)

Determinism contract with the oracle (the driver hash-compares values):

* Sums over doubles always go through DECIMAL (exact, order-independent
  under parallel aggregation) and surface as double.
* Every approximate operator (minhash/simhash/LSH) uses engine-neutral
  md5-based modular arithmetic with constants shared between the Spark
  expression and the oracle SQL (functions/hashing.py).
* Dot products are fixed-order left folds — bit-identical across engines.
* Timestamps never appear raw in outputs: date strings or int64 epoch-ns.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table, register_all
from .functions import dedup, hashing, multimodal, similarity, text
from .functions.pq import ivfpq_pinned_topk_oracle as _ivfpq_pinned_oracle
from .functions.pq import pq_pinned_topk_oracle as _pq_pinned_oracle

_PQ_PINNED_ORACLE = _pq_pinned_oracle()
_IVFPQ_PINNED_ORACLE = _ivfpq_pinned_oracle()
from .operators import relational as R
from .session import local_df as _local_df
from .streaming import events as EV

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Q:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


_REGISTRY: list[Q] = []

# Diagnostic probes (round-8 driver-environment experiment) live in a
# separate registry: they are NOT operator queries and are NOT exported
# through queries()/oracle_sql() — the driver never sees them. They are
# kept runnable because (a) tools/fetch_path_audit.py replays the
# driver's pandas fetch model over them every gate run (the canary's
# check lives on locally), and (b) tests pin their consistency with the
# two restated sentinel queries. Retired from the public registry per
# VERDICT r8 "Next round #1".
_PROBE_REGISTRY: list[Q] = []


def _q(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY.append(Q(name, fn, oracle, doc))
        return fn

    return deco


def _probe(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: SparkQuery) -> SparkQuery:
        _PROBE_REGISTRY.append(Q(name, fn, oracle, doc))
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =========================================================================
# Reference parity (SURVEY.md §2.2; test_commands.txt:1-11)
# =========================================================================

@_q(
    "ref_q1_point_select",
    "SELECT DISTINCT c_name, c_mktsegment FROM customer WHERE c_custkey = 42",
    "test_commands.txt:2 — point lookup; pushed filter reaches the scan",
)
def ref_q1_point_select(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return R.project_distinct(
        R.filter_rows(c, F.col("c_custkey") == 42), ["c_name", "c_mktsegment"]
    )


@_q(
    "ref_q2_cnr_join",
    """SELECT DISTINCT c_custkey FROM customer, nation, region
       WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey""",
    "test_commands.txt:7 — 3-way dim join; both dims broadcast",
)
def ref_q2_cnr_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    joined = R.equi_join(
        R.equi_join(c, n, [("c_nationkey", "n_nationkey")]),
        r,
        [("n_regionkey", "r_regionkey")],
    )
    return R.project_distinct(joined, ["c_custkey"])


_Q3_ORACLE = """
SELECT DISTINCT c_custkey, c_name, c_mktsegment, o_orderkey, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       l_linenumber, l_quantity, l_extendedprice
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND l_returnflag = 'R' AND c_mktsegment = 'HOUSEHOLD'
"""


def _q3_select(joined: DataFrame) -> DataFrame:
    return joined.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    ).distinct()


@_q(
    "ref_q3_col_join_filters",
    _Q3_ORACLE,
    "test_commands.txt:9 — fact-fact join + 2 constant filters",
)
def ref_q3_col_join_filters(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "HOUSEHOLD")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = R.equi_join(
        R.equi_join(c, o, [("c_custkey", "o_custkey")]),
        li,
        [("o_orderkey", "l_orderkey")],
    )
    return _q3_select(joined)


@_q(
    "ref_q4_join_order_reversed",
    _Q3_ORACLE,
    "test_commands.txt:11 — same result with reversed join order "
    "(join-order invariance, cf. tests/test_ra2mr.py:238-251)",
)
def ref_q4_join_order_reversed(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "HOUSEHOLD")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = R.equi_join(
        R.equi_join(li, o, [("l_orderkey", "o_orderkey")]),
        c,
        [("o_custkey", "c_custkey")],
    )
    return _q3_select(joined)


@_q(
    "ref_filter_conjunction",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
       FROM lineitem
       WHERE l_quantity > 30 AND l_discount < 0.05 AND l_returnflag = 'N'""",
    "reference F1/F3 predicate language (conjunctions of comparisons) — "
    "extended past EQ-only (sql2ra/functionality.py:76 coerces all ops to EQ)",
)
def ref_filter_conjunction(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return R.project(
        R.filter_rows(
            li,
            (F.col("l_quantity") > 30)
            & (F.col("l_discount") < 0.05)
            & (F.col("l_returnflag") == "N"),
        ),
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"],
    )


@_q(
    "ref_filter_range_in_like",
    """SELECT p_partkey, p_name, p_brand, p_size FROM part
       WHERE p_size BETWEEN 10 AND 20 AND p_type IN ('PROMO', 'ECONOMY')
         AND p_name LIKE '%bolt%'""",
    "BETWEEN / IN / LIKE — full predicate surface (absent in reference)",
)
def ref_filter_range_in_like(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return R.project(
        R.filter_rows(
            p,
            F.col("p_size").between(10, 20)
            & F.col("p_type").isin("PROMO", "ECONOMY")
            & F.col("p_name").like("%bolt%"),
        ),
        ["p_partkey", "p_name", "p_brand", "p_size"],
    )


@_q(
    "ref_filter_or_not",
    """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
       WHERE (o_orderstatus = 'F' OR o_orderpriority = '1-URGENT')
         AND NOT o_orderstatus = 'P'""",
    "OR / NOT predicate surface — the reference's SQL front end cannot "
    "express either (WHERE handles only AND-joined comparisons, "
    "sql2ra/functionality.py:72-78)",
)
def ref_filter_or_not(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return R.project(
        R.filter_rows(
            o,
            ((F.col("o_orderstatus") == "F") | (F.col("o_orderpriority") == "1-URGENT"))
            & ~(F.col("o_orderstatus") == "P"),
        ),
        ["o_orderkey", "o_orderstatus", "o_orderpriority"],
    )


@_q(
    "ref_project_distinct",
    "SELECT DISTINCT c_mktsegment FROM customer",
    "reference P1 — π + dedup (ra2spark/ra2spark.py:79-93)",
)
def ref_project_distinct(spark, sf_dir):
    return R.project_distinct(_t(spark, sf_dir, "customer"), ["c_mktsegment"])


@_q(
    "ref_rename_selfjoin",
    """SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b, a.s_nationkey AS nationkey
       FROM supplier a JOIN supplier b
         ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey""",
    "reference R1 rename/self-join pattern (tests/test_ra2mr.py:265-268)",
)
def ref_rename_selfjoin(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    a, b = R.rename(s, "a"), R.rename(s, "b")
    return R.theta_join(
        a,
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_suppkey").alias("supp_a"),
        F.col("b.s_suppkey").alias("supp_b"),
        F.col("a.s_nationkey").alias("nationkey"),
    )


@_q(
    "ref_cross_product",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "reference J4 — explicit cartesian (sql2ra/functionality.py:100-102); "
    "the MR backend rejects this outright (ra2mr/ra2mr.py:127-129)",
)
def ref_cross_product(spark, sf_dir):
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return R.project(R.cross_product(r, n), ["r_name", "n_name"])


@_q(
    "ref_theta_join",
    """SELECT c_custkey, s_suppkey FROM customer c JOIN supplier s
       ON c.c_nationkey = s.s_nationkey AND c.c_acctbal < s.s_acctbal""",
    "J5 done right: equi part keeps the hash join, theta residual filters — "
    "the reference silently cross-products (spark) or returns empty (MR)",
)
def ref_theta_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").alias("c")
    s = _t(spark, sf_dir, "supplier").alias("s")
    return R.theta_join(
        c,
        s,
        (F.col("c.c_nationkey") == F.col("s.s_nationkey"))
        & (F.col("c.c_acctbal") < F.col("s.s_acctbal")),
    ).select("c_custkey", "s_suppkey")


@_q(
    "ref_theta_join_pure",
    """SELECT n_nationkey, r_regionkey FROM nation JOIN region
       ON n_nationkey < r_regionkey""",
    "pure non-equi join → BroadcastNestedLoopJoin (small side broadcast)",
)
def ref_theta_join_pure(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return R.theta_join(n, r, F.col("n_nationkey") < F.col("r_regionkey")).select(
        "n_nationkey", "r_regionkey"
    )


@_q(
    "ref_multikey_join",
    """SELECT a.l_partkey AS partkey, a.l_suppkey AS suppkey, count(*) AS n_pairs
       FROM lineitem a JOIN lineitem b
         ON a.l_partkey = b.l_partkey AND a.l_suppkey = b.l_suppkey
        AND (a.l_orderkey < b.l_orderkey
             OR (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber))
       GROUP BY 1, 2""",
    "reference J3 — composite-key equi-join (ra2spark/ra2spark.py:74-75) "
    "with a theta residual; fact-fact self-join shuffles on the key pair",
)
def ref_multikey_join(spark, sf_dir):
    # explicit equi-key repartition: the self-join's pair expansion and
    # per-partition hash build are per-ROW compute that AQE's byte-based
    # coalescing (advisory 16m, session.py) would serialize onto 1-2
    # partitions (measured +0.34 s at sf0.1); the explicit count pins it
    par = spark.sparkContext.defaultParallelism
    li = _t(spark, sf_dir, "lineitem").repartition(
        par, "l_partkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    pair_lt = (F.col("a.l_orderkey") < F.col("b.l_orderkey")) | (
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
    )
    return (
        a.join(
            # deliberate strategy (guide §3.1): a fact-table SELF-join can
            # never broadcast at scale; shuffled-hash co-partitions both
            # sides on the equi-keys with no sort and no driver build
            # (measured 1.1-1.5 s broadcast -> 0.65 s at sf0.1,
            # row-identical)
            b.hint("shuffle_hash"),
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & pair_lt,
        )
        .groupBy(
            F.col("a.l_partkey").alias("partkey"), F.col("a.l_suppkey").alias("suppkey")
        )
        .agg(F.count("*").alias("n_pairs"))
    )


_NATION_DD = {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"}
_REGION_DD = {"r_regionkey": "int", "r_name": "string"}


def _legacy_fixture_dir(sf_dir: str, leaf: str) -> str:
    """Deterministic per-sf scratch dir for legacy-format round-trips."""
    import os
    import tempfile

    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(tempfile.gettempdir(), "sqes_legacy_fixtures", sf, leaf)


# Bump whenever a fixture's SEMANTICS change without the writer
# modules changing (e.g. different build PARAMETERS in this file —
# the sentinel also keys on a content hash of the writer modules, so
# any edit to sources/warc.py or sources/avro.py forces a rebuild
# automatically; the version string covers what that hash cannot see).
# r13a = revisit/segment/mislabel writer options added; r13b =
# segmented chains CDX-indexed as one extent; r13c = deterministic
# shard layout (hash-partition by doc_id + within-shard sort), making
# the digest assert environment-proof; r13d = east-asian rotation
# widened to %6 (big5 + gb2312).
_FIXTURE_VERSION = "r13d"

_WRITER_FINGERPRINT: list[str] = []  # lazily-computed singleton


def _writer_fingerprint() -> str:
    """sha256 over the SOURCE BYTES of the fixture-writer modules
    (sources/warc.py, sources/avro.py). Folded into every fixture
    sentinel: before r14, a writer edit under an un-bumped
    ``_FIXTURE_VERSION`` was UNDETECTABLE on the reuse path — the
    sentinel's digests were computed from the old writer's bytes, so
    recomputing them over the old files still matched and the sweep
    silently certified stale fixtures (the drift raise was unreachable
    for that failure mode; ADVICE r13). A code-only edit that doesn't
    change output bytes costs one spurious rebuild — cheap and safe."""
    if not _WRITER_FINGERPRINT:
        import hashlib
        import os

        from . import sources

        h = hashlib.sha256()
        base = os.path.dirname(os.path.abspath(sources.__file__))
        for mod in ("warc.py", "avro.py"):
            with open(os.path.join(base, mod), "rb") as f:
                h.update(f.read())
        _WRITER_FINGERPRINT.append(h.hexdigest()[:16])
    return _WRITER_FINGERPRINT[0]


def _cached_fixture(out_dir: str, build) -> None:
    """Build a deterministic on-disk fixture ONCE per (dir, version);
    subsequent runs re-digest the files and assert byte-identity
    instead of rebuilding.

    The oracle sweep runs every registered query, and the expensive
    warc fixtures (per-record HTTP build + gzip) were rebuilt on every
    sweep — pure repeated work, since the writers are deterministic by
    design. Caching keys on a sentinel file recording
    ``_FIXTURE_VERSION`` plus the sha256 of every file; on reuse the
    digests are RECOMPUTED and compared, so the determinism claim is
    asserted on every sweep, not assumed (and the writers make it
    hold BY CONSTRUCTION: shards are hash-partitioned on doc_id and
    sorted within, a pure function of the data, independent of the
    upstream scan's split layout) — drift (a nondeterministic writer
    or external /tmp mutation) raises attributably rather than
    silently certifying stale bytes, and a WRITER EDIT invalidates the
    sentinel automatically because :func:`_writer_fingerprint` (a
    content hash of the writer modules) is part of the reuse key, so
    the "un-bumped version after a writer change" hole ADVICE r13
    flagged cannot occur. ``SQES_FIXTURE_REBUILD=1`` forces a rebuild;
    the writers themselves stay exercised by the unit tests and by
    every cold (first-after-clear) sweep."""
    import hashlib
    import json
    import os

    sentinel = os.path.join(out_dir, "_FIXTURE_OK.json")

    def _digests() -> dict:
        out = {}
        for name in sorted(os.listdir(out_dir)):
            if name == "_FIXTURE_OK.json":
                continue
            p = os.path.join(out_dir, name)
            if os.path.isfile(p):
                h = hashlib.sha256()
                with open(p, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
                out[name] = h.hexdigest()
        return out

    if (os.environ.get("SQES_FIXTURE_REBUILD") != "1"
            and os.path.exists(sentinel)):
        try:
            meta = json.load(open(sentinel))
        except (OSError, ValueError):
            meta = None
        if (meta and meta.get("version") == _FIXTURE_VERSION
                and meta.get("writer_sha") == _writer_fingerprint()):
            got = _digests()
            if got == meta.get("sha256"):
                return
            raise RuntimeError(
                f"cached fixture {out_dir} drifted from its sentinel "
                f"(writer nondeterminism or external mutation — a "
                f"writer EDIT would have missed the writer_sha key and "
                f"rebuilt instead) — clear the dir or set "
                f"SQES_FIXTURE_REBUILD=1")
    build()
    with open(sentinel, "w") as f:
        json.dump({"version": _FIXTURE_VERSION,
                   "writer_sha": _writer_fingerprint(),
                   "sha256": _digests()}, f)


@_q(
    "ref_csv_scan",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
       WHERE n_regionkey <= 2""",
    "reference S1 — qualified-header CSV (utils/tbl_to_csv.py:18, "
    "ra2spark/ra2spark.py:54-66): nation is written in the reference's "
    "wire format and scanned back through the dd-enforced reader; the "
    "oracle states the same filter on the parquet source, so a value-hash "
    "match proves the CSV round-trip is lossless",
)
def ref_csv_scan(spark, sf_dir):
    from .sources import legacy

    out = _legacy_fixture_dir(sf_dir, "nation_csv")
    legacy.write_qualified_csv(_t(spark, sf_dir, "nation"), out, "Nation")
    back = legacy.read_qualified_csv(spark, out, "Nation", _NATION_DD)
    return R.project(
        R.filter_rows(back, F.col("n_regionkey") <= 2),
        ["n_nationkey", "n_name", "n_regionkey"],
    )


@_q(
    "ref_jsonl_scan",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
       WHERE n_regionkey >= 3""",
    "reference S2 — tagged JSON-lines (utils/tbl_to_json.py:8-14, "
    "ra2mr/ra2mr.py:144-152): nation AND region are written as tagged "
    "lines into sibling dirs, then one glob scan reads both and the tag "
    "filter must keep only Nation rows; oracle = the same filter on the "
    "parquet source (lossless round-trip + correct tag routing)",
)
def ref_jsonl_scan(spark, sf_dir):
    from .sources import legacy

    parent = _legacy_fixture_dir(sf_dir, "tagged_jsonl")
    legacy.write_tagged_jsonl(
        _t(spark, sf_dir, "nation"), f"{parent}/nation", "Nation"
    )
    legacy.write_tagged_jsonl(
        _t(spark, sf_dir, "region"), f"{parent}/region", "Region"
    )
    back = legacy.read_tagged_jsonl(spark, f"{parent}/*", "Nation", _NATION_DD)
    return R.project(
        R.filter_rows(back, F.col("n_regionkey") >= 3),
        ["n_nationkey", "n_name", "n_regionkey"],
    )


# =========================================================================
# Aggregations (SURVEY.md §2.3 — absent in reference, Spark built-in)
# =========================================================================

_DEC = "decimal(18,2)"


@_q(
    "agg_pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,
        cast(sum(cast(l_quantity as {_DEC})) as double) AS sum_qty,
        cast(sum(cast(l_extendedprice as {_DEC})) as double) AS sum_base_price,
        cast(sum(cast(l_extendedprice as {_DEC}) * cast(1 - l_discount as {_DEC}))
             as double) AS sum_disc_price,
        cast(sum(cast(l_quantity as {_DEC})) as double) / count(*) AS avg_qty,
        cast(sum(cast(l_discount as {_DEC})) as double) / count(*) AS avg_disc,
        count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    "TPC-H Q1 shape — partial (map-side) aggregation then one shuffle on a "
    "tiny group key; DECIMAL sums for order-independent exactness",
)
def agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(_DEC))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "agg_having",
    """SELECT c_nationkey, count(*) AS n_cust,
              cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_bal
       FROM customer GROUP BY c_nationkey HAVING count(*) > 40""",
    "GROUP BY + HAVING",
)
def agg_having(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("sum_bal"),
        )
        .filter(F.col("n_cust") > 40)
    )


@_q(
    "agg_rollup",
    """SELECT coalesce(r_name, '(all)') AS region_name,
              coalesce(n_name, '(all)') AS nation_name,
              count(*) AS n_cust
       FROM customer, nation, region
       WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
       GROUP BY ROLLUP(r_name, n_name)""",
    "hierarchical ROLLUP over the dim join",
)
def agg_rollup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    joined = c.join(n, c["c_nationkey"] == n["n_nationkey"]).join(
        r, n["n_regionkey"] == r["r_regionkey"]
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"))
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region_name"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation_name"),
            "n_cust",
        )
    )


@_q(
    "agg_cube",
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
              coalesce(l_linestatus, '(all)') AS linestatus,
              count(*) AS n_rows,
              cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
       FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",
    "CUBE over the fact table",
)
def agg_cube(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


@_q(
    "agg_rollup_gid",
    """SELECT coalesce(l_returnflag, '?') AS returnflag,
              coalesce(l_linestatus, '?') AS linestatus,
              cast(grouping(l_returnflag) as int) AS g_flag,
              cast(grouping(l_linestatus) as int) AS g_status,
              count(*) AS n
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "ROLLUP with grouping() indicators — distinguishes subtotal rows "
    "from genuine NULL data (the correct way to consume rollup output)",
)
def agg_rollup_gid(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("?")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("?")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n",
        )
    )


@_q(
    "agg_udaf_median",
    """SELECT c_nationkey, median(c_acctbal) AS med_bal
       FROM customer GROUP BY c_nationkey""",
    "pandas UDAF surface (GROUPED_AGG pandas_udf): per-group median via "
    "NumPy — exact cross-engine because median is selection-based (sort + "
    "pick), not a float reduction; DuckDB median() computes the same "
    "interpolated middle",
)
def agg_udaf_median(spark, sf_dir):
    from .functions.udafs import np_median

    c = _t(spark, sf_dir, "customer")
    # GROUPED_AGG pandas UDFs cannot mix with JVM aggregates in one agg
    return c.groupBy("c_nationkey").agg(np_median("c_acctbal").alias("med_bal"))


@_q(
    "agg_exact_corr",
    """WITH m AS (
    SELECT l_returnflag,
           count(*) AS n,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sx,
           cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sy,
           cast(sum(cast(l_quantity as decimal(18,2))
                    * cast(l_quantity as decimal(18,2))) as double) AS sxx,
           cast(sum(cast(l_extendedprice as decimal(18,2))
                    * cast(l_extendedprice as decimal(18,2))) as double) AS syy,
           cast(sum(cast(l_quantity as decimal(18,2))
                    * cast(l_extendedprice as decimal(18,2))) as double) AS sxy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qty_price
FROM m""",
    "Pearson correlation from EXACT decimal moments — corr() built-ins "
    "use float reductions that drift between engines; the moment "
    "formulation is order-independent and bit-reproducible",
)
def agg_exact_corr(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast(_DEC)
    dy = F.col("l_extendedprice").cast(_DEC)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select("l_returnflag", "n", F.round(corr, 6).alias("corr_qty_price"))


@_q(
    "agg_ols_fit",
    """WITH m AS (
    SELECT l_returnflag,
           count(*) AS n,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sx,
           cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sy,
           cast(sum(cast(l_quantity as decimal(18,2))
                    * cast(l_quantity as decimal(18,2))) as double) AS sxx,
           cast(sum(cast(l_extendedprice as decimal(18,2))
                    * cast(l_extendedprice as decimal(18,2))) as double) AS syy,
           cast(sum(cast(l_quantity as decimal(18,2))
                    * cast(l_extendedprice as decimal(18,2))) as double) AS sxy
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
           AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM m""",
    "ordinary-least-squares fit (price ~ quantity per return flag) from "
    "EXACT decimal moments — the distributed ML-primitive shape: one "
    "map-side-combinable pass computes the five sufficient statistics, "
    "the closed-form solve is per-group scalar arithmetic on exactly "
    "equal inputs, so slope/intercept/r2 are bit-reproducible across "
    "engines (built-in regr_slope/regr_r2 float reductions are not). "
    "At 100 TB this is one partial-agg shuffle on a tiny key; no "
    "iteration, no driver math.",
)
def agg_ols_fit(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast(_DEC)
    dy = F.col("l_extendedprice").cast(_DEC)
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = num / den
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((num * num) / (den * (n * syy - sy * sy)), 6).alias("r2"),
    )


@_q(
    "agg_count_distinct",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
              count(*) AS n_rows
       FROM lineitem GROUP BY l_returnflag""",
    "exact distinct aggregate (expand + two-phase aggregate in Spark)",
)
def agg_count_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"), F.count("*").alias("n_rows")
    )


@_q(
    "agg_percentiles",
    """SELECT c_nationkey,
              quantile_cont(c_acctbal, 0.5) AS med_bal,
              quantile_cont(c_acctbal, 0.9) AS p90_bal,
              min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
       FROM customer GROUP BY c_nationkey""",
    "exact interpolated percentiles (Spark percentile() and DuckDB "
    "quantile_cont use the same linear interpolation — verified "
    "bit-identical); at 100 TB switch to approx_percentile",
)
def agg_percentiles(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.expr("percentile(c_acctbal, 0.5)").alias("med_bal"),
        F.expr("percentile(c_acctbal, 0.9)").alias("p90_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@_q(
    "agg_approx_cd_bounded",
    """SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_bound
FROM lineitem GROUP BY l_returnflag""",
    "the HLL error CONTRACT as a hash-checkable oracle row (r10: "
    "shrinking what rows-only hides): approx_count_distinct's estimate "
    "is engine-specific so its VALUE can never oracle-match, but its "
    "CONTRACT — estimate within a few relative standard deviations of "
    "the exact distinct count — is a deterministic boolean given the "
    "data (HLL++ has no query-time randomness). The Spark side "
    "computes the sketch estimate AND the exact count per group and "
    "emits within_bound = |approx/exact - 1| <= 5 x rsd(0.01); the "
    "oracle pins the exact counts by value and the flag to TRUE. A "
    "sketch regression (wrong hashing, broken merge, bias drift past "
    "5 sigma) flips the flag and hash-breaks the gate. r12: the "
    "rows-only sibling that returned the raw estimates was retired as "
    "redundant — this row runs the same sketch and is the stronger "
    "check, leaving the registry 100% oracle-checkable.",
)
def agg_approx_cd_bounded(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(
                    F.col("approx_parts").cast("double")
                    / F.col("exact_parts").cast("double")
                    - F.lit(1.0)
                )
                <= F.lit(0.05)
            ).alias("within_bound"),
        )
    )


@_q(
    "agg_approx_quantile_bounded",
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       TRUE AS is_group_member, TRUE AS within_rank_bound
FROM lineitem GROUP BY l_returnflag""",
    "the approx-quantile RANK-ERROR contract as a hash-checked oracle "
    "(r11 — the agg_approx_cd_bounded pattern applied to the second "
    "big approximate aggregate a 100 TB report actually swaps in): "
    "percentile_approx(x, p, accuracy) is Greenwald-Khanna — a "
    "combinable, single-pass summary whose published guarantee is a "
    "RANK, not a value: the returned element's rank r satisfies "
    "|r − p·n| ≤ n/accuracy. The value itself is engine-specific (GK "
    "keeps a pruned sample), so it can never oracle-match — but the "
    "guarantee is a deterministic boolean given the data (no "
    "query-time randomness). Spark computes the p50 estimate per "
    "group at accuracy=100, then a second pass (3-row broadcast back "
    "onto lineitem) counts lo = rows strictly below and hi = rows ≤ "
    "the estimate, and pins (1) is_group_member: hi > lo — GK must "
    "return an ACTUAL element of the group, and (2) within_rank_bound:"
    " the occupied rank interval [lo, hi] intersects "
    "[p·n − n/acc, p·n + n/acc]. A summary regression (wrong merge, "
    "off-by-one compression, interpolation sneaking in) flips a flag "
    "and hash-breaks. Group counts are value-pinned alongside.",
)
def agg_approx_quantile_bounded(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    acc = 100
    g = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, acc).alias("med"),
        F.count("*").alias("n"),
    )
    r = (
        li.join(F.broadcast(g), "l_returnflag")
        .groupBy("l_returnflag", "n", "med")
        .agg(
            F.sum((F.col("l_extendedprice") < F.col("med"))
                  .cast("long")).alias("lo"),
            F.sum((F.col("l_extendedprice") <= F.col("med"))
                  .cast("long")).alias("hi"),
        )
    )
    n, lo, hi = F.col("n"), F.col("lo"), F.col("hi")
    slack = n.cast("double") / acc
    target = 0.5 * n.cast("double")
    return r.select(
        "l_returnflag",
        n.alias("n"),
        (hi > lo).alias("is_group_member"),
        ((lo.cast("double") <= target + slack)
         & (hi.cast("double") >= target - slack)).alias("within_rank_bound"),
    )


# =========================================================================
# Sort / limit / top-k
# =========================================================================

@_q(
    "topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "global top-k: Spark plans TakeOrderedAndProject — per-partition heap, "
    "no full sort at any scale",
)
def topk_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@_q(
    "topk_per_group",
    """SELECT * FROM (
         SELECT c_mktsegment, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY c_mktsegment
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM customer JOIN orders ON c_custkey = o_custkey
       ) WHERE rn <= 3""",
    "top-k per group via ranking window; Spark inserts WindowGroupLimit "
    "(partial per-partition top-k before the shuffle)",
)
def topk_per_group(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c["c_custkey"] == o["o_custkey"])
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        j.select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# =========================================================================
# Set operations
# =========================================================================

@_q(
    "setop_union_all",
    """SELECT c_custkey AS id, 'customer' AS src FROM customer
       UNION ALL SELECT s_suppkey AS id, 'supplier' AS src FROM supplier""",
    "bag union — no shuffle, pure concatenation of scans",
)
def setop_union_all(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.lit("customer").alias("src")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.lit("supplier").alias("src")
    )
    return c.unionAll(s)


@_q(
    "setop_intersect",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'HOUSEHOLD'
       INTERSECT SELECT o_custkey FROM orders""",
    "set intersect → planned as left-semi hash join",
)
def setop_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.filter(F.col("c_mktsegment") == "HOUSEHOLD")
        .select("c_custkey")
        .intersect(o.select(F.col("o_custkey").alias("c_custkey")))
    )


@_q(
    "setop_except",
    """SELECT c_custkey FROM customer
       EXCEPT SELECT o_custkey FROM orders""",
    "set difference → left-anti hash join (customers who never ordered)",
)
def setop_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.select("c_custkey").subtract(
        o.select(F.col("o_custkey").alias("c_custkey"))
    )


# =========================================================================
# Outer / semi / anti joins
# =========================================================================

@_q(
    "join_left_outer",
    """SELECT c_custkey, count(o_orderkey) AS n_orders
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey""",
    "left outer + grouped count (zeros preserved)",
)
def join_left_outer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@_q(
    "join_full_outer",
    """SELECT coalesce(n_nationkey, s_nationkey) AS nationkey, n_name, s_suppkey
       FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey""",
    "full outer join",
)
def join_full_outer(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return n.join(s, n["n_nationkey"] == s["s_nationkey"], "full").select(
        F.coalesce("n_nationkey", "s_nationkey").alias("nationkey"),
        "n_name",
        "s_suppkey",
    )


@_q(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "left-semi join (EXISTS) — probe side never widens",
)
def join_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


@_q(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "left-anti join (NOT EXISTS)",
)
def join_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "join_salted_skew",
    """SELECT s_name, count(*) AS n_items,
              cast(sum(cast(l_quantity as decimal(18,6))) as double) AS sum_qty
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY s_name""",
    "skew-resilient salted join as a checked query: the fact side gets a "
    "row-hash salt in [0,8), the dimension replicates 8x, and the join key "
    "becomes (suppkey, salt) — splitting any hot key across 8 partitions. "
    "Values must equal the plain join (the oracle runs one); the salting "
    "mechanics and hot-key spread are property-tested in "
    "test_scale_ops.py. The explicit planner-independent fallback for "
    "power-law keys AQE's skew splitting cannot reach (broadcast-size "
    "dims, non-SMJ plans).",
)
def join_salted_skew(spark, sf_dir):
    from .operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    j = salted_join(
        li, s, [("l_suppkey", "s_suppkey")], n_salt=8, salt_source="l_orderkey"
    )
    return j.groupBy("s_name").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_qty"),
    )


@_q(
    "join_bloom_semijoin",
    """SELECT l_returnflag, count(*) AS n_items,
              cast(sum(cast(l_extendedprice as decimal(18,6))) as double)
                  AS sum_price
       FROM lineitem
       WHERE EXISTS (SELECT 1 FROM part
                     WHERE p_partkey = l_partkey AND p_size <= 3)
       GROUP BY l_returnflag""",
    "sketch-prefiltered semi-join: a Bloom bitmap over the selective "
    "dimension's keys (distributed bit_or aggregate, m/64 longs) probes "
    "the fact scan as a codegen predicate BEFORE the shuffle, then the "
    "exact left-semi join removes false positives — bit-identical to the "
    "plain semi-join the oracle runs, but at 100 TB the shuffle sees "
    "~fpp of the non-matching rows instead of all of them. The explicit "
    "always-on form of Spark's runtime bloomFilter rewrite, whose "
    "multi-GB activation thresholds local scale can't reach "
    "(operators/bloom.py; false-positive/zero-false-negative bounds "
    "property-tested in test_scale_ops.py).",
)
def join_bloom_semijoin(spark, sf_dir):
    from .operators.bloom import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    j = bloom_semi_join(li, p, "l_partkey", "p_partkey")
    return j.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_price"),
    )


# =========================================================================
# Scalar function surface
# =========================================================================

@_q(
    "scalar_string",
    """SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 8) AS name_pfx,
              length(p_name) AS name_len, concat(p_brand, ':', p_type) AS brand_type
       FROM part""",
    "string functions (zero exist in the reference — "
    "ra2spark/ra2spark.py:26-45 is attr/literal/EQ/AND only)",
)
def scalar_string(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 8).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@_q(
    "scalar_math",
    """SELECT l_orderkey, l_linenumber,
              cast(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) as double)
                  / 100 AS disc_price,
              cast(floor(l_quantity) as bigint) AS qty_floor,
              cast(ceil(l_tax * 100) as bigint) AS tax_pct,
              l_partkey % 7 AS pk_mod
       FROM lineitem WHERE l_orderkey % 1000 = 0""",
    "arithmetic / rounding scalars (rounding spelled as floor(x·100+½)/100 — "
    "engines disagree on round()'s half-tie direction for binary doubles)",
)
def scalar_math(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 1000 == 0).select(
        "l_orderkey",
        "l_linenumber",
        (
            F.floor(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100 + 0.5)
            .cast("double")
            / 100
        ).alias("disc_price"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct"),
        (F.col("l_partkey") % 7).alias("pk_mod"),
    )


@_q(
    "scalar_date",
    """SELECT o_orderkey, year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
              day(o_orderdate) AS o_day, strftime(o_orderdate, '%Y-%m') AS o_ym
       FROM orders WHERE year(o_orderdate) = 1997""",
    "date/time extraction scalars",
)
def scalar_date(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.year("o_orderdate") == 1997).select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("o_ym"),
    )


@_q(
    "scalar_conditional",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice > 300000 THEN 'big'
                   WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
              (o_orderstatus IN ('F', 'P')) AS is_done,
              (o_orderpriority LIKE '1-%') AS is_urgent
       FROM orders""",
    "CASE / IN / LIKE expression surface",
)
def scalar_conditional(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.col("o_orderstatus").isin("F", "P").alias("is_done"),
        F.col("o_orderpriority").like("1-%").alias("is_urgent"),
    )


@_q(
    "scalar_json",
    """SELECT event_id, cast(json_extract_string(props, '$.k') as int) AS k
       FROM events WHERE cast(json_extract_string(props, '$.k') as int) > 90""",
    "JSON extraction over the events props column",
)
def scalar_json(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select("event_id", k.alias("k")).filter(k > 90)


@_q(
    "scalar_map_ops",
    """SELECT o_orderkey, 'status' AS k, o_orderstatus AS v FROM orders
       WHERE o_orderkey % 500 = 0
       UNION ALL
       SELECT o_orderkey, 'priority' AS k, o_orderpriority AS v FROM orders
       WHERE o_orderkey % 500 = 0""",
    "MAP column functions: build a map, explode entries back to rows — "
    "the map surface verified through its row image (DuckDB has no "
    "comparable MAP literal; the oracle produces the same rows directly)",
)
def scalar_map_ops(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 500 == 0)
    withmap = o.select(
        "o_orderkey",
        F.create_map(
            F.lit("status"),
            F.col("o_orderstatus"),
            F.lit("priority"),
            F.col("o_orderpriority"),
        ).alias("m"),
    )
    return withmap.select("o_orderkey", F.explode("m").alias("k", "v"))


@_q(
    "scalar_higher_order",
    """SELECT vec_id,
              len(list_filter(embedding, x -> x > 0)) AS n_pos,
              round(list_reduce(list_prepend(cast(0 as double),
                    list_transform(list_filter(embedding, x -> x > 0),
                                   x -> x::DOUBLE)), (a, b) -> a + b), 6)
                  AS sum_pos
       FROM embeddings""",
    "higher-order array functions (filter / transform / aggregate) as a "
    "checked query — fixed-order fold keeps the sum bit-identical",
)
def scalar_higher_order(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr("size(filter(embedding, x -> x > 0))").alias("n_pos"),
        F.round(
            F.expr(
                "aggregate(transform(filter(embedding, x -> x > 0),"
                " x -> cast(x as double)), cast(0 as double), (a, b) -> a + b)"
            ),
            6,
        ).alias("sum_pos"),
    )


# =========================================================================
# Window functions
# =========================================================================

@_q(
    "window_running_sum",
    """SELECT o_custkey, o_orderkey,
              cast(sum(cast(o_totalprice as decimal(18,2)))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   as double) AS run_total,
              row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS order_seq
       FROM orders""",
    "running aggregate + row numbering; DECIMAL keeps the cumulative sum "
    "exact under any execution order",
)
def window_running_sum(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(wr).cast("double").alias("run_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@_q(
    "window_lag_lead",
    """SELECT o_custkey, o_orderkey, o_totalprice,
              lag(o_totalprice) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS prev_price,
              lead(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey) AS next_price
       FROM orders""",
    "lag/lead analytics",
)
def window_lag_lead(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@_q(
    "window_rank_dense",
    """SELECT c_nationkey, c_custkey,
              cast(rank() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) as int) AS bal_rank,
              cast(dense_rank() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) as int)
                  AS bal_dense_rank
       FROM customer""",
    "ranking windows",
)
def window_rank_dense(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


@_q(
    "window_moving_avg",
    """SELECT o_custkey, o_orderkey,
              cast(sum(cast(o_totalprice as decimal(18,2)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) as double)
                  / least(row_number() OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey), 3)
                  AS moving_avg3
       FROM orders""",
    "trailing 3-order moving average per customer — bounded ROWS frame, "
    "exact decimal numerator / integer denominator",
)
def window_moving_avg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w3).cast("double")
            / F.least(F.row_number().over(w), F.lit(3))
        ).alias("moving_avg3"),
    )


@_q(
    "agg_conditional_pivot",
    """SELECT c_nationkey,
              cast(count(*) FILTER (WHERE o_orderstatus = 'F') as bigint) AS n_f,
              cast(count(*) FILTER (WHERE o_orderstatus = 'O') as bigint) AS n_o,
              cast(count(*) FILTER (WHERE o_orderstatus = 'P') as bigint) AS n_p
       FROM customer JOIN orders ON c_custkey = o_custkey
       GROUP BY c_nationkey""",
    "pivot-style conditional aggregation: status counts as columns per "
    "nation (one pass, no PIVOT operator needed)",
)
def agg_conditional_pivot(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c["c_custkey"] == o["o_custkey"])
    return j.groupBy("c_nationkey").agg(
        *[
            F.count_if(F.col("o_orderstatus") == s).alias(f"n_{s.lower()}")
            for s in ("F", "O", "P")
        ]
    )


@_q(
    "text_idf",
    """WITH toks AS (
    SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
           AS tok
    FROM documents
),
df AS (SELECT tok, count(*) AS doc_freq FROM toks GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tok, doc_freq, round(ln(cast(n_docs as double) / doc_freq), 6) AS idf
FROM df, n WHERE doc_freq >= 50""",
    "document-frequency / IDF table over the corpus vocabulary — the "
    "retrieval-weighting primitive (exact integer dfs; ln on identical "
    "doubles)",
)
def text_idf(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # n_docs as a 1-row aggregate crossJoined in (mirroring the oracle's
    # `n` CTE) — the whole query stays ONE lazy plan; an eager
    # docs.count() here would run a Spark job at plan-construction time
    # and embed a literal that can go stale.
    n = docs.agg(F.count("*").alias("n_docs"))
    toks = docs.select(
        F.explode(
            F.expr("array_distinct(regexp_extract_all(lower(text), '[a-z0-9]+', 0))")
        ).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") >= 50)
        .crossJoin(F.broadcast(n))
        .select(
            "tok",
            "doc_freq",
            F.round(
                F.log(F.col("n_docs").cast("double") / F.col("doc_freq")), 6
            ).alias("idf"),
        )
    )



_VARINT_SQL = ("CASE WHEN g < 128 THEN 1 WHEN g < 16384 THEN 2 "
               "WHEN g < 2097152 THEN 3 WHEN g < 268435456 THEN 4 "
               "ELSE 5 END")


@_q(
    "text_postings_delta",
    f"""WITH toks AS (
    SELECT DISTINCT doc_id, g2.tok
    FROM documents,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS g2(tok)),
gaps AS (
    SELECT tok,
           coalesce(doc_id - lag(doc_id) OVER (PARTITION BY tok
                                               ORDER BY doc_id),
                    doc_id + 1) AS g
    FROM toks)
SELECT tok, cast(count(*) as bigint) AS df,
       cast(sum({_VARINT_SQL}) as bigint) AS delta_bytes,
       cast(count(*) * 8 as bigint) AS raw_bytes,
       round(cast(sum({_VARINT_SQL}) as double) / (count(*) * 8), 6)
           AS compression
FROM gaps GROUP BY tok HAVING count(*) >= 20""",
    "delta + varint posting-list compression — the inverted-index "
    "storage primitive every search/retrieval system builds on: each "
    "term's sorted doc_id posting list becomes d-gaps (first gap "
    "doc_id+1, then successive differences) and each gap costs its "
    "LEB128 varint byte length (1 byte under 128, 2 under 16384, ...); "
    "the per-term compressed size against 8-byte raw ids is the "
    "index-sizing statistic. One term-keyed shuffle shared by the lag "
    "window and the aggregate — at 100 TB this is exactly how the "
    "posting lists themselves would be laid out, term-partitioned with "
    "doc-sorted runs. Pure integer arithmetic; hash-exact.",
)
def text_postings_delta(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            )
        ).alias("tok"),
    )
    w = Window.partitionBy("tok").orderBy("doc_id")
    gaps = toks.select(
        "tok",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(w),
            F.col("doc_id") + 1,
        ).alias("g"),
    )
    vb = F.expr(_VARINT_SQL)
    return (
        gaps.groupBy("tok")
        .agg(
            F.count("*").alias("df"),
            F.sum(vb).alias("delta_bytes"),
            (F.count("*") * 8).alias("raw_bytes"),
            F.round(
                F.sum(vb).cast("double") / (F.count("*") * 8), 6
            ).alias("compression"),
        )
        .filter(F.col("df") >= 20)
    )


@_q(
    "window_ntile",
    """SELECT quartile, count(*) AS n,
              cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_bal
       FROM (SELECT cast(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) as int)
                    AS quartile, c_acctbal
             FROM customer)
       GROUP BY quartile""",
    "ntile bucketing + re-aggregation",
)
def window_ntile(spark, sf_dir):
    # Global ntile is inherently a total order (one-task sort) — acceptable
    # here because the OUTPUT is 4 rows and exactness is the contract.
    # Scale alternative at 100 TB: compute the 3 quartile edges with
    # approx_percentile(c_acctbal, array(0.25,0.5,0.75)) (a combinable
    # aggregate, no global sort), then bucket rows by comparing against the
    # broadcast edges — same re-aggregation, fully parallel, approximate
    # only at the bucket boundaries.
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.select(F.ntile(4).over(w).alias("quartile"), "c_acctbal")
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("sum_bal"),
        )
    )


# =========================================================================
# TPC-H-shaped analytics (adapted to the driver schema — the reference's
# cloud benchmark set was TPC-H-flavored, test_commands.txt:1-11)
# =========================================================================

_REVENUE = "sum(cast(l_extendedprice as decimal(18,2)) * cast(1 - l_discount as decimal(18,2)))"


@_q(
    "tpch_q3_shipping_priority",
    f"""SELECT l_orderkey,
        cast({_REVENUE} as double) AS revenue,
        strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority""",
    "TPC-H Q3 shape: segment filter + 3-way join + grouped revenue",
)
def tpch_q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    # r15: aggregate BEFORE the joins (guide §2.3, same argument as
    # tpch_q18: o_orderkey is the orders PK with one customer each, so
    # the per-(l_orderkey) revenue sum over filtered lineitem equals the
    # post-join group sum, exactly — decimal addition is regrouping-
    # exact; the customer/orders filters drop whole orders either way).
    # The joins then carry one row per qualifying order instead of every
    # lineitem row (0.42 -> 0.30 s at sf0.1, row-identical).
    pre = li.groupBy("l_orderkey").agg(
        F.expr(_REVENUE).cast("double").alias("revenue")
    )
    return (
        pre.join(o, pre["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
        )
    )


@_q(
    "tpch_q5_local_supplier_volume",
    f"""SELECT n_name, cast({_REVENUE} as double) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
        GROUP BY n_name""",
    "TPC-H Q5 shape: 6-table join (two broadcast dims, customer-supplier "
    "nation co-location) + per-nation revenue",
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(s, (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.expr(_REVENUE).cast("double").alias("revenue"))
    )


@_q(
    "tpch_q10_returned_items",
    f"""SELECT c_custkey, c_name, cast({_REVENUE} as double) AS revenue, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, n_name""",
    "TPC-H Q10 shape: returned-item revenue per customer",
)
def tpch_q10_returned_items(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.expr(_REVENUE).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@_q(
    "tpch_q6_forecast_revenue",
    """SELECT cast(sum(cast(l_extendedprice as decimal(18,2))
                     * cast(l_discount as decimal(18,2))) as double) AS revenue,
              count(*) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
    "TPC-H Q6 shape: pure scan-side filter + global agg — the query whose "
    "entire cost is predicate pushdown (no join, no shuffle beyond the "
    "single-row combine)",
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@_q(
    "tpch_q4_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
       GROUP BY o_orderpriority""",
    "TPC-H Q4 shape: EXISTS → left-semi join + priority counts (the driver "
    "schema lacks commit/receipt dates; the semi-join predicate is "
    "l_returnflag='R', same plan shape)",
)
def tpch_q4_order_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@_q(
    "tpch_q18_large_volume",
    """SELECT c_custkey, c_name, o_orderkey,
              cast(sum(cast(l_quantity as decimal(18,2))) as double) AS total_qty
       FROM customer, orders, lineitem
       WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
       GROUP BY c_custkey, c_name, o_orderkey
       HAVING sum(cast(l_quantity as decimal(18,2))) > 100""",
    "TPC-H Q18 shape: large-volume orders — grouped HAVING over the "
    "3-way join (the aggregate-then-filter plan; at scale the lineitem "
    "pre-aggregation shuffles once on the join key it already needs)",
)
def tpch_q18_large_volume(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # r15: aggregate BEFORE the joins (guide §2.3). o_orderkey is the
    # orders PK and each order has one customer, so grouping the JOINED
    # rows by (c_custkey, c_name, o_orderkey) sums exactly the same
    # lineitem rows as grouping lineitem alone by l_orderkey; the HAVING
    # filter references only the sum, so it commutes with the joins, and
    # decimal addition is exact under regrouping. The joins then carry
    # only the few large-volume orders instead of every lineitem row —
    # at 100 TB the difference between shuffling the fact table and
    # shuffling the answer (measured 1.1-1.2 s -> 0.75 s at sf0.1,
    # row-identical).
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"))
        .filter(F.col("__q") > 100)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("__q").cast("double").alias("total_qty"),
        )
    )


# The remaining 15 TPC-H shapes (Q2, Q7-Q9, Q11-Q17, Q19-Q22) live in
# tpch.py; registering here keeps the suite contiguous in registry order.
from .tpch import register_tpch  # noqa: E402

register_tpch(_q, _t)


# =========================================================================
# SQL entry point (spark.sql over the registered catalog) — subqueries,
# CTEs, grouping sets: surface the reference's SQL front end never had
# (sql2ra handles only SELECT DISTINCT-FROM-WHERE, SURVEY.md §2.3)
# =========================================================================

# exact, order-independent average (decimal sum → double / count)
_AVG_BAL = (
    "(SELECT cast(sum(cast(c_acctbal as decimal(18,2))) as double) / count(*) "
    "FROM customer)"
)


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_all(spark, sf_dir)
    return spark.sql(query)


@_q(
    "sql_scalar_subquery",
    f"""SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > {_AVG_BAL}""",
    "scalar subquery (exact decimal average — no float-reduction drift)",
)
def sql_scalar_subquery(spark, sf_dir):
    return _sql(
        spark,
        sf_dir,
        f"SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > {_AVG_BAL}",
    )


_CORR_SUBQ = """SELECT p_partkey, p_brand, p_retailprice FROM part p
       WHERE p_retailprice >
             (SELECT cast(sum(cast(p2.p_retailprice as decimal(18,2))) as double)
                     / count(*)
              FROM part p2 WHERE p2.p_brand = p.p_brand)"""


@_q(
    "sql_correlated_subquery",
    _CORR_SUBQ,
    "correlated scalar subquery (per-brand average) — Catalyst decorrelates "
    "to an aggregate + join; exact decimal average both engines",
)
def sql_correlated_subquery(spark, sf_dir):
    return _sql(spark, sf_dir, _CORR_SUBQ)


@_q(
    "sql_exists_subquery",
    """SELECT c_custkey FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""",
    "correlated EXISTS → decorrelated to a semi join by Catalyst",
)
def sql_exists_subquery(spark, sf_dir):
    return _sql(
        spark,
        sf_dir,
        """SELECT c_custkey FROM customer c
           WHERE EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_totalprice > 300000)""",
    )


@_q(
    "sql_in_subquery",
    """SELECT p_partkey, p_name FROM part
       WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)""",
    "IN subquery → semi join",
)
def sql_in_subquery(spark, sf_dir):
    return _sql(
        spark,
        sf_dir,
        """SELECT p_partkey, p_name FROM part
           WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                               WHERE l_quantity > 49)""",
    )


_CTE_SQL = """
WITH big_orders AS (
    SELECT o_custkey, count(*) AS n_big
    FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
)
SELECT c_nationkey, count(*) AS n_cust,
       cast(sum(n_big) as bigint) AS total_big_orders
FROM customer JOIN big_orders ON c_custkey = o_custkey
GROUP BY c_nationkey
"""


@_q(
    "sql_cte",
    _CTE_SQL,
    "CTE + join + re-aggregation",
)
def sql_cte(spark, sf_dir):
    return _sql(spark, sf_dir, _CTE_SQL)


_GSETS_SQL = """
SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       count(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@_q(
    "sql_grouping_sets",
    _GSETS_SQL,
    "explicit GROUPING SETS (beyond rollup/cube)",
)
def sql_grouping_sets(spark, sf_dir):
    return _sql(spark, sf_dir, _GSETS_SQL)


# =========================================================================
# More aggregate / join / window shapes
# =========================================================================

@_q(
    "agg_string_agg",
    """SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS names
       FROM supplier GROUP BY s_nationkey""",
    "ordered string aggregation (listagg)",
)
def agg_string_agg(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    return s.groupBy("s_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("names")
    )


@_q(
    "agg_two_level",
    """SELECT n_orders, count(*) AS n_customers
       FROM (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
       GROUP BY n_orders""",
    "aggregation cascade (distribution of per-customer order counts)",
)
def agg_two_level(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@_q(
    "join_argmax",
    """SELECT o.o_custkey, min(o.o_orderkey) AS best_order
       FROM orders o
       JOIN (SELECT o_custkey, max(o_totalprice) AS m FROM orders GROUP BY o_custkey) t
         ON o.o_custkey = t.o_custkey AND o.o_totalprice = t.m
       GROUP BY o.o_custkey""",
    "arg-max via self-aggregate join (ties broken by min orderkey)",
)
def join_argmax(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").alias("o")
    t = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("m"))
        .withColumnRenamed("o_custkey", "t_custkey")
    )
    return (
        o.join(
            t,
            (F.col("o.o_custkey") == F.col("t_custkey"))
            & (F.col("o.o_totalprice") == F.col("m")),
        )
        .groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("best_order"))
    )


@_q(
    "join_right_outer",
    """SELECT c_custkey, o_orderkey FROM orders
       RIGHT JOIN customer ON o_custkey = c_custkey""",
    "right outer join (null order keys for order-less customers)",
)
def join_right_outer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o["o_custkey"] == c["c_custkey"], "right").select(
        "c_custkey", "o_orderkey"
    )


@_q(
    "window_range_running",
    """SELECT o_custkey, o_orderkey,
              cast(sum(cast(o_totalprice as decimal(18,2)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   as double) AS run_total_ties
       FROM orders""",
    "RANGE frame (value-based — same-date orders aggregate together, "
    "deterministic under ties unlike a ROWS frame)",
)
def window_range_running(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias(
            "run_total_ties"
        ),
    )


@_q(
    "scalar_regex",
    """SELECT p_partkey,
              regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS color,
              regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
              regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
       FROM part""",
    "regex extraction/replacement scalars",
)
def scalar_regex(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+) ([a-z]+)", 1).alias("color"),
        F.regexp_extract("p_name", "([a-z]+) ([a-z]+)", 2).alias("noun"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


# =========================================================================
# Deduplication (north-star extensions)
# =========================================================================

@_q(
    "dedup_exact",
    """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
       FROM documents GROUP BY text""",
    "exact dedup: hash-groupBy on content, canonical = min id",
)
def dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs).select("canonical_id", "n_copies")


@_q(
    "dedup_exact_hash",
    """SELECT md5(text) AS h, min(doc_id) AS canonical_id FROM documents
       GROUP BY md5(text)""",
    "exact dedup on md5(content) — fixed-width shuffle key for 100 TB",
)
def dedup_exact_hash(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("canonical_id")
    )


@_q(
    "dedup_minhash_lsh",
    dedup.minhash_lsh_pairs_oracle(),
    "MinHash(16) + LSH(4×4 bands) near-dup pairs, exact-Jaccard verified",
)
def dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_ngram_jaccard",
    dedup.ngram_jaccard_pairs_oracle(),
    "exact word-trigram Jaccard pairs via inverted shingle index",
)
def dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_simhash_fp",
    dedup.simhash_fingerprints_oracle(),
    "48-bit SimHash fingerprints (relational bit-vote formulation)",
)
def dedup_simhash_fp(spark, sf_dir):
    return dedup.simhash_fingerprints(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_simhash_pairs",
    dedup.simhash_pairs_oracle(),
    "SimHash near-dup pairs by Hamming distance (all-pairs exactness "
    "verifier for the banded LSH scale path, dedup_simhash_lsh)",
)
def dedup_simhash_pairs(spark, sf_dir):
    return dedup.simhash_pairs(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_simhash_lsh",
    dedup.simhash_lsh_pairs_oracle(),
    "SimHash near-dup pairs via 4×12-bit band LSH: bucket equi-join + "
    "exact Hamming verify on candidates only — recall 1.0 at hamming≤3 "
    "by pigeonhole, no all-pairs join (the 100 TB path)",
)
def dedup_simhash_lsh(spark, sf_dir):
    return dedup.simhash_lsh_pairs(_t(spark, sf_dir, "documents"))


@_q(
    "dedup_embedding_cosine",
    dedup.embedding_neardup_pairs_oracle(),
    "embedding near-dup pairs by cosine (brute-force exactness baseline)",
)
def dedup_embedding_cosine(spark, sf_dir):
    return dedup.embedding_neardup_pairs(_t(spark, sf_dir, "embeddings"))


@_q(
    "setop_intersect_all",
    """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
       INTERSECT ALL
       SELECT o_custkey FROM orders WHERE o_totalprice > 100000""",
    "bag intersect (multiplicity-preserving)",
)
def setop_intersect_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b)


@_q(
    "setop_except_all",
    """SELECT o_custkey AS k FROM orders
       EXCEPT ALL
       SELECT o_custkey FROM orders WHERE o_totalprice > 100000""",
    "bag difference (multiplicity-preserving)",
)
def setop_except_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b)


@_q(
    "setop_union_distinct",
    """SELECT c_nationkey AS nk FROM customer
       UNION SELECT s_nationkey FROM supplier""",
    "set union (dedups across inputs)",
)
def setop_union_distinct(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@_q(
    "window_analytic_values",
    """SELECT o_custkey, o_orderkey,
              first_value(o_totalprice) OVER w AS first_price,
              last_value(o_totalprice)
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                  AS last_price,
              nth_value(o_totalprice, 2) OVER w AS second_price
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",
    "first/last/nth analytic window values (explicit full frame for "
    "last_value — the default frame stops at CURRENT ROW)",
)
def window_analytic_values(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@_q(
    "window_distribution",
    """SELECT c_custkey,
              percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS bal_pct_rank,
              cume_dist() OVER (ORDER BY c_acctbal, c_custkey) AS bal_cume
       FROM customer""",
    "distribution window functions (rank ratios — exact rational "
    "arithmetic in doubles, engine-stable)",
)
def window_distribution(spark, sf_dir):
    # Global percent_rank/cume_dist is inherently a total order — exact
    # rank requires one task to see the full order. Scale alternative at
    # 100 TB: two-pass range rank — range-partition on c_acctbal
    # (repartitionByRange), compute per-partition local ranks, then add the
    # broadcast cumulative counts of the preceding partitions; or accept
    # approximate ranks via approx_percentile-derived CDF buckets.
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume"),
    )


@_q(
    "window_distribution_scale",
    """SELECT c_custkey,
              percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS bal_pct_rank,
              cume_dist() OVER (ORDER BY c_acctbal, c_custkey) AS bal_cume
       FROM customer""",
    "window_distribution's 100 TB path: identical output via two-pass "
    "range-partitioned row numbering (operators/rank.py) — no global sort; "
    "the oracle stays the plain global window",
)
def window_distribution_scale(spark, sf_dir):
    from .operators import rank

    c = _t(spark, sf_dir, "customer")
    n = c.agg(F.count("*").alias("__n"))
    rn = rank.global_row_number(c, "c_acctbal", "c_custkey", out="__rn")
    return rn.crossJoin(F.broadcast(n)).select(
        "c_custkey",
        rank.percent_rank_from_rn(F.col("__rn"), F.col("__n")).alias(
            "bal_pct_rank"
        ),
        (F.col("__rn").cast("double") / F.col("__n")).alias("bal_cume"),
    )


@_q(
    "window_ntile_scale",
    """SELECT quartile, count(*) AS n,
              cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_bal
       FROM (SELECT cast(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) as int)
                    AS quartile, c_acctbal
             FROM customer)
       GROUP BY quartile""",
    "window_ntile's 100 TB path: ANSI ntile(4) recovered arithmetically "
    "from the two-pass global row number — same oracle as window_ntile",
)
def window_ntile_scale(spark, sf_dir):
    from .operators import rank

    c = _t(spark, sf_dir, "customer")
    n = c.agg(F.count("*").alias("__n"))
    rn = rank.global_row_number(c, "c_acctbal", "c_custkey", out="__rn")
    return (
        rn.crossJoin(F.broadcast(n))
        .select(
            rank.ntile_from_rn(F.col("__rn"), F.col("__n"), 4).alias("quartile"),
            "c_acctbal",
        )
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("sum_bal"),
        )
    )


@_q(
    "scalar_null_semantics",
    """SELECT c.c_custkey,
              coalesce(o.o_orderkey, -1) AS order_or_default,
              nullif(c.c_mktsegment, 'HOUSEHOLD') AS seg_or_null,
              (o.o_orderkey IS NOT DISTINCT FROM NULL) AS no_order
       FROM customer c
       LEFT JOIN (SELECT o_custkey, min(o_orderkey) AS o_orderkey
                  FROM orders GROUP BY o_custkey) o
         ON c.c_custkey = o.o_custkey""",
    "NULL semantics: COALESCE / NULLIF / null-safe comparison — 3VL the "
    "reference had no notion of (SURVEY.md §1.3)",
)
def scalar_null_semantics(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").alias("c")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("o_orderkey"))
        .alias("o")
    )
    return c.join(o, F.col("c.c_custkey") == F.col("o.o_custkey"), "left").select(
        "c_custkey",
        F.coalesce("o.o_orderkey", F.lit(-1)).alias("order_or_default"),
        F.nullif("c.c_mktsegment", F.lit("HOUSEHOLD")).alias("seg_or_null"),
        F.col("o.o_orderkey").eqNullSafe(F.lit(None)).alias("no_order"),
    )


@_q(
    "scalar_try_arithmetic",
    """SELECT l_orderkey, l_linenumber,
              round(cast(cast(l_extendedprice as decimal(18,6))
                   / nullif(cast(l_quantity as decimal(18,6)) - 25, 0)
                   as double), 6) AS unit_or_null,
              TRY_CAST(substr(concat(cast(l_orderkey as varchar), l_returnflag),
                              2, 2) AS BIGINT) AS lead_digits,
              CASE WHEN l_quantity <= 7
                   THEN cast(l_quantity as bigint) + 9223372036854775800
                   ELSE NULL END AS sum_or_null
       FROM lineitem WHERE l_orderkey % 500 = 0""",
    "error-safe arithmetic under ANSI mode: try_divide (NULL where the "
    "decimal division would raise DIVIDE_BY_ZERO), try_to_number on "
    "strings that may not be numeric, try_add past int64 range — the "
    "fault-tolerance surface a 100 TB job needs so one poison row "
    "cannot kill a stage. The oracle states the identical semantics "
    "with nullif / TRY_CAST / a range-guarded CASE.",
)
def scalar_try_arithmetic(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 0)
    dec = "decimal(18,6)"
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(
                F.col("l_extendedprice").cast(dec),
                F.col("l_quantity").cast(dec) - 25,
            ).cast("double"),
            6,
        ).alias("unit_or_null"),
        F.expr(
            "cast(try_to_number(substring(concat(cast(l_orderkey as string), "
            "l_returnflag), 2, 2), '99') as bigint)"
        ).alias("lead_digits"),
        F.try_add(
            F.col("l_quantity").cast("bigint"), F.lit(9223372036854775800)
        ).alias("sum_or_null"),
    )


@_q(
    "scalar_date_arithmetic",
    """SELECT o_orderkey,
              strftime(make_timestamp(epoch_us(o_orderdate)
                                      + 2592000000000), '%Y-%m-%d')
                  AS due_date,
              cast((epoch_us(o_orderdate) - 788918400000000)
                   // 86400000000 as bigint) AS days_since_epoch_start,
              strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
       FROM orders WHERE o_orderkey % 100 = 0""",
    "date arithmetic: interval add, datediff, truncation. The Spark side "
    "uses the native idioms (INTERVAL add, datediff — Spark is pinned by "
    "the driver); the oracle states the identical values in integer "
    "epoch-µs (30 d = 2592000000000 µs; 1995-01-01 = 788918400000000 µs; "
    "midnight-aligned dates make the day division exact) because DuckDB "
    "INTERVAL/timestamp-literal arithmetic drifts across versions",
)
def scalar_date_arithmetic(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).alias("days_since_epoch_start"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


@_q(
    "scalar_array_ops",
    """SELECT vec_id,
              len(embedding) AS dim,
              round(list_max(list_transform(embedding, x -> x::DOUBLE)), 6) AS max_val,
              round(embedding[1]::DOUBLE, 6) AS first_val
       FROM embeddings""",
    "array scalar functions over the embedding column",
)
def scalar_array_ops(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.expr("array_max(transform(embedding, x -> cast(x as double)))"), 6
        ).alias("max_val"),
        F.round(F.expr("cast(element_at(embedding, 1) as double)"), 6).alias(
            "first_val"
        ),
    )


@_q(
    "dedup_normalized",
    """SELECT md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS h,
              min(doc_id) AS canonical_id, count(*) AS n_copies
       FROM documents
       GROUP BY 1""",
    "fuzzy-exact dedup: normalize (casefold + whitespace collapse + trim) "
    "before hashing — catches trivially-reformatted duplicates exact "
    "dedup misses",
)
def dedup_normalized(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    norm = F.md5(F.trim(F.regexp_replace(F.lower("text"), " +", " ")))
    return docs.groupBy(norm.alias("h")).agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies")
    )


@_q(
    "text_scrub",
    """SELECT doc_id,
              regexp_replace(
                  regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
                  '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g') AS scrubbed,
              length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS n_digits
       FROM documents""",
    "PII-style scrubbing: pattern redaction (numbers, emails) — the "
    "sanitize step of a training-data pipeline, pure JVM regex",
)
def text_scrub(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    scrub = F.regexp_replace(
        F.regexp_replace("text", "[0-9]+", "<NUM>"),
        "[a-z0-9._%+-]+@[a-z0-9.-]+",
        "<EMAIL>",
    )
    return docs.select(
        "doc_id",
        scrub.alias("scrubbed"),
        (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))).alias(
            "n_digits"
        ),
    )


@_q(
    "dedup_clusters",
    dedup.dedup_clusters_oracle(dedup.minhash_lsh_pairs_oracle()),
    "near-dup canonicalization: MinHash-LSH pairs → connected components "
    "→ (doc_id, cluster_id) map; iterative min-label propagation on "
    "Spark, recursive-CTE reachability in the oracle",
)
def dedup_clusters(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    return dedup.dedup_clusters(docs, pairs, check_every=2)


@_q(
    "dedup_incremental",
    dedup.incremental_neardup_oracle("% 2 = 1", "% 2 = 0"),
    "incremental ingest dedup: odd-id docs (the arriving batch) probe the "
    "even-id docs' band index (the known corpus) — candidate join is "
    "new×known only, so ingest cost scales with the batch",
)
def dedup_incremental(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 2 == 1)
    known_docs = docs.filter(F.col("doc_id") % 2 == 0)
    return dedup.incremental_neardup(new_docs, known_docs)


@_q(
    "dedup_incremental_stateless",
    dedup.incremental_neardup_oracle("% 2 = 1", "% 2 = 0"),
    "streaming-shaped incremental dedup: identical pairs to "
    "dedup_incremental, but every operator on the arriving side is "
    "STATELESS (per-row MinHash expressions, stream-static band join, "
    "first-matching-band dedup predicate) — runs unchanged on a "
    "readStream of documents (test_streaming.py drives it as a real "
    "stream); same oracle as the batch twin",
)
def dedup_incremental_stateless(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    new_docs = docs.filter(F.col("doc_id") % 2 == 1)
    known_docs = docs.filter(F.col("doc_id") % 2 == 0)
    return dedup.incremental_neardup_stateless(new_docs, known_docs)


@_q(
    "pipeline_dedup_rate_by_source",
    dedup.clusters_cte_oracle(dedup.minhash_lsh_pairs_oracle())
    + """
SELECT d.source, count(*) AS n_docs,
       cast(sum(CASE WHEN c.cluster_id != d.doc_id THEN 1 ELSE 0 END)
            as bigint) AS n_duplicates,
       round(sum(CASE WHEN c.cluster_id != d.doc_id THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS dup_rate_r6
FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
GROUP BY d.source""",
    "corpus-health monitoring: per-source duplication rate (fraction of "
    "docs that are NON-canonical in their near-dup cluster) — the "
    "number a crawl operator watches to find feeds that re-serve the "
    "same content. Composition: the shared CC cluster map joined back "
    "to source metadata, one tiny aggregate on the source key; oracle "
    "is the same recursive-CTE reachability the cluster queries use.",
)
def pipeline_dedup_rate_by_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    clusters = dedup.dedup_clusters(
        d.select("doc_id"), dedup.minhash_lsh_pairs(d), check_every=2
    )
    dup = (F.col("cluster_id") != F.col("doc_id")).cast("long")
    return (
        d.join(clusters, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(dup).cast("bigint").alias("n_duplicates"),
            F.round(F.sum(dup) / F.count("*"), 6).alias("dup_rate_r6"),
        )
    )


@_q(
    "catalog_table_checksum",
    """WITH h AS (
    SELECT cast(concat('0x', substr(md5(concat_ws('|',
               cast(o_orderkey as varchar), cast(o_custkey as varchar),
               o_orderstatus,
               cast(cast(o_totalprice as decimal(18,2)) as varchar))),
           1, 12)) as bigint) AS rh
    FROM orders)
SELECT count(*) AS n_rows,
       cast(sum(cast(rh as decimal(38,0))) as varchar) AS checksum_sum,
       bit_xor(rh) AS checksum_xor
FROM h""",
    "order-insensitive table content checksum: canonical row string → "
    "md5 → 48-bit chunk, combined with an exact decimal(38) SUM and a "
    "bit XOR — both commutative, so the fingerprint is identical for "
    "any row order, partitioning, or engine. This is how you verify a "
    "100 TB copy/migration without sorting anything: one map-side hash "
    "+ one tiny aggregate per table; any single-row difference moves "
    "both digests. Doubles ride as decimal(18,2) strings so the "
    "canonical rendering is engine-neutral.",
)
def catalog_table_checksum(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    canon = (
        "concat_ws('|', cast(o_orderkey as string), cast(o_custkey as string), "
        "o_orderstatus, cast(cast(o_totalprice as decimal(18,2)) as string))"
    )
    rh = F.expr(
        f"cast(conv(substr(md5({canon}), 1, 12), 16, 10) as bigint)"
    )
    h = o.select(rh.alias("rh"))
    return h.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("rh").cast("decimal(38,0)")).cast("string").alias("checksum_sum"),
        F.expr("bit_xor(rh)").alias("checksum_xor"),
    )


@_q(
    "catalog_profile_orders",
    """SELECT count(*) AS n_rows,
              count(DISTINCT o_custkey) AS n_customers,
              cast(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) as bigint)
                  AS null_prices,
              min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
              count(DISTINCT o_orderstatus) AS n_statuses,
              strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
              strftime(max(o_orderdate), '%Y-%m-%d') AS last_date
       FROM orders""",
    "table profiling: row/distinct/null/min-max/date-range summary — the "
    "data-quality snapshot step of any pipeline",
)
def catalog_profile_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
            "null_prices"
        ),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count_distinct("o_orderstatus").alias("n_statuses"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
    )


@_q(
    "dedup_embedding_lsh",
    dedup.embedding_neardup_lsh_oracle(),
    "embedding near-dup pairs via LSH bucket prefilter — the 100 TB scale "
    "path for cosine dedup (quadratic work confined to buckets)",
)
def dedup_embedding_lsh(spark, sf_dir):
    return dedup.embedding_neardup_lsh(_t(spark, sf_dir, "embeddings"))


# =========================================================================
# Similarity search
# =========================================================================

@_q(
    "sim_cosine_topk",
    similarity.cosine_topk_oracle(),
    "exact cosine top-k for 8 query vectors (broadcast NLJ + rank-limit)",
)
def sim_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(_t(spark, sf_dir, "embeddings"))


@_q(
    "sim_int8_topk",
    similarity.int8_topk_oracle(),
    "top-k by EXACT int8-quantized dot product — the rescoring pass a "
    "quantized retrieval index runs: symmetric max-abs int8 "
    "quantization (the emb_quantize_int8 arithmetic), bigint dot "
    "products (no floats anywhere in the similarity, so cross-engine "
    "drift is impossible by construction), per-query rank-limit with "
    "id tie-break. Same broadcast-query plan shape as sim_cosine_topk; "
    "at 100 TB the corpus scan reads 1-byte codes instead of float32 — "
    "the 4x I/O cut is the point.",
)
def sim_int8_topk(spark, sf_dir):
    return similarity.int8_topk(_t(spark, sf_dir, "embeddings"))


@_q(
    "sim_ivf_int8_topk",
    similarity.ivf_int8_topk_oracle(),
    "two-stage retrieval: deterministic IVF candidate generation (pinned "
    "sample-init centroids, map-side broadcast assignment, cell-id "
    "equi-join) + exact int8 bigint rescoring of candidates only — the "
    "production vector-index shape. Composes sim_int8_topk's rescorer "
    "with a coarse quantizer so the rescoring scan is n_probes/n_cells "
    "of the corpus instead of a full pass (sub-linear at 100 TB); "
    "value-exact because centroids are corpus vectors, assignment is a "
    "fixed-order float fold with id tie-break, and rescoring never "
    "leaves integers.",
)
def sim_ivf_int8_topk(spark, sf_dir):
    return similarity.ivf_int8_topk(_t(spark, sf_dir, "embeddings"))


@_q(
    "sim_ann_topk",
    f"""SELECT query_id, neighbor_id, dot, rank, 'exact' AS strategy
FROM ({similarity.int8_topk_oracle()}) t""",
    "ADAPTIVE ANN planner (r9 verdict #3 made engine behavior in r10): "
    "ann_topk() first runs the pre-build sampled-recall diagnostic "
    "(one bounded scan + driver-side numpy, similarity.ivf_sampled_"
    "recall) and dispatches per the calibrated thresholds — est>=0.6 "
    "IVF-sqrt(N), <0.4 wide-probe IVF (amortized) or Hamming prefilter "
    "(one-off), else the exact int8 scan. Every strategy returns the "
    "same (query_id, neighbor_id, dot, rank) contract scored by the "
    "exact int8 bigint dot, so strategy choice changes recall/cost, "
    "never semantics. The gate embeddings tables estimate in the "
    "uncertain band (0.45-0.59 at sf0.001-0.1), so the planner picks "
    "'exact' here and the oracle pins BOTH the chosen strategy (as a "
    "literal column a planner flip would hash-break) and the exact "
    "result values. Clustered-vs-uniform dispatch is pinned in "
    "tests/test_scale_ops.py::test_ann_planner_chooses_correctly.",
)
def sim_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    plan = similarity.ann_plan(emb)
    return similarity.ann_topk(emb, plan=plan).withColumn(
        "strategy", F.lit(plan["strategy"])
    )


@_q(
    "sim_lsh_ann_topk",
    similarity.lsh_bucket_topk_oracle(),
    "ANN via random-hyperplane LSH buckets — the 100 TB scale path",
)
def sim_lsh_ann_topk(spark, sf_dir):
    return similarity.lsh_bucket_topk(_t(spark, sf_dir, "embeddings"))


@_q(
    "sim_lsh_multiprobe_topk",
    similarity.lsh_bucket_topk_oracle(n_probes=3),
    "multi-probe hyperplane LSH (Lv et al. VLDB'07): each query also "
    "probes the buckets across its 2 lowest-|projection| hyperplanes — "
    "recall recovers toward brute-force at fixed N_PLANES with query-side "
    "fan-out only (corpus shuffle unchanged); oracle mirrors the exact "
    "probe set",
)
def sim_lsh_multiprobe_topk(spark, sf_dir):
    return similarity.lsh_bucket_topk(_t(spark, sf_dir, "embeddings"), n_probes=3)


@_q(
    "sim_pq_topk",
    _PQ_PINNED_ORACLE,  # ex-rows-only, r10: pinned sample-init
    # codebooks + fixed-order folds make the whole ADC pipeline
    # value-exact (functions/pq.py:pq_pinned_topk_oracle); the TRAINED
    # Lloyd's codebook path stays recall-pinned in
    # tests/test_scale_ops.py::test_pq_topk
    "product-quantization ANN (Jégou et al. 2011): vectors compressed to "
    "8×4-bit codes (≈32× smaller than float32), queries score codes via "
    "per-query ADC lookup tables — at 100 TB the index scan reads 4-byte "
    "codes, never raw vectors; the IVF companion in production IVF-PQ "
    "layouts. Restated deterministic in r10: codebook entries are "
    "subvectors of pinned corpus vectors (the sim_ivf_int8_topk trick), "
    "every float reduction a fixed-order fold, assignment ties on code "
    "id, rank ties on neighbor id — so the DuckDB oracle hash-matches; "
    "the distributedly-trained codebook API remains in functions/pq.py.",
)
def sim_pq_topk(spark, sf_dir):
    from .functions import pq

    return pq.pq_pinned_topk(_t(spark, sf_dir, "embeddings"))


@_q(
    "sim_ivfpq_topk",
    _IVFPQ_PINNED_ORACLE,  # ex-rows-only, r10: BOTH quantizers pinned
    # sample-init (coarse = the sim_ivf_int8_topk centroid set;
    # residual codebook = residuals of 16 pinned corpus vectors), every
    # float op a fixed-order fold — the full ADC algebra value-matches;
    # the trained two-quantizer path stays recall-pinned in
    # tests/test_scale_ops.py::test_ivfpq_topk
    "IVF-PQ: coarse Voronoi cells + PQ-encoded RESIDUALS (~5 bytes per "
    "vector) — the production billion-scale vector-index layout. Probes "
    "n_probe cells via an equi-join on the cell id; within cells, ADC "
    "over residual codes plus the exact query·centroid term. Restated "
    "deterministic in r10 (the last rows-only PQ-family member): both "
    "quantizers are pinned corpus vectors, residuals/LUTs/norms are "
    "fixed-order folds built IN-PLAN from tiny broadcast relations, so "
    "the DuckDB oracle replays assignment, residual encoding, and the "
    "(q·c + Σ lut) / (‖q‖·√(‖c‖² + 2Σ ccdot + Σ rnorm)) scoring bit "
    "for bit; trained-codebook API unchanged in functions/pq.py.",
)
def sim_ivfpq_topk(spark, sf_dir):
    from .functions import pq

    return pq.ivfpq_pinned_topk(_t(spark, sf_dir, "embeddings"))


@_q(
    "sim_ivf_topk",
    similarity.ivf_float_topk_oracle(),  # ex-rows-only, r10: pinned
    # sample-init centroids + fixed-order float folds make IVF-Flat
    # value-exact (the r6 ivf_int8 split applied to the float path);
    # the TRAINED k-means variant stays recall-pinned in
    # tests/test_scale_ops.py::test_ivf_topk_recall
    "IVF-Flat ANN with float cosine rescoring: queries probe the 4 "
    "nearest of 16 pinned sample-init cells, candidates come from a "
    "cell-id equi-join, scoring is the cosine_topk fixed-order fold — "
    "the learned-partition counterpart to the LSH scale path, restated "
    "deterministically so it is value-exact oracle-checked (r10); the "
    "distributedly-TRAINED k-means quantizer remains the production "
    "API in functions/ivf.py, recall-pinned in tests.",
)
def sim_ivf_topk(spark, sf_dir):
    return similarity.ivf_float_topk(_t(spark, sf_dir, "embeddings"))


# =========================================================================
# Text analysis
# =========================================================================

@_q(
    "text_lang_id",
    f"SELECT doc_id, {text.ORACLE_EXPRS['lang_id'][1]} AS lang_id FROM documents",
    "n-gram stopword language-ID heuristic (pure JVM expression)",
)
def text_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text.with_lang_id(docs).select("doc_id", "lang_id")


@_q(
    "text_quality",
    f"SELECT doc_id, {text.ORACLE_EXPRS['quality'][1]} AS quality FROM documents",
    "quality score: alpha density × capped mean token length",
)
def text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text.with_quality(docs).select("doc_id", "quality")


@_q(
    "text_char_entropy",
    """WITH cc AS (
    SELECT doc_id, c, count(*) AS cnt
    FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '')) AS c
          FROM documents)
    WHERE c != '' GROUP BY doc_id, c
),
folded AS (
    SELECT doc_id,
           list(cnt ORDER BY c) AS cnts,
           sum(cnt) AS n
    FROM cc GROUP BY doc_id
)
SELECT doc_id,
       round(list_reduce(
           list_prepend(cast(0 as double),
               list_transform(cnts,
                   k -> -(k / cast(n as double)) * log2(k / cast(n as double)))),
           (a, b) -> a + b), 6) AS char_entropy
FROM folded""",
    "character-entropy quality signal (Shannon bits/char — near-zero for "
    "repeated-char gibberish, ~4.2 for natural English). Float parity via "
    "the deterministic-fold trick: per-char counts are collected SORTED BY "
    "CHARACTER and the -p*log2(p) terms left-folded in that order, so both "
    "engines accumulate identically — no parallel-sum drift",
)
def text_char_entropy(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    cc = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), "")).alias("c")
        )
        .filter(F.col("c") != "")
        .groupBy("doc_id", "c")
        .agg(F.count("*").alias("cnt"))
    )
    folded = cc.groupBy("doc_id").agg(
        F.expr("transform(sort_array(collect_list(struct(c, cnt))), s -> s.cnt)")
        .alias("cnts"),
        F.sum("cnt").alias("n"),
    )
    return folded.select(
        "doc_id",
        F.round(
            F.expr(
                "aggregate(transform(cnts,"
                " k -> -(k / cast(n as double)) * log2(k / cast(n as double))),"
                " cast(0 as double), (a, b) -> a + b)"
            ),
            6,
        ).alias("char_entropy"),
    )


@_q(
    "text_lm_score",
    """WITH s AS (
    SELECT doc_id, lower(text) AS s FROM documents WHERE length(text) >= 2),
bg AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, length(s) - 1),
                                 i -> substr(s, i, 2))) AS b
    FROM s),
per AS (SELECT doc_id, b, count(*) AS k FROM bg GROUP BY doc_id, b),
corpus AS (SELECT b, count(*) AS c FROM bg GROUP BY b),
tot AS (SELECT sum(c) AS t FROM corpus),
folded AS (
    SELECT doc_id, list(struct_pack(b := b, k := k, c := c) ORDER BY b) AS xs,
           sum(k) AS n
    FROM per JOIN corpus USING (b) GROUP BY doc_id)
SELECT doc_id,
       round(list_reduce(list_prepend(cast(0 as double),
                 list_transform(xs, x -> x.k * ln(x.c / cast(t as double)))),
             (a, b) -> a + b) / n, 6) AS lm_score_r6
FROM folded CROSS JOIN tot""",
    "corpus-LM quality score (CCNet-style filtering signal): mean log "
    "corpus-frequency of the doc's character bigrams — low = gibberish / "
    "atypical text, high = looks like the corpus. Two aggregates over one "
    "exploded-bigram table (per-doc and corpus-wide, reused shuffle), "
    "tiny bigram-vocab count table broadcast back, 1-row total via the "
    "lazy crossJoin. Float parity by the sorted-fold trick: per-doc terms "
    "fold in bigram order on both engines.",
)
def text_lm_score(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # lower() in its OWN projection: inlining it into the transform lambda
    # would re-evaluate it per bigram element (the measured 80× pitfall
    # documented at functions/dedup.shingled_docs)
    bg = (
        docs.filter(F.length("text") >= 2)
        .select("doc_id", F.lower("text").alias("s"))
        .select(
            "doc_id",
            F.explode(
                F.expr("transform(sequence(1, length(s) - 1), i -> substr(s, i, 2))")
            ).alias("b"),
        )
    )
    per = bg.groupBy("doc_id", "b").agg(F.count("*").alias("k"))
    corpus = bg.groupBy("b").agg(F.count("*").alias("c"))
    tot = corpus.agg(F.sum("c").alias("t"))
    folded = (
        per.join(F.broadcast(corpus), "b")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(b, k, c))),"
                " x -> named_struct('k', x.k, 'c', x.c))"
            ).alias("xs"),
            F.sum("k").alias("n"),
        )
    )
    return folded.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        F.round(
            F.expr(
                "aggregate(transform(xs, x -> x.k * ln(x.c / cast(t as double))),"
                " cast(0 as double), (a, b) -> a + b)"
            )
            / F.col("n"),
            6,
        ).alias("lm_score_r6"),
    )


@_q(
    "text_token_stats",
    f"""SELECT doc_id, {text.ORACLE_EXPRS['n_tokens'][1]} AS n_tokens,
               {text.ORACLE_EXPRS['n_ws_tokens'][1]} AS n_ws_tokens,
               {text.ORACLE_EXPRS['n_bpe_tokens'][1]} AS n_bpe_tokens
        FROM documents""",
    "token counting: word-regex tokens, whitespace tokens, and a BPE-ish "
    "GPT-2-shaped pretokenizer count (space-prefixed letter/digit/punct "
    "runs) — same regex, same leftmost-first semantics, both engines",
)
def text_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text.with_token_counts(docs).select(
        "doc_id", "n_tokens", "n_ws_tokens", "n_bpe_tokens"
    )


@_q(
    "text_fingerprint",
    f"SELECT doc_id, {text.ORACLE_EXPRS['fp'][1]} AS fp FROM documents",
    "polynomial rolling-hash document fingerprint (mod 1e9+7)",
)
def text_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text.with_fingerprint(docs).select("doc_id", "fp")


@_q(
    "text_word_freq",
    """SELECT w AS word, count(*) AS cnt
       FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
             FROM documents)
       GROUP BY w HAVING count(*) >= 100""",
    "corpus word frequencies (explode → count); HAVING keeps the result "
    "set deterministic without ORDER/LIMIT",
)
def text_word_freq(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    from .functions.hashing import spark_tokens

    return (
        docs.select(F.explode(F.expr(spark_tokens("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 100)
    )


# =========================================================================
# Multimodal (binary payload plumbing)
# =========================================================================

@_q(
    "mm_binary_features",
    """SELECT doc_id, cast(octet_length(encode(text)) as bigint) AS n_bytes,
              ascii(substr(text, 1, 1)) AS first_byte
       FROM documents""",
    "binary payload + Arrow mapInPandas feature extraction (decode stubbed; "
    "Spark plumbing — schema, batching, UDF signature — is real)",
)
def mm_binary_features(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.attach_binary_payload(docs))


@_q(
    "mm_frame_samples",
    """WITH pos AS (
    SELECT doc_id, text,
           unnest(generate_series(0, cast((length(text) - 1) // 250 as int)))
               AS frame_idx
    FROM documents WHERE length(text) > 0
)
SELECT doc_id, cast(frame_idx as int) AS frame_idx,
       md5(substr(text, frame_idx * 250 + 1, 100)) AS frame_md5,
       cast(length(substr(text, frame_idx * 250 + 1, 100)) as bigint)
           AS frame_bytes
FROM pos""",
    "frame sampling over binary payloads (video-style decode plumbing): "
    "every 250 bytes cut a 100-byte frame, fingerprint it — Arrow "
    "mapInPandas fan-out; oracle reproduces the frames from the source "
    "text (payloads are its utf-8 bytes, ASCII ⇒ byte==char offsets)",
)
def mm_frame_samples(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return multimodal.sample_frames(multimodal.attach_binary_payload(docs))


@_q(
    "mm_decode",
    """SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END
           AS format,
       CAST((doc_id * 7) % 2000 + 16 AS INT) AS width,
       CAST((doc_id * 13) % 1200 + 16 AS INT) AS height,
       CAST(CASE
            WHEN doc_id % 3 = 2 THEN 3
            WHEN doc_id % 3 = 0 THEN CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END
            ELSE CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END
        END AS INT) AS channels,
       CAST(8 AS INT) AS bit_depth
       FROM documents""",
    "REAL container decode: per-doc payloads are genuine PNG/JPEG/GIF bytes "
    "(signature + IHDR / JFIF+SOF0 walk / logical screen descriptor) built "
    "deterministically from doc_id, then parsed back byte-level by "
    "decode_real in an Arrow mapInPandas stage; the oracle states the "
    "expected metadata arithmetically, so any parser drift hash-fails",
)
def mm_decode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return multimodal.decode_media(multimodal.synthesize_media(docs))


@_q(
    "mm_decode_filter",
    """WITH meta AS (
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END
               AS format,
           CAST((doc_id * 7) % 2000 + 16 AS INT) AS width,
           CAST((doc_id * 13) % 1200 + 16 AS INT) AS height
    FROM documents)
SELECT format, count(*) AS n_images,
       cast(sum(cast(width as bigint) * height) as bigint) AS sum_pixels,
       cast(min(width) as int) AS min_width,
       cast(max(width) as int) AS max_width,
       round(avg(cast(width as bigint) * height), 6) AS avg_pixels_r6
FROM meta
WHERE least(width, height) >= 64 AND greatest(width, height) <= 3 * least(width, height)
GROUP BY format""",
    "decode-driven curation filter — the reason container decode exists: "
    "drop tiny images (min side < 64) and extreme aspect ratios (> 3:1) "
    "using ONLY the decoded header metadata, then profile what survives "
    "per format. At 100 TB the filter runs in the decode's map stage; "
    "payload bytes never reach the (tiny) aggregate. Oracle re-derives "
    "the planted dimensions arithmetically.",
)
def mm_decode_filter(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    meta = multimodal.decode_media(multimodal.synthesize_media(docs))
    kept = meta.filter(
        (F.least("width", "height") >= 64)
        & (F.greatest("width", "height") <= 3 * F.least("width", "height"))
    )
    pixels = F.col("width").cast("bigint") * F.col("height")
    return kept.groupBy("format").agg(
        F.count("*").alias("n_images"),
        F.sum(pixels).cast("bigint").alias("sum_pixels"),
        F.min("width").cast("int").alias("min_width"),
        F.max("width").cast("int").alias("max_width"),
        F.round(F.avg(pixels), 6).alias("avg_pixels_r6"),
    )


_AUDIO_RATE_SQL = (
    "CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000 "
    "WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END"
)


@_q(
    "mm_audio_decode",
    f"""SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS format,
       CAST({_AUDIO_RATE_SQL} AS INT) AS sample_rate,
       CAST(1 + doc_id % 2 AS INT) AS channels,
       CAST(16 + 8 * ((doc_id // 2) % 2) AS INT) AS bit_depth,
       CAST((doc_id * 997) % 100000 + 1000 AS BIGINT) AS n_samples,
       (((doc_id * 997) % 100000 + 1000) * 1000.0) / ({_AUDIO_RATE_SQL})
           AS duration_ms
       FROM documents""",
    "REAL audio container decode: per-doc payloads are genuine WAV (RIFF "
    "chunk walk) or FLAC (STREAMINFO bit-unpack) bytes built "
    "deterministically from doc_id, parsed back byte-level by "
    "decode_audio_real in an Arrow mapInPandas stage — sample rate, "
    "channels, bit depth, sample count, duration. The image-decode "
    "design extended to the audio modality (functions/multimodal.py; "
    "truncation/corruption rejects unit-tested); duration is one IEEE "
    "double division so the arithmetic oracle matches bit-for-bit.",
)
def mm_audio_decode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return multimodal.decode_audio(multimodal.synthesize_audio(docs))


@_q(
    "mm_audio_filter",
    f"""WITH meta AS (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'flac' END AS format,
           {_AUDIO_RATE_SQL} AS sample_rate,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           (doc_id * 997) % 100000 + 1000 AS n_samples
    FROM documents)
SELECT format, count(*) AS n_clips,
       cast(sum(n_samples) as bigint) AS sum_samples,
       round(sum((n_samples * 1000.0) / sample_rate), 6) AS total_ms_r6
FROM meta
WHERE sample_rate >= 16000 AND (n_samples * 1000.0) / sample_rate >= 50
GROUP BY format""",
    "decode-driven audio curation: keep clips a speech pipeline can use "
    "(≥16 kHz, ≥50 ms) using only decoded header metadata, then total "
    "the per-format durations. Same shape as mm_decode_filter — the "
    "filter runs in the decode's map stage; payload bytes never reach "
    "the aggregate.",
)
def mm_audio_filter(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    meta = multimodal.decode_audio(multimodal.synthesize_audio(docs))
    kept = meta.filter(
        (F.col("sample_rate") >= 16000) & (F.col("duration_ms") >= 50)
    )
    return kept.groupBy("format").agg(
        F.count("*").alias("n_clips"),
        F.sum("n_samples").cast("bigint").alias("sum_samples"),
        F.round(F.sum("duration_ms"), 6).alias("total_ms_r6"),
    )


_VIDEO_TS_SQL = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 600 WHEN 1 THEN 1000 "
    "ELSE 90000 END"
)


@_q(
    "mm_video_decode",
    f"""SELECT doc_id, 'mp4' AS format,
       CAST((doc_id * 11) % 1920 + 128 AS INT) AS width,
       CAST((doc_id * 17) % 1080 + 128 AS INT) AS height,
       CAST({_VIDEO_TS_SQL} AS INT) AS timescale,
       CAST((doc_id * 31) % 100000 + ({_VIDEO_TS_SQL}) AS BIGINT)
           AS duration_units,
       (((doc_id * 31) % 100000 + ({_VIDEO_TS_SQL})) * 1000.0)
           / ({_VIDEO_TS_SQL}) AS duration_ms
       FROM documents""",
    "REAL video container decode: per-doc payloads are genuine MP4 "
    "(ISO/IEC 14496-12) header bytes — ftyp brand gate, then a box walk "
    "to moov/mvhd (timescale + duration) and moov/trak/tkhd (16.16 "
    "fixed-point presentation dimensions) — built deterministically "
    "from doc_id and parsed back byte-level by decode_video_real in an "
    "Arrow mapInPandas stage. Completes the image/audio/video decode "
    "triad (functions/multimodal.py); truncated-box and wrong-brand "
    "rejects unit-tested; duration is one IEEE double division so the "
    "arithmetic oracle matches bit-for-bit.",
)
def mm_video_decode(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return multimodal.decode_video(multimodal.synthesize_video(docs))


@_q(
    "mm_modality_router",
    f"""WITH meta AS (
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS modality,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN (doc_id * 7) % 2000 + 16
                WHEN 1 THEN {_AUDIO_RATE_SQL}
                ELSE (doc_id * 11) % 1920 + 128 END AS dim_a,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN (doc_id * 13) % 1200 + 16
                WHEN 1 THEN 1 + doc_id % 2
                ELSE (doc_id * 17) % 1080 + 128 END AS dim_b,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN NULL
                WHEN 1 THEN ((doc_id * 997) % 100000 + 1000) * 1000.0
                            / ({_AUDIO_RATE_SQL})
                ELSE ((doc_id * 31) % 100000 + 90000) * 1000.0 / 90000
           END AS duration_ms
    FROM documents)
SELECT modality, count(*) AS n_payloads,
       cast(sum(dim_a) as bigint) AS sum_dim_a,
       cast(sum(dim_b) as bigint) AS sum_dim_b,
       round(sum(duration_ms), 6) AS total_ms_r6
FROM meta GROUP BY modality""",
    "mixed-modality routing: ONE opaque binary column carries PNG, WAV, "
    "and MP4 payloads interleaved; the router sniffs container magic "
    "bytes per payload and dispatches to the matching byte-level "
    "decoder, emitting a unified typed row (corrupt/unknown → modality "
    "NULL, never a stage failure). The shape a real multimodal crawl "
    "lands in — the profile aggregate shows what the corpus actually "
    "holds. Map-only Arrow stage; oracle re-derives every routed field "
    "arithmetically.",
)
def mm_modality_router(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    routed = multimodal.route_and_decode(
        multimodal.synthesize_mixed_media(docs)
    )
    return routed.groupBy("modality").agg(
        F.count("*").alias("n_payloads"),
        F.sum("dim_a").cast("bigint").alias("sum_dim_a"),
        F.sum("dim_b").cast("bigint").alias("sum_dim_b"),
        F.round(F.sum("duration_ms"), 6).alias("total_ms_r6"),
    )


# =========================================================================
# Streaming-shaped operators over events (batch-checkable)
# =========================================================================

@_q(
    "stream_tumbling_counts",
    """SELECT (epoch_ns(ts) - epoch_ns(ts) % 3600000000000) AS window_start_ns,
              event_type, count(*) AS n_events,
              cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
       FROM events GROUP BY 1, 2""",
    "tumbling 1h windows (int64-ns bucketing; same op runs under "
    "readStream — tests/test_streaming.py)",
)
def stream_tumbling_counts(spark, sf_dir):
    return EV.tumbling_counts(_t(spark, sf_dir, "events"))


@_q(
    "stream_sliding_counts",
    """SELECT (halfslot - k) * 1800000000000 AS window_start_ns, event_type,
              count(*) AS n_events
       FROM (SELECT epoch_ns(ts) // 1800000000000 AS halfslot, event_type
             FROM events)
       CROSS JOIN (SELECT unnest([0, 1]) AS k)
       GROUP BY 1, 2""",
    "sliding 1h/30min windows via the real window() operator",
)
def stream_sliding_counts(spark, sf_dir):
    return EV.sliding_counts(_t(spark, sf_dir, "events"))


@_q(
    "stream_session_windows",
    EV.session_stats_oracle(),
    "per-user 30-min-gap session windows (lag→cumsum sessionization)",
)
def stream_session_windows(spark, sf_dir):
    return EV.session_stats(_t(spark, sf_dir, "events"))


@_q(
    "stream_daily_ohlc",
    """WITH e AS (
    SELECT user_id, epoch_us(ts) AS t, epoch_us(ts) // 86400000000 AS day,
           event_id, value
    FROM events WHERE event_type = 'purchase'
),
ranked AS (
    SELECT user_id, day, value,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY t, event_id) AS rn_open,
           row_number() OVER (PARTITION BY user_id, day
                              ORDER BY t DESC, event_id DESC) AS rn_close
    FROM e
)
SELECT user_id, cast(day as bigint) AS day,
       cast(sum(CASE WHEN rn_open = 1 THEN value END) as double) AS open,
       cast(sum(CASE WHEN rn_close = 1 THEN value END) as double) AS close,
       max(value) AS high, min(value) AS low, count(*) AS n_events
FROM ranked GROUP BY user_id, day""",
    "per-user daily OHLC of purchase values — first/last by event time "
    "(deterministic tiebreaks) + min/max, the time-series summary shape",
)
def stream_daily_ohlc(spark, sf_dir):
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr("ts DIV 1000").alias("t"),
            F.expr("(ts DIV 1000) DIV 86400000000").alias("day"),
            "event_id",
            "value",
        )
    )
    w_open = Window.partitionBy("user_id", "day").orderBy("t", "event_id")
    w_close = Window.partitionBy("user_id", "day").orderBy(
        F.col("t").desc(), F.col("event_id").desc()
    )
    ranked = e.select(
        "user_id",
        "day",
        "value",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return ranked.groupBy("user_id", "day").agg(
        F.sum(F.when(F.col("rn_open") == 1, F.col("value"))).cast("double").alias("open"),
        F.sum(F.when(F.col("rn_close") == 1, F.col("value"))).cast("double").alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count("*").alias("n_events"),
    )


@_q(
    "stream_session_native",
    EV.session_stats_oracle(),
    "per-user sessions via the NATIVE session_window operator (the same "
    "semantics stream_session_windows derives with lag/cumsum — both "
    "checked against the identical oracle)",
)
def stream_session_native(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window(F.col("ts_utc"), "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("last_ns"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            # integer DIV, not /: double division rounds the µs by ±1
            F.expr("last_ns DIV 1000").alias("session_end_us"),
            "n_events",
        )
    )


@_q(
    "stream_zscore_anomalies",
    """WITH stats AS (
    SELECT user_id,
           cast(sum(cast(value as decimal(18,6))) as double) / count(*) AS mu,
           cast(sum(cast(value as decimal(18,6)) * cast(value as decimal(18,6)))
                as double) AS sumsq,
           count(*) AS n
    FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id,
       round((e.value - s.mu)
             / sqrt((s.sumsq - s.n * s.mu * s.mu) / (s.n - 1)), 6) AS z
FROM events e JOIN stats s ON e.user_id = s.user_id
WHERE s.n > 1
  AND abs((e.value - s.mu)
          / sqrt((s.sumsq - s.n * s.mu * s.mu) / (s.n - 1))) > 2.5""",
    "per-user z-score outliers — anomaly detection with EXACT moments "
    "(decimal sum and sum-of-squares → deterministic mean/stddev, no "
    "float-reduction drift that stddev_samp() would have)",
)
def stream_zscore_anomalies(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    stats = (
        e.groupBy("user_id")
        .agg(
            (F.sum(dec).cast("double") / F.count("*")).alias("mu"),
            F.sum(dec * dec).cast("double").alias("sumsq"),
            F.count("*").alias("n"),
        )
        .withColumnRenamed("user_id", "s_user")
    )
    j = e.join(stats, e["user_id"] == stats["s_user"]).filter(F.col("n") > 1)
    z = (F.col("value") - F.col("mu")) / F.sqrt(
        (F.col("sumsq") - F.col("n") * F.col("mu") * F.col("mu")) / (F.col("n") - 1)
    )
    return (
        j.filter(F.abs(z) > 2.5)
        .select("event_id", "user_id", F.round(z, 6).alias("z"))
    )


@_q(
    "stream_first_event_dedup",
    """SELECT user_id, event_type, min(epoch_us(ts)) AS first_ts_us
       FROM events GROUP BY user_id, event_type""",
    "keyed dedup (keep-first) — the batch twin of streaming "
    "dropDuplicates state (µs resolution: ns truncate identically in the "
    "oracle's TIMESTAMP)",
)
def stream_first_event_dedup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.min(F.expr("ts DIV 1000")).alias("first_ts_us")
    )


_CHUNK_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), ' +'), t -> t != '') AS t
    FROM documents
),
nz AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
idx AS (
    SELECT doc_id, t,
           unnest(generate_series(0,
               greatest(0, cast(ceil((len(t) - 40) / 30.0) as int)))) AS chunk_idx
    FROM nz
)
SELECT doc_id, cast(chunk_idx as int) AS chunk_idx,
       array_to_string(t[(chunk_idx * 30 + 1):(chunk_idx * 30 + 40)], ' ') AS chunk,
       cast(len(t[(chunk_idx * 30 + 1):(chunk_idx * 30 + 40)]) as int) AS n_tokens
FROM idx
"""


@_q(
    "text_chunking",
    _CHUNK_ORACLE,
    "document chunking into overlapping 40-token windows (stride 30) via "
    "a Python UDTF with LATERAL — the UDTF surface; a JVM-only twin "
    "exists for bulk use (functions/chunking.py)",
)
def text_chunking(spark, sf_dir):
    from .functions import chunking

    return chunking.chunk_documents_udtf(spark, _t(spark, sf_dir, "documents"))


_BANDS = [
    ("micro", 0, 1_000),
    ("small", 1_000, 5_000),
    ("mid", 5_000, 20_000),
    ("large", 20_000, 100_000),
    ("jumbo", 100_000, 1_000_000),
]
_BANDS_SQL_ROWS = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@_q(
    "join_range_bands",
    f"""WITH bands(band, lo, hi) AS (VALUES {_BANDS_SQL_ROWS})
        SELECT band, count(*) AS n_orders,
               cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
        FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band""",
    "range (interval-containment) join against irregular value bands — "
    "broadcast the tiny interval table, theta-join the fact side "
    "(BroadcastNestedLoop over 5 rows ≡ a lookup, the correct plan)",
)
def join_range_bands(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    bands = F.broadcast(
        _local_df(spark, _BANDS, "band string, lo long, hi long")
    )
    return (
        o.join(
            bands,
            (o["o_totalprice"] >= bands["lo"]) & (o["o_totalprice"] < bands["hi"]),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("sum_price"),
        )
    )


@_q(
    "join_asof_forward",
    """WITH r1 AS (
    SELECT o_custkey, epoch_us(o_orderdate) AS t, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
),
r2 AS (SELECT o_custkey, -t AS nt, o_orderkey, o_totalprice FROM r1 WHERE rn = 1),
l AS (SELECT event_id, user_id, -epoch_us(ts) AS nt FROM events)
SELECT l.event_id, l.user_id, r2.o_orderkey AS next_orderkey,
       r2.o_totalprice AS next_totalprice
FROM l ASOF LEFT JOIN r2 ON l.user_id = r2.o_custkey AND l.nt >= r2.nt""",
    "FORWARD as-of join: each event picks up the user's NEXT order at or "
    "after event time — the lookahead-labeling join that turns raw events "
    "into supervised training pairs ('did this session convert, and to "
    "what'). Same one-window-pass composition as join_asof with the "
    "frame mirrored (operators/asof.py direction='forward'); DuckDB's "
    "ASOF only looks backward, so the oracle runs it on NEGATED "
    "timestamps — an exact reduction of forward to backward.",
)
def join_asof_forward(spark, sf_dir):
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("o_t_us"),
        "o_orderkey",
        "o_totalprice",
    )
    out = asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="t_us",
        right_ts="o_t_us",
        value_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )


@_q(
    "stream_hourly_active_users",
    """SELECT (epoch_ns(ts) - epoch_ns(ts) % 3600000000000) AS window_start_ns,
              count(DISTINCT user_id) AS n_active_users,
              count(*) AS n_events
       FROM events GROUP BY 1""",
    "hourly active users — the canonical engagement metric: tumbling 1h "
    "windows × exact distinct users. Exact COUNT(DISTINCT) gathers each "
    "window's user set under the window key; at 100 TB swap in "
    "approx_count_distinct (HLL partials merge map-side, same plan "
    "shape, ~2% error) or the two-phase pre-dedupe rewrite "
    "(agg_twophase_distinct). Same int64-ns bucketing as the other "
    "window queries so the oracle matches bit-for-bit.",
)
def stream_hourly_active_users(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    bucket = F.expr(f"ts - ts % {3600 * 10**9}")
    return (
        e.groupBy(bucket.alias("window_start_ns"))
        .agg(
            F.count_distinct("user_id").alias("n_active_users"),
            F.count("*").alias("n_events"),
        )
    )


@_q(
    "window_time_range_trailing",
    """SELECT event_id, user_id,
       cast(count(*) OVER w as bigint) AS n_trailing_1h,
       cast(sum(cast(value as decimal(18,6))) OVER w as double) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
    "event-time RANGE frame: at every event, the user's trailing-1-hour "
    "count and value sum — the time-decayed-feature shape (fraud "
    "velocity, rate limiting, session heat) that needs NO self-join: "
    "one partitioned window whose frame is an event-time interval. "
    "Spark side uses the INTERVAL frame on the timestamp; the oracle "
    "states the identical frame numerically in epoch-µs. The sum runs "
    "in decimal so peer-order inside the frame cannot drift floats.",
)
def window_time_range_trailing(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    e.createOrReplaceTempView("_evt_trailing")
    return spark.sql(
        """SELECT event_id, user_id,
           count(*) OVER w AS n_trailing_1h,
           cast(sum(cast(value as decimal(18,6))) OVER w as double)
               AS sum_trailing_1h
        FROM _evt_trailing
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_utc
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""
    )


@_q(
    "sql_recursive_cte",
    """WITH RECURSIVE e AS (
    SELECT n_nationkey AS a, (n_nationkey * 7 + 3) % 25 AS b FROM nation),
r AS (
    SELECT a, b FROM e
    UNION
    SELECT r.a, e.b FROM r JOIN e ON r.b = e.a)
SELECT a, b FROM r""",
    "WITH RECURSIVE transitive closure — the one ANSI construct Spark "
    "SQL lacks outright, re-expressed as the engine's fixpoint loop: "
    "seed the reachability set with the edge list, then repeatedly "
    "extend one hop (closure join edges) and UNION-distinct until a "
    "round adds no new pairs, lineage checkpoint-truncated per round "
    "(the iterative-algorithm pattern shared with pagerank and "
    "classifier-train). DuckDB runs its NATIVE recursive CTE as the "
    "oracle, so the hash match proves the loop implements exactly "
    "ANSI's recursive-union fixpoint semantics. Scale note: closure on "
    "dimension-sized graphs (this shape) is the SQL-parity surface; "
    "corpus-scale reachability goes through the min-label-propagation "
    "components path instead (dedup clusters), which converges in "
    "O(diameter) rounds without materializing the quadratic closure.",
)
def sql_recursive_cte(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    e = n.select(
        F.col("n_nationkey").alias("a"),
        ((F.col("n_nationkey") * 7 + 3) % 25).alias("b"),
    ).localCheckpoint(eager=False)
    r = e
    prev = -1
    cur = r.count()
    while cur != prev:
        prev = cur
        step = (
            r.alias("r")
            .join(e.alias("e"), F.col("r.b") == F.col("e.a"))
            .select(F.col("r.a").alias("a"), F.col("e.b").alias("b"))
        )
        r = r.unionByName(step).distinct().localCheckpoint(eager=False)
        cur = r.count()
    return r


@_q(
    "sql_lateral_topn",
    """SELECT c.c_custkey, c.c_name, t.o_orderkey AS top_orderkey,
              t.o_totalprice AS top_price
       FROM customer c JOIN LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t ON true
       WHERE c.c_custkey < 200""",
    "correlated LATERAL subquery (SQL:1999 lateral derived table, Spark "
    "3.2+/DuckDB): each customer joins its own top-priced order — the "
    "per-row-subquery surface; Catalyst decorrelates it into the same "
    "window/aggregate shape as join_argmax rather than running |C| "
    "subqueries.",
)
def sql_lateral_topn(spark, sf_dir):
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """SELECT c.c_custkey, c.c_name, t.o_orderkey AS top_orderkey,
                  t.o_totalprice AS top_price
           FROM _lat_customer c JOIN LATERAL (
               SELECT o_orderkey, o_totalprice FROM _lat_orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
           WHERE c.c_custkey < 200"""
    )


@_q(
    "window_running_distinct",
    """WITH flagged AS (
    SELECT user_id, epoch_us(ts) AS t, event_id,
           CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY epoch_us(ts), event_id) = 1
                THEN 1 ELSE 0 END AS first_seen
    FROM events)
SELECT event_id, user_id,
       cast(sum(first_seen) OVER (PARTITION BY user_id ORDER BY t, event_id)
            as bigint) AS distinct_types_so_far
FROM flagged""",
    "running DISTINCT count per user (how many distinct event types has "
    "this user produced up to each event) — COUNT(DISTINCT) OVER is "
    "unsupported in Spark, so this is the standard two-window rewrite: "
    "flag each (user, type)'s FIRST occurrence with one partitioned "
    "row_number, then a running sum of the flags. Both windows partition "
    "on user keys — no global sort, scales as any windowed aggregate. "
    "The oracle states the identical rewrite so the semantics (ties "
    "broken by event_id) match exactly.",
)
def window_running_distinct(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts DIV 1000").alias("t")
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy("t", "event_id")
    flagged = e.withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, F.lit(1)).otherwise(F.lit(0)),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("first_seen").over(w_run).cast("bigint").alias(
            "distinct_types_so_far"
        ),
    )


@_q(
    "agg_twophase_distinct",
    """WITH dedup AS (
    SELECT DISTINCT o_custkey, o_orderstatus FROM orders)
SELECT o_orderstatus, count(*) AS n_customers
FROM dedup GROUP BY o_orderstatus""",
    "two-phase distinct aggregation: pre-dedupe (key, value) pairs, then "
    "a plain count — the rewrite for COUNT(DISTINCT) on skewed groups at "
    "100 TB: the first phase shuffles on the HIGH-cardinality composite "
    "key (no hot partition), the second is a tiny count per group, "
    "whereas a direct count(distinct) must gather each group's values "
    "under its (possibly hot) group key. Same result as "
    "agg_count_distinct's direct form, by construction.",
)
def agg_twophase_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_orderstatus")
        .distinct()
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_customers"))
    )


@_q(
    "join_interval_overlap",
    """WITH iv AS (
    SELECT o_orderkey AS k, o_orderstatus AS st,
           datediff('day', DATE '1990-01-01', cast(o_orderdate as date)) AS lo,
           datediff('day', DATE '1990-01-01', cast(o_orderdate as date))
               + o_orderkey % 14 + 1 AS hi
    FROM orders WHERE o_orderkey % 5 = 0 AND o_orderstatus IN ('F', 'O'))
SELECT count(*) AS n_pairs,
       cast(sum(least(a.hi, b.hi) - greatest(a.lo, b.lo)) as bigint)
           AS sum_overlap_days
FROM iv a JOIN iv b
  ON a.st = 'F' AND b.st = 'O' AND a.lo <= b.hi AND b.lo <= a.hi""",
    "keyless interval-OVERLAP join (two interval sets, no equi-key — "
    "the telemetry/genomics shape a naive theta join turns into "
    "|A|×|B|): each interval explodes across the 7-day bands it spans, "
    "candidates come from the band EQUI-join, pair duplicates from "
    "multi-band spans collapse with a distinct, and the exact overlap "
    "predicate + overlap-length arithmetic run on candidates only. "
    "Work scales with band co-occupancy, not |A|×|B|; band width is "
    "the knob (≈ median interval span). The oracle runs the plain "
    "theta join — identical pairs is the checked claim.",
)
def join_interval_overlap(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") % 5 == 0)
        & F.col("o_orderstatus").isin("F", "O")
    )
    day = F.expr("datediff(cast(o_orderdate as date), date'1990-01-01')")
    iv = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        day.cast("bigint").alias("lo"),
        (day + F.col("o_orderkey") % 14 + 1).cast("bigint").alias("hi"),
    )
    banded = iv.select(
        "k", "st", "lo", "hi",
        F.explode(
            F.sequence(F.expr("lo DIV 7"), F.expr("hi DIV 7"))
        ).alias("band"),
    )
    a = banded.filter(F.col("st") == "F").alias("a")
    b = banded.filter(F.col("st") == "O").alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi")),
        )
        .select(
            F.col("a.k").alias("ak"), F.col("b.k").alias("bk"),
            F.col("a.lo").alias("alo"), F.col("a.hi").alias("ahi"),
            F.col("b.lo").alias("blo"), F.col("b.hi").alias("bhi"),
        )
        .distinct()  # one row per pair, however many bands both span
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(
            F.least("ahi", "bhi") - F.greatest("alo", "blo")
        ).cast("bigint").alias("sum_overlap_days"),
    )


@_q(
    "stream_funnel_conversion",
    """WITH v AS (
    SELECT user_id, min(epoch_us(ts)) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
    GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       (p.t_purchase IS NOT NULL) AS converted
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id""",
    "ordered funnel (view → click → purchase) per user — event-sequence "
    "analytics over the stream table",
)
def stream_funnel_conversion(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts DIV 1000").alias("t")
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("t") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("t") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_purchase").isNotNull().alias("converted"),
        )
    )


@_q(
    "text_quality_filter",
    f"""SELECT doc_id,
        CASE
            WHEN {text.ORACLE_EXPRS['n_tokens'][1]} < 20 THEN 'too_short'
            WHEN {text.ORACLE_EXPRS['n_tokens'][1]} > 1000 THEN 'too_long'
            WHEN {text.ORACLE_EXPRS['quality'][1]} <= 0.3 THEN 'low_quality'
            WHEN {text.ORACLE_EXPRS['lang_id'][1]} = 'und' THEN 'unknown_lang'
            ELSE 'keep'
        END AS verdict
        FROM documents""",
    "composite keep/drop quality gate with reject reason — the actual "
    "filter step of a training-data pipeline (pure JVM expression cascade)",
)
def text_quality_filter(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    ntok = F.expr(text.ORACLE_EXPRS["n_tokens"][0])
    qual = F.expr(text.ORACLE_EXPRS["quality"][0])
    lang = F.expr(text.ORACLE_EXPRS["lang_id"][0])
    return docs.select(
        "doc_id",
        F.when(ntok < 20, "too_short")
        .when(ntok > 1000, "too_long")
        .when(qual <= 0.3, "low_quality")
        .when(lang == "und", "unknown_lang")
        .otherwise("keep")
        .alias("verdict"),
    )


@_q(
    "dedup_repeated_ngrams",
    """WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
    FROM documents
),
grams AS (
    SELECT doc_id,
           t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
           t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7] AS g
    FROM toks, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS u(i)
)
SELECT md5(g) AS gram_hash, count(*) AS n_occ,
       count(DISTINCT doc_id) AS n_docs
FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2""",
    "repeated-span detection: 8-gram occurrences appearing in ≥2 docs — "
    "the exact-substring-duplication signal (training-data memorization "
    "risk); inverted n-gram index, positions preserved pre-aggregation",
)
def dedup_repeated_ngrams(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("t")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "case when size(t) < 8 then array() else "
                "transform(sequence(1, size(t) - 7), i -> "
                "concat_ws(' ', element_at(t,i), element_at(t,i+1), element_at(t,i+2),"
                " element_at(t,i+3), element_at(t,i+4), element_at(t,i+5),"
                " element_at(t,i+6), element_at(t,i+7))) end"
            )
        ).alias("g"),
    )
    return (
        grams.groupBy("g")
        .agg(
            F.count("*").alias("n_occ"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(F.md5("g").alias("gram_hash"), "n_occ", "n_docs")
    )


@_q(
    "scalar_fuzzy_match",
    """SELECT p_partkey, p_name, levenshtein(p_name, 'red widget') AS d
       FROM part WHERE levenshtein(p_name, 'red widget') <= 4""",
    "fuzzy string matching by edit distance (levenshtein — identical "
    "definition in both engines)",
)
def scalar_fuzzy_match(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    d = F.levenshtein("p_name", F.lit("red widget"))
    return p.select("p_partkey", "p_name", d.alias("d")).filter(d <= 4)


@_q(
    "scalar_url_functions",
    """WITH u AS (
    SELECT doc_id, lang,
           concat('https://', source, '.example.com/docs/',
                  cast(doc_id as varchar), '?lang=', lang) AS url
    FROM documents)
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
       split_part(regexp_extract(url, '^[a-z]+://([^/]+)', 1), '.', 1)
           AS subdomain
FROM u""",
    "URL parsing — the provenance-tracking step every crawl corpus "
    "needs (host-level dedup rates, per-domain mixing, robots "
    "compliance): Spark's parse_url extracts HOST/PATH/QUERY natively; "
    "DuckDB has no parse_url, so the oracle states the identical "
    "extraction as anchored regexes — both engines agree value-exact "
    "on the same synthesized URLs.",
)
def scalar_url_functions(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.split_part(
            F.parse_url("url", F.lit("HOST")), F.lit("."), F.lit(1)
        ).alias("subdomain"),
    )


@_q(
    "sample_systematic",
    f"""SELECT o_orderkey, o_custkey FROM orders
        WHERE {{h}} % 100 < 5""".format(
        h="cast(concat('0x', substr(md5(cast(o_orderkey as varchar)), 1, 12)) as bigint)"
    ),
    "deterministic 5% sample via content hashing — reproducible across "
    "engines, runs, and partitionings (rand()-based sampling is none of "
    "those); the correct way to carve stable dev subsets from 100 TB",
)
def sample_systematic(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    h = F.expr(
        "cast(conv(substr(md5(cast(o_orderkey as string)), 1, 12), 16, 10) as bigint)"
    )
    return o.filter((h % 100) < 5).select("o_orderkey", "o_custkey")


@_q(
    "sample_stratified",
    """WITH rates AS (
           SELECT * FROM (VALUES ('en', 60), ('zh', 30), ('es', 30),
                                 ('de', 30), ('fr', 30)) AS t(lang, pct))
       SELECT d.doc_id, d.lang, d.source
       FROM documents d JOIN rates r ON d.lang = r.lang
       WHERE cast(concat('0x', substr(md5(cast(d.doc_id as varchar)), 1, 12))
                  as bigint) % 100 < r.pct""",
    "stratified sampling with per-stratum rates (the language-rebalancing "
    "step of a corpus mix: keep 60% of en, 30% of the rest) — the rate "
    "table broadcasts, the keep/drop decision is content-hash arithmetic "
    "on doc_id, so the sample is reproducible across engines, runs, and "
    "partition layouts, and each stratum's realized rate concentrates at "
    "its target (checked in test_curation.py). rand()-stratified "
    "sampleBy() has none of those guarantees at 100 TB.",
)
def sample_stratified(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    rates = _local_df(
        spark,
        [("en", 60), ("zh", 30), ("es", 30), ("de", 30), ("fr", 30)],
        "lang string, pct int",
    )
    h = F.expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint)")
    return (
        d.join(F.broadcast(rates), "lang")
        .filter((h % 100) < F.col("pct"))
        .select("doc_id", "lang", "source")
    )


@_q(
    "join_asof",
    """WITH r1 AS (
    SELECT o_custkey, epoch_us(o_orderdate) AS t, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
),
r2 AS (SELECT o_custkey, t, o_orderkey, o_totalprice FROM r1 WHERE rn = 1),
l AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events)
SELECT l.event_id, l.user_id, r2.o_orderkey AS last_orderkey,
       r2.o_totalprice AS last_totalprice
FROM l ASOF LEFT JOIN r2 ON l.user_id = r2.o_custkey AND l.t >= r2.t""",
    "as-of (point-in-time) join: each event picks up the user's latest "
    "order at event time — composed from union + window carry-forward "
    "(operators/asof.py); oracle is DuckDB's native ASOF JOIN",
)
def join_asof(spark, sf_dir):
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("o_t_us"),
        "o_orderkey",
        "o_totalprice",
    )
    out = asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="t_us",
        right_ts="o_t_us",
        value_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


# Freshness bound that SPLITS the corpus (staleness here spans ~8200-8900
# days — orders are 1990s dates, events are 2020 timestamps), so the
# oracle check exercises both kept and voided matches.
_ASOF_TOL_US = 8_400 * 86_400 * 1_000_000


@_q(
    "join_asof_tolerance",
    f"""WITH r1 AS (
    SELECT o_custkey, epoch_us(o_orderdate) AS t, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
),
r2 AS (SELECT o_custkey, t, o_orderkey, o_totalprice FROM r1 WHERE rn = 1),
l AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events)
SELECT l.event_id, l.user_id,
       CASE WHEN l.t - r2.t <= {_ASOF_TOL_US} THEN r2.o_orderkey END
           AS last_orderkey,
       CASE WHEN l.t - r2.t <= {_ASOF_TOL_US} THEN r2.o_totalprice END
           AS last_totalprice
FROM l ASOF LEFT JOIN r2 ON l.user_id = r2.o_custkey AND l.t >= r2.t""",
    "as-of join with a freshness tolerance: stale matches are voided "
    "(the feature-store staleness bound) — the matched timestamp rides "
    "the same single window pass, no extra shuffle",
)
def join_asof_tolerance(spark, sf_dir):
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("o_t_us"),
        "o_orderkey",
        "o_totalprice",
    )
    out = asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="t_us",
        right_ts="o_t_us",
        value_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
        tolerance=_ASOF_TOL_US,
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


@_q(
    "stream_interval_join",
    """WITH c AS (SELECT user_id, epoch_us(ts) AS t FROM events
                 WHERE event_type = 'click'),
p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, count(c.t) AS n_clicks_before
FROM p LEFT JOIN c
  ON p.user_id = c.user_id AND c.t > p.t - 3600000000 AND c.t <= p.t
GROUP BY p.event_id, p.user_id""",
    "event-time interval join: clicks within the hour before each "
    "purchase, per user — the batch twin of the stream-stream join "
    "(tests run the same join under readStream with watermarks)",
)
def stream_interval_join(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.expr("ts DIV 1000").alias("t")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("t").alias("c_t")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("t").alias("p_t")
    )
    hour_us = 3_600_000_000
    return (
        p.join(
            c,
            (p["user_id"] == c["c_user"])
            & (c["c_t"] > p["p_t"] - hour_us)
            & (c["c_t"] <= p["p_t"]),
            "left",
        )
        .groupBy("event_id", "user_id")
        .agg(F.count("c_t").alias("n_clicks_before"))
    )


@_q(
    "text_pack_sequences",
    f"""WITH chunks AS ({_CHUNK_ORACLE}),
ordered AS (
    SELECT doc_id, chunk_idx, n_tokens,
           sum(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
    FROM chunks
)
SELECT cast((cum_tokens - n_tokens) // 512 as bigint) AS pack_id,
       count(*) AS n_chunks,
       cast(sum(n_tokens) as bigint) AS pack_tokens
FROM ordered GROUP BY 1""",
    "sequence packing: chunks greedily packed into ~512-token training "
    "sequences via a running-sum window over a global (doc, chunk) order "
    "— the batch-shaping step between chunking and training",
)
def text_pack_sequences(spark, sf_dir):
    from .functions import chunking, packing

    chunks = chunking.chunk_documents_sql(_t(spark, sf_dir, "documents"))
    # Two-phase prefix sum (functions/packing.py): shard-parallel running
    # sums + broadcast shard offsets — bit-identical to the oracle's
    # global window because the shard key is monotone in doc_id.
    return packing.pack_chunks(chunks, seq_len=512)


@_q(
    "stream_user_profile",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
d AS (SELECT user_id, ts_us,
             ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS gap
      FROM e)
SELECT user_id, count(*) AS n_events, max(ts_us) AS last_ts_us,
       cast(count(*) FILTER (WHERE gap <= 60000000) as bigint) AS n_bursts
FROM d GROUP BY user_id""",
    "custom stateful operator (applyInPandasWithState in streaming; this "
    "is its batch twin via applyInPandas): per-user profile with burst "
    "detection — state a windowed aggregate cannot carry. Integer outputs "
    "only (the float running sum is checked batch≡stream in tests).",
)
def stream_user_profile(spark, sf_dir):
    from .streaming import stateful

    return stateful.profile_batch(_t(spark, sf_dir, "events")).select(
        "user_id", "n_events", "last_ts_us", "n_bursts"
    )


# =========================================================================
# End-to-end training-data pipeline (composition of checked stages)
# =========================================================================

def _pipeline_oracle() -> str:
    """Quality gate → canonical dedup → scrub → chunk → pack, as ONE SQL
    query composed from the same per-stage oracle fragments the
    individual queries use — both engines run the identical pipeline."""
    pairs = dedup.minhash_lsh_pairs_oracle()
    verdict_keep = (
        f"({text.ORACLE_EXPRS['n_tokens'][1]} >= 20 "
        f"AND {text.ORACLE_EXPRS['n_tokens'][1]} <= 1000 "
        f"AND {text.ORACLE_EXPRS['quality'][1]} > 0.3 "
        f"AND {text.ORACLE_EXPRS['lang_id'][1]} != 'und')"
    )
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach (node, root) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
),
clusters AS (SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node),
kept AS (
    SELECT d.doc_id,
           regexp_replace(
               regexp_replace(d.text, '[0-9]+', '<NUM>', 'g'),
               '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g') AS text
    FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
    WHERE c.cluster_id = d.doc_id AND {verdict_keep}
),
ktoks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), ' +'), t -> t != '') AS t
    FROM kept
),
knz AS (SELECT doc_id, t FROM ktoks WHERE len(t) > 0),
kidx AS (
    SELECT doc_id, t,
           unnest(generate_series(0,
               greatest(0, cast(ceil((len(t) - 40) / 30.0) as int)))) AS chunk_idx
    FROM knz
),
chunks AS (
    SELECT doc_id, chunk_idx,
           cast(len(t[(chunk_idx * 30 + 1):(chunk_idx * 30 + 40)]) as int) AS n_tokens
    FROM kidx
),
ordered AS (
    SELECT doc_id, chunk_idx, n_tokens,
           sum(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
    FROM chunks
)
SELECT cast((cum_tokens - n_tokens) // 512 as bigint) AS pack_id,
       count(*) AS n_chunks,
       cast(sum(n_tokens) as bigint) AS pack_tokens,
       cast(count(DISTINCT doc_id) as bigint) AS n_docs
FROM ordered GROUP BY 1
"""


@_q(
    "pipeline_training_data",
    _pipeline_oracle(),
    "the whole curation pipeline as ONE lazy DataFrame graph: quality "
    "gate → near-dup canonicalization (MinHash+LSH+connected components) "
    "→ PII scrub → chunking → sequence packing. Every stage is the same "
    "checked operator the standalone queries use; Catalyst plans the "
    "composition end to end.",
)
def pipeline_training_data(spark, sf_dir):
    from .functions import chunking

    docs = _t(spark, sf_dir, "documents")

    # stage 1+2: canonical representatives passing the quality gate
    # check_every=2: halve the per-round convergence count() jobs —
    # identical fixpoint, one fewer driver action per two rounds
    clusters = dedup.dedup_clusters(
        docs, dedup.minhash_lsh_pairs(docs), check_every=2
    )
    ntok = F.expr(text.ORACLE_EXPRS["n_tokens"][0])
    qual = F.expr(text.ORACLE_EXPRS["quality"][0])
    # Gate-equivalent rewrite of `lang_id != 'und'` (r15): the lang_id CASE
    # returns 'und' iff EVERY marker count is zero (each branch requires its
    # language's count > 0, and the argmax branch fires whenever any count is
    # positive — counts are non-negative). So the boolean gate reduces to
    # "padded text contains ANY marker": one rlike pass instead of the CASE's
    # ~50 un-CSE'd replace()+length() evaluations inside the pushed-down
    # filter (guide §1.2 per-task work; measured 1.52s -> 0.52s at sf0.1,
    # row-identical on the full corpus). Queries that need the VALUE of
    # lang_id (not just the gate) keep the full CASE.
    # the markers interpolate verbatim into a SQL string literal AND a
    # Java regex: pin that they stay plain lowercase-letters+spaces so
    # neither layer can reinterpret one (a quote/backslash/metachar
    # would silently change the gate the CASE-equivalence proof covers)
    import re as _re

    assert all(
        _re.fullmatch(r"[a-z ]+", m)
        for ms in text.LANG_MARKERS.values()
        for m in ms
    ), "LANG_MARKERS must be lowercase letters+spaces only"
    _any_marker = "|".join(
        "(?:%s)" % m for ms in text.LANG_MARKERS.values() for m in ms
    )
    lang_known = F.expr(
        f"concat(' ', lower(text), ' ') rlike '{_any_marker}'"
    )
    keep = (ntok >= 20) & (ntok <= 1000) & (qual > 0.3) & lang_known
    kept = (
        docs.join(clusters, "doc_id")
        .filter((F.col("cluster_id") == F.col("doc_id")) & keep)
        .select("doc_id", "text")
    )

    # stage 3: scrub
    scrubbed = kept.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", "[0-9]+", "<NUM>"),
            "[a-z0-9._%+-]+@[a-z0-9.-]+",
            "<EMAIL>",
        ).alias("text"),
    )

    # stage 4: chunk (JVM bulk path)
    chunks = chunking.chunk_documents_sql(scrubbed)

    # stage 5: pack — two-phase shard-parallel prefix sum (packing.py),
    # replacing the former global single-partition window.
    from .functions import packing

    return packing.pack_chunks(chunks, seq_len=512, with_doc_count=True)


# =========================================================================
# training-data curation: mixture sampling / splits / shuffle / quantization
#
# The post-dedup half of a corpus build: decide how much of each source
# or language enters the mix, carve held-out splits, fix a reproducible
# global order, and shrink embeddings for the retrieval index. All of it
# is deterministic content-hash arithmetic (md5 → int, identical in
# DuckDB), so every decision is reproducible run-to-run, engine-to-engine,
# and partition-layout-independent — the property rand()-based sampling
# cannot give at 100 TB.
# =========================================================================

# Engine-neutral 48-bit md5 prefix → bigint (same idiom as
# sample_systematic / functions/dedup.py).
def _spark_h48(expr: str) -> str:
    return f"cast(conv(substr(md5({expr}), 1, 12), 16, 10) as bigint)"


def _duck_h48(expr: str) -> str:
    return f"cast(concat('0x', substr(md5({expr}), 1, 12)) as bigint)"


# per-language admission rates out of 10000 (an "en-heavy with CJK
# downsampled" curation mix)
_MIX_RATE_CASE = (
    "CASE lang WHEN 'en' THEN 10000 WHEN 'de' THEN 5000 WHEN 'es' THEN 5000 "
    "WHEN 'fr' THEN 5000 WHEN 'zh' THEN 2500 ELSE 0 END"
)


@_q(
    "pipeline_dataset_mixture",
    f"""SELECT doc_id, lang, source FROM documents
        WHERE {_duck_h48("concat(cast(doc_id as varchar), ':mix')")} % 10000
              < {_MIX_RATE_CASE}""",
    "weighted dataset mixture: per-language admission rates applied via "
    "deterministic content hashing — the sampling decision for any doc is "
    "independent of partitioning and cluster size, so the same corpus "
    "always yields the same mix. Map-only (no shuffle at all).",
)
def pipeline_dataset_mixture(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    h = F.expr(_spark_h48("concat(cast(doc_id as string), ':mix')"))
    return d.filter((h % 10000) < F.expr(_MIX_RATE_CASE)).select(
        "doc_id", "lang", "source"
    )


@_q(
    "pipeline_train_val_split",
    f"""WITH tagged AS (
    SELECT lang, n_chars,
           CASE WHEN {_duck_h48("concat(cast(doc_id as varchar), ':split')")} % 100 < 5
                THEN 'val'
                WHEN {_duck_h48("concat(cast(doc_id as varchar), ':split')")} % 100 < 10
                THEN 'test' ELSE 'train' END AS split
    FROM documents)
SELECT split, lang, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS sum_chars
FROM tagged GROUP BY split, lang""",
    "deterministic train/val/test carve (90/5/5) by salted content hash: "
    "membership is a pure function of doc_id, so the split survives "
    "recomputation, repartitioning, and incremental corpus growth "
    "(a new doc never moves an old one between splits). One hash-agg "
    "shuffle on the tiny (split, lang) key space.",
)
def pipeline_train_val_split(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    h = F.expr(_spark_h48("concat(cast(doc_id as string), ':split')")) % 100
    split = (
        F.when(h < 5, F.lit("val")).when(h < 10, F.lit("test")).otherwise("train")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@_q(
    "pipeline_cluster_safe_split",
    dedup.clusters_cte_oracle(dedup.minhash_lsh_pairs_oracle())
    + f"""
, tagged AS (
    SELECT doc_id, cluster_id,
           CASE WHEN {_duck_h48("concat(cast(cluster_id as varchar), ':csplit')")}
                     % 100 < 5 THEN 'val'
                WHEN {_duck_h48("concat(cast(cluster_id as varchar), ':csplit')")}
                     % 100 < 10 THEN 'test' ELSE 'train' END AS split
    FROM clusters)
SELECT split, count(*) AS n_docs,
       count(DISTINCT cluster_id) AS n_clusters
FROM tagged GROUP BY split""",
    "near-dup-aware train/val/test carve: split membership hashes the "
    "CLUSTER id (MinHash-LSH pairs → connected components), not the doc "
    "id, so near-duplicates can never straddle splits — the standard "
    "leakage hole in naive per-doc splits (a val doc's near-copy in "
    "train). Deterministic: same corpus ⇒ same carve, independent of "
    "partitioning. Scale shape = dedup_clusters + one tiny hash-agg.",
)
def pipeline_cluster_safe_split(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d)
    clusters = dedup.dedup_clusters(d.select("doc_id"), pairs, check_every=2)
    h = F.expr(_spark_h48("concat(cast(cluster_id as string), ':csplit')")) % 100
    split = (
        F.when(h < 5, F.lit("val")).when(h < 10, F.lit("test")).otherwise("train")
    )
    return (
        clusters.select("cluster_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
    )


# temperature-rebalanced source mixture: admission rate per source
# r_s = min(1, T·N·√n_s / (Σ√n · n_s)) — the α=0.5 case of the standard
# multilingual temperature-sampling weights w_s ∝ n_s^α. √ is IEEE-exact
# on both engines; the Σ√n denominator folds in sorted source order so
# the double sum is bit-identical cross-engine.
_TEMP_TARGET = "cast(0.5 as double)"  # sample half the corpus overall


@_q(
    "pipeline_temperature_mixture",
    f"""WITH sq AS (
    SELECT source, count(*) AS n_src FROM documents GROUP BY source),
tot AS (
    SELECT cast(sum(n_src) as double) AS nn,
           list_reduce(list_prepend(cast(0 as double),
               list_transform(
                   list_sort(list(struct_pack(source := source,
                                              s := sqrt(cast(n_src as double))))),
                   x -> x.s)),
               (a, b) -> a + b) AS denom
    FROM sq),
rates AS (
    SELECT source, n_src,
           least(cast(1 as double),
                 {_TEMP_TARGET} * nn * sqrt(cast(n_src as double))
                     / denom / n_src) AS rate
    FROM sq CROSS JOIN tot),
adm AS (
    SELECT d.source AS source, count(*) AS n_admitted
    FROM documents d JOIN rates r USING (source)
    WHERE {_duck_h48("concat(cast(doc_id as varchar), ':temp')")} % 1000000
          < floor(r.rate * 1000000)
    GROUP BY d.source)
SELECT r.source, r.n_src, coalesce(a.n_admitted, 0) AS n_admitted,
       round(r.rate, 6) AS rate_r6
FROM rates r LEFT JOIN adm a USING (source)""",
    "temperature-rebalanced mixture (α=0.5): per-source admission rates "
    "∝ √n_s — big sources downsampled toward, small sources kept, the "
    "standard multilingual rebalancing. Rates derive from one tiny "
    "per-source aggregate (broadcast back); admission is the usual "
    "partitioning-independent content hash. The √-weight denominator "
    "folds in sorted source order so the IEEE double sum is identical "
    "cross-engine.",
)
def pipeline_temperature_mixture(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sq = d.groupBy("source").agg(F.count("*").alias("n_src"))
    tot = sq.agg(
        F.sum("n_src").cast("double").alias("nn"),
        F.expr(
            "aggregate(array_sort(collect_list(named_struct("
            "'source', source, 's', sqrt(cast(n_src as double))))), "
            "cast(0 as double), (acc, x) -> acc + x.s)"
        ).alias("denom"),
    )
    rates = sq.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_src",
        F.expr(
            f"least(cast(1 as double), "
            f"{_TEMP_TARGET} * nn * sqrt(cast(n_src as double)) / denom / n_src)"
        ).alias("rate"),
    )
    h = F.expr(_spark_h48("concat(cast(doc_id as string), ':temp')"))
    adm = (
        d.join(F.broadcast(rates), "source")
        .filter((h % 1000000) < F.floor(F.col("rate") * 1000000))
        .groupBy("source")
        .agg(F.count("*").alias("n_admitted"))
    )
    return (
        # both sides are per-source aggregates (≤ source-cardinality rows);
        # broadcast the admitted counts so the fuse join never shuffles
        rates.join(F.broadcast(adm), "source", "left")
        .select(
            "source",
            "n_src",
            F.coalesce("n_admitted", F.lit(0)).alias("n_admitted"),
            F.round("rate", 6).alias("rate_r6"),
        )
    )


_SHUFFLE_SHARDS = 32


@_q(
    "pipeline_global_shuffle",
    f"""WITH h AS (
    SELECT doc_id,
           {_duck_h48("concat(cast(doc_id as varchar), ':shuf')")} AS hkey
    FROM documents)
SELECT doc_id, cast(hkey % {_SHUFFLE_SHARDS} as bigint) AS shard,
       cast(row_number() OVER (PARTITION BY hkey % {_SHUFFLE_SHARDS}
                               ORDER BY hkey, doc_id) as bigint) AS pos
FROM h""",
    "reproducible global shuffle for training order: salted hash → shard, "
    "rank within shard. Consumers read shards round-robin for an "
    "epoch-stable pseudo-random order. The window is PARTITIONED by "
    "shard (no global sort); shard count is a parameter — at 100 TB set "
    "it ≫ executor count (e.g. 64k) so each per-shard sort fits an "
    "executor, exactly the two-phase layout sequence packing uses.",
)
def pipeline_global_shuffle(spark, sf_dir):
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    hkey = F.expr(_spark_h48("concat(cast(doc_id as string), ':shuf')"))
    t = d.select("doc_id", hkey.alias("hkey"))
    shard = F.col("hkey") % _SHUFFLE_SHARDS
    w = Window.partitionBy(shard).orderBy("hkey", "doc_id")
    return t.select(
        "doc_id",
        shard.cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@_q(
    "emb_quantize_int8",
    """WITH b AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(x))) AS m
    FROM embeddings),
q AS (
    -- CAST(... AS DOUBLE): DuckDB types bare 127.0/0.5 as DECIMAL and
    -- DECIMAL·FLOAT as FLOAT; Spark computes in DOUBLE — force DOUBLE so
    -- both engines run the identical IEEE arithmetic.
    SELECT vec_id, m,
           list_transform(embedding,
                          x -> cast(floor(x * (cast(127 as double) / m)
                                          + cast(0.5 as double)) as int)) AS qv
    FROM b WHERE m > 0)
SELECT vec_id, cast(len(qv) as int) AS n_dims,
       cast(list_min(qv) as int) AS q_min, cast(list_max(qv) as int) AS q_max,
       cast(list_sum(qv) as bigint) AS q_sum,
       round(cast(127 as double) / m, 6) AS scale_r6
FROM q""",
    "symmetric int8 quantization of the embedding column (the 4× memory "
    "cut for a retrieval index): per-vector max-abs scale, "
    "floor(x·scale+0.5) rounding — pure IEEE double arithmetic, "
    "bit-identical in DuckDB. Map-only; the checked output is the "
    "quantized vectors' exact integer stats.",
)
def emb_quantize_int8(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        "embedding",
        F.array_max(F.expr("transform(embedding, x -> abs(x))")).alias("m"),
    ).filter(F.col("m") > 0)
    q = b.select(
        "vec_id",
        "m",
        F.expr(
            "transform(embedding, x -> cast(floor(x * (127.0d / m) + 0.5d) as int))"
        ).alias("qv"),
    )
    return q.select(
        "vec_id",
        F.size("qv").cast("int").alias("n_dims"),
        F.array_min("qv").cast("int").alias("q_min"),
        F.array_max("qv").cast("int").alias("q_max"),
        F.expr("aggregate(qv, 0L, (a, x) -> a + x)").alias("q_sum"),
        F.round(F.lit(127.0) / F.col("m"), 6).alias("scale_r6"),
    )


@_q(
    "pipeline_source_quota",
    """WITH ranked AS (
    SELECT source, doc_id, n_chars,
           row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS admit_rank
    FROM documents)
SELECT source, doc_id, n_chars, cast(admit_rank as bigint) AS admit_rank
FROM ranked WHERE admit_rank <= 10""",
    "per-source admission quota (cap each source at its first 10 docs) — "
    "the batch twin of the transformWithState streaming quota operator "
    "(streaming/quota.py: Spark 4 arbitrary-state API, one counter per "
    "source in the state store, admits in arrival order); the live form "
    "of corpus mixture budget enforcement. Streaming ≡ batch is pinned "
    "across real micro-batches in test_streaming.py. Here: one "
    "hash-partitioned window per source, no global sort.",
)
def pipeline_source_quota(spark, sf_dir):
    from .streaming.quota import quota_batch

    return quota_batch(_t(spark, sf_dir, "documents"), cap=10)


@_q(
    "pipeline_length_histogram",
    """WITH t AS (
    SELECT cast(len(string_split(text, ' ')) // 32 as bigint) AS bucket
    FROM documents)
SELECT bucket * 32 AS tokens_lo, count(*) AS n_docs
FROM t GROUP BY bucket""",
    "token-length histogram (32-token buckets) — the planning input for "
    "sequence packing and truncation budgets; one tiny hash-agg",
)
def pipeline_length_histogram(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    bucket = F.expr("cast(size(split(text, ' ')) DIV 32 as bigint)")
    return (
        d.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .select((F.col("bucket") * 32).alias("tokens_lo"), "n_docs")
    )


# Decontamination gram width. Real pipelines use 13-gram exact match
# (vs ~50-token benchmark answers); the driver corpus averages ~54 tokens
# per doc, so 8 keeps the test meaningful at the same algorithmic shape.
_DECON_N = 8

_DUCK_SPLIT_H = "cast(concat('0x', substr(md5(concat(cast(doc_id as varchar), ':split')), 1, 12)) as bigint) % 100"
_SPARK_SPLIT_H = "cast(conv(substr(md5(concat(cast(doc_id as string), ':split')), 1, 12), 16, 10) as bigint) % 100"


# gram constructors via slice+join (ONE function call per gram instead of
# N element_at's — keeps whole-stage codegen compile time flat in N)
_DUCK_GRAMS = (
    f"list_distinct(list_transform("
    f"generate_series(1, greatest(len(w) - {_DECON_N - 1}, 0)), "
    f"i -> array_to_string(w[i:i+{_DECON_N - 1}], ' ')))"
)
_SPARK_GRAMS = (
    f"array_distinct(case when size(w) < {_DECON_N} then array() else "
    f"transform(sequence(1, size(w) - {_DECON_N - 1}), "
    f"i -> array_join(slice(w, i, {_DECON_N}), ' ')) end)"
)


@_q(
    "pipeline_decontaminate",
    f"""WITH toks AS (
    SELECT doc_id, {_DUCK_SPLIT_H} AS hs, {hashing.duck_tokens("text")} AS w
    FROM documents),
grams AS (SELECT doc_id, hs, unnest({_DUCK_GRAMS}) AS g FROM toks),
train AS (SELECT doc_id, g FROM grams WHERE hs >= 10),
held  AS (SELECT doc_id AS held_doc, g FROM grams WHERE hs < 10)
SELECT train.doc_id,
       count(DISTINCT train.g) AS n_shared_grams,
       count(DISTINCT held.held_doc) AS n_held_docs
FROM train JOIN held ON train.g = held.g
GROUP BY train.doc_id""",
    "benchmark decontamination: flag training docs sharing any exact "
    f"{_DECON_N}-gram with the held-out split (the same salted-hash split "
    "pipeline_train_val_split carves). Inverted-index equi-join on the "
    "gram — work is proportional to actual overlap, never |train|×|held|; "
    "the gram-keyed shuffle is the same skew-safe shape as the n-gram "
    "Jaccard dedup. Real pipelines use 13-grams; width is a parameter.",
)
def pipeline_decontaminate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.expr(_SPARK_SPLIT_H).alias("hs"),
        F.expr(hashing.spark_tokens("text")).alias("w"),
    ).select("doc_id", "hs", F.explode(F.expr(_SPARK_GRAMS)).alias("g"))
    train = grams.filter(F.col("hs") >= 10).select("doc_id", "g")
    held = grams.filter(F.col("hs") < 10).select(
        F.col("doc_id").alias("held_doc"), "g"
    )
    return (
        train.join(held, "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shared_grams"),
            F.countDistinct("held_doc").alias("n_held_docs"),
        )
    )


# fastText-style linear domain classifier: token weights in milli-units
# (integers ⇒ order-independent exact sums in any engine; the sigmoid and
# its rounding are the only float steps)
_DOMAIN_W = [
    ("vector", 240), ("hash", 180), ("merge", 150), ("batch", 120),
    ("stream", 110), ("window", 90), ("fast", 60),
    ("slow", -170), ("small", -90), ("line", -60), ("the", -40), ("a", -30),
]
_DOMAIN_W_SQL = ", ".join(f"('{w}', {v})" for w, v in _DOMAIN_W)
_DOMAIN_W_MAP = ", ".join(f"'{w}', {v}L" for w, v in _DOMAIN_W)


@_q(
    "text_domain_score",
    f"""WITH t AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
    FROM documents),
wt AS (SELECT * FROM (VALUES {_DOMAIN_W_SQL}) AS v(w, milli))
SELECT t.doc_id, cast(coalesce(sum(wt.milli), 0) as bigint) AS score_milli,
       round(1.0 / (1.0 + exp(-coalesce(sum(wt.milli), 0) / 1000.0)), 6)
           AS prob_r6
FROM t LEFT JOIN wt ON t.w = wt.w
GROUP BY t.doc_id""",
    "linear domain/quality classifier applied corpus-wide (the fastText-"
    "classifier pattern every corpus pipeline runs): per-token integer "
    "milli-weights fold over the token array INSIDE the row — a map "
    "literal + aggregate() lambda, pure whole-stage codegen, zero "
    "shuffle, zero Python — then a sigmoid. The oracle computes the same "
    "model relationally (unnest + weight join); integer weights make the "
    "sum order-independent, so both engines agree exactly. Swapping the "
    "hand votes for trained weights changes one literal, not the plan.",
)
def text_domain_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    score = F.expr(
        f"aggregate(transform(split(lower(text), ' '), "
        f"w -> coalesce(element_at(map({_DOMAIN_W_MAP}), w), 0L)), "
        f"0L, (acc, v) -> acc + v)"
    )
    scored = d.select("doc_id", score.alias("score_milli"))
    return scored.withColumn(
        "prob_r6",
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score_milli") / F.lit(1000.0))),
            6,
        ),
    )


@_q(
    "pipeline_semantic_decontaminate",
    """WITH n AS (
    SELECT vec_id, embedding,
           list_reduce(list_prepend(cast(0 as double),
               list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
               (a, b) -> a + b) AS n2
    FROM embeddings),
scored AS (
    SELECT t.vec_id, h.vec_id AS held_id,
           list_reduce(list_prepend(cast(0 as double),
               list_transform(list_zip(t.embedding, h.embedding),
                   p -> p[1]::DOUBLE * p[2]::DOUBLE)), (a, b) -> a + b)
             / (sqrt(t.n2) * sqrt(h.n2)) AS cos
    FROM n t JOIN n h ON t.vec_id % 10 != 0 AND h.vec_id % 10 = 0)
SELECT vec_id, count(*) AS n_held_hits, round(max(cos), 6) AS max_cos_r6
FROM scored WHERE cos >= 0.45 GROUP BY vec_id""",
    "SEMANTIC decontamination: flag training vectors whose embedding is "
    "near-duplicate (cos ≥ 0.45, the corpus near-dup threshold) of any "
    "held-out benchmark vector — catches paraphrased leakage the exact "
    "n-gram path (pipeline_decontaminate) cannot see. Plan: the held "
    "split is tiny by construction (benchmarks vs a 100 TB corpus), so "
    "it BROADCASTS against the train scan — one map-side pass, no "
    "shuffle of the corpus; the cosine is the same left-fold expression "
    "both engines evaluate bit-identically. For held sets too big to "
    "broadcast, dedup_embedding_lsh's bucketed join is the drop-in.",
)
def pipeline_semantic_decontaminate(spark, sf_dir):
    from .functions.similarity import _SPARK_DOT_QC, _SPARK_NORM2

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.expr(_SPARK_NORM2).alias("n2")
    )
    train = e.filter(F.col("vec_id") % 10 != 0).alias("q")
    held = e.filter(F.col("vec_id") % 10 == 0).alias("c")
    cos = F.expr(_SPARK_DOT_QC) / (F.sqrt(F.col("q.n2")) * F.sqrt(F.col("c.n2")))
    scored = train.join(F.broadcast(held), how="cross").select(
        F.col("q.vec_id").alias("vec_id"), cos.alias("cos")
    )
    return (
        scored.filter(F.col("cos") >= 0.45)
        .groupBy("vec_id")
        .agg(
            F.count("*").alias("n_held_hits"),
            F.round(F.max("cos"), 6).alias("max_cos_r6"),
        )
    )


@_q(
    "text_pii_stats",
    """SELECT doc_id,
       cast(len(regexp_extract_all(lower(text), '[a-z0-9._%+-]+@[a-z0-9.-]+')) as bigint)
           AS n_emails,
       cast(len(regexp_extract_all(text, '[0-9]+')) as bigint) AS n_numbers,
       cast(len(regexp_extract_all(text, '[0-9]{7,}')) as bigint) AS n_long_digit_runs
FROM documents""",
    "PII exposure profile per document (emails / digit runs / long "
    "phone-or-id-like runs) — the detection side of the scrub step "
    "(text_scrub), so a pipeline can gate or route docs before rewriting "
    "them. Map-only JVM regexes.",
)
def text_pii_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            "cast(size(regexp_extract_all(lower(text), '[a-z0-9._%+-]+@[a-z0-9.-]+', 0)) as bigint)"
        ).alias("n_emails"),
        F.expr("cast(size(regexp_extract_all(text, '[0-9]+', 0)) as bigint)").alias(
            "n_numbers"
        ),
        F.expr(
            "cast(size(regexp_extract_all(text, '[0-9]{7,}', 0)) as bigint)"
        ).alias("n_long_digit_runs"),
    )


@_q(
    "text_repetition",
    """WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
    FROM documents),
u AS (SELECT doc_id, generate_subscripts(w, 1) AS i, w FROM toks WHERE len(w) >= 2),
bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b FROM u WHERE i + 1 <= len(w)),
c AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b)
SELECT doc_id,
       round(cast(max(n) as double) / cast(sum(n) as double), 6)
           AS top_bigram_frac,
       cast(sum(n) as bigint) AS n_bigrams
FROM c GROUP BY doc_id""",
    "Gopher-style repetition signal: fraction of all word bigrams taken "
    "by the single most frequent bigram — high values mark looping/"
    "boilerplate text that poisons training. explode → two hash-aggs on "
    "(doc, bigram) then doc; both keys are high-cardinality and skew-free.",
)
def text_repetition(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    w = hashing.spark_tokens("text")
    bigrams = (
        f"transform(sequence(1, size({w}) - 1), "
        f"i -> concat_ws(' ', element_at({w}, i), element_at({w}, i + 1)))"
    )
    bg = d.filter(F.expr(f"size({w}) >= 2")).select(
        "doc_id", F.explode(F.expr(bigrams)).alias("b")
    )
    counts = bg.groupBy("doc_id", "b").agg(F.count("*").alias("n"))
    return counts.groupBy("doc_id").agg(
        F.round(
            F.max("n").cast("double") / F.sum("n").cast("double"), 6
        ).alias("top_bigram_frac"),
        F.sum("n").cast("bigint").alias("n_bigrams"),
    )


@_q(
    "emb_knn_label_transfer",
    """WITH n AS (
    SELECT vec_id, label, embedding,
           list_reduce(list_prepend(cast(0 as double),
               list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
               (a, b) -> a + b) AS n2
    FROM embeddings),
scored AS (
    SELECT q.vec_id AS query_id, c.label AS neighbor_label,
           list_reduce(list_prepend(cast(0 as double),
               list_transform(list_zip(q.embedding, c.embedding),
                   p -> p[1]::DOUBLE * p[2]::DOUBLE)), (a, b) -> a + b)
             / (sqrt(q.n2) * sqrt(c.n2)) AS cos,
           c.vec_id AS neighbor_id
    FROM n q JOIN n c ON q.vec_id % 10 = 0 AND c.vec_id % 10 != 0),
top5 AS (
    SELECT query_id, neighbor_label FROM (
        SELECT query_id, neighbor_label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored) WHERE rnk <= 5),
votes AS (
    SELECT query_id, neighbor_label, count(*) AS n_votes
    FROM top5 GROUP BY query_id, neighbor_label)
SELECT query_id, neighbor_label AS predicted_label,
       cast(n_votes as bigint) AS n_votes
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY n_votes DESC, neighbor_label) AS vr
      FROM votes) WHERE vr = 1""",
    "exact kNN label transfer: every 'unlabeled' vector (vec_id%10=0 — "
    "a fresh batch to auto-label) takes the majority label of its 5 "
    "nearest labeled neighbors by cosine, ties broken toward the "
    "smaller label. Plan: the small unlabeled batch BROADCASTS against "
    "the labeled corpus scan (the label-transfer direction at 100 TB), "
    "per-query rank via WindowGroupLimit, majority vote as a second "
    "tiny window. Deterministic and value-exact vs the oracle.",
)
def emb_knn_label_transfer(spark, sf_dir):
    from .functions.similarity import _SPARK_DOT_QC, _SPARK_NORM2

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding", F.expr(_SPARK_NORM2).alias("n2")
    )
    q = e.filter(F.col("vec_id") % 10 == 0).alias("q")
    c = e.filter(F.col("vec_id") % 10 != 0).alias("c")
    cos = F.expr(_SPARK_DOT_QC) / (F.sqrt(F.col("q.n2")) * F.sqrt(F.col("c.n2")))
    scored = F.broadcast(q).join(c, how="cross").select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.label").alias("neighbor_label"),
        cos.alias("cos"),
        F.col("c.vec_id").alias("neighbor_id"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    top5 = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_label")
    )
    votes = top5.groupBy("query_id", "neighbor_label").agg(
        F.count("*").alias("n_votes")
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), "neighbor_label"
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("neighbor_label").alias("predicted_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
        )
    )


@_q(
    "dedup_embedding_clusters",
    f"""WITH RECURSIVE pairs AS ({dedup.embedding_neardup_pairs_oracle()}),
edges AS (
    SELECT vec_a AS src, vec_b AS dst FROM pairs
    UNION ALL SELECT vec_b, vec_a FROM pairs
),
reach (node, root) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS vec_id, min(root) AS cluster_id FROM reach GROUP BY node""",
    "embedding near-dup CANONICALIZATION: cosine pair graph → connected "
    "components → vec_id→cluster_id map (min member id), the same "
    "endgame the text dedup path has (dedup_clusters) applied to the "
    "vector modality — semantic duplicate groups collapse to one "
    "representative. Same hybrid CC engine (driver union-find under the "
    "threshold, distributed propagation above); oracle is the "
    "recursive-CTE reachability fixpoint.",
)
def dedup_embedding_clusters(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_neardup_pairs(e).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    ids = e.select(F.col("vec_id").alias("doc_id"))
    return dedup.dedup_clusters(ids, pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


@_q(
    "emb_pca_project",
    """SELECT CAST(count(*) AS BIGINT) AS n_vecs, 64 AS dim, 2 AS k,
       TRUE AS orthonormal, TRUE AS sign_fixed, TRUE AS eig_descending,
       TRUE AS explained_ok, TRUE AS recon_ok
FROM embeddings""",
    "distributed PCA (functions/pca.py): per-partition BLAS Gram/mean "
    "partials (one corpus pass, map-side only), driver-ordered partial "
    "sums (bit-deterministic under any task scheduling), d×d eigensolve "
    "on the driver, then a pure-JVM zip_with projection of every vector "
    "onto the top-2 components. r11: restated from rows-only to a "
    "hash-checked CONTRACT row (the agg_approx_cd_bounded pattern) — an "
    "eigensolve has no DuckDB twin, but its defining properties are "
    "deterministic booleans given the data: component orthonormality, "
    "the fixed sign/order convention, per-component explained variance "
    "≡ eigenvalue (measured by running the real projection over every "
    "corpus vector DISTRIBUTED, not from the model), and Parseval "
    "reconstruction error ≡ trace(cov) − Σλ. A broken Gram aggregate, "
    "dropped centering, or garbled component literal flips a flag and "
    "hash-breaks. Raw per-vector projections remain via pca_project(), "
    "numpy-pinned in tests/test_scale_ops.py.",
)
def emb_pca_project(spark, sf_dir):
    from .functions.pca import pca_contract

    return pca_contract(_t(spark, sf_dir, "embeddings"), dim=64, k=2)


@_q(
    "emb_norm_histogram",
    """WITH n AS (
    SELECT vec_id, label,
           sqrt(list_reduce(list_prepend(cast(0 as double),
               list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)),
               (a, b) -> a + b)) AS nrm,
           len(embedding) AS dim
    FROM embeddings)
SELECT cast(floor(nrm) as bigint) AS norm_bucket,
       count(*) AS n_vecs,
       cast(min(dim) as int) AS min_dim, cast(max(dim) as int) AS max_dim,
       count(DISTINCT label) AS n_labels
FROM n GROUP BY 1""",
    "embedding-column profiling: L2-norm histogram (integer buckets — "
    "counts are exact, so no parallel-sum drift), dimension bounds, and "
    "label cardinality per bucket. The sanity scan a vector corpus needs "
    "before indexing (zero/degenerate norms break cosine; mixed dims "
    "break everything). One map + one tiny hash-agg; norm arithmetic is "
    "the same fixed-order fold every similarity op uses.",
)
def emb_norm_histogram(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    from .functions.similarity import _SPARK_NORM2

    n = e.select(
        "label",
        F.sqrt(F.expr(_SPARK_NORM2)).alias("nrm"),
        F.size("embedding").alias("dim"),
    )
    return n.groupBy(
        F.floor("nrm").cast("bigint").alias("norm_bucket")
    ).agg(
        F.count("*").alias("n_vecs"),
        F.min("dim").cast("int").alias("min_dim"),
        F.max("dim").cast("int").alias("max_dim"),
        F.countDistinct("label").alias("n_labels"),
    )


@_q(
    "catalog_profile_documents",
    """SELECT count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       cast(min(n_chars) as bigint) AS min_chars,
       cast(max(n_chars) as bigint) AS max_chars,
       round(avg(cast(n_chars as double)), 6) AS avg_chars,
       round(quantile_cont(cast(n_chars as double), 0.5), 6) AS p50_chars,
       round(quantile_cont(cast(n_chars as double), 0.9), 6) AS p90_chars
FROM documents""",
    "text-corpus profile: language/source cardinalities + exact length "
    "quantiles (linear interpolation, identical in DuckDB). At 100 TB "
    "swap the exact percentile for approx_percentile — same plan shape, "
    "bounded memory.",
)
def catalog_profile_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    ch = F.col("n_chars").cast("double")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.round(F.avg(ch), 6).alias("avg_chars"),
        F.round(F.percentile(ch, F.lit(0.5)), 6).alias("p50_chars"),
        F.round(F.percentile(ch, F.lit(0.9)), 6).alias("p90_chars"),
    )


@_q(
    "agg_native_pivot",
    """SELECT c_mktsegment,
       cast(sum(cast(o_totalprice as decimal(18,2)))
            FILTER (WHERE o_orderpriority = '1-URGENT') as double) AS sum_urgent,
       cast(sum(cast(o_totalprice as decimal(18,2)))
            FILTER (WHERE o_orderpriority = '2-HIGH') as double) AS sum_high,
       cast(sum(cast(o_totalprice as decimal(18,2)))
            FILTER (WHERE o_orderpriority = '3-MEDIUM') as double) AS sum_medium
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment""",
    "the native DataFrame pivot() API with an EXPLICIT value list — "
    "without one Spark runs an extra distinct-scan job to discover pivot "
    "columns, the thing you never want against 100 TB. Money sums go "
    "through DECIMAL for order-independent exactness.",
)
def agg_native_pivot(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c["c_custkey"] == o["o_custkey"])
    p = (
        j.groupBy("c_mktsegment")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
    )
    return p.select(
        "c_mktsegment",
        F.col("`1-URGENT`").cast("double").alias("sum_urgent"),
        F.col("`2-HIGH`").cast("double").alias("sum_high"),
        F.col("`3-MEDIUM`").cast("double").alias("sum_medium"),
    )


_HYBRID_TOKENS = ("scan", "customer", "stream")


@_q(
    "sim_hybrid_rrf",
    similarity.hybrid_rrf_oracle(_HYBRID_TOKENS),
    "hybrid retrieval: keyword IDF ranking fused with vector cosine "
    "ranking by reciprocal-rank fusion (the two-retriever RAG shape). "
    "Each modality keeps its top-50 via WindowGroupLimit, then a full "
    "outer join on the doc id fuses; ranks are deterministic so the "
    "fused list is value-exact cross-engine.",
)
def sim_hybrid_rrf(spark, sf_dir):
    return similarity.hybrid_rrf(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        _HYBRID_TOKENS,
    )


@_q(
    "mm_payload_dedup",
    """SELECT md5(text) AS content_md5, count(*) AS n_copies,
       min(doc_id) AS keeper_doc,
       cast(max(octet_length(encode(text))) as bigint) AS n_bytes
FROM documents GROUP BY md5(text)""",
    "exact dedup over the OPAQUE BINARY payload (the image/audio/video "
    "byte-identical dup story): md5 of the blob is the shuffle key — "
    "fixed-width, uniformly distributed, and computed without decoding. "
    "Same hash-agg shape as dedup_exact_hash, lifted to the multimodal "
    "contract (metadata struct rides along untouched). Emits every "
    "content group (keeper + copy count); add HAVING n_copies > 1 to "
    "list only dup groups.",
)
def mm_payload_dedup(spark, sf_dir):
    d = multimodal.attach_binary_payload(_t(spark, sf_dir, "documents"))
    return (
        d.groupBy(F.md5("payload").alias("content_md5"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc"),
            F.max(F.length("payload")).cast("bigint").alias("n_bytes"),
        )
    )


@_q(
    "agg_unpivot",
    """WITH long AS (
    SELECT 'l_extendedprice' AS component, l_extendedprice AS value FROM lineitem
    UNION ALL SELECT 'l_discount', l_discount FROM lineitem
    UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
SELECT component, cast(sum(cast(value as decimal(18,6))) as double) AS total,
       count(*) AS n
FROM long GROUP BY component""",
    "unpivot/melt via the native DataFrame unpivot() API — wide charge "
    "components to long (component, value) rows, then one hash-agg. "
    "Spark plans this as a Generate (Expand) projection: no join, no "
    "extra scan per component, unlike the oracle's 3-scan UNION ALL "
    "spelling of the same relation.",
)
def agg_unpivot(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "component",
        "value",
    )
    return long.groupBy("component").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
        F.count("*").alias("n"),
    )


@_q(
    "emb_label_centroids",
    """WITH u AS (
    SELECT label, generate_subscripts(embedding, 1) AS pos, embedding AS v
    FROM embeddings),
x AS (SELECT label, pos,
             cast(round(cast(v[pos] as double), 7) as decimal(18,7)) AS val
      FROM u)
SELECT label, cast(pos as int) AS pos,
       round(cast(sum(val) as double) / count(*), 6) AS centroid_r6,
       count(*) AS n_vecs
FROM x GROUP BY label, pos""",
    "distributed mean-pooling: per-label centroid of the embedding "
    "column via posexplode → one hash-agg on (label, dim). Elements are "
    "rounded then accumulated in DECIMAL fixed-point, so the sum is "
    "order/partitioning-independent and engine-exact — the same "
    "money-sum discipline applied to vector math. This is the building "
    "block of semantic-cluster summaries and class prototypes.",
)
def emb_label_centroids(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    x = e.select(
        "label", F.posexplode("embedding").alias("pos0", "xval")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.expr("cast(round(cast(xval as double), 7) as decimal(18,7))").alias("val"),
    )
    return x.groupBy("label", "pos").agg(
        F.round(F.sum("val").cast("double") / F.count("*"), 6).alias("centroid_r6"),
        F.count("*").alias("n_vecs"),
    )


@_q(
    "stream_window_topk",
    """WITH c AS (
    SELECT epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS window_start_ns,
           event_type, count(*) AS n
    FROM events GROUP BY window_start_ns, event_type)
SELECT window_start_ns, event_type, n FROM (
    SELECT window_start_ns, event_type, n,
           row_number() OVER (PARTITION BY window_start_ns
                              ORDER BY n DESC, event_type) AS rn
    FROM c) t
WHERE rn = 1""",
    "top event type per tumbling hour: windowed count then rank-1 within "
    "each window — trending-item analytics. The rank window partitions "
    "by the hour bucket (high cardinality over time, never global); "
    "under Structured Streaming the count is the incremental state and "
    "the rank runs on the emitted window rows.",
)
def stream_window_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    c = (
        e.groupBy(
            F.expr("ts - ts % 3600000000000").alias("window_start_ns"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("window_start_ns").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("window_start_ns", "event_type", "n")
    )


_DAY_NS = 86_400_000_000_000


@_q(
    "stream_retention_cohorts",
    f"""WITH d AS (
    SELECT DISTINCT user_id, epoch_ns(ts) // {_DAY_NS} AS day
    FROM events),
u AS (SELECT user_id, day,
             min(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM d)
SELECT cohort_day, day - cohort_day AS day_offset,
       count(*) AS n_users
FROM u GROUP BY cohort_day, day_offset""",
    "retention cohort matrix: users bucketed by first-seen day, counted "
    "per active-day offset — the classic product-analytics rollup. Day "
    "index is exact int64 nanosecond arithmetic; the window partitions "
    "by user (no global sort) and the final agg keys on the tiny "
    "(cohort, offset) grid.",
)
def stream_retention_cohorts(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    # integer DIV, not `/`: epoch-ns exceeds double's 2^53 exact range
    d = e.select("user_id", F.expr(f"ts DIV {_DAY_NS}").alias("day")).distinct()
    w = Window.partitionBy("user_id")
    u = d.select("user_id", "day", F.min("day").over(w).alias("cohort_day"))
    return (
        u.groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count("*").alias("n_users"))
    )


# 15 < the 25 docs/source in the sf0.01 gate data, so the cap
# genuinely drops rows in every checked run
_CAP_PER_SOURCE = 15


@_q(
    "pipeline_domain_cap",
    f"""WITH ranked AS (
    SELECT doc_id, source, lang,
           row_number() OVER (
               PARTITION BY source
               ORDER BY {_duck_h48("concat(cast(doc_id as varchar), ':cap')")},
                        doc_id) AS rk
    FROM documents)
SELECT doc_id, source, lang, cast(rk as int) AS rk
FROM ranked WHERE rk <= {_CAP_PER_SOURCE}""",
    "per-source contribution cap (C4/RefinedWeb-style curation): keep at "
    "most K docs per source, chosen by deterministic salted-hash rank so "
    "the retained subset is a pure function of content — the same corpus "
    "always keeps the same docs regardless of partitioning. One shuffle "
    "on the source key; row_number<=K triggers Catalyst's WindowGroupLimit "
    "so each map task forwards only its partial top-K per source, never "
    "the full per-source row set — a dominant crawl domain costs K rows "
    "on the reduce side, not its full cardinality.",
)
def pipeline_domain_cap(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    h = F.expr(_spark_h48("concat(cast(doc_id as string), ':cap')"))
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (
        d.select("doc_id", "source", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _CAP_PER_SOURCE)
    )


# Two synthetic snapshots carved from `documents` so the diff exercises
# all four classes: OLD drops doc_id%11==0, NEW drops doc_id%13==0, and
# NEW perturbs n_chars on doc_id%17==0 (a simulated in-place edit).
_DIFF_OLD = "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id % 11 <> 0"
_DIFF_NEW = (
    "SELECT doc_id, lang, source, "
    "n_chars + (CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS n_chars "
    "FROM documents WHERE doc_id % 13 <> 0"
)
_DIFF_ROWHASH = (
    "md5(concat_ws('|', cast(doc_id as varchar), lang, source, "
    "cast(n_chars as varchar)))"
)


@_q(
    "catalog_table_diff",
    f"""WITH old_snap AS ({_DIFF_OLD}),
new_snap AS ({_DIFF_NEW}),
o AS (SELECT doc_id, {_DIFF_ROWHASH} AS rh FROM old_snap),
n AS (SELECT doc_id, {_DIFF_ROWHASH} AS rh FROM new_snap),
classified AS (
    SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.rh <> n.rh THEN 'changed'
                ELSE 'unchanged' END AS change_class
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT change_class, count(*) AS n_rows
FROM classified GROUP BY change_class""",
    "snapshot diff: classify every key as added / removed / changed / "
    "unchanged by full-outer-joining two table versions on the primary "
    "key and comparing a canonical row hash (same md5 row rendering as "
    "catalog_table_checksum). This is the drill-down companion to the "
    "order-insensitive checksum: the checksum says WHETHER a 100 TB copy "
    "drifted, the diff says WHERE. Row hashes are computed map-side, so "
    "the shuffle carries (key, 32-byte hash) — never the row payload — "
    "and the join is a plain co-partitioned equi-join on the key.",
)
def catalog_table_diff(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    spark_rowhash = F.expr(
        "md5(concat_ws('|', cast(doc_id as string), lang, source, "
        "cast(n_chars as string)))"
    )
    old_snap = d.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id", spark_rowhash.alias("rh")
    )
    new_snap = (
        d.filter(F.col("doc_id") % 13 != 0)
        .withColumn(
            "n_chars",
            F.col("n_chars")
            + F.when(F.col("doc_id") % 17 == 0, F.lit(1)).otherwise(F.lit(0)),
        )
        .select("doc_id", spark_rowhash.alias("rh"))
    )
    j = old_snap.alias("o").join(
        new_snap.alias("n"), F.col("o.doc_id") == F.col("n.doc_id"), "full_outer"
    )
    cls = (
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("o.rh") != F.col("n.rh"), "changed")
        .otherwise("unchanged")
    )
    return j.select(cls.alias("change_class")).groupBy("change_class").agg(
        F.count("*").alias("n_rows")
    )


# heavy-hitter threshold: tokens carrying >= 1/500 of all token mass
_HH_DENOM = 500


@_q(
    "agg_heavy_hitters",
    f"""WITH toks AS (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
    FROM documents),
counts AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
total AS (SELECT sum(cnt) AS n FROM counts)
SELECT w AS word, cnt,
       round(cnt / cast(n as double), 6) AS frac
FROM counts, total
WHERE cnt * {_HH_DENOM} >= n""",
    "exact heavy hitters: every token holding >= 1/500 of total token "
    "mass. Two hash-aggregates (word counts with map-side combine, then "
    "one single-row total that broadcasts back over the counts) — no "
    "global sort, no sketch. This is the exact-answer shape that replaces "
    "count-min/Misra-Gries when the phi threshold bounds the output to "
    "at most 500 rows: the per-word count table is the only shuffle, "
    "and it is already the minimum information any exact answer needs.",
)
def agg_heavy_hitters(spark, sf_dir):
    from .functions.hashing import spark_tokens

    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.expr(spark_tokens("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("n"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * _HH_DENOM >= F.col("n"))
        .select(
            "word",
            "cnt",
            F.round(F.col("cnt") / F.col("n").cast("double"), 6).alias("frac"),
        )
    )


@_q(
    "emb_random_projection",
    similarity.random_projection_oracle(),
    "Johnson-Lindenstrauss random projection 64d → 8d via a literal "
    "Rademacher ±1 sign matrix (Achlioptas 2003): the training-free "
    "complement to emb_pca_project. One map-only Project in whole-stage "
    "codegen — zero shuffles, zero Python, no corpus statistics — so at "
    "100 TB it runs at scan speed and the reduced vectors feed any "
    "downstream ANN index. Unlike PCA this is oracle-exact: each output "
    "coordinate is a fixed-order left fold of literal products.",
)
def emb_random_projection(spark, sf_dir):
    return similarity.random_projection(_t(spark, sf_dir, "embeddings"))


_NEAREST_ORACLE = """
WITH c1 AS (
    SELECT user_id AS cu, epoch_us(ts) AS ct, event_id AS click_id,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click'),
c AS (SELECT cu, ct, click_id FROM c1 WHERE rn = 1),
p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'purchase'),
b AS (SELECT p.event_id, c.click_id AS b_click, c.ct AS b_ct
      FROM p ASOF LEFT JOIN c ON p.user_id = c.cu AND p.t >= c.ct),
cneg AS (SELECT cu, -ct AS nct, ct, click_id FROM c),
f AS (SELECT p.event_id, cneg.click_id AS f_click, cneg.ct AS f_ct
      FROM p ASOF LEFT JOIN cneg ON p.user_id = cneg.cu AND -p.t >= cneg.nct)
SELECT p.event_id, p.user_id,
       CASE WHEN b_ct IS NOT NULL
                 AND (f_ct IS NULL OR p.t - b_ct <= f_ct - p.t)
            THEN b_click ELSE f_click END AS nearest_click_id,
       CASE WHEN b_ct IS NOT NULL
                 AND (f_ct IS NULL OR p.t - b_ct <= f_ct - p.t)
            THEN b_ct - p.t ELSE f_ct - p.t END AS delta_us
FROM p JOIN b ON p.event_id = b.event_id
       JOIN f ON p.event_id = f.event_id
"""


@_q(
    "join_nearest_event",
    _NEAREST_ORACLE,
    "nearest-event join: each purchase finds the user's click closest in "
    "time in EITHER direction (ties → the earlier click), with the signed "
    "time delta. Composed as backward as-of ∘ forward as-of over the same "
    "user partitioning — both passes shuffle on the same key, so the "
    "second window sorts already-co-partitioned data; no theta join, no "
    "per-row subquery. DuckDB's ASOF only looks backward, so the oracle "
    "runs the forward leg on negated timestamps.",
)
def join_nearest_event(spark, sf_dir):
    from .operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purch = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.expr("ts DIV 1000").alias("ct"),
    )
    back = asof_join(
        purch, clicks,
        left_key="user_id", right_key="cu",
        left_ts="t_us", right_ts="ct",
        value_cols=["click_id", "ct"],
        tiebreak="click_id",
    ).withColumnsRenamed({"click_id": "b_click", "ct": "b_ct"})
    both = asof_join(
        back, clicks,
        left_key="user_id", right_key="cu",
        left_ts="t_us", right_ts="ct",
        value_cols=["click_id", "ct"],
        tiebreak="click_id",
        direction="forward",
    ).withColumnsRenamed({"click_id": "f_click", "ct": "f_ct"})
    pick_back = F.col("b_ct").isNotNull() & (
        F.col("f_ct").isNull()
        | ((F.col("t_us") - F.col("b_ct")) <= (F.col("f_ct") - F.col("t_us")))
    )
    return both.select(
        "event_id",
        "user_id",
        F.when(pick_back, F.col("b_click")).otherwise(F.col("f_click")).alias(
            "nearest_click_id"
        ),
        F.when(pick_back, F.col("b_ct") - F.col("t_us"))
        .otherwise(F.col("f_ct") - F.col("t_us"))
        .alias("delta_us"),
    )


@_q(
    "pipeline_scd2",
    """WITH e AS (
    SELECT user_id, epoch_us(ts) AS t, event_type, event_id FROM events),
ordered AS (
    SELECT user_id, t, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY t, event_id) AS prev
    FROM e),
changes AS (
    SELECT user_id, t, event_type FROM ordered
    WHERE prev IS NULL OR prev <> event_type),
versions AS (
    SELECT user_id, event_type AS state, t AS valid_from_us,
           lead(t) OVER (PARTITION BY user_id
                         ORDER BY t, event_type) AS valid_to_us,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY t, event_type) AS version
    FROM changes)
SELECT user_id, state, valid_from_us, valid_to_us,
       cast(version as int) AS version
FROM versions""",
    "SCD Type-2 history build: collapse each user's event stream into "
    "versioned state intervals (valid_from / valid_to, open-ended "
    "current row) by keeping only change points (event_type <> its lag) "
    "and closing each interval with the next change's timestamp. The "
    "warehouse dimension-history primitive, as one pass: all three "
    "window functions share the user_id partitioning, so Spark sorts "
    "each user's slice once and reuses it — one shuffle total, no "
    "self-join against 'the next row'.",
)
def pipeline_scd2(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("ts DIV 1000").alias("t"), "event_type", "event_id"
    )
    w_lag = Window.partitionBy("user_id").orderBy("t", "event_id")
    changes = (
        e.withColumn("prev", F.lag("event_type").over(w_lag))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "t", "event_type")
    )
    w_v = Window.partitionBy("user_id").orderBy("t", "event_type")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("t").alias("valid_from_us"),
        F.lead("t").over(w_v).alias("valid_to_us"),
        F.row_number().over(w_v).alias("version"),
    )


@_q(
    "dedup_containment",
    dedup.ngram_containment_pairs_oracle(),
    "directed shingle containment |A∩B|/|A|: the asymmetric near-dup "
    "measure that catches a short doc quoted wholesale inside a long one "
    "(containment ≈ 1 where Jaccard stays tiny because the union is "
    "long-doc-sized) — the boilerplate / doc-inside-doc detector. Same "
    "df-capped inverted-index candidate generation as "
    "dedup_ngram_jaccard: one shingle-keyed shuffle, never all-pairs; "
    "both directed views reuse the same joined frame.",
)
def dedup_containment(spark, sf_dir):
    return dedup.ngram_containment_pairs(_t(spark, sf_dir, "documents"))


_SKEW_TOP = 20


@_q(
    "catalog_key_skew_profile",
    f"""WITH counts AS (
    SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY l_partkey),
total AS (SELECT sum(cnt) AS n FROM counts)
SELECT key, cnt, round(cnt / cast(n as double), 6) AS share
FROM counts, total
ORDER BY cnt DESC, key LIMIT {_SKEW_TOP}""",
    "join-key skew profile: the hottest N keys of a prospective join key "
    "with their row share — the diagnostic you run BEFORE choosing plain "
    "vs salted vs broadcast join (join_salted_skew is the remedy this "
    "query prescribes). One hash-aggregate on the key (the same shuffle "
    "the join itself would do) + a broadcast 1-row total; top-N plans as "
    "TakeOrderedAndProject, so no global window and no full sort — map "
    "tasks forward only their local top-N. At 100 TB you run it on a "
    "content-hash sample first; the shape is identical.",
)
def catalog_key_skew_profile(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("n"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("n").cast("double"), 6).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), "key")
        .limit(_SKEW_TOP)
    )


@_q(
    "pipeline_group_advantage",
    """WITH scored AS (
    SELECT doc_id, source, lang,
           cast(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                as bigint) AS score
    FROM documents),
g AS (
    SELECT source, lang,
           count(*) AS n,
           cast(sum(score) as bigint) AS s,
           cast(sum(score * score) as bigint) AS ss
    FROM scored GROUP BY source, lang HAVING count(*) >= 2),
j AS (
    SELECT sc.doc_id, sc.source, sc.lang, sc.score, g.n, g.s, g.ss,
           sc.score - cast(g.s as double) / g.n AS adv,
           sqrt((g.ss - cast(g.s as double) * g.s / g.n) / (g.n - 1))
               AS sd
    FROM scored sc JOIN g USING (source, lang))
SELECT doc_id, source, lang, score,
       round(adv, 6) AS advantage,
       CASE WHEN sd > 0 THEN round(adv / sd, 6) END AS advantage_norm
FROM j""",
    "group-relative advantage computation — the GRPO/RLVR "
    "reward-shaping primitive: within every (source, lang) group of "
    "candidate outputs, each member's advantage is its score minus the "
    "group mean, normalized by the group's sample standard deviation "
    "(NULL when the group is constant — never a divide-by-zero). "
    "Moments are EXACT bigint sums (one map-side-combinable pass), the "
    "mean/σ solve is per-group scalar arithmetic on exactly equal "
    "inputs, and sqrt is IEEE-correctly-rounded in both engines — so "
    "every advantage is bit-reproducible. One group shuffle + one "
    "broadcast-size group join; nothing corpus-global.",
)
def pipeline_group_advantage(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        "lang",
        F.expr(
            "cast(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
            " as bigint)"
        ).alias("score"),
    )
    g = (
        scored.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("score").alias("s"),
            F.sum(F.col("score") * F.col("score")).alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    j = scored.join(g, ["source", "lang"])
    adv = F.col("score") - F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    return j.select(
        "doc_id",
        "source",
        "lang",
        "score",
        F.round(adv, 6).alias("advantage"),
        F.when(sd > 0, F.round(adv / sd, 6)).alias("advantage_norm"),
    )


_PREF_PAIRS_PER_GROUP = 5


@_q(
    "pipeline_preference_pairs",
    f"""WITH scored AS (
    SELECT doc_id, source, lang,
           len(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AS score
    FROM documents),
ranked AS (
    SELECT doc_id, source, lang, score,
           row_number() OVER (PARTITION BY source, lang
                              ORDER BY score DESC, doc_id) AS rn_best,
           row_number() OVER (PARTITION BY source, lang
                              ORDER BY score ASC, doc_id) AS rn_worst
    FROM scored)
SELECT b.source, b.lang, cast(b.rn_best as int) AS pair_rank,
       b.doc_id AS chosen_id, w.doc_id AS rejected_id,
       cast(b.score - w.score as bigint) AS margin
FROM ranked b JOIN ranked w
  ON b.source = w.source AND b.lang = w.lang AND b.rn_best = w.rn_worst
WHERE b.rn_best <= {_PREF_PAIRS_PER_GROUP} AND b.score > w.score""",
    "preference-pair construction — the DPO/RLHF reward-modeling "
    "dataset shape: within every (source, lang) stratum, rank documents "
    "by a deterministic quality score (token count here; any scorer "
    "slots in), pair the i-th best with the i-th worst for the top "
    f"{_PREF_PAIRS_PER_GROUP} ranks, and keep only pairs with a strict "
    "quality margin so chosen/rejected never tie or cross in the "
    "middle. Scale shape: both rankings come from windows sharing ONE "
    "(source, lang) shuffle, the pair join is keyed on (stratum, rank) "
    "with at most K rows per stratum on each side — never a pairwise "
    "blowup — and the margin filter is a post-join predicate. The "
    "tie-break on doc_id makes every pair deterministic, so the oracle "
    "hash-matches.",
)
def pipeline_preference_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        "lang",
        F.expr(
            "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))"
        ).alias("score"),
    )
    wb = Window.partitionBy("source", "lang").orderBy(
        F.desc("score"), "doc_id"
    )
    ww = Window.partitionBy("source", "lang").orderBy("score", "doc_id")
    ranked = scored.select(
        "doc_id",
        "source",
        "lang",
        "score",
        F.row_number().over(wb).alias("rn_best"),
        F.row_number().over(ww).alias("rn_worst"),
    )
    b = ranked.filter(F.col("rn_best") <= _PREF_PAIRS_PER_GROUP).alias("b")
    w = ranked.filter(F.col("rn_worst") <= _PREF_PAIRS_PER_GROUP).alias("w")
    return (
        b.join(
            w,
            (F.col("b.source") == F.col("w.source"))
            & (F.col("b.lang") == F.col("w.lang"))
            & (F.col("b.rn_best") == F.col("w.rn_worst")),
        )
        .filter(F.col("b.score") > F.col("w.score"))
        .select(
            F.col("b.source").alias("source"),
            F.col("b.lang").alias("lang"),
            F.col("b.rn_best").cast("int").alias("pair_rank"),
            F.col("b.doc_id").alias("chosen_id"),
            F.col("w.doc_id").alias("rejected_id"),
            (F.col("b.score") - F.col("w.score")).cast("bigint").alias(
                "margin"
            ),
        )
    )


@_q(
    "pipeline_span_corruption",
    """WITH toks0 AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tl
    FROM documents),
toks AS (
    SELECT doc_id, g.i AS pos, tl[g.i] AS tok
    FROM toks0, unnest(generate_series(1, len(tl))) AS g(i)),
marked AS (
    SELECT doc_id, pos, tok,
           CASE WHEN pos % 7 = 3 THEN 2
                WHEN pos % 7 = 4 AND pos > 3 THEN 1
                ELSE 0 END AS role,
           CASE WHEN pos >= 3 THEN (pos - 3) // 7 + 1 ELSE 0 END AS k,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM toks)
SELECT doc_id,
       coalesce(string_agg(
           CASE WHEN role = 2 THEN concat('<x_', cast(k as varchar), '>')
                WHEN role = 0 THEN tok END, ' ' ORDER BY pos), '')
           AS input,
       coalesce(string_agg(
           CASE WHEN role = 2 THEN
               concat('<x_', cast(k as varchar), '> ', tok,
                      CASE WHEN nxt IS NULL THEN ''
                           ELSE concat(' ', nxt) END) END,
           ' ' ORDER BY pos), '') AS target,
       cast(sum(CASE WHEN role = 2 THEN 1 ELSE 0 END) as bigint)
           AS n_spans
FROM marked GROUP BY doc_id""",
    "T5-style span corruption — the denoising-pretraining dataset "
    "shape: deterministic 2-token spans (every 7th position) are "
    "replaced by numbered sentinels in the input, and the target "
    "lists each sentinel with its masked tokens, order preserved. "
    "One tokenize-explode, one per-doc window (lead) for the span's "
    "second token, one grouped reassembly whose pieces are "
    "order-struct-sorted — no self-joins, nothing corpus-global; "
    "partitions are per-doc exactly like chunking. Sentinel numbering, "
    "span placement, and reassembly are pure integer/string "
    "arithmetic, so the oracle hash-matches both generated strings "
    "verbatim.",
)
def pipeline_span_corruption(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    w = Window.partitionBy("doc_id").orderBy("pos")
    marked = toks.select(
        "doc_id",
        "pos",
        "tok",
        F.expr(
            "CASE WHEN pos % 7 = 3 THEN 2"
            " WHEN pos % 7 = 4 AND pos > 3 THEN 1 ELSE 0 END"
        ).alias("role"),
        F.expr(
            "CASE WHEN pos >= 3 THEN (pos - 3) div 7 + 1 ELSE 0 END"
        ).alias("k"),
        F.lead("tok").over(w).alias("nxt"),
    )
    inp_piece = F.when(
        F.col("role") == 2,
        F.struct(
            F.col("pos"),
            F.concat(F.lit("<x_"), F.col("k").cast("string"), F.lit(">")).alias("p"),
        ),
    ).when(
        F.col("role") == 0, F.struct(F.col("pos"), F.col("tok").alias("p"))
    )
    tgt_piece = F.when(
        F.col("role") == 2,
        F.struct(
            F.col("pos"),
            F.concat(
                F.lit("<x_"),
                F.col("k").cast("string"),
                F.lit("> "),
                F.col("tok"),
                F.coalesce(
                    F.concat(F.lit(" "), F.col("nxt")), F.lit("")
                ),
            ).alias("p"),
        ),
    )
    staged = marked.withColumn("_inp", inp_piece).withColumn(
        "_tgt", tgt_piece
    )
    return staged.groupBy("doc_id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(_inp)), s -> s.p)"),
            " ",
        ).alias("input"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(_tgt)), s -> s.p)"),
            " ",
        ).alias("target"),
        F.sum((F.col("role") == 2).cast("bigint")).alias("n_spans"),
    )


_NEG_BUCKETS = 64
_NEG_PER_ANCHOR = 4


@_q(
    "pipeline_contrastive_pairs",
    f"""WITH bucketed AS (
    SELECT doc_id,
           {_duck_h48("concat(cast(doc_id as varchar), ':neg')")} % {_NEG_BUCKETS}
               AS bucket,
           {_duck_h48("concat(cast(doc_id as varchar), ':rep')")} AS hrep
    FROM documents),
reps AS (
    SELECT bucket, doc_id AS neg_id FROM (
        SELECT bucket, doc_id,
               row_number() OVER (PARTITION BY bucket
                                  ORDER BY hrep, doc_id) AS rn
        FROM bucketed) WHERE rn = 1),
anchors AS (
    SELECT doc_id AS anchor_id, k,
           {_duck_h48("concat(cast(doc_id as varchar), ':', cast(k as varchar))")}
               % {_NEG_BUCKETS} AS bucket
    FROM documents, (SELECT unnest(generate_series(0, {_NEG_PER_ANCHOR - 1})) AS k)
    WHERE doc_id % 25 = 0)
SELECT anchor_id, cast(k as int) AS k, neg_id
FROM anchors JOIN reps USING (bucket)
WHERE neg_id <> anchor_id""",
    "deterministic negative sampling for contrastive training: each "
    "anchor doc draws K pseudo-random negatives by hashing (anchor, k) "
    "into one of B corpus buckets and taking that bucket's hash-minimal "
    "representative. Every choice is content-hash arithmetic — the pair "
    "set is reproducible across engines, runs, and partitionings (what "
    "rand()-based sampling cannot give). Scale shape: one corpus pass "
    "aggregates the B-row representative table (WindowGroupLimit keeps "
    "it partial-top-1 per bucket map-side), which then BROADCASTS "
    "against the exploded anchors — no corpus-sized shuffle at all.",
)
def pipeline_contrastive_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    bucket = F.expr(_spark_h48("concat(cast(doc_id as string), ':neg')")) % _NEG_BUCKETS
    hrep = F.expr(_spark_h48("concat(cast(doc_id as string), ':rep')"))
    w = Window.partitionBy("bucket").orderBy("hrep", "doc_id")
    reps = (
        d.select("doc_id", bucket.alias("bucket"), hrep.alias("hrep"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("bucket", F.col("doc_id").alias("neg_id"))
    )
    anchors = (
        d.filter(F.col("doc_id") % 25 == 0)
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.explode(
                F.sequence(F.lit(0), F.lit(_NEG_PER_ANCHOR - 1))
            ).alias("k"),
        )
        .withColumn(
            "bucket",
            F.expr(
                _spark_h48("concat(cast(anchor_id as string), ':', cast(k as string))")
            )
            % _NEG_BUCKETS,
        )
    )
    return (
        anchors.join(F.broadcast(reps), "bucket")
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "k", "neg_id")
    )


from .functions.bpe import encode_counts_oracle as _bpe_oracle  # noqa: E402
from .functions.unigram import (  # noqa: E402
    segment_counts_oracle as _unigram_oracle,
)

_BPE_ORACLE = _bpe_oracle()
_UNIGRAM_ORACLE = _unigram_oracle()


@_q(
    "text_bpe_encode",
    _BPE_ORACLE,  # ex-rows-only, r10: the greedy merge loop IS
    # SQL-expressible as a recursive CTE over the distinct vocabulary
    # (rank*K + pos packed so one list_min applies the rank-then-
    # leftmost rule) — see functions/bpe.py:encode_counts_oracle
    "real greedy BPE tokenization (functions/bpe.py): fixed literal merge "
    "table applied per word through an Arrow-batched mapInPandas stage — "
    "the same plumbing a production HF tokenizer drops into, one Python "
    "worker per partition, zero shuffles, zero driver involvement. "
    "Complements the JVM-side BPE-ish regex pretokenizer counts "
    "(text_token_stats) with actual merge semantics; per-doc word / "
    "kept-char / BPE-token counts feed packing and cost estimation. "
    "Value-exact oracle since r10: a DuckDB recursive CTE replays the "
    "identical lowest-rank-leftmost merge sequence per distinct word; "
    "the pure-Python row-level pin in tests stays as a third, "
    "independent implementation.",
)
def text_bpe_encode(spark, sf_dir):
    from .functions import bpe

    return bpe.encode_counts(_t(spark, sf_dir, "documents"))


@_q(
    "text_unigram_segment",
    _UNIGRAM_ORACLE,  # packed-integer Viterbi DP — the bpe recursive-
    # CTE trick applied to dynamic programming; every word\'s optimal
    # segmentation is replayed character-by-character in DuckDB
    "unigram-LM (SentencePiece-style) Viterbi segmentation — the "
    "SECOND major subword-tokenizer family beside BPE (Kudo, ACL "
    "2018): each word segments into the minimum-cost piece sequence "
    "over a fixed literal vocabulary with INTEGER milli-nat costs; "
    "the DP state is one packed integer (cost<<20 | pieces<<10 | "
    "fallbacks), so a single min() is the entire tie law — cost, then "
    "fewer pieces, then fewer single-char fallbacks — identical in "
    "both engines by construction. Per-doc words / optimal pieces / "
    "total cost / fallback count are the tokenizer-pricing signals a "
    "corpus report runs before committing to a tokenizer (high "
    "fallback fraction = OOV-heavy text). Arrow mapInPandas, zero "
    "shuffles (the bpe plumbing); the oracle replays the DP as a "
    "recursive CTE over the DISTINCT vocabulary carrying the last 4 "
    "best states as columns; pinned against brute-force enumeration "
    "of ALL segmentations in tests.",
)
def text_unigram_segment(spark, sf_dir):
    from .functions import unigram

    return unigram.segment_counts(_t(spark, sf_dir, "documents"))


@_q(
    "text_html_extract",
    """SELECT doc_id,
       concat('doc & ', cast(doc_id as varchar)) AS title,
       cast(doc_id % 7 as int) AS n_links,
       cast(8 + doc_id % 7 as int) AS n_tags,
       cast(1 as int) AS n_comments,
       md5(text) AS text_md5,
       cast(length(text) as bigint) AS text_len
FROM documents""",
    "HTML text extraction (functions/html.py) — the WARC→text step "
    "every web-crawl training pipeline runs between the .warc.gz "
    "record walk (src_warc_gz_scan) and the text-quality tier: a "
    "from-scratch WHATWG-flavored tokenizer (attribute values "
    "containing '>', comments containing '>', RAWTEXT script/style "
    "whose bodies contain '<p>' and '1<2', stray '<' as literal text, "
    "named + numeric character references with error recovery) "
    "extracts the title, the entity-decoded <p> text, and "
    "link/tag/comment censuses. Pages are synthesized JVM-side from "
    "the documents table with pure codegen expressions (escape via "
    "chained literal replace, nav links via transform over sequence) "
    "— only the extractor is Python (Arrow mapInPandas, map-only). "
    "The oracle pins the escape→tokenize→unescape roundtrip BYTE-"
    "EXACT via md5(text) plus every census from doc_id arithmetic, so "
    "one swallowed character anywhere in the tokenizer hash-breaks. "
    "A test pins the Spark-expression builder byte-identical to the "
    "Python twin builder so the fixture cannot drift from the fuzz "
    "corpus.",
)
def text_html_extract(spark, sf_dir):
    from .functions import html as H

    d = _t(spark, sf_dir, "documents")
    out = H.html_extract_stats(H.synthesize_html_pages(d))
    return out.select(
        "doc_id", "title", "n_links", "n_tags", "n_comments",
        F.md5("text").alias("text_md5"), "text_len",
    )


@_q(
    "text_html_links",
    """WITH l AS (
    SELECT d.doc_id, g.i,
           CASE WHEN g.i % 2 = 1 THEN concat('/l/', cast(g.i as varchar))
                ELSE concat('http://ext-', cast(g.i as varchar),
                            '.example.org/') END AS href
    FROM documents d, unnest(generate_series(1, d.doc_id % 7)) AS g(i))
SELECT d.doc_id,
       cast(coalesce(sum(CASE WHEN l.i % 2 = 1 THEN 1 ELSE 0 END), 0)
            as int) AS n_internal,
       cast(coalesce(sum(CASE WHEN l.i % 2 = 0 THEN 1 ELSE 0 END), 0)
            as int) AS n_external,
       coalesce(string_agg(l.href, '|' ORDER BY l.i), '') AS hrefs,
       cast(coalesce(sum(5 + length(cast(l.i as varchar))), 0)
            as bigint) AS anchor_len
FROM documents d LEFT JOIN l ON l.doc_id = d.doc_id
GROUP BY d.doc_id""",
    "HTML link census (functions/html.py) — the HTML→link-graph step "
    "that completes the crawl chain: ingest (src_warc_gz_scan) → text "
    "extraction (text_html_extract) → LINK EDGES → the existing graph "
    "family (graph_pagerank / pipeline_source_authority consume "
    "exactly these edge shapes at corpus scale). The tokenizer's "
    "attribute parser captures href values (entity-decoded, quoted "
    "values containing '>' intact) and per-link anchor text in "
    "document order; the census splits site-internal (href starting "
    "'/') from external targets. The oracle replays the builder's "
    "alternating internal/external link arithmetic per doc and pins "
    "the '|'-joined href sequence BYTE-EXACT plus anchor-text length, "
    "so one swallowed character in attribute-value parsing "
    "hash-breaks. Map-only Arrow mapInPandas.",
)
def text_html_links(spark, sf_dir):
    from .functions import html as H

    d = _t(spark, sf_dir, "documents")
    return H.html_link_stats(H.synthesize_html_pages(d))


@_q(
    "text_robots_filter",
    """WITH b AS (
    SELECT doc_id, cast(substr(source, 4) as int) AS sid, doc_id % 8 AS p
    FROM documents),
pth AS (
    SELECT doc_id, sid,
       CASE p WHEN 0 THEN concat('/public/p', cast(doc_id as varchar))
              WHEN 1 THEN concat('/private-a', cast(doc_id as varchar))
              WHEN 2 THEN concat('/private-ok-', cast(doc_id as varchar))
              WHEN 3 THEN concat('/tmp-', cast(doc_id % 3 as varchar),
                                 '/f', cast(doc_id as varchar))
              WHEN 4 THEN concat('/graft-', cast(doc_id as varchar))
              WHEN 5 THEN '/private-ok'
              WHEN 6 THEN concat('/dl/f', cast(doc_id as varchar), '.zip')
              ELSE concat('/files/f', cast(doc_id as varchar), '.zip')
       END AS path
    FROM b)
SELECT doc_id, path,
       -- replay the rule table via LIKE, ordered by descending
       -- pattern octets (the RFC precedence): even hosts select the
       -- exclusive graftbot group; odd hosts the '*' group with the
       -- wildcard/anchor pair replayed as suffix LIKEs
       CASE WHEN sid % 2 = 0 THEN path NOT LIKE '/graft-%'
            ELSE CASE
                 WHEN path LIKE '/private-ok-%' THEN TRUE
                 WHEN path LIKE '/dl/%' AND path LIKE '%.zip' THEN TRUE
                 WHEN path LIKE '/private-%' THEN FALSE
                 WHEN path LIKE '%.zip' THEN FALSE
                 WHEN path LIKE concat('/tmp-', cast(sid % 3 as varchar),
                                       '/%') THEN FALSE
                 ELSE TRUE END
       END AS allowed,
       CASE WHEN sid % 2 = 0
            THEN (CASE WHEN path LIKE '/graft-%' THEN '/graft-'
                       ELSE '' END)
            ELSE CASE
                 WHEN path LIKE '/private-ok-%' THEN '/private-ok-'
                 WHEN path LIKE '/dl/%' AND path LIKE '%.zip'
                     THEN '/dl/*.zip$'
                 WHEN path LIKE '/private-%' THEN '/private-'
                 WHEN path LIKE '%.zip' THEN '/*.zip$'
                 WHEN path LIKE concat('/tmp-', cast(sid % 3 as varchar),
                                       '/%')
                     THEN concat('/tmp-', cast(sid % 3 as varchar), '/')
                 ELSE '' END
       END AS matched_rule
FROM pth""",
    "robots.txt politeness filter (RFC 9309, functions/robots.py) — "
    "the admission check a crawl corpus runs before a response enters "
    "training data: each document's request path is matched against "
    "its host's robots.txt through the from-spec engine (group "
    "selection by EXACT case-insensitive product token with NO merge "
    "into '*', longest-octets rule precedence with allow winning "
    "ties, '*'/'$' pattern wildcards, tolerant grammar for comments / "
    "unknown directives / CRLF / empty Disallow). The per-host "
    "fixture plants a longest-match trap (/private- vs /private-ok-), "
    "a host-varying rule, a bot-specific group on even hosts that "
    "must ECLIPSE the '*' group entirely, and (r12) the RFC's "
    "'*'-wildcard + '$'-anchor pattern pair: /*.zip$ disallows every "
    "zip path, /dl/*.zip$ allows the download tree back by octet "
    "precedence (10 > 7). The oracle REPLAYS the rule table with "
    "LIKE patterns in descending-octets order — not just the boolean "
    "outcome but the exact matched pattern per path — so a "
    "precedence bug, a wrong group pick, a broken wildcard run, or a "
    "$-anchor that matches mid-path hash-breaks. Map-only Arrow "
    "mapInPandas; per-host robots cached per batch (broadcast-sized "
    "side input at crawl scale).",
)
def text_robots_filter(spark, sf_dir):
    from .functions import robots

    return robots.robots_filter(_t(spark, sf_dir, "documents"))


@_q(
    "pipeline_crawl_admission",
    """WITH b AS (
    SELECT doc_id, source, cast(substr(source, 4) as int) AS sid,
           doc_id % 8 AS p, length(text) AS tl, doc_id % 7 AS nl
    FROM documents),
dec AS (
    SELECT source, tl, nl,
           CASE WHEN sid % 2 = 0 THEN p <> 4
                ELSE p IN (0, 2, 4, 6)
                     OR (p = 3 AND sid % 3 <> doc_id % 3)
           END AS allowed
    FROM b)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_admitted,
       CAST(sum(CASE WHEN allowed THEN tl ELSE 0 END) AS BIGINT)
           AS admitted_text_len,
       CAST(sum(CASE WHEN allowed THEN nl // 2 ELSE 0 END) AS BIGINT)
           AS admitted_ext_links
FROM dec GROUP BY source""",
    "the crawl-admission report — the round's new operators COMPOSED "
    "the way a nightly curation pipeline actually runs them: page "
    "synthesis → HTML text extraction (text roundtrip lengths) + link "
    "census (external-link counts) + robots.txt politeness decision "
    "FUSED into ONE Arrow stage (robots.admission_stats — the "
    "composition is per-row, so separate extraction stages re-joined "
    "on doc_id would add shuffles for nothing), rolled up per source "
    "into an admission census (docs seen / admitted / admitted text "
    "bytes / admitted external links). The ONLY shuffle is the final "
    "20-group rollup: one pass over the corpus at any scale. The "
    "oracle replays extraction lengths, link arithmetic, and the full "
    "robots decision table relationally, so a defect in ANY composed "
    "operator — or in the fusion itself — hash-breaks.",
)
def pipeline_crawl_admission(spark, sf_dir):
    from .functions import robots

    d = _t(spark, sf_dir, "documents")
    rows = robots.admission_stats(d)
    return rows.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("allowed"), 1).otherwise(0)).alias("n_admitted"),
        F.sum(F.when(F.col("allowed"), F.col("text_len")).otherwise(0))
        .alias("admitted_text_len"),
        F.sum(F.when(F.col("allowed"), F.col("n_external")).otherwise(0))
        .alias("admitted_ext_links"),
    )


@_q(
    "agg_hll_partial_merge",
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS exact_docs,
       TRUE AS merge_consistent, TRUE AS within_bound
FROM documents GROUP BY lang""",
    "mergeable sketch partials — the pre-aggregated-cube pattern: each "
    "(lang, source) cell keeps an HLL sketch of its doc population as "
    "BYTES (hll_sketch_agg), and any rollup level is answered by "
    "hll_union_agg over the stored partials WITHOUT rescanning rows. "
    "This is how a 100 TB corpus serves distinct-count dashboards: the "
    "sketch table is thousands of rows, re-aggregable along any "
    "dimension, and partials from new partitions merge in O(sketch "
    "bytes). r11: restated from rows-only to hash-checked CONTRACT "
    "columns (the agg_approx_cd_bounded pattern) — DataSketches HLL "
    "estimates are engine-specific so the raw value can never "
    "oracle-match, but two laws ARE stable booleans given the data: "
    "(1) GROUPING CONSISTENCY — the estimate from merged per-(lang, "
    "source) partials agrees within ±2% with the estimate from merged "
    "partials of a strictly FINER partitioning (lang, source, "
    "doc_id%7) of the same rows; and (2) the ±5σ accuracy bound vs "
    "the exact distinct count (lgK=12 → rsd 1.625%, bound 8.2%). "
    "CALIBRATION HONESTY (what the sf0.1 standing sweep taught this "
    "round): neither 'merged ≡ direct sketch' (DataSketches serves "
    "direct sketches from the HIP estimator, unions from the "
    "composite estimator — off by ~1-2% in dense mode) nor 'merged ≡ "
    "differently-grouped merge' (HLL_4's offset/aux rebase makes "
    "union states differ by ±1 count depending on promotion timing) "
    "holds EXACTLY at dense-mode cardinalities, so the contract pins "
    "bounded divergence, which a real merge bug (lossy union, wrong "
    "hashing, dropped partial) still blows through. Output per lang: "
    "exact row/distinct counts (value-pinned) + merge_consistent + "
    "within_bound pinned TRUE.",
)
def agg_hll_partial_merge(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    partials = d.groupBy("lang", "source").agg(
        F.hll_sketch_agg("doc_id").alias("sk"),
        F.count("*").alias("n_rows"),
    )
    merged = partials.groupBy("lang").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
        F.sum("n_rows").alias("n_rows"),
    )
    finer = (
        d.groupBy("lang", "source", (F.col("doc_id") % 7).alias("__b"))
        .agg(F.hll_sketch_agg("doc_id").alias("sk"))
        .groupBy("lang")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("finer_est"))
    )
    exact = d.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("exact_docs")
    )
    return (
        merged.join(finer, "lang")
        .join(exact, "lang")
        .select(
            "lang",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("exact_docs").cast("bigint").alias("exact_docs"),
            (
                F.abs(
                    F.col("merged_est").cast("double")
                    / F.col("finer_est").cast("double")
                    - F.lit(1.0)
                )
                <= F.lit(0.02)
            ).alias("merge_consistent"),
            (
                F.abs(
                    F.col("merged_est").cast("double")
                    / F.col("exact_docs").cast("double")
                    - F.lit(1.0)
                )
                <= F.lit(0.082)
            ).alias("within_bound"),
        )
    )


@_q(
    "pipeline_cdc_upsert",
    """WITH log AS (
    SELECT user_id, epoch_us(ts) AS t, event_id,
           CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           event_type, value
    FROM events),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY t DESC, event_id DESC) AS rn
    FROM log)
SELECT user_id, event_type AS last_event_type, value AS last_value,
       t AS last_t_us
FROM ranked WHERE rn = 1 AND op <> 'D'""",
    "CDC changelog compaction (MERGE INTO semantics, Spark-first): the "
    "event stream is an upsert log keyed by user — 'error' rows are "
    "DELETE tombstones, everything else upserts the user's record. The "
    "next snapshot is row_number()=1 per key by (ts, event_id) DESC with "
    "tombstoned keys dropped. One shuffle on the key; rn=1 triggers "
    "WindowGroupLimit, so map tasks forward one candidate row per key "
    "they hold — compacting a 100 TB changelog moves ~|keys| rows, not "
    "|log| rows, through the reduce side.",
)
def pipeline_cdc_upsert(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts DIV 1000").alias("t"),
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "event_type",
        "value",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("t").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("t").alias("last_t_us"),
        )
    )


# cutoff splitting "already-rolled-up history" from "newly arrived delta"
_ROLLUP_CUTOFF_DAY = 25


@_q(
    "pipeline_incremental_rollup",
    """SELECT user_id, count(*) AS n_events,
       cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
FROM events GROUP BY user_id""",
    "incremental rollup maintenance: the stored per-user aggregate over "
    "history (days < 25) is UPDATED with the new partition's partial "
    "aggregate (days >= 25) by unioning the two partial-state tables and "
    "re-aggregating — history rows are never rescanned. The oracle "
    "deliberately computes the FULL aggregate from raw rows, so the "
    "value-exact gate IS the proof that incremental maintenance equals "
    "full recomputation (counts add; sums ride exact DECIMAL, so "
    "partial-merge order cannot drift them). This is the daily-ETL "
    "pattern that turns a 100 TB rescan into a delta-sized job.",
)
def pipeline_incremental_rollup(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("ts DIV 86400000000000").alias("day"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    hist = e.filter(F.col("day") % 31 < _ROLLUP_CUTOFF_DAY)
    delta = e.filter(F.col("day") % 31 >= _ROLLUP_CUTOFF_DAY)
    # the "stored" rollup: what yesterday's job persisted
    stored = hist.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("v").alias("sum_v")
    )
    # today's delta partial
    fresh = delta.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("v").alias("sum_v")
    )
    merged = (
        stored.unionByName(fresh)
        .groupBy("user_id")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_v").alias("sum_v"))
    )
    return merged.select(
        "user_id", "n_events", F.col("sum_v").cast("double").alias("sum_value")
    )


_PR_ITERS = 5
_PR_DAMP = "cast(0.85 as double)"
_PR_BASE = "cast(0.15 as double)"


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank: because the iteration count is
    a compile-time constant, the 'iterative' algorithm IS SQL — five
    chained CTE rounds, value-exact (per-edge contributions in double,
    per-node sums through exact DECIMAL so aggregation order can't drift
    floats)."""
    rounds = []
    for i in range(1, _PR_ITERS + 1):
        p = f"pr{i - 1}"
        rounds.append(f"""
contrib{i} AS MATERIALIZED (
    SELECT e.s_to AS source,
           sum(cast(p.pr * e.w / o.ow as decimal(30,15))) AS c
    FROM edges e
    JOIN {p} p ON p.source = e.s_from
    JOIN outw o ON o.s_from = e.s_from
    GROUP BY e.s_to),
dang{i} AS MATERIALIZED (
    SELECT coalesce(sum(cast(p.pr as decimal(30,15))),
                    cast(0 as decimal(30,15))) AS dm
    FROM {p} p LEFT JOIN outw o ON o.s_from = p.source
    WHERE o.s_from IS NULL),
pr{i} AS MATERIALIZED (
    SELECT n.source,
           {_PR_BASE} / nn.n
             + {_PR_DAMP} * (cast(coalesce(c.c, 0) as double)
                             + cast(d.dm as double) / nn.n) AS pr
    FROM nodes n
    CROSS JOIN nn
    CROSS JOIN dang{i} d
    LEFT JOIN contrib{i} c ON c.source = n.source)""")
    return f"""
WITH pairs AS MATERIALIZED ({dedup.minhash_lsh_pairs_oracle()}),
src AS (SELECT doc_id, source FROM documents),
und AS (
    SELECT sa.source AS s_from, sb.source AS s_to
    FROM pairs p
    JOIN src sa ON sa.doc_id = p.doc_a
    JOIN src sb ON sb.doc_id = p.doc_b
    WHERE sa.source <> sb.source),
edges AS MATERIALIZED (
    SELECT s_from, s_to, count(*) AS w FROM (
        SELECT s_from, s_to FROM und
        UNION ALL
        SELECT s_to AS s_from, s_from AS s_to FROM und)
    GROUP BY s_from, s_to),
nodes AS (SELECT DISTINCT source FROM documents),
nn AS (SELECT count(*) AS n FROM nodes),
outw AS MATERIALIZED (SELECT s_from, sum(w) AS ow FROM edges GROUP BY s_from),
pr0 AS MATERIALIZED (SELECT source, cast(1 as double) / nn.n AS pr
                     FROM nodes CROSS JOIN nn),
{",".join(rounds)}
SELECT source, round(pr, 9) AS authority FROM pr{_PR_ITERS}
"""


@_q(
    "pipeline_source_authority",
    _pagerank_oracle(),
    "source-authority PageRank over the content-syndication graph: "
    "edges are cross-source near-dup pairs (MinHash LSH), so a source "
    "sharing content with many others — a syndication hub — earns "
    "authority, which informs crawl priority and dedup-keeper policy. "
    "Scale split: the EXPENSIVE part (edge construction) is one "
    "distributed LSH pass whose output aggregates to the source×source "
    "level — small by construction (sources number thousands, not "
    "billions) and persisted once; the 5 fixed power-iteration rounds "
    "then run as joins over that compact graph with dangling-mass "
    "redistribution. Value-exact oracle: fixed iteration count unrolls "
    "to 5 chained SQL rounds; per-node sums ride exact DECIMAL.",
)
def pipeline_source_authority(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs)
    src = docs.select("doc_id", "source")
    und = (
        pairs.join(
            src.withColumnsRenamed({"doc_id": "doc_a", "source": "s_from"}), "doc_a"
        )
        .join(
            src.withColumnsRenamed({"doc_id": "doc_b", "source": "s_to"}), "doc_b"
        )
        .filter(F.col("s_from") != F.col("s_to"))
        .select("s_from", "s_to")
    )
    edges = (
        und.unionByName(
            und.select(
                F.col("s_to").alias("s_from"), F.col("s_from").alias("s_to")
            )
        )
        .groupBy("s_from", "s_to")
        .agg(F.count("*").alias("w"))
        .persist()  # referenced every iteration; the LSH pass runs once
    )
    nodes = docs.select("source").distinct().persist()
    nn = nodes.agg(F.count("*").alias("n"))
    outw = edges.groupBy("s_from").agg(F.sum("w").alias("ow"))
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "source", F.expr("cast(1 as double) / n").alias("pr")
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(
                pr.withColumnsRenamed({"source": "s_from", "pr": "p"}), "s_from"
            )
            .join(outw, "s_from")
            .groupBy(F.col("s_to").alias("source"))
            .agg(F.sum(F.expr("cast(p * w / ow as decimal(30,15))")).alias("c"))
        )
        dang = (
            pr.join(outw, pr["source"] == outw["s_from"], "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.expr("cast(pr as decimal(30,15))")),
                    F.lit(0).cast("decimal(30,15)"),
                ).alias("dm")
            )
        )
        pr = (
            nodes.crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dang))
            .join(contrib, "source", "left")
            .select(
                "source",
                F.expr(
                    f"{_PR_BASE} / n + {_PR_DAMP} * "
                    "(cast(coalesce(c, 0) as double) + cast(dm as double) / n)"
                ).alias("pr"),
            )
            # truncate lineage every round (the dedup_clusters pattern):
            # pr feeds BOTH contrib and dang next round, so without the
            # checkpoint the logical plan doubles per iteration and
            # Catalyst optimization time grows 2^k
            .localCheckpoint()
        )
    return pr.select("source", F.round("pr", 9).alias("authority"))


_MRL_DIM = 16

_MRL_SPARK_N2 = (
    f"aggregate(transform(slice(embedding, 1, {_MRL_DIM}),"
    " x -> cast(x as double) * cast(x as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
)
_MRL_DUCK_N2 = (
    f"list_reduce(list_prepend(cast(0 as double),"
    f" list_transform(embedding[1:{_MRL_DIM}],"
    " x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b)"
)


@_q(
    "emb_matryoshka_truncate",
    f"""SELECT vec_id,
       {", ".join(f"round(embedding[{j + 1}]::DOUBLE / sqrt({_MRL_DUCK_N2}), 6) AS m{j}" for j in range(_MRL_DIM))}
FROM embeddings
WHERE {_MRL_DUCK_N2} > 0""",
    "Matryoshka-style embedding truncation: keep the first 16 of 64 "
    "dims and L2-renormalize — the MRL serving pattern (train once, "
    "serve any prefix length; the short prefix drives cheap ANN "
    "candidate generation, the full vector reranks). Map-only like "
    "emb_random_projection: one codegen Project over the scan, zero "
    "shuffles, 4× index shrink before any quantization. Norm is the "
    "same fixed-order fold both engines run — value-exact.",
)
def emb_matryoshka_truncate(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.expr(_MRL_SPARK_N2))
    cols = [F.col("vec_id")] + [
        F.round(
            F.expr(f"cast(embedding[{j}] as double)") / norm, 6
        ).alias(f"m{j}")
        for j in range(_MRL_DIM)
    ]
    return emb.filter(F.expr(_MRL_SPARK_N2) > 0).select(*cols)


@_q(
    "catalog_feed_freshness",
    """WITH per_feed AS (
    SELECT event_type AS feed, max(epoch_us(ts)) // 86400000000 AS last_day,
           count(*) AS n_events
    FROM events GROUP BY event_type),
corpus AS (SELECT max(last_day) AS max_day FROM per_feed)
SELECT feed, last_day, n_events,
       cast(max_day - last_day as bigint) AS days_behind
FROM per_feed, corpus""",
    "ingest-feed freshness monitoring: per feed, the last event day and "
    "its lag behind the freshest feed — the SLA dashboard that catches a "
    "stalled upstream before it starves the corpus. Deliberately "
    "anchored to the corpus max (data-derived), never wall-clock now(), "
    "so the result is deterministic and replay-safe. One hash-agg on the "
    "tiny feed key + a broadcast 1-row corpus max.",
)
def catalog_feed_freshness(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    per_feed = e.groupBy(F.col("event_type").alias("feed")).agg(
        F.expr("max(ts DIV 1000) DIV 86400000000").alias("last_day"),
        F.count("*").alias("n_events"),
    )
    corpus = per_feed.agg(F.max("last_day").alias("max_day"))
    return per_feed.join(F.broadcast(corpus)).select(
        "feed",
        "last_day",
        "n_events",
        (F.col("max_day") - F.col("last_day")).cast("bigint").alias("days_behind"),
    )


@_q(
    "join_null_safe",
    """WITH a AS (
    SELECT nullif(event_type, 'error') AS k, count(*) AS n_a,
           cast(sum(cast(value as decimal(18,6))) as double) AS sum_a
    FROM events WHERE user_id % 2 = 0 GROUP BY 1),
b AS (
    SELECT nullif(event_type, 'error') AS k, count(*) AS n_b
    FROM events WHERE user_id % 2 = 1 GROUP BY 1)
SELECT a.k, n_a, sum_a, n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k""",
    "null-safe equi-join (Spark <=> / SQL IS NOT DISTINCT FROM): the "
    "NULL key row MATCHES across sides instead of silently vanishing — "
    "the semantic that plain equality gets wrong when a join key carries "
    "sentinel NULLs (here the 'error' feed). Null-safe equality is still "
    "a hash-join key in Spark (NULL hashes to a bucket like any value), "
    "so the plan is an ordinary shuffled equi-join, not a theta join.",
)
def join_null_safe(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.expr("nullif(event_type, 'error')")
    a = (
        e.filter(F.col("user_id") % 2 == 0)
        .groupBy(k.alias("k"))
        .agg(
            F.count("*").alias("n_a"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_a"),
        )
    )
    b = (
        e.filter(F.col("user_id") % 2 == 1)
        .groupBy(k.alias("k"))
        .agg(F.count("*").alias("n_b"))
    )
    return a.alias("a").join(
        b.alias("b"), F.col("a.k").eqNullSafe(F.col("b.k"))
    ).select(F.col("a.k").alias("k"), "n_a", "sum_a", "n_b")


_Z_BITS = 8


def _duck_zorder(a: str, b: str, bits: int = _Z_BITS) -> str:
    return (
        f"list_reduce(list_prepend(cast(0 as bigint),"
        f" list_transform(generate_series(0, {bits - 1}), i ->"
        f" ((({a} >> i) & 1) << (2 * i)) + ((({b} >> i) & 1) << (2 * i + 1)))),"
        " (acc, v) -> acc + v)"
    )


@_q(
    "scalar_zorder_key",
    f"""SELECT o_orderkey,
       o_orderkey % 256 AS na, o_custkey % 256 AS nb,
       {_duck_zorder("(o_orderkey % 256)", "(o_custkey % 256)")} AS z
FROM orders""",
    "Morton / Z-order key arithmetic exposed as a checked query: the "
    "same bit-interleave expression sinks.write_zorder_parquet sorts by "
    "(sources/sinks.py zorder_key), verified value-exact against the "
    "oracle's re-derivation — the engine-neutrality proof for the "
    "multi-column data-skipping layout. Pure codegen fold over bit ops, "
    "map-only, zero shuffles.",
)
def scalar_zorder_key(spark, sf_dir):
    from .sources.sinks import zorder_key

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 256).alias("na"),
        (F.col("o_custkey") % 256).alias("nb"),
    )
    return o.withColumn("z", zorder_key("na", "nb", _Z_BITS))


@_q(
    "mm_pixel_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%48+8 AS w, (doc_id*13)%32+8 AS h
    FROM documents),
px AS (
    SELECT doc_id, w, h, tx.x AS x, ty.y AS y
    FROM d,
         unnest(generate_series(0, w-1)) AS tx(x),
         unnest(generate_series(0, h-1)) AS ty(y)),
s AS (
    SELECT doc_id, w, h,
           sum((doc_id*7 + x*3 + y*5) % 256) AS sr,
           sum((doc_id*11 + x + 2*y) % 256) AS sg,
           sum((doc_id*3 + 5*x + y) % 256) AS sb,
           count(*) AS n
    FROM px GROUP BY doc_id, w, h)
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       round(sr / cast(n as double), 6) AS mean_r,
       round(sg / cast(n as double), 6) AS mean_g,
       round(sb / cast(n as double), 6) AS mean_b
FROM s""",
    "REAL pixel decode, end to end: each doc gets a genuine truecolor "
    "PNG (actual filtered scanlines — all five PNG filter types in "
    "rotation — zlib-compressed IDAT), and the decode path walks chunks, "
    "inflates, UNFILTERS, and reduces pixels to per-channel means — "
    "stdlib-only, no codec dependency (functions/multimodal.py "
    "decode_png_pixels). Pixel values are a pure function of (doc_id, "
    "x, y), so the oracle states the expected means ARITHMETICALLY over "
    "a generate_series pixel grid while Spark earns them through real "
    "format bytes. Map-only: payloads live inside the Arrow stage, only "
    "(doc_id, dims, 3 doubles) survive — pixel statistics at 100 TB "
    "without moving pixels.",
)
def mm_pixel_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.pixel_stats(multimodal.synthesize_png_pixels(d))


@_q(
    "mm_png_interlaced_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%48+8 AS w, (doc_id*13)%32+8 AS h
    FROM documents),
px AS (
    SELECT doc_id, w, h, tx.x AS x, ty.y AS y
    FROM d,
         unnest(generate_series(0, w-1)) AS tx(x),
         unnest(generate_series(0, h-1)) AS ty(y)),
s AS (
    SELECT doc_id, w, h,
           sum((doc_id*7 + x*3 + y*5) % 256) AS sr,
           sum((doc_id*11 + x + 2*y) % 256) AS sg,
           sum((doc_id*3 + 5*x + y) % 256) AS sb,
           count(*) AS n
    FROM px GROUP BY doc_id, w, h)
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       round(sr / cast(n as double), 6) AS mean_r,
       round(sg / cast(n as double), 6) AS mean_g,
       round(sb / cast(n as double), 6) AS mean_b
FROM s""",
    "Adam7 INTERLACED PNG decode — the progressive-rendering variant "
    "real crawls contain (PNG spec §8.2): the same pixel content as "
    "mm_pixel_stats arrives as seven independently-filtered reduced "
    "passes in one IDAT stream, and the decoder inflates once, "
    "unfilters each pass with its own zero previous row, and re-weaves "
    "the pass pixels onto the full-resolution grid before the channel "
    "means. Tests assert interlaced == sequential per-pixel for the "
    "same doc, so the oracle is the identical arithmetic. Map-only.",
)
def mm_png_interlaced_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.pixel_stats(
        multimodal.synthesize_png_pixels_interlaced(d)
    )


@_q(
    "text_readability",
    f"""SELECT doc_id,
       {text.ORACLE_EXPRS["n_tokens"][1]} AS n_words,
       {text.ORACLE_EXPRS["n_sentences"][1]} AS n_sentences,
       {text.ORACLE_EXPRS["n_syllables"][1]} AS n_syllables,
       {text.ORACLE_EXPRS["fk_grade"][1]} AS fk_grade
FROM documents""",
    "Flesch-Kincaid readability grade as a curation signal (filter "
    "too-simple or unreadably dense text; mix by difficulty for "
    "curriculum ordering): words, sentence terminators, and vowel-group "
    "syllable proxies are three regexp counts over the scan — integer "
    "ingredients, double divisions with literal coefficients, all "
    "whole-stage codegen, zero shuffles, zero Python.",
)
def text_readability(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(text.ORACLE_EXPRS["n_tokens"][0]).alias("n_words"),
        F.expr(text.ORACLE_EXPRS["n_sentences"][0]).alias("n_sentences"),
        F.expr(text.ORACLE_EXPRS["n_syllables"][0]).alias("n_syllables"),
        F.expr(text.ORACLE_EXPRS["fk_grade"][0]).alias("fk_grade"),
    )


@_q(
    "text_tokenizer_fertility",
    f"""SELECT lang,
       cast(sum({text.ORACLE_EXPRS["n_tokens"][1]}) as bigint) AS n_words,
       cast(sum({text.ORACLE_EXPRS["n_bpe_tokens"][1]}) as bigint)
           AS n_subwords,
       round(sum({text.ORACLE_EXPRS["n_bpe_tokens"][1]})
             / cast(sum({text.ORACLE_EXPRS["n_tokens"][1]}) as double), 6)
           AS fertility
FROM documents GROUP BY lang""",
    "tokenizer fertility by language — subword tokens per word, the "
    "standard multilingual tokenizer-equity metric (a language with 2× "
    "fertility pays 2× the context budget per sentence; curation mixes "
    "and per-language packing budgets should see this number). Uses the "
    "JVM BPE-ish pretokenizer counts so the aggregate stays whole-stage "
    "codegen (zero Python) and oracle-exact; one hash-agg on the tiny "
    "lang key.",
)
def text_tokenizer_fertility(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    nt = F.expr(text.ORACLE_EXPRS["n_tokens"][0])
    nb = F.expr(text.ORACLE_EXPRS["n_bpe_tokens"][0])
    return (
        d.select("lang", nt.alias("nt"), nb.alias("nb"))
        .groupBy("lang")
        .agg(
            F.sum("nt").cast("bigint").alias("n_words"),
            F.sum("nb").cast("bigint").alias("n_subwords"),
            F.round(
                F.sum("nb") / F.sum("nt").cast("double"), 6
            ).alias("fertility"),
        )
    )


@_q(
    "mm_gif_pixel_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%48+8 AS w, (doc_id*13)%32+8 AS h
    FROM documents),
px AS (
    SELECT doc_id, w, h,
           (doc_id*5 + tx.x*7 + ty.y*11) % 256 AS idx
    FROM d,
         unnest(generate_series(0, w-1)) AS tx(x),
         unnest(generate_series(0, h-1)) AS ty(y)),
s AS (
    SELECT doc_id, w, h,
           sum(idx) AS sr,
           sum((idx*2) % 256) AS sg,
           sum((idx*3) % 256) AS sb,
           count(*) AS n
    FROM px GROUP BY doc_id, w, h)
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       round(sr / cast(n as double), 6) AS mean_r,
       round(sg / cast(n as double), 6) AS mean_g,
       round(sb / cast(n as double), 6) AS mean_b
FROM s""",
    "REAL pixel decode #2 — GIF/LZW: each doc gets a genuine GIF89a "
    "(256-entry palette + variable-width LZW with CLEAR/END codes and "
    "dictionary growth, encoded by a real LZW compressor), and the "
    "decode path walks the container, inflates the LZW stream, and "
    "reduces palette-mapped pixels to channel means — stdlib-only "
    "(functions/multimodal.py _lzw_encode/_lzw_decode). With the PNG "
    "path this makes two of the three image container formats "
    "pixel-real; JPEG (IDCT) remains the codec-library boundary. Oracle "
    "re-derives the means arithmetically from the palette formula over "
    "a generate_series grid. Map-only, NULL on corruption.",
)
def mm_gif_pixel_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.gif_pixel_stats(multimodal.synthesize_gif_pixels(d))


@_q(
    "mm_jpeg_pixel_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%6+2 AS bw, (doc_id*13)%4+2 AS bh
    FROM documents),
blk AS (
    SELECT doc_id, bw, bh,
           ((doc_id*3 + tk.k*5) % 225) - 112 AS lev
    FROM d, unnest(generate_series(0, bw*bh - 1)) AS tk(k)),
s AS (
    SELECT doc_id, bw, bh, sum(lev) AS slev, count(*) AS nb
    FROM blk GROUP BY doc_id, bw, bh)
SELECT doc_id, cast(bw*8 as int) AS width, cast(bh*8 as int) AS height,
       round((64*(slev + 128*nb)) / cast(bw*8*bh*8 as double), 6)
           AS mean_gray
FROM s""",
    "REAL pixel decode #3 — baseline JPEG (ITU-T T.81, from spec, no "
    "codec lib): each doc gets a genuine grayscale JPEG — DQT, SOF0, "
    "canonical Huffman DHT, entropy-coded scan with byte stuffing — and "
    "the decode path walks segments, Huffman-decodes the scan (DC "
    "prediction + EXTEND, AC run/size with ZRL/EOB), dequantizes "
    "through zigzag, applies a full 2-D IDCT (numpy 8x8 basis product), "
    "level-shifts, and reduces to the gray mean. The oracle corpus is "
    "DC-only blocks — the IDCT of a DC-only block is EXACTLY flat "
    "(level*q0/8 + 128 with q0=8), so the oracle states the mean with "
    "integer arithmetic; blocks with AC coefficients are pinned against "
    "an independent float IDCT in tests. Map-only; the remaining "
    "boundaries (progressive, subsampled chroma, 16-bit DQT) reject to "
    "NULL — 4:4:4 color decodes via mm_jpeg_color_stats. This closes "
    "the JPEG boundary documented since round 2 "
    "(multimodal.py _decode_jpeg was header-only).",
)
def mm_jpeg_pixel_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.jpeg_pixel_stats(multimodal.synthesize_jpeg_pixels(d))


@_q(
    "mm_jpeg_color_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%6+2 AS bw, (doc_id*13)%4+2 AS bh
    FROM documents),
blk AS (
    SELECT doc_id, bw, bh,
           ((doc_id*3 + tk.k*5) % 225) - 112 + 128 AS y,
           ((doc_id*7 + tk.k*11) % 225) - 112 AS cb,
           ((doc_id*5 + tk.k*17) % 225) - 112 AS cr
    FROM d, unnest(generate_series(0, bw*bh - 1)) AS tk(k)),
rgb AS (
    SELECT doc_id, bw, bh,
           LEAST(255, GREATEST(0,
               y + cast(floor((91881*cr + 32768)/65536.0) as bigint))) AS r,
           LEAST(255, GREATEST(0,
               y - cast(floor((22554*cb + 46802*cr + 32768)/65536.0)
                        as bigint))) AS g,
           LEAST(255, GREATEST(0,
               y + cast(floor((116130*cb + 32768)/65536.0) as bigint))) AS b
    FROM blk),
s AS (
    SELECT doc_id, bw, bh,
           sum(r) AS sr, sum(g) AS sg, sum(b) AS sb, count(*) AS nb
    FROM rgb GROUP BY doc_id, bw, bh)
SELECT doc_id, cast(bw*8 as int) AS width, cast(bh*8 as int) AS height,
       round((64*sr) / cast(bw*8*bh*8 as double), 6) AS mean_r,
       round((64*sg) / cast(bw*8*bh*8 as double), 6) AS mean_g,
       round((64*sb) / cast(bw*8*bh*8 as double), 6) AS mean_b
FROM s""",
    "REAL pixel decode #4 — baseline COLOR JPEG (ITU-T T.81, 3-component "
    "4:4:4, from spec, no codec lib): each doc gets a genuine color JPEG "
    "— two DQTs (luma id 0, chroma id 1), SOF0 with three 0x11-sampled "
    "components, four canonical Huffman tables (DC/AC x luma/chroma), "
    "and an interleaved Y-Cb-Cr MCU scan with independent DC predictors "
    "— and the decode path Huffman-decodes every component block, "
    "dequantizes, IDCTs, and converts through the libjpeg-style 16-bit "
    "fixed-point YCbCr->RGB matrix (pure integer: floor-shift + clamp), "
    "reducing to per-channel means. DC-only blocks keep every pixel "
    "exactly flat, so the oracle restates the whole pipeline including "
    "the color conversion in exact integer arithmetic "
    "(floor((fix*c + 32768)/65536)). Extends mm_jpeg_pixel_stats "
    "(grayscale) to color; progressive and subsampled chroma remain the "
    "documented boundaries. Map-only, NULL on corruption.",
)
def mm_jpeg_color_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.jpeg_color_stats(multimodal.synthesize_jpeg_color_pixels(d))


@_q(
    "mm_png16_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*5)%13+4 AS w, (doc_id*11)%9+4 AS h
    FROM documents),
px AS (
    SELECT doc_id, w, h,
           (doc_id*977 + (tk.k % w)*2500 + (tk.k // w)*700) % 65536 AS v
    FROM d, unnest(generate_series(0, w*h - 1)) AS tk(k))
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       CAST(sum(v) AS BIGINT) AS sum_v,
       cast(min(v) as int) AS min_v, cast(max(v) as int) AS max_v
FROM px GROUP BY doc_id, w, h""",
    "REAL pixel decode — 16-BIT grayscale PNG (depth 16, color type 0: "
    "elevation maps, medical exports, TYPE_USHORT_GRAY): each doc gets "
    "a genuine 16-bit PNG — big-endian 2-byte samples, the five PNG "
    "filter types in rotation (filters act on BYTES at the 2-byte pixel "
    "distance, spec §9.2), zlib IDAT — and the decode path walks "
    "chunks, inflates, unfilters at bpp=2 and reassembles the 16-bit "
    "samples exactly. All-integer outputs (sum/min/max — no float "
    "rounding anywhere) keep the oracle literal-exact; the oracle "
    "restates the planted sample grid arithmetically. Round-9 "
    "counterpart of the foreign gray16.png fixture (javax encoder), "
    "which pins the same decoder against independent filter choices. "
    "Map-only, NULL on corruption.",
)
def mm_png16_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.png16_stats(multimodal.synthesize_png16_pixels(d))


@_q(
    "mm_png16i_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*5)%13+4 AS w, (doc_id*11)%9+4 AS h
    FROM documents),
px AS (
    SELECT doc_id, w, h,
           (doc_id*977 + (tk.k % w)*2500 + (tk.k // w)*700) % 65536 AS v
    FROM d, unnest(generate_series(0, w*h - 1)) AS tk(k))
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       CAST(sum(v) AS BIGINT) AS sum_v,
       cast(min(v) as int) AS min_v, cast(max(v) as int) AS max_v
FROM px GROUP BY doc_id, w, h""",
    "REAL pixel decode — ADAM7-INTERLACED 16-bit grayscale PNG (r10; "
    "the form javax's progressive writer emits for TYPE_USHORT_GRAY): "
    "each doc gets a genuine interlaced 16-bit PNG — seven reduced "
    "passes, each independently filtered with the five filter types in "
    "rotation — and the decoder unfilters every pass at bpp=2 and "
    "accumulates the 16-bit samples exactly (sum/min/max are position-"
    "independent, so interlaced passes need no grid reweave). Same "
    "planted sample grid as mm_png16_stats, so the two queries "
    "cross-check: sequential and interlaced encodings of one image "
    "must produce identical integer stats. Foreign twin gray16i.png "
    "(javax progressive encoder). Map-only, NULL on corruption.",
)
def mm_png16i_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.png16_stats(
        multimodal.synthesize_png16_pixels(d, interlaced=True)
    )


@_q(
    "mm_jpeg_cmyk_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%6+2 AS bw, (doc_id*13)%4+2 AS bh
    FROM documents),
blk AS (
    SELECT doc_id, bw, bh,
           ((doc_id*3 + tk.k*5)  % 225) - 112 AS c0,
           ((doc_id*4 + tk.k*7)  % 225) - 112 AS c1,
           ((doc_id*5 + tk.k*9)  % 225) - 112 AS c2,
           ((doc_id*6 + tk.k*11) % 225) - 112 AS c3
    FROM d, unnest(generate_series(0, bw*bh - 1)) AS tk(k))
SELECT doc_id, cast(bw*8 as int) AS width, cast(bh*8 as int) AS height,
       CAST(64*(sum(c0) + 128*count(*)) AS BIGINT) AS sum_c,
       CAST(64*(sum(c1) + 128*count(*)) AS BIGINT) AS sum_m,
       CAST(64*(sum(c2) + 128*count(*)) AS BIGINT) AS sum_y,
       CAST(64*(sum(c3) + 128*count(*)) AS BIGINT) AS sum_k
FROM blk GROUP BY doc_id, bw, bh""",
    "REAL pixel decode — 4-component CMYK-convention baseline JPEG "
    "(print/Photoshop exports): each doc gets a genuine 4-component "
    "JPEG — Adobe APP14 (transform=0), SOF0 with four 0x11-sampled "
    "components, interleaved 4-block MCUs with independent DC "
    "predictors — and the decode path Huffman-decodes all four planes "
    "through the same nc-generic MCU walk as gray/color and returns the "
    "STORED band sums (no color-transform guess: which bands mean what "
    "is APP14 metadata, so raw plane sums are the honest primitive). "
    "DC-only blocks are exactly flat (level+128 at q0=8), so the oracle "
    "states every band sum in integer arithmetic. Foreign twins: "
    "cmyk4.jpg / adobe_ycck.jpg (javax-encoded raw 4-band raster). "
    "Map-only, NULL on corruption.",
)
def mm_jpeg_cmyk_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.jpeg_cmyk_stats(multimodal.synthesize_jpeg_cmyk_pixels(d))


@_q(
    "mm_flac_sample_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id % 100) + 20 AS n FROM documents),
s AS (
    SELECT doc_id, n,
           CASE WHEN doc_id % 4 = 0
                THEN ((doc_id*13) % 4096) - 2048
                ELSE ((doc_id*13 + ti.i*ti.i*7) % 4096) - 2048
           END AS v
    FROM d, unnest(generate_series(0, n-1)) AS ti(i)),
agg AS (
    SELECT doc_id, n,
           sum(v) AS total, sum(abs(v)) AS abs_total, max(abs(v)) AS peak
    FROM s GROUP BY doc_id, n)
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
            WHEN 3 THEN 44100 ELSE 48000 END AS sample_rate,
       cast(n as bigint) AS n_samples,
       round(total / cast(n as double), 6) AS mean_amp,
       round(abs_total / cast(n as double), 6) AS mean_abs,
       cast(peak as int) AS peak
FROM agg""",
    "REAL audio sample decode #2 — FLAC (RFC 9639, from spec, no codec "
    "lib): each doc gets a genuine FLAC — STREAMINFO plus one frame "
    "whose header carries real sync/blocksize/rate codes, a UTF-8-coded "
    "frame number and a passing CRC-8, and whose mono 16-bit subframe "
    "is CONSTANT (doc_id%4=0), VERBATIM (%4=1), FIXED order 0-4 (%4=2) "
    "or LPC order 2 with quantized coefficients and shift (%4=3) — all "
    "with genuine Rice-coded residuals and a passing "
    "frame CRC-16. The decode path re-parses all of it, verifies both "
    "CRCs, bit-unpacks the samples, decodes partitioned-Rice residuals "
    "and reconstructs through the fixed predictors (RFC 9639 §9.2.2/"
    "§9.2.7), and reduces to amplitude statistics. All three subframe "
    "types are lossless integer arithmetic so the oracle states the "
    "stats exactly (FIXED frames carry the same sample formula as "
    "VERBATIM, just encoded predictively). With LPC decoded, the FLAC "
    "subframe surface is COMPLETE — no remaining codec boundary. "
    "Map-only.",
)
def mm_flac_sample_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.flac_sample_stats(multimodal.synthesize_flac_samples(d))


_TOKEN_BUDGET = 3_000  # per-language token budget for the gate corpus


@_q(
    "pipeline_token_budget_mixture",
    f"""WITH toks AS (
    SELECT doc_id, lang,
           {text.ORACLE_EXPRS["n_tokens"][1]} AS n_tok,
           {_duck_h48("concat(cast(doc_id as varchar), ':budget')")} AS hsel
    FROM documents),
ordered AS (
    SELECT doc_id, lang, n_tok,
           sum(n_tok) OVER (PARTITION BY lang
                            ORDER BY hsel, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum_tok
    FROM toks)
SELECT lang, count(*) AS n_docs,
       cast(max(cum_tok) as bigint) AS tokens_admitted
FROM ordered
WHERE cum_tok <= {_TOKEN_BUDGET}
GROUP BY lang""",
    "exact per-language TOKEN budget admission (not a rate): docs enter "
    "in deterministic salted-hash order and are admitted while the "
    "language's running token sum stays under budget — 'exactly ≤1M "
    "tokens of each language', the mixture spec training recipes "
    "actually state (rate-based mixtures like "
    "pipeline_temperature_mixture only hit budgets in expectation). "
    "One per-lang partitioned window over integer token counts — "
    "deterministic, partition-layout-independent, reproducible; a new "
    "corpus drop changes admissions only after the hash positions it.",
)
def pipeline_token_budget_mixture(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.expr(text.ORACLE_EXPRS["n_tokens"][0]).alias("n_tok"),
        F.expr(_spark_h48("concat(cast(doc_id as string), ':budget')")).alias(
            "hsel"
        ),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("hsel", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = toks.select(
        "lang", "n_tok", F.sum("n_tok").over(w).alias("cum_tok")
    )
    return (
        ordered.filter(F.col("cum_tok") <= _TOKEN_BUDGET)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("cum_tok").cast("bigint").alias("tokens_admitted"),
        )
    )


@_q(
    "stream_gapfill_locf",
    """WITH daily AS (
    SELECT user_id, epoch_us(ts) // 86400000000 AS day,
           cast(sum(cast(value as decimal(18,6))) as double) AS v,
           count(*) AS n
    FROM events WHERE user_id < 30 GROUP BY 1, 2),
bounds AS (
    SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
days AS (
    SELECT user_id, td.day AS day
    FROM bounds, unnest(generate_series(d0, d1)) AS td(day)),
filled AS (
    SELECT days.user_id, days.day, daily.v, daily.n
    FROM days LEFT JOIN daily
      ON days.user_id = daily.user_id AND days.day = daily.day)
SELECT user_id, day,
       coalesce(v, last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS v_filled,
       (n IS NULL) AS is_gap
FROM filled""",
    "calendar gap-fill + LOCF (last observation carried forward): each "
    "user's daily series is densified over their [first, last] activity "
    "range via sequence+explode, missing days marked and filled by the "
    "running last non-NULL value — the standard time-series "
    "regularization step before feature windows or charting. Scale "
    "shape: per-user day ranges bound the explosion (never a global "
    "calendar cross join), the join and the LOCF window share the "
    "user_id partitioning, and the fill is one pass — no per-gap "
    "self-join.",
)
def stream_gapfill_locf(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    daily = (
        e.select(
            "user_id",
            F.expr("ts DIV 86400000000000").alias("day"),
            F.col("value").cast("decimal(18,6)").alias("dv"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.sum("dv").cast("double").alias("v"),
            F.count("*").alias("n"),
        )
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    days = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    filled = days.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "user_id",
        "day",
        F.coalesce(F.col("v"), F.last("v", ignorenulls=True).over(w)).alias(
            "v_filled"
        ),
        F.col("n").isNull().alias("is_gap"),
    )


_ROLL_W = 10  # trailing-frame width for the rolling regression


@_q(
    "window_rolling_slope",
    f"""WITH ev AS (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           cast(value as decimal(18,6)) AS y,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS x
    FROM events WHERE user_id < 40),
f AS (
    SELECT user_id, event_id, x,
           count(*) OVER w AS n,
           cast(sum(x) OVER w as bigint) AS sx,
           cast(sum(y) OVER w as double) AS sy,
           cast(sum(x * x) OVER w as bigint) AS sxx,
           cast(sum(x * y) OVER w as double) AS sxy
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY x
                 ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW))
SELECT user_id, event_id,
       round((n * sxy - sx * sy) / (n * sxx - cast(sx as double) * sx), 6)
           AS slope
FROM f WHERE n = {_ROLL_W}""",
    "rolling regression — the trend-feature primitive (drift alarms, "
    "trading signals, telemetry slopes): at every event, the OLS slope "
    "of value against event rank over the user's trailing "
    f"{_ROLL_W}-row frame. The sufficient statistics are frame "
    "aggregates — bigint sums for the integer rank moments, DECIMAL "
    "sums for the value moments so peer order inside the frame cannot "
    "drift floats — and the closed-form solve is per-row scalar "
    "arithmetic on exactly equal inputs (the agg_ols_fit formulation "
    "made windowed). One per-user window pass; no self-joins, state "
    "bounded by the frame.",
)
def window_rolling_slope(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    wrank = Window.partitionBy("user_id").orderBy("us", "event_id")
    ev = e.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("us"),
        F.col("value").cast("decimal(18,6)").alias("y"),
    ).withColumn("x", F.row_number().over(wrank))
    wf = (
        Window.partitionBy("user_id")
        .orderBy("x")
        .rowsBetween(-(_ROLL_W - 1), Window.currentRow)
    )
    f = ev.select(
        "user_id",
        "event_id",
        F.count("*").over(wf).alias("n"),
        F.sum("x").over(wf).cast("bigint").alias("sx"),
        F.sum("y").over(wf).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(wf).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(wf).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    return f.filter(F.col("n") == _ROLL_W).select(
        "user_id", "event_id", F.round(slope, 6).alias("slope")
    )


_TB_CAP = 3                   # token-bucket capacity
_TB_REFILL_US = 300_000_000   # one token per 5 minutes of gap


@_q(
    "stream_token_bucket",
    f"""WITH RECURSIVE ev AS (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS rn
    FROM events),
st AS (
    SELECT user_id, event_id, us, rn,
           TRUE AS admitted, {_TB_CAP - 1} AS tokens_after
    FROM ev WHERE rn = 1
    UNION ALL
    SELECT e.user_id, e.event_id, e.us, e.rn,
           least({_TB_CAP}, st.tokens_after
                 + (e.us - st.us) // {_TB_REFILL_US}) >= 1 AS admitted,
           CASE WHEN least({_TB_CAP}, st.tokens_after
                           + (e.us - st.us) // {_TB_REFILL_US}) >= 1
                THEN least({_TB_CAP}, st.tokens_after
                           + (e.us - st.us) // {_TB_REFILL_US}) - 1
                ELSE least({_TB_CAP}, st.tokens_after
                           + (e.us - st.us) // {_TB_REFILL_US})
           END AS tokens_after
    FROM st JOIN ev e ON e.user_id = st.user_id AND e.rn = st.rn + 1)
SELECT event_id, user_id, admitted, cast(tokens_after as int)
           AS tokens_after
FROM st""",
    "per-key token-bucket rate limiting — a genuinely NON-associative "
    "stateful stream operator (each decision depends on the previous "
    "decision, so no window/aggregate can express it): every user's "
    "bucket starts full at "
    f"{_TB_CAP}, refills one token per {_TB_REFILL_US // 60_000_000} "
    "minutes of inter-event gap (integer floor), and an event is "
    "admitted iff a token is available, consuming it. Spark runs the "
    "sequential transition per user inside applyInPandas — state is "
    "O(1) per key, partitioning is per-user, the exact shape "
    "applyInPandasWithState runs unbounded (streaming/ has the "
    "readStream twin of this pattern). The oracle drives the SAME "
    "integer transition through DuckDB's recursive CTE (one iteration "
    "per event rank), so the hash match certifies a stateful operator "
    "SQL windows cannot express.",
)
def stream_token_bucket(spark, sf_dir):
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("us")
    )
    schema = StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("user_id", LongType(), False),
            StructField("admitted", BooleanType(), False),
            StructField("tokens_after", IntegerType(), False),
        ]
    )

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["us", "event_id"])
        tokens = _TB_CAP
        prev_us = None
        admitted = []
        after = []
        for us in pdf["us"]:
            if prev_us is not None:
                tokens = min(
                    _TB_CAP, tokens + (int(us) - prev_us) // _TB_REFILL_US
                )
            ok = tokens >= 1
            if ok:
                tokens -= 1
            admitted.append(ok)
            after.append(tokens)
            prev_us = int(us)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"].values,
                "user_id": pdf["user_id"].values,
                "admitted": admitted,
                "tokens_after": after,
            }
        )

    return ev.groupBy("user_id").applyInPandas(bucket, schema)


_LATE_ALLOW_US = 300_000_000  # 5-minute allowed lateness


@_q(
    "stream_late_data_accounting",
    f"""WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
           epoch_us(ts) + ((event_id * 37) % 900) * 1000000 AS arrive
    FROM events),
wmk AS (
    SELECT event_type, us,
           max(us) OVER (PARTITION BY user_id ORDER BY arrive, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS wm
    FROM ev)
SELECT event_type, n_events, CAST(n_late AS BIGINT) AS n_late,
       CAST((n_late * 1000000) // n_events AS BIGINT) AS late_ppm
FROM (SELECT event_type, count(*) AS n_events,
             sum(CASE WHEN wm IS NOT NULL AND us < wm - {_LATE_ALLOW_US}
                      THEN 1 ELSE 0 END) AS n_late
      FROM wmk GROUP BY event_type)""",
    "n_late is CAST to BIGINT: DuckDB sum(int) returns HUGEINT, and "
    "across r1-r7 the only two driver-red/locally-green rows were "
    "EXACTLY the only two driver-checked oracles surfacing raw HUGEINT "
    "output columns (this one and tpch_q12_late_priority; all 280 "
    "driver-green oracles surface none) — the driver's normalizer "
    "renders HUGEINT differently from Spark's BIGINT. "
    "watermark late-data accounting — the audit every production "
    "streaming pipeline runs before choosing its allowed-lateness "
    "knob: events are replayed in a deterministic arrival order "
    "(event time plus a per-event modular network delay of 0-899s), a "
    "per-user watermark tracks the running max event time of "
    "previously-ARRIVED events, and an event counts late when it "
    "arrives with event time older than watermark minus the 5-minute "
    "allowance — exactly the tuple Structured Streaming's "
    "withWatermark would drop. Per-key watermarks keep the state "
    "bounded and the partitioning per-user (a global watermark would "
    "serialize the stream); one window pass + one tiny-key aggregate, "
    "nothing corpus-global.",
)
def stream_late_data_accounting(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("us"),
        F.expr("ts div 1000 + ((event_id * 37) % 900) * 1000000").alias(
            "arrive"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrive", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wmk = ev.select(
        "event_type", "us", F.max("us").over(w).alias("wm")
    )
    late = F.when(
        F.col("wm").isNotNull()
        & (F.col("us") < F.col("wm") - _LATE_ALLOW_US),
        1,
    ).otherwise(0)
    # the rate is an exact integer parts-per-million (truncating integer
    # division on both engines) — a rounded double division here is not
    # hash-stable across DuckDB versions
    return (
        wmk.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(late).alias("n_late"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late",
            F.expr("(n_late * 1000000) div n_events").alias("late_ppm"),
        )
    )


# =========================================================================
# Diagnostic probes for the two persistent driver-red rows
# (tpch_q12_late_priority, stream_late_data_accounting — hash-red in the
# r6 AND r7 driver runs while rows+schema match and both pass locally on
# DuckDB 1.0.0). The r7 integer restatement disproved the INTERVAL /
# rounded-division theory, so r8 instruments instead of guessing again.
#
# MECHANISM IDENTIFIED (r8, before any new driver feedback): binding all
# 282 registered oracles in DuckDB and inspecting their OUTPUT types
# shows exactly three surface a raw HUGEINT column (DuckDB's sum(int)
# result type): tpch_q12_late_priority, stream_late_data_accounting —
# the only two driver-red/locally-green rows across r1-r7 — and
# graph_pagerank, which was never driver-checked. All 280 driver-green
# oracles surface only {VARCHAR, BIGINT, INTEGER, DOUBLE, BOOLEAN,
# TINYINT}. Our local checker fetches via fetchall() (HUGEINT → Python
# int, matches Spark), but a fetch through pandas/arrow renders HUGEINT
# as float64/decimal128 — a different normalized string than Spark's
# BIGINT, flipping the value hash while rows+schema still match. That
# explains every observation: locally green, red in the driver, immune
# to both prior semantic restatements (which kept the raw sum), and no
# other query affected. Fix: CAST every surfaced integer aggregate to
# BIGINT (applied to all three; enforced repo-wide by
# tools/oracle_fragility.py's output-type gate and
# tests/test_registry.py::test_oracle_output_types_driver_safe).
#
# The probes below ran pinned in the r8 window as the controlled
# experiment around that fix — every hypothesis probe came back green
# and the canary red exactly on its HUGEINT column, driver-confirming
# the mechanism. RETIRED from the public registry in round 9 (VERDICT
# r8 #1): they live in _PROBE_REGISTRY, outside queries()/oracle_sql(),
# and tools/fetch_path_audit.py replays them every gate run.
#
#   probe_hugeint_canary — a constant 1-row query surfacing one raw
#                         HUGEINT next to its BIGINT-cast twin with
#                         equal values. Red ⇒ the driver's normalizer
#                         renders HUGEINT ≠ BIGINT, CONFIRMING the
#                         mechanism in the driver environment itself.
#   probe_epoch_sums    — exact per-column epoch fingerprints (bigint-
#                         only outputs): a red row names a raw-data /
#                         derivation divergence if one also exists
#                         (events_div: raw int64-nanos agreement;
#                         events_us: DuckDB epoch_us() vs truncating
#                         ns→µs division; events_res: sub-µs residue)
#   probe_q12_boundary  — µs/ms/s/hour bucket counts around q12's exact
#                         60-day boundary (locally 5 joined rows sit
#                         EXACTLY on it; the bucket that moves bounds
#                         any remaining comparison drift)
#   probe_late_margin   — sign-bucket histogram of the watermark margin
#                         us - (wm - allow) plus exact hi/lo-split sums
#                         of us and wm (window-max fingerprint). Note
#                         the margin buckets are locally >1s from zero
#                         and the closest arrival ties are 11.1s apart,
#                         so NO sub-second read drift could have flipped
#                         stream_late_data_accounting on this data —
#                         independent corroboration that the divergence
#                         was never in the timestamp values.
#   probe_q12_robust    — q12 with a layout-robust Spark side (dtype-
#                         dispatched epoch derivation, no ntz→timestamp
#                         cast) and a BIGINT-cast oracle; guards the
#                         remaining data-layout hypothesis (a
#                         TIMESTAMP(NANOS) generation would crash the
#                         original q12, not drift it — reproduced
#                         locally — so green original + green robust is
#                         the expected r8 outcome)
#   probe_late_robust   — stream_late_data_accounting with the oracle's
#                         µs derivation stated as epoch_ns(ts)//1000
#                         (explicit truncating division) instead of
#                         epoch_us(ts); guards the DuckDB ns→µs
#                         conversion-semantics hypothesis
#
# Expected r8 pattern if the HUGEINT mechanism is the whole story: the
# two restated reds and all fingerprint probes green; the canary's
# verdict is informative either way (red confirms; green means the
# driver normalizer handles HUGEINT and the reds' flip came from the
# prior rounds' pre-restatement constructs — then the fingerprint
# probes carry the diagnosis).
# =========================================================================

_Q12_LATE_US = 5_184_000_000_000  # 60 days in µs
_Q12_LO_US = 852_076_800_000_000  # 1997-01-01 00:00:00 UTC
_Q12_HI_US = 883_612_800_000_000  # 1998-01-01 00:00:00 UTC


def _epoch_us_col(df: DataFrame, col: str) -> "F.Column":
    """Layout-robust epoch-µs derivation for a driver timestamp column.

    The driver's parquet has shipped two physical generations (see
    catalog.normalize_events): TIMESTAMP(MICROS), which Spark reads as
    timestamp_ntz, and TIMESTAMP(NANOS), which Spark reads as int64
    nanos under the nanosAsLong legacy flag. ``cast(<bigint nanos> as
    timestamp)`` would silently treat the count as SECONDS, so the
    derivation must dispatch on the read dtype, not assume one layout.
    """
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":  # raw int64 nanos → truncating µs division
        return F.expr(f"{col} div 1000")
    # ntz/timestamp layout: session tz is UTC (catalog-enforced), so the
    # ntz→instant cast is wall-clock identity and equals DuckDB epoch_us
    return F.unix_micros(F.col(col).cast("timestamp"))


# exact sums of epoch-µs columns overflow BIGINT (60k rows × ~1e15 µs >
# 2^63) and DECIMAL outputs are unproven in the driver normalizer (no
# driver-green oracle surfaces one), so fingerprint sums are split into
# two BIGINT halves at 2^30: sum(v div 2^30) and sum(v mod 2^30). Values
# are non-negative, so Spark's truncating div/% and DuckDB's flooring
# //,% agree.
_PROBE_SPLIT = 1 << 30


def _probe_stats(df: DataFrame, v: "F.Column", tag: str) -> DataFrame:
    return (
        df.select(v.alias("v"))
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum(F.expr(f"v div {_PROBE_SPLIT}")).alias("sum_hi"),
            F.sum(F.expr(f"v % {_PROBE_SPLIT}")).alias("sum_lo"),
        )
        .select(F.lit(tag).alias("col"), "n", "min_v", "max_v", "sum_hi", "sum_lo")
    )


def _probe_stats_sql(table: str, expr: str, tag: str) -> str:
    return (
        f"SELECT '{tag}' AS col, count(*) AS n,\n"
        f"       min({expr}) AS min_v, max({expr}) AS max_v,\n"
        f"       CAST(sum(({expr}) // {_PROBE_SPLIT}) AS BIGINT) AS sum_hi,\n"
        f"       CAST(sum(({expr}) % {_PROBE_SPLIT}) AS BIGINT) AS sum_lo\n"
        f"FROM {table}"
    )


@_probe(
    "probe_hugeint_canary",
    """SELECT CAST(sum(v) AS BIGINT) AS sum_bigint,
              sum(v) AS sum_hugeint,
              count(*) AS n
       FROM (SELECT c_custkey % 7 AS v FROM customer)""",
    "driver-red mechanism canary (r7 verdict #1): one trivial aggregate "
    "surfaced twice — once CAST to BIGINT (the form every driver-green "
    "oracle uses) and once as DuckDB's raw sum(int) HUGEINT result "
    "type, with identical values by construction. The Spark side is one "
    "bigint sum aliased to both names. A red row here is a direct, "
    "single-bit confirmation that the driver's normalizer renders "
    "HUGEINT differently from BIGINT — the identified mechanism behind "
    "the only two driver-red/locally-green rows of r1-r7 (see the probe "
    "section note above).",
)
def probe_hugeint_canary(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select((F.col("c_custkey") % 7).alias("v")).agg(
        F.sum("v").alias("sum_bigint"),
        F.sum("v").alias("sum_hugeint"),
        F.count("*").alias("n"),
    )


@_probe(
    "probe_epoch_sums",
    "\nUNION ALL\n".join(
        [
            _probe_stats_sql("lineitem", "epoch_us(l_shipdate)", "l_shipdate"),
            _probe_stats_sql("orders", "epoch_us(o_orderdate)", "o_orderdate"),
            _probe_stats_sql("events", "epoch_ns(ts) // 1000", "events_div"),
            _probe_stats_sql("events", "epoch_us(ts)", "events_us"),
            _probe_stats_sql("events", "epoch_ns(ts) % 1000", "events_res"),
        ]
    ),
    "driver-red diagnostic (r7 verdict #1): exact per-column epoch "
    "fingerprints for every timestamp column the two red queries touch. "
    "One map-side-combinable aggregate per source — no shuffle beyond "
    "the 1-row partials. Decision table: l_shipdate/o_orderdate red ⇒ "
    "the date columns read differently in the driver env (layout or "
    "session semantics — see probe_q12_robust); events_div red ⇒ raw "
    "int64-nanos values disagree (data regeneration drift); events_us "
    "red with events_div green ⇒ DuckDB's epoch_us() is not truncating "
    "ns→µs division in the driver's DuckDB build (see probe_late_robust); "
    "events_res max_v > 0 ⇒ the driver events generation carries sub-µs "
    "residue (ours is µs-aligned: the row is all zeros locally).",
)
def probe_epoch_sums(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")  # normalized: ts = int64 epoch ns
    us = F.expr("ts div 1000")
    return (
        _probe_stats(li, _epoch_us_col(li, "l_shipdate"), "l_shipdate")
        .unionAll(_probe_stats(o, _epoch_us_col(o, "o_orderdate"), "o_orderdate"))
        .unionAll(_probe_stats(ev, us, "events_div"))
        .unionAll(_probe_stats(ev, us, "events_us"))
        .unionAll(_probe_stats(ev, F.expr("ts % 1000"), "events_res"))
    )


@_probe(
    "probe_q12_boundary",
    f"""SELECT count(*) AS n_total,
       CAST(sum(CASE WHEN d > {_Q12_LATE_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(sum(CASE WHEN d = {_Q12_LATE_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_eq,
       CAST(sum(CASE WHEN d >= {_Q12_LATE_US} - 1000
                 AND d < {_Q12_LATE_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_lo_1ms,
       CAST(sum(CASE WHEN d > {_Q12_LATE_US}
                 AND d <= {_Q12_LATE_US} + 1000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hi_1ms,
       CAST(sum(CASE WHEN d >= {_Q12_LATE_US} - 1000000
                 AND d < {_Q12_LATE_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_lo_1s,
       CAST(sum(CASE WHEN d > {_Q12_LATE_US}
                 AND d <= {_Q12_LATE_US} + 1000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hi_1s,
       CAST(sum(CASE WHEN d >= {_Q12_LATE_US} - 3600000000
                 AND d <= {_Q12_LATE_US} + 3600000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_hr,
       CAST(sum(d // {_PROBE_SPLIT}) AS BIGINT) AS sum_d_hi,
       CAST(sum(d % {_PROBE_SPLIT}) AS BIGINT) AS sum_d_lo
FROM (SELECT epoch_us(l_shipdate) - epoch_us(o_orderdate) AS d
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND epoch_us(l_shipdate) >= {_Q12_LO_US}
        AND epoch_us(l_shipdate) <  {_Q12_HI_US})""",
    "driver-red diagnostic (r7 verdict #1): bucket counts around "
    "tpch_q12_late_priority's exact 60-day lateness boundary over the "
    "same join and ship-date range. Locally 5 joined rows sit EXACTLY on "
    "the boundary (n_eq=5, and the ±1ms/±1s buckets are empty — the "
    "dates are day-aligned). Which bucket moves in the driver run bounds "
    "the drift magnitude: n_eq only ⇒ sub-ms comparison flip; n_hr ⇒ a "
    "timezone/DST-scale shift; sum_d ⇒ any systematic offset, with the "
    "direction. Same plan shape as q12 itself (one shuffled equi-join, "
    "pushed ship-date range, single 1-row aggregate).",
)
def probe_q12_boundary(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ship_us = _epoch_us_col(li, "l_shipdate")
    li = li.withColumn("_ship_us", ship_us).filter(
        (F.col("_ship_us") >= _Q12_LO_US) & (F.col("_ship_us") < _Q12_HI_US)
    )
    o = o.withColumn("_ord_us", _epoch_us_col(o, "o_orderdate"))
    d = (F.col("_ship_us") - F.col("_ord_us")).alias("d")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(d)
    B = _Q12_LATE_US

    def bucket(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    return j.agg(
        F.count("*").alias("n_total"),
        bucket(F.col("d") > B, "n_late"),
        bucket(F.col("d") == B, "n_eq"),
        bucket((F.col("d") >= B - 1000) & (F.col("d") < B), "n_lo_1ms"),
        bucket((F.col("d") > B) & (F.col("d") <= B + 1000), "n_hi_1ms"),
        bucket((F.col("d") >= B - 1000000) & (F.col("d") < B), "n_lo_1s"),
        bucket((F.col("d") > B) & (F.col("d") <= B + 1000000), "n_hi_1s"),
        bucket(
            (F.col("d") >= B - 3600000000) & (F.col("d") <= B + 3600000000),
            "n_hr",
        ),
        # split at 2^30 like _probe_stats: a raw sum(d) is BIGINT-safe
        # only at the pinned small SF (8.7k rows × 2.2e14 µs ≈ 1.9e18);
        # at larger testdata Spark's non-ANSI sum would wrap silently
        # while the oracle's CAST of DuckDB's HUGEINT diverges (ADVICE
        # r8). d ≥ 0 (ship after order), so div/% agree across engines.
        F.sum(F.expr(f"d div {_PROBE_SPLIT}")).alias("sum_d_hi"),
        F.sum(F.expr(f"d % {_PROBE_SPLIT}")).alias("sum_d_lo"),
    )


@_probe(
    "probe_late_margin",
    f"""WITH ev AS (
    SELECT event_id, user_id, epoch_us(ts) AS us,
           epoch_us(ts) + ((event_id * 37) % 900) * 1000000 AS arrive
    FROM events),
wmk AS (
    SELECT us,
           max(us) OVER (PARTITION BY user_id ORDER BY arrive, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS wm
    FROM ev)
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN wm IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_wm_null,
       CAST(sum(CASE WHEN wm IS NOT NULL
                 AND us - (wm - {_LATE_ALLOW_US}) < 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(sum(CASE WHEN wm IS NOT NULL
                 AND us - (wm - {_LATE_ALLOW_US}) = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_eq0,
       CAST(sum(CASE WHEN wm IS NOT NULL
                 AND us - (wm - {_LATE_ALLOW_US}) >= -1000000
                 AND us - (wm - {_LATE_ALLOW_US}) < 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_lo_1s,
       CAST(sum(CASE WHEN wm IS NOT NULL
                 AND us - (wm - {_LATE_ALLOW_US}) > 0
                 AND us - (wm - {_LATE_ALLOW_US}) <= 1000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_hi_1s,
       CAST(sum(us // {_PROBE_SPLIT}) AS BIGINT) AS sum_us_hi,
       CAST(sum(us % {_PROBE_SPLIT}) AS BIGINT) AS sum_us_lo,
       CAST(sum(CASE WHEN wm IS NULL THEN 0
                     ELSE wm // {_PROBE_SPLIT} END) AS BIGINT) AS sum_wm_hi,
       CAST(sum(CASE WHEN wm IS NULL THEN 0
                     ELSE wm % {_PROBE_SPLIT} END) AS BIGINT) AS sum_wm_lo
FROM wmk""",
    "driver-red diagnostic (r7 verdict #1): sign-bucket histogram of "
    "stream_late_data_accounting's watermark margin us - (wm - allow), "
    "plus exact hi/lo-split bigint fingerprints of the inputs (sum_us_*) "
    "and of the per-user running-max watermark itself (sum_wm_*). "
    "Decision table: "
    "sum_us red ⇒ the raw µs derivation differs (cross-check "
    "probe_epoch_sums events_us); sum_us green + sum_wm red ⇒ the window "
    "frame/ordering diverges (arrival ties — none exist locally: arrive "
    "collides only with equal event_id); sums green + n_late red ⇒ the "
    "boundary comparison flips, and n_eq0/n_lo_1s/n_hi_1s bound by how "
    "much. Same plan as the red query: one window pass, one 1-row agg.",
)
def probe_late_margin(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("us"),
        F.expr("ts div 1000 + ((event_id * 37) % 900) * 1000000").alias(
            "arrive"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrive", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wmk = ev.select("us", F.max("us").over(w).alias("wm"))
    margin = F.col("us") - (F.col("wm") - _LATE_ALLOW_US)
    has = F.col("wm").isNotNull()

    def bucket(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    return wmk.agg(
        F.count("*").alias("n_rows"),
        bucket(F.col("wm").isNull(), "n_wm_null"),
        bucket(has & (margin < 0), "n_late"),
        bucket(has & (margin == 0), "n_eq0"),
        bucket(has & (margin >= -1000000) & (margin < 0), "n_lo_1s"),
        bucket(has & (margin > 0) & (margin <= 1000000), "n_hi_1s"),
        F.sum(F.expr(f"us div {_PROBE_SPLIT}")).alias("sum_us_hi"),
        F.sum(F.expr(f"us % {_PROBE_SPLIT}")).alias("sum_us_lo"),
        F.sum(
            F.when(F.col("wm").isNull(), 0).otherwise(
                F.expr(f"wm div {_PROBE_SPLIT}")
            )
        ).alias("sum_wm_hi"),
        F.sum(
            F.when(F.col("wm").isNull(), 0).otherwise(
                F.expr(f"wm % {_PROBE_SPLIT}")
            )
        ).alias("sum_wm_lo"),
    )


@_probe(
    "probe_q12_robust",
    f"""SELECT l_returnflag,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM orders, lineitem
       WHERE o_orderkey = l_orderkey
         AND epoch_us(l_shipdate) - epoch_us(o_orderdate)
             > {_Q12_LATE_US}
         AND epoch_us(l_shipdate) >= {_Q12_LO_US}
         AND epoch_us(l_shipdate) <  {_Q12_HI_US}
       GROUP BY l_returnflag""",
    "driver-red diagnostic (r7 verdict #1): tpch_q12_late_priority with "
    "the identical oracle but a LAYOUT-ROBUST Spark side — the epoch "
    "derivation dispatches on the read dtype (_epoch_us_col) instead of "
    "unconditionally casting through timestamp, and the ship-date range "
    "is an integer predicate on the derived µs, so a TIMESTAMP(NANOS) "
    "generation of lineitem/orders (bigint under nanosAsLong, where "
    "cast-to-timestamp would misread nanos as seconds) produces the same "
    "values as the TIMESTAMP(MICROS) generation. Green here + red "
    "original ⇒ the driver testdata is the nanos generation and the "
    "restatement is exactly this derivation. The integer range predicate "
    "costs the parquet pushdown under the ntz layout (acceptable for a "
    "diagnostic; the evidenced restatement will keep the pushable form "
    "on whichever layout the probes confirm).",
)
def probe_q12_robust(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    li = li.withColumn("_ship_us", _epoch_us_col(li, "l_shipdate")).filter(
        (F.col("_ship_us") >= _Q12_LO_US) & (F.col("_ship_us") < _Q12_HI_US)
    )
    o = o.withColumn("_ord_us", _epoch_us_col(o, "o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = (F.col("_ship_us") - F.col("_ord_us")) > F.lit(_Q12_LATE_US)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_probe(
    "probe_late_robust",
    f"""WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us,
           epoch_ns(ts) // 1000 + ((event_id * 37) % 900) * 1000000 AS arrive
    FROM events),
wmk AS (
    SELECT event_type, us,
           max(us) OVER (PARTITION BY user_id ORDER BY arrive, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS wm
    FROM ev)
SELECT event_type, n_events, CAST(n_late AS BIGINT) AS n_late,
       CAST((n_late * 1000000) // n_events AS BIGINT) AS late_ppm
FROM (SELECT event_type, count(*) AS n_events,
             sum(CASE WHEN wm IS NOT NULL AND us < wm - {_LATE_ALLOW_US}
                      THEN 1 ELSE 0 END) AS n_late
      FROM wmk GROUP BY event_type)""",
    "driver-red diagnostic (r7 verdict #1): stream_late_data_accounting "
    "with an IDENTICAL Spark side but the oracle's µs derivation stated "
    "as epoch_ns(ts) // 1000 — explicit truncating integer division on "
    "the raw nanosecond count, bit-equal to the engine's ts div 1000 by "
    "construction — instead of epoch_us(ts), whose ns→µs conversion "
    "semantics (floor vs round) are the DuckDB build's choice. Green "
    "here + red original ⇒ the driver DuckDB's epoch_us rounds where "
    "ours floors, and the restatement is exactly this oracle. Identical "
    "plan to the red query.",
)
def probe_late_robust(spark, sf_dir):
    return stream_late_data_accounting(spark, sf_dir)


@_q(
    "agg_mode_and_argmax",
    """WITH vc AS (
    SELECT event_type, user_id, count(*) AS c
    FROM events GROUP BY event_type, user_id),
m AS (
    SELECT event_type, user_id AS mode_user, c AS mode_count,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY c DESC, user_id) AS rn
    FROM vc),
ranked AS (
    SELECT event_type, event_id, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value DESC, event_id DESC) AS rt,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value ASC, event_id DESC) AS rb
    FROM events),
am AS (
    SELECT t.event_type, t.event_id AS top_event_id, t.value AS top_value,
           b.event_id AS bottom_event_id, b.value AS bottom_value
    FROM (SELECT * FROM ranked WHERE rt = 1) t
    JOIN (SELECT * FROM ranked WHERE rb = 1) b
      ON t.event_type = b.event_type)
SELECT m.event_type, mode_user, mode_count,
       top_event_id, round(top_value, 6) AS top_value,
       bottom_event_id, round(bottom_value, 6) AS bottom_value
FROM m JOIN am ON m.event_type = am.event_type
WHERE rn = 1""",
    "statistical mode + argmax/argmin per group: the most active user "
    "per feed (mode over a count-then-rank rewrite with a DETERMINISTIC "
    "tie-break — the builtin mode() leaves ties engine-defined, so the "
    "rewrite is the reproducible form) joined with native max_by/min_by "
    "picking the extreme-value event ids (composite orderings make the "
    "ties deterministic there too). Two hash-aggregates on the tiny "
    "feed key; the rank window runs over per-(feed,user) counts, never "
    "raw events.",
)
def agg_mode_and_argmax(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    vc = e.groupBy("event_type", "user_id").agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("user_id")
    )
    m = (
        vc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("mode_user"),
            F.col("c").alias("mode_count"),
        )
    )
    am = e.groupBy("event_type").agg(
        F.expr("max_by(event_id, struct(value, event_id))").alias("top_event_id"),
        F.max("value").alias("top_value"),
        F.expr("min_by(event_id, struct(value, -event_id))").alias(
            "bottom_event_id"
        ),
        F.min("value").alias("bottom_value"),
    )
    return m.join(am, "event_type").select(
        "event_type",
        "mode_user",
        "mode_count",
        "top_event_id",
        F.round("top_value", 6).alias("top_value"),
        "bottom_event_id",
        F.round("bottom_value", 6).alias("bottom_value"),
    )


@_q(
    "mm_audio_sample_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id % 200) + 50 AS n FROM documents),
s AS (
    SELECT doc_id, n, ((doc_id*13 + ti.i*ti.i*7) % 4096) - 2048 AS v
    FROM d, unnest(generate_series(0, n-1)) AS ti(i)),
agg AS (
    SELECT doc_id, n,
           sum(v) AS total, sum(abs(v)) AS abs_total, max(abs(v)) AS peak
    FROM s GROUP BY doc_id, n)
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
            WHEN 3 THEN 44100 ELSE 48000 END AS sample_rate,
       cast(n as bigint) AS n_samples,
       round(total / cast(n as double), 6) AS mean_amp,
       round(abs_total / cast(n as double), 6) AS mean_abs,
       cast(peak as int) AS peak
FROM agg""",
    "REAL audio sample decode — WAV/PCM: each doc gets a genuine mono "
    "16-bit PCM WAV (actual sample bytes, not silence) and the decode "
    "path walks RIFF chunks and reduces int16 samples to amplitude "
    "statistics (mean/mean-abs/peak — the clipping/silence screens "
    "audio curation filters on). PCM needs no codec, so with PNG and "
    "GIF this makes three formats content-real; FLAC subframes and "
    "JPEG IDCT remain the codec-library boundary. Samples are a pure "
    "function of (doc_id, i) — the oracle re-derives the stats over a "
    "generate_series index in exact integer arithmetic. Map-only.",
)
def mm_audio_sample_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.wav_sample_stats(multimodal.synthesize_wav_samples(d))


@_q(
    "mm_wav_24bit_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id % 200) + 50 AS n FROM documents),
s AS (
    SELECT doc_id, n,
           ((doc_id*131 + ti.i*ti.i*37) % 2000000) - 1000000 AS v
    FROM d, unnest(generate_series(0, n-1)) AS ti(i)),
agg AS (
    SELECT doc_id, n,
           sum(v) AS total, sum(abs(v)) AS abs_total, max(abs(v)) AS peak
    FROM s GROUP BY doc_id, n)
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
            WHEN 3 THEN 44100 ELSE 48000 END AS sample_rate,
       cast(n as bigint) AS n_samples,
       round(total / cast(n as double), 6) AS mean_amp,
       round(abs_total / cast(n as double), 6) AS mean_abs,
       cast(peak as int) AS peak
FROM agg""",
    "24-BIT PCM WAV decode — the studio-master bit depth whose 3-byte "
    "two's-complement samples don't fit any fixed-width numpy dtype: "
    "the RIFF walk verifies block-align 3 / bits 24, samples exceed "
    "the int16 range by design (so a silent 16-bit misread cannot "
    "pass), and the 16-bit decoder rejects these streams (bits gate). "
    "Same amplitude-statistics contract as mm_audio_sample_stats; "
    "exact integer oracle over a generate_series index. Map-only.",
)
def mm_wav_24bit_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.wav_sample_stats(
        multimodal.synthesize_wav_24bit_samples(d),
        decoder=multimodal.decode_wav_24bit_samples,
    )


_DUPG_N = 3  # intra-doc duplicate-n-gram width (Gopher repetition family)

_SPARK_DUPG = (
    f"transform(sequence(1, size(w) - {_DUPG_N - 1}), "
    f"i -> array_join(slice(w, i, {_DUPG_N}), ' '))"
)
_DUCK_DUPG = (
    f"list_transform(generate_series(1, len(w) - {_DUPG_N - 1}), "
    f"i -> array_to_string(w[i:i+{_DUPG_N - 1}], ' '))"
)


@_q(
    "text_dup_ngrams",
    f"""WITH toks AS (
    SELECT doc_id, {hashing.duck_tokens("text")} AS w FROM documents),
grams AS (
    SELECT doc_id, unnest({_DUCK_DUPG}) AS g
    FROM toks WHERE len(w) >= {_DUPG_N}),
per_gram AS (
    SELECT doc_id, g, count(*) AS cnt, len(g) AS chars
    FROM grams GROUP BY doc_id, g),
per_doc AS (
    SELECT doc_id,
           sum(cnt) AS n_grams,
           count(*) AS n_distinct,
           sum(cnt * chars) AS total_chars,
           sum((cnt - 1) * chars) AS dup_chars
    FROM per_gram GROUP BY doc_id)
SELECT doc_id,
       cast(n_grams as bigint) AS n_grams,
       round((n_grams - n_distinct) / cast(n_grams as double), 6)
           AS dup_gram_frac,
       round(dup_chars / cast(total_chars as double), 6) AS dup_char_frac
FROM per_doc""",
    "Gopher-style repetition screen #2 — duplicate-n-gram fractions "
    "(Rae et al. 2021 table A1: 'fraction of duplicate n-grams' and "
    "'fraction of characters in duplicate n-grams'): docs that loop or "
    "repeat boilerplate show high duplicate-trigram mass long before "
    "exact dedup sees them. Complements text_repetition (top-bigram "
    "share). Plan: positioned trigrams explode from one codegen "
    "projection, then two hash aggregates — (doc_id, gram) with map-side "
    "partial combine (the explode fan-out collapses before its shuffle), "
    "then (doc_id), whose exchange carries one compact row per distinct "
    "gram. Both keys are high-cardinality (no skew); integer counts and "
    "char sums keep the two ratios oracle-exact.",
)
def text_dup_ngrams(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    grams = (
        d.select("doc_id", F.expr(hashing.spark_tokens("text")).alias("w"))
        .filter(F.expr(f"size(w) >= {_DUPG_N}"))
        .select("doc_id", F.explode(F.expr(_SPARK_DUPG)).alias("g"))
    )
    per_gram = grams.groupBy("doc_id", "g").agg(
        F.count("*").alias("cnt"), F.length("g").alias("chars")
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.count("*").alias("n_distinct"),
            F.sum(F.col("cnt") * F.col("chars")).alias("total_chars"),
            F.sum((F.col("cnt") - 1) * F.col("chars")).alias("dup_chars"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.round(
                (F.col("n_grams") - F.col("n_distinct"))
                / F.col("n_grams").cast("double"),
                6,
            ).alias("dup_gram_frac"),
            F.round(
                F.col("dup_chars") / F.col("total_chars").cast("double"), 6
            ).alias("dup_char_frac"),
        )
    )


_SPAN_N = 8    # shingle width for span detection (tokens)
_SPAN_MIN = 12  # report pairs sharing a span of at least this many tokens
_SPAN_DF_CAP = 100  # drop grams present in more docs (boilerplate guard)

_SPARK_POSG = (
    f"transform(sequence(1, size(w) - {_SPAN_N - 1}), "
    f"i -> array_join(slice(w, i, {_SPAN_N}), ' '))"
)
_DUCK_POSG = (
    f"list_transform(generate_series(1, len(w) - {_SPAN_N - 1}), "
    f"i -> array_to_string(w[i:i+{_SPAN_N - 1}], ' '))"
)


@_q(
    "dedup_substring_span",
    f"""WITH toks AS (
    SELECT doc_id, {hashing.duck_tokens("text")} AS w FROM documents),
grams AS (
    SELECT doc_id, ti.i AS pos,
           array_to_string((SELECT w FROM toks t2
                            WHERE t2.doc_id = toks.doc_id)[ti.i:ti.i+{_SPAN_N - 1}], ' ') AS g
    FROM toks, unnest(generate_series(1, len(w) - {_SPAN_N - 1})) AS ti(i)
    WHERE len(w) >= {_SPAN_N}),
keep AS (
    SELECT g FROM grams GROUP BY g
    HAVING count(DISTINCT doc_id) <= {_SPAN_DF_CAP}),
kept AS (SELECT grams.* FROM grams JOIN keep USING (g)),
hits AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.pos AS pos_a, a.pos - b.pos AS diag
    FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id),
runs AS (
    SELECT doc_a, doc_b, diag,
           pos_a - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                      ORDER BY pos_a) AS island
    FROM hits),
spans AS (
    SELECT doc_a, doc_b, count(*) + {_SPAN_N - 1} AS span_tokens
    FROM runs GROUP BY doc_a, doc_b, diag, island)
SELECT doc_a, doc_b,
       cast(max(span_tokens) as bigint) AS max_span_tokens,
       cast(count(*) as bigint) AS n_spans
FROM spans
WHERE span_tokens >= {_SPAN_MIN}
GROUP BY doc_a, doc_b""",
    "exact substring-span dedup (Lee et al. 2022, 'Deduplicating "
    "Training Data Makes Language Models Better'): find cross-doc "
    f"duplicated token runs ≥ {_SPAN_MIN} tokens. Positioned "
    f"{_SPAN_N}-gram inverted index (join work proportional to true "
    "overlap, never all-pairs), document-frequency cap on boilerplate "
    "grams, then gaps-and-islands per (pair, diagonal): consecutive "
    "matching positions collapse to one island whose length + N-1 is "
    "the shared span in tokens. The row_number window partitions on "
    "(doc_a, doc_b, diag) — high-cardinality keys, never a global "
    "window. Spark joins on the 48-bit gram hash (narrow shuffle keys) "
    "with the gram string verified post-join, so hash collisions "
    "cannot fabricate pairs; the oracle joins on the string directly.",
)
def dedup_substring_span(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.substring_span_pairs(
        d, n=_SPAN_N, min_span=_SPAN_MIN, df_cap=_SPAN_DF_CAP
    )


_HQ_W = 5_000  # histogram bin width for the quantile sketch (price units)


@_q(
    "agg_histogram_quantiles",
    f"""WITH b AS (
    SELECT o_orderpriority,
           cast(floor(o_totalprice / {_HQ_W}) as bigint) AS bin
    FROM orders),
c AS (
    SELECT o_orderpriority, bin, count(*) AS cnt
    FROM b GROUP BY o_orderpriority, bin),
cum AS (
    SELECT o_orderpriority, bin, cnt,
           sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
           sum(cnt) OVER (PARTITION BY o_orderpriority) AS total
    FROM c)
SELECT o_orderpriority,
       cast(max(total) as bigint) AS n_orders,
       cast((min(CASE WHEN cum*100 >= 50*total THEN bin END) + 1)
            * {_HQ_W} as double) AS p50_upper,
       cast((min(CASE WHEN cum*100 >= 95*total THEN bin END) + 1)
            * {_HQ_W} as double) AS p95_upper,
       cast((min(CASE WHEN cum*100 >= 99*total THEN bin END) + 1)
            * {_HQ_W} as double) AS p99_upper
FROM cum GROUP BY o_orderpriority""",
    "mergeable histogram-quantile sketch: per-priority p50/p95/p99 of "
    "order value from fixed-width bin counts. The 100 TB story: exact "
    "percentiles need a per-group global sort of the raw column, while "
    "the bin sketch is ONE map-side-combinable hash aggregate whose "
    "state is a few hundred (bin, count) pairs per group — mergeable "
    "across partitions/days exactly like the HLL partials "
    "(agg_hll_partial_merge); the cumulative pick then runs over bins, "
    "not rows. Quantile selection uses integer cross-multiplication "
    "(cum*100 >= q*total) — no float thresholds, so the bin choice and "
    "the reported upper edge are oracle-exact; accuracy is the bin "
    "width, the classic sketch trade.",
)
def agg_histogram_quantiles(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    b = o.select(
        "o_orderpriority",
        F.expr(f"cast(floor(o_totalprice / {_HQ_W}) as bigint)").alias("bin"),
    )
    c = b.groupBy("o_orderpriority", "bin").agg(F.count("*").alias("cnt"))
    wcum = Window.partitionBy("o_orderpriority").orderBy("bin")
    wtot = Window.partitionBy("o_orderpriority")
    cum = c.select(
        "o_orderpriority",
        "bin",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wtot).alias("total"),
    )

    def pick(q100: int, name: str):
        return (
            (
                F.min(
                    F.when(
                        F.col("cum") * 100 >= q100 * F.col("total"), F.col("bin")
                    )
                )
                + 1
            )
            * _HQ_W
        ).cast("double").alias(name)

    return cum.groupBy("o_orderpriority").agg(
        F.max("total").cast("bigint").alias("n_orders"),
        pick(50, "p50_upper"),
        pick(95, "p95_upper"),
        pick(99, "p99_upper"),
    )


@_q(
    "agg_bitmap_distinct",
    """WITH chunks AS (
    SELECT o_orderpriority,
           o_custkey // 63 AS chunk,
           bit_or(1::BIGINT << (o_custkey % 63)) AS bits
    FROM orders GROUP BY o_orderpriority, o_custkey // 63)
SELECT o_orderpriority,
       cast(sum(bit_count(bits)) as bigint) AS n_distinct_custs
FROM chunks GROUP BY o_orderpriority""",
    "EXACT distinct counting via bitmap chunks — the dense-integer-key "
    "scale technique between count(DISTINCT) and HLL: each (group, "
    "key DIV 63) chunk folds into one int64 bitmap with bit_or (fully "
    "map-side-combinable, commutative, mergeable across partitions and "
    "incremental refreshes), and popcount-summing the chunks gives the "
    "exact distinct count. Versus count(DISTINCT): no per-key rows "
    "survive the shuffle — 63 keys travel as 8 bytes. Versus HLL "
    "(agg_approx_cd_bounded): exact, at the cost of key-space/63 "
    "bytes per group. Pure codegen (shiftleft, bit_or, bit_count); "
    "63-bit chunks keep every literal positive in both engines.",
)
def agg_bitmap_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    chunks = (
        o.select(
            "o_orderpriority",
            F.expr("o_custkey DIV 63").alias("chunk"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(o_custkey % 63 as int))"
            ).alias("bit"),
        )
        .groupBy("o_orderpriority", "chunk")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    return chunks.groupBy("o_orderpriority").agg(
        F.expr("cast(sum(bit_count(bits)) as bigint)").alias("n_distinct_custs")
    )


@_q(
    "catalog_constraint_check",
    """SELECT 'customer_pk_unique' AS constraint_name,
       (SELECT count(*) FROM customer) AS n_checked,
       (SELECT count(*) FROM (
            SELECT c_custkey FROM customer
            GROUP BY c_custkey HAVING count(*) > 1)) AS n_violations
UNION ALL
SELECT 'orders_custkey_fk',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
UNION ALL
SELECT 'lineitem_orderkey_fk',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
UNION ALL
SELECT 'orders_totalprice_positive',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
UNION ALL
SELECT 'documents_text_nonempty',
       (SELECT count(*) FROM documents),
       (SELECT count(*) FROM documents
        WHERE text IS NULL OR length(text) = 0)""",
    "data-quality constraint gate (the deequ/dbt-test pattern a "
    "production table publish runs before promotion): PK uniqueness, "
    "two FK referential-integrity checks, a domain check, and a "
    "completeness check, each reported as (constraint, n_checked, "
    "n_violations). Plan: uniqueness is a hash-agg HAVING; FK checks "
    "are left-anti joins (broadcast when the parent fits, shuffle "
    "hash otherwise — never a NOT IN nested loop: Spark rewrites the "
    "anti-join, and the builder states it directly); domain and "
    "completeness are pushed-filter counts. All five run as one "
    "unioned job over independent subtrees.",
)
def catalog_constraint_check(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    d = _t(spark, sf_dir, "documents")

    def row(name, n_checked_df, viol_df):
        n = n_checked_df.agg(F.count("*").alias("n"))
        v = viol_df.agg(F.count("*").alias("v"))
        return (
            n.crossJoin(F.broadcast(v))
            .select(
                F.lit(name).alias("constraint_name"),
                F.col("n").alias("n_checked"),
                F.col("v").alias("n_violations"),
            )
        )

    pk_dups = (
        c.groupBy("c_custkey").agg(F.count("*").alias("k")).filter("k > 1")
    )
    fk_orders = o.join(
        c.select("c_custkey"),
        o["o_custkey"] == F.col("c_custkey"),
        "left_anti",
    )
    fk_line = li.join(
        o.select("o_orderkey").alias("po"),
        li["l_orderkey"] == F.col("po.o_orderkey"),
        "left_anti",
    )
    bad_price = o.filter("o_totalprice <= 0")
    empty_text = d.filter("text IS NULL OR length(text) = 0")

    return (
        row("customer_pk_unique", c, pk_dups)
        .unionByName(row("orders_custkey_fk", o, fk_orders))
        .unionByName(row("lineitem_orderkey_fk", li, fk_line))
        .unionByName(row("orders_totalprice_positive", o, bad_price))
        .unionByName(row("documents_text_nonempty", d, empty_text))
    )


_AUC_POS_LABEL = 5  # the "positive class" for the binary AUC demo


@_q(
    "pipeline_classifier_auc",
    f"""WITH u AS (
    SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
           embedding AS v
    FROM embeddings),
x AS (
    SELECT vec_id, label, pos,
           cast(round(cast(v[pos] as double), 7) as decimal(8,7)) AS val
    FROM u),
cent AS (
    SELECT pos, cast(sum(val) as decimal(12,7)) AS centsum
    FROM x WHERE label = {_AUC_POS_LABEL} GROUP BY pos),
scored AS (
    SELECT x.vec_id,
           max(CASE WHEN x.label = {_AUC_POS_LABEL} THEN 1 ELSE 0 END) AS y,
           sum(x.val * cent.centsum) AS score
    FROM x JOIN cent USING (pos) GROUP BY x.vec_id),
ranked AS (
    SELECT y, score,
           row_number() OVER (ORDER BY score, vec_id) AS rn
    FROM scored),
avgr AS (
    SELECT y, avg(cast(rn as double))
               OVER (PARTITION BY score) AS r
    FROM ranked)
SELECT cast(sum(y) as bigint) AS n_pos,
       cast(count(*) - sum(y) as bigint) AS n_neg,
       round((sum(CASE WHEN y = 1 THEN r ELSE 0 END)
              - sum(y) * (sum(y) + 1) / 2.0)
             / (sum(y) * (count(*) - sum(y))), 6) AS auc
FROM avgr""",
    "exact ROC-AUC of a prototype classifier over the full corpus — the "
    "eval loop every learned quality/domain filter needs before it "
    "gates a 100 TB corpus. Score = decimal fixed-point dot product "
    "with the positive-class centroid NUMERATOR (scaling by 1/n never "
    "changes ranks, so the division — the one inexact step — is "
    "skipped); AUC = Mann-Whitney from rank sums with average-rank tie "
    "handling. Ranking uses the two-pass range-partitioned row_number "
    "(operators/rank.py): no global sort — the only global window runs "
    "over one row per range partition; tie groups then average ranks "
    "inside a high-cardinality (score) window. Every arithmetic step "
    "before the final division is exact decimal/integer, so the oracle "
    "hash-matches.",
)
def pipeline_classifier_auc(spark, sf_dir):
    from .operators.rank import global_row_number

    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("cast(round(cast(v as double), 7) as decimal(8,7))").alias("val"),
    )
    cent = (
        x.filter(F.col("label") == _AUC_POS_LABEL)
        .groupBy("pos")
        .agg(F.expr("cast(sum(val) as decimal(12,7))").alias("centsum"))
    )
    scored = (
        x.join(F.broadcast(cent), "pos")
        .groupBy("vec_id")
        .agg(
            F.max(
                F.when(F.col("label") == _AUC_POS_LABEL, 1).otherwise(0)
            ).alias("y"),
            F.sum(F.col("val") * F.col("centsum")).alias("score"),
        )
    )
    ranked = global_row_number(scored, "score", "vec_id")
    avgr = ranked.select(
        "y",
        F.avg(F.col("rn").cast("double"))
        .over(Window.partitionBy("score"))
        .alias("r"),
    )
    return avgr.agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("bigint").alias("n_neg"),
        F.round(
            (
                F.sum(F.when(F.col("y") == 1, F.col("r")).otherwise(0.0))
                - F.sum("y") * (F.sum("y") + 1) / 2.0
            )
            / (F.sum("y") * (F.count("*") - F.sum("y"))),
            6,
        ).alias("auc"),
    )


_CAL_BINS = 10  # calibration deciles


@_q(
    "pipeline_classifier_calibration",
    f"""WITH u AS (
    SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
           embedding AS v
    FROM embeddings),
x AS (
    SELECT vec_id, label, pos,
           cast(round(cast(v[pos] as double), 7) as decimal(8,7)) AS val
    FROM u),
cent AS (
    SELECT pos, cast(sum(val) as decimal(12,7)) AS centsum
    FROM x WHERE label = {_AUC_POS_LABEL} GROUP BY pos),
scored AS (
    SELECT x.vec_id,
           max(CASE WHEN x.label = {_AUC_POS_LABEL} THEN 1 ELSE 0 END) AS y,
           sum(x.val * cent.centsum) AS score
    FROM x JOIN cent USING (pos) GROUP BY x.vec_id),
ranked AS (
    SELECT y, score,
           row_number() OVER (ORDER BY score, vec_id) AS rn,
           count(*) OVER () AS n
    FROM scored),
binned AS (
    SELECT ((rn - 1) * {_CAL_BINS}) // n AS bin, y, score FROM ranked)
SELECT cast(bin as int) AS bin,
       count(*) AS n_vecs,
       cast(sum(y) as bigint) AS n_pos,
       round(sum(y) / cast(count(*) as double), 6) AS pos_rate,
       round(cast(min(score) as double), 6) AS score_lo,
       round(cast(max(score) as double), 6) AS score_hi
FROM binned GROUP BY bin""",
    "classifier calibration / reliability table — the second half of "
    "the eval loop (pipeline_classifier_auc ranks; this shows WHERE the "
    "score is trustworthy): rank-decile bins of the prototype score "
    "with per-bin positive rate and score range. A monotone pos_rate "
    "across bins = usable threshold; flat = the score is noise for that "
    "slice. Same exact-decimal score, same two-pass range rank (no "
    "global sort); the decile assignment ((rn-1)*k) DIV n is pure "
    "integer arithmetic, so binning is engine-exact. One tiny hash-agg "
    "on the 10 bins after the rank.",
)
def pipeline_classifier_calibration(spark, sf_dir):
    from .operators.rank import global_row_number

    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("cast(round(cast(v as double), 7) as decimal(8,7))").alias("val"),
    )
    cent = (
        x.filter(F.col("label") == _AUC_POS_LABEL)
        .groupBy("pos")
        .agg(F.expr("cast(sum(val) as decimal(12,7))").alias("centsum"))
    )
    scored = (
        x.join(F.broadcast(cent), "pos")
        .groupBy("vec_id")
        .agg(
            F.max(
                F.when(F.col("label") == _AUC_POS_LABEL, 1).otherwise(0)
            ).alias("y"),
            F.sum(F.col("val") * F.col("centsum")).alias("score"),
        )
    )
    ranked = global_row_number(scored, "score", "vec_id")
    n = ranked.groupBy().agg(F.count("*").alias("n"))
    binned = ranked.crossJoin(F.broadcast(n)).select(
        F.expr(f"((rn - 1) * {_CAL_BINS}) DIV n").cast("int").alias("bin"),
        "y",
        "score",
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n_vecs"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.round(F.sum("y") / F.count("*").cast("double"), 6).alias("pos_rate"),
        F.round(F.min("score").cast("double"), 6).alias("score_lo"),
        F.round(F.max("score").cast("double"), 6).alias("score_hi"),
    )


# ---- distributed quality-classifier TRAINING (batch gradient descent) ----
# Shared expression strings: the Spark plan and the DuckDB oracle embed
# the IDENTICAL arithmetic, associativity and casts, so every double is
# bit-equal in both engines. The link is the ALGEBRAIC sigmoid
# 0.5 + 0.5*z/(1+|z|) rather than 1/(1+exp(-z)): exp() output differs
# across libm implementations in the last ulp, while +,-,*,/,abs are
# exactly-rounded IEEE primitives every engine computes identically —
# that one substitution is what makes fixed-point training cross-engine
# value-exact. Per-row gradient contributions are cast to DECIMAL(30,15)
# before summing (order-independent exact aggregation, the
# pipeline_source_authority pattern); the weight step then returns to
# double.
_LRT_ITERS = 5
_LRT_LR = "cast(2 as double)"
_LRT_Y = ("CASE WHEN text LIKE '%table%' THEN cast(1 as double) "
          "ELSE cast(0 as double) END")
_LRT_X1 = "cast(n_chars as double) / cast(1000 as double)"
_LRT_X2 = ("cast(length(text) - length(replace(text, ' ', '')) as double)"
           " / cast(100 as double)")
_LRT_Z = "b + w1 * x1 + w2 * x2"
_LRT_S = ("cast(0.5 as double) + cast(0.5 as double) * z"
          " / (cast(1 as double) + abs(z))")


def _classifier_train_oracle() -> str:
    """Unrolled fixed-iteration batch gradient descent — the same
    'iterative algorithm IS SQL' trick as the PageRank oracle."""
    rounds = []
    for i in range(1, _LRT_ITERS + 1):
        p = f"w{i - 1}"
        rounds.append(f"""
g{i} AS MATERIALIZED (
    SELECT sum(cast((s - y) as decimal(30,15))) AS gb,
           sum(cast((s - y) * x1 as decimal(30,15))) AS g1,
           sum(cast((s - y) * x2 as decimal(30,15))) AS g2
    FROM (SELECT y, x1, x2, {_LRT_S} AS s
          FROM (SELECT f.y, f.x1, f.x2, {_LRT_Z} AS z
                FROM feat f CROSS JOIN {p} w))),
w{i} AS MATERIALIZED (
    SELECT w.b - {_LRT_LR} * (cast(g.gb as double) / nn.n) AS b,
           w.w1 - {_LRT_LR} * (cast(g.g1 as double) / nn.n) AS w1,
           w.w2 - {_LRT_LR} * (cast(g.g2 as double) / nn.n) AS w2
    FROM {p} w CROSS JOIN g{i} g CROSS JOIN nn)""")
    selects = " UNION ALL ".join(
        f"SELECT {i} AS iteration, round(b, 9) AS bias, "
        f"round(w1, 9) AS w_len, round(w2, 9) AS w_ws FROM w{i}"
        for i in range(1, _LRT_ITERS + 1)
    )
    return f"""
WITH feat AS MATERIALIZED (
    SELECT {_LRT_Y} AS y, {_LRT_X1} AS x1, {_LRT_X2} AS x2
    FROM documents),
nn AS (SELECT count(*) AS n FROM feat),
w0 AS (SELECT cast(0 as double) AS b, cast(0 as double) AS w1,
              cast(0 as double) AS w2),
{",".join(rounds)}
{selects}
"""


@_q(
    "pipeline_classifier_train",
    _classifier_train_oracle(),
    "distributed quality-classifier TRAINING — the fit side of the "
    "CCNet/fastText-style filter whose eval side "
    "pipeline_classifier_auc/_calibration already grade. Batch logistic-"
    "style gradient descent on the doc feature table (length, "
    "whitespace density; label = contains-'table'), 5 fixed "
    "iterations: each round is one map-side-combinable gradient "
    "aggregate over the persisted feature table crossJoined with the "
    "broadcast 1-row weight vector — per-partition gradient partials "
    "combine exactly because contributions ride DECIMAL(30,15); the "
    "1-row weight vector is localCheckpoint()ed per round (it feeds "
    "three consumers, so an untruncated lineage triples per iteration "
    "— the Catalyst plan-blowup this repo's round-3 notes document), "
    "giving the standard driver-coordinated iterative shape. "
    "At 100 TB each iteration is one scan+reduce of the feature table "
    "(itself computed once and cached); weights are O(features) "
    "regardless of corpus size. Value-exact oracle: the algebraic "
    "sigmoid z/(1+|z|) replaces exp() so both engines compute bit-equal "
    "doubles (exp differs across libm builds; +,-,*,/ are exactly-"
    "rounded IEEE everywhere), and the fixed iteration count unrolls to "
    "chained MATERIALIZED CTEs. Returns the per-iteration weight "
    "trajectory; AUC improvement over random is pinned in tests.",
)
def pipeline_classifier_train(spark, sf_dir, checkpoint_dir: str | None = None):
    docs = _t(spark, sf_dir, "documents")
    feat = docs.select(
        F.expr(_LRT_Y).alias("y"),
        F.expr(_LRT_X1).alias("x1"),
        F.expr(_LRT_X2).alias("x2"),
    ).persist()  # scanned once per iteration; tiny projected columns
    nn = feat.groupBy().agg(F.count("*").alias("n"))
    w = feat.sparkSession.range(1).select(
        F.expr("cast(0 as double)").alias("b"),
        F.expr("cast(0 as double)").alias("w1"),
        F.expr("cast(0 as double)").alias("w2"),
    )
    out = None
    for i in range(1, _LRT_ITERS + 1):
        scored = (
            feat.crossJoin(F.broadcast(w))
            .select("y", "x1", "x2", F.expr(_LRT_Z).alias("z"))
            .select("y", "x1", "x2", F.expr(_LRT_S).alias("s"))
        )
        g = scored.groupBy().agg(
            F.expr("sum(cast((s - y) as decimal(30,15)))").alias("gb"),
            F.expr("sum(cast((s - y) * x1 as decimal(30,15)))").alias("g1"),
            F.expr("sum(cast((s - y) * x2 as decimal(30,15)))").alias("g2"),
        )
        w = (
            w.crossJoin(F.broadcast(g))
            .crossJoin(F.broadcast(nn))
            .select(
                F.expr(f"b - {_LRT_LR} * (cast(gb as double) / n)").alias("b"),
                F.expr(f"w1 - {_LRT_LR} * (cast(g1 as double) / n)").alias("w1"),
                F.expr(f"w2 - {_LRT_LR} * (cast(g2 as double) / n)").alias("w2"),
            )
        )
        # the loop variable feeds THREE consumers per round (next
        # round's z, the gradient rejoin, and the output row), so an
        # un-truncated lineage triples per iteration (the Catalyst
        # plan blowup); checkpointing the 1-ROW weight vector keeps
        # every round's plan one scan + one reduce — the standard
        # driver-coordinated iterative shape (MLlib does the same);
        # checkpoint_dir switches to reliable checkpoints (executor-loss
        # survival on a real cluster — see _iter_checkpoint)
        w = _iter_checkpoint(w, checkpoint_dir, eager=True)
        row = w.select(
            F.lit(i).alias("iteration"),
            F.expr("round(b, 9)").alias("bias"),
            F.expr("round(w1, 9)").alias("w_len"),
            F.expr("round(w2, 9)").alias("w_ws"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_PSI_W = 50  # n_chars bin width for drift detection (~11 bins on the gate corpus)


@_q(
    "catalog_distribution_drift",
    f"""WITH tagged AS (
    SELECT CASE WHEN {_duck_h48("concat(cast(doc_id as varchar), ':drift')")}
                     % 2 = 0
           THEN 'reference' ELSE 'current' END AS cohort,
           n_chars // {_PSI_W} AS bin
    FROM documents),
counts AS (
    SELECT bin,
           sum(CASE WHEN cohort = 'reference' THEN 1 ELSE 0 END) AS n_ref,
           sum(CASE WHEN cohort = 'current' THEN 1 ELSE 0 END) AS n_cur
    FROM tagged GROUP BY bin),
tot AS (
    SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts),
probs AS (
    SELECT bin,
           (n_ref + 0.5) / (t_ref + 0.5 * (SELECT count(*) FROM counts))
               AS p,
           (n_cur + 0.5) / (t_cur + 0.5 * (SELECT count(*) FROM counts))
               AS q,
           n_ref, n_cur
    FROM counts, tot)
SELECT cast(bin as bigint) AS bin,
       cast(n_ref as bigint) AS n_ref,
       cast(n_cur as bigint) AS n_cur,
       round((p - q) * ln(p / q), 6) AS psi_term
FROM probs""",
    "population-stability-index drift monitor — the standard production "
    "check that a corpus refresh still looks like what the filters were "
    "tuned on. Cohorts split by engine-neutral md5 hash (deterministic "
    "'reference' vs 'current' halves on the gate corpus; in production "
    "the cohorts are yesterday/today), n_chars binned by integer "
    "division, per-bin PSI terms (p−q)·ln(p/q) with Laplace 0.5 "
    "smoothing so empty bins stay finite. Everything before the ln is "
    "integer counts; the ln inputs are identical doubles in both "
    "engines, and round(·,6) absorbs last-ulp libm variation. Two "
    "hash-aggs + a broadcast 1-row total; Σ psi_term > 0.2 is the "
    "standard alarm threshold.",
)
def catalog_distribution_drift(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    _h = _spark_h48("concat(cast(doc_id as string), ':drift')")
    tagged = d.select(
        F.expr(
            f"CASE WHEN {_h} % 2 = 0 THEN 'reference' ELSE 'current' END"
        ).alias("cohort"),
        F.expr(f"n_chars DIV {_PSI_W}").alias("bin"),
    )
    counts = tagged.groupBy("bin").agg(
        F.sum(F.when(F.col("cohort") == "reference", 1).otherwise(0)).alias(
            "n_ref"
        ),
        F.sum(F.when(F.col("cohort") == "current", 1).otherwise(0)).alias(
            "n_cur"
        ),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count("*").alias("n_bins"),
    )
    probs = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        ((F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("n_bins"))).alias("p"),
        ((F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("n_bins"))).alias("q"),
    )
    return probs.select(
        F.col("bin").cast("bigint").alias("bin"),
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(
            (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 6
        ).alias("psi_term"),
    )


@_q(
    "text_keywords",
    """WITH toks AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
           AS tok
    FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, count(*) AS df
       FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.tok, tf.tf, df.df,
           tf.tf * ln(cast(n_docs as double) / df.df) AS s
    FROM tf JOIN df USING (tok), n),
ranked AS (
    SELECT doc_id, tok, tf, df, s,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY s DESC, tok) AS rnk
    FROM scored)
SELECT doc_id, cast(rnk as int) AS rnk, tok,
       cast(tf as bigint) AS tf, cast(df as bigint) AS df,
       round(s, 6) AS tfidf
FROM ranked WHERE rnk <= 3""",
    "TF-IDF keyword extraction — top-3 terms per document, the "
    "classic retrieval/tagging primitive (index keys, dedup features, "
    "topic labels for curation dashboards). tf and df are exact "
    "integer hash-aggs (df over the distinct (doc, tok) projection), "
    "idf = ln(n/df) on identical doubles, ranking per-doc with the "
    "term as deterministic tie-break (ties at tfidf 0 — corpus-wide "
    "terms — order lexically). Windows partition on doc_id (high "
    "cardinality); the df join shuffles on the term key, the same "
    "skew-safe shape as the n-gram inverted indexes. One broadcast "
    "1-row n_docs aggregate (lazy-count shape).",
)
def text_keywords(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = (
        toks.distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            (
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("s"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("s").desc(), F.col("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            F.col("rnk").cast("int").alias("rnk"),
            "tok",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round("s", 6).alias("tfidf"),
        )
    )


@_q(
    "emb_centroid_drift",
    f"""WITH tagged AS (
    SELECT vec_id, label, embedding AS v,
           CASE WHEN {_duck_h48("concat(cast(vec_id as varchar), ':edrift')")}
                     % 2 = 0
           THEN 0 ELSE 1 END AS cohort
    FROM embeddings),
x AS (
    SELECT label, cohort, generate_subscripts(v, 1) AS pos,
           cast(round(cast(v[generate_subscripts(v, 1)] as double), 7)
                as decimal(8,7)) AS val,
           vec_id
    FROM tagged),
sums AS (
    SELECT label, cohort, pos,
           cast(sum(val) as decimal(14,7)) AS s,
           count(DISTINCT vec_id) AS n
    FROM x GROUP BY label, cohort, pos),
wide AS (
    SELECT label, pos,
           max(CASE WHEN cohort = 0 THEN s END) AS s_ref,
           max(CASE WHEN cohort = 0 THEN n END) AS n_ref,
           max(CASE WHEN cohort = 1 THEN s END) AS s_cur,
           max(CASE WHEN cohort = 1 THEN n END) AS n_cur
    FROM sums GROUP BY label, pos),
per_label AS (
    SELECT label, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
           sum(abs(s_ref * n_cur - s_cur * n_ref)) AS num
    FROM wide GROUP BY label)
SELECT cast(label as int) AS label,
       cast(n_ref as bigint) AS n_ref, cast(n_cur as bigint) AS n_cur,
       round(cast(num as double) / (n_ref * n_cur), 6) AS l1_drift
FROM per_label""",
    "embedding-space drift — the vector counterpart of the PSI table "
    "(catalog_distribution_drift): per-label L1 distance between the "
    "two hash-cohort centroids. The inexact division is deferred to the "
    "very last step by cross-multiplying the decimal centroid "
    "NUMERATORS (|s_ref·n_cur − s_cur·n_ref| is exact fixed-point; one "
    "double division + round(6) at the end), so the oracle "
    "hash-matches. Plan: posexplode → one hash-agg on (label, cohort, "
    "dim) with map-side combine → pivot to (label, dim) → per-label "
    "fold. Detects encoder/version skew a count-based monitor cannot "
    "see: the null split here must read ≈ noise-level drift.",
)
def emb_centroid_drift(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    _h = _spark_h48("concat(cast(vec_id as string), ':edrift')")
    x = emb.select(
        "vec_id",
        "label",
        F.expr(f"CASE WHEN {_h} % 2 = 0 THEN 0 ELSE 1 END").alias("cohort"),
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "vec_id",
        "label",
        "cohort",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("cast(round(cast(v as double), 7) as decimal(8,7))").alias("val"),
    )
    sums = x.groupBy("label", "cohort", "pos").agg(
        F.expr("cast(sum(val) as decimal(14,7))").alias("s"),
        F.countDistinct("vec_id").alias("n"),
    )
    wide = sums.groupBy("label", "pos").agg(
        F.max(F.when(F.col("cohort") == 0, F.col("s"))).alias("s_ref"),
        F.max(F.when(F.col("cohort") == 0, F.col("n"))).alias("n_ref"),
        F.max(F.when(F.col("cohort") == 1, F.col("s"))).alias("s_cur"),
        F.max(F.when(F.col("cohort") == 1, F.col("n"))).alias("n_cur"),
    )
    per_label = wide.groupBy("label").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.sum(
            F.abs(
                F.col("s_ref") * F.col("n_cur") - F.col("s_cur") * F.col("n_ref")
            )
        ).alias("num"),
    )
    return per_label.select(
        F.col("label").cast("int").alias("label"),
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(
            F.col("num").cast("double") / (F.col("n_ref") * F.col("n_cur")), 6
        ).alias("l1_drift"),
    )


_CM_D = 4      # count-min hash rows
_CM_W = 1024   # buckets per row
_CM_TOPK = 10


def _cm_bucket_spark(row: int) -> str:
    inner = "concat(cast(o_custkey as string), ':cm" + str(row) + "')"
    return _spark_h48(inner) + " % " + str(_CM_W)


def _cm_bucket_duck(row: int) -> str:
    inner = "concat(cast(o_custkey as varchar), ':cm" + str(row) + "')"
    return _duck_h48(inner) + " % " + str(_CM_W)


@_q(
    "agg_countmin_topk",
    f"""WITH sketch AS (
    SELECT r.row_id, b.bucket, count(*) AS cnt
    FROM orders,
         unnest(generate_series(0, {_CM_D - 1})) AS r(row_id),
         LATERAL (SELECT CASE r.row_id
             WHEN 0 THEN {_cm_bucket_duck(0)}
             WHEN 1 THEN {_cm_bucket_duck(1)}
             WHEN 2 THEN {_cm_bucket_duck(2)}
             ELSE {_cm_bucket_duck(3)} END AS bucket) AS b
    GROUP BY r.row_id, b.bucket),
truth AS (
    SELECT o_custkey, count(*) AS true_cnt
    FROM orders GROUP BY o_custkey
    ORDER BY true_cnt DESC, o_custkey LIMIT {_CM_TOPK}),
probes AS (
    SELECT o_custkey, true_cnt, r.row_id,
           CASE r.row_id
             WHEN 0 THEN {_cm_bucket_duck(0)}
             WHEN 1 THEN {_cm_bucket_duck(1)}
             WHEN 2 THEN {_cm_bucket_duck(2)}
             ELSE {_cm_bucket_duck(3)} END AS bucket
    FROM truth, unnest(generate_series(0, {_CM_D - 1})) AS r(row_id))
SELECT p.o_custkey, cast(p.true_cnt as bigint) AS true_cnt,
       cast(min(s.cnt) as bigint) AS est_cnt
FROM probes p JOIN sketch s
  ON p.row_id = s.row_id AND p.bucket = s.bucket
GROUP BY p.o_custkey, p.true_cnt""",
    "count-min sketch — the third mergeable sketch family (with the HLL "
    "partials and the histogram quantiles): frequency estimation whose "
    f"state is a FIXED {_CM_D}x{_CM_W} int grid regardless of corpus "
    "size, built by one map-side-combinable hash aggregate over "
    "(row, md5-bucket) pairs and mergeable across partitions, days, or "
    "streams by cell-wise addition. The query builds the sketch, takes "
    "the exact top-10 keys, probes their buckets, and reports est = min "
    "over rows next to the true count — est >= true always (one-sided "
    "error), and the overestimate bound eps*N is the classic trade. All "
    "integer counts over engine-neutral md5 buckets: oracle-exact.",
)
def agg_countmin_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    rows = [
        o.select(
            F.lit(r).alias("row_id"),
            F.expr(_cm_bucket_spark(r)).alias("bucket"),
        )
        for r in range(_CM_D)
    ]
    ex = rows[0]
    for rdf in rows[1:]:
        ex = ex.unionByName(rdf)
    sketch = ex.groupBy("row_id", "bucket").agg(F.count("*").alias("cnt"))

    truth = (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "o_custkey")
        .limit(_CM_TOPK)
    )
    probes = None
    for r in range(_CM_D):
        p = truth.select(
            "o_custkey",
            "true_cnt",
            F.lit(r).alias("row_id"),
            F.expr(_cm_bucket_spark(r)).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        F.broadcast(probes)
        .join(sketch, ["row_id", "bucket"])
        .groupBy("o_custkey", "true_cnt")
        .agg(F.min("cnt").cast("bigint").alias("est_cnt"))
        .select(
            "o_custkey",
            F.col("true_cnt").cast("bigint").alias("true_cnt"),
            "est_cnt",
        )
    )


@_q(
    "stream_countmin_users",
    """WITH ev AS (
    SELECT user_id,
           (epoch_us(ts) // 3600000000) * 3600000000000 AS hour_start_ns
    FROM events),
cells AS (
    SELECT hour_start_ns, r.row_id,
           cast(concat('0x', substr(md5(concat(cast(user_id as varchar),
                ':scm', cast(r.row_id as varchar))), 1, 12)) as bigint)
               % 1024 AS bucket,
           count(*) AS cnt
    FROM ev, unnest(generate_series(0, 3)) AS r(row_id)
    GROUP BY 1, 2, 3),
merged AS (
    SELECT row_id, bucket, sum(cnt) AS cnt
    FROM cells GROUP BY row_id, bucket),
truth AS (
    SELECT user_id, count(*) AS true_cnt FROM events GROUP BY user_id
    ORDER BY true_cnt DESC, user_id LIMIT 5),
probes AS (
    SELECT user_id, true_cnt, r.row_id,
           cast(concat('0x', substr(md5(concat(cast(user_id as varchar),
                ':scm', cast(r.row_id as varchar))), 1, 12)) as bigint)
               % 1024 AS bucket
    FROM truth, unnest(generate_series(0, 3)) AS r(row_id))
SELECT p.user_id, cast(p.true_cnt as bigint) AS true_cnt,
       cast(min(m.cnt) as bigint) AS est_cnt
FROM probes p JOIN merged m
  ON p.row_id = m.row_id AND p.bucket = m.bucket
GROUP BY p.user_id, p.true_cnt""",
    "streaming sketch maintenance, batch twin: hourly count-min "
    "partials over user_id (the fixed D×W grid fragment an incremental "
    "maintainer emits per window — streaming/events.py "
    "stream_countmin_partials runs the identical aggregation under "
    "readStream with a 1-hour watermark, equivalence-tested in "
    "test_streaming.py), merged CELL-WISE (CM merging is exact) and "
    "probed at the exact top-5 users: est ≥ true one-sided. The hourly "
    "partial stage is the operational shape — per-hour fragments "
    "persist to a state store or sink and any later consumer sums them "
    "without touching raw events.",
)
def stream_countmin_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return EV.countmin_user_estimates(ev)


# ---- BM25 retrieval (Lucene-style Okapi BM25, k1=1.2 b=0.75) -------------
# Shared expression fragments so Spark and DuckDB compute bit-identical
# doubles: idf is rounded to 6 decimals immediately after ln() (the
# text_idf idiom — ln on identical doubles agrees at 6dp), every other
# step is rational arithmetic with explicit double casts and identical
# associativity, and per-(query,doc) term-score sums ride DECIMAL(30,12).
_BM25_QUERIES = [
    (1, "table"), (1, "scan"),
    (2, "join"), (2, "order"),
    (3, "spark"), (3, "data"), (3, "fast"),
]
_BM25_TOPK = 5
_BM25_IDF = ("round(ln((cast(nd - df as double) + cast(0.5 as double))"
             " / (cast(df as double) + cast(0.5 as double))"
             " + cast(1 as double)), 6)")
_BM25_TERM = ("idf * (cast(tf as double) * cast(2.2 as double))"
              " / (cast(tf as double) + cast(1.2 as double)"
              " * (cast(0.25 as double)"
              " + cast(0.75 as double) * (cast(dl as double) / avgdl)))")


@_q(
    "text_bm25_topk",
    f"""WITH toks AS MATERIALIZED (
    SELECT doc_id, t.tok
    FROM documents,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)),
dl AS MATERIALIZED (
    SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
    SELECT cast(sum(dl) as double) / count(*) AS avgdl, count(*) AS nd
    FROM dl),
qt AS (SELECT * FROM (VALUES {", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)})
       AS qt(query_id, term)),
terms AS (SELECT DISTINCT term FROM qt),
tf AS MATERIALIZED (
    SELECT doc_id, tok AS term, count(*) AS tf
    FROM toks JOIN terms ON tok = term
    GROUP BY doc_id, tok),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
idf AS (SELECT term, {_BM25_IDF} AS idf FROM dfq CROSS JOIN stats),
scored AS (
    SELECT qt.query_id, tf.doc_id,
           sum(cast({_BM25_TERM} as decimal(30,12))) AS score_d
    FROM tf
    JOIN qt ON qt.term = tf.term
    JOIN idf ON idf.term = tf.term
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY qt.query_id, tf.doc_id),
ranked AS (
    SELECT query_id, doc_id, score_d,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score_d DESC, doc_id) AS rn
    FROM scored)
SELECT cast(query_id as int) AS query_id, doc_id,
       round(cast(score_d as double), 6) AS score, cast(rn as int) AS rn
FROM ranked WHERE rn <= {_BM25_TOPK}""",
    "full-text BM25 retrieval (Okapi/Lucene form: "
    "idf=ln(1+(N-df+.5)/(df+.5)), k1=1.2, b=0.75) — the retrieval "
    "primitive behind decontamination lookups, quality-by-query "
    "probes, and dedup keeper choice. SINGLE tokenize pass: one "
    "explode+groupBy(doc_id) emits doc length AND the per-query-term "
    "tf columns in the same partial-aggregated shuffle (the query "
    "vocabulary is a compile-time literal list, so tf pivots into "
    "fixed columns instead of a postings join); corpus stats "
    "(nd/avgdl/per-term df) reduce that per-doc table to one "
    "broadcast row; scores are then MAP-ONLY literal expressions "
    "stacked per query — no postings shuffle, no dl re-join, no "
    "second tokenize of the corpus (the r15 rewrite: 4 corpus-derived "
    "aggregations collapsed to 1 + a singleton). Per-(query,doc) "
    "scores stay DECIMAL sums of deterministic double term scores; "
    "top-5 per query via a rank<=k window that Spark executes as "
    "WindowGroupLimit (map-side partial top-k — no corpus-sized "
    "partition reaches the window at 100 TB). idf rounds to 6dp "
    "straight out of ln() (the text_idf idiom), value-exact.",
)
def text_bm25_topk(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    terms = sorted({t for _, t in _BM25_QUERIES})
    tok = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    # one tokenize+explode pass -> per-doc row: dl + tf per query term
    # (map-side partial agg ships O(n_terms) ints per doc, not postings)
    aggs = [F.count("*").alias("dl")] + [
        F.sum(F.when(F.col("tok") == term, 1).otherwise(0)).alias(f"tf_{i}")
        for i, term in enumerate(terms)
    ]
    perdoc = (
        docs.select("doc_id", F.explode(tok).alias("tok"))
        .groupBy("doc_id")
        .agg(*aggs)
    ).localCheckpoint(eager=False)  # reused by stats AND scoring: tokenize once
    # singleton corpus stats: nd, avgdl, and per-term df in one row
    stat_aggs = [
        F.expr("cast(sum(dl) as double) / count(*)").alias("avgdl"),
        F.count("*").alias("nd"),
    ] + [
        F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
        for i in range(len(terms))
    ]
    stats = perdoc.groupBy().agg(*stat_aggs)
    wide = perdoc.crossJoin(F.broadcast(stats))

    def idf_sql(i: int) -> str:
        return (f"round(ln((cast(nd - df_{i} as double) + cast(0.5 as double))"
                f" / (cast(df_{i} as double) + cast(0.5 as double))"
                f" + cast(1 as double)), 6)")

    def term_sql(i: int) -> str:
        return (f"{idf_sql(i)} * (cast(tf_{i} as double) * cast(2.2 as double))"
                f" / (cast(tf_{i} as double) + cast(1.2 as double)"
                f" * (cast(0.25 as double)"
                f" + cast(0.75 as double) * (cast(dl as double) / avgdl)))")

    qmap: dict[int, list[int]] = {}
    for q, term in _BM25_QUERIES:
        qmap.setdefault(q, []).append(terms.index(term))
    rows = []
    for q, idxs in sorted(qmap.items()):
        # sum of per-term decimal(30,12) scores == the old sum() aggregate
        # over the postings join, term order fixed by the literal list
        score = ("cast(" + " + ".join(
            f"cast({term_sql(i)} as decimal(30,12))" for i in idxs
        ) + " as decimal(38,12))")
        present = " OR ".join(f"tf_{i} > 0" for i in idxs)
        rows.append((q, score, present))
    stacked = wide.select(
        "doc_id",
        F.expr(
            "stack({n}, {args}) as (query_id, score_d, present)".format(
                n=len(rows),
                args=", ".join(
                    f"{q}, ({score}), ({present})" for q, score, present in rows
                ),
            )
        ),
    ).filter("present")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_d").desc(), F.col("doc_id")
    )
    return (
        stacked.select(
            "query_id", "doc_id", "score_d",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= _BM25_TOPK)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            "doc_id",
            F.expr("round(cast(score_d as double), 6)").alias("score"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


# ---- binary quantization + Hamming ANN -----------------------------------
_HAM_NQ = 4   # query vectors: vec_id < _HAM_NQ
_HAM_K = 5


@_q(
    "sim_hamming_topk",
    f"""WITH u AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           unnest(embedding) AS v
    FROM embeddings),
codes AS MATERIALIZED (
    SELECT vec_id,
           cast(sum(CASE WHEN pos <= 32 AND v >= 0
                         THEN (1::BIGINT << (pos - 1)) ELSE 0 END) as bigint)
               AS lo,
           cast(sum(CASE WHEN pos > 32 AND v >= 0
                         THEN (1::BIGINT << (pos - 33)) ELSE 0 END) as bigint)
               AS hi
    FROM u GROUP BY vec_id),
q AS (SELECT * FROM codes WHERE vec_id < {_HAM_NQ}),
d AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           cast(bit_count(xor(q.lo, c.lo))
                + bit_count(xor(q.hi, c.hi)) as int) AS hamming
    FROM q JOIN codes c ON c.vec_id <> q.vec_id),
ranked AS (
    SELECT query_id, neighbor_id, hamming,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming, neighbor_id) AS rn
    FROM d)
SELECT query_id, neighbor_id, hamming, cast(rn as int) AS rn
FROM ranked WHERE rn <= {_HAM_K}""",
    "binary-quantized ANN: each embedding collapses to a 64-bit sign "
    "code (two 32-bit words packed by a pure-codegen aggregate lambda — "
    "no explode, no shuffle, 64x memory reduction vs float32), and "
    "neighbor search is bit_count(xor) Hamming distance — integer ops "
    "inside whole-stage codegen, no floating point at query time. The "
    "modern memory-tier trick for billion-vector search: codes for "
    "100 TB of embeddings fit where floats cannot, Hamming prefilters "
    "candidates for exact rerank (sim_lsh_multiprobe_topk / cosine_topk "
    "are the rerank stages this composes with). Broadcast query codes x "
    "one scan of the code table; top-5 per query via rank<=k that "
    "executes as map-side-partial WindowGroupLimit. Everything is exact "
    "integer arithmetic, so the oracle hash-matches.",
)
def sim_hamming_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    # sign-code packing shared with similarity.hamming_prefilter_topk
    # (one definition — the bucketing contract must not fork, r10)
    codes = emb.select(
        "vec_id",
        F.expr(similarity.SPARK_SIGN_LO).alias("lo"),
        F.expr(similarity.SPARK_SIGN_HI).alias("hi"),
    )
    q = codes.filter(F.col("vec_id") < _HAM_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    d = (
        F.broadcast(q)
        .join(codes, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "cast(bit_count(qlo ^ lo) + bit_count(qhi ^ hi) as int)"
            ).alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        d.select(
            "query_id", "neighbor_id", "hamming",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= _HAM_K)
        .select("query_id", "neighbor_id", "hamming",
                F.col("rn").cast("int").alias("rn"))
    )


# ---- winnowing fingerprints (Schleimer et al. 2003, the MOSS scheme) ----
_WIN_K = 4        # tokens per k-gram
_WIN_W = 4        # gram hashes per winnowing window
_WIN_DFCAP = 50   # inverted-index df cap (stopgram guard)
_WIN_POSBITS = 8388608  # 2^23: positions packed below the 40-bit hash
# (40+23 = 63 bits = signed-bigint ceiling; per-doc k-gram cap enforced
# by an explicit pos filter in both engines — see functions/dedup.py)


@_q(
    "dedup_winnowing",
    f"""WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
    FROM documents),
grams AS (
    SELECT doc_id, g.i AS pos,
           array_to_string(toks[g.i + 1 : g.i + {_WIN_K}], ' ') AS gram
    FROM toks, unnest(generate_series(0, len(toks) - {_WIN_K})) AS g(i)
    WHERE len(toks) >= {_WIN_K}),
keyed AS (
    SELECT doc_id, pos,
           cast(concat('0x', substr(md5(gram), 1, 10)) as bigint)
               * {_WIN_POSBITS} + ({_WIN_POSBITS - 1} - pos) AS key
    FROM grams WHERE pos < {_WIN_POSBITS}),
wins AS (
    SELECT doc_id, pos,
           min(key) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN {_WIN_W - 1} PRECEDING
                          AND CURRENT ROW) AS sel_key
    FROM keyed),
fp AS MATERIALIZED (
    SELECT DISTINCT doc_id, sel_key // {_WIN_POSBITS} AS h
    FROM wins WHERE pos >= {_WIN_W - 1}),
hdf AS (SELECT h FROM fp GROUP BY h
        HAVING count(*) BETWEEN 2 AND {_WIN_DFCAP})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(count(*) as bigint) AS n_shared
FROM fp a JOIN hdf USING (h) JOIN fp b USING (h)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2""",
    "winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 — "
    "the MOSS scheme): 4-token k-gram hashes, and from every window of "
    "4 consecutive hashes select the minimum (ties -> rightmost "
    "position, encoded by packing 2^23-1-pos under the 40-bit hash so "
    "ONE integer min() implements the tie rule identically in both "
    "engines); distinct selected hashes are the doc's fingerprints — "
    "guaranteed-coverage sampling (any shared run of w+k-1 tokens "
    "shares a fingerprint) at ~2/(w+1) the index size of full shingles. "
    "Pair generation is the df-capped inverted-index join of "
    "dedup_ngram_jaccard: work proportional to shared-fingerprint "
    "co-occupancy, never all-pairs; per-doc windows partition by "
    "doc_id, so nothing is corpus-global. Pure integer/md5 arithmetic "
    "end to end — the oracle hash-matches.",
)
def dedup_winnowing(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.winnowing_pairs(docs)


# ---- interval coalescing (gaps-and-islands over event activity) ---------
_IVC_LEN_US = 300_000_000  # each event opens a 5-minute activity interval


@_q(
    "stream_interval_coalesce",
    f"""WITH iv AS (
    SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_IVC_LEN_US} AS e,
           event_id
    FROM events),
flagged AS (
    SELECT user_id, s, e, event_id,
           CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) >= s
                THEN 0 ELSE 1 END AS new_island
    FROM iv),
islands AS (
    SELECT user_id, s, e,
           sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS island
    FROM flagged)
SELECT user_id, min(s) AS interval_start_us, max(e) AS interval_end_us,
       cast(count(*) as bigint) AS n_events
FROM islands GROUP BY user_id, island""",
    "overlapping-interval coalescing (gaps-and-islands): each event "
    "opens a 5-minute activity interval; per user, intervals that "
    "overlap or touch merge into maximal sessions-by-coverage — the "
    "interval-union primitive behind SLA/uptime accounting, "
    "copresence detection, and span-level dedup bookkeeping. A new "
    "island starts exactly when an interval's start clears the running "
    "max of all previous ends (running max, not lag(e): an earlier "
    "long interval can swallow several later ones). Both windows "
    "partition by user_id — nothing corpus-global; timestamps ride "
    "integer epoch-microseconds so the oracle is exact.",
)
def stream_interval_coalesce(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # catalog loads ts as epoch-nanoseconds; the oracle reads the raw
    # parquet TIMESTAMP via epoch_us — ns div 1000 is the same integer
    iv = ev.select(
        "user_id",
        F.expr("ts div 1000").alias("s"),
        F.expr(f"ts div 1000 + {_IVC_LEN_US}").alias("e"),
        "event_id",
    )
    order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = iv.select(
        "user_id", "s", "e", "event_id",
        F.when(F.max("e").over(prev) >= F.col("s"), 0).otherwise(1)
         .alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "s", "e",
        F.sum("new_island").over(run).alias("island"),
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("interval_start_us"),
        F.max("e").alias("interval_end_us"),
        F.count("*").alias("n_events"),
    ).drop("island")


@_q(
    "mm_flac_stereo_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id % 100) + 20 AS n FROM documents),
s AS (
    SELECT doc_id, n,
           ((doc_id*11 + ti.i*3) % 4096) - 2048 AS l,
           ((doc_id*17 + ti.i*5) % 4096) - 2048 AS r
    FROM d, unnest(generate_series(0, n-1)) AS ti(i)),
agg AS (
    SELECT doc_id, n, sum(l) AS sl, sum(r) AS sr,
           greatest(max(abs(l)), max(abs(r))) AS peak
    FROM s GROUP BY doc_id, n)
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
            WHEN 3 THEN 44100 ELSE 48000 END AS sample_rate,
       cast(n as bigint) AS n_samples,
       round(sl / cast(n as double), 6) AS mean_left,
       round(sr / cast(n as double), 6) AS mean_right,
       cast(peak as int) AS peak
FROM agg""",
    "REAL audio sample decode #3 — STEREO FLAC with channel "
    "decorrelation (RFC 9639 §4.2, from spec): each doc's frame "
    "rotates through the four channel assignments — independent, "
    "left/side, right/side, mid/side — with the side channel at its "
    "mandated 17-bit depth; the decoder parses the assignment from the "
    "frame header, decodes both subframes through the shared "
    "CONSTANT/VERBATIM/FIXED path, undoes the decorrelation "
    "(mid/side reconstructs the LSB from the side channel), verifies "
    "both CRCs, and reduces to per-channel means. Decorrelation is "
    "lossless integer arithmetic, so the oracle states L/R stats "
    "directly from the sample formulas with no knowledge of the "
    "per-doc encoding mode. Map-only; LPC remains the boundary.",
)
def mm_flac_stereo_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.flac_stereo_stats(
        multimodal.synthesize_flac_stereo_samples(d)
    )


@_q(
    "mm_image_ahash",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%48+8 AS w, (doc_id*13)%32+8 AS h
    FROM documents),
px AS (
    SELECT doc_id, w, h,
           (tx.x*8) // w AS gx, (ty.y*8) // h AS gy,
           (doc_id*7 + tx.x*3 + ty.y*5) % 256
             + (doc_id*11 + tx.x + 2*ty.y) % 256
             + (doc_id*3 + 5*tx.x + ty.y) % 256 AS g
    FROM d, unnest(generate_series(0, w-1)) AS tx(x),
         unnest(generate_series(0, h-1)) AS ty(y)),
cells AS (
    SELECT doc_id, w, h, gx, gy, sum(g) AS cs, count(*) AS cp
    FROM px GROUP BY doc_id, w, h, gx, gy),
tot AS (
    SELECT doc_id, sum(cs) AS ts, sum(cp) AS tp
    FROM cells GROUP BY doc_id),
bits AS (
    SELECT c.doc_id, c.w, c.h, c.gy*8 + c.gx AS bit,
           CASE WHEN c.cs * t.tp > t.ts * c.cp THEN 1 ELSE 0 END AS bset
    FROM cells c JOIN tot t ON t.doc_id = c.doc_id)
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       cast(sum(CASE WHEN bit >= 32 AND bset = 1
                     THEN (1::BIGINT << (bit - 32)) ELSE 0 END) as bigint)
           AS ahash_hi,
       cast(sum(CASE WHEN bit < 32 AND bset = 1
                     THEN (1::BIGINT << bit) ELSE 0 END) as bigint)
           AS ahash_lo,
       cast(sum(bset) as int) AS n_bits
FROM bits GROUP BY doc_id, w, h""",
    "perceptual average-hash over REAL decoded PNG pixels — image "
    "near-dup fingerprinting, the visual twin of simhash: the full "
    "from-spec PNG decode (chunk walk, zlib inflate, all five filter "
    "types) average-pools onto an 8x8 grid ((x*8) DIV w cell "
    "assignment handles non-divisible dims exactly) and sets bit "
    "gy*8+gx iff the cell's gray mean strictly exceeds the image mean, "
    "compared by integer cross-multiplication (cellsum*total_px > "
    "totalsum*cell_px) so no division or float ever occurs — the "
    "oracle restates the whole thing arithmetically over a "
    "generate_series pixel grid. The resulting 64-bit hashes compose "
    "with sim_hamming_topk's bit_count(xor) machinery for visual "
    "near-dup pairs. Map-only, NULL on corruption.",
)
def mm_image_ahash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.png_ahash(multimodal.synthesize_png_pixels(d))


@_q(
    "mm_image_resize",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%48+8 AS w, (doc_id*13)%32+8 AS h
    FROM documents),
px AS (
    SELECT doc_id, (tx.x*4) // w AS gx, (ty.y*4) // h AS gy,
           (doc_id*7 + tx.x*3 + ty.y*5) % 256 AS r,
           (doc_id*11 + tx.x + 2*ty.y) % 256 AS g,
           (doc_id*3 + 5*tx.x + ty.y) % 256 AS b
    FROM d, unnest(generate_series(0, w-1)) AS tx(x),
         unnest(generate_series(0, h-1)) AS ty(y))
SELECT doc_id, cast(gy as int) AS gy, cast(gx as int) AS gx,
       cast(count(*) as bigint) AS n_px,
       cast(sum(r) // count(*) as bigint) AS mean_r,
       cast(sum(g) // count(*) as bigint) AS mean_g,
       cast(sum(b) // count(*) as bigint) AS mean_b
FROM px GROUP BY doc_id, gy, gx""",
    "image RESIZE as a first-class operator: the full from-spec PNG "
    "decode box-filters each image onto a 4x4 thumbnail grid (pixel "
    "(x,y) pools into cell ((x*4) DIV w, (y*4) DIV h) — exact "
    "unequal-cell assignment for non-divisible dims), per-channel cell "
    "means as truncating integer division so no float ever appears and "
    "the oracle restates everything arithmetically over a "
    "generate_series pixel grid. The downsample every multimodal "
    "training pipeline runs before feature extraction; Arrow "
    "mapInPandas, map-only, corrupt containers become one NULL-cells "
    "row. The 4x4x3 integer thumbnails feed embedding/dedup stages "
    "downstream exactly like the ahash bits do.",
)
def mm_image_resize(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.png_resize(multimodal.synthesize_png_pixels(d))


@_q(
    "emb_standardize",
    """WITH x AS MATERIALIZED (
    SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           cast(round(cast(unnest(embedding) as double), 7)
                as decimal(8,7)) AS val
    FROM embeddings),
s1 AS (
    SELECT pos, sum(val) AS s, sum(val * val) AS ss, count(*) AS n
    FROM x GROUP BY pos),
s2 AS (SELECT pos, cast(s as double) / n AS mean, ss, n FROM s1),
st AS (
    SELECT pos, mean,
           sqrt(cast(ss as double) / n - mean * mean) AS std
    FROM s2)
SELECT x.vec_id, x.pos,
       round((cast(x.val as double) - st.mean) / st.std, 6) AS z
FROM x JOIN st ON st.pos = x.pos
WHERE st.std > 0""",
    "per-dimension standardization (z-scoring) of the embedding "
    "corpus — the feature-normalization pass quantization, PQ "
    "codebooks, and drift monitors all assume. Values quantize to "
    "DECIMAL(8,7) on entry (the pipeline_classifier_auc idiom), so "
    "per-dim sums and sums-of-squares are exact and order-independent; "
    "mean/variance return to double (deterministic IEEE ops) and "
    "sqrt is correctly rounded by IEEE-754, so even std is bit-equal "
    "cross-engine — a full mean/variance/sqrt pipeline with zero "
    "tolerance needed. Two scans of the exploded values (one agg, one "
    "broadcast-joined rescale), both map-side combinable; at 100 TB "
    "the stats table is 64 rows regardless of corpus size.",
)
def emb_standardize(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("cast(round(cast(v as double), 7) as decimal(8,7))").alias("val"),
    )
    s1 = x.groupBy("pos").agg(
        F.expr("sum(val)").alias("s"),
        F.expr("sum(val * val)").alias("ss"),
        F.count("*").alias("n"),
    )
    s2 = s1.select(
        "pos", F.expr("cast(s as double) / n").alias("mean"), "ss", "n"
    )
    st = s2.select(
        "pos", "mean",
        F.expr("sqrt(cast(ss as double) / n - mean * mean)").alias("std"),
    )
    return (
        x.join(F.broadcast(st), "pos")
        .filter(F.col("std") > 0)
        .select(
            "vec_id", "pos",
            F.expr("round((cast(val as double) - mean) / std, 6)").alias("z"),
        )
    )


# ---- last-touch attribution ---------------------------------------------
_ATTR_LOOKBACK_US = 86_400_000_000  # 24h


@_q(
    "stream_attribution",
    f"""WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS us
    FROM events),
keyed AS (
    SELECT event_id, user_id, event_type, us,
           CASE event_type WHEN 'click' THEN us * 8 + 2
                           WHEN 'view' THEN us * 8 + 1 END AS touch_key
    FROM ev),
carried AS (
    SELECT event_id, user_id, event_type, us,
           max(touch_key) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS last_touch
    FROM keyed)
SELECT event_id, user_id, us AS purchase_us,
       CASE WHEN last_touch IS NOT NULL
                 AND last_touch // 8 >= us - {_ATTR_LOOKBACK_US}
            THEN CASE last_touch % 8 WHEN 2 THEN 'click' ELSE 'view' END
            ELSE 'organic' END AS touch_type,
       CASE WHEN last_touch IS NOT NULL
                 AND last_touch // 8 >= us - {_ATTR_LOOKBACK_US}
            THEN us - last_touch // 8 END AS gap_us
FROM carried WHERE event_type = 'purchase'""",
    "last-touch attribution: every purchase is credited to the same "
    "user's most recent prior click or view within a 24h lookback "
    "(else 'organic') — the event-analytics primitive behind "
    "conversion accounting and, in data-pipeline terms, provenance "
    "assignment (credit an outcome to the latest qualifying upstream "
    "event). The entire candidate-touch state is ONE bigint running "
    "max (epoch-us * 8 + type code packs recency and the "
    "click-beats-view tie rule into a single integer order), so the "
    "per-user window carries O(1) state — no join, no per-type "
    "subquery, no event-list buffering. Exact integer oracle.",
)
def stream_attribution(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    keyed = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("us"),
        F.expr(
            "CASE event_type WHEN 'click' THEN (ts div 1000) * 8 + 2"
            " WHEN 'view' THEN (ts div 1000) * 8 + 1 END"
        ).alias("touch_key"),
    )
    prev = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = keyed.select(
        "event_id", "user_id", "event_type", "us",
        F.max("touch_key").over(prev).alias("last_touch"),
    )
    ok = (
        F.col("last_touch").isNotNull()
        & (F.expr("last_touch div 8") >= F.col("us") - _ATTR_LOOKBACK_US)
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("us").alias("purchase_us"),
        F.when(
            ok,
            F.expr("CASE last_touch % 8 WHEN 2 THEN 'click' ELSE 'view' END"),
        ).otherwise(F.lit("organic")).alias("touch_type"),
        F.when(ok, F.expr("us - last_touch div 8")).alias("gap_us"),
    )


def _hilbert_oracle() -> str:
    from .sources.sinks import duck_hilbert_ctes

    return f"""WITH pts AS (
    SELECT o_orderkey AS key, o_orderkey % 256 AS x, o_custkey % 256 AS y
    FROM orders),
{duck_hilbert_ctes("x", "y", 8)}
SELECT o.o_orderkey, o.o_orderkey % 256 AS na, o.o_custkey % 256 AS nb,
       h0.hd AS hkey
FROM h0 JOIN orders o ON o.o_orderkey = h0.key"""


@_q(
    "scalar_hilbert_key",
    _hilbert_oracle(),
    "Hilbert-curve layout key — the space-filling curve with strictly "
    "better locality than Z-order (every consecutive key pair is "
    "grid-adjacent; Morton jumps at power-of-two seams), i.e. fewer "
    "row groups touched per 2-D range predicate when the table is "
    "written sorted by this key (the write_zorder_parquet layout "
    "story, upgraded). The classic xy2d walk is unrolled into 8 "
    "chained pure-integer projections — no UDF, no runtime loop — "
    "with the quadrant XOR restated as CASE arithmetic and the "
    "full-grid n-1-x reflection keeping every operand non-negative so "
    "div/% agree across engines; the oracle replays the identical "
    "unrolled steps as chained CTEs. Verified against the canonical "
    "reference implementation and the adjacency property in tests.",
)
def scalar_hilbert_key(spark, sf_dir):
    from .sources.sinks import hilbert_cols

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 256).alias("na"),
        (F.col("o_custkey") % 256).alias("nb"),
    )
    return hilbert_cols(o, "na", "nb", bits=8, out="hkey")


# ---- robust (median/MAD) outlier detection ------------------------------
# Exact medians WITHOUT corpus-sized sort windows: cumulative counts run
# over the per-group VALUE HISTOGRAM (the agg_histogram_quantiles trick),
# so every window is histogram-sized. Median of an even multiset is the
# mean of the two middle order statistics, selected by position — no
# interpolation semantics to match across engines.


def _median_sql(src: str, valcol: str, out: str) -> str:
    """DuckDB fragment: exact per-event_type median of ``valcol`` in
    ``src`` (decimal-quantized) → table (event_type, {out})."""
    return f"""(
    WITH hist AS (
        SELECT event_type, {valcol} AS v, count(*) AS c
        FROM {src} GROUP BY event_type, {valcol}),
    cum AS (
        SELECT event_type, v, c,
               sum(c) OVER (PARTITION BY event_type ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cc,
               sum(c) OVER (PARTITION BY event_type) AS n
        FROM hist)
    SELECT event_type,
           (cast(min(CASE WHEN cc >= (n + 1) // 2 THEN v END) as double)
            + cast(min(CASE WHEN cc >= (n + 2) // 2 THEN v END) as double))
           / 2 AS {out}
    FROM cum GROUP BY event_type)"""


@_q(
    "agg_robust_outliers",
    f"""WITH vals AS MATERIALIZED (
    SELECT event_id, event_type,
           cast(round(value, 6) as decimal(18,6)) AS val
    FROM events),
med AS MATERIALIZED ({_median_sql("vals", "val", "med")[1:-1]}),
devs AS MATERIALIZED (
    SELECT v.event_id, v.event_type,
           cast(round(abs(cast(v.val as double) - m.med), 6)
                as decimal(18,6)) AS val
    FROM vals v JOIN med m ON m.event_type = v.event_type),
mad AS ({_median_sql("devs", "val", "mad")[1:-1]})
SELECT v.event_type,
       cast(count(*) as bigint) AS n,
       round(any_value(m.med), 6) AS med,
       round(any_value(d.mad), 6) AS mad,
       cast(count(*) FILTER (WHERE abs(cast(v.val as double) - m.med)
                             > 3 * 1.4826 * d.mad) as bigint) AS n_outliers
FROM vals v
JOIN med m ON m.event_type = v.event_type
JOIN mad d ON d.event_type = v.event_type
GROUP BY v.event_type""",
    "robust outlier detection per event stream: exact median and MAD "
    "(median absolute deviation), flagging values beyond "
    "3 * 1.4826 * MAD — the estimator that, unlike mean/stddev "
    "z-scores, a few extreme values cannot corrupt (stream_zscore_"
    "anomalies is the non-robust twin). Exact order statistics with NO "
    "corpus-sized sort: cumulative counts run over the per-group VALUE "
    "HISTOGRAM (bounded by distinct quantized values, not rows — the "
    "agg_histogram_quantiles shape), and the even-count median is the "
    "mean of two positionally-selected middles, so there are no "
    "interpolation semantics to match. Values quantize to "
    "DECIMAL(18,6); every remaining double op is deterministic IEEE.",
)
def agg_robust_outliers(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    vals = ev.select(
        "event_id",
        "event_type",
        F.expr("cast(round(value, 6) as decimal(18,6))").alias("val"),
    )

    def median_of(df, out):
        hist = df.groupBy("event_type", "val").agg(F.count("*").alias("c"))
        wcum = (
            Window.partitionBy("event_type")
            .orderBy("val")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wall = Window.partitionBy("event_type")
        cum = hist.select(
            "event_type", "val",
            F.sum("c").over(wcum).alias("cc"),
            F.sum("c").over(wall).alias("n"),
        )
        return cum.groupBy("event_type").agg(
            F.expr(
                "(cast(min(CASE WHEN cc >= (n + 1) div 2 THEN val END)"
                " as double)"
                " + cast(min(CASE WHEN cc >= (n + 2) div 2 THEN val END)"
                " as double)) / 2"
            ).alias(out)
        )

    med = median_of(vals, "med")
    devs = vals.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        F.expr(
            "cast(round(abs(cast(val as double) - med), 6)"
            " as decimal(18,6))"
        ).alias("val"),
    )
    mad = median_of(devs, "mad")
    return (
        vals.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.expr("round(any_value(med), 6)").alias("med"),
            F.expr("round(any_value(mad), 6)").alias("mad"),
            F.expr(
                "cast(count_if(abs(cast(val as double) - med)"
                " > 3 * 1.4826 * mad) as bigint)"
            ).alias("n_outliers"),
        )
    )


# ---- grid-bucketed spatial join -----------------------------------------
_SPATIAL_BOXES = [
    # (box_id, x0, x1, y0, y1) on the 1000x1000 synthetic plane
    (1, 0, 149, 0, 149),
    (2, 100, 299, 350, 449),
    (3, 500, 520, 500, 999),
    (4, 900, 999, 0, 99),
    (5, 250, 749, 600, 649),
]
_SPATIAL_CELL = 100


@_q(
    "join_spatial_grid",
    f"""WITH pts AS (
    SELECT o_orderkey, o_orderkey % 1000 AS x, o_custkey % 1000 AS y
    FROM orders),
boxes AS (SELECT * FROM (VALUES {", ".join(map(str, _SPATIAL_BOXES))})
          AS b(box_id, x0, x1, y0, y1))
SELECT box_id, cast(count(*) as bigint) AS n_points,
       cast(sum(o_orderkey) as bigint) AS sum_keys
FROM boxes JOIN pts
  ON x BETWEEN x0 AND x1 AND y BETWEEN y0 AND y1
GROUP BY box_id""",
    "spatial point-in-box join via grid bucketing: points bucket to "
    "100x100 cells with pure integer division, each box explodes to "
    "the (few) cells it overlaps, and the join is an ordinary EQUI-join "
    "on cell id with the exact containment filter applied only to "
    "candidates that share a cell — the standard way to turn an "
    "unbounded theta join into shuffle-friendly hash buckets (same "
    "discipline as the LSH band joins, in 2-D). The oracle runs the "
    "plain theta join; identical integer results prove the bucketed "
    "decomposition lossless. Box-cell table is literal and broadcast; "
    "at 100 TB the per-cell candidate sets bound the work, not the "
    "corpus x boxes product.",
)
def join_spatial_grid(spark, sf_dir):
    c = _SPATIAL_CELL
    pts = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % 1000).alias("x"),
        (F.col("o_custkey") % 1000).alias("y"),
    ).withColumn("cx", F.expr(f"x div {c}")).withColumn(
        "cy", F.expr(f"y div {c}")
    )
    boxes = F.broadcast(
        _local_df(
            pts.sparkSession,
            _SPATIAL_BOXES, "box_id int, x0 int, x1 int, y0 int, y1 int"
        ).select(
            "*",
            F.explode(
                F.expr(f"sequence(x0 div {c}, x1 div {c})")
            ).alias("cx"),
        ).select(
            "*",
            F.explode(
                F.expr(f"sequence(y0 div {c}, y1 div {c})")
            ).alias("cy"),
        )
    )
    return (
        pts.join(boxes, ["cx", "cy"])
        .filter(
            F.col("x").between(F.col("x0"), F.col("x1"))
            & F.col("y").between(F.col("y0"), F.col("y1"))
        )
        .groupBy("box_id")
        .agg(
            F.count("*").alias("n_points"),
            F.sum("o_orderkey").alias("sum_keys"),
        )
    )


# ---- blocked fuzzy entity-resolution join --------------------------------
_FUZZY_DFCAP = 200  # stop-gram guard: drop trigrams in > cap catalog names
_FUZZY_MAXDIST = 2


@_q(
    "join_fuzzy_qgram",
    f"""WITH probe AS (
    SELECT p_partkey AS probe_key,
           concat('x', substr(p_name, 2)) AS dirty
    FROM part WHERE p_partkey % 4 = 0),
pg AS (
    SELECT DISTINCT probe_key, dirty, substr(dirty, g.i, 3) AS gram
    FROM probe, unnest(generate_series(1, len(dirty) - 2)) AS g(i)
    WHERE len(dirty) >= 3),
cg0 AS (
    SELECT DISTINCT p_partkey, p_name, substr(p_name, g.i, 3) AS gram
    FROM part, unnest(generate_series(1, len(p_name) - 2)) AS g(i)
    WHERE len(p_name) >= 3),
keep AS (
    SELECT gram FROM cg0 GROUP BY gram
    HAVING count(DISTINCT p_partkey) <= {_FUZZY_DFCAP}),
cand AS (
    SELECT DISTINCT probe_key, dirty, p_partkey, p_name
    FROM pg JOIN keep USING (gram) JOIN cg0 USING (gram)),
scored AS (
    SELECT probe_key, p_partkey, levenshtein(dirty, p_name) AS dist
    FROM cand WHERE levenshtein(dirty, p_name) <= {_FUZZY_MAXDIST}),
best AS (
    SELECT probe_key, p_partkey AS matched_key, dist,
           row_number() OVER (PARTITION BY probe_key
                              ORDER BY dist, p_partkey) AS rn
    FROM scored)
SELECT probe_key, matched_key, cast(dist as int) AS dist
FROM best WHERE rn = 1""",
    "blocked fuzzy entity-resolution join — the dirty-names-to-catalog "
    "matching step every ingest dedup runs: probe names (each catalog "
    "name with its first character corrupted) match back to the part "
    "catalog by character-trigram blocking (candidates must share a "
    "surviving trigram; stop-grams in > "
    f"{_FUZZY_DFCAP} names are dropped — the same df-cap discipline as "
    "the shingle inverted index), exact levenshtein <= "
    f"{_FUZZY_MAXDIST} verification on candidates only, then a "
    "best-match-per-probe window (min distance, key tie-break). An "
    "unbounded edit-distance theta join becomes an equi-join on gram + "
    "a candidate-bounded verify + a per-probe top-1 — never probe x "
    "catalog. levenshtein is definition-identical in both engines, so "
    "the oracle hash-matches.",
)
def join_fuzzy_qgram(spark, sf_dir):
    part = _t(spark, sf_dir, "part")
    probe = part.filter(F.col("p_partkey") % 4 == 0).select(
        F.col("p_partkey").alias("probe_key"),
        F.expr("concat('x', substr(p_name, 2))").alias("dirty"),
    )
    pg = (
        probe.filter(F.length("dirty") >= 3)
        .select(
            "probe_key",
            "dirty",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(dirty) - 2),"
                    " i -> substring(dirty, i, 3))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    cg0 = (
        part.filter(F.length("p_name") >= 3)
        .select(
            "p_partkey",
            "p_name",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(p_name) - 2),"
                    " i -> substring(p_name, i, 3))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    keep = (
        cg0.groupBy("gram")
        .agg(F.countDistinct("p_partkey").alias("df"))
        .filter(F.col("df") <= _FUZZY_DFCAP)
        .select("gram")
    )
    cand = (
        pg.join(keep, "gram")
        .join(cg0, "gram")
        .select("probe_key", "dirty", "p_partkey", "p_name")
        .distinct()
    )
    scored = cand.select(
        "probe_key",
        "p_partkey",
        F.levenshtein("dirty", "p_name").alias("dist"),
    ).filter(F.col("dist") <= _FUZZY_MAXDIST)
    w = Window.partitionBy("probe_key").orderBy("dist", "p_partkey")
    return (
        scored.select(
            "probe_key",
            F.col("p_partkey").alias("matched_key"),
            "dist",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("probe_key", "matched_key", F.col("dist").cast("int").alias("dist"))
    )


# ---- from-spec Avro container source ------------------------------------
_AVRO_FIELDS = [
    ("o_orderkey", "long"),
    ("o_custkey", "long"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
]


@_q(
    "src_avro_scan",
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
       FROM orders WHERE o_totalprice > 150000""",
    "real interchange-format source: orders round-trips through "
    "from-spec Apache Avro Object Container Files (sources/avro.py — "
    "magic, metadata map, zigzag-varint longs, little-endian IEEE "
    "doubles, length-prefixed UTF-8, per-block sync markers; no "
    "spark-avro jar) — the reference's hand-rolled-wire-format source "
    "story (S1 CSV / S2 JSONL) extended to a binary container format. "
    "Write: one OCF per partition, executor-side. Read: binaryFile "
    "scan (one task per file — how Spark parallelizes container "
    "formats) into an Arrow mapInPandas decoder that verifies magic, "
    "codec, schema and every block's sync marker, raising with the "
    "offending path on corruption. Doubles round-trip as raw IEEE "
    "bytes, so the oracle (same filter on the parquet source) "
    "hash-matching proves the container encoding lossless.",
)
def src_avro_scan(spark, sf_dir):
    from .sources import avro

    out = _legacy_fixture_dir(sf_dir, "orders_avro")
    _cached_fixture(out, lambda: avro.write_avro_dataset(
        _t(spark, sf_dir, "orders"), out, "order", _AVRO_FIELDS, n_files=4))
    back = avro.read_avro(spark, f"{out}/*.avro", _AVRO_FIELDS)
    return back.filter(F.col("o_totalprice") > 150000)


_MP3_BR_CASE = "CASE doc_id % 14 + 1 " + " ".join(
    f"WHEN {i} THEN {v}"
    for i, v in enumerate(
        (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    )
    if 1 <= i <= 14
) + " END"
_MP3_SR_CASE = ("CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000 "
                "ELSE 32000 END")


@_q(
    "mm_mp3_metadata",
    f"""SELECT doc_id,
       cast(doc_id % 5 + 3 as int) AS n_frames,
       cast({_MP3_BR_CASE} as int) AS bitrate_kbps,
       cast({_MP3_SR_CASE} as int) AS sample_rate,
       round(cast((doc_id % 5 + 3) * 1152000 as double)
             / ({_MP3_SR_CASE}), 6) AS duration_ms
    FROM documents""",
    "MP3 frame-header walk — the header-metadata tier for the web's "
    "most common audio format (ISO/IEC 11172-3): each doc gets a "
    "real-layout MP3 (ID3v2.3 tag skipped via its syncsafe length, "
    "then CBR MPEG-1 Layer III frames with genuine 11-bit sync, "
    "bitrate/sample-rate table indexes, alternating padding bits, and "
    "the 144*bitrate/samplerate+padding frame length), and the walker "
    "verifies every frame header and that the walk lands exactly on "
    "end-of-stream — truncation, lost sync, VBR, or reserved indexes "
    "reject to NULL. Completes the audio surface's cheap first-pass "
    "tier (WAV RIFF, FLAC STREAMINFO, MP3 frames) that a 100 TB media "
    "crawl filters on before any sample decode. Map-only.",
)
def mm_mp3_metadata(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.mp3_metadata(multimodal.synthesize_mp3(d))


@_q(
    "mm_ogg_metadata",
    """WITH p AS (
    SELECT doc_id,
           doc_id % 4 + 2 AS n_pages,
           doc_id % 2 + 1 AS channels,
           CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 44100 END AS rate
    FROM documents)
SELECT doc_id, cast(n_pages as int) AS n_pages,
       cast(channels as int) AS channels,
       cast(rate as int) AS sample_rate,
       CAST((doc_id*997) % 100000 + rate AS BIGINT) AS last_granule,
       round(cast(((doc_id*997) % 100000 + rate) * 1000 as double)
             / rate, 6) AS duration_ms
FROM p""",
    "Ogg page walk (RFC 3533) + Vorbis identification header — the "
    "audio-container member the header-metadata tier lacked (r10, "
    "VERDICT r9 #7): each doc gets a real-layout Ogg/Vorbis stream "
    "head (BOS page with the \\x01vorbis ident packet, data pages with "
    "monotone granule positions, EOS flag, and the REAL non-reflected "
    "0x04C11DB7 page CRC — not zlib's), and the walker verifies "
    "capture pattern, version, CRC per page (bit flips reject), single "
    "logical stream, sequence continuity, BOS/EOS placement, and exact "
    "end-of-stream landing; channels/rate parse from the Vorbis ident, "
    "duration = last granule over the rate. Map-only, NULL on "
    "corruption.",
)
def mm_ogg_metadata(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.ogg_metadata(multimodal.synthesize_ogg(d))


@_q(
    "mm_mp4_tracks",
    """WITH p AS (
    SELECT doc_id,
           doc_id % 3 + 2 AS n_tracks,
           CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
                ELSE 90000 END AS ts,
           (doc_id*11) % 1920 + 128 AS w0,
           (doc_id*11 + 128) % 1920 + 128 AS w2,
           (doc_id*17) % 1080 + 128 AS h0,
           (doc_id*17 + 96) % 1080 + 128 AS h2
    FROM documents)
SELECT doc_id, cast(n_tracks as int) AS n_tracks,
       cast((n_tracks + 1) // 2 as int) AS n_video,
       cast(n_tracks // 2 as int) AS n_audio,
       cast(CASE WHEN n_tracks >= 3 THEN greatest(w0, w2) ELSE w0 END
            as int) AS max_width,
       cast(CASE WHEN n_tracks >= 3 THEN greatest(h0, h2) ELSE h0 END
            as int) AS max_height,
       round(cast(((doc_id*31) % 100000 + ts) * 1000 as double) / ts, 6)
           AS duration_ms
FROM p""",
    "multi-track MP4 census (r10, VERDICT r9 #7): real containers "
    "carry several traks (camera files: video + audio at minimum), so "
    "each doc gets a moov with 2-4 traks — video traks with 16.16 tkhd "
    "dimensions, audio traks with zero dims and tkhd volume — each "
    "carrying the REAL mdia(mdhd, hdlr) layout; the walker enumerates "
    "EVERY trak (decode_video_real stops at the first), classifies by "
    "the hdlr handler fourcc ('vide'/'soun'; anything else rejects the "
    "container), and reports the track census + max video resolution + "
    "mvhd duration — the fields a crawl buckets/filters video on "
    "before touching sample data. Map-only, NULL on corruption.",
)
def mm_mp4_tracks(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.mp4_track_stats(multimodal.synthesize_mp4_multitrack(d))


@_q(
    "mm_tiff_lzw_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%48+8 AS w, (doc_id*13)%32+8 AS h
    FROM documents),
px AS (
    SELECT doc_id, w, h, tx.x AS x, ty.y AS y
    FROM d,
         unnest(generate_series(0, w-1)) AS tx(x),
         unnest(generate_series(0, h-1)) AS ty(y))
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       CAST(sum((doc_id*7 + x*3 + y*5) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id*11 + x + 2*y) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id*3 + 5*x + y) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, w, h""",
    "REAL pixel decode — TIFF with LZW strips (r10: TIFF was the one "
    "image format whose coverage stopped at the metadata walk): each "
    "doc gets a genuine multi-strip chunky RGB TIFF whose strips are "
    "TIFF-6.0 LZW (MSB-first variable-width codes with the EARLY-"
    "change rule — a different dialect from the GIF LZW the engine "
    "already decodes: bit order reversed, width bumps one code early), "
    "and the decoder walks the IFD, validates strip geometry BEFORE "
    "decompressing (the bounded-inflate rule), LZW-decodes every strip "
    "from spec, and reduces to exact per-channel integer sums. Same "
    "planted pixel grid as mm_pixel_stats, so PNG and TIFF encodings "
    "of one image cross-check. Foreign twins gray.tif/rgb.tif (javax "
    "writer, uncompressed strips) decode exactly in tests. Map-only, "
    "NULL on corruption.",
)
def mm_tiff_lzw_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.tiff_pixel_stats(
        multimodal.synthesize_tiff_pixels(d, compression=5)
    )


@_q(
    "mm_tiff_variants_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%48+8 AS w, (doc_id*13)%32+8 AS h
    FROM documents),
px AS (
    SELECT doc_id, w, h, tx.x AS x, ty.y AS y
    FROM d,
         unnest(generate_series(0, w-1)) AS tx(x),
         unnest(generate_series(0, h-1)) AS ty(y))
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       CAST(sum((doc_id*7 + x*3 + y*5) % 256) AS BIGINT) AS sum_r,
       CAST(sum((doc_id*11 + x + 2*y) % 256) AS BIGINT) AS sum_g,
       CAST(sum((doc_id*3 + 5*x + y) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, w, h""",
    "TIFF dialect zoo (r11, VERDICT r10 #7 — the format's REAL-WORLD "
    "variance): each doc gets one of six dialect combinations cycling "
    "through big-endian MM byte order (classic Mac/Adobe — every "
    "multi-byte IFD field byte-swapped), PackBits RLE strips (TIFF 6.0 "
    "§9, the fax/scanner codec, from-spec codec pair), and "
    "PlanarConfiguration 2 (separate R/G/B component planes, "
    "plane-major strip order, 3× the strip count), crossed with the "
    "raw/LZW codecs already gated. The decoder byte-swaps, inflates "
    "each strip bounded by its declared geometry, re-interleaves "
    "planes, and reduces to exact per-channel integer sums — which the "
    "oracle pins to the planted grid arithmetic, so the sums are "
    "DIALECT-INVARIANT: any endian/codec/planar bug shifts a sum and "
    "hash-breaks. Map-only, NULL on corruption.",
)
def mm_tiff_variants_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.tiff_pixel_stats(multimodal.synthesize_tiff_variants(d))


_MP3_VBR_BR_CASE = "CASE (d.doc_id + g.f) % 14 + 1 " + " ".join(
    f"WHEN {i} THEN {v}"
    for i, v in enumerate(
        (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    )
    if 1 <= i <= 14
) + " END"


@_q(
    "mm_mp3_xing",
    f"""WITH f AS (
    SELECT d.doc_id,
           CASE d.doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS rate,
           {_MP3_VBR_BR_CASE} AS br,
           (d.doc_id + g.f) % 2 AS pad
    FROM documents d, unnest(generate_series(0, d.doc_id % 5 + 2)) AS g(f)),
agg AS (
    SELECT doc_id, rate, count(*) AS n,
           sum((144000 * br) // rate + pad) AS audio_bytes
    FROM f GROUP BY doc_id, rate)
SELECT doc_id, cast(n as int) AS n_frames, cast(rate as int) AS sample_rate,
       CAST((144000 * 32) // rate + audio_bytes AS BIGINT) AS total_bytes,
       cast(n * 1152000 as double) / rate AS duration_ms,
       cast(audio_bytes as double) * 8 * rate / (n * 1152) / 1000
           AS avg_bitrate_kbps
FROM agg""",
    "MP3 Xing/VBR index (r11, VERDICT r10 #7 — real-world MP3 is "
    "mostly VBR, where the frame walk's CBR duration math is exactly "
    "wrong): each doc gets a genuine VBR stream — ID3v2, then a Xing "
    "header frame (valid silent 32 kbps mono carrier with the 'Xing' "
    "fourcc at the side-info offset, flags, frame count, byte count "
    "per the public Xing SDK/LAME layout), then audio frames whose "
    "bitrate indexes cycle the table with alternating padding. The "
    "decoder walks every frame allowing per-frame bitrates and "
    "CROSS-CHECKS both Xing claims against the walk (a lying VBR "
    "index — the classic wrong-duration/seek bug — rejects), then "
    "derives duration from the frame count and the true mean bitrate "
    "from actual audio bytes. The oracle replays frame-length "
    "arithmetic ((144·br)//rate + pad summed over the cycling index) "
    "per doc. The CBR walker (mm_mp3_metadata) rejects these streams "
    "by design — the pair pins the dispatch boundary. Map-only, NULL "
    "on corruption.",
)
def mm_mp3_xing(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.mp3_xing_stats(multimodal.synthesize_mp3_vbr(d))


@_q(
    "mm_flac_seektable",
    """SELECT doc_id,
       cast(CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
            WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END as int)
           AS sample_rate,
       CAST((doc_id * 997) % 100000 + 1000 AS BIGINT) AS n_samples,
       cast(doc_id % 6 + 2 as int) AS n_points,
       cast(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END as int)
           AS n_placeholders,
       CAST((doc_id % 6 + 1) * 4096 AS BIGINT) AS last_seek_sample,
       CAST((doc_id % 1000 + 100) * (doc_id % 6 + 2) * (doc_id % 6 + 1) // 2
            AS BIGINT) AS sum_byte_offsets
FROM documents""",
    "FLAC SEEKTABLE walk (r11, VERDICT r10 #7): the metadata block "
    "range-request streaming depends on — 18-byte seek points (sample "
    "number, byte offset, frame samples) with the spec's MUSTs "
    "enforced: STREAMINFO first, block lengths landing exactly on the "
    "last-flagged block, table length ≡ 0 mod 18, STRICTLY ascending "
    "unique sample numbers, placeholder points (2^64−1) only at the "
    "tail (every 4th doc carries one — the pre-allocated-table "
    "pattern real encoders leave). The walker reads ALL metadata "
    "blocks, not just the leading STREAMINFO like the audio-metadata "
    "tier, and reduces the table to census integers the oracle "
    "restates arithmetically (Σ offsets = step·n(n−1)/2). Violations "
    "reject to NULL, never crash. Map-only.",
)
def mm_flac_seektable(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.flac_seektable_stats(
        multimodal.synthesize_flac_seektable(d)
    )


@_q(
    "mm_vorbis_comments",
    """SELECT doc_id,
       cast(doc_id % 4 + 3 as int) AS n_pages,
       cast(doc_id % 2 + 1 as int) AS channels,
       cast(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
            ELSE 44100 END as int) AS sample_rate,
       cast(3 + doc_id % 3 as int) AS n_comments,
       'sql-query-engine-spark r11' AS vendor,
       concat('artist-', cast(doc_id % 97 as varchar)) AS artist,
       concat('track ', cast(doc_id as varchar)) AS title,
       cast(doc_id % 21 + 1 as int) AS track,
       CAST(length(concat('ARTIST=artist-', cast(doc_id % 97 as varchar)))
          + length(concat('TITLE=track ', cast(doc_id as varchar)))
          + length(concat('TRACKNUMBER=',
                          cast(doc_id % 21 + 1 as varchar)))
          + 15 * (doc_id % 3) AS BIGINT) AS comment_bytes
FROM documents""",
    "Vorbis comment header (r11, VERDICT r10 #7): the second Vorbis "
    "packet — length-prefixed vendor string + KEY=value user comments "
    "+ framing bit (Vorbis I §5), the tags every player/tagger reads. "
    "Each doc's Ogg stream carries a REAL comment packet as page 1 "
    "(the r10 stream head's pages around it, so the full CRC/sequence"
    "/granule page walk gates the tag parse); the decoder enforces "
    "the packet grammar — magic, vendor bounds, every entry contains "
    "'=', UTF-8 validity, exact landing on a set framing bit — and "
    "extracts ARTIST/TITLE/TRACKNUMBER case-insensitively. The oracle "
    "restates the tag STRINGS and byte totals from doc_id arithmetic, "
    "so a single swallowed or duplicated byte anywhere in the "
    "lacing/packet path hash-breaks. Map-only, NULL on corruption.",
)
def mm_vorbis_comments(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.ogg_comment_stats(multimodal.synthesize_ogg_tagged(d))


@_q(
    "src_warc_scan",
    """SELECT doc_id,
       concat('http://example.com/doc/', cast(doc_id as varchar))
           AS target_uri,
       cast(octet_length(cast(text as blob)) as bigint) AS content_length,
       md5(text) AS payload_md5
    FROM documents""",
    "WARC/1.0 (ISO 28500) source — the container the web-scale crawl "
    "corpora actually ship in, so a 100 TB ingest's FIRST distributed "
    "scan is exactly this record walk: documents round-trip through "
    "from-spec WARC response records (version line, named headers, "
    "Content-Length byte framing, double-CRLF terminators; "
    "sources/warc.py), one .warc per partition written executor-side, "
    "read back via binaryFile + an Arrow mapInPandas walker that "
    "raises with the offending path on any framing defect — "
    "attributable ingest failures, the Avro source's convention. The "
    "oracle restates target URI, UTF-8 byte length, and payload md5 "
    "from the parquet source, so a hash match proves the container "
    "framing byte-lossless on multi-byte text.",
)
def src_warc_scan(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc")
    _cached_fixture(out, lambda: warc.write_warc_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4))
    back = warc.read_warc(spark, f"{out}/*.warc")
    return back.select(
        "doc_id",
        "target_uri",
        "content_length",
        F.md5("text").alias("payload_md5"),
    )


@_q(
    "src_warc_gz_scan",
    """SELECT doc_id,
       concat('http://example.com/doc/', cast(doc_id as varchar))
           AS target_uri,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS BIGINT)
           AS http_status,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 0
            ELSE least(doc_id % 4 + 1,
                       octet_length(cast(text as blob))) END AS BIGINT)
           AS n_chunks,
       cast(octet_length(cast(text as blob)) as bigint) AS content_length,
       md5(text) AS payload_md5
    FROM documents""",
    "Compressed crawl ingest — the EXACT layout Common Crawl ships "
    "(.warc.gz, ONE RFC 1952 gzip member PER RECORD, payloads framed "
    "as raw HTTP/1.1 responses): a 100 TB crawl read fans out on "
    "member boundaries, so the member walk IS the split contract. "
    "Three from-spec framing layers stack per record, each enforcing "
    "its own MUSTs (sources/warc.py): gzip header flag parse "
    "(FNAME on every 5th doc, verified header-CRC16 on every 7th), "
    "raw-DEFLATE inflate with a 256 MiB pre-trust ceiling, per-member "
    "CRC32 + ISIZE checks; the WARC record walk; then HTTP/1.1 with "
    "BOTH real framings mixed — Content-Length on every 3rd doc, "
    "chunked transfer coding (hex sizes, a chunk extension, an X-Len "
    "trailer) on the rest; half the CL branch additionally ships "
    "Content-Encoding: gzip entities (RFC 7231) inflated through the "
    "same verified member walk; every 11th doc is a 404 (non-200 "
    "records still carry bodies — real error pages do — so status is "
    "DATA, not a reject). Non-UTF-8 entities become NULL text rather "
    "killing the job (charset variety is a data property; framing/CRC "
    "defects still raise with the offending path). The oracle "
    "restates status and chunk counts from the builder's arithmetic "
    "and pins the entity md5, so one swallowed or duplicated byte in "
    "any layer hash-breaks. Map-only binaryFile → mapInPandas.",
)
def src_warc_gz_scan(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_gz")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4))
    back = warc.read_warc_gz(spark, f"{out}/*.warc.gz")
    return back.select(
        "doc_id",
        "target_uri",
        "http_status",
        "n_chunks",
        "content_length",
        F.md5("text").alias("payload_md5"),
    )


@_q(
    "src_warc_cdx_fetch",
    """SELECT doc_id,
       concat('http://example.com/doc/', cast(doc_id as varchar))
           AS target_uri,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS BIGINT)
           AS http_status,
       cast(octet_length(cast(text as blob)) as bigint) AS content_length,
       md5(text) AS payload_md5
    FROM documents WHERE doc_id % 50 = 0""",
    "CDX-indexed random access into .warc.gz — the OTHER read path the "
    "crawl corpora support (sources/warc.py read_cdx + "
    "fetch_warc_members): the writer emits a sidecar index row per "
    "gzip member with its exact byte extent; a consumer resolves URIs "
    "through the tiny index, then seeks and inflates ONLY the wanted "
    "members (an HTTP Range request on object storage) instead of "
    "scanning whole shards — at 100 TB this turns a point lookup from "
    "a shard scan into sum(length) bytes of I/O. The query fetches a "
    "2% URI subset through the index; the oracle pins the fetched "
    "records' status/length/md5 from the source table, so a wrong "
    "offset, an off-by-one extent, or a member boundary drift "
    "hash-breaks. Extent defects raise with shard@offset+length.",
)
def src_warc_cdx_fetch(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_gz_cdx")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4))
    idx = warc.read_cdx(spark, f"{out}/*.cdx")
    picked = idx.filter(F.col("doc_id") % 50 == 0)
    got = warc.fetch_warc_members(picked, out)
    return got.select(
        "doc_id",
        "target_uri",
        "http_status",
        "content_length",
        F.md5("text").alias("payload_md5"),
    )


@_q(
    "src_warc_digest_verify",
    """SELECT doc_id,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS BIGINT)
           AS http_status,
       sha256(text) AS payload_sha256,
       TRUE AS digest_verified
    FROM documents""",
    "ISO 28500 labelled digests + RFC 7230 declared trailers (r12 "
    "crawl-chain deepening; sources/warc.py): every record the writer "
    "emits now DECLARES what it carries — WARC-Block-Digest (sha256 "
    "over the block, verified in the record walk; hex OR the Base32 "
    "encoding Common Crawl uses), WARC-Payload-Digest (sha256 over "
    "the decoded entity, verified in this meta reader into the "
    "three-state digest_verified VERDICT column — TRUE/FALSE/NULL, so "
    "a bad provenance claim is filterable at 100 TB instead of "
    "killing the scan), and on chunked responses an X-Len + "
    "X-Payload-SHA256 TRAILER verified against the de-chunked message "
    "body — so one flipped bit in ANY container layer (deflate body, "
    "WARC block, a single chunk) is an attributable reject at the "
    "layer that owns it, never silent corruption, and a flipped "
    "payload CLAIM is a visible FALSE verdict. At 100 TB this is the "
    "integrity contract dedup keys "
    "on: the payload digest IS the exact-dedup key, computed once at "
    "ingest and certified end-to-end. The oracle recomputes the "
    "declared entity digest independently (DuckDB sha256 over the "
    "source text) and pins the verified flag TRUE, so a digest "
    "computed over the wrong byte range — pre-decode, with framing, "
    "off-by-one — hash-breaks. Map-only binaryFile → mapInPandas; "
    "sha256 label chosen over the customary sha1 so BOTH engines can "
    "recompute it (documented deviation).",
)
def src_warc_digest_verify(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_digests")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4))
    got = warc.read_warc_gz_meta(spark, f"{out}/*.warc.gz")
    return got.select(
        "doc_id", "http_status", "payload_sha256", "digest_verified")


@_q(
    "src_warc_charset_decode",
    """SELECT doc_id,
       CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN 'utf-8' WHEN 1 THEN 'windows-1252'
            WHEN 2 THEN 'iso-8859-1' ELSE 'us-ascii' END AS charset,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS BIGINT)
           AS http_status,
       md5(CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN text
           WHEN 1 THEN regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')
                       || ' €—™'
           WHEN 2 THEN regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')
                       || ' café £±°'
           ELSE regexp_replace(text, '[^\\x00-\\x7f]', '', 'g') END)
           AS text_md5
    FROM documents""",
    "charset decode beyond UTF-8 (r12 crawl-chain deepening): a real "
    "crawl's Content-Type charset parameter varies per page, and a "
    "100 TB ingest that assumes UTF-8 silently NULLs every legacy-"
    "codepage site. The writer rotates the entity encoding per doc "
    "(utf-8 / windows-1252 / iso-8859-1 / us-ascii, declared in the "
    "header); the reader decodes STRICTLY by the declared label — no "
    "guessing, no lossy replacement; a mislabeled or unknown-charset "
    "page becomes NULL text (data, not a reject — the framing layers "
    "still enforce their MUSTs). Non-UTF-8 docs are ASCII-folded then "
    "decorated with codepage-DISTINCTIVE bytes (cp1252's 0x80-0x9F "
    "euro/em-dash/TM, latin-1 high bytes) so every encoding "
    "round-trips exactly and the oracle can restate the expected "
    "decoded text in SQL: md5 pins the full decode path byte-exact — "
    "a reader that falls back to latin-1 for cp1252 (the classic "
    "mojibake bug) maps 0x80-0x9F to C1 controls and hash-breaks.",
)
def src_warc_charset_decode(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_charsets")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4, charsets=True))
    got = warc.read_warc_gz_meta(spark, f"{out}/*.warc.gz")
    return got.select(
        "doc_id", "charset", "http_status",
        F.md5("text").alias("text_md5"))


@_q(
    "src_warc_wat_sidecar",
    """SELECT doc_id,
       concat('http://example.com/doc/', cast(doc_id as varchar))
           AS target_uri,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS BIGINT)
           AS http_status,
       concat('doc & ', cast(doc_id as varchar)) AS title,
       cast(doc_id % 7 as bigint) AS n_links,
       md5(text) AS text_md5
    FROM documents""",
    "WAT-style metadata sidecar emission (r12 crawl-chain deepening): "
    "the companion-file layout the public crawl corpora ship — next "
    "to each fat .warc.gz shard, a thin .wat.jsonl with one JSON "
    "metadata record per WARC RESPONSE record (URI, status, entity bytes, "
    "entity sha256, and for parseable HTML the extracted title / "
    "link census / extracted-text md5). At 100 TB this split is the "
    "whole point: dedup planning, link-graph builds, and quality "
    "audits scan sidecars that are ~1% of the corpus bytes and never "
    "inflate a shard. Emission is executor-side (the task that walks "
    "a shard writes its sidecar — map-only, per-shard independent); "
    "the scan is a plain schema'd JSON-lines read. The fixture wraps "
    "each document in the deterministic HTML page builder "
    "(functions/html.py, the Spark-expression twin pinned to the "
    "Python builder), so the oracle restates title and link census "
    "from doc_id arithmetic and pins the extracted-text md5 to the "
    "SOURCE text via the escape→tokenize→unescape roundtrip law — "
    "the sidecar content is certified against the original table, "
    "not against the pipeline that wrote it.",
)
def src_warc_wat_sidecar(spark, sf_dir):
    from .functions import html as H
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_wat")

    def _build():
        pages = H.synthesize_html_pages(
            _t(spark, sf_dir, "documents")
        ).select("doc_id", F.col("html").alias("text"))
        warc.write_warc_gz_dataset(pages, out, n_files=4)
        warc.write_wat_sidecar(spark, out)

    _cached_fixture(out, _build)
    got = warc.read_wat(spark, f"{out}/*.wat.jsonl")
    return got.select(
        "doc_id", "target_uri", "http_status", "title", "n_links",
        "text_md5")


@_q(
    "src_warc_revisit_dedup",
    """SELECT doc_id,
       concat('http://mirror.example.com/doc/', cast(doc_id as varchar))
           AS target_uri,
       concat('http://example.com/doc/', cast(doc_id as varchar))
           AS refers_to_uri,
       sha256(text) AS payload_sha256,
       TRUE AS digest_matches
    FROM documents WHERE doc_id % 10 = 0""",
    "revisit records — dedup's WIRE format in the public crawl corpora "
    "(ISO 28500 §6.7.2 identical-payload-digest profile; r13 response-"
    "walk extension, sources/warc.py read_warc_revisits): a re-crawl "
    "whose payload matched an earlier capture ships BODY-LESS, carrying "
    "only the original's URI/record-id/date references and the shared "
    "payload digest — at 100 TB the revisit plane is how a crawl avoids "
    "storing the same page twice, and an ingest that drops it silently "
    "loses every re-crawl observation. The fixture appends a revisit "
    "member (mirror-host URI) after every 10th doc's response; the "
    "query scans the revisit plane and RESOLVES each reference back to "
    "its stored original by joining on the referred-to URI (revisits "
    "broadcast — the reference plane is a sliver of the response "
    "plane), pinning that the revisit's declared digest equals the "
    "original's verified payload digest. The response readers skip "
    "revisit records, so the two scans partition the record stream "
    "cleanly; the oracle restates URI arithmetic and recomputes the "
    "shared digest from the source table.",
)
def src_warc_revisit_dedup(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_revisits")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4, revisits=True))
    # r16: ONE fused walk emits both planes (r15 ran read_warc_revisits
    # AND read_warc_gz_meta — two full gzip+WARC walks of every shard),
    # and the resolution join is restated as a grouped per-key cross
    # product so the plan has exactly ONE subtree over the walk (a
    # two-branch filter split would get each filter pushed below any
    # exchange and re-run the walk per branch — observed in the plan).
    # Join equivalence: an inner equi-join equals, per key, the cross
    # product of the two sides' rows — collect both sides' rows under
    # the shared key (a response keys by its own target_uri, a revisit
    # by the uri it refers to), then explode both lists; a key missing
    # either side explodes to nothing, exactly the inner join. Structs
    # keep NULL digests as present-but-NULL, matching the join's
    # null-comparison semantics in digest_matches.
    ex = warc.read_warc_revisit_resolution(spark, f"{out}/*.warc.gz")
    key = F.when(
        F.col("wtype") == "revisit", F.col("refers_to_uri")
    ).otherwise(F.col("target_uri"))
    grouped = (
        ex.withColumn("k", key)
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(
            F.collect_list(
                F.when(
                    F.col("wtype") == "response",
                    F.struct(F.col("payload_sha256").alias("orig_sha256")),
                )
            ).alias("resp"),
            F.collect_list(
                F.when(
                    F.col("wtype") == "revisit",
                    F.struct(
                        F.col("doc_id"),
                        F.col("target_uri"),
                        F.col("payload_sha256").alias("rev_sha256"),
                    ),
                )
            ).alias("revs"),
        )
    )
    return (
        grouped.select("k", F.explode("revs").alias("rv"), "resp")
        .select("k", "rv", F.explode("resp").alias("rp"))
        .select(
            F.col("rv.doc_id").alias("doc_id"),
            F.col("rv.target_uri").alias("target_uri"),
            F.col("k").alias("refers_to_uri"),
            F.col("rv.rev_sha256").alias("payload_sha256"),
            (F.col("rv.rev_sha256") == F.col("rp.orig_sha256"))
            .alias("digest_matches"),
        )
    )


@_q(
    "src_warc_segment_reassembly",
    """SELECT doc_id,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS BIGINT)
           AS http_status,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 0
            ELSE least(doc_id % 4 + 1,
                       octet_length(cast(text as blob))) END AS BIGINT)
           AS n_chunks,
       cast(octet_length(cast(text as blob)) as bigint) AS content_length,
       md5(text) AS payload_md5
    FROM documents""",
    "WARC-Segment continuation reassembly (ISO 28500 §5.18-5.20; r13 "
    "response-walk extension, sources/warc.py _walk_response_records): "
    "records over a crawl writer's size ceiling ship SPLIT across a "
    "first record carrying WARC-Segment-Number: 1 and consecutive "
    "continuation records citing it via WARC-Segment-Origin-ID, the "
    "last declaring WARC-Segment-Total-Length — a reader that rejects "
    "them drops exactly the LARGEST documents in the corpus, the worst "
    "possible ingest bias. The fixture writes every 4th doc segmented "
    "into a 3-member chain; the shared file-scope walk reassembles "
    "chains in stream order (consecutive numbering, origin-id match, "
    "declared-total-length equality, no interleaving, per-segment "
    "block digests — every violation an attributable raise) and hands "
    "the assembled HTTP message to the SAME parse the unsegmented "
    "path uses. The oracle is byte-for-byte the unsegmented scan's "
    "oracle: status/chunk arithmetic + entity md5 — reassembly must "
    "be invisible in the result, provable only in the fixture layout.",
)
def src_warc_segment_reassembly(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_segments")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4, segments=4))
    back = warc.read_warc_gz(spark, f"{out}/*.warc.gz")
    return back.select(
        "doc_id",
        "http_status",
        "n_chunks",
        "content_length",
        F.md5("text").alias("payload_md5"),
    )


@_q(
    "src_warc_charset_mislabel",
    """SELECT doc_id,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS BIGINT)
           AS http_status,
       (doc_id % 2 = 0) AS decoded,
       CASE WHEN doc_id % 2 = 0 THEN md5(text) END AS text_md5,
       CAST(CASE WHEN doc_id % 2 = 1 THEN
                octet_length(cast(regexp_replace(text, '[^\\x00-\\x7f]',
                                                 '', 'g') as blob)) + 7
            ELSE octet_length(cast(text as blob)) END AS BIGINT)
           AS content_length
    FROM documents""",
    "mislabeled-charset NEGATIVE row (r13; the r12 charset query pins "
    "the positive decode path, this one pins the strict decoder's "
    "FAILURE contract): a real crawl is full of pages whose declared "
    "Content-Type charset does not match the bytes, and the reader "
    "must neither guess nor lossily replace — a mislabeled page "
    "becomes NULL text while every framing and integrity column stays "
    "intact (content_length counts the BYTES, the payload digest is "
    "over the BYTES so digest_verified stays TRUE, status is "
    "untouched). The fixture declares utf-8 for every odd doc while "
    "appending bytes that can never decode as it (a truncated 3-byte "
    "sequence + 0xff); even docs are honest utf-8. The oracle pins "
    "text_md5 NULL exactly on the mislabeled rows and intact md5 on "
    "the honest rows, plus the byte-count arithmetic of the folded "
    "entity — so a reader that silently latin-1-decodes the bad rows "
    "(mojibake instead of NULL) or drops them outright hash-breaks.",
)
def src_warc_charset_mislabel(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_mislabels")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4, mislabel=True))
    got = warc.read_warc_gz_meta(spark, f"{out}/*.warc.gz")
    return got.select(
        "doc_id",
        "http_status",
        F.col("text").isNotNull().alias("decoded"),
        F.md5("text").alias("text_md5"),
        "content_length",
    )


@_q(
    "src_warc_charset_east_asian",
    """SELECT doc_id,
       CASE CAST(doc_id % 6 AS INT)
            WHEN 0 THEN 'utf-8' WHEN 1 THEN 'shift_jis'
            WHEN 2 THEN 'gbk' WHEN 3 THEN 'euc-kr'
            WHEN 4 THEN 'big5' ELSE 'gb2312' END AS charset,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS BIGINT)
           AS http_status,
       md5(CASE CAST(doc_id % 6 AS INT)
           WHEN 0 THEN text
           WHEN 1 THEN regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')
                       || ' テスト'
           WHEN 2 THEN regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')
                       || ' 中文测试'
           WHEN 3 THEN regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')
                       || ' 한글'
           WHEN 4 THEN regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')
                       || ' 繁體中文'
           ELSE regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')
                       || ' 简体文本' END)
           AS text_md5
    FROM documents""",
    "east-asian multi-byte charset decode (r13; the r12 rotation "
    "covered the single-byte western codepages): a real crawl's "
    "JP/CN/TW/KR long tail declares shift_jis / gbk / euc-kr / big5 / "
    "gb2312, all MULTI-BYTE codepages where naive single-byte "
    "fallback produces mojibake, not an error. The writer rotates the "
    "entity encoding per doc (doc_id %% 6) with suffixes NATIVE to "
    "each codepage (JIS X 0208 katakana, GBK hanzi, KS X 1001 hangul, "
    "Big5 traditional forms, GB2312 level-1 simplified) declared in the "
    "Content-Type parameter; the reader decodes STRICTLY by the "
    "declared label through the stdlib codecs. The oracle restates "
    "the expected decoded text in SQL (ASCII-fold + the literal "
    "suffix) and pins its md5 — a reader that latin-1s the shift_jis "
    "bytes (the classic CJK mojibake) or lossily replaces hash-breaks "
    "on every non-utf-8 row.",
)
def src_warc_charset_east_asian(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_charsets_ea")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4,
        charsets="east-asian"))
    got = warc.read_warc_gz_meta(spark, f"{out}/*.warc.gz")
    return got.select(
        "doc_id", "charset", "http_status",
        F.md5("text").alias("text_md5"))


@_q(
    "src_warc_cdx_segment_fetch",
    """SELECT doc_id,
       concat('http://example.com/doc/', cast(doc_id as varchar))
           AS target_uri,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS BIGINT)
           AS http_status,
       cast(octet_length(cast(text as blob)) as bigint) AS content_length,
       md5(text) AS payload_md5
    FROM documents WHERE doc_id % 4 = 0""",
    "CDX random access to SEGMENTED records (r13): the documents big "
    "enough to ship as WARC-Segment chains are exactly the ones a "
    "point lookup most wants, so the writer indexes each chain as ONE "
    "extent (offset of the first member, summed length) and "
    "fetch_warc_members reassembles the chain IN-EXTENT — an indexed "
    "fetch reads sum(length) bytes (one Range request on object "
    "storage), walks first-record + continuations through the same "
    "reassembly rules as the shard scan, and requires exactly one "
    "logical response per extent (a partial chain or an interloping "
    "record raises with shard@offset+length). The query fetches every "
    "segmented doc (doc_id %% 4 = 0 in this fixture) through the "
    "index; the oracle pins status/byte-length/md5 from the source "
    "table, so a chain extent off by one member, a mis-summed length, "
    "or a reassembly drift hash-breaks.",
)
def src_warc_cdx_segment_fetch(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_segments")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4, segments=4))
    idx = warc.read_cdx(spark, f"{out}/*.cdx")
    picked = idx.filter(F.col("doc_id") % 4 == 0)
    got = warc.fetch_warc_members(picked, out)
    return got.select(
        "doc_id",
        "target_uri",
        "http_status",
        "content_length",
        F.md5("text").alias("payload_md5"),
    )


@_q(
    "src_warc_request_log",
    """SELECT doc_id,
       concat('http://example.com/doc/', cast(doc_id as varchar))
           AS target_uri,
       CASE WHEN doc_id % 5 = 0 THEN 'POST' ELSE 'GET' END AS method,
       concat('/doc/', cast(doc_id as varchar)) AS request_target,
       'HTTP/1.1' AS http_version,
       concat('sqes-crawler/', cast(doc_id % 3 as varchar)) AS user_agent,
       CAST(CASE WHEN doc_id % 5 = 0
            THEN octet_length(cast(concat('q=', cast(doc_id as varchar),
                 '&page=', cast(doc_id % 7 as varchar)) as blob))
            ELSE 0 END AS BIGINT) AS body_len,
       CAST(CASE WHEN doc_id % 10 = 0
            THEN least(doc_id % 3 + 1,
                 octet_length(cast(concat('q=', cast(doc_id as varchar),
                 '&page=', cast(doc_id % 7 as varchar)) as blob)))
            ELSE 0 END AS BIGINT) AS n_chunks,
       concat('<urn:uuid:00000000-0000-0000-0000-',
              lpad(cast(doc_id as varchar), 12, '0'), '>') AS concurrent_to
    FROM documents""",
    "REQUEST-side crawl ingest (r14 — closes the last unimplemented "
    "half of the crawl chain): real captures store the client message "
    "too (ISO 28500 §6.4 request records, WARC-Concurrent-To linking "
    "each to its response), and the politeness/forensics plane reads "
    "exactly that — what was asked for, by which agent, with which "
    "method and body. The writer pairs every response with a request "
    "member (GET majority; every 5th doc a POST — every 10th framing "
    "its body CHUNKED with verified X-Len/X-Payload-SHA256 trailers, "
    "the rest Content-Length); read_warc_requests walks shards with "
    "the same O(member) streaming scan and parses each block with the "
    "strict request-side parser (sources/warc.py "
    "parse_http_request_ex): request-line token checks, both body "
    "framings, and RFC 7230 §3.3.3's request/response ASYMMETRY — no "
    "framing header on a request means an EMPTY body, where the same "
    "absence on a response is a reject. The oracle restates every "
    "column from the builder's arithmetic (method/target/agent "
    "rotation, body length, chunk count, the lpad'd concurrent-to "
    "id), so a swallowed body byte, a mis-parsed request line, or a "
    "broken request→response link hash-breaks. Map-only, one task "
    "per shard; the response readers skip request records, so the "
    "two scans partition the record stream cleanly.",
)
def src_warc_request_log(spark, sf_dir):
    from .sources import warc

    out = _legacy_fixture_dir(sf_dir, "documents_warc_gz_req")
    _cached_fixture(out, lambda: warc.write_warc_gz_dataset(
        _t(spark, sf_dir, "documents"), out, n_files=4, requests=True))
    return warc.read_warc_requests(spark, f"{out}/*.warc.gz").select(
        "doc_id",
        "target_uri",
        "method",
        "request_target",
        "http_version",
        "user_agent",
        "body_len",
        "n_chunks",
        "concurrent_to",
    )


# ---- distributed triangle counting --------------------------------------
_TRI_CAP = 20  # max distinct users per co-occurrence group (blocking cap)


@_q(
    "graph_triangle_count",
    f"""WITH grp AS (
    SELECT (epoch_us(ts) // 3600000000) AS hr, event_type, user_id
    FROM events GROUP BY 1, 2, 3),
sized AS (
    SELECT hr, event_type FROM grp GROUP BY hr, event_type
    HAVING count(*) BETWEEN 2 AND {_TRI_CAP}),
edges AS MATERIALIZED (
    SELECT DISTINCT a.user_id AS u, b.user_id AS v
    FROM grp a
    JOIN sized s ON s.hr = a.hr AND s.event_type = a.event_type
    JOIN grp b ON b.hr = a.hr AND b.event_type = a.event_type
             AND a.user_id < b.user_id),
tri AS (
    SELECT count(*) AS n_tri
    FROM edges e1
    JOIN edges e2 ON e2.u = e1.v
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT (SELECT cast(count(DISTINCT user_id) as bigint) FROM grp)
           AS n_vertices,
       (SELECT cast(count(*) as bigint) FROM edges) AS n_edges,
       cast(n_tri as bigint) AS n_triangles
FROM tri""",
    "distributed triangle counting over the user co-occurrence graph "
    "(users sharing an (hour, event_type) cell are adjacent) — the "
    "clustering-coefficient primitive behind community detection and "
    "bot-ring/collusion screens. Edge construction uses the blocking "
    "discipline every near-dup path here uses: co-occurrence cells are "
    "CAPPED at 20 distinct users (a 1M-user cell would otherwise emit "
    "5*10^11 edges — the cap bounds edge fan-out exactly like the "
    "df-capped shingle index), and the canonical a<b<c orientation "
    "counts each triangle exactly once via two shuffled equi-joins on "
    "vertex keys (the standard MapReduce triangle algorithm: join "
    "wedges u->v->w with the closing edge u->w). Pure integer oracle.",
)
def graph_triangle_count(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    grp = ev.select(
        F.expr("(ts div 1000) div 3600000000").alias("hr"),
        "event_type",
        "user_id",
    ).distinct()
    sized = (
        grp.groupBy("hr", "event_type")
        .agg(F.count("*").alias("nu"))
        .filter(F.col("nu").between(2, _TRI_CAP))
        .select("hr", "event_type")
    )
    g = grp.join(sized, ["hr", "event_type"])
    edges = (
        g.alias("a")
        .join(g.alias("b"), ["hr", "event_type"])
        .filter(F.col("a.user_id") < F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .distinct()
        .persist()  # three self-join consumers
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .groupBy()
        .agg(F.count("*").alias("n_triangles"))
    )
    nv = grp.groupBy().agg(
        F.expr("cast(count(DISTINCT user_id) as bigint)").alias("n_vertices")
    )
    ne = edges.groupBy().agg(F.count("*").alias("n_edges"))
    return (
        nv.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select("n_vertices", "n_edges", "n_triangles")
    )


def _iter_checkpoint(df: DataFrame, checkpoint_dir: str | None, *, eager: bool = False) -> DataFrame:
    """Lineage truncation for iterative loops, with a durability knob.

    Default: ``localCheckpoint`` — blocks live on executors, fast, but a
    lost executor kills a long job because the truncated lineage cannot
    recompute. On a real cluster pass ``checkpoint_dir`` (an HDFS/S3
    path): iterations then use reliable ``checkpoint()`` so recovery
    reads the checkpoint store instead of dying mid-power-iteration.
    Mirrors ``functions/dedup.py``'s connected-components option
    (dedup_clusters), per the r7 verdict: every iterative loop in the
    engine exposes the same knob.

    Reliable ``checkpoint()`` materializes eagerly-on-first-use through
    the checkpoint store; the ``eager`` flag is honored on both paths.
    """
    if checkpoint_dir:
        # one chokepoint for setCheckpointDir across the engine (ADVICE
        # r9) — see functions/partitioning.py:configure_checkpoint_dir
        # for the caching rationale (resolved-URI mismatch, ADVICE r8)
        from .functions.partitioning import configure_checkpoint_dir

        configure_checkpoint_dir(df.sparkSession.sparkContext, checkpoint_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


# ---- PageRank over the customer-supplier purchase graph ------------------
_PR_SCALE = 10**15  # integer rank scale: 85*SCALE = 8.5e16 << 2^63
# MUST stay small on the default (checkpoint_dir=None) path: each
# iteration embeds the previous rounds' plan, so analysis cost grows
# superlinearly with the count (the classifier-train lesson); raise it
# only together with a checkpoint_dir (reliable per-round truncation)
# or a periodic localCheckpoint every ~5-8 rounds.
_PR_ITERS = 5
_PR_TOPK = 20


def _pr_iter_cte(i: int) -> str:
    """One unrolled PageRank iteration as a DuckDB CTE (r{i} from
    r{i-1}): contrib = sum over in-neighbors of rank // out-degree, new
    rank = (15*SCALE)//(100*N) + (85*contrib)//100 — pure bigint floor
    division, identical in both engines."""
    return (
        f"r{i} AS (SELECT s.node,"
        f" (15*{_PR_SCALE})//(100*n.cnt) + (85*s.t)//100 AS rank"
        f" FROM (SELECT e.b AS node, sum(r.rank // deg.d) AS t"
        f" FROM e JOIN r{i - 1} r ON e.a = r.node"
        f" JOIN deg ON deg.node = e.a"
        f" GROUP BY e.b) s, n)"
    )


_PR_ITER_CTES = ",\n".join(_pr_iter_cte(i) for i in range(1, _PR_ITERS + 1))


@_q(
    "graph_pagerank",
    f"""WITH e0 AS MATERIALIZED (
    SELECT DISTINCT o_custkey*2 AS a, l_suppkey*2 + 1 AS b
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
e AS MATERIALIZED (
    SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
deg AS MATERIALIZED (SELECT a AS node, count(*) AS d FROM e GROUP BY a),
n AS (SELECT count(*) AS cnt FROM deg),
r0 AS (SELECT node, {_PR_SCALE} // cnt AS rank FROM deg, n),
{_PR_ITER_CTES}
SELECT node, CAST(rank AS BIGINT) AS rank
FROM r{_PR_ITERS} ORDER BY rank DESC, node
LIMIT {_PR_TOPK}""",
    "PageRank — the canonical iterative distributed graph algorithm — "
    "over the bipartite customer-supplier purchase graph (distinct "
    "(o_custkey, l_suppkey) pairs through the orders-lineitem join, "
    "node ids disjointified by parity, edges symmetrized so no node "
    "dangles). Five power iterations with damping 0.85, computed "
    "ENTIRELY in scaled bigint floor arithmetic (rank//out-degree "
    "contributions, (15*S)//(100*N) teleport, (85*t)//100 damp) so "
    "both engines produce bit-identical ranks — the documented "
    "deviation from float PageRank is the floor at each step. Scale "
    "shape: edges are materialized ONCE (localCheckpoint) and reused "
    "every iteration; each iteration is one edges-by-source shuffle "
    "join against the node-sized rank table plus one groupBy-sum — the "
    "classic Pregel/GraphX plan re-expressed in DataFrames; rank "
    "lineage is checkpoint-truncated per round when a checkpoint store "
    "is configured (the classifier-train lesson: un-truncated "
    "iterative lineage multiplies the plan per round). r16 shape: the "
    "edge table is hash-partitioned by source ONCE in-plan (AQE stage "
    "reuse shares that exchange across all five iterations of one "
    "execution), the out-degree rides the NODE-sized rank table into "
    "each iteration, and NOTHING is persisted — every execution is a "
    "full cold computation, so the bench's min-of-3 measures the "
    "query, not a leaked cache (r15's persist()ed edges made reps 2-3 "
    "warm reads and squatted executor memory for every later bench "
    "row). Top-20 by (rank, node) keeps the output "
    "bounded. rank is "
    "CAST to BIGINT in the oracle: DuckDB's integer sum() propagates "
    "HUGEINT through the CTE chain, and surfaced HUGEINT is the "
    "confirmed mechanism behind the r6/r7 driver-red rows (see "
    "tpch_q12_late_priority) — this query was never driver-checked and "
    "would have reproduced it.",
)
def graph_pagerank(spark, sf_dir, checkpoint_dir: str | None = None):
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    e = e0.unionByName(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # r16: NO persist. r15 persisted deg/ed, which made the bench's
    # min-of-3 read warm-cache reps (cold first rep measured 7-10 s vs
    # 1.9 s warm at sf0.1) and left three InMemoryRelations squatting on
    # executor memory for every later bench row — the caches were never
    # unpersisted and a query builder has no action-completion hook to do
    # it from. Every rep is now a full cold computation: within ONE
    # action, AQE stage reuse deduplicates the identical edge/degree
    # exchange subtrees across the five iterations, so the edge table is
    # still shuffled by source only once per execution.
    deg = (
        e.groupBy("a").agg(F.count("*").alias("d"))
        .withColumnRenamed("a", "node")
    )  # reused by nrow, r init, and the per-iteration rank⋈degree join
    # node count as a LAZY 1-row aggregate (broadcast into each consumer)
    # instead of a blocking driver-side count() — the whole query stays
    # one DAG with no scalar job (the text_idf pattern)
    nrow = F.broadcast(deg.agg(F.count("*").alias("n_nodes")))
    par = spark.sparkContext.defaultParallelism
    # edges hash-partitioned by source ONCE; every iteration's join sees
    # this exchange (reused across iterations by AQE stage reuse)
    ep = e.repartition(par, "a")
    r = deg.crossJoin(nrow).select(
        "node", F.expr(f"{_PR_SCALE} div n_nodes").alias("rank")
    )
    tele_expr = f"((15 * {_PR_SCALE}) div (100 * n_nodes)) + (85 * t) div 100"
    for _ in range(_PR_ITERS):
        # r16: attach the out-degree to the NODE-SIZED rank table, not to
        # the full edge table (r15's ed = e⋈deg paid a second whole-edge
        # join + reshuffle during setup). rank and degree both come out
        # of node-keyed aggregations, so this join is co-partitioned; the
        # planner picks the strategy for the edges⋈rd join itself —
        # locally rd broadcasts (measured faster than the r15
        # shuffle_hash hints once the caches were gone: 3.0-3.7 s vs
        # 3.9-5.2 s min-of-3), and at scale billion-node rank tables
        # exceed any broadcast threshold and fall back to a shuffled join
        # against the already-partitioned edge side.
        rd = r.join(deg, "node").select(
            "node", F.expr("rank div d").alias("c")
        )
        contrib = (
            ep.join(rd, ep.a == rd.node)
            .select(F.col("b").alias("node"), "c")
            .groupBy("node")
            .agg(F.sum("c").alias("t"))
        )
        r = contrib.crossJoin(nrow).select(
            "node", F.expr(tele_expr).alias("rank")
        )
        if checkpoint_dir:
            # cluster durability knob: reliable checkpoint still truncates
            # per-round lineage when a checkpoint store is configured
            r = _iter_checkpoint(r, checkpoint_dir)
    return r.orderBy(F.desc("rank"), "node").limit(_PR_TOPK).select(
        "node", "rank"
    )


@_q(
    "mm_png_metadata",
    """SELECT doc_id,
       cast((doc_id*7)%48+8 as int) AS width,
       cast((doc_id*13)%32+8 as int) AS height,
       concat('doc-', cast(doc_id as varchar)) AS title,
       concat('src', cast(doc_id % 20 as varchar)) AS source_tag,
       cast(2834 + doc_id % 100 as bigint) AS ppu_x,
       cast((2834 + doc_id % 100) * 2 as bigint) AS ppu_y,
       cast(1 as int) AS unit
FROM documents""",
    "container-metadata extraction — the curation signal that rides "
    "INSIDE media files (provenance, resolution, tooling tags): each "
    "doc's real PNG carries two tEXt chunks (Title/Source, "
    "NUL-separated latin-1 per the PNG spec) and a pHYs resolution "
    "chunk, and the extractor walks the chunk stream verifying EVERY "
    "chunk's CRC-32 before trusting it — metadata from a corrupt "
    "container becomes a NULL row, never a poisoned value. Pure "
    "byte-walk (no pixel decode), so this is the cheap first pass a "
    "100 TB media crawl runs before any expensive decode; oracle "
    "restates the planted fields arithmetically. Map-only.",
)
def mm_png_metadata(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.png_metadata(multimodal.synthesize_png_metadata(d))


@_q(
    "mm_format_sniffer",
    """WITH m AS (
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN 'unknown'
                ELSE CASE CAST(doc_id % 8 AS INT)
                     WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                     WHEN 2 THEN 'jpeg' WHEN 3 THEN 'tiff'
                     WHEN 4 THEN 'wav' WHEN 5 THEN 'flac'
                     WHEN 6 THEN 'mp3' ELSE 'mp4' END
           END AS format
    FROM documents)
SELECT format, cast(count(*) as bigint) AS n_payloads
FROM m GROUP BY format""",
    "magic-byte format sniffing over the full eight-format container "
    "zoo (PNG, GIF, JPEG, TIFF, WAV, FLAC, MP3, MP4 interleaved in ONE "
    "binary column) — the first pass a 100 TB mixed crawl runs on "
    "every payload: a handful of byte comparisons (signatures, "
    "byte-order marks, RIFF/WAVE, fLaC, ID3/frame-sync, ftyp at offset "
    "4) routes each blob to its decoder; a planted corruption slice "
    "(every 97th doc's magic region overwritten) must land in "
    "'unknown', never raise. Counts per routed format are pure "
    "doc_id arithmetic — the oracle restates the routing table "
    "exactly. Map-only.",
)
def mm_format_sniffer(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.format_sniffer(
        multimodal.synthesize_sniff_corpus(d)
    ).groupBy("format").agg(F.count("*").alias("n_payloads"))


@_q(
    "mm_tiff_metadata",
    """SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byteorder,
       cast((doc_id*7) % 48 + 8 as int) AS width,
       cast((doc_id*13) % 32 + 8 as int) AS height,
       cast(CASE WHEN doc_id % 3 = 0 THEN 16 ELSE 8 END as int) AS bits,
       cast(doc_id % 2 as int) AS photometric
    FROM documents""",
    "TIFF 6.0 IFD metadata walk — the fourth image container tier, and "
    "the one where BYTE ORDER is part of the format: the corpus "
    "alternates 'II' (little-endian) and 'MM' (big-endian) files, so "
    "the walker must thread the declared endianness through the magic, "
    "the IFD offset, every entry's tag/type/count, and the "
    "left-justified SHORT value slots. Unknown order marks, wrong "
    "magic, truncation, or missing required tags reject to NULL. "
    "Arithmetic oracle restates the planted fields. Map-only.",
)
def mm_tiff_metadata(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.tiff_metadata(multimodal.synthesize_tiff(d))


@_q(
    "mm_video_pixel_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%6+2 AS bw, (doc_id*13)%4+2 AS bh,
           doc_id%4+2 AS n
    FROM documents),
px AS (
    SELECT doc_id, bw, bh, n,
           (((doc_id + 12*tf.f)*3 + tk.k*5) % 225) - 112 AS lev
    FROM d,
         unnest(generate_series(0, n - 1)) AS tf(f),
         unnest(generate_series(0, bw*bh - 1)) AS tk(k)),
s AS (
    SELECT doc_id, bw, bh, n, sum(lev) AS slev, count(*) AS nb
    FROM px GROUP BY doc_id, bw, bh, n)
SELECT doc_id, cast(bw*8 as int) AS width, cast(bh*8 as int) AS height,
       cast(n as int) AS n_frames,
       cast(n*40 as double) AS duration_ms,
       round((64*(slev + 128*nb)) / cast(bw*8*bh*8*n as double), 6)
           AS mean_gray
FROM s""",
    "REAL VIDEO PIXEL DECODE — the one modality that was still "
    "header-only: each doc gets a playable-layout MJPEG-in-MP4 "
    "(ISO/IEC 14496-12 ftyp + mdat of 2-5 complete baseline-JPEG "
    "frames + the full sample-table chain: stsd 'jpeg' "
    "VisualSampleEntry, stts, stsc run-length sample-to-chunk mapping, "
    "stsz, stco), and the decoder walks moov->trak(vide)->mdia->minf->"
    "stbl, resolves every sample's absolute byte range through the "
    "general stsc expansion, and runs each frame through the complete "
    "from-spec T.81 baseline JPEG pixel decoder — per-video "
    "frame-count, 25fps duration, and pixel mean over all frames. "
    "Frame f of doc d reuses the JPEG corpus at doc d+12f (the dims "
    "grid's period), so the oracle restates every pixel with the same "
    "modular arithmetic. Corrupt boxes, bad sample ranges, or frames "
    "failing JPEG decode reject the doc to NULL, never a stage "
    "failure. Map-only: the Arrow batch bounds memory; nothing is "
    "corpus-global.",
)
def mm_video_pixel_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.video_pixel_stats(multimodal.synthesize_mjpeg_video(d))


# ---- next-event-prediction training examples ----------------------------
_NEX_HIST = 4  # bounded history length per example


@_q(
    "pipeline_next_event_dataset",
    f"""WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS us
    FROM events),
seq AS (
    SELECT event_id, user_id, us, event_type AS label,
           array_agg(event_type) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id
                                       ROWS BETWEEN {_NEX_HIST} PRECEDING
                                       AND 1 PRECEDING) AS history
    FROM ev)
SELECT event_id, user_id, us,
       array_to_string(history, '|') AS history, label,
       cast(len(history) as int) AS hist_len
FROM seq WHERE len(history) = {_NEX_HIST}""",
    "sequence-model training examples from event streams: for every "
    "event with at least 4 predecessors, emit (history of the last 4 "
    "event types in order, label = the event that followed) — the "
    "next-token-prediction dataset shape, generated at the event level "
    "the way a behavior/recommendation model consumes it. One bounded "
    "ROWS window per user (history length is a compile-time constant, "
    "state is O(4) per row, partitions are per-user — nothing "
    "corpus-global), no self-joins, no explode-and-rejoin. Frame order "
    "(us, event_id) is total, so the aggregated array is deterministic "
    "and the oracle hash-matches element order included. The history is "
    "emitted as a '|'-joined string (order-preserving) so downstream "
    "tabular consumers — and the driver's pandas canonicalizer — see "
    "only scalar columns.",
)
def pipeline_next_event_dataset(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-_NEX_HIST, -1)
    )
    seq = ev.select(
        "event_id",
        "user_id",
        F.expr("ts div 1000").alias("us"),
        F.col("event_type").alias("label"),
    ).select(
        "event_id", "user_id", "us", "label",
        F.collect_list("label").over(w).alias("history"),
    )
    return seq.filter(F.size("history") == _NEX_HIST).select(
        "event_id", "user_id", "us",
        F.concat_ws("|", "history").alias("history"), "label",
        F.size("history").alias("hist_len"),
    )


# ---- hashing-trick featurization ----------------------------------------
_FH_DIM = 1024


@_q(
    "text_feature_hashing",
    f"""WITH toks AS (
    SELECT doc_id, t.tok
    FROM documents,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)),
hashed AS (
    SELECT doc_id,
           cast(concat('0x', substr(md5(concat('fh:', tok)), 1, 12))
                as bigint) % {_FH_DIM} AS bucket,
           CASE WHEN cast(concat('0x', substr(md5(concat('fs:', tok)), 1, 12))
                     as bigint) % 2 = 0 THEN 1 ELSE -1 END AS sgn
    FROM toks)
SELECT doc_id, bucket, cast(sum(sgn) as bigint) AS feat
FROM hashed GROUP BY doc_id, bucket
HAVING sum(sgn) <> 0""",
    "hashing-trick featurization (Weinberger et al. 2009 — the "
    "fastText/Vowpal-Wabbit input layer): tokens hash into a fixed "
    "1024-dim space with a second independent hash supplying a +/-1 "
    "sign, so collisions cancel in expectation instead of biasing "
    "upward — the property that lets a FIXED feature width survive an "
    "unbounded vocabulary, which is exactly the 100 TB constraint (no "
    "vocabulary dictionary to build, ship, or keep consistent across "
    "workers). One explode + one map-side-combinable aggregate; "
    "engine-neutral md5 arithmetic keeps it oracle-exact; zero-sum "
    "buckets are dropped on both sides.",
)
def text_feature_hashing(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    hashed = toks.select(
        "doc_id",
        F.expr(
            f"cast(conv(substr(md5(concat('fh:', tok)), 1, 12), 16, 10)"
            f" as bigint) % {_FH_DIM}"
        ).alias("bucket"),
        F.expr(
            "CASE WHEN cast(conv(substr(md5(concat('fs:', tok)), 1, 12),"
            " 16, 10) as bigint) % 2 = 0 THEN 1 ELSE -1 END"
        ).alias("sgn"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").alias("feat"))
        .filter(F.col("feat") != 0)
    )


@_q(
    "mm_gif_interlaced_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%48+8 AS w, (doc_id*13)%32+8 AS h
    FROM documents),
px AS (
    SELECT doc_id, w, h,
           (doc_id*5 + tx.x*7 + ty.y*11) % 256 AS idx,
           ty.y*w + tx.x + 1 AS pos
    FROM d,
         unnest(generate_series(0, w-1)) AS tx(x),
         unnest(generate_series(0, h-1)) AS ty(y)),
s AS (
    SELECT doc_id, w, h,
           sum(idx) AS sr,
           sum((idx*2) % 256) AS sg,
           sum((idx*3) % 256) AS sb,
           sum(pos * idx) AS ph,
           count(*) AS n
    FROM px GROUP BY doc_id, w, h)
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       round(sr / cast(n as double), 6) AS mean_r,
       round(sg / cast(n as double), 6) AS mean_g,
       round(sb / cast(n as double), 6) AS mean_b,
       cast(ph as bigint) AS poshash
FROM s""",
    "INTERLACED GIF decode (GIF89a appendix E): the index stream "
    "arrives in the 4-pass row order (0,8,.. / 4,12,.. / 2,6,.. / odd "
    "rows) and the decoder re-weaves it onto the row-major grid after "
    "the LZW inflate. Channel sums are order-INdependent, so the "
    "output adds a position-weighted checksum (sum over pixels of "
    "(y*w+x+1) * palette_index) that is wrong under any row "
    "misplacement — the oracle restates it arithmetically over the "
    "generate_series grid. The sequential-GIF decoder rejects "
    "interlaced streams (flag gate), keeping the two paths honest. "
    "Map-only.",
)
def mm_gif_interlaced_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.gif_interlaced_stats(
        multimodal.synthesize_gif_pixels_interlaced(d)
    )


@_q(
    "mm_gif_frame_sample",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%48+8 AS w, (doc_id*13)%32+8 AS h,
           doc_id % 5 + 2 AS nf
    FROM documents),
fr AS (
    SELECT doc_id, w, h, tf.f
    FROM d, unnest(generate_series(0, nf-1)) AS tf(f)
    WHERE tf.f % 2 = 0),
px AS (
    SELECT doc_id, w, h, f,
           (doc_id*5 + f*13 + tx.x*7 + ty.y*11) % 256 AS idx
    FROM fr, unnest(generate_series(0, w-1)) AS tx(x),
         unnest(generate_series(0, h-1)) AS ty(y)),
s AS (
    SELECT doc_id, w, h, f,
           sum(idx) AS sr, sum((idx*2) % 256) AS sg,
           sum((idx*3) % 256) AS sb, count(*) AS n
    FROM px GROUP BY doc_id, w, h, f)
SELECT doc_id, cast(f as int) AS frame_idx, cast(10 + f as int) AS delay_cs,
       cast(w as int) AS width, cast(h as int) AS height,
       round(sr / cast(n as double), 6) AS mean_r,
       round(sg / cast(n as double), 6) AS mean_g,
       round(sb / cast(n as double), 6) AS mean_b
FROM s""",
    "REAL multi-frame decode + frame SAMPLING — the video-pipeline op "
    "(sample every Nth frame, decode only those) on a container we can "
    "decode fully from spec: each doc gets a genuine animated GIF89a "
    "(NETSCAPE looping extension, per-frame Graphic Control Extensions "
    "carrying real delays, full-size LZW-compressed frames), and the "
    "pipeline walks the block stream, inflates every 2nd frame through "
    "the real LZW codec, and emits one row per sampled frame with its "
    "GCE delay and channel means — the 1-to-N fan-out shape "
    "mm_frame_samples stubs for true video codecs, made real here. "
    "Corrupt containers emit no rows (absence = oracle semantics). "
    "Map-only; oracle restates frames/pixels arithmetically.",
)
def mm_gif_frame_sample(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.gif_frame_sample_stats(
        multimodal.synthesize_gif_animations(d)
    )


# ---- zone-map (min/max) file-skipping statistics -------------------------
_ZM_WIDTH = 1000  # orderkeys per synthetic "file"
_ZM_LO, _ZM_HI = "1995-01-01", "1995-03-31"


@_q(
    "catalog_zonemap_pruning",
    f"""WITH zm AS (
    SELECT o_orderkey // {_ZM_WIDTH} AS file_id,
           count(*) AS n_rows,
           min(o_orderdate) AS min_d, max(o_orderdate) AS max_d,
           count(*) FILTER (WHERE o_orderdate BETWEEN '{_ZM_LO}'
                            AND '{_ZM_HI}') AS actual_matches
    FROM orders GROUP BY 1)
SELECT cast(file_id as bigint) AS file_id, cast(n_rows as bigint) AS n_rows,
       cast(min_d as varchar) AS min_d, cast(max_d as varchar) AS max_d,
       CASE WHEN min_d <= '{_ZM_HI}' AND max_d >= '{_ZM_LO}'
            THEN 1 ELSE 0 END AS candidate,
       cast(actual_matches as bigint) AS actual_matches
FROM zm""",
    "zone-map (min/max) file-skipping statistics as a first-class "
    "query: orders is carved into orderkey-range 'files', each gets "
    "the min/max date zone map a parquet footer would carry, and the "
    "output shows per file whether the zone map ADMITS it for a date "
    "predicate (candidate) versus whether it truly holds matches "
    "(actual) — the exact reasoning behind partition pruning and "
    "row-group skipping, surfaced as data so a layout decision "
    "(write_sorted/zorder/hilbert parquet) can be justified by "
    "measuring candidate-vs-actual waste before rewriting 100 TB. "
    "Safety invariant candidate >= (actual_matches > 0) is pinned in "
    "tests (a zone map may over-admit, never skip a match). One "
    "map-side-combinable aggregate; exact integers/strings.",
)
def catalog_zonemap_pruning(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    zm = o.groupBy(
        F.expr(f"o_orderkey div {_ZM_WIDTH}").alias("file_id")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("o_orderdate").alias("min_d"),
        F.max("o_orderdate").alias("max_d"),
        F.count_if(
            F.col("o_orderdate").between(_ZM_LO, _ZM_HI)
        ).alias("actual_matches"),
    )
    return zm.select(
        "file_id",
        "n_rows",
        F.col("min_d").cast("string").alias("min_d"),
        F.col("max_d").cast("string").alias("max_d"),
        F.expr(
            f"CASE WHEN min_d <= '{_ZM_HI}' AND max_d >= '{_ZM_LO}'"
            " THEN 1 ELSE 0 END"
        ).alias("candidate"),
        "actual_matches",
    )


# ---- sliding-window distinct (7-day active users) ------------------------
_SLD_DAY_US = 86_400_000_000
_SLD_WIN = 7


@_q(
    "stream_sliding_distinct",
    f"""WITH daily AS (
    SELECT DISTINCT epoch_us(ts) // {_SLD_DAY_US} AS day, user_id
    FROM events),
days AS (SELECT DISTINCT day FROM daily),
fanned AS (
    SELECT daily.day + o.off AS day, user_id
    FROM daily, unnest(generate_series(0, {_SLD_WIN - 1})) AS o(off)),
win AS (
    SELECT f.day, count(DISTINCT f.user_id) AS n_active_7d
    FROM fanned f JOIN days d ON d.day = f.day
    GROUP BY f.day),
one AS (
    SELECT day, count(*) AS n_active_1d FROM daily GROUP BY day)
SELECT cast(w.day as bigint) AS day,
       cast(o.n_active_1d as bigint) AS n_active_1d,
       cast(w.n_active_7d as bigint) AS n_active_7d
FROM win w JOIN one o ON o.day = w.day""",
    "sliding-window COUNT DISTINCT — 7-day active users per day, the "
    "metric a naive sliding window cannot compute at scale (distinct "
    "doesn't decompose over overlapping windows, and a corpus-sized "
    "range window is a straggler). The scale shape: collapse events to "
    "the (day, user) grain FIRST (the only corpus-sized aggregate, "
    "map-side combinable), then fan each daily-active row out to the 7 "
    "window ends it supports — a bounded x7 multiply of the tiny "
    "pre-aggregate, never of raw events — and count distinct per "
    "window end. Exact, no approximation, no window functions at all; "
    "restricting to observed days keeps the output calendar-honest.",
)
def stream_sliding_distinct(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        F.expr(f"(ts div 1000) div {_SLD_DAY_US}").alias("day"), "user_id"
    ).distinct()
    days = daily.select("day").distinct()
    fanned = daily.select(
        F.explode(F.expr(f"sequence(day, day + {_SLD_WIN - 1})")).alias("day"),
        "user_id",
    )
    win = (
        fanned.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_active_7d"))
    )
    one = daily.groupBy("day").agg(F.count("*").alias("n_active_1d"))
    return win.join(one, "day").select("day", "n_active_1d", "n_active_7d")


# ---- weighted priority sampling -----------------------------------------
_PRI_K = 20
_PRI_SCALE = 281_474_976_710_656  # 2^48


@_q(
    "sample_weighted_priority",
    f"""WITH wts AS (
    SELECT doc_id, n_chars AS w,
           cast(concat('0x', substr(md5(concat('pri:',
                cast(doc_id as varchar))), 1, 12)) as bigint) + 1 AS h
    FROM documents WHERE n_chars > 0),
keyed AS (
    SELECT doc_id, w,
           cast(w as double) * {_PRI_SCALE} / h AS priority
    FROM wts),
ranked AS (
    SELECT doc_id, w, priority,
           row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
    FROM keyed)
SELECT doc_id, cast(w as bigint) AS w, round(priority, 6) AS priority,
       cast(rn as int) AS rn
FROM ranked WHERE rn <= {_PRI_K}""",
    "weighted sampling via PRIORITY SAMPLING (Duffield/Lund/Thorup "
    "2007): each doc gets priority w/u with u uniform on (0,1] derived "
    "from md5 (u = h/2^48, so priority = w * 2^48 / h — one exact "
    "division on engine-identical integers, unlike the A-Res u^(1/w) "
    "key whose pow() is not cross-engine reproducible), and the sample "
    "is the top-k by priority — inclusion probability proportional to "
    "weight with the unbiased subset-sum estimator the paper proves. "
    "Deterministic given the seed string, so sampling is REPRODUCIBLE "
    "across runs and engines — the property a training-data pipeline "
    "needs to re-materialize the same sample after a failure. Top-k via "
    "rank<=k (WindowGroupLimit/TakeOrdered shape), no global sort "
    "materialized.",
)
def sample_weighted_priority(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        F.col("n_chars").alias("w"),
        F.expr(
            "cast(conv(substr(md5(concat('pri:', cast(doc_id as string))),"
            " 1, 12), 16, 10) as bigint) + 1"
        ).alias("h"),
    ).select(
        "doc_id", "w",
        F.expr(f"cast(w as double) * {_PRI_SCALE} / h").alias("priority"),
    )
    # TakeOrderedAndProject picks the k rows; the global row_number then
    # runs over the ALREADY-LIMITED k-row list (the topk_orders pattern),
    # never the corpus
    top = keyed.orderBy(F.col("priority").desc(), F.col("doc_id")).limit(
        _PRI_K
    )
    w = Window.orderBy(F.col("priority").desc(), F.col("doc_id"))
    return top.select(
        "doc_id",
        F.col("w").cast("bigint").alias("w"),
        F.expr("round(priority, 6)").alias("priority"),
        F.row_number().over(w).cast("int").alias("rn"),
    )


# ---- content-defined chunking (rolling-hash boundaries) ------------------
_CDC_K = 3    # tokens per boundary-test gram
_CDC_MOD = 16  # boundary when gram hash % MOD == 0 (expected chunk ~16)


@_q(
    "text_cdc_chunks",
    f"""WITH toks AS (
    SELECT doc_id, arr[g.i] AS tok, g.i - 1 AS pos
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
                 AS arr FROM documents) d,
         unnest(generate_series(1, len(arr))) AS g(i)),
grams AS (
    SELECT a.doc_id, a.pos, a.tok,
           CASE WHEN a.pos >= {_CDC_K - 1} AND
                cast(concat('0x', substr(md5(concat(
                    lag(a.tok, 2) OVER w, ' ', lag(a.tok, 1) OVER w, ' ',
                    a.tok)), 1, 12)) as bigint) % {_CDC_MOD} = 0
                THEN 1 ELSE 0 END AS boundary
    FROM toks a
    WINDOW w AS (PARTITION BY a.doc_id ORDER BY a.pos)),
chunked AS (
    SELECT doc_id, pos, tok,
           sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS chunk_id
    FROM grams)
SELECT doc_id, cast(chunk_id as int) AS chunk_id,
       cast(min(pos) as int) AS start_pos, cast(max(pos) as int) AS end_pos,
       cast(count(*) as bigint) AS n_tokens,
       substr(md5(string_agg(tok, ' ' ORDER BY pos)), 1, 16) AS content_hash
FROM chunked GROUP BY doc_id, chunk_id""",
    "content-defined chunking (the rolling-hash boundary rule behind "
    "FastCDC / dedup storage / rsync): a chunk boundary falls AFTER any "
    "position whose trailing 3-token gram hashes to 0 mod 16, so "
    "boundaries depend only on LOCAL content — editing a document "
    "reshapes only the chunk containing the edit while every other "
    "chunk keeps its content hash (the edit-locality property "
    "fixed-size chunking lacks, pinned in tests), which is what makes "
    "chunk-level dedup between document versions work. Per-doc windows "
    "only; md5 arithmetic + ordered string_agg keep the oracle exact.",
)
def text_cdc_chunks(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id", "pos", "tok",
        F.expr(
            f"CASE WHEN pos >= {_CDC_K - 1} THEN"
            " cast(conv(substr(md5(concat("
            "lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos), ' ',"
            "lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos), ' ',"
            f"tok)), 1, 12), 16, 10) as bigint) % {_CDC_MOD} ELSE 1 END"
        ).alias("gh"),
    ).select(
        "doc_id", "pos", "tok",
        F.expr("CASE WHEN gh = 0 THEN 1 ELSE 0 END").alias("boundary"),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked = grams.select(
        "doc_id", "pos", "tok",
        F.sum("boundary").over(run).alias("chunk_id"),
    )
    return chunked.groupBy("doc_id", "chunk_id").agg(
        F.min("pos").cast("int").alias("start_pos"),
        F.max("pos").cast("int").alias("end_pos"),
        F.count("*").alias("n_tokens"),
        F.expr(
            "substr(md5(concat_ws(' ', transform("
            "array_sort(collect_list(struct(pos, tok))), s -> s.tok))),"
            " 1, 16)"
        ).alias("content_hash"),
    ).select(
        "doc_id", F.col("chunk_id").cast("int").alias("chunk_id"),
        "start_pos", "end_pos", "n_tokens", "content_hash",
    )


# ---- maximal marginal relevance (diversity re-ranking) -------------------
_MMR_K = 5
_MMR_L = "cast(0.7 as double)"
_MMR_M = "cast(0.3 as double)"


def _mmr_oracle() -> str:
    parts = [
        """x AS MATERIALIZED (
    SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           cast(round(cast(unnest(embedding) as double), 7)
                as decimal(8,7)) AS val
    FROM embeddings),
qv AS (SELECT pos, val AS qval FROM x WHERE vec_id = 0),
qs AS MATERIALIZED (
    SELECT x.vec_id, sum(x.val * qv.qval) AS qs
    FROM x JOIN qv USING (pos) WHERE x.vec_id <> 0 GROUP BY x.vec_id)"""
    ]
    for r in range(1, _MMR_K + 1):
        if r == 1:
            parts.append(f"""sel1 AS MATERIALIZED (
    SELECT vec_id, {_MMR_L} * cast(qs as double) AS score
    FROM qs ORDER BY score DESC, vec_id LIMIT 1)""")
        else:
            excl = " UNION ALL ".join(
                f"SELECT vec_id FROM sel{i}" for i in range(1, r)
            )
            parts.append(f"""sel{r} AS MATERIALIZED (
    SELECT q.vec_id,
           {_MMR_L} * cast(q.qs as double)
             - {_MMR_M} * cast(p.pen as double) AS score
    FROM qs q JOIN pen{r - 1} p USING (vec_id)
    WHERE q.vec_id NOT IN ({excl})
    ORDER BY score DESC, vec_id LIMIT 1)""")
        if r < _MMR_K:
            prev_pen = (
                "n.sim" if r == 1
                else f"greatest(p.pen, n.sim)"
            )
            join_prev = (
                "" if r == 1
                else f"JOIN pen{r - 1} p ON p.vec_id = n.vec_id"
            )
            parts.append(f"""pen{r} AS MATERIALIZED (
    SELECT n.vec_id, {prev_pen} AS pen
    FROM (SELECT x.vec_id, sum(x.val * s.val) AS sim
          FROM x JOIN (SELECT pos, val FROM x WHERE vec_id =
                       (SELECT vec_id FROM sel{r})) s USING (pos)
          WHERE x.vec_id <> 0 GROUP BY x.vec_id) n
    {join_prev})""")
    final = " UNION ALL ".join(
        f"SELECT {r} AS mmr_rank, vec_id, round(score, 6) AS score FROM sel{r}"
        for r in range(1, _MMR_K + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + final


@_q(
    "sim_mmr_rerank",
    _mmr_oracle(),
    "maximal marginal relevance re-ranking (Carbonell/Goldstein 1998) — "
    "the diversity-aware selection every dedup-conscious retrieval "
    "pipeline runs after ANN: greedily pick argmax of 0.7*sim(query,c) "
    "- 0.3*max sim(c, already-selected), 5 unrolled rounds. Each round "
    "is ONE distributed pass: candidates join the newly-selected "
    "vector's broadcast 64 dims, dot products accumulate as exact "
    "DECIMAL (the classifier_auc quantization idiom), and the running "
    "penalty is a decimal greatest() — per-candidate state is one "
    "number, not a pairwise matrix, so the corpus never self-joins. "
    "Selection is a 1-row TakeOrdered per round with the weight DF "
    "lineage-truncated (classifier_train discipline). The fixed round "
    "count unrolls to chained MATERIALIZED CTEs, value-exact.",
)
def sim_mmr_rerank(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("cast(round(cast(v as double), 7) as decimal(8,7))").alias("val"),
    ).persist()
    qv = x.filter(F.col("vec_id") == 0).select(
        "pos", F.col("val").alias("qval")
    )
    qs = (
        x.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv), "pos")
        .groupBy("vec_id")
        .agg(F.expr("sum(val * qval)").alias("qs"))
        .localCheckpoint()
    )
    sel_ids: list[int] = []
    out = None
    pen = None
    for r in range(1, _MMR_K + 1):
        if r == 1:
            scored = qs.select(
                "vec_id", F.expr(f"{_MMR_L} * cast(qs as double)").alias("score")
            )
        else:
            scored = (
                qs.join(pen, "vec_id")
                .filter(~F.col("vec_id").isin(sel_ids))
                .select(
                    "vec_id",
                    F.expr(
                        f"{_MMR_L} * cast(qs as double)"
                        f" - {_MMR_M} * cast(pen as double)"
                    ).alias("score"),
                )
            )
        top = scored.orderBy(F.col("score").desc(), "vec_id").limit(1)
        row = top.select(
            F.lit(r).alias("mmr_rank"), "vec_id",
            F.expr("round(score, 6)").alias("score"),
        )
        out = row if out is None else out.unionByName(row)
        picked = top.collect()[0].vec_id  # 1 row per round: bounded state
        sel_ids.append(picked)
        if r < _MMR_K:
            sdims = x.filter(F.col("vec_id") == picked).select(
                "pos", F.col("val").alias("sval")
            )
            simnew = (
                x.filter(F.col("vec_id") != 0)
                .join(F.broadcast(sdims), "pos")
                .groupBy("vec_id")
                .agg(F.expr("sum(val * sval)").alias("sim"))
            )
            if pen is None:
                pen = simnew.select("vec_id", F.col("sim").alias("pen"))
            else:
                pen = pen.join(simnew, "vec_id").select(
                    "vec_id", F.expr("greatest(pen, sim)").alias("pen")
                )
            pen = pen.localCheckpoint()
    return out


def _keeper_oracle() -> str:
    return dedup.clusters_cte_oracle(dedup.minhash_lsh_pairs_oracle()) + """
, sized AS (
    SELECT c.cluster_id, c.doc_id, d.n_chars,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY d.n_chars DESC, c.doc_id) AS rn
    FROM clusters c JOIN documents d USING (doc_id))
SELECT cluster_id,
       cast(min(CASE WHEN rn = 1 THEN doc_id END) as bigint)
           AS keeper_doc_id,
       cast(min(CASE WHEN rn = 1 THEN n_chars END) as bigint)
           AS keeper_chars,
       cast(count(*) as bigint) AS n_members,
       cast(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) as bigint)
           AS dropped_chars
FROM sized GROUP BY cluster_id"""


@_q(
    "pipeline_dedup_keeper",
    _keeper_oracle(),
    "dedup SURVIVORSHIP — the step after canonicalization that pair "
    "lists and cluster maps still leave open: which member of each "
    "near-dup cluster ships to training? Policy here: keep the longest "
    "document (content-richest), ties to the smallest doc_id; emits "
    "per cluster the keeper, member count, and how many characters "
    "dedup drops — the token-savings accounting a 100 TB dedup run is "
    "judged by. Composes the existing banded-LSH pair generation and "
    "min-label-propagation clustering; the keeper rank window "
    "partitions by cluster_id (near-dup clusters are a handful of "
    "docs, never corpus-sized). Exact oracle via the recursive-CTE "
    "cluster twin.",
)
def pipeline_dedup_keeper(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    clusters = dedup.dedup_clusters(
        docs, dedup.minhash_lsh_pairs(docs), check_every=2
    )
    sized = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = sized.select(
        "cluster_id", "doc_id", "n_chars", F.row_number().over(w).alias("rn")
    )
    return ranked.groupBy("cluster_id").agg(
        F.expr("cast(min(CASE WHEN rn = 1 THEN doc_id END) as bigint)")
        .alias("keeper_doc_id"),
        F.expr("cast(min(CASE WHEN rn = 1 THEN n_chars END) as bigint)")
        .alias("keeper_chars"),
        F.count("*").alias("n_members"),
        F.expr("cast(sum(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) as bigint)")
        .alias("dropped_chars"),
    )


@_q(
    "src_tbl_scan",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
       WHERE n_nationkey % 2 = 0""",
    "TPC-H dbgen .tbl round-trip as a checked query: nation is written "
    "in dbgen's wire format (pipe-separated, no header, trailing '|' "
    "per line — the format the reference's utils/tbl_to_csv.py:6 "
    "consumed) and scanned back through sources/legacy.read_tbl with "
    "the dd-enforced schema; oracle = the same filter on the parquet "
    "source, so a hash match proves the .tbl encode/decode lossless — "
    "completing the source-format trio (CSV S1, JSONL S2, Avro) with "
    "the reference's own input format.",
)
def src_tbl_scan(spark, sf_dir):
    import os

    from .sources import legacy

    out = _legacy_fixture_dir(sf_dir, "nation_tbl")
    os.makedirs(out, exist_ok=True)
    n = _t(spark, sf_dir, "nation")
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    rows = n.select(*cols).collect()  # nation: 25 rows, driver-side write ok
    with open(os.path.join(out, "NATION.tbl"), "w") as f:
        for r in sorted(rows, key=lambda r: r.n_nationkey):
            f.write("|".join(str(r[c]) for c in cols) + "|\n")
    dd = {"n_nationkey": "int", "n_name": "string",
          "n_regionkey": "int"}
    back = legacy.read_tbl(spark, os.path.join(out, "NATION.tbl"),
                           "NATION", dd)
    return back.filter(F.col("n_nationkey") % 2 == 0).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@_q(
    "src_fixed_width_scan",
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
       WHERE s_nationkey <= 12""",
    "fixed-width (mainframe/COBOL copybook) scan as a checked query: "
    "supplier is written in a 4-field fixed-width layout (numerics "
    "right-aligned, strings left-aligned, overflow raises — silent "
    "truncation is how fixed-width files corrupt) and scanned back via "
    "sources/legacy.read_fixed_width: one spark.read.text scan plus "
    "substring/trim/cast per column, ALL whole-stage-codegen JVM "
    "expressions — no Python in the row path, distributing like any "
    "text source. Oracle = the same filter on the parquet source, so a "
    "hash match proves the layout round-trip lossless — doubles travel "
    "as shortest-repr text, which parses back to the identical IEEE "
    "value. Extends the source-format surface (CSV S1, JSONL S2, .tbl, "
    "Avro) with the one enterprise format none of them cover.",
)
def src_fixed_width_scan(spark, sf_dir):
    import os

    from .sources import legacy

    out = _legacy_fixture_dir(sf_dir, "supplier_fw")
    os.makedirs(out, exist_ok=True)
    layout = [
        ("s_suppkey", 1, 10, "int"),
        ("s_name", 11, 25, "string"),
        ("s_nationkey", 36, 4, "int"),
        # double: shortest-repr text round-trips the exact IEEE value
        ("s_acctbal", 40, 22, "double"),
    ]
    s = _t(spark, sf_dir, "supplier")
    rows = [
        (r.s_suppkey, r.s_name, r.s_nationkey, r.s_acctbal)
        for r in s.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
        .collect()  # supplier: 100/sf0.01 rows — fixture write only
    ]
    path = os.path.join(out, "SUPPLIER.fw")
    legacy.write_fixed_width(rows, layout, path)
    back = legacy.read_fixed_width(spark, path, "SUPPLIER", layout)
    return back.filter(F.col("s_nationkey") <= 12).select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )


@_q(
    "mm_jpeg_420_stats",
    """WITH d AS (
    SELECT doc_id, ((doc_id*7)%3+1)*16 AS w, ((doc_id*13)%2+1)*16 AS h
    FROM documents),
blk AS (
    SELECT doc_id, w, h,
           ((doc_id*3 + (ty.byy*(w//8) + tx.bxx)*5) % 225) - 112 + 128 AS y,
           ((doc_id*7 + ((ty.byy//2)*(w//16) + tx.bxx//2)*11) % 225) - 112
               AS cb,
           ((doc_id*5 + ((ty.byy//2)*(w//16) + tx.bxx//2)*17) % 225) - 112
               AS cr
    FROM d, unnest(generate_series(0, w//8 - 1)) AS tx(bxx),
         unnest(generate_series(0, h//8 - 1)) AS ty(byy)),
rgb AS (
    SELECT doc_id, w, h,
           LEAST(255, GREATEST(0,
               y + cast(floor((91881*cr + 32768)/65536.0) as bigint))) AS r,
           LEAST(255, GREATEST(0,
               y - cast(floor((22554*cb + 46802*cr + 32768)/65536.0)
                        as bigint))) AS g,
           LEAST(255, GREATEST(0,
               y + cast(floor((116130*cb + 32768)/65536.0) as bigint))) AS b
    FROM blk),
s AS (
    SELECT doc_id, w, h,
           sum(r) AS sr, sum(g) AS sg, sum(b) AS sb, count(*) AS nb
    FROM rgb GROUP BY doc_id, w, h)
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       round((64*sr) / cast(w*h as double), 6) AS mean_r,
       round((64*sg) / cast(w*h as double), 6) AS mean_g,
       round((64*sb) / cast(w*h as double), 6) AS mean_b
FROM s""",
    "REAL 4:2:0 SUBSAMPLED color JPEG decode — the sampling grid "
    "virtually every camera and web JPEG uses: luma 2x2, chroma 1x1, "
    "so each 16x16 MCU interleaves four Y blocks then Cb then Cr "
    "(T.81 A.2.3), and the decoder walks the generalized MCU order, "
    "reconstructs the quarter-resolution chroma planes, upsamples by "
    "nearest-neighbor replication (exactly flat for flat blocks — what "
    "keeps the oracle integer-exact), and converts through the same "
    "fixed-point YCbCr->RGB as mm_jpeg_color_stats. The oracle "
    "restates per-luma-block RGB with the chroma block indexed at MCU "
    "granularity. Progressive 4:2:0 decodes too "
    "(mm_jpeg_progressive_420_stats). Map-only, NULL on corruption.",
)
def mm_jpeg_420_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.jpeg_color_stats(multimodal.synthesize_jpeg_420_pixels(d))


@_q(
    "mm_jpeg_progressive_420_stats",
    """WITH d AS (
    SELECT doc_id, ((doc_id*7)%3+1)*16 AS w, ((doc_id*13)%2+1)*16 AS h
    FROM documents),
blk AS (
    SELECT doc_id, w, h,
           ((doc_id*3 + (ty.byy*(w//8) + tx.bxx)*5) % 225) - 112 + 128 AS y,
           ((doc_id*7 + ((ty.byy//2)*(w//16) + tx.bxx//2)*11) % 225) - 112
               AS cb,
           ((doc_id*5 + ((ty.byy//2)*(w//16) + tx.bxx//2)*17) % 225) - 112
               AS cr
    FROM d, unnest(generate_series(0, w//8 - 1)) AS tx(bxx),
         unnest(generate_series(0, h//8 - 1)) AS ty(byy)),
rgb AS (
    SELECT doc_id, w, h,
           LEAST(255, GREATEST(0,
               y + cast(floor((91881*cr + 32768)/65536.0) as bigint))) AS r,
           LEAST(255, GREATEST(0,
               y - cast(floor((22554*cb + 46802*cr + 32768)/65536.0)
                        as bigint))) AS g,
           LEAST(255, GREATEST(0,
               y + cast(floor((116130*cb + 32768)/65536.0) as bigint))) AS b
    FROM blk),
s AS (
    SELECT doc_id, w, h,
           sum(r) AS sr, sum(g) AS sg, sum(b) AS sb, count(*) AS nb
    FROM rgb GROUP BY doc_id, w, h)
SELECT doc_id, cast(w as int) AS width, cast(h as int) AS height,
       round((64*sr) / cast(w*h as double), 6) AS mean_r,
       round((64*sg) / cast(w*h as double), 6) AS mean_g,
       round((64*sb) / cast(w*h as double), 6) AS mean_b
FROM s""",
    "SUBSAMPLED PROGRESSIVE JPEG decode — the last named combination "
    "in the JPEG surface (progressive SOF2 × 4:2:0 sampling): the "
    "interleaved DC first/refinement scans walk 16x16 MCUs (four "
    "raster-ordered Y blocks + Cb + Cr each, per-component predictors "
    "and per-component coefficient grids at different resolutions), "
    "the AC scans are single-component over each component's OWN block "
    "raster (T.81 G.1.1.1.1), Y carries an Ah=1 successive-"
    "approximation AC refinement scan with a clip-guarded zero-pixel-"
    "sum planted coefficient, and reconstruction runs one dequantize+"
    "IDCT per block, nearest-neighbor chroma upsample, and the "
    "fixed-point YCbCr->RGB. Oracle = the baseline 4:2:0 arithmetic "
    "(the planted AC sums to zero); tests assert progressive-420 == "
    "baseline-420 RGB sums. Map-only, NULL on corruption.",
)
def mm_jpeg_progressive_420_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.jpeg_progressive_420_stats(
        multimodal.synthesize_jpeg_progressive_420_pixels(d)
    )


@_q(
    "mm_jpeg_progressive_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%6+2 AS bw, (doc_id*13)%4+2 AS bh
    FROM documents),
blk AS (
    SELECT doc_id, bw, bh,
           ((doc_id*3 + tk.k*5) % 225) - 112 AS lev
    FROM d, unnest(generate_series(0, bw*bh - 1)) AS tk(k)),
s AS (
    SELECT doc_id, bw, bh, sum(lev) AS slev, count(*) AS nb
    FROM blk GROUP BY doc_id, bw, bh)
SELECT doc_id, cast(bw*8 as int) AS width, cast(bh*8 as int) AS height,
       round((64*(slev + 128*nb)) / cast(bw*8*bh*8 as double), 6)
           AS mean_gray
FROM s""",
    "REAL PROGRESSIVE (SOF2) JPEG decode with the FULL successive-"
    "approximation surface: each doc gets a genuine four-scan "
    "progressive stream (DC first pass at Al=1 with diff-coded "
    "arithmetic-shifted coefficients, a DC refinement scan of raw "
    "bits ORed in at Al, an AC spectral-selection first scan at Al=1, "
    "and an AC REFINEMENT scan — T.81 §G.1.2.3 correction bits, "
    "zero-history run lengths, ZRL spans, EOB runs that still carry "
    "correction bits), and the decoder accumulates coefficients across "
    "scans before one dequantize+IDCT per block. Blocks carry the "
    "baseline DC levels plus a planted AC coefficient whose rounded "
    "64-pixel pattern sums to exactly zero (basis (5,0), |delta| <= 8, "
    "no half-integer ties), so the arithmetic oracle is unchanged "
    "while tests assert per-pixel equality including the AC pattern. "
    "Map-only.",
)
def mm_jpeg_progressive_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.jpeg_progressive_stats(
        multimodal.synthesize_jpeg_progressive_pixels(d)
    )


@_q(
    "mm_jpeg_progressive_color_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id*7)%6+2 AS bw, (doc_id*13)%4+2 AS bh
    FROM documents),
blk AS (
    SELECT doc_id, bw, bh,
           ((doc_id*3 + tk.k*5) % 225) - 112 + 128 AS y,
           ((doc_id*7 + tk.k*11) % 225) - 112 AS cb,
           ((doc_id*5 + tk.k*17) % 225) - 112 AS cr
    FROM d, unnest(generate_series(0, bw*bh - 1)) AS tk(k)),
rgb AS (
    SELECT doc_id, bw, bh,
           LEAST(255, GREATEST(0,
               y + cast(floor((91881*cr + 32768)/65536.0) as bigint))) AS r,
           LEAST(255, GREATEST(0,
               y - cast(floor((22554*cb + 46802*cr + 32768)/65536.0)
                        as bigint))) AS g,
           LEAST(255, GREATEST(0,
               y + cast(floor((116130*cb + 32768)/65536.0) as bigint))) AS b
    FROM blk),
s AS (
    SELECT doc_id, bw, bh,
           sum(r) AS sr, sum(g) AS sg, sum(b) AS sb, count(*) AS nb
    FROM rgb GROUP BY doc_id, bw, bh)
SELECT doc_id, cast(bw*8 as int) AS width, cast(bh*8 as int) AS height,
       round((64*sr) / cast(bw*8*bh*8 as double), 6) AS mean_r,
       round((64*sg) / cast(bw*8*bh*8 as double), 6) AS mean_g,
       round((64*sb) / cast(bw*8*bh*8 as double), 6) AS mean_b
FROM s""",
    "REAL progressive COLOR JPEG decode (SOF2, 4:4:4): the full "
    "progressive scan script — interleaved DC first pass at Al=1 over "
    "all three components, interleaved DC refinement bits, then three "
    "single-component AC spectral-selection scans — with coefficients "
    "accumulated per component across scans, one dequantize+IDCT per "
    "block, and the fixed-point YCbCr->RGB conversion. The decoder "
    "asserts progressive==baseline-color pixel equality in tests, and "
    "the oracle is the identical integer arithmetic as "
    "mm_jpeg_color_stats (same planted levels — only the container "
    "encoding differs). Remaining progressive sliver: AC refinement "
    "scans and subsampled progressive, rejected cleanly. Map-only.",
)
def mm_jpeg_progressive_color_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.jpeg_progressive_color_stats(
        multimodal.synthesize_jpeg_progressive_color_pixels(d)
    )


@_q(
    "agg_exact_moments",
    """WITH v AS (
    SELECT event_type, cast(round(value, 6) as decimal(18,6)) AS x
    FROM events),
m AS (
    SELECT event_type, count(*) AS n,
           sum(x) AS s1, sum(x*x) AS s2,
           sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
    FROM v GROUP BY event_type),
d AS (
    SELECT event_type, n,
           cast(s1 as double) / n AS m1,
           cast(s2 as double) / n AS r2,
           cast(s3 as double) / n AS r3,
           cast(s4 as double) / n AS r4
    FROM m)
SELECT event_type, cast(n as bigint) AS n,
       round(m1, 6) AS mean,
       round(r2 - m1 * m1, 6) AS variance,
       round((r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1)
             / pow(r2 - m1 * m1, 1.5), 6) AS skewness,
       round((r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1)
             / ((r2 - m1 * m1) * (r2 - m1 * m1)) - 3, 6) AS excess_kurtosis
FROM d WHERE r2 - m1 * m1 > 0""",
    "exact higher moments per event stream — mean, variance, skewness, "
    "excess kurtosis — the distribution-shape profile drift monitors "
    "and quality gates read (heavy right tail? platykurtic noise?). "
    "ONE map-side-combinable aggregate: raw power sums s1..s4 ride "
    "exact DECIMAL (order-independent under partial aggregation — the "
    "two-pass 'subtract the mean first' formulation would need a "
    "second scan), then central moments come from the raw-moment "
    "identities in deterministic double arithmetic. pow(x, 1.5) = "
    "x*sqrt(x) is correctly-rounded IEEE both engines... verified by "
    "the hash match itself. Spark's builtin skewness()/kurtosis() use "
    "float running updates that are partition-order dependent — this "
    "formulation is the reproducible twin.",
)
def agg_exact_moments(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr("cast(round(value, 6) as decimal(18,6))").alias("x"),
    )
    m = v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr("sum(x)").alias("s1"),
        F.expr("sum(x*x)").alias("s2"),
        F.expr("sum(x*x*x)").alias("s3"),
        F.expr("sum(x*x*x*x)").alias("s4"),
    )
    d = m.select(
        "event_type", "n",
        F.expr("cast(s1 as double) / n").alias("m1"),
        F.expr("cast(s2 as double) / n").alias("r2"),
        F.expr("cast(s3 as double) / n").alias("r3"),
        F.expr("cast(s4 as double) / n").alias("r4"),
    )
    return d.filter(F.expr("r2 - m1 * m1 > 0")).select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.expr("round(m1, 6)").alias("mean"),
        F.expr("round(r2 - m1 * m1, 6)").alias("variance"),
        F.expr(
            "round((r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1)"
            " / pow(r2 - m1 * m1, 1.5), 6)"
        ).alias("skewness"),
        F.expr(
            "round((r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2"
            " - 3 * m1 * m1 * m1 * m1)"
            " / ((r2 - m1 * m1) * (r2 - m1 * m1)) - 3, 6)"
        ).alias("excess_kurtosis"),
    )


@_q(
    "join_asof_nearest",
    """WITH r1 AS (
    SELECT o_custkey, epoch_us(o_orderdate) AS t, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders),
r2 AS (SELECT o_custkey, t, o_orderkey FROM r1 WHERE rn = 1),
l AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events),
b AS (
    SELECT l.event_id, l.user_id, l.t, r.t AS bt, r.o_orderkey AS bk
    FROM l ASOF LEFT JOIN r2 r
      ON l.user_id = r.o_custkey AND l.t >= r.t),
f AS (
    SELECT l.event_id, r.t AS ft, r.o_orderkey AS fk
    FROM l ASOF LEFT JOIN r2 r
      ON l.user_id = r.o_custkey AND l.t <= r.t)
SELECT b.event_id, b.user_id,
       CASE WHEN b.bk IS NULL AND f.fk IS NULL THEN NULL
            WHEN f.fk IS NULL THEN b.bk
            WHEN b.bk IS NULL THEN f.fk
            WHEN b.t - b.bt <= f.ft - b.t THEN b.bk ELSE f.fk END
           AS nearest_orderkey,
       CASE WHEN b.bk IS NULL AND f.fk IS NULL THEN 'none'
            WHEN f.fk IS NULL THEN 'past'
            WHEN b.bk IS NULL THEN 'future'
            WHEN b.t - b.bt <= f.ft - b.t THEN 'past' ELSE 'future' END
           AS direction,
       CASE WHEN b.bk IS NULL AND f.fk IS NULL THEN NULL
            WHEN f.fk IS NULL THEN b.t - b.bt
            WHEN b.bk IS NULL THEN f.ft - b.t
            WHEN b.t - b.bt <= f.ft - b.t THEN b.t - b.bt
            ELSE f.ft - b.t END AS gap_us
FROM b JOIN f ON f.event_id = b.event_id""",
    "NEAREST-direction as-of join: each event picks the user's closest "
    "order in TIME, whichever side of the event it falls on (ties "
    "prefer the past — the causal default) — the alignment mode "
    "sensor-fusion and event-to-record matching need when 'latest "
    "before' is too strict. Composed as one backward + one forward "
    "as-of pass (operators/asof.py runs the forward direction as the "
    "same single window pass with the frame mirrored — no range "
    "explosion), joined on event_id to pick the nearer side with pure "
    "integer gap arithmetic. Oracle = two native DuckDB ASOF joins "
    "with the identical CASE; right side pre-deduped per (key, ts) "
    "both sides.",
)
def join_asof_nearest(spark, sf_dir):
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr("ts DIV 1000").alias("t_us")
    )
    w = Window.partitionBy("o_custkey", "o_t_us").orderBy(
        F.col("o_orderkey").desc()
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.expr("unix_micros(cast(o_orderdate as timestamp))").alias(
                "o_t_us"
            ),
            "o_orderkey",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    back = asof_join(
        ev, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="t_us", right_ts="o_t_us",
        value_cols=["o_orderkey", "o_t_us"], tiebreak="o_orderkey",
    ).select(
        "event_id", "user_id", "t_us",
        F.col("o_orderkey").alias("bk"), F.col("o_t_us").alias("bt"),
    )
    fwd = asof_join(
        ev, orders,
        left_key="user_id", right_key="o_custkey",
        left_ts="t_us", right_ts="o_t_us",
        value_cols=["o_orderkey", "o_t_us"], tiebreak="o_orderkey",
        direction="forward",
    ).select(
        "event_id",
        F.col("o_orderkey").alias("fk"), F.col("o_t_us").alias("ft"),
    )
    j = back.join(fwd, "event_id")
    past_wins = F.expr(
        "bk IS NOT NULL AND (fk IS NULL OR t_us - bt <= ft - t_us)"
    )
    return j.select(
        "event_id",
        "user_id",
        F.when(F.expr("bk IS NULL AND fk IS NULL"), F.lit(None))
         .when(past_wins, F.col("bk")).otherwise(F.col("fk"))
         .alias("nearest_orderkey"),
        F.when(F.expr("bk IS NULL AND fk IS NULL"), F.lit("none"))
         .when(past_wins, F.lit("past")).otherwise(F.lit("future"))
         .alias("direction"),
        F.when(F.expr("bk IS NULL AND fk IS NULL"),
               F.lit(None).cast("bigint"))
         .when(past_wins, F.expr("t_us - bt"))
         .otherwise(F.expr("ft - t_us")).alias("gap_us"),
    )


@_q(
    "mm_wav_stereo_stats",
    """WITH d AS (
    SELECT doc_id, (doc_id % 200) + 50 AS n FROM documents),
s AS (
    SELECT doc_id, n,
           ((doc_id*11 + ti.i*3) % 4096) - 2048 AS l,
           ((doc_id*17 + ti.i*5) % 4096) - 2048 AS r
    FROM d, unnest(generate_series(0, n-1)) AS ti(i)),
agg AS (
    SELECT doc_id, n, sum(l) AS sl, sum(r) AS sr,
           greatest(max(abs(l)), max(abs(r))) AS peak
    FROM s GROUP BY doc_id, n)
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
            WHEN 3 THEN 44100 ELSE 48000 END AS sample_rate,
       cast(n as bigint) AS n_samples,
       round(sl / cast(n as double), 6) AS mean_left,
       round(sr / cast(n as double), 6) AS mean_right,
       cast(peak as int) AS peak
FROM agg""",
    "REAL stereo PCM WAV decode: interleaved L/R int16 frames (RIFF "
    "block align 4) de-interleaved to per-channel statistics — the "
    "uncompressed twin of mm_flac_stereo_stats, sharing the same "
    "channel sample formulas so WAV and decorrelated-FLAC encodings of "
    "the same signal provably decode to identical stats (the "
    "cross-container consistency a speech pipeline relies on when "
    "sources mix formats). Map-only, exact integer oracle, NULL on "
    "corruption; mono/stereo modality mixups reject on both paths.",
)
def mm_wav_stereo_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return multimodal.wav_stereo_stats(
        multimodal.synthesize_wav_stereo_samples(d)
    )


# =========================================================================
# public API
# =========================================================================

# The correctness driver walks queries() in order under a time budget —
# only the first ~50 registry entries earn a driver row per round, so
# registry order IS the checked surface. Every registered query is now
# driver-green somewhere in r1-r8 (VERDICT r8), so from round 9 the
# policy is CERTIFICATION FRESHNESS: the 15 ref_* parity rows stay
# pinned first (they must stay driver-green every round), then the two
# permanent regression sentinels (the restated ex-red rows of r6/r7),
# then every certifiable oracled query ordered by the round of its
# latest driver-green row, oldest first (cheap-first within a tier).
# Justified rows-only queries pin to the very tail. This list is
# GENERATED — regenerate each round with:
#     python tools/rotate_gate.py --emit
#
# r14: the r12/r13 one-round amendments (--no-ref-pin / --pure-refresh)
# are DELETED from the tool — tools/rotate_gate.py now asserts, with no
# flag to relax it, that every emitted window holds >=3 ref_* parity
# canaries, both sentinels, and every never-driver-green certifiable
# query (tests/test_registry.py re-checks the committed list each run).
# This r14 window re-pins all 15 refs (no driver cert since r11), both
# sentinels, the six never-green rows (the five r13 warc rows + the
# r14-new src_warc_request_log, which the invariant routes into the
# window on its FIRST post-registration round), the full 14-query
# r5-stale tail, and 13 r6 rows — leaving a 20-row all-r6 stale tail.
_GATE_PRIORITY = [
    "ref_filter_range_in_like",
    "ref_cross_product",
    "ref_project_distinct",
    "ref_rename_selfjoin",
    "ref_theta_join_pure",
    "ref_filter_conjunction",
    "ref_filter_or_not",
    "ref_theta_join",
    "ref_q1_point_select",
    "ref_q2_cnr_join",
    "ref_csv_scan",
    "ref_q4_join_order_reversed",
    "ref_q3_col_join_filters",
    "ref_jsonl_scan",
    "ref_multikey_join",
    "stream_late_data_accounting",
    "tpch_q12_late_priority",
    "src_warc_cdx_segment_fetch",
    "src_warc_segment_reassembly",
    "src_warc_charset_mislabel",
    "src_warc_charset_east_asian",
    "src_warc_revisit_dedup",
    "src_warc_request_log",
    "stream_retention_cohorts",
    "tpch_q17_small_qty_revenue",
    "stream_session_native",
    "tpch_q11_important_stock",
    "tpch_q22_global_sales_opportunity",
    "mm_video_decode",
    "pipeline_scd2",
    "mm_decode",
    "mm_audio_decode",
    "mm_wav_stereo_stats",
    "mm_modality_router",
    "mm_audio_filter",
    "mm_decode_filter",
    "join_asof_nearest",
    "src_fixed_width_scan",
    "src_warc_scan",
    "pipeline_group_advantage",
    "agg_heavy_hitters",
    "stream_attribution",
    "stream_interval_join",
    "tpch_q19_disjunctive_revenue",
    "emb_label_centroids",
    "text_feature_hashing",
    "window_rolling_slope",
    "agg_ols_fit",
    "catalog_key_skew_profile",
    "pipeline_incremental_rollup",
    "pipeline_preference_pairs",
    "text_postings_delta",
    "pipeline_next_event_dataset",
    "stream_interval_coalesce",
    "stream_gapfill_locf",
    "stream_daily_ohlc",
    "window_running_distinct",
    "mm_tiff_metadata",
    "mm_mp3_metadata",
    "mm_wav_24bit_stats",
    "mm_jpeg_progressive_420_stats",
    "pipeline_span_corruption",
    "mm_gif_interlaced_stats",
    "mm_video_pixel_stats",
    "mm_png_interlaced_stats",
    "sim_int8_topk",
    "mm_format_sniffer",
    "join_fuzzy_qgram",
    "sql_recursive_cte",
    "stream_token_bucket",
    "join_asof_forward",
    "join_spatial_grid",
    "emb_standardize",
    "pipeline_temperature_mixture",
    "pipeline_semantic_decontaminate",
    "mm_pixel_stats",
    "mm_jpeg_progressive_stats",
    "mm_jpeg_420_stats",
    "mm_flac_stereo_stats",
    "mm_image_ahash",
    "mm_jpeg_color_stats",
    "scalar_hilbert_key",
    "mm_gif_pixel_stats",
    "emb_knn_label_transfer",
    "text_lm_score",
    "join_nearest_event",
    "agg_robust_outliers",
    "graph_triangle_count",
    "dedup_embedding_clusters",
    "dedup_containment",
    "sim_hamming_topk",
    "emb_random_projection",
    "src_avro_scan",
    "tpch_q7_volume_shipping",
    "join_interval_overlap",
    "tpch_q18_large_volume",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "stream_sliding_distinct",
    "tpch_q16_supplier_part_counts",
    "mm_png_metadata",
    "text_cdc_chunks",
    "mm_jpeg_progressive_color_stats",
    "mm_image_resize",
    "tpch_q21_suppliers_kept_waiting",
    "mm_gif_frame_sample",
    "sim_ivf_int8_topk",
    "text_bm25_topk",
    "join_bloom_semijoin",
    "pipeline_classifier_train",
    "sim_lsh_multiprobe_topk",
    "pipeline_dedup_rate_by_source",
    "sim_mmr_rerank",
    "pipeline_dedup_keeper",
    "graph_pagerank",
    "pipeline_cluster_safe_split",
    "pipeline_source_authority",
    "topk_orders",
    "setop_union_all",
    "scalar_higher_order",
    "scalar_map_ops",
    "scalar_date",
    "scalar_math",
    "join_semi",
    "join_anti",
    "agg_having",
    "join_full_outer",
    "scalar_conditional",
    "window_rank_dense",
    "window_ntile",
    "setop_except",
    "agg_rollup_gid",
    "scalar_json",
    "join_left_outer",
    "agg_percentiles",
    "agg_conditional_pivot",
    "setop_intersect",
    "agg_rollup",
    "agg_count_distinct",
    "topk_per_group",
    "agg_cube",
    "tpch_q3_shipping_priority",
    "window_moving_avg",
    "agg_pricing_summary",
    "agg_exact_corr",
    "window_running_sum",
    "window_lag_lead",
    "tpch_q10_returned_items",
    "mm_png16_stats",
    "mm_jpeg_cmyk_stats",
    "pipeline_dataset_mixture",
    "scalar_string",
    "text_scrub",
    "text_token_stats",
    "dedup_exact_hash",
    "emb_quantize_int8",
    "text_quality",
    "pipeline_global_shuffle",
    "mm_frame_samples",
    "pipeline_train_val_split",
    "text_pii_stats",
    "stream_tumbling_counts",
    "text_fingerprint",
    "mm_binary_features",
    "agg_udaf_median",
    "text_idf",
    "text_lang_id",
    "sql_scalar_subquery",
    "text_unigram_segment",
    "text_char_entropy",
    "text_bpe_encode",
    "sim_cosine_topk",
    "mm_mp4_tracks",
    "mm_ogg_metadata",
    "tpch_q5_local_supplier_volume",
    "mm_png16i_stats",
    "mm_tiff_lzw_stats",
    "sim_ivf_topk",
    "sim_pq_topk",
    "sim_ivfpq_topk",
    "agg_approx_cd_bounded",
    "stream_zscore_anomalies",
    "text_chunking",
    "src_warc_cdx_fetch",
    "text_html_links",
    "text_html_extract",
    "agg_hll_partial_merge",
    "agg_approx_quantile_bounded",
    "stream_session_windows",
    "emb_pca_project",
    "src_warc_gz_scan",
    "stream_funnel_conversion",
    "mm_vorbis_comments",
    "mm_flac_seektable",
    "mm_mp3_xing",
    "join_asof_tolerance",
    "text_pack_sequences",
    "dedup_embedding_lsh",
    "mm_tiff_variants_stats",
    "stream_user_profile",
    "join_asof",
    "dedup_incremental_stateless",
    "sim_lsh_ann_topk",
    "sim_hybrid_rrf",
    "sim_ann_topk",
    "text_repetition",
    "dedup_simhash_fp",
    "dedup_winnowing",
    "dedup_ngram_jaccard",
    "dedup_incremental",
    "dedup_minhash_lsh",
    "dedup_simhash_lsh",
    "scalar_fuzzy_match",
    "scalar_regex",
    "sample_systematic",
    "scalar_array_ops",
    "src_warc_wat_sidecar",
    "scalar_date_arithmetic",
    "text_readability",
    "scalar_url_functions",
    "agg_string_agg",
    "window_distribution",
    "text_domain_score",
    "pipeline_length_histogram",
    "setop_union_distinct",
    "dedup_normalized",
    "agg_two_level",
    "dedup_exact",
    "scalar_null_semantics",
    "pipeline_source_quota",
    "setop_intersect_all",
    "catalog_profile_documents",
    "join_right_outer",
    "setop_except_all",
    "sql_exists_subquery",
    "text_robots_filter",
    "agg_native_pivot",
    "sql_grouping_sets",
    "text_word_freq",
    "agg_unpivot",
    "sql_in_subquery",
    "window_analytic_values",
    "join_argmax",
    "catalog_profile_orders",
    "window_range_running",
    "sql_cte",
    "sql_correlated_subquery",
    "src_warc_charset_decode",
    "text_quality_filter",
    "src_warc_digest_verify",
    "dedup_repeated_ngrams",
    "join_range_bands",
    "pipeline_crawl_admission",
    "window_distribution_scale",
    "pipeline_decontaminate",
    "window_ntile_scale",
    "dedup_embedding_cosine",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "pipeline_training_data",
    "sample_weighted_priority",
    "mm_payload_dedup",
    "agg_twophase_distinct",
    "catalog_zonemap_pruning",
    "src_tbl_scan",
    "agg_exact_moments",
    "tpch_q13_customer_distribution",
    "stream_hourly_active_users",
    "tpch_q14_promo_effect",
    "window_time_range_trailing",
    "stream_sliding_counts",
    "pipeline_contrastive_pairs",
    "join_salted_skew",
    "catalog_table_diff",
    "sql_lateral_topn",
    "tpch_q9_product_type_profit",
    "tpch_q15_top_supplier",
    "agg_mode_and_argmax",
    "tpch_q20_part_promotion",
    "mm_jpeg_pixel_stats",
    "mm_flac_sample_stats",
    "text_keywords",
    "stream_window_topk",
    "emb_centroid_drift",
    "agg_bitmap_distinct",
    "agg_histogram_quantiles",
    "agg_countmin_topk",
    "stream_countmin_users",
    "scalar_zorder_key",
    "emb_norm_histogram",
    "catalog_distribution_drift",
    "tpch_q6_forecast_revenue",
    "catalog_feed_freshness",
    "pipeline_token_budget_mixture",
    "text_dup_ngrams",
    "catalog_table_checksum",
    "pipeline_classifier_calibration",
    "pipeline_classifier_auc",
    "sample_stratified",
    "pipeline_domain_cap",
    "catalog_constraint_check",
    "pipeline_cdc_upsert",
    "dedup_substring_span",
    "tpch_q4_order_priority",
    "join_null_safe",
    "emb_matryoshka_truncate",
    "mm_audio_sample_stats",
    "stream_first_event_dedup",
    "text_tokenizer_fertility",
    "scalar_try_arithmetic",
]
# first-occurrence-wins: a duplicated name must rank at its FIRST (most
# prioritized) position — round 8's backfill was silently inert because
# a dict comprehension kept the LAST index (ADVICE r8).  Duplicates are
# additionally rejected outright by tests/test_registry.py.
_GATE_RANK: dict[str, int] = {}
for _i, _n in enumerate(_GATE_PRIORITY):
    _GATE_RANK.setdefault(_n, _i)


def registry() -> list[Q]:
    # stable sort: prioritized entries in _GATE_PRIORITY order, the rest
    # keep their declaration order after them
    return sorted(_REGISTRY, key=lambda q: _GATE_RANK.get(q.name, len(_GATE_RANK)))


def queries() -> dict[str, SparkQuery]:
    return {q.name: q.spark for q in registry()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in registry() if q.oracle is not None}


def probe_registry() -> list[Q]:
    """Diagnostic probes — local-gate surface only, never driver-facing."""
    return list(_PROBE_REGISTRY)


def probes() -> dict[str, SparkQuery]:
    return {q.name: q.spark for q in probe_registry()}


def probe_oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in probe_registry() if q.oracle is not None}
