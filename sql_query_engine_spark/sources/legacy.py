"""Readers/writers for the reference engine's two wire formats.

The reference ingests exactly two formats (SURVEY.md §2.2 S1/S2):

* **Qualified-header CSV** — first line is a header of dot-qualified
  names (``Person.name,Person.age,...``), produced by its
  ``utils/tbl_to_csv.py:18`` converter and consumed by the Spark backend's
  hand-rolled line splitter (ra2spark/ra2spark.py:54-66, which also has to
  drop the header line *inside every partition*).
* **Tagged JSON-lines** — ``<RelationTag>\\t{json}`` with dot-qualified
  keys (ra2mr/ra2mr.py:144-146, converter utils/tbl_to_json.py:8-14).

Here both are thin, schema-enforced Spark readers: the dd (data
dictionary — the reference's external schema JSON, ``--dd_path`` in its
main.py:13-20) maps to a ``StructType``, qualification maps to
``df.alias(rel)``, and header handling / JSON parsing are the built-in
scan machinery (splittable, predicate-pushdown-capable, partition-safe —
everything the hand-rolled readers were not).

Dots never live inside column names (SURVEY.md §7.4 risk 1): the reader
strips the ``Rel.`` prefix and qualifies via alias instead.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "dd_to_schema",
    "load_dd",
    "read_qualified_csv",
    "read_tbl",
    "read_fixed_width",
    "write_fixed_width",
    "write_qualified_csv",
    "read_tagged_jsonl",
    "write_tagged_jsonl",
    "read_csv_with_quarantine",
]

# dd type names (pizza_set.json / tpc-h.json in the reference) → Spark types
_DD_TYPES = {
    "string": StringType(),
    "str": StringType(),
    "int": LongType(),
    "integer": LongType(),
    "float": DoubleType(),
    "double": DoubleType(),
}


def load_dd(path: str) -> dict[str, dict[str, str]]:
    """Load a data-dictionary JSON: {relation: {attr: typename}}."""
    with open(path) as fh:
        return json.load(fh)


def dd_to_schema(dd_rel: dict[str, str], qualified_prefix: str | None = None) -> StructType:
    """One relation's dd entry → enforced StructType.

    The reference treats dd types as advisory (never enforced at runtime,
    SURVEY.md §1.2); here they are the scan schema — a type mismatch
    surfaces at read time instead of producing stringly comparisons.
    """
    fields = []
    for attr, typename in dd_rel.items():
        name = f"{qualified_prefix}.{attr}" if qualified_prefix else attr
        t = typename.lower().strip()
        m = re.fullmatch(r"decimal\((\d+)\s*,\s*(\d+)\)", t)
        if m:
            dtype = DecimalType(int(m.group(1)), int(m.group(2)))
        else:
            try:
                dtype = _DD_TYPES[t]
            except KeyError:
                raise ValueError(
                    f"unknown dd type {typename!r} for attribute {attr!r}"
                )
        fields.append(StructField(name, dtype, nullable=True))
    return StructType(fields)


def read_qualified_csv(
    spark: SparkSession,
    path: str,
    relation: str,
    dd_rel: dict[str, str] | None = None,
) -> DataFrame:
    """Read the reference's qualified-header CSV as an aliased DataFrame.

    With a dd entry the schema is enforced at the scan (header names are
    validated against it); without one, types are inferred. Either way the
    ``Rel.`` prefixes are stripped and the relation is ``alias``-ed, so
    ``col("Person.age")`` resolves the way reference rows did.
    """
    if dd_rel is not None:
        schema = dd_to_schema(dd_rel, qualified_prefix=relation)
        df = spark.read.csv(path, header=True, schema=schema)
    else:
        df = spark.read.csv(path, header=True, inferSchema=True)
    renames = {c: c.split(".", 1)[1] for c in df.columns if c.startswith(f"{relation}.")}
    return df.withColumnsRenamed(renames).alias(relation)


def read_tbl(
    spark: SparkSession,
    path: str,
    relation: str,
    dd_rel: dict[str, str],
) -> DataFrame:
    """Read a TPC-H dbgen ``.tbl`` file (pipe-separated, no header).

    The reference ingests these only via pandas converter scripts run
    by hand before a job (utils/tbl_to_csv.py:6, utils/tbl_to_json.py:6
    — a driver-side, single-machine bottleneck at any real SF); here the
    scan itself is distributed and the dd schema is enforced at read.
    dbgen lines carry a trailing ``|``; Spark's PERMISSIVE CSV mode drops
    the resulting empty extra token against a fixed schema.
    """
    schema = dd_to_schema(dd_rel)
    return spark.read.csv(path, sep="|", header=False, schema=schema).alias(relation)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    relation: str,
    layout: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Read a fixed-width (mainframe/COBOL copybook style) text file.

    ``layout`` is [(column, 1-based start, width, dd_type)]. The parse is
    pure JVM expression work — one ``spark.read.text`` scan, then
    substring + trim + cast per column, all inside whole-stage codegen:
    no Python in the row path, and the scan distributes like any text
    source. Numeric fields are right-aligned space-padded, strings
    left-aligned — both trim to the same value. A capability the
    reference lacks entirely (its only inputs are CSV/JSONL conversions
    of dbgen .tbl, utils/tbl_to_csv.py:6)."""
    names = [name for name, _, _, _ in layout]
    if len(set(names)) != len(names):
        dups = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate layout column name(s): {dups}")
    schema = dd_to_schema({name: t for name, _, _, t in layout})
    raw = spark.read.text(path)
    cols = [
        F.expr(f"cast(trim(substring(value, {start}, {width})) as "
               f"{schema[name].dataType.simpleString()})").alias(name)
        for name, start, width, _ in layout
    ]
    return raw.select(*cols).alias(relation)


def write_fixed_width(rows, layout, path: str) -> None:
    """Write rows (sequences ordered like ``layout``) as fixed-width
    text: numerics right-aligned, strings left-aligned, space-padded.
    Raises if any value overflows its field — silent truncation is how
    fixed-width files corrupt."""
    with open(path, "w") as f:
        for r in rows:
            parts = []
            for (name, _start, width, t), v in zip(layout, r):
                s = str(v)
                if len(s) > width:
                    raise ValueError(
                        f"{name}: value {s!r} wider than field ({width})"
                    )
                parts.append(s.ljust(width) if t == "string"
                             else s.rjust(width))
            f.write("".join(parts) + "\n")


def write_qualified_csv(df: DataFrame, path: str, relation: str) -> None:
    """Write a DataFrame in the reference's qualified-header CSV format."""
    qualified = df.select(
        [F.col(c).alias(f"{relation}.{c}") for c in df.columns]
    )
    qualified.write.mode("overwrite").csv(path, header=True)


def read_tagged_jsonl(
    spark: SparkSession,
    path: str,
    relation: str,
    dd_rel: dict[str, str],
) -> DataFrame:
    """Read ``Rel\\t{json}`` tagged lines for one relation.

    text scan → tag filter (pushable, cheap) → ``from_json`` with the
    enforced dd schema → strip qualification → alias. Lines for other
    relations in the same file are filtered out, matching the tag
    semantics of the reference's mappers (ra2mr/ra2mr.py:148-152).
    """
    schema = dd_to_schema(dd_rel, qualified_prefix=relation)
    lines = spark.read.text(path)
    tagged = lines.filter(F.split("value", "\t").getItem(0) == relation)
    payload = tagged.select(
        F.expr("substring(value, instr(value, '\t') + 1)").alias("payload")
    )
    # a tagged line with a broken payload is dropped, not surfaced as an
    # all-NULL row (from_json's PERMISSIVE mode would null every field)
    parsed = payload.filter(
        F.expr("try_parse_json(payload) IS NOT NULL")
    ).select(F.from_json("payload", schema).alias("r"))
    out = parsed.select(
        [F.col(f"r.`{relation}.{attr}`").alias(attr) for attr in dd_rel]
    )
    return out.alias(relation)


def write_tagged_jsonl(df: DataFrame, path: str, relation: str) -> None:
    """Write a DataFrame as ``Rel\\t{json}`` tagged lines."""
    qualified = df.select(
        [F.col(c).alias(f"{relation}.{c}") for c in df.columns]
    )
    tagged = qualified.select(
        F.concat(F.lit(relation), F.lit("\t"), F.to_json(F.struct("*"))).alias("value")
    )
    tagged.write.mode("overwrite").text(path)


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Schema-enforced CSV scan that QUARANTINES malformed lines instead
    of killing the job or silently dropping them.

    Returns ``(good, quarantined, cached)``: ``good`` carries the declared
    columns for every line that parsed clean; ``quarantined`` carries the
    raw text of every line that did not (wrong arity, unparseable type),
    ready to be written to a reject sink for audit/replay. At 100 TB one
    poison line per billion is a certainty — FAILFAST turns it into a
    dead job, plain PERMISSIVE nulls it into the aggregate silently;
    routing the raw line to a side output is the operational answer.

    Mechanics: PERMISSIVE mode + ``columnNameOfCorruptRecord`` appends
    the raw line of each failed parse to a side column. Spark refuses a
    filter that references ONLY the corrupt column on the raw scan
    (SPARK-21610: the pruned scan would never populate it), so the scan
    is cached once and both splits filter the cached frame — one pass
    over the files, two in-memory filters. The cached frame is returned
    as the third element so a long-lived session can release it
    (``cached.unpersist()``) once both splits are materialized;
    otherwise repeated calls accumulate cached relations.
    """
    corrupt = "_corrupt_record"
    aug = StructType(schema.fields + [StructField(corrupt, StringType(), True)])
    df = spark.read.csv(
        path,
        schema=aug,
        header=header,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt,
    ).cache()
    good = df.filter(F.col(corrupt).isNull()).drop(corrupt)
    quarantined = df.filter(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_line")
    )
    return good, quarantined, df
