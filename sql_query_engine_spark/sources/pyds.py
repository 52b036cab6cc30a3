"""The reference's tagged-JSONL wire format as a REGISTERED Spark source.

``sources/legacy.read_tagged_jsonl`` implements the reference's
``Rel\\t{json}`` format (ra2mr/ra2mr.py:148-152 tag semantics) as a text
scan + expression pipeline. This module re-expresses it through the
Python DataSource API (Spark 4): after ``register_tagged_jsonl(spark)``
the format is a first-class citizen of the reader —

    spark.read.format("tagged_jsonl")
         .option("relation", "Person")
         .option("dd", json.dumps(dd["Person"]))
         .load(path)

— which buys the three things a pluggable source owns in Spark's
execution model:

* **partition planning**: one input partition per data file, so a
  directory of N shards scans with N-way parallelism (``partitions()``);
* **filter pushdown**: Catalyst offers the scan its filters
  (``pushFilters``); accepted ones (comparisons, null checks, string
  prefix/suffix/contains, IN) are applied row-level inside the source
  BEFORE rows cross into the query — the plan's Filter node disappears
  for fully-pushed predicates;
* **schema enforcement**: the dd schema is the reader contract, exactly
  as in the legacy path.

Python-source rows cross the worker boundary one tuple at a time, so
for bulk scans the JVM text-scan path (``read_tagged_jsonl``) stays the
performance default; the registered source is the *integration* surface
(``spark.read.format``/SQL ``CREATE TABLE ... USING``) the reference
never had. Both are tested equal on the same files.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import StructType

from .legacy import dd_to_schema

__all__ = ["TaggedJsonlDataSource", "register_tagged_jsonl"]


def _compile_filter(f: Filter):
    """One supported Filter → row-predicate over the parsed record dict.

    Returns None for shapes the source does not evaluate (those stay in
    the Spark plan). Comparisons are null-rejecting, matching Spark's
    SQL semantics (NULL op x → filtered out).
    """
    if isinstance(f, Not):
        inner = _compile_filter(f.child)
        if inner is None:
            return None
        # Spark's Not(child) keeps rows where child is FALSE (not NULL);
        # null-rejecting inner predicates already return False for NULL,
        # but e.g. Not(EqualTo) must NOT pass NULL values through.
        if isinstance(f.child, (IsNull, IsNotNull)):
            return lambda rec: not inner(rec)
        col = f.child.attribute[0]
        return lambda rec: rec.get(col) is not None and not inner(rec)

    col = f.attribute[0]
    if isinstance(f, EqualTo):
        return lambda rec: rec.get(col) is not None and rec[col] == f.value
    if isinstance(f, EqualNullSafe):
        return lambda rec: rec.get(col) == f.value
    if isinstance(f, GreaterThan):
        return lambda rec: rec.get(col) is not None and rec[col] > f.value
    if isinstance(f, GreaterThanOrEqual):
        return lambda rec: rec.get(col) is not None and rec[col] >= f.value
    if isinstance(f, LessThan):
        return lambda rec: rec.get(col) is not None and rec[col] < f.value
    if isinstance(f, LessThanOrEqual):
        return lambda rec: rec.get(col) is not None and rec[col] <= f.value
    if isinstance(f, In):
        values = set(f.value)
        return lambda rec: rec.get(col) is not None and rec[col] in values
    if isinstance(f, IsNull):
        return lambda rec: rec.get(col) is None
    if isinstance(f, IsNotNull):
        return lambda rec: rec.get(col) is not None
    if isinstance(f, StringStartsWith):
        return lambda rec: isinstance(rec.get(col), str) and rec[col].startswith(f.value)
    if isinstance(f, StringEndsWith):
        return lambda rec: isinstance(rec.get(col), str) and rec[col].endswith(f.value)
    if isinstance(f, StringContains):
        return lambda rec: isinstance(rec.get(col), str) and f.value in rec[col]
    return None


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _TaggedJsonlReader(DataSourceReader):
    def __init__(self, path: str, relation: str, schema: StructType):
        self.root = path
        self.relation = relation
        self.fields = [f.name for f in schema.fields]
        self.casts = [
            (int if f.dataType.typeName() == "long" else
             float if f.dataType.typeName() == "double" else None)
            for f in schema.fields
        ]
        self.predicates: list = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            pred = _compile_filter(f)
            if pred is None:
                yield f  # unsupported — Spark keeps it in the plan
            else:
                self.predicates.append(pred)

    def partitions(self) -> list[_FilePartition]:
        # one partition per data file: a sharded directory scans in
        # parallel; a single file degrades to one task (the format has
        # no intra-file split points without an index)
        if os.path.isdir(self.root):
            files = sorted(
                os.path.join(self.root, n)
                for n in os.listdir(self.root)
                if not n.startswith(("_", "."))
            )
        else:
            files = [self.root]
        return [_FilePartition(p) for p in files] or [_FilePartition(self.root)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        prefix = self.relation + "\t"
        qualified = [f"{self.relation}.{name}" for name in self.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if not line.startswith(prefix):
                    continue
                try:
                    raw = json.loads(line[len(prefix):])
                except json.JSONDecodeError:
                    continue  # malformed payload → dropped, as legacy path
                rec = {}
                for name, qname, cast in zip(self.fields, qualified, self.casts):
                    v = raw.get(qname, raw.get(name))
                    if v is not None and cast is not None:
                        try:
                            v = cast(v)
                        except (TypeError, ValueError):
                            v = None
                    rec[name] = v
                if all(p(rec) for p in self.predicates):
                    yield tuple(rec[name] for name in self.fields)


def _parse_tagged_line(line: str, relation: str, fields, qualified, casts):
    """One wire line → output tuple, or None (other tag / malformed)."""
    prefix = relation + "\t"
    if not line.startswith(prefix):
        return None
    try:
        raw = json.loads(line[len(prefix):])
    except json.JSONDecodeError:
        return None
    out = []
    for name, qname, cast in zip(fields, qualified, casts):
        v = raw.get(qname, raw.get(name))
        if v is not None and cast is not None:
            try:
                v = cast(v)
            except (TypeError, ValueError):
                v = None
        out.append(v)
    return tuple(out)


class _TaggedJsonlStreamReader(SimpleDataSourceStreamReader):
    """Tail a directory of tagged files as a STREAMING source.

    Offsets are ``{"files": {basename: lines_consumed}}`` — a restart (or
    exactly-once retry via ``readBetweenOffsets``) re-reads precisely the
    line ranges a batch covered, so replays are deterministic. New files
    and appended lines both advance the offset. The Simple reader runs on
    the driver by design (Spark plans partitions from its offsets) —
    right for control-plane-rate ingest like the reference's tagged
    dumps; bulk firehoses belong on the partitioned batch reader or a
    full DataSourceStreamReader.
    """

    def __init__(self, path: str, relation: str, schema: StructType):
        self.root = path
        self.relation = relation
        self.fields = [f.name for f in schema.fields]
        self.qualified = [f"{relation}.{name}" for name in self.fields]
        self.casts = [
            (int if f.dataType.typeName() == "long" else
             float if f.dataType.typeName() == "double" else None)
            for f in schema.fields
        ]

    def _files(self) -> list[str]:
        if os.path.isdir(self.root):
            return sorted(
                n for n in os.listdir(self.root) if not n.startswith(("_", "."))
            )
        return [os.path.basename(self.root)]

    def _file_path(self, name: str) -> str:
        return os.path.join(self.root, name) if os.path.isdir(self.root) else self.root

    def initialOffset(self) -> dict:
        return {"files": {}}

    def _read_range(self, name: str, start_line: int, end_line: int | None):
        with open(self._file_path(name), encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                if i < start_line:
                    continue
                if end_line is not None and i >= end_line:
                    break
                rec = _parse_tagged_line(
                    line, self.relation, self.fields, self.qualified, self.casts
                )
                if rec is not None:
                    yield rec

    def read(self, start: dict):
        consumed = dict(start.get("files", {}))
        rows: list[tuple] = []
        end = {}
        for name in self._files():
            from_line = int(consumed.get(name, 0))
            n = from_line
            with open(self._file_path(name), encoding="utf-8") as fh:
                for i, line in enumerate(fh):
                    if i < from_line:
                        continue
                    n = i + 1
                    rec = _parse_tagged_line(
                        line, self.relation, self.fields, self.qualified, self.casts
                    )
                    if rec is not None:
                        rows.append(rec)
            end[name] = n
        return iter(rows), {"files": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        s, e = start.get("files", {}), end.get("files", {})
        for name in sorted(e):
            yield from self._read_range(name, int(s.get(name, 0)), int(e[name]))

    def commit(self, end: dict) -> None:
        pass  # files are the source of truth; nothing to clean up


class TaggedJsonlDataSource(DataSource):
    """``spark.read.format("tagged_jsonl")`` — options:

    * ``relation`` (required): the tag to extract;
    * ``dd`` (required): JSON object ``{attr: typename}`` — the data
      dictionary entry for the relation (reference dd types: string/int/
      float), enforced as the scan schema with unqualified names;
    * ``path``: file or directory of tagged files.
    """

    @classmethod
    def name(cls) -> str:
        return "tagged_jsonl"

    def schema(self) -> StructType:
        dd_rel = json.loads(self.options["dd"])
        return dd_to_schema(dd_rel, qualified_prefix=None)

    def reader(self, schema: StructType) -> _TaggedJsonlReader:
        return _TaggedJsonlReader(
            self.options["path"], self.options["relation"], schema
        )

    def simpleStreamReader(self, schema: StructType) -> _TaggedJsonlStreamReader:
        return _TaggedJsonlStreamReader(
            self.options["path"], self.options["relation"], schema
        )


def register_tagged_jsonl(spark: SparkSession) -> None:
    """Idempotently register the format with this session."""
    spark.dataSource.register(TaggedJsonlDataSource)
