r"""Relational-algebra text front end.

The reference exposes RA text as a *public input language*, not just an
internal IR: ``run_radb_query_in_spark`` accepts strings like
``\select_{gender='female'}(Person);`` directly
(ra2spark/ra2spark.py:107-114, parsed there by the radb library), and its
test suites drive execution from parsed RA (tests/test_ra2mr.py:113-117).
This module is a from-scratch recursive-descent parser for the same
surface, compiling straight to DataFrames through our operator library —
the logical plan lands in Catalyst like any other query.

Supported grammar (the subset the reference engine can execute — its
predicate language is comparisons joined by ``and``,
sql2ra/functionality.py:74-78, plus the five operators of SURVEY.md §2.1):

    statement  :=  expr ';'?
    expr       :=  term ( '\cross' term | '\join_{' cond '}' term )*
    term       :=  '(' expr ')' | unary | RELNAME
    unary      :=  '\select_{' cond '}' term
                |  '\project_{' attrs '}' term
                |  '\rename_{' (NAME | '*') (':' ('*' | attrs))? '}' term
    cond       :=  comparison ( 'and' comparison )*
    comparison :=  operand ('=' | '<=' | '>=' | '<' | '>') operand
    operand    :=  [REL '.'] ATTR | NUMBER | 'string'

Semantics follow the reference where it is correct and ANSI where it was
not: ``\project`` deduplicates (set semantics, ra2spark/ra2spark.py:89-93);
``\join``/``\select`` support full comparison operators with real theta
evaluation (the reference silently broke non-equi joins — SURVEY.md §2.2
J5 — and its SQL front end coerced every operator to ``=``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import relational as R

__all__ = ["parse_ra", "run_ra"]

_TOKEN_RE = re.compile(
    r"""
    (?P<op>\\(?:select|project|rename|join)_)  # unary/join heads
  | (?P<cross>\\cross\b)
  | (?P<and>\band\b)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)?)
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<string>'[^']*')
  | (?P<cmp><=|>=|=|<|>)
  | (?P<punct>[{}(),:;*])
  | (?P<ws>\s+)
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str


def _tokenize(src: str) -> list[_Tok]:
    out: list[_Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ValueError(f"RA syntax error at {src[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup or ""
        if kind != "ws":
            out.append(_Tok(kind, m.group()))
    return out


class _Parser:
    def __init__(self, tokens: list[_Tok], resolve):
        self.toks = tokens
        self.i = 0
        self.resolve = resolve  # relation name -> DataFrame

    # -- token helpers ---------------------------------------------------
    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        tok = self._peek()
        if tok is None:
            raise ValueError("unexpected end of RA input")
        self.i += 1
        return tok

    def _expect(self, text: str) -> None:
        tok = self._next()
        if tok.text != text:
            raise ValueError(f"expected {text!r}, got {tok.text!r}")

    # -- grammar ---------------------------------------------------------
    def statement(self) -> DataFrame:
        df = self.expr()
        if self._peek() and self._peek().text == ";":
            self._next()
        if self._peek() is not None:
            raise ValueError(f"trailing input at {self._peek().text!r}")
        return df

    def expr(self) -> DataFrame:
        left = self.term()
        while True:
            tok = self._peek()
            if tok is None:
                return left
            if tok.kind == "cross":
                self._next()
                left = R.cross_product(left, self.term())
            elif tok.kind == "op" and tok.text == "\\join_":
                self._next()
                self._expect("{")
                cond = self.cond()
                self._expect("}")
                right = self.term()
                left = R.theta_join(left, right, cond)
            else:
                return left

    def term(self) -> DataFrame:
        tok = self._peek()
        if tok is None:
            raise ValueError("unexpected end of RA input")
        if tok.text == "(":
            self._next()
            df = self.expr()
            self._expect(")")
            return df
        if tok.kind == "op":
            return self.unary()
        if tok.kind == "name":
            self._next()
            return R.scan(self.resolve(tok.text), alias=tok.text)
        raise ValueError(f"unexpected token {tok.text!r}")

    def unary(self) -> DataFrame:
        head = self._next().text
        self._expect("{")
        if head == "\\select_":
            cond = self.cond()
            self._expect("}")
            return R.filter_rows(self.term(), cond)
        if head == "\\project_":
            attrs = self.attr_list()
            self._expect("}")
            return R.project_distinct(self.term(), attrs)
        if head == "\\rename_":
            # radb surface: \rename_{R: *} (relation only), \rename_{R: a,b}
            # (relation + positional attrs, reference ra2mr/ra2mr.py:274-276
            # zips the child's attr order with the new names), \rename_{*: a,b}
            # (attrs only).
            new_name = self._next().text
            attrs: list[str] | None = None
            if self._peek() and self._peek().text == ":":
                self._next()
                if self._peek() and self._peek().text == "*":
                    self._next()
                else:
                    attrs = self.attr_list()
            self._expect("}")
            child = self.term()
            attrnames: dict[str, str] | None = None
            if attrs is not None:
                if len(attrs) != len(child.columns):
                    raise ValueError(
                        f"rename expects {len(child.columns)} attribute names, "
                        f"got {len(attrs)}"
                    )
                attrnames = dict(zip(child.columns, attrs))
            relname = None if new_name == "*" else new_name
            return R.rename(child, relname=relname, attrnames=attrnames)
        raise ValueError(f"unknown operator {head!r}")

    def attr_list(self) -> list[str]:
        attrs = [self._next().text]
        while self._peek() and self._peek().text == ",":
            self._next()
            attrs.append(self._next().text)
        return attrs

    def cond(self) -> Column:
        c = self.comparison()
        while self._peek() and self._peek().kind == "and":
            self._next()
            c = c & self.comparison()
        return c

    def comparison(self) -> Column:
        left = self.operand()
        op = self._next()
        if op.kind != "cmp":
            raise ValueError(f"expected comparison operator, got {op.text!r}")
        right = self.operand()
        return {
            "=": left == right,
            "<": left < right,
            ">": left > right,
            "<=": left <= right,
            ">=": left >= right,
        }[op.text]

    def operand(self) -> Column:
        tok = self._next()
        if tok.kind == "name":
            return F.col(tok.text)
        if tok.kind == "number":
            return F.lit(float(tok.text) if "." in tok.text else int(tok.text))
        if tok.kind == "string":
            return F.lit(tok.text[1:-1])
        raise ValueError(f"bad operand {tok.text!r}")


def parse_ra(ra_text: str, resolve) -> DataFrame:
    """Compile RA text to a DataFrame; ``resolve(name)`` supplies scans."""
    return _Parser(_tokenize(ra_text), resolve).statement()


def run_ra(spark: SparkSession, ra_text: str) -> DataFrame:
    """Entry-point parity with ``run_radb_query_in_spark``: relation names
    resolve against the session catalog (temp views / tables)."""
    return parse_ra(ra_text, spark.table)
