"""From-scratch HTML text extraction — the WARC→text step of a crawl
pipeline.

After the .warc.gz record walk (sources/warc.py), the next thing every
web-scale training-data pipeline does is turn HTML responses into clean
text: strip markup, drop script/style payloads, decode character
references, and keep structural censuses (links, tags) for quality
filtering. The reference has no counterpart; this sits in the same
capability family as the container decoders in functions/multimodal.py
and follows their contract — a strict parser for the source path
(attributable failures raise with a reason) plus a ``try_`` wrapper
that rejects to ``None`` and never crashes (fuzz-corpus member).

The tokenizer implements the WHATWG-flavored essentials a real
extractor needs, all from the public spec:

* data / tag-open states; a ``<`` not followed by an ASCII letter is
  literal text,
* start tags with attributes (double-quoted, single-quoted, and
  unquoted values; quoted values may contain ``>``), self-closing
  solidus, void elements,
* end tags, comments (``<!-- … -->``, whose body may contain ``>``),
  markup declarations (``<!DOCTYPE …>``) and bogus ``<?…>`` markup,
* RAWTEXT elements (``script``/``style``): content is skipped verbatim
  until the case-insensitive matching end tag — ``<p>`` inside a
  script is NOT a tag,
* character references in text: the core named set plus decimal and
  hex numeric references; invalid references pass through literally
  (the WHATWG error-recovery behavior).

Captured per page: the ``<title>`` text, the concatenated text inside
``<p>`` elements (entity-decoded — the escape/unescape roundtrip law
the registry oracle pins byte-exact), link / tag / comment censuses.

Scale shape: pure per-row string work behind Arrow ``mapInPandas`` —
map-only, no shuffle, embarrassingly parallel at any corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "extract_html",
    "try_extract_html",
    "build_html_page",
    "synthesize_html_pages",
    "html_extract_stats",
    "html_link_stats",
]

_NAMED_REFS = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": "\xa0", "copy": "\xa9",
}

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}

_RAWTEXT = {"script", "style"}

_WS = " \t\r\n\f"

# Length-preserving ASCII-only lowercase. str.lower() can CHANGE the
# string length for some non-ASCII code points ('İ' U+0130 lowercases
# to 'i̇', common on Turkish crawl pages), which would desync the
# lowered shadow string from the original and make every index-based
# name/RAWTEXT scan below read shifted offsets. Tag and attribute names
# are ASCII per the WHATWG spec, so translating only A-Z is both
# sufficient and always 1:1 in length.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")


def _decode_refs(s: str) -> str:
    """Decode character references; invalid ones stay literal (WHATWG
    recovery: an ampersand that doesn't start a valid reference is
    text)."""
    if "&" not in s:
        return s
    out: list[str] = []
    i = 0
    while True:
        j = s.find("&", i)
        if j < 0:
            out.append(s[i:])
            break
        out.append(s[i:j])
        if s.startswith("#", j + 1):
            k = j + 2
            hexmode = k < len(s) and s[k] in "xX"
            if hexmode:
                k += 1
            st = k
            digits = "0123456789abcdefABCDEF" if hexmode else "0123456789"
            while k < len(s) and s[k] in digits:
                k += 1
            if k > st and k < len(s) and s[k] == ";":
                cp = int(s[st:k], 16 if hexmode else 10)
                if 0 < cp <= 0x10FFFF and not 0xD800 <= cp <= 0xDFFF:
                    out.append(chr(cp))
                    i = k + 1
                    continue
            out.append("&")
            i = j + 1
        else:
            k = s.find(";", j + 1)
            if j < k <= j + 8 and s[j + 1 : k] in _NAMED_REFS:
                out.append(_NAMED_REFS[s[j + 1 : k]])
                i = k + 1
            else:
                out.append("&")
                i = j + 1
    return "".join(out)


def extract_html(html: str, path: str = "<html>") -> dict:
    """Tokenize one HTML page → {title, text, n_links, n_tags,
    n_comments}. ``text`` is the entity-decoded content of ``<p>``
    elements; ``title`` likewise for ``<title>``; ``n_tags`` counts
    start tags (void and self-closing included; comments and markup
    declarations are not tags). Raises ValueError with the path on
    structural defects: unterminated comment / markup declaration /
    tag / quoted attribute value / RAWTEXT element, or a bare ``</``
    with no tag name."""
    n = len(html)
    low = html.translate(_ASCII_LOWER)
    title_parts: list[str] = []
    text_parts: list[str] = []
    links: list[dict] = []
    n_links = n_tags = n_comments = 0
    stack: list[str] = []

    def sink(raw: str) -> None:
        if not raw:
            return
        if "title" in stack:
            title_parts.append(_decode_refs(raw))
        if "p" in stack:
            text_parts.append(_decode_refs(raw))
        if links and "a" in stack:
            links[-1]["text"] += _decode_refs(raw)

    i = 0
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            sink(html[i:])
            break
        sink(html[i:lt])
        i = lt
        if html.startswith("<!--", i):
            end = html.find("-->", i + 4)
            if end < 0:
                raise ValueError(f"{path}: unterminated comment at {i}")
            n_comments += 1
            i = end + 3
            continue
        if html.startswith("<!", i) or html.startswith("<?", i):
            end = html.find(">", i)
            if end < 0:
                raise ValueError(
                    f"{path}: unterminated markup declaration at {i}")
            i = end + 1
            continue
        if html.startswith("</", i):
            j = i + 2
            st = j
            while j < n and html[j].isalnum():
                j += 1
            if j == st:
                raise ValueError(f"{path}: end tag without a name at {i}")
            name = low[st:j]
            end = html.find(">", j)
            if end < 0:
                raise ValueError(f"{path}: unterminated end tag at {i}")
            i = end + 1
            if name in stack:
                while stack and stack[-1] != name:
                    stack.pop()
                if stack:
                    stack.pop()
            continue
        j = i + 1
        if j >= n or not html[j].isascii() or not html[j].isalpha():
            # '<' not starting a tag is literal text (WHATWG)
            sink("<")
            i += 1
            continue
        st = j
        while j < n and (html[j].isalnum() or html[j] == "-"):
            j += 1
        name = low[st:j]
        selfclosing = False
        attrs: dict[str, str] = {}
        while True:
            while j < n and html[j] in _WS:
                j += 1
            if j >= n:
                raise ValueError(f"{path}: unterminated tag <{name} at {i}")
            if html[j] == ">":
                j += 1
                break
            if html.startswith("/>", j):
                selfclosing = True
                j += 2
                break
            if html[j] == "/":
                j += 1  # stray solidus between attributes
                continue
            st2 = j
            while j < n and html[j] not in _WS + "=/>":
                j += 1
            if j == st2:
                raise ValueError(
                    f"{path}: malformed attribute in <{name} at {j}")
            aname = low[st2:j]
            aval = ""
            while j < n and html[j] in _WS:
                j += 1
            if j < n and html[j] == "=":
                j += 1
                while j < n and html[j] in _WS:
                    j += 1
                if j < n and html[j] in "\"'":
                    q = html[j]
                    end = html.find(q, j + 1)
                    if end < 0:
                        raise ValueError(
                            f"{path}: unterminated {q}-quoted attribute "
                            f"value in <{name} at {j}")
                    aval = html[j + 1 : end]
                    j = end + 1
                else:
                    st3 = j
                    while j < n and html[j] not in _WS + ">":
                        j += 1
                    aval = html[st3:j]
            attrs.setdefault(aname, _decode_refs(aval))
        n_tags += 1
        i = j
        if name == "a":
            n_links += 1
            links.append({"href": attrs.get("href", ""), "text": ""})
        if name in _RAWTEXT and not selfclosing:
            end = low.find("</" + name, i)
            while end >= 0:
                after = end + 2 + len(name)
                if after >= n or html[after] in _WS + "/>":
                    break
                end = low.find("</" + name, after)
            if end < 0:
                raise ValueError(
                    f"{path}: unterminated <{name}> element at {i}")
            gt = html.find(">", end)
            if gt < 0:
                raise ValueError(
                    f"{path}: unterminated </{name} tag at {end}")
            i = gt + 1
            continue
        if name not in _VOID and not selfclosing:
            stack.append(name)
    return {
        "title": "".join(title_parts),
        "text": "".join(text_parts),
        "n_links": n_links,
        "n_tags": n_tags,
        "n_comments": n_comments,
        "links": links,
    }


def try_extract_html(payload) -> dict | None:
    """Reject-to-None wrapper (fuzz contract: never raise). Accepts
    str or UTF-8 bytes."""
    try:
        if isinstance(payload, (bytes, bytearray, memoryview)):
            payload = bytes(payload).decode("utf-8", errors="strict")
        return extract_html(payload)
    except (ValueError, UnicodeDecodeError):
        return None


# -------------------------------------------------------------------------
# Deterministic page fixture — Python twin of the Spark-expression
# builder below (a test pins them byte-identical so neither can drift).
# -------------------------------------------------------------------------


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _href(i: int) -> str:
    """Link targets alternate site-internal and external — the split a
    link-graph census needs to discriminate."""
    return f"/l/{i}" if i % 2 else f"http://ext-{i}.example.org/"


def build_html_page(doc_id: int, text: str) -> str:
    """One page per doc: entity-escaped body text in a ``<p>`` (with an
    attribute whose value contains ``>``), a title with a named
    reference, ``doc_id % 7`` nav links, a comment containing ``>``,
    a style block, and a script whose body contains ``<p>`` and ``1<2``
    — every trap the tokenizer must survive."""
    n = doc_id % 7
    links = "".join(
        f'<a href="{_href(i)}">link {i}</a>' for i in range(1, n + 1))
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>doc &amp; {doc_id}</title>"
        "<style>p{color:#000}</style>"
        '<script>if(1<2){x="<p>"}</script>'
        "</head><body><!-- nav > menu -->"
        f"<nav>&#169; {links}</nav>"
        f'<p data-x="a>b">{_escape(text)}</p>'
        "</body></html>"
    )


def page_expr() -> "F.Column":
    """The page-synthesis COLUMN (pure codegen over doc_id/text) —
    exported so composed pipelines can add the html column without a
    re-join against the source table."""
    nl = F.col("doc_id") % 7
    links = F.when(
        nl > 0,
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), nl.cast("int")),
                lambda i: F.concat(
                    F.lit('<a href="'),
                    F.when(i % 2 == 1,
                           F.concat(F.lit("/l/"), i.cast("string")))
                    .otherwise(F.concat(F.lit("http://ext-"),
                                        i.cast("string"),
                                        F.lit(".example.org/"))),
                    F.lit('">link '), i.cast("string"), F.lit("</a>")),
            ),
            "",
        ),
    ).otherwise("")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;")),
        F.lit(">"), F.lit("&gt;"))
    page = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>doc &amp; "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p{color:#000}</style>"
              '<script>if(1<2){x="<p>"}</script>'
              "</head><body><!-- nav > menu --><nav>&#169; "),
        links,
        F.lit('</nav><p data-x="a>b">'),
        esc,
        F.lit("</p></body></html>"),
    )
    return page


def synthesize_html_pages(docs: DataFrame) -> DataFrame:
    """JVM-side page synthesis (pure codegen expressions — the builder
    never leaves the executor JVM; only the extractor is Python). Adds
    an ``html`` column to (doc_id, text).

    The NARROW (doc_id, text) projection is repartitioned to the
    session's parallelism first: a small compact parquet arrives as ONE
    split, and without the spread the downstream Python extractor runs
    an entire corpus on a single core (measured 82 µs/page — 0.4 s
    serial at sf0.1). Shuffling the raw text BEFORE synthesis keeps the
    exchange narrow; the synthesized html never crosses a shuffle
    (same pattern as dedup.shingled_docs / multimodal._doc_id_partitions)."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    src = docs.select("doc_id", "text")
    # one-file local fixtures scan as a single split; many-split cluster
    # tables skip the rebalance (the bpe/unigram guard). Probing via
    # inputFiles() stays a driver-side catalog lookup — the former
    # .rdd.getNumPartitions() forced eager analysis + DataFrame→RDD
    # conversion on every query build (and .rdd is unavailable under
    # Spark Connect). Non-file-backed inputs ([] files) take the
    # rebalance, which is the safe side.
    if len(src.inputFiles()) < par:
        src = src.repartition(par)
    return src.select("doc_id", "text", page_expr().alias("html"))


def html_extract_stats(pages: DataFrame) -> DataFrame:
    """Arrow mapInPandas extraction over an ``html`` column → (doc_id,
    title, n_links, n_tags, n_comments, text, text_len). Map-only."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("title", StringType(), True),
            StructField("n_links", IntegerType(), True),
            StructField("n_tags", IntegerType(), True),
            StructField("n_comments", IntegerType(), True),
            StructField("text", StringType(), True),
            StructField("text_len", LongType(), True),
        ]
    )

    def _ext(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                r = None if html is None else try_extract_html(html)
                if r is None:
                    rows.append((int(doc_id), None, None, None, None,
                                 None, None))
                else:
                    rows.append((int(doc_id), r["title"], r["n_links"],
                                 r["n_tags"], r["n_comments"], r["text"],
                                 len(r["text"])))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "title", "n_links", "n_tags",
                         "n_comments", "text", "text_len"],
            )

    return pages.select("doc_id", "html").mapInPandas(_ext, schema)


def html_link_stats(pages: DataFrame) -> DataFrame:
    """Per-page link census — the HTML→link-graph step (feeds the same
    edge shapes graph_pagerank / pipeline_source_authority consume):
    (doc_id, n_internal, n_external, hrefs, anchor_len), where
    ``hrefs`` is the '|'-joined targets in DOCUMENT ORDER (a census the
    oracle can pin byte-exact) and internal = href starting with '/'.
    Arrow mapInPandas, map-only."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_internal", IntegerType(), True),
            StructField("n_external", IntegerType(), True),
            StructField("hrefs", StringType(), True),
            StructField("anchor_len", LongType(), True),
        ]
    )

    def _ext(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf["doc_id"], pdf["html"]):
                r = None if html is None else try_extract_html(html)
                if r is None:
                    rows.append((int(doc_id), None, None, None, None))
                    continue
                links = r["links"]
                n_int = sum(1 for x in links if x["href"].startswith("/"))
                rows.append((
                    int(doc_id),
                    n_int,
                    len(links) - n_int,
                    "|".join(x["href"] for x in links),
                    sum(len(x["text"]) for x in links),
                ))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_internal", "n_external", "hrefs",
                         "anchor_len"],
            )

    return pages.select("doc_id", "html").mapInPandas(_ext, schema)
