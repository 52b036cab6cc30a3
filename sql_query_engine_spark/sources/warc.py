"""From-spec WARC/1.0 (ISO 28500) source — the web-crawl container.

WARC is the format the large crawl corpora (Common Crawl and friends)
ship in, which makes it the most on-theme source for a training-data
pipeline: a 100 TB ingest's FIRST distributed scan is a WARC record
walk. The reference has no counterpart (its inputs are CSV/JSONL
conversions); this is a capability extension in the same family as the
Avro OCF source (sources/avro.py).

Format essentials implemented here (ISO 28500 / WARC 1.0):

* Every record starts with the version line ``WARC/1.0\\r\\n``.
* Named headers follow, one per ``\\r\\n`` line, ``Name: value``;
  ``Content-Length`` (mandatory) gives the payload byte count.
* A blank line (``\\r\\n``) separates headers from the payload block.
* Two CRLFs terminate the record; the next record follows immediately.

Scale shape: one ``.warc`` file per partition is written executor-side;
the read is a ``binaryFile`` scan + Arrow ``mapInPandas`` record walk —
per-file independent, nothing driver-side, exactly the Avro source's
plan. Malformed records raise with the offending path (attributable
ingest failures), matching the Avro convention.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "build_warc_record",
    "write_warc_bytes",
    "decode_warc_bytes",
    "write_warc_dataset",
    "read_warc",
    "gzip_member",
    "split_gzip_members",
    "build_http_response",
    "parse_http_response",
    "write_warc_gz_dataset",
    "read_warc_gz",
    "read_warc_gz_stream",
    "read_cdx",
    "fetch_warc_members",
    "try_scan_warc_gz",
]

_CRLF = b"\r\n"
_VERSION = b"WARC/1.0"
_WARC_DATE = "2024-01-01T00:00:00Z"  # fixture date: deterministic output


def build_warc_record(doc_id: int, text: str) -> bytes:
    """One WARC response record for a document: deterministic record id
    and target URI derived from doc_id, UTF-8 payload."""
    payload = text.encode("utf-8")
    headers = [
        (b"WARC-Type", b"response"),
        (b"WARC-Record-ID",
         f"<urn:uuid:00000000-0000-0000-0000-{doc_id:012d}>".encode()),
        (b"WARC-Date", _WARC_DATE.encode()),
        (b"WARC-Target-URI", f"http://example.com/doc/{doc_id}".encode()),
        (b"Content-Type", b"text/plain"),
        (b"Content-Length", str(len(payload)).encode()),
    ]
    out = _VERSION + _CRLF
    for k, v in headers:
        out += k + b": " + v + _CRLF
    return out + _CRLF + payload + _CRLF + _CRLF


def write_warc_bytes(records: list[tuple[int, str]]) -> bytes:
    """Serialize (doc_id, text) pairs into one WARC file byte string."""
    return b"".join(build_warc_record(d, t) for d, t in records)


def decode_warc_bytes(payload: bytes, path: str = "<bytes>"):
    """Walk one WARC file → [(doc_id, target_uri, content_length,
    payload_bytes)]. Raises ValueError with the path on any framing
    defect: bad version line, missing Content-Length, truncated
    payload, or missing record terminator."""
    b = payload
    recs = []
    pos = 0
    while pos < len(b):
        eol = b.find(_CRLF, pos)
        if eol < 0 or b[pos:eol] != _VERSION:
            raise ValueError(f"{path}: bad WARC version line at {pos}")
        pos = eol + 2
        headers: dict[bytes, bytes] = {}
        while True:
            eol = b.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(f"{path}: unterminated header block")
            line = b[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line: payload follows
            # ISO 28500 allows zero whitespace after the colon — split
            # on the bare colon and strip optional LWS from the value
            k, sep, v = line.partition(b":")
            if not sep or not k:
                raise ValueError(f"{path}: malformed header {line!r}")
            if k in headers:
                raise ValueError(f"{path}: duplicate header {k!r}")
            headers[k] = v.lstrip(b" \t")
        if b"Content-Length" not in headers:
            raise ValueError(f"{path}: record without Content-Length")
        try:
            n = int(headers[b"Content-Length"])
        except ValueError:
            raise ValueError(f"{path}: non-numeric Content-Length")
        if n < 0 or pos + n + 4 > len(b):
            raise ValueError(f"{path}: truncated payload")
        body = b[pos : pos + n]
        if b[pos + n : pos + n + 4] != _CRLF + _CRLF:
            raise ValueError(f"{path}: missing record terminator")
        pos += n + 4
        uri = headers.get(b"WARC-Target-URI", b"").decode()
        rid = headers.get(b"WARC-Record-ID", b"").decode()
        # fixture ids live in the uuid tail; external files may not
        # carry one — doc_id is then -1 and the caller keys on the URI
        doc_id = -1
        tail = rid.rstrip(">").rsplit("-", 1)[-1]
        if tail.isdigit():
            doc_id = int(tail)
        recs.append((doc_id, uri, n, body))
    return recs


# -------------------------------------------------------------------------
# Multi-member gzip (RFC 1952) — the .warc.gz layout the crawl corpora
# actually ship: ONE gzip member PER RECORD, so a reader can split work
# at member boundaries without inflating the whole file. The walker is
# from-spec (header flag parse incl. FEXTRA/FNAME/FCOMMENT/FHCRC, raw
# DEFLATE via zlib, per-member CRC32 + ISIZE verification) and bounds
# inflation per member before trusting any length field.
# -------------------------------------------------------------------------

_GZ_MAGIC = b"\x1f\x8b"
_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16
_GZ_MAX_MEMBER_BYTES = 256 * 1024 * 1024  # inflation ceiling per member


def gzip_member(payload: bytes, fname: bytes | None = None,
                fhcrc: bool = False) -> bytes:
    """One RFC 1952 member: fixed header (MTIME=0 for determinism),
    optional FNAME / header-CRC16, raw DEFLATE body, CRC32 + ISIZE."""
    import zlib

    flg = (_FNAME if fname else 0) | (_FHCRC if fhcrc else 0)
    hdr = _GZ_MAGIC + b"\x08" + bytes([flg]) + b"\x00\x00\x00\x00" \
        + b"\x00\xff"
    if fname:
        if b"\x00" in fname:
            raise ValueError("FNAME cannot contain NUL")
        hdr += fname + b"\x00"
    if fhcrc:
        hdr += (zlib.crc32(hdr) & 0xFFFF).to_bytes(2, "little")
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    body = co.compress(payload) + co.flush()
    return (
        hdr + body
        + (zlib.crc32(payload) & 0xFFFFFFFF).to_bytes(4, "little")
        + (len(payload) & 0xFFFFFFFF).to_bytes(4, "little")
    )


def split_gzip_members(b: bytes, path: str = "<bytes>") -> list[bytes]:
    """Walk a multi-member gzip stream → one inflated payload per
    member. Enforces the RFC 1952 MUSTs: magic + CM=8, reserved FLG
    bits zero, FEXTRA/FNAME/FCOMMENT skipped by their own framing,
    FHCRC verified against the header bytes, and the 8-byte trailer's
    CRC32 and ISIZE checked against the inflated payload. Inflation is
    capped per member BEFORE any declared length is trusted. Raises
    ValueError with the path on any defect — attributable ingest
    failures, same convention as the WARC walker above."""
    import zlib

    out: list[bytes] = []
    pos = 0
    if not b:
        raise ValueError(f"{path}: empty gzip stream")
    while pos < len(b):
        start = pos
        if b[pos : pos + 2] != _GZ_MAGIC:
            raise ValueError(f"{path}: bad gzip magic at {pos}")
        if pos + 10 > len(b):
            raise ValueError(f"{path}: truncated gzip header at {pos}")
        if b[pos + 2] != 8:
            raise ValueError(f"{path}: unknown compression method "
                             f"{b[pos + 2]} at {pos}")
        flg = b[pos + 3]
        if flg & 0xE0:
            raise ValueError(f"{path}: reserved FLG bits set at {pos}")
        pos += 10
        if flg & _FEXTRA:
            if pos + 2 > len(b):
                raise ValueError(f"{path}: truncated FEXTRA length")
            xlen = int.from_bytes(b[pos : pos + 2], "little")
            pos += 2 + xlen
            if pos > len(b):
                raise ValueError(f"{path}: truncated FEXTRA field")
        for bit, name in ((_FNAME, "FNAME"), (_FCOMMENT, "FCOMMENT")):
            if flg & bit:
                z = b.find(b"\x00", pos)
                if z < 0:
                    raise ValueError(f"{path}: unterminated {name}")
                pos = z + 1
        if flg & _FHCRC:
            if pos + 2 > len(b):
                raise ValueError(f"{path}: truncated header CRC16")
            want = int.from_bytes(b[pos : pos + 2], "little")
            got = zlib.crc32(b[start:pos]) & 0xFFFF
            if want != got:
                raise ValueError(f"{path}: header CRC16 mismatch "
                                 f"({want:#06x} != {got:#06x})")
            pos += 2
        # feed the inflater in bounded chunks off a memoryview: slicing
        # `b[pos:]` per member copies the whole remaining buffer, which
        # is O(shard²) across tens of thousands of members (the 2M-doc
        # rehearsal measured the cliff)
        mv = memoryview(b)
        chunk = 256 * 1024
        d = zlib.decompressobj(-15)
        parts: list[bytes] = []
        produced = 0
        p = pos
        try:
            while not d.eof:
                if d.unconsumed_tail:
                    data = d.unconsumed_tail
                elif p < len(b):
                    data = mv[p : p + chunk]
                    p += len(data)
                else:
                    raise ValueError(
                        f"{path}: truncated DEFLATE stream at {pos}")
                piece = d.decompress(
                    data, _GZ_MAX_MEMBER_BYTES - produced + 1)
                produced += len(piece)
                parts.append(piece)
                if produced > _GZ_MAX_MEMBER_BYTES:
                    raise ValueError(f"{path}: member inflates past "
                                     f"{_GZ_MAX_MEMBER_BYTES} bytes")
        except zlib.error as e:
            raise ValueError(f"{path}: bad DEFLATE stream at {pos}: {e}")
        payload = b"".join(parts)
        # deflate end within the last fed chunk: unused_data is what
        # remained of it (bounded by the chunk size, not the shard)
        end = p - len(d.unused_data)
        if end + 8 > len(b):
            raise ValueError(f"{path}: truncated gzip trailer")
        want_crc = int.from_bytes(b[end : end + 4], "little")
        want_isize = int.from_bytes(b[end + 4 : end + 8], "little")
        if want_crc != (zlib.crc32(payload) & 0xFFFFFFFF):
            raise ValueError(f"{path}: gzip CRC32 mismatch")
        if want_isize != (len(payload) & 0xFFFFFFFF):
            raise ValueError(f"{path}: gzip ISIZE mismatch "
                             f"({want_isize} != {len(payload)})")
        out.append(payload)
        pos = end + 8
    return out


# -------------------------------------------------------------------------
# HTTP/1.1 response framing (RFC 7230) — WARC response records carry the
# raw HTTP message (Content-Type: application/http;msgtype=response in
# real crawls), so the ingest must parse a status line, header block,
# and EITHER Content-Length framing OR chunked transfer coding (hex
# chunk sizes, optional extensions, trailer section) to recover the
# entity body.
# -------------------------------------------------------------------------


def build_http_response(body: bytes, doc_id: int) -> bytes:
    """Deterministic HTTP/1.1 200 response around ``body``. Every third
    doc uses Content-Length framing; the rest are chunked with
    ``min(doc_id % 4 + 1, len(body))`` data chunks, a chunk extension
    on the first chunk, and an ``X-Len`` trailer — the framing variants
    a real crawl's responses actually mix."""
    status = (b"HTTP/1.1 404 Not Found" if doc_id % 11 == 0
              else b"HTTP/1.1 200 OK")
    head = [status,
            b"Content-Type: text/html; charset=utf-8",
            f"X-Doc-Id: {doc_id}".encode()]
    if doc_id % 3 == 0:
        # half of the Content-Length branch ships the entity
        # gzip-compressed (Content-Encoding) — how real crawl responses
        # arrive; the framing then counts COMPRESSED bytes
        if doc_id % 6 == 3:
            body = gzip_member(body)
            head.append(b"Content-Encoding: gzip")
        head.append(f"Content-Length: {len(body)}".encode())
        return _CRLF.join(head) + _CRLF + _CRLF + body
    head.append(b"Transfer-Encoding: chunked")
    k = min(doc_id % 4 + 1, len(body))
    chunks = []
    if k:
        q, r = divmod(len(body), k)
        off = 0
        for i in range(k):
            n = q + (1 if i < r else 0)
            chunks.append(body[off : off + n])
            off += n
    out = _CRLF.join(head) + _CRLF + _CRLF
    for i, c in enumerate(chunks):
        ext = b";x=1" if i == 0 else b""
        out += f"{len(c):x}".encode() + ext + _CRLF + c + _CRLF
    out += b"0" + _CRLF + f"X-Len: {len(body)}".encode() + _CRLF + _CRLF
    return out


def parse_http_response(b: bytes, path: str = "<bytes>"):
    """Parse one HTTP/1.1 response → (status, body, n_chunks).
    ``n_chunks`` counts data chunks (0 under Content-Length framing).
    Enforces the RFC 7230 framing MUSTs: CRLF line endings, a valid
    status line, hex chunk sizes (extensions allowed after ``;``),
    exact CRLF after each chunk's data, a last-chunk, and a
    CRLF-terminated trailer section. Raises ValueError with the path
    on any defect."""
    eol = b.find(_CRLF)
    if eol < 0:
        raise ValueError(f"{path}: unterminated HTTP status line")
    parts = b[:eol].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/1."):
        raise ValueError(f"{path}: bad HTTP status line {b[:eol]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError(f"{path}: non-numeric HTTP status {parts[1]!r}")
    pos = eol + 2
    headers: dict[bytes, bytes] = {}
    while True:
        eol = b.find(_CRLF, pos)
        if eol < 0:
            raise ValueError(f"{path}: unterminated HTTP header block")
        line = b[pos:eol]
        pos = eol + 2
        if not line:
            break
        k, sep, v = line.partition(b":")
        if not sep or not k:
            raise ValueError(f"{path}: malformed HTTP header {line!r}")
        headers[k.strip().lower()] = v.strip()
    te = headers.get(b"transfer-encoding", b"").lower()
    if te == b"chunked":
        body = b""
        n_chunks = 0
        while True:
            eol = b.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(f"{path}: unterminated chunk-size line")
            size_tok = b[pos:eol].split(b";", 1)[0].strip()
            try:
                n = int(size_tok, 16)
            except ValueError:
                raise ValueError(f"{path}: bad chunk size {size_tok!r}")
            pos = eol + 2
            if n == 0:
                break
            if pos + n + 2 > len(b):
                raise ValueError(f"{path}: truncated chunk data")
            body += b[pos : pos + n]
            if b[pos + n : pos + n + 2] != _CRLF:
                raise ValueError(f"{path}: chunk data not CRLF-terminated")
            pos += n + 2
            n_chunks += 1
        # trailer section: header lines until the blank line
        while True:
            eol = b.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(f"{path}: unterminated trailer section")
            line = b[pos:eol]
            pos = eol + 2
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"{path}: malformed trailer {line!r}")
        if pos != len(b):
            raise ValueError(f"{path}: {len(b) - pos} bytes of garbage "
                             "after the last chunk's trailer")
        return status, _content_decode(body, headers, path), n_chunks
    if b"content-length" in headers:
        try:
            n = int(headers[b"content-length"])
        except ValueError:
            raise ValueError(f"{path}: non-numeric Content-Length")
        if n < 0 or pos + n != len(b):
            raise ValueError(f"{path}: Content-Length {n} does not match "
                             f"remaining {len(b) - pos} bytes")
        return status, _content_decode(b[pos : pos + n], headers, path), 0
    raise ValueError(f"{path}: response without Content-Length or "
                     "chunked framing")


def _content_decode(body: bytes, headers: dict, path: str) -> bytes:
    """Apply Content-Encoding to the de-framed bytes (RFC 7231 §3.1.2):
    ``gzip`` inflates through the same verified member walk as the
    .warc.gz container (single member required); ``identity``/absent
    passes through; anything else is an attributable reject."""
    ce = headers.get(b"content-encoding", b"identity").lower()
    if ce in (b"identity", b""):
        return body
    if ce == b"gzip":
        members = split_gzip_members(body, f"{path} (entity)")
        if len(members) != 1:
            raise ValueError(
                f"{path}: gzip entity holds {len(members)} members")
        return members[0]
    raise ValueError(f"{path}: unsupported Content-Encoding {ce!r}")


def try_scan_warc_gz(payload: bytes):
    """Fuzz-contract wrapper over the full three-layer scan (gzip
    members → WARC records → HTTP responses): returns the framing
    census rows, or None on any defect — never raises. The SOURCE path
    (read_warc_gz) deliberately raises instead: an ingest failure must
    be attributable, whereas the fuzz contract is reject-never-crash."""
    try:
        rows = []
        for member in split_gzip_members(payload):
            for d, u, _n, block in decode_warc_bytes(member):
                st, body, k = parse_http_response(block)
                rows.append((d, u, st, k, len(body)))
        return rows
    except ValueError:
        return None


def write_warc_gz_dataset(df: DataFrame, out_dir: str,
                          n_files: int = 4) -> None:
    """One ``.warc.gz`` file per partition, ONE GZIP MEMBER PER RECORD
    (the Common Crawl layout — member boundaries are the split points a
    distributed reader fans out on). Each record's payload is a full
    HTTP/1.1 response (chunked or Content-Length framed) wrapping the
    document text. ``df`` must carry (doc_id, text)."""
    sel = df.select("doc_id", "text")

    def _write(pid: int, it):
        shard = f"part-{pid:05d}.warc.gz"
        # append member-by-member: bytes `out += member` is O(shard²)
        # across tens of thousands of members (the 2M-doc rehearsal
        # measured the cliff) — stream to the file and track the offset.
        # The file is opened lazily on the FIRST record: an empty
        # partition (rows < n_files) must not leave a 0-byte .warc.gz
        # behind, because split_gzip_members rejects an empty stream —
        # the writer's output stays readable by its own walker for any
        # consumer, not just listings that skip zero-length files.
        cdx_lines = []
        offset = 0
        f = None
        try:
            for r in it:
                doc_id, text = int(r[0]), r[1]
                if f is None:
                    f = open(os.path.join(out_dir, shard), "wb")
                http = build_http_response(text.encode("utf-8"), doc_id)
                rec = build_warc_record(doc_id, "")  # reuse header framing
                # swap the placeholder payload for the HTTP message and
                # fix the declared type + length
                rec = rec.replace(b"Content-Type: text/plain",
                                  b"Content-Type: application/http;"
                                  b"msgtype=response")
                rec = rec.replace(
                    b"Content-Length: 0",
                    b"Content-Length: " + str(len(http)).encode())
                rec = rec[: -4] + http + _CRLF + _CRLF
                fname = (f"rec-{doc_id}.warc".encode()
                         if doc_id % 5 == 0 else None)
                member = gzip_member(rec, fname=fname,
                                     fhcrc=doc_id % 7 == 0)
                # CDX sidecar line: one index row per member with its
                # exact byte extent — the random-access contract
                cdx_lines.append(
                    f"http://example.com/doc/{doc_id} {doc_id} {shard} "
                    f"{offset} {len(member)}")
                f.write(member)
                offset += len(member)
        finally:
            if f is not None:
                f.close()
        if cdx_lines:
            with open(
                    os.path.join(out_dir, shard[: -len(".warc.gz")] + ".cdx"),
                    "w") as cf:
                cf.write("\n".join(cdx_lines) + "\n")
        return iter(())

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    sel.repartition(n_files).rdd.mapPartitionsWithIndex(_write).count()


def read_cdx(spark: SparkSession, path_glob: str) -> DataFrame:
    """The CDX sidecar index → (target_uri, doc_id, shard, offset,
    length): one row per gzip member with its exact byte extent in its
    shard. This is how the public crawl corpora support random access —
    a consumer resolves URIs through the (tiny) index and range-reads
    ONLY the members it wants instead of inflating whole shards."""
    lines = spark.read.text(path_glob)
    c = F.split(F.col("value"), " ")
    return lines.select(
        c.getItem(0).alias("target_uri"),
        c.getItem(1).cast("long").alias("doc_id"),
        c.getItem(2).alias("shard"),
        c.getItem(3).cast("long").alias("offset"),
        c.getItem(4).cast("long").alias("length"),
    )


def fetch_warc_members(index: DataFrame, base_dir: str) -> DataFrame:
    """Indexed random access: for each index row, seek to the member's
    byte extent in its shard, inflate JUST that member, and decode the
    record + HTTP response. Reads exactly sum(length) bytes of payload
    data regardless of shard sizes — the point of the CDX layout (on
    object storage this seek becomes an HTTP Range request). Extent
    defects (member not ending exactly at offset+length, or any framing
    violation inside it) raise with shard and offset."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("target_uri", StringType(), True),
            StructField("http_status", LongType(), True),
            StructField("content_length", LongType(), True),
            StructField("text", StringType(), True),
        ]
    )

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # one open handle per shard per Arrow batch (not per row):
            # a large picked set against few shards would otherwise pay
            # O(rows) opens — same batch-scoped cache pattern as the
            # robots.txt fetcher
            handles: dict = {}
            try:
                for shard, off, ln in zip(pdf["shard"], pdf["offset"],
                                          pdf["length"]):
                    where = f"{shard}@{off}+{ln}"
                    f = handles.get(shard)
                    if f is None:
                        f = handles[shard] = open(
                            os.path.join(base_dir, shard), "rb")
                    f.seek(int(off))
                    raw = f.read(int(ln))
                    if len(raw) != ln:
                        raise ValueError(
                            f"{where}: extent past end of shard")
                    members = split_gzip_members(raw, where)
                    if len(members) != 1:
                        raise ValueError(
                            f"{where}: extent holds {len(members)} members")
                    for d, u, _n, block in decode_warc_bytes(
                            members[0], where):
                        st, body, _k = parse_http_response(block, where)
                        rows.append(
                            (d, u, st, len(body), _entity_text(body)))
            finally:
                for f in handles.values():
                    f.close()
            yield pd.DataFrame(
                rows, columns=["doc_id", "target_uri", "http_status",
                               "content_length", "text"])

    return index.select("shard", "offset", "length").mapInPandas(
        _fetch, schema)


def _entity_text(body: bytes) -> str | None:
    """Entity bytes → text, or None when the payload is not UTF-8 —
    charset variety is a DATA property of a real crawl, not a framing
    defect, so it must not kill the ingest (framing/CRC defects still
    raise). Byte-level consumers key on content_length."""
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return None


def read_warc_gz(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan → gzip member split → WARC record walk → HTTP
    response parse → one row per record: (doc_id, target_uri,
    http_status, n_chunks, content_length, text). ``content_length`` is
    the ENTITY byte count (after de-chunking), not the WARC block
    length. Map-only: per-file independent, nothing driver-side."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("target_uri", StringType(), True),
            StructField("http_status", LongType(), True),
            StructField("n_chunks", LongType(), True),
            StructField("content_length", LongType(), True),
            StructField("text", StringType(), True),
        ]
    )
    files = spark.read.format("binaryFile").load(path_glob)

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for member in split_gzip_members(bytes(content), path):
                    for d, u, _n, block in decode_warc_bytes(member, path):
                        st, body, k = parse_http_response(block, path)
                        rows.append((d, u, st, k, len(body),
                                     _entity_text(body)))
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "target_uri", "http_status",
                             "n_chunks", "content_length", "text"],
                )

    return files.select("path", "content").mapInPandas(_dec, schema)


def read_warc_gz_stream(spark: SparkSession, path_glob: str,
                        **source_options) -> DataFrame:
    """Continuous-ingest twin of :func:`read_warc_gz`: a Structured
    Streaming ``binaryFile`` tail over a landing directory — new
    .warc.gz shards are picked up per micro-batch and flow through the
    SAME three-layer record walk (one code path for batch backfill and
    streaming tail, the lambda-architecture collapse Structured
    Streaming exists for). Append-only, no state, exactly-once per
    shard under checkpointing."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("target_uri", StringType(), True),
            StructField("http_status", LongType(), True),
            StructField("n_chunks", LongType(), True),
            StructField("content_length", LongType(), True),
            StructField("text", StringType(), True),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .options(**source_options)
        .load(path_glob)
    )

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for member in split_gzip_members(bytes(content), path):
                    for d, u, _n, block in decode_warc_bytes(member, path):
                        st, body, k = parse_http_response(block, path)
                        rows.append((d, u, st, k, len(body),
                                     _entity_text(body)))
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "target_uri", "http_status",
                             "n_chunks", "content_length", "text"],
                )

    return files.select("path", "content").mapInPandas(_dec, schema)


def write_warc_dataset(df: DataFrame, out_dir: str, n_files: int = 4) -> None:
    """One .warc file per partition, written executor-side.
    ``df`` must carry (doc_id, text)."""
    sel = df.select("doc_id", "text")

    def _write(pid: int, it):
        rows = [(int(r[0]), r[1]) for r in it]
        with open(os.path.join(out_dir, f"part-{pid:05d}.warc"), "wb") as f:
            f.write(write_warc_bytes(rows))
        return iter(())

    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    sel.repartition(n_files).rdd.mapPartitionsWithIndex(_write).count()


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan → Arrow mapInPandas record walk → one row per
    WARC record (doc_id, target_uri, content_length, text)."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("target_uri", StringType(), True),
            StructField("content_length", LongType(), True),
            StructField("text", StringType(), True),
        ]
    )
    files = spark.read.format("binaryFile").load(path_glob)

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                recs = decode_warc_bytes(bytes(content), path)
                yield pd.DataFrame(
                    [(d, u, n, body.decode("utf-8"))
                     for d, u, n, body in recs],
                    columns=["doc_id", "target_uri", "content_length",
                             "text"],
                )

    return files.select("path", "content").mapInPandas(_dec, schema)
