"""WARC (ISO 28500) ingestion — the container Common-Crawl-style web
corpora actually arrive in (the BASELINE.json north star's input is a
table OF such pages; this closes the gap from raw crawl files to that
table). Stdlib-only, same posture as the other from-scratch codecs:
a deterministic writer for fixtures, a record parser, and a
distributed Spark source.

Distribution model: WARC files gzip each record as its own member and
concatenate, which makes a file splittable only at member boundaries
— no cheap mid-file split points without an external index. The
industry pattern (and ours) is FILE-level parallelism: crawl dumps
ship thousands of ~1 GB files, so one task per file saturates any
cluster; ``read_warc`` uses Spark's binaryFile source + one
Arrow-batched parse pass per file. Records that fail to parse are
SKIPPED with a boundary resync, not fatal (a garbled record mid-file
must not cost the file's tail, and a truncated tail must not kill the
task). Known limit: Spark's binaryFile source refuses files over
2 GiB — split larger dumps upstream (crawl convention is ~1 GB/file).
"""

from __future__ import annotations

import gzip
import io as _io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType, TimestampType)

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# writer (fixtures)
# ---------------------------------------------------------------------------

def write_warc_gz(records: list[dict], gzip_per_record: bool = True) -> bytes:
    """Serialize records to WARC bytes — per-record gzip members by
    default (the Common Crawl layout; gzip_per_record=False writes a
    plain uncompressed WARC). Each record dict:
    {url, date (ISO str), body (bytes), type?: 'response'(default),
    http_status?: 200, content_type?: 'text/html'}.
    Deterministic for a given input (fixed record ids, mtime=0)."""
    out = bytearray()
    for i, rec in enumerate(records):
        rtype = rec.get("type", "response")
        body = rec["body"]
        if rtype == "response":
            status = int(rec.get("http_status", 200))
            http = (f"HTTP/1.1 {status} OK\r\n"
                    f"Content-Type: {rec.get('content_type', 'text/html')}"
                    f"\r\nContent-Length: {len(body)}\r\n\r\n"
                    ).encode() + body
        else:
            http = body
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + rtype.encode() + _CRLF +
            b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-"
            + f"{i:012d}".encode() + b">\r\n"
            b"WARC-Date: " + rec["date"].encode() + _CRLF +
            b"WARC-Target-URI: " + rec["url"].encode() + _CRLF +
            # content type must match the record type (ADVICE r5: a
            # request/warcinfo record is not an http response payload)
            (b"Content-Type: application/http; msgtype=" + rtype.encode()
             if rtype in ("response", "request")
             else b"Content-Type: application/warc-fields") + _CRLF +
            b"Content-Length: " + str(len(http)).encode() + _CRLF +
            _CRLF)
        record = head + http + _CRLF + _CRLF
        if gzip_per_record:
            buf = _io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(record)
            out += buf.getvalue()
        else:
            out += record
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def _parse_headers(block: bytes) -> dict:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("latin-1").strip().lower()] = \
                v.decode("latin-1").strip()
    return headers


def iter_warc_records(payload: bytes) -> Iterator[dict]:
    """Yield {headers, block} per record from (possibly gzipped) WARC
    bytes. Walks by Content-Length — the only sound framing (bodies
    legally contain 'WARC/1.0'); a record whose declared length runs
    past the buffer terminates iteration (truncated file tail)."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)  # concatenated members ok
    pos, n = 0, len(payload)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and payload[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not payload.startswith(b"WARC/", pos):
            break
        hdr_end = payload.find(_CRLF + _CRLF, pos)
        if hdr_end == -1:
            break
        headers = _parse_headers(payload[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            # garbled Content-Length mid-file: RESYNC on the next
            # record magic rather than silently dropping every
            # remaining record (a body containing the magic can fool
            # the resync, but this path only runs on corruption —
            # losing one boundary beats losing the file tail)
            nxt = payload.find(b"WARC/", hdr_end)
            if nxt == -1:
                break
            pos = nxt
            continue
        block_start = hdr_end + 4
        if block_start + length > n:
            break  # truncated tail record
        yield {"headers": headers,
               "block": payload[block_start:block_start + length]}
        pos = block_start + length


def _dechunk(body: bytes) -> bytes | None:
    """Decode Transfer-Encoding: chunked framing; None on malformed."""
    out, pos, n = bytearray(), 0, len(body)
    while pos < n:
        eol = body.find(_CRLF, pos)
        if eol == -1:
            return None
        try:
            size = int(body[pos:eol].split(b";")[0], 16)
        except ValueError:
            return None
        if size == 0:
            return bytes(out)
        start = eol + 2
        if start + size > n:
            return None
        out += body[start:start + size]
        pos = start + size + 2  # skip trailing CRLF
    return bytes(out)


def http_body(block: bytes) -> tuple[dict, bytes | None]:
    """(http headers, body) of a response record's block; a block
    without an HTTP header section comes back with empty headers.
    Chunked transfer framing is decoded and gzip content-encoding
    decompressed; a body these DECODERS cannot process returns None
    (quarantine) rather than leaking framing/compressed bytes into
    the html column."""
    if block[:5].upper() != b"HTTP/":
        return {}, block
    sep = block.find(_CRLF + _CRLF)
    if sep == -1:
        return {}, block
    headers = _parse_headers(block[:sep])
    body: bytes | None = block[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    enc = headers.get("content-encoding", "").lower()
    if body is not None and enc in ("gzip", "x-gzip", "deflate"):
        try:
            body = (gzip.decompress(body) if "gzip" in enc
                    else zlib.decompress(body))
        except Exception:
            body = None
    elif enc and enc not in ("identity",):
        body = None  # br etc.: no stdlib decoder -> quarantine
    return headers, body


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------

WARC_SCHEMA = StructType([
    StructField("warc_file", StringType(), False),
    StructField("url", StringType(), True),
    StructField("warc_ts", TimestampType(), True),
    StructField("rec_type", StringType(), True),
    StructField("http_status", LongType(), True),
    StructField("content_type", StringType(), True),
    StructField("html", BinaryType(), True),
])


def read_warc(spark: SparkSession, path: str,
              response_only: bool = True) -> DataFrame:
    """Distributed WARC reader: one parse task per file (binaryFile
    source — see module docstring for why file-level parallelism is
    the right split unit). Output matches the north-star pages shape
    (url, warc_ts, html binary) plus provenance/HTTP columns; chain
    ``textops.html_to_text`` for the text column. Unparseable records
    are skipped (truncated tails), unparseable FILES yield zero rows —
    never a task failure."""
    src = (spark.read.format("binaryFile").load(path)
           .select("path", "content"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    records = iter_warc_records(bytes(content))
                    for rec in records:
                        h = rec["headers"]
                        rtype = h.get("warc-type")
                        if response_only and rtype != "response":
                            continue
                        ts = None
                        raw_ts = h.get("warc-date")
                        if raw_ts:
                            try:
                                dt = datetime.fromisoformat(
                                    raw_ts.replace("Z", "+00:00"))
                                if dt.tzinfo is None:
                                    # spec-violating naive date: WARC
                                    # times are UTC by definition —
                                    # never interpret via machine-
                                    # local tz (determinism)
                                    ts = dt
                                else:
                                    ts = dt.astimezone(timezone.utc) \
                                        .replace(tzinfo=None)
                            except ValueError:
                                pass
                        hh, body = http_body(rec["block"])
                        status = None
                        if rtype == "response" and \
                                rec["block"][:5].upper() == b"HTTP/":
                            try:
                                status = int(
                                    rec["block"].split(b" ", 2)[1])
                            except (IndexError, ValueError):
                                pass
                        rows.append((path_, h.get("warc-target-uri"),
                                     ts, rtype, status,
                                     hh.get("content-type"), body))
                except (OSError, EOFError, ValueError):
                    continue  # unparseable file -> zero rows, no kill
            if rows:
                yield pd.DataFrame(
                    rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return src.mapInPandas(fn, WARC_SCHEMA)
