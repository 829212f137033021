"""PDF document support — stdlib-only, from scratch (like the
JPEG/PNG/MP4/MP3 layers): a deterministic minimal WRITER for fixtures,
a tolerant text EXTRACTOR of the kind crawl pipelines run (PDFs are a
large share of non-HTML crawl documents), a metadata PROBE, and the
Arrow-batched DataFrame ops with the usual per-row quarantine.

Honest scope: the extractor handles the text-showing operators of
uncompressed and FlateDecode content streams (Tj, TJ arrays, ' and "
with literal-string escapes, octal escapes, and hex strings) plus
BT/ET + Td/TD/T* line-break heuristics — which covers digitally-born
text PDFs, the kind worth extracting at crawl scale. It does NOT
implement font CMaps (ToUnicode), so PDFs whose fonts use non-standard
encodings extract garbled text (flagged via the ascii_ratio metadata),
and scanned/image PDFs extract empty text — both are quarantine
signals, not crashes. Encrypted PDFs raise ValueError (quarantined by
the DataFrame ops).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (BooleanType, DoubleType, LongType, StringType,
                               StructField, StructType)


# ---------------------------------------------------------------------------
# writer (fixtures): minimal single-font text PDF
# ---------------------------------------------------------------------------

def _esc_pdf_string(s: str) -> bytes:
    out = s.encode("latin-1", "replace")
    return (out.replace(b"\\", b"\\\\")
            .replace(b"(", b"\\(").replace(b")", b"\\)"))


def encode_pdf(pages: list[list[str]], compress: bool = True,
               producer: str = "sketchlib") -> bytes:
    """Minimal valid PDF: one Helvetica font, one content stream per
    page, each page a list of text lines. Deterministic bytes for a
    given input (fixtures; round-trip tested against the extractor)."""
    objs: list[bytes] = []  # 1-indexed

    def ref(i: int) -> bytes:
        return f"{i} 0 R".encode()

    n_pages = len(pages)
    font_id = 3 + 2 * n_pages
    info_id = font_id + 1
    kids = b" ".join(ref(3 + 2 * i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")            # 1
    objs.append(b"<< /Type /Pages /Kids [" + kids +
                f"] /Count {n_pages} >>".encode())               # 2
    for i, lines in enumerate(pages):
        page_id = 3 + 2 * i
        content_id = page_id + 1
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents " + ref(content_id) +
            b" /Resources << /Font << /F1 " + ref(font_id) + b" >> >> >>")
        body = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                body.append(b"0 -14 Td")
            body.append(b"(" + _esc_pdf_string(line) + b") Tj")
        body.append(b"ET")
        stream = b"\n".join(body)
        if compress:
            stream = zlib.compress(stream)
            filt = b" /Filter /FlateDecode"
        else:
            filt = b""
        objs.append(b"<< /Length " + str(len(stream)).encode() + filt +
                    b" >>\nstream\n" + stream + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objs.append(b"<< /Producer (" + _esc_pdf_string(producer) + b") >>")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode() +
            b" /Root 1 0 R /Info " + ref(info_id) + b" >>\nstartxref\n" +
            str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)


# ---------------------------------------------------------------------------
# reader: tolerant text extraction + probe
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
# lookbehind: 'endstream\n' must not count/match as a stream start
_STREAM_RE = re.compile(rb"(?<!end)stream\r?\n")


def _iter_streams(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    """(object dict bytes, raw stream bytes) for every stream object.
    Scans object boundaries rather than trusting the xref table —
    crawl PDFs routinely carry broken xrefs; real extractors scan."""
    for m in _OBJ_RE.finditer(payload):
        start = m.end()
        sm = _STREAM_RE.search(payload, start)
        if sm is None:
            break
        # the dict sits between 'obj' and 'stream'; an object WITHOUT
        # a stream ends at 'endobj' before the next stream keyword
        endobj = payload.find(b"endobj", start)
        if endobj != -1 and endobj < sm.start():
            continue
        head = payload[start:sm.start()]
        end = payload.find(b"endstream", sm.end())
        if end == -1:
            break
        data = payload[sm.end():end]
        # writers pad with \r?\n before 'endstream'
        if data.endswith(b"\n"):
            data = data[:-1]
        if data.endswith(b"\r"):
            data = data[:-1]
        yield head, data


def _decode_stream(head: bytes, data: bytes) -> bytes | None:
    """Decompressed content bytes, or None when undecodable/unsupported
    (image streams, exotic filters) — quarantine, not crash."""
    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(data)
        except zlib.error:
            return None
    if b"/Filter" in head:
        return None  # DCTDecode (embedded JPEG) etc.: not text
    return data


_ESCAPES = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
            ord("b"): b"\b", ord("f"): b"\f", ord("("): b"(",
            ord(")"): b")", ord("\\"): b"\\"}


def _scan_text_ops(content: bytes) -> str:
    """Pull shown text out of one content stream: literal strings
    ((...) with escapes/octal/nesting), hex strings (<...>), the Tj /
    TJ / ' / \" operators, and BT/ET + Td/TD/T* as line breaks."""
    out: list[bytes] = []
    i, n = 0, len(content)
    pending: bytes | None = None  # last string, waiting for its operator

    def emit(op_newline: bool) -> None:
        nonlocal pending
        if pending is not None:
            out.append(pending)
            pending = None
        if op_newline and out and out[-1] != b"\n":
            out.append(b"\n")

    while i < n:
        c = content[i]
        if c == 0x28:  # '(' literal string
            i += 1
            depth, buf = 1, bytearray()
            while i < n and depth:
                ch = content[i]
                if ch == 0x5C and i + 1 < n:  # backslash
                    nxt = content[i + 1]
                    if 0x30 <= nxt <= 0x37:  # octal \ddd
                        j = i + 1
                        oct_digits = bytearray()
                        while j < n and len(oct_digits) < 3 \
                                and 0x30 <= content[j] <= 0x37:
                            oct_digits.append(content[j])
                            j += 1
                        buf.append(int(oct_digits.decode(), 8) & 0xFF)
                        i = j
                        continue
                    buf += _ESCAPES.get(nxt, bytes([nxt]))
                    i += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if not depth:
                        i += 1
                        break
                buf.append(ch)
                i += 1
            if pending is not None:
                out.append(pending)
            pending = bytes(buf)
            continue
        if c == 0x3C and i + 1 < n and content[i + 1] != 0x3C:  # '<' hex
            j = content.find(b">", i + 1)
            if j == -1:
                break
            hx = re.sub(rb"\s", b"", content[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            try:
                if pending is not None:
                    out.append(pending)
                pending = bytes.fromhex(hx.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                pending = None
            i = j + 1
            continue
        if c in (0x54, 0x27, 0x22, 0x45):  # T / ' / " / E
            tok = content[i:i + 2]
            if tok == b"Tj":
                emit(False)
                i += 2
                continue
            if tok == b"TJ":
                emit(False)
                i += 2
                continue
            if c == 0x27 or c == 0x22:  # ' and ": show on NEW line
                if out and out[-1] != b"\n":
                    out.append(b"\n")
                emit(False)
                i += 1
                continue
            if tok in (b"Td", b"TD"):
                emit(True)
                i += 2
                continue
            if tok == b"T*":
                emit(True)
                i += 2
                continue
            if tok == b"ET":
                emit(True)
                i += 2
                continue
        i += 1
    text = b"".join(out)
    # latin-1 never fails; non-text bytes surface in ascii_ratio
    return text.decode("latin-1").strip("\n")


def _is_encrypted(payload: bytes) -> bool:
    """/Encrypt is meaningful only inside a trailer dictionary or an
    xref-stream dict (PDF 1.5+ files may have NO 'trailer' keyword) —
    a page whose TEXT mentions '/Encrypt' must not quarantine the
    document, so scan only the regions after each 'trailer' keyword
    and after each '/Type /XRef' cross-reference-stream dict marker
    (ADVICE r5: trailer-only coverage missed xref-stream-encrypted
    files, which then emitted garbled latin-1 instead of
    quarantining)."""
    for m in re.finditer(rb"trailer", payload):
        if b"/Encrypt" in payload[m.end():m.end() + 512]:
            return True
    for m in re.finditer(rb"/Type\s*/XRef\b", payload):
        # scan the enclosing dict region around the marker: /Encrypt
        # may precede or follow /Type within the same dictionary
        lo = max(0, m.start() - 512)
        if b"/Encrypt" in payload[lo:m.end() + 512]:
            return True
    return False


def pdf_extract_text(payload: bytes) -> str:
    """Visible text of a (digitally-born) PDF, pages in document
    order, lines separated by newlines. ValueError on non-PDF or
    encrypted payloads; undecodable streams are skipped."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    if _is_encrypted(payload):
        raise ValueError("encrypted PDF (no decryption support)")
    parts = []
    for head, data in _iter_streams(payload):
        content = _decode_stream(head, data)
        if content is None or b"BT" not in content:
            continue
        t = _scan_text_ops(content)
        if t:
            parts.append(t)
    return "\n".join(parts)


def probe_pdf(payload: bytes) -> dict:
    """Cheap header/structure probe: {version, n_pages, encrypted,
    n_streams, producer}. ValueError on non-PDF."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    version = payload[5:8].decode("latin-1", "replace")
    # \b: match /Page but not /Pages or /PageLabel (both continue
    # with a word char). Heuristic: literal text inside UNCOMPRESSED
    # content streams could still inflate the count — acceptable for
    # a filter-before-extract probe
    n_pages = len(re.findall(rb"/Type\s*/Page\b(?!s)", payload))
    m = re.search(rb"/Producer\s*\(((?:[^()\\]|\\.)*)\)", payload)
    producer = None
    if m:
        producer = (m.group(1).replace(b"\\(", b"(")
                    .replace(b"\\)", b")").replace(b"\\\\", b"\\")
                    .decode("latin-1", "replace"))
    return {"version": version, "n_pages": int(n_pages),
            "encrypted": _is_encrypted(payload),
            "n_streams": len(_STREAM_RE.findall(payload)),
            "producer": producer}


# ---------------------------------------------------------------------------
# DataFrame ops (Arrow-batched, per-row quarantine)
# ---------------------------------------------------------------------------

def pdf_metadata(df: DataFrame, id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """(media_id, version, n_pages, encrypted, n_streams, producer) —
    the filter-before-extract step; non-PDF payloads yield NULL
    columns (quarantine), never a task failure."""
    sel = df.select(F.col(id_col).cast("long").alias("_id"),
                    F.col(payload_col).alias("_payload"))
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("version", StringType(), True),
        StructField("n_pages", LongType(), True),
        StructField("encrypted", BooleanType(), True),
        StructField("n_streams", LongType(), True),
        StructField("producer", StringType(), True),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            if not len(pdf_):
                continue
            rows = []
            for mid, p in zip(pdf_["_id"], pdf_["_payload"]):
                try:
                    m = probe_pdf(bytes(p))
                    rows.append((mid, m["version"], m["n_pages"],
                                 m["encrypted"], m["n_streams"],
                                 m["producer"]))
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return sel.mapInPandas(fn, schema)


_NON_ASCII_RE = re.compile(r"[^\t\n -~]")


def pdf_to_text(df: DataFrame, id_col: str = "media_id",
                payload_col: str = "payload") -> DataFrame:
    """(media_id, text, n_chars, ascii_ratio) — extracted text per PDF.
    ascii_ratio (printable-ASCII share) is the garbled-font detector: a
    digitally-born latin-script PDF sits near 1.0, a CMap-encoded or
    binary-polluted extraction drops well below — gate on it before
    feeding the corpus. Failed/encrypted/non-PDF rows yield NULL text
    (quarantine)."""
    sel = df.select(F.col(id_col).cast("long").alias("_id"),
                    F.col(payload_col).alias("_payload"))
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("n_chars", LongType(), True),
        StructField("ascii_ratio", DoubleType(), True),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_ in batches:
            if not len(pdf_):
                continue
            rows = []
            for mid, p in zip(pdf_["_id"], pdf_["_payload"]):
                try:
                    t = pdf_extract_text(bytes(p))
                    # C-speed count of chars OUTSIDE printable ASCII
                    n_bad = len(_NON_ASCII_RE.findall(t))
                    ratio = (round((len(t) - n_bad) / len(t), 4)
                             if t else None)
                    rows.append((mid, t, len(t), ratio))
                except (ValueError, zlib.error):
                    rows.append((mid, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return sel.mapInPandas(fn, schema)
