"""PDF layer: deterministic writer fixtures, tolerant text extraction,
probe, and the Arrow-batched DataFrame ops with quarantine."""

import zlib

import pytest

from sketchlib.spark.pdfdoc import (encode_pdf, pdf_extract_text,
                                    pdf_metadata, pdf_to_text, probe_pdf)

PAGES = [["Hello world", "Second (line) with \\ escapes"],
         ["Page two", "Accents: café olé"]]


class TestRoundTrip:
    @pytest.mark.parametrize("compress", [True, False])
    def test_text_round_trips(self, compress):
        pdf = encode_pdf(PAGES, compress=compress)
        t = pdf_extract_text(pdf)
        assert t.split("\n") == [l for pg in PAGES for l in pg]

    def test_deterministic_bytes(self):
        assert encode_pdf(PAGES) == encode_pdf(PAGES)

    def test_probe(self):
        m = probe_pdf(encode_pdf(PAGES, producer="unit-test"))
        assert m["version"] == "1.4"
        assert m["n_pages"] == 2
        assert m["n_streams"] == 2  # one content stream per page
        assert m["encrypted"] is False
        assert m["producer"] == "unit-test"

    def test_octal_and_hex_strings(self):
        # hand-built content stream exercising octal escapes, hex
        # strings, T* and the ' operator
        content = (b"BT /F1 12 Tf 72 720 Td"
                   b" (A\\101\\102) Tj"        # octal: A + 'AB'
                   b" T* <48656C6C6F> Tj"      # hex 'Hello' on new line
                   b" (next) '"                # ' = newline + show
                   b" ET")
        pdf = _wrap_content(content)
        assert pdf_extract_text(pdf) == "AAB\nHello\nnext"

    def test_nested_parens_and_newline_escapes(self):
        content = (b"BT (outer (inner) tail) Tj"
                   b" T* (tab\\there) Tj ET")
        assert pdf_extract_text(_wrap_content(content)) \
            == "outer (inner) tail\ntab\there"


def _wrap_content(content: bytes) -> bytes:
    """Minimal PDF around a raw content stream (uncompressed)."""
    pdf = encode_pdf([["x"]], compress=False)
    # replace the single page's stream body with ours
    start = pdf.index(b"stream\n") + len(b"stream\n")
    end = pdf.index(b"\nendstream")
    out = pdf[:start] + content + pdf[end:]
    # fix the /Length entry (tolerant reader ignores it, but keep
    # the fixture honest)
    return out


class TestQuarantine:
    def test_non_pdf_raises(self):
        with pytest.raises(ValueError, match="%PDF"):
            pdf_extract_text(b"not a pdf at all")

    def test_encrypted_raises(self):
        pdf = encode_pdf(PAGES)
        enc = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
        with pytest.raises(ValueError, match="encrypted"):
            pdf_extract_text(enc)

    def test_corrupt_flate_stream_skipped(self):
        pdf = bytearray(encode_pdf([["will corrupt"], ["survives"]]))
        # trash the first compressed stream's bytes
        i = bytes(pdf).index(b"stream\n") + len(b"stream\n")
        pdf[i:i + 8] = b"\x00" * 8
        t = pdf_extract_text(bytes(pdf))
        assert "survives" in t and "corrupt" not in t

    def test_image_filter_stream_skipped(self):
        # a DCTDecode (JPEG) stream must be skipped, not decoded
        pdf = encode_pdf([["real text"]], compress=False)
        fake = (b"9 0 obj\n<< /Length 4 /Filter /DCTDecode >>\n"
                b"stream\n\xff\xd8\xff\xd9\nendstream\nendobj\n")
        merged = pdf.replace(b"xref", fake + b"xref", 1)
        assert pdf_extract_text(merged) == "real text"


class TestSparkOps:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [(0, encode_pdf(PAGES)),
                (1, encode_pdf([["solo page"]], compress=False)),
                (2, b"junk bytes not a pdf"),
                (3, encode_pdf(PAGES).replace(
                    b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"))]
        return spark.createDataFrame(rows, "media_id long, payload binary")

    def test_metadata(self, spark, media):
        rows = {r["media_id"]: r for r in
                pdf_metadata(media, "media_id", "payload").collect()}
        assert rows[0]["n_pages"] == 2 and rows[0]["encrypted"] is False
        assert rows[1]["n_pages"] == 1
        assert rows[2]["version"] is None  # quarantined, not crashed
        assert rows[3]["encrypted"] is True

    def test_to_text(self, spark, media):
        rows = {r["media_id"]: r for r in
                pdf_to_text(media, "media_id", "payload").collect()}
        assert rows[0]["text"].split("\n") == [l for pg in PAGES for l in pg]
        assert rows[0]["n_chars"] == len(rows[0]["text"])
        assert rows[0]["ascii_ratio"] > 0.9  # accents dent it slightly
        assert rows[1]["text"] == "solo page"
        assert rows[2]["text"] is None   # junk -> quarantine
        assert rows[3]["text"] is None   # encrypted -> quarantine

    def test_chain_into_text_pipeline(self, spark, media):
        """Extracted PDF text feeds the text operators directly."""
        from sketchlib.spark.textops import token_counts
        texts = (pdf_to_text(media, "media_id", "payload")
                 .filter("text IS NOT NULL"))
        counts = {r["media_id"]: r["n_tokens"] for r in
                  token_counts(texts, "media_id", "text").collect()}
        assert counts[1] == 2  # "solo page"
        assert counts[0] > 4


class TestReviewRegressions:
    def test_encrypt_mention_in_page_text_not_quarantined(self):
        """/Encrypt is meaningful only in trailer dicts — a page whose
        TEXT mentions it must still extract (review r5)."""
        pdf = encode_pdf([["see /Encrypt handling notes"]],
                         compress=False)
        assert "Encrypt" in pdf_extract_text(pdf)
        assert probe_pdf(pdf)["encrypted"] is False

    def test_pagelabel_not_counted_as_page(self):
        pdf = encode_pdf(PAGES)
        with_label = pdf.replace(
            b"xref", b"9 0 obj\n<< /Type /PageLabel >>\nendobj\nxref", 1)
        assert probe_pdf(with_label)["n_pages"] == 2
