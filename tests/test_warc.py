"""WARC ingestion: writer/parser round trip, framing soundness,
truncation tolerance, and the distributed end-to-end chain
WARC -> html_to_text -> tokens (the north-star pipeline's front)."""

import gzip

import pyspark.sql.functions as F
import pytest

from sketchlib.io.warc import (http_body, iter_warc_records, read_warc,
                               write_warc_gz)


def _recs(n=3):
    return [{"url": f"http://site{i}.example/p/{i}",
             "date": f"2024-01-0{i + 1}T00:00:00Z",
             "body": (f"<html><body><p>page {i} words here"
                      f"</p></body></html>").encode()}
            for i in range(n)]


class TestRoundTrip:
    @pytest.mark.parametrize("gz", [True, False])
    def test_records_round_trip(self, gz):
        blob = write_warc_gz(_recs(), gzip_per_record=gz)
        out = list(iter_warc_records(blob))
        assert len(out) == 3
        for i, rec in enumerate(out):
            assert rec["headers"]["warc-target-uri"].endswith(f"/p/{i}")
            hh, body = http_body(rec["block"])
            assert hh["content-type"] == "text/html"
            assert f"page {i}".encode() in body

    def test_deterministic(self):
        assert write_warc_gz(_recs()) == write_warc_gz(_recs())

    def test_body_containing_warc_magic_framed_correctly(self):
        """Content-Length framing: a body containing the literal
        'WARC/1.0' record magic must not split the record."""
        evil = [{"url": "http://x.example/a",
                 "date": "2024-01-01T00:00:00Z",
                 "body": b"<p>quote: WARC/1.0\r\nWARC-Type: fake</p>"},
                {"url": "http://x.example/b",
                 "date": "2024-01-01T00:00:00Z", "body": b"<p>next</p>"}]
        out = list(iter_warc_records(write_warc_gz(evil)))
        assert len(out) == 2
        assert b"quote: WARC/1.0" in http_body(out[0]["block"])[1]

    def test_truncated_tail_stops_cleanly(self):
        blob = write_warc_gz(_recs(), gzip_per_record=False)
        cut = blob[: len(blob) - 40]  # clip into the final record
        out = list(iter_warc_records(cut))
        assert len(out) == 2  # complete records survive, no exception

    def test_non_response_records(self):
        recs = [{"url": "http://x.example/", "type": "warcinfo",
                 "date": "2024-01-01T00:00:00Z", "body": b"robots: ok"}]
        out = list(iter_warc_records(write_warc_gz(recs)))
        assert out[0]["headers"]["warc-type"] == "warcinfo"
        # a non-HTTP block passes through untouched
        assert http_body(out[0]["block"]) == ({}, b"robots: ok")


class TestSparkSource:
    @pytest.fixture(scope="class")
    def warc_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("warcs")
        (d / "part-0.warc.gz").write_bytes(write_warc_gz(_recs(3)))
        more = _recs(2)
        more[1]["type"] = "request"  # filtered by response_only
        (d / "part-1.warc.gz").write_bytes(write_warc_gz(more))
        (d / "part-2.warc.gz").write_bytes(b"\x1f\x8b junk not gzip")
        return str(d)

    def test_read_warc_files_in_parallel(self, spark, warc_dir):
        df = read_warc(spark, warc_dir)
        rows = df.collect()
        # 3 + 1 response records; the junk file yields zero rows
        assert len(rows) == 4
        assert {r["rec_type"] for r in rows} == {"response"}
        assert all(r["http_status"] == 200 for r in rows)
        assert all(r["warc_ts"] is not None for r in rows)
        files = {r["warc_file"] for r in rows}
        assert len(files) == 2  # both good files contributed

    def test_end_to_end_into_text_pipeline(self, spark, warc_dir):
        """The north-star front half: WARC -> html -> text -> tokens,
        with the extracted text matching the authored page text."""
        from sketchlib.spark.textops import html_to_text, token_counts
        pages = read_warc(spark, warc_dir)
        texts = html_to_text(pages, "html")
        rows = {r["url"]: r["text_extracted"] for r in texts.collect()}
        assert rows["http://site0.example/p/0"] == "page 0 words here"
        counts = token_counts(
            texts.select("url", F.col("text_extracted").alias("text")),
            "url", "text").collect()
        assert all(r["n_tokens"] == 4 for r in counts)


def test_cli_pipeline_over_warc(tmp_path):
    """The complete crawl-to-sketch command: python -m sketchlib
    pipeline over a .warc.gz, extracting html and sketching the
    extracted text per a derived group."""
    import os
    import subprocess
    import sys
    recs = []
    for i in range(40):
        host = "a.example" if i % 2 else "b.example"
        recs.append({"url": f"http://{host}/p/{i}",
                     "date": "2024-01-01T00:00:00Z",
                     "body": (f"<html><body><p>doc {i} token{i} body"
                              f"</p></body></html>").encode()})
    src = tmp_path / "crawl.warc.gz"
    src.write_bytes(write_warc_gz(recs))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    out = subprocess.run(
        [sys.executable, "-m", "sketchlib", "pipeline",
         "--input", str(src), "--group", "rec_type",
         "--extract-html", "html", "--key", "text_extracted",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env)
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-800:])
    assert "measured_fpr" in out.stdout


class TestReviewRegressions:
    """Round-5 second review pass."""

    def test_naive_warc_date_is_utc_not_machine_local(self, spark,
                                                      tmp_path):
        """A spec-violating timezone-naive WARC-Date must ingest as
        UTC — machine-local interpretation breaks cross-run
        determinism."""
        d = tmp_path / "w"
        d.mkdir()
        recs = [{"url": "http://x.example/", "body": b"<p>x</p>",
                 "date": "2024-06-01T12:00:00"}]  # no Z/offset
        (d / "a.warc.gz").write_bytes(write_warc_gz(recs))
        row = read_warc(spark, str(d)).first()
        assert row["warc_ts"].hour == 12  # session TZ is pinned UTC

    def test_chunked_transfer_encoding_decoded(self):
        body = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
        block = (b"HTTP/1.1 200 OK\r\n"
                 b"Transfer-Encoding: chunked\r\n\r\n" + body)
        hh, out = http_body(block)
        assert out == b"hello world"

    def test_gzip_content_encoding_decoded(self):
        payload = gzip.compress(b"<p>compressed page</p>")
        block = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
                 + payload)
        assert http_body(block)[1] == b"<p>compressed page</p>"

    def test_undecodable_encoding_quarantines(self):
        block = (b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n"
                 b"\x00\x01brotli-bytes")
        assert http_body(block)[1] is None
        bad_chunk = (b"HTTP/1.1 200 OK\r\n"
                     b"Transfer-Encoding: chunked\r\n\r\nZZZ\r\nx")
        assert http_body(bad_chunk)[1] is None

    def test_mixed_case_status_line_headers_stripped(self):
        block = (b"Http/1.1 404 Not Found\r\n"
                 b"Content-Type: text/html\r\n\r\n<p>gone</p>")
        hh, body = http_body(block)
        assert hh["content-type"] == "text/html"
        assert body == b"<p>gone</p>"

    def test_garbled_content_length_resyncs_not_drops_tail(self):
        blob = bytearray(write_warc_gz(_recs(3), gzip_per_record=False))
        # corrupt record 1's Content-Length value (WARC header, not HTTP)
        i = bytes(blob).index(b"Content-Length: ",
                              bytes(blob).index(b"/p/1"))
        j = bytes(blob).index(b"\r", i)
        blob[i + len(b"Content-Length: "):j] = b"XX".ljust(
            j - i - len(b"Content-Length: "), b"X")
        out = list(iter_warc_records(bytes(blob)))
        urls = [r["headers"]["warc-target-uri"] for r in out]
        # record 1 lost, record 2 RECOVERED via resync
        assert any(u.endswith("/p/0") for u in urls)
        assert any(u.endswith("/p/2") for u in urls)
