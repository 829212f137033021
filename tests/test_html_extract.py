"""html_to_text: deterministic visible-text extraction (the pipeline's
first step; BASELINE.json input_hint invariant — byte-identical
extracted text per page across runs/parallelism)."""

import pyspark.sql.functions as F
import pytest

from sketchlib.spark.textops import html_to_text


def _extract(spark, html_rows):
    df = spark.createDataFrame([(i, h) for i, h in enumerate(html_rows)],
                               "i long, html string")
    return [r["text_extracted"] for r in
            html_to_text(df, "html").orderBy("i").collect()]


CASES = [
    # (html, expected)
    ("<html><body><p>Hello world</p></body></html>", "Hello world"),
    # script/style/comment content is never visible text
    ("<p>keep</p><script>var x = '<p>no</p>';</script><p>also</p>",
     "keep\nalso"),
    ("<style>p { color: red }</style>text", "text"),
    ("before<!-- secret <p>x</p> -->after", "before after"),
    # block boundaries become newlines; inline tags become spaces
    ("<div>a</div><div>b</div>", "a\nb"),
    ("line one<br>line two", "line one\nline two"),
    ("a<b>bold</b>c", "a bold c"),
    ("<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
    # entities
    ("fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
     "fish & chips <tag> \"q\" 's' end"),
    # double-encoded text does not over-decode (&amp; handled last)
    ("&amp;lt;", "&lt;"),
    # attributes with '>' inside quotes are NOT handled (documented
    # conservative regex) — but plain attributes are
    ('<a href="http://x.example/p">link</a>', "link"),
    # whitespace canonicalization
    ("a   b\t\tc", "a b c"),
    ("<p>x</p>\n\n\n\n<p>y</p>", "x\ny"),
    # upper-case tags, multiline elements
    ("<SCRIPT>\nnope\n</SCRIPT><P>ok</P>", "ok"),
    ("", ""),
]


def test_extraction_table(spark):
    got = _extract(spark, [h for h, _ in CASES])
    for (src, want), g in zip(CASES, got):
        assert g == want, (src, g, want)


def test_null_and_binary_input(spark):
    df = spark.createDataFrame(
        [(0, "<p>from binary</p>".encode()), (1, None),
         (2, "café <i>ole</i>".encode("utf-8"))],
        "i long, html binary")
    rows = {r["i"]: r["text_extracted"] for r in
            html_to_text(df, "html").collect()}
    assert rows[0] == "from binary"
    assert rows[1] is None
    assert rows[2] == "café ole"


def test_roundtrip_invariant_byte_identical(spark, pages_tiny):
    """Wrap each page's text in an html template; extraction must
    return the EXACT original text bytes (the input_hint per-row
    invariant), and the mapping must be identical across different
    partitionings (parallelism levels)."""
    wrapped = pages_tiny.select(
        "url", "text",
        F.concat(
            F.lit("<html><head><title>t</title>"
                  "<style>body{margin:0}</style></head><body><p>"),
            # texts in the fixture are single-line token strings —
            # entity-escape the ampersands the template would eat
            F.regexp_replace("text", "&", "&amp;"),
            F.lit("</p><script>var a=1;</script></body></html>"),
        ).alias("html"))
    one = {r["url"]: r["text_extracted"] for r in
           html_to_text(wrapped.coalesce(1), "html").collect()}
    many = {r["url"]: r["text_extracted"] for r in
            html_to_text(wrapped.repartition(7), "html").collect()}
    orig = {r["url"]: r["text"] for r in wrapped.collect()}
    assert one == many  # parallelism-independent
    for url, text in orig.items():
        assert one[url] == text, url  # byte-identical round trip


def test_plan_is_jvm_only(spark, pages_tiny):
    df = html_to_text(
        pages_tiny.select(F.col("text").alias("html")), "html")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString() \
        .split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_cli_pipeline_with_html_extraction(tmp_path):
    """python -m sketchlib pipeline --extract-html: the pages-table
    flow end-to-end — html in, per-group Bloom over the EXTRACTED
    text, zero false negatives."""
    import os
    import subprocess
    import sys
    import pandas as pd
    rows = []
    for i in range(60):
        lang = "en" if i % 2 else "fr"
        text = f"doc {i} body words {i * 7}"
        rows.append((lang, f"u{i}",
                     f"<html><head><title>x</title></head><body><p>"
                     f"{text}</p></body></html>"))
    src = tmp_path / "pages.tsv"
    pd.DataFrame(rows, columns=["lang", "url", "html"]).to_csv(
        src, sep="\t", index=False)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "sketchlib", "pipeline",
         "--input", str(src), "--group", "lang",
         "--extract-html", "html", "--key", "text_extracted",
         "--cpus", "4"],
        capture_output=True, text=True, timeout=300,
        cwd=env["PYTHONPATH"], env=env)
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-800:])
    assert "calibration" in out.stdout and "measured_fpr" in out.stdout
