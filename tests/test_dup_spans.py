"""dup_span_flags: corpus-wide duplicated-span detection (substring
rung of the dedup ladder) — DuckDB cross-check, winnowing guarantee,
plan shape."""

import duckdb
import pyspark.sql.functions as F
import pytest

from sketchlib.spark.textops import dup_span_flags


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_boilerplate_flags_both_docs(spark):
    boiler = " ".join(f"b{i}" for i in range(10))
    docs = _docs(spark, [
        (1, "alpha beta " + boiler + " gamma delta"),
        (2, "uno dos tres " + boiler + " quatro"),
        (3, " ".join(f"u{i}" for i in range(20))),  # all-unique doc
    ])
    out = {r["doc_id"]: r for r in
           dup_span_flags(docs, "doc_id", "text",
                          span_tokens=10).collect()}
    assert out[1]["n_dup_spans"] >= 1 and out[2]["n_dup_spans"] >= 1
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_frac"] == 0.0
    # the flagged windows are exactly the boilerplate-aligned ones
    assert out[1]["n_dup_spans"] == 1  # only the exact boiler window
    assert out[1]["n_spans"] == 5  # 14 tokens -> 5 start offsets


def test_within_doc_repetition_self_flags(spark):
    span = " ".join(f"r{i}" for i in range(8))
    docs = _docs(spark, [(1, span + " mid1 mid2 mid3 " + span),
                         (2, " ".join(f"x{i}" for i in range(20)))])
    out = {r["doc_id"]: r for r in
           dup_span_flags(docs, "doc_id", "text",
                          span_tokens=8).collect()}
    assert out[1]["n_dup_spans"] == 2  # both copies flag
    assert out[2]["n_dup_spans"] == 0


def test_short_docs_excluded(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c d e f g h i j")])
    rows = dup_span_flags(docs, "doc_id", "text",
                          span_tokens=10).collect()
    assert [r["doc_id"] for r in rows] == [2]  # doc 1 has < 10 tokens


def test_winnowing_detects_at_any_alignment(spark):
    """The winnowing guarantee: a shared region of length >=
    span + w - 1 tokens is detected in BOTH docs regardless of where
    it sits (content-defined selection; a fixed position stride has no
    such guarantee — the round-5 review killed that variant)."""
    span, w = 10, 5
    region = " ".join(f"d{i}" for i in range(span + w - 1))  # 14 toks
    for shift in range(7):  # region lands at many phases
        pre = " ".join(f"p{j}" for j in range(shift + 1))
        docs = _docs(spark, [
            (1, pre + " " + region + " tail1 tail2"),
            (2, "other start here now " + region + " x y z"),
        ])
        out = {r["doc_id"]: r["n_dup_fingerprints"] for r in
               dup_span_flags(docs, "doc_id", "text", span_tokens=span,
                              winnow=w).collect()}
        assert out[1] >= 1 and out[2] >= 1, shift


def test_winnowing_density(spark, pages_tiny):
    """Winnowing ships ~2/(w+1) of the spans — the scale dial."""
    docs = pages_tiny.limit(300).select(
        F.xxhash64("url").alias("doc_id"), "text")
    full = dup_span_flags(docs, "doc_id", "text", span_tokens=8) \
        .agg(F.sum("n_spans")).collect()[0][0]
    winnowed = dup_span_flags(docs, "doc_id", "text", span_tokens=8,
                              winnow=8) \
        .agg(F.sum("n_fingerprints")).collect()[0][0]
    density = winnowed / full
    assert density < 0.5  # far below shipping every span
    assert density > 0.05  # but not degenerate


def test_matches_duckdb_oracle(spark):
    """Full-semantics cross-check on real fixture text (winnow=1):
    per-doc flagged-window counts equal DuckDB computing the same
    windows as strings (equal strings hash equal; 64-bit collisions
    are ~impossible at this scale)."""
    docs = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").limit(400))
    span = 12
    got = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"]) for r in
           dup_span_flags(docs, "doc_id", "text",
                          span_tokens=span).collect()}
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(f"""
        WITH t AS (SELECT doc_id,
            list_filter(string_split(text, ' '), x -> x != '') AS tk
            FROM docs),
        eligible AS (SELECT doc_id, tk, len(tk) AS n FROM t
            WHERE len(tk) >= {span}),
        w AS (SELECT doc_id,
            unnest(list_transform(range(0, n - {span} + 1),
                i -> array_to_string(tk[i + 1 : i + {span}], ' ')))
            AS s FROM eligible),
        c AS (SELECT s, count(*) AS c FROM w GROUP BY s),
        f AS (SELECT doc_id, count(*) AS dups FROM w
              JOIN c USING (s) WHERE c >= 2 GROUP BY doc_id)
        SELECT e.doc_id, n - {span} + 1 AS n_spans,
               coalesce(f.dups, 0) AS dups
        FROM eligible e LEFT JOIN f ON e.doc_id = f.doc_id""").fetchall()
    want = {r[0]: (r[1], r[2]) for r in want}
    assert got == want
    # the fixture's dup rate must surface here
    assert sum(1 for v in got.values() if v[1] > 0) > 0


def test_plan_shape(spark, pages_tiny):
    """winnow=1 is JVM-only; winnow>1 adds exactly the one numpy
    sliding-min kernel (hashing stays JVM-side)."""
    docs = pages_tiny.limit(50).select(
        F.xxhash64("url").alias("doc_id"), "text")
    df1 = dup_span_flags(docs, "doc_id", "text", span_tokens=10)
    df1.collect()
    plan1 = df1._jdf.queryExecution().executedPlan().toString() \
        .split("Initial Plan")[0]
    assert "ArrowEvalPython" not in plan1 and "MapInPandas" not in plan1
    dfw = dup_span_flags(docs, "doc_id", "text", span_tokens=10,
                         winnow=4)
    dfw.collect()
