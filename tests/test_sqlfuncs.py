"""SQL surface over sketch tables."""

import pyspark.sql.functions as F
import pytest

from sketchlib.spark.build import build_sketches
from sketchlib.spark.specs import SketchSpec
from sketchlib.spark.sqlfuncs import register_sql_functions


@pytest.fixture(scope="module")
def sketch_view(spark, pages_tiny):
    df = build_sketches(
        pages_tiny.withColumn("hlen", F.length("html").cast("double")),
        ["lang"],
        [SketchSpec("url_hll", "hll", "url", {"b": 12}),
         SketchSpec("url_bloom", "bloom", "url", {"m": 1 << 16, "k": 6}),
         SketchSpec("len_kll", "kll", "hlen", {"k": 200})])
    df.createOrReplaceTempView("sketches")
    register_sql_functions(spark)
    return df


def test_sql_estimate(spark, pages_tiny, sketch_view):
    rows = spark.sql(
        "SELECT lang, sketch_estimate(sketch) AS est FROM sketches "
        "WHERE sketch_name = 'url_hll'").collect()
    exact = {r["lang"]: r["n"] for r in
             pages_tiny.groupBy("lang").agg(F.countDistinct("url").alias("n")).collect()}
    assert len(rows) == 10
    for r in rows:
        assert abs(r["est"] - exact[r["lang"]]) / exact[r["lang"]] < 0.1


def test_sql_bloom_contains(spark, pages_tiny, sketch_view):
    some = pages_tiny.filter("lang = 'en'").select("url").first()["url"]
    rows = spark.sql(
        f"SELECT lang, bloom_contains(sketch, '{some}') AS hit FROM sketches "
        "WHERE sketch_name = 'url_bloom'").collect()
    hits = {r["lang"]: r["hit"] for r in rows}
    assert hits["en"] is True


def test_sql_quantile(spark, sketch_view):
    rows = spark.sql(
        "SELECT lang, sketch_quantile(sketch, 0.5) AS p50 FROM sketches "
        "WHERE sketch_name = 'len_kll'").collect()
    assert len(rows) == 10
    assert all(r["p50"] > 0 for r in rows)


def test_sql_cdf_matches_exact_share(spark, pages_tiny, sketch_view):
    """sketch_cdf vs the exact share of pages at/under the per-lang
    median length: both should say ~0.5 within KLL rank error."""
    med = {r["lang"]: r["m"] for r in
           pages_tiny.groupBy("lang")
           .agg(F.expr("percentile(length(html), 0.5)").alias("m")).collect()}
    rows = spark.sql(
        "SELECT lang, sketch FROM sketches WHERE sketch_name = 'len_kll'"
    ).collect()
    from sketchlib.spark.sqlfuncs import register_sql_functions
    import pandas as pd
    udf_backed = register_sql_functions(spark)
    for r in rows:
        got = spark.sql(
            f"SELECT sketch_cdf(sketch, {med[r['lang']]}) AS c FROM sketches "
            f"WHERE sketch_name = 'len_kll' AND lang = '{r['lang']}'"
        ).first()["c"]
        assert abs(got - 0.5) < 0.05, (r["lang"], got)


def test_sql_cdf_and_quantile_null_for_non_quantile_sketch(spark, sketch_view):
    """Mixed sketch tables: rank/quantile read-outs over non-quantile
    blobs yield NULL (SQL semantics), not a task-killing exception."""
    r = spark.sql("SELECT sketch_cdf(sketch, 1.0) AS c, "
                  "sketch_quantile(sketch, 0.5) AS q FROM sketches "
                  "WHERE sketch_name = 'url_hll'").first()
    assert r["c"] is None and r["q"] is None


def test_sql_multipoint_quantiles_match_scalar(spark, sketch_view):
    """sketch_quantiles/sketch_cdfs (array-in/array-out, ONE python
    boundary) must agree element-wise with the scalar UDFs."""
    rows = spark.sql(
        "SELECT lang, "
        "sketch_quantiles(sketch, array(0.25D, 0.5D, 0.9D)) AS qs, "
        "sketch_quantile(sketch, 0.25) AS q25, "
        "sketch_quantile(sketch, 0.5) AS q50, "
        "sketch_quantile(sketch, 0.9) AS q90, "
        "sketch_cdfs(sketch, array(500D, 1000D)) AS cs, "
        "sketch_cdf(sketch, 500) AS c500, "
        "sketch_cdf(sketch, 1000) AS c1000 "
        "FROM sketches WHERE sketch_name = 'len_kll'").collect()
    assert rows
    for r in rows:
        assert r["qs"] == [r["q25"], r["q50"], r["q90"]], r
        assert r["cs"] == [r["c500"], r["c1000"]], r


def test_sql_multipoint_null_for_non_quantile_sketch(spark, sketch_view):
    r = spark.sql("SELECT sketch_quantiles(sketch, array(0.5D)) AS q, "
                  "sketch_cdfs(sketch, array(1.0D)) AS c FROM sketches "
                  "WHERE sketch_name = 'url_hll'").first()
    assert r["q"] is None and r["c"] is None
