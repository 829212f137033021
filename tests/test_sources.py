"""Multi-format input sources: same rows -> same sketch regardless of
the format they arrived in (parquet is the scale path; TSV is the
reference's own input shape)."""

import os

import pytest

from sketchlib.io.sources import infer_format, read_input, FORMATS
from sketchlib.spark.build import build_sketches
from sketchlib.spark.specs import SketchSpec
from sketchlib.spark.validate import collect_sketches

ROWS = [(i, f"https://ex.com/{i % 40}", ["en", "fr"][i % 2])
        for i in range(200)]
DDL = "doc_id BIGINT, url STRING, lang STRING"


@pytest.fixture(scope="module")
def format_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fmts")
    df = spark.createDataFrame(ROWS, DDL)
    paths = {}
    for fmt in ("parquet", "json", "orc"):
        p = str(base / f"docs.{fmt}")
        getattr(df.coalesce(1).write, fmt)(p)
        paths[fmt] = p
    p = str(base / "docs.tsv")
    df.coalesce(1).write.option("header", "true").option("sep", "\t").csv(p)
    paths["tsv"] = p
    p = str(base / "docs.csv")
    df.coalesce(1).write.option("header", "true").csv(p)
    paths["csv"] = p
    return paths


def test_infer_format():
    assert infer_format("/a/b/x.parquet") == "parquet"
    assert infer_format("/a/b/x.tsv/") == "tsv"
    assert infer_format("x.jsonl") == "json"
    with pytest.raises(ValueError, match="cannot infer"):
        infer_format("/a/b/mystery")


def test_all_formats_same_rows(spark, format_dirs):
    want = sorted(ROWS)
    for fmt, path in format_dirs.items():
        df = read_input(spark, path, schema=DDL if fmt != "parquet" else None)
        got = sorted((r["doc_id"], r["url"], r["lang"])
                     for r in df.collect())
        assert got == want, fmt


def test_tsv_header_and_inference(spark, format_dirs):
    df = read_input(spark, format_dirs["tsv"])  # inferSchema path
    assert dict(df.dtypes)["doc_id"] == "int"  # header consumed, typed
    assert df.count() == len(ROWS)


def test_same_sketch_from_tsv_and_parquet(spark, format_dirs):
    spec = SketchSpec("b", "bloom", "url", {"m": 1 << 12, "k": 5})
    out = {}
    for fmt in ("parquet", "tsv"):
        df = read_input(spark, format_dirs[fmt],
                        schema=DDL if fmt == "tsv" else None)
        merged = build_sketches(df, ["lang"], [spec])
        out[fmt] = collect_sketches(merged, ["lang"], "b")
    assert out["parquet"] == out["tsv"]


def test_partition_pruning_and_filter_pushdown(spark, tmp_path):
    """The 100 TB posture in one plan: a lang-partitioned table read
    with a lang predicate must prune at the DIRECTORY level
    (PartitionFilters), push the residual predicate into the parquet
    scan (PushedFilters), and read only the projected columns
    (ReadSchema) — none of which survives if an operator wraps the
    scan in an opaque UDF first."""
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], f"u{i}", i * 10)
         for i in range(300)],
        "doc_id long, lang string, url string, n_chars long")
    path = str(tmp_path / "pages_part")
    df.write.partitionBy("lang").parquet(path)

    q = (spark.read.parquet(path)
         .filter((F.col("lang") == "en") & (F.col("n_chars") > 100))
         .select("url"))
    plan = q._jdf.queryExecution().executedPlan().toString() \
        .split("Initial Plan")[0]
    assert "PartitionFilters" in plan and "lang" in \
        plan.split("PartitionFilters")[1][:200], plan
    assert "PushedFilters" in plan and "n_chars" in \
        plan.split("PushedFilters")[1][:200], plan
    assert "ReadSchema" in plan
    # only url + the pushed filter column cross the scan boundary
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "url" in read_schema and "doc_id" not in read_schema
    # and the answer is right
    assert q.count() == sum(1 for i in range(300)
                            if i % 3 == 0 and i * 10 > 100)
