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
