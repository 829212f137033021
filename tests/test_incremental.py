"""incremental_update: base + delta merged states == full rebuild
bitwise for lattice kernels; new/untouched groups handled; the base
data is never rescanned (plan-asserted)."""

import pandas as pd
import pytest

from sketchlib.spark.build import build_sketches, incremental_update
from sketchlib.spark.specs import SketchSpec

SPECS = [SketchSpec("b", "bloom", "url", {"m": 1 << 14, "k": 5}),
         SketchSpec("h", "hll", "url", {"b": 11}),
         SketchSpec("cs", "countsketch", "url", {"w": 256, "d": 3}),
         SketchSpec("s", "sample", "url", {"k": 32})]


def _mk(spark, lo, hi, langs):
    rows = [(l, f"https://x/{i}") for i in range(lo, hi) for l in langs]
    return spark.createDataFrame(rows, "lang string, url string") \
        .repartition(4)


def _by_key(df):
    return {(r["lang"], r["sketch_name"]): (bytes(r["sketch"]), r["n_rows"])
            for r in df.collect()}


def test_incremental_equals_full_rebuild(spark):
    base_df = _mk(spark, 0, 400, ["en", "fr"])
    delta_df = _mk(spark, 300, 600, ["en", "de"])  # overlap + new group
    base = build_sketches(base_df, ["lang"], SPECS)
    got = _by_key(incremental_update(base, delta_df, ["lang"], SPECS))
    want = _by_key(build_sketches(base_df.unionByName(delta_df),
                                  ["lang"], SPECS))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k   # bitwise-identical state
        assert got[k][1] == want[k][1], k   # row counts add up
    # fr untouched by delta, de delta-only — both present
    langs = {k[0] for k in got}
    assert langs == {"en", "fr", "de"}


def test_base_data_never_rescanned(spark, tmp_path):
    """The update plan must not contain a scan of the base DATA — only
    the sketch-table read and the delta scan."""
    base_path = str(tmp_path / "base_data.parquet")
    _mk(spark, 0, 200, ["en"]).write.parquet(base_path)
    sk_path = str(tmp_path / "sketches.parquet")
    build_sketches(spark.read.parquet(base_path), ["lang"], SPECS) \
        .write.parquet(sk_path)
    upd = incremental_update(spark.read.parquet(sk_path),
                             _mk(spark, 200, 300, ["en"]),
                             ["lang"], SPECS)
    plan = upd._jdf.queryExecution().executedPlan().toString()
    assert "base_data.parquet" not in plan
    assert upd.count() == len(SPECS)


def test_incremental_update_fused_readout(spark, pages_tiny):
    """readout= on incremental_update: estimate columns come out of the
    update's own merge task and match a post-hoc read of the blob."""
    from sketchlib.core.serde import sketch_from_bytes
    import pyspark.sql.functions as F
    specs = [SketchSpec("h", "hll", "url", {"b": 10})]
    half = pages_tiny.limit(pages_tiny.count() // 2)
    rest = pages_tiny.subtract(half)
    base = build_sketches(half, ["lang"], specs)
    rd = [("est", "double", lambda _n, sk: float(sk.estimate()))]
    out = incremental_update(base, rest, ["lang"], specs,
                             readout=rd).collect()
    assert out
    for r in out:
        assert r["est"] == float(
            sketch_from_bytes(bytes(r["sketch"])).estimate())
