"""BottomKSample kernel: global-equivalence, uniformity, serde,
estimate accuracy, and the Spark build-path integration."""

import numpy as np
import pandas as pd
import pytest

from sketchlib.core import hashing
from sketchlib.core.sample import BottomKSample
from sketchlib.core.serde import sketch_from_bytes

KEYS = [f"https://h{i % 53}.example.com/{i}" for i in range(20000)]


def test_matches_global_bottom_k():
    """Distributed result == the k globally-smallest hash tags, with
    payloads that hash back to their own tags."""
    k = 64
    s = BottomKSample(k=k, seed=7)
    for i in range(0, len(KEYS), 1111):  # ragged batches
        s.update_batch(KEYS[i:i + 1111])
    tags = hashing.hash64(KEYS, 7)
    want = np.sort(np.unique(tags))[:k]
    assert np.array_equal(s.tags, want)
    got_back = hashing.hash64([p.decode() for p in s.sample()], 7)
    assert np.array_equal(np.sort(got_back), want)


def test_duplicates_do_not_skew():
    """A value seen 1000x occupies exactly one slot — across EVERY
    seed, including those where the hot tag ranks inside the bottom-k
    (the review-found bug: pre-dedup argpartition let hot copies crowd
    out distinct values and made state depend on batch grouping)."""
    for seed in range(20):
        s = BottomKSample(k=16, seed=seed)
        s.update_batch(["hot"] * 1000 + [f"cold{i}" for i in range(100)])
        assert sum(p == b"hot" for p in s.sample()) <= 1, seed
        assert len(s.tags) == 16, seed
        # one batch vs many batches: bitwise-identical state
        s2 = BottomKSample(k=16, seed=seed)
        s2.update_batch(["hot"] * 500)
        s2.update_batch([f"cold{i}" for i in range(50)] + ["hot"] * 500)
        s2.update_batch([f"cold{i}" for i in range(50, 100)])
        assert s2.to_bytes() == s.to_bytes(), seed


def test_below_saturation_is_exhaustive_and_exact():
    s = BottomKSample(k=100, seed=0).update_batch(["a", "b", "c", "a"])
    assert sorted(s.sample()) == [b"a", b"b", b"c"]
    assert s.estimate() == 3.0


def test_estimate_within_bound():
    s = BottomKSample(k=512, seed=3).update_batch(
        [f"u{i}" for i in range(50000)])
    rel = abs(s.estimate() - 50000) / 50000
    assert rel < 4 * s.rel_error()


def test_serde_roundtrip_and_registry():
    s = BottomKSample(k=32, seed=5).update_batch(KEYS[:500])
    blob = s.to_bytes()
    back = BottomKSample.from_bytes(blob)
    assert back == s and back.to_bytes() == blob
    assert isinstance(sketch_from_bytes(blob), BottomKSample)
    empty = BottomKSample(k=32, seed=5)
    assert BottomKSample.from_bytes(empty.to_bytes()) == empty


def test_int_and_binary_payloads():
    s = BottomKSample(k=8, seed=0).update_batch(
        pd.Series([10, 20, 30], dtype="int64"))
    assert sorted(s.sample()) == [b"10", b"20", b"30"]
    s2 = BottomKSample(k=8, seed=0).update_batch([b"\x00\x01", b"a\x00"])
    assert sorted(s2.sample()) == [b"\x00\x01", b"a\x00"]


def test_nulls_dropped():
    s = BottomKSample(k=8, seed=0).update_batch(
        pd.Series(["x", None, "y"], dtype=object))
    assert sorted(s.sample()) == [b"x", b"y"]


def test_merge_param_mismatch_raises():
    with pytest.raises(ValueError):
        BottomKSample(k=8).merge(BottomKSample(k=16))
    with pytest.raises(ValueError):
        BottomKSample(k=0)


def test_query_sample_docs_lang(spark):
    """Registered query: every sampled doc_id belongs to its lang, is
    distinct within the lang, and counts are min(k, n_lang)."""
    from sketchlib.spark.queries import q_sample_docs_lang, load
    sf = "/root/testdata/sf0.001"
    out = q_sample_docs_lang(spark, sf).toPandas()
    docs = load(spark, sf, "documents").select("lang", "doc_id").toPandas()
    by_lang = docs.groupby("lang")["doc_id"].apply(
        lambda s: set(s.astype(str)))
    for lang, grp in out.groupby("lang"):
        ids = list(grp["doc_id"])
        assert len(ids) == len(set(ids))
        assert len(ids) == min(20, len(by_lang[lang]))
        assert set(ids) <= by_lang[lang], lang


def test_spark_build_path(spark):
    """sample spec through build_sketches: per-lang samples equal the
    single-process kernel run on the same rows (merge determinism)."""
    from sketchlib.spark.specs import SketchSpec
    from sketchlib.spark.build import build_sketches
    from sketchlib.spark.validate import collect_sketches
    pdf = pd.DataFrame({
        "lang": ["en", "fr"] * 400,
        "url": [f"https://x/{i}" for i in range(800)],
    })
    df = spark.createDataFrame(pdf).repartition(6)
    merged = build_sketches(df, ["lang"],
                            [SketchSpec("s", "sample", "url", {"k": 16})])
    got = collect_sketches(merged, ["lang"], "s")
    for lang in ("en", "fr"):
        local = BottomKSample(k=16).update_batch(
            pdf[pdf["lang"] == lang]["url"])
        assert got[lang] == local, lang
