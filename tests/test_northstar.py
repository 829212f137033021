"""The four north-star queries (BASELINE.json) over the pages table:
1. set-membership (url dedup per lang partition)      — Bloom
2. distinct-count (unique urls per lang/day)           — HLL
3. heavy-hitter token frequency over extracted text    — CMS
4. quantiles of page byte-length                       — KLL / t-digest
Each checked against the exact answer computed by plain Spark.
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from sketchlib.spark.build import calibrate, bloom_params_by_group, build_sketches
from sketchlib.spark.heavyhitters import cms_heavy_hitters
from sketchlib.spark.specs import SketchSpec
from sketchlib.spark.validate import collect_sketches


@pytest.fixture(scope="module")
def pages(pages_tiny):
    df = (pages_tiny
          .withColumn("day", F.date_format("warc_ts", "yyyy-MM-dd"))
          .withColumn("hlen", F.length("html").cast("double"))
          .cache())
    df.count()
    return df


def test_q1_membership_url_dedup_per_lang(spark, pages):
    bp = bloom_params_by_group(calibrate(pages, ["lang"]), 0.01)
    merged = build_sketches(pages, ["lang"],
                            [SketchSpec("b", "bloom", "url", per_group_params=bp)])
    filters = collect_sketches(merged, ["lang"], "b")
    en_urls = [r["url"] for r in
               pages.filter("lang = 'en'").select("url").limit(500).collect()]
    assert filters["en"].contains_batch(en_urls).all()  # no false negatives
    fresh = [f"https://new.example.com/{i}" for i in range(5000)]
    assert filters["en"].contains_batch(fresh).mean() < 0.03


def test_q2_distinct_urls_per_lang_day(spark, pages):
    merged = build_sketches(pages, ["lang", "day"],
                            [SketchSpec("h", "hll", "url", {"b": 12})])
    hlls = collect_sketches(merged, ["lang", "day"], "h")
    assert len(hlls) == 10 * 7  # 10 langs x 7 days
    exact = {(r["lang"], r["day"]): r["n"] for r in
             pages.groupBy("lang", "day")
             .agg(F.countDistinct("url").alias("n")).collect()}
    for key, h in hlls.items():
        rel = abs(h.estimate() - exact[key]) / max(exact[key], 1)
        assert rel < 4 * h.rel_error(), (key, h.estimate(), exact[key])


def test_q3_heavy_hitter_tokens(spark, pages):
    hh = {(r["lang"], r["rnk"]): r["token"]
          for r in cms_heavy_hitters(pages, ["lang"], "text", k=3).collect()}
    # Zipf vocabulary: w00000 is the global heavy hitter in every lang
    for lang in ("en", "zh", "nl"):
        assert hh[(lang, 1)] == "w00000"


def test_q4_byte_length_quantiles(spark, pages):
    merged = build_sketches(pages, ["lang"],
                            [SketchSpec("k", "kll", "hlen", {"k": 200}),
                             SketchSpec("t", "tdigest", "hlen", {"delta": 200})])
    klls = collect_sketches(merged, ["lang"], "k")
    tds = collect_sketches(merged, ["lang"], "t")
    vals = np.sort(np.array([r["hlen"] for r in
                             pages.filter("lang='en'").select("hlen").collect()]))
    for q in (0.1, 0.5, 0.99):
        for sk in (klls["en"], tds["en"]):
            est = sk.quantile(q)
            rank = np.searchsorted(vals, est) / len(vals)
            assert abs(rank - q) < 0.03, (q, type(sk).__name__)
