"""Scale-true CMS heavy hitters vs exact token counts."""

import pyspark.sql.functions as F
from pyspark.sql import Window

from sketchlib.spark.heavyhitters import cms_heavy_hitters


def test_heavy_hitters_match_exact_topk(spark, pages_tiny_multifile):
    pages = pages_tiny_multifile
    hh = cms_heavy_hitters(pages, ["lang"], "text", k=5).collect()
    exact = (pages.select("lang", F.explode(F.split("text", " ")).alias("t"))
             .groupBy("lang", "t").count())
    w = Window.partitionBy("lang").orderBy(F.desc("count"), F.asc("t"))
    top_exact = (exact.withColumn("r", F.row_number().over(w))
                 .filter("r <= 5").collect())
    exact_sets = {}
    exact_counts = {}
    for r in top_exact:
        exact_sets.setdefault(r["lang"], set()).add(r["t"])
        exact_counts[(r["lang"], r["t"])] = r["count"]
    got = {}
    for r in hh:
        got.setdefault(r["lang"], set()).add(r["token"])
        # overestimate-only, tight at this scale
        true = exact_counts.get((r["lang"], r["token"]))
        if true is not None:
            assert r["est_cnt"] >= true
            assert r["est_cnt"] - true <= 0.01 * true + 50
    # Zipf head: the estimated top-5 equals the exact top-5 per lang
    assert got == exact_sets


def test_heavy_hitters_no_token_shuffle(spark, pages_tiny):
    hh = cms_heavy_hitters(pages_tiny, ["lang"], "text", k=5)
    plan = hh._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the partial-state shuffle into the merge
    assert plan.count("Exchange") == 1, plan
