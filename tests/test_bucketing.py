"""Bucketed tables: joins and aggregations on the bucket key run
Exchange-free (the shuffle is paid once at write time)."""

import pytest
import pyspark.sql.functions as F

from sketchlib.spark.bucketing import is_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scores = docs.select("doc_id", F.length("text").alias("score"))
    write_bucketed(docs, "t_docs_b", ["doc_id"], 8, sort_cols=["doc_id"])
    write_bucketed(scores, "t_scores_b", ["doc_id"], 8, sort_cols=["doc_id"])
    yield "t_docs_b", "t_scores_b"
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_scores_b")


def test_bucket_metadata(spark, bucketed_pair):
    a, b = bucketed_pair
    assert is_bucketed(spark, a) and is_bucketed(spark, b)


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    # merge hint: at fixture scale Spark would otherwise pick a broadcast
    # join (which ignores bucketing); at real scale sort-merge is the
    # strategy bucketing exists for
    joined = (spark.table(a).join(spark.table(b).hint("merge"), "doc_id")
              .select("doc_id", "lang", "score"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan  # co-located
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # and the join actually works
    n = joined.count()
    assert n == spark.table(a).count()


def test_bucketed_agg_no_exchange(spark, bucketed_pair):
    a, _ = bucketed_pair
    agg = spark.table(a).groupBy("doc_id").agg(F.count("*").alias("c"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.filter("c != 1").count() == 0


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join through plain parquet DOES exchange —
    proving the bucketed plans above are load-bearing, not vacuous."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scores = docs.select("doc_id", F.length("text").alias("score"))
    plan = (docs.join(scores.hint("merge"), "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" in plan
