"""ANN: brute-force baseline correctness + SRP-LSH recall."""

import pyspark.sql.functions as F
import pytest

from sketchlib.spark import annops
from sketchlib.spark.queries import q_ann_cosine_topk

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    df.count()
    return df


def test_brute_force_self_excluded_and_ranked(spark, emb):
    rows = q_ann_cosine_topk(spark, SF).collect()
    assert len(rows) == 10 * 5
    for r in rows:
        assert r["q_id"] != r["nbr_id"]
        assert 1 <= r["rnk"] <= 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append((r["rnk"], r["score"]))
    for q, lst in by_q.items():
        scores = [s for _, s in sorted(lst)]
        assert scores == sorted(scores, reverse=True), q


def test_lsh_recall_against_brute_force(spark, emb):
    dim = len(emb.first()["embedding"])
    exact = {(r["q_id"], r["nbr_id"])
             for r in q_ann_cosine_topk(spark, SF).collect()}
    approx = {(r["q_id"], r["nbr_id"])
              for r in annops.ann_lsh_topk(
                  emb, "vec_id", "embedding", dim,
                  query_filter=F.col("vec_id") < 10, k=5,
                  bands=32, bits_per_band=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall  # 32 bands x 4 bits on near-random vectors


def test_ivf_recall_against_brute_force(spark, emb):
    dim = len(emb.first()["embedding"])
    exact = {(r["q_id"], r["nbr_id"])
             for r in q_ann_cosine_topk(spark, SF).collect()}
    approx = {(r["q_id"], r["nbr_id"])
              for r in annops.ann_ivf_topk(
                  emb, "vec_id", "embedding", dim,
                  query_filter=F.col("vec_id") < 10, k=5,
                  n_centroids=8, nprobe=5).collect()}
    # fixture embeddings are near-isotropic (flat eigenspectrum) — IVF's
    # worst case, recall ~ searched fraction; 8 cells/nprobe 5 measures 0.98
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_ivf_deterministic_and_reusable(spark, emb):
    """Centroids are seed-deterministic; precomputed assignments give
    identical results (train-once / query-many contract)."""
    import numpy as np
    dim = len(emb.first()["embedding"])
    c1 = annops.ivf_train_centroids(emb, "vec_id", "embedding", dim,
                                    n_centroids=8, iters=3)
    c2 = annops.ivf_train_centroids(emb, "vec_id", "embedding", dim,
                                    n_centroids=8, iters=3)
    assert np.array_equal(c1, c2)
    assign = annops.ivf_assign(emb, "vec_id", "embedding", c1)
    a = annops.ann_ivf_topk(emb, "vec_id", "embedding", dim,
                            query_filter=F.col("vec_id") < 5, k=3,
                            centroids=c1, assignments=assign).collect()
    b = annops.ann_ivf_topk(emb, "vec_id", "embedding", dim,
                            query_filter=F.col("vec_id") < 5, k=3,
                            n_centroids=8, iters=3).collect()
    key = lambda r: (r["q_id"], r["rnk"], r["nbr_id"])
    assert sorted(map(key, a)) == sorted(map(key, b))
    # every vector lands in exactly one cell
    assert assign.count() == emb.count()
    assert assign.select("vid").distinct().count() == emb.count()


def test_ivf_train_deterministic_at_each_partition_width(spark, emb):
    """Training is reproducible run-to-run at a fixed partitioning —
    the cluster-side partial-sum fold is totally ordered by
    partition_id — checked at two widths. (Centroids are NOT expected
    to be bitwise-equal ACROSS widths: the partial-sum groupings
    differ, exactly like the round-2 driver-side reduce.)"""
    import numpy as np
    dim = len(emb.first()["embedding"])
    for width in (8, 64):
        wide = emb.repartition(width)
        c1 = annops.ivf_train_centroids(wide, "vec_id", "embedding", dim,
                                        n_centroids=8, iters=2)
        c2 = annops.ivf_train_centroids(wide, "vec_id", "embedding", dim,
                                        n_centroids=8, iters=2)
        assert np.array_equal(c1, c2), width
        assert c1.shape == (8, dim)
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-5)


def test_ivf_reduce_collects_at_most_n_centroids_rows(spark, emb):
    """The per-iteration reduce happens in the cluster: replicate one
    iteration's partial->reduce plan at 64 input partitions and assert
    the DataFrame the driver would collect has <= n_centroids rows
    (round 2 collected one row per (partition, centroid))."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)
    import pyspark.sql.functions as F
    dim = len(emb.first()["embedding"])
    cents = annops.ivf_train_centroids(emb, "vec_id", "embedding", dim,
                                       n_centroids=8, iters=1)
    wide = emb.repartition(64).select(
        F.col("vec_id").cast("long").alias("_id"), "embedding")
    schema = StructType([
        StructField("cid", LongType(), False),
        StructField("cnt", LongType(), False),
        StructField("vsum", ArrayType(DoubleType()), False),
        StructField("partition_id", LongType(), False)])

    def fn(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                              1e-12)
            cid = (mat @ cents.T).argmax(axis=1)
            cnts = np.bincount(cid, minlength=len(cents))
            nz = np.flatnonzero(cnts)
            sums = np.zeros((len(cents), dim))
            np.add.at(sums, cid, mat)
            yield pd.DataFrame({"cid": nz, "cnt": cnts[nz],
                                "vsum": list(sums[nz]), "partition_id": pid})

    partials = wide.mapInPandas(fn, schema)
    assert partials.count() > 8  # many partials: one per (partition, cid)
    reduced = partials.groupBy("cid").agg(
        F.sum("cnt").alias("cnt"))  # the reduce keys the driver collects
    assert reduced.count() <= 8


def test_srp_signatures_deterministic(spark, emb):
    dim = len(emb.first()["embedding"])
    a = {r["vid"]: r["bands"] for r in
         annops.srp_signatures(emb, "vec_id", "embedding", dim).collect()}
    b = {r["vid"]: r["bands"] for r in
         annops.srp_signatures(emb, "vec_id", "embedding", dim).collect()}
    assert a == b and len(a) == emb.count()


def test_embedding_neardup_lsh_recall(spark, emb):
    from sketchlib.spark import annops
    dim = len(emb.first()["embedding"])
    exact = {(r["a_id"], r["b_id"]) for r in
             annops.cosine_pairs(emb, "vec_id", "embedding", 0.4).collect()}
    lsh = {(r["a_id"], r["b_id"]) for r in
           annops.lsh_cosine_pairs(emb, "vec_id", "embedding", dim, 0.4).collect()}
    assert exact, "threshold should yield pairs on this fixture"
    assert lsh <= exact or all(p in exact for p in lsh)  # verify step exact
    assert len(exact & lsh) / len(exact) >= 0.9
