"""Frequent Directions: spectral error bound (incl. under arbitrary
merge orders), direction recovery on low-rank data, serde, Spark
build-path over the embeddings table."""

import numpy as np
import pandas as pd
import pytest

from sketchlib.core.fd import FrequentDirections
from sketchlib.core.serde import sketch_from_bytes


def _lowrank(n, dim, rank, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, rank)) * (10.0 / np.arange(1, rank + 1))
    v, _ = np.linalg.qr(rng.standard_normal((dim, rank)))
    return u @ v.T + noise * rng.standard_normal((n, dim))


def _specnorm_err(a, sk):
    return float(np.linalg.norm(a.T @ a - sk.cov_estimate(), 2))


class TestBound:
    def test_sequential_bound(self):
        a = _lowrank(3000, 32, 5)
        sk = FrequentDirections(l=16).update_batch(a)
        assert _specnorm_err(a, sk) <= sk.error_bound()
        # and far tighter than the bound on low-rank data
        assert _specnorm_err(a, sk) <= 0.2 * sk.error_bound()

    def test_bound_under_any_merge_order(self):
        a = _lowrank(4000, 24, 4, seed=2)
        rng = np.random.default_rng(3)
        idx = rng.permutation(len(a))
        parts = np.array_split(idx, 7)
        sketches = [FrequentDirections(l=16).update_batch(a[p])
                    for p in parts]
        for perm_seed in (0, 1):
            order = np.random.default_rng(perm_seed).permutation(7)
            acc = FrequentDirections(l=16)
            for i in order:
                acc.merge(FrequentDirections.from_bytes(
                    sketches[i].to_bytes()))
            assert _specnorm_err(a, acc) <= acc.error_bound(), perm_seed
            assert acc.n_rows == len(a)

    def test_top_direction_recovery(self):
        a = _lowrank(5000, 40, 3, noise=0.01, seed=5)
        sk = FrequentDirections(l=12).update_batch(a)
        _, vecs = sk.top_directions(1)
        _, _, vt = np.linalg.svd(a, full_matrices=False)
        # leading principal direction recovered (up to sign)
        assert abs(float(vecs[0] @ vt[0])) > 0.99


class TestContract:
    def test_serde_roundtrip(self):
        a = _lowrank(500, 16, 3, seed=1)
        sk = FrequentDirections(l=8).update_batch(a)
        back = FrequentDirections.from_bytes(sk.to_bytes())
        assert back == sk
        assert np.allclose(back.cov_estimate(), sk.cov_estimate())
        empty = FrequentDirections(l=8)
        assert FrequentDirections.from_bytes(empty.to_bytes()) == empty
        assert isinstance(sketch_from_bytes(sk.to_bytes()),
                          FrequentDirections)

    def test_validation(self):
        with pytest.raises(ValueError, match=">= 2"):
            FrequentDirections(l=1)
        with pytest.raises(ValueError, match="dim"):
            FrequentDirections(l=8).update_batch(
                np.ones((3, 4))).update_batch(np.ones((2, 5)))
        with pytest.raises(ValueError, match="different l"):
            FrequentDirections(l=8).merge(
                FrequentDirections(l=16).update_batch(np.ones((1, 4))))

    def test_merge_empty_sides(self):
        a = np.ones((5, 3))
        sk = FrequentDirections(l=4).update_batch(a)
        sk.merge(FrequentDirections(l=4))            # empty other
        out = FrequentDirections(l=4)
        out.merge(sk)                                # empty self
        assert out.n_rows == 5


def test_spark_build_over_embeddings(spark):
    from sketchlib.spark.specs import SketchSpec
    from sketchlib.spark.build import build_sketches
    from sketchlib.spark.validate import collect_sketches
    import pyspark.sql.functions as F
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .select(F.lit(1).alias("g"), "embedding"))
    merged = build_sketches(emb, ["g"],
                            [SketchSpec("f", "fd", "embedding", {"l": 16})])
    sk = collect_sketches(merged, ["g"], "f")[1]
    rows = np.array(emb.select("embedding").toPandas()["embedding"].to_list(),
                    dtype=np.float64)
    assert sk.n_rows == len(rows)
    assert _specnorm_err(rows, sk) <= sk.error_bound()


def test_query_spectrum_matches_exact_eigenvalues(spark):
    """fd_embedding_spectrum values within the sketch's spectral bound
    of the exact covariance eigenvalues (Weyl's inequality)."""
    from sketchlib.spark.queries import q_fd_embedding_spectrum
    out = q_fd_embedding_spectrum(spark, "/root/testdata/sf0.001") \
        .toPandas().sort_values("rnk")
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").toPandas()
    a = np.array(emb["embedding"].to_list(), dtype=np.float64)
    exact = np.linalg.svd(a, compute_uv=False) ** 2
    bound = 2.0 * float((a * a).sum()) / 32
    got = out["sq_singular"].to_numpy()
    assert len(got) == 5
    assert np.all(np.abs(got - exact[:5]) <= bound)


def test_exact_spectrum_companion_matches_local_svd(spark):
    """The distributed Gram-partial exact companion agrees with a local
    SVD, and the FD estimate sits within its bound of THIS catalog
    query (closing the last kernel family's in-catalog accuracy loop)."""
    from sketchlib.spark.queries import (q_embedding_spectrum_exact,
                                         q_fd_embedding_spectrum)
    sf = "/root/testdata/sf0.001"
    got = (q_embedding_spectrum_exact(spark, sf)
           .toPandas().sort_values("rnk")["sq_singular"].to_numpy())
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").toPandas()
    a = np.array(emb["embedding"].to_list(), dtype=np.float64)
    want = np.linalg.svd(a, compute_uv=False)[:5] ** 2
    assert len(got) == 5
    assert np.allclose(got, want, atol=0.02)  # catalog rounds to 2dp
    est = (q_fd_embedding_spectrum(spark, sf)
           .toPandas().sort_values("rnk")["sq_singular"].to_numpy())
    bound = 2.0 * float((a * a).sum()) / 32
    assert np.all(np.abs(est - got) <= bound)
