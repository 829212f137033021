"""MinHash estimator quality + batch-shape invariance (round 3: the
kernel hashes tokens once and combines arithmetically — these tests pin
the estimator contract through that rewrite)."""

import numpy as np
import pandas as pd
import pytest

from sketchlib.spark import textops
from sketchlib.spark.textops import _minhash_batch


def _true_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        w = [x for x in t.split(" ") if x]
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_signature_estimates_match_true_jaccard():
    rng = np.random.default_rng(11)
    docs, truths = [], []
    base = [f"tok{i}" for i in range(300)]
    for frac in (0.9, 0.7, 0.5, 0.3, 0.1):
        keep = int(300 * frac)
        other = [f"alt{i}" for i in range(300 - keep)]
        a = " ".join(base)
        b = " ".join(base[:keep] + other)
        docs += [a, b]
        truths.append(_true_jaccard(a, b))
    sig, valid = _minhash_batch(pd.Series(docs), 256, 3, seed=7)
    assert valid.all()
    for i, want in enumerate(truths):
        est = (sig[2 * i] == sig[2 * i + 1]).mean()
        # 256 hashes -> sigma ~ sqrt(J(1-J)/256) <= 0.032; allow 4 sigma
        assert abs(est - want) < 0.13, (est, want)


def test_signatures_invariant_to_batch_split():
    """Arrow batch boundaries must not change any doc's signature
    (token hashing is per-vocabulary-string, not per-batch-code)."""
    texts = pd.Series([
        " ".join(f"w{(i * j) % 50}" for j in range(30)) for i in range(40)])
    whole, v_whole = _minhash_batch(texts, 64, 3, seed=3)
    first, v1 = _minhash_batch(texts.iloc[:13].reset_index(drop=True), 64, 3, 3)
    rest, v2 = _minhash_batch(texts.iloc[13:].reset_index(drop=True), 64, 3, 3)
    assert v_whole.all() and v1.all() and v2.all()
    assert np.array_equal(whole, np.vstack([first, rest]))


def test_lsh_pairs_find_planted_near_dups(spark):
    """Planted 90%-overlap pairs surface; unrelated docs do not."""
    rows = []
    for k in range(10):
        # 5 point mutations in 100 tokens -> ~15/113 shingles differ,
        # true J ~ 0.73: comfortably above the 0.5 threshold (mutating
        # every 10th token lands J at ~0.53, inside estimator noise)
        base = [f"d{k}w{i}" for i in range(100)]
        mut = list(base)
        for i in range(0, 100, 20):
            mut[i] = f"d{k}x{i}"
        rows.append((2 * k, " ".join(base)))
        rows.append((2 * k + 1, " ".join(mut)))
    for k in range(50):  # unrelated background docs
        rows.append((100 + k, " ".join(f"bg{k}w{i}" for i in range(60))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a_id"], r["b_id"])
           for r in textops.minhash_lsh_pairs(df, "doc_id", "text",
                                              threshold=0.5).collect()}
    want = {(2 * k, 2 * k + 1) for k in range(10)}
    assert want <= got
    assert all(b - a == 1 for a, b in got)  # no cross-pair false positives
