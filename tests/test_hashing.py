"""Vectorized murmur3 vs scalar reference + published test vectors."""

import numpy as np
import pytest

from sketchlib.core import hashing


def test_known_vectors():
    # published murmur3 x86_32 vectors
    assert hashing.murmur3_32_scalar(b"", 0) == 0x00000000
    assert hashing.murmur3_32_scalar(b"", 1) == 0x514E28B7
    assert hashing.murmur3_32_scalar(b"", 0xFFFFFFFF) == 0x81F16F39
    assert hashing.murmur3_32_scalar(b"\xff\xff\xff\xff", 0) == 0x76293B50


def test_vectorized_matches_scalar_random():
    rng = np.random.default_rng(42)
    keys = []
    for _ in range(500):
        n = int(rng.integers(0, 64))
        keys.append(bytes(rng.integers(1, 256, size=n, dtype=np.uint8)))
    for seed in (0, 1, 7, 0xDEADBEEF):
        vec = hashing.murmur3_32(keys, seed)
        for i, k in enumerate(keys):
            assert int(vec[i]) == hashing.murmur3_32_scalar(k, seed), (i, k, seed)


def test_vectorized_strings_utf8():
    keys = ["hello", "héllo wörld", "日本語テキスト", "a", "", "x" * 100]
    vec = hashing.murmur3_32(keys, 3)
    for i, k in enumerate(keys):
        assert int(vec[i]) == hashing.murmur3_32_scalar(k.encode("utf-8"), 3)


def test_hash64_independence_and_determinism():
    keys = [f"https://example.com/{i}" for i in range(1000)]
    h1a, h2a = hashing.hash64_pair(keys, seed=0)
    h1b, h2b = hashing.hash64_pair(keys, seed=0)
    assert np.array_equal(h1a, h1b) and np.array_equal(h2a, h2b)
    assert len(np.unique(h1a)) == len(keys)  # no collisions at this scale
    assert np.all(h2a & np.uint64(1) == 1)  # forced odd
    h1c, _ = hashing.hash64_pair(keys, seed=1)
    assert not np.array_equal(h1a, h1c)


def test_probe_indices_shape_and_range():
    idx = hashing.probe_indices(["a", "b", "c"], k=5, m=1000)
    assert idx.shape == (3, 5)
    assert idx.max() < 1000


def test_empty_batch():
    assert hashing.murmur3_32([], 0).shape == (0,)


def test_digest16_batch_matches_scalar():
    """The vectorized long-key digest is byte-identical to the per-key
    path for every key (round 3: the per-key Python loop became a
    reduceat fold — 4.7x on whole-page fingerprints)."""
    import numpy as np
    from sketchlib.core.hashing import _digest16, _digest16_batch
    rng = np.random.default_rng(13)
    keys = [rng.integers(0, 256, int(rng.integers(257, 4096)),
                         dtype=np.uint8).tobytes() for _ in range(64)]
    # include exact multiples of 8 and off-by-one straddles
    keys += [bytes(range(256)) * 2, b"x" * 257, b"y" * 264, b"z" * 263]
    data = np.frombuffer(b"".join(keys), dtype=np.uint8)
    lens = np.array([len(k) for k in keys])
    starts = np.r_[0, np.cumsum(lens[:-1])]
    batch = _digest16_batch(data, starts, lens)
    for i, k in enumerate(keys):
        assert batch[i].tobytes() == _digest16(k), i


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.binary(min_size=257, max_size=1200), min_size=1,
                max_size=12))
def test_digest16_batch_fuzz_parity(keys):
    """Hypothesis: batch digest == per-key digest for arbitrary long
    byte strings (any length mod 8, NULs, repeats)."""
    import numpy as np
    from sketchlib.core.hashing import _digest16, _digest16_batch
    data = np.frombuffer(b"".join(keys), dtype=np.uint8)
    lens = np.array([len(k) for k in keys])
    starts = np.r_[0, np.cumsum(lens[:-1])]
    batch = _digest16_batch(data, starts, lens)
    for i, k in enumerate(keys):
        assert batch[i].tobytes() == _digest16(k)
