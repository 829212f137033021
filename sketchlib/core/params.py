"""Parameter calibration — closed-form sizing for each sketch.

Reproduces the reference's stage-1 math (public Bloom-filter formulas,
/root/reference/spark/main.py:27-34 ``m = -(n*ln p)/(ln 2)^2``,
``k = -ln p / ln 2``; /root/reference/hadoop/.../Driver.java:104-105)
with the W4 divergence resolved (SURVEY.md §2.7): one documented k
formula, ``k = max(1, round(-ln p / ln 2))``, stored in the sketch
header rather than recomputed at probe time.
"""

from __future__ import annotations

import math


def bloom_params(n: int, p: float) -> tuple[int, int]:
    """(m bits, k hashes) for expected n keys at target FPR p."""
    if not (0.0 < p < 1.0):
        raise ValueError(f"target FPR must be in (0,1), got {p}")
    n = max(1, int(n))
    # floor of 8: the kernel rejects m<8 (a <1-byte bit array), and tiny
    # groups (n=1 at p>=0.05 gives m=5..7) must still build
    m = max(8, math.ceil(-(n * math.log(p)) / (math.log(2) ** 2)))
    k = max(1, round(-math.log(p) / math.log(2)))
    return m, k


def bloom_expected_fpr(m: int, k: int, n: int) -> float:
    """Designed FPR after n inserts: (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-k * n / m)) ** k


def hll_params(rel_error: float) -> int:
    """Register-count exponent b such that 1.04/sqrt(2^b) <= rel_error."""
    if not (0.0 < rel_error < 1.0):
        raise ValueError(f"relative error must be in (0,1), got {rel_error}")
    b = math.ceil(2 * math.log2(1.04 / rel_error))
    if b > 18:
        raise ValueError(
            f"rel_error={rel_error} needs 2^{b} registers; supported max "
            "is b=18 (rel_error >= 0.0021)")
    return max(4, b)


def cms_params(epsilon: float, delta: float) -> tuple[int, int]:
    """(width w, depth d): overestimate <= eps*N with prob >= 1-delta."""
    if not (0.0 < epsilon < 1.0) or not (0.0 < delta < 1.0):
        raise ValueError("epsilon and delta must be in (0,1)")
    w = math.ceil(math.e / epsilon)
    d = math.ceil(math.log(1.0 / delta))
    return w, max(1, d)
