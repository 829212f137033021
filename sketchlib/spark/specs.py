"""Sketch build specifications — what to sketch, over which column.

A spec is the Spark-facing declaration of one sketch UDAF instance:
which kernel, which value column, and its parameters (optionally
per-group, as produced by the calibration stage — mirroring the
reference's per-class m derived from per-class n,
/root/reference/spark/main.py:117-125).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from sketchlib.core.bloom import BloomFilter
from sketchlib.core.hll import HyperLogLog
from sketchlib.core.cms import CountMinSketch
from sketchlib.core.tdigest import TDigest
from sketchlib.core.kll import KLL
from sketchlib.core.theta import ThetaSketch
from sketchlib.core.sample import (BottomKSample,
                                   WeightedBottomKSample)
from sketchlib.core.countsketch import CountSketch
from sketchlib.core.fd import FrequentDirections

KINDS = {"bloom", "hll", "cms", "tdigest", "kll", "theta", "sample",
         "countsketch", "fd", "wsample"}
_NUMERIC_KINDS = {"tdigest", "kll"}


@dataclass(frozen=True)
class SketchSpec:
    """One sketch to build per group.

    name: output sketch name (unique within a build)
    kind: bloom | hll | cms | tdigest | kll
    value_col: input column with the keys/values to feed
    params: kernel constructor kwargs (e.g. {"m":..., "k":...})
    per_group_params: optional {group_tuple: kwargs} overriding params
        (group_tuple is the tuple of group-column values, or the scalar
        itself for a single group column)
    tokenize: if True, whitespace-split the string column and feed
        tokens instead of whole values (heavy-hitter sketches)
    weight_col: optional numeric column of per-row integral weights —
        each key counts weight times instead of once ('frequency in
        bytes served' instead of 'frequency in requests'). cms and
        countsketch only; negative weights (deletes) are legal for the
        signed countsketch, rejected for overestimate-only cms.
        Null/NaN weights drop the row, matching null-key semantics.
    """

    name: str
    kind: str
    value_col: str
    params: dict = field(default_factory=dict)
    per_group_params: dict | None = None
    tokenize: bool = False
    weight_col: str | None = None

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(f"unknown sketch kind {self.kind!r}; one of {sorted(KINDS)}")
        if self.weight_col is not None and self.kind not in (
                "cms", "countsketch", "wsample"):
            raise ValueError(
                "weight_col is only meaningful for cms/countsketch/"
                f"wsample (a {self.kind} update is per-distinct-key, "
                "not per-count)")
        if self.kind == "wsample" and self.weight_col is None:
            raise ValueError(
                "wsample requires weight_col (for a uniform sample use "
                "kind='sample')")
        if self.weight_col is not None and self.tokenize:
            raise ValueError("weight_col + tokenize is ambiguous (one "
                             "weight per row, many tokens per row)")
        if self.kind == "wsample" and self.tokenize:
            raise ValueError("wsample + tokenize is ambiguous (one "
                             "weight per row, many tokens per row)")
        if self.tokenize and self.kind in ("kll", "tdigest"):
            raise ValueError(
                f"tokenize=True feeds token STRINGS, but {self.kind} is "
                "a numeric-value sketch — drop tokenize or sketch a "
                "numeric column")

    def make(self, group_key: Any):
        kwargs = dict(self.params)
        if self.per_group_params is not None:
            key = group_key if not (isinstance(group_key, tuple) and len(group_key) == 1) else group_key[0]
            kwargs.update(self.per_group_params.get(key, {}))
        ctor = {"bloom": BloomFilter, "hll": HyperLogLog, "cms": CountMinSketch,
                "tdigest": TDigest, "kll": KLL, "theta": ThetaSketch,
                "sample": BottomKSample,
                "wsample": WeightedBottomKSample,
                "countsketch": CountSketch,
                "fd": FrequentDirections}[self.kind]
        return ctor(**kwargs)

    @property
    def numeric(self) -> bool:
        return self.kind in _NUMERIC_KINDS
