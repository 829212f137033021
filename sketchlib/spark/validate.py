"""Stage 3: statistical validation of built sketches.

Reproduces the reference's validation semantics
(/root/reference/spark/main.py:166-193; ValidationMapper.java:56-79):
probe every key against every *other* group's Bloom filter (the
self-exclusion rule at main.py:62-63) and compare measured FPR to the
designed p — plus the false-negative check the reference lacks
(wart W1, SURVEY.md §2.7): every inserted key must be found.

Architecture notes vs the reference:
- The reference used a Spark accumulator in ``foreach``
  (main.py:17-24,172-176), which double-counts on task retry (wart
  W5). We emit per-partition partial counts from ``mapInPandas`` and
  sum them with a deterministic ``groupBy().sum()`` — exactly-once.
- The filters travel as a broadcast variable (the DataFrame-era
  version of the Hadoop side-file read, ValidationMapper.java:36-52).
  Total broadcast size = sum of m/8 over groups; bounded by design.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.types import LongType, StructField, StructType

from sketchlib.core.serde import sketch_from_bytes
from sketchlib.spark.build import _norm_nan


def collect_sketches(merged: DataFrame, group_cols: list[str],
                     sketch_name: str | None = None) -> dict:
    """Pull merged sketches (≤ #groups rows) to the driver as a dict.

    Keys are the group value (single group col) or tuple of values.
    """
    df = merged
    if sketch_name is not None:
        df = df.filter(F.col("sketch_name") == sketch_name)
    out = {}
    for r in df.collect():
        d = r.asDict()
        key = tuple(d[c] for c in group_cols)
        if len(key) == 1:
            key = key[0]
        out[key] = sketch_from_bytes(bytes(d["sketch"]))
    return out


def bloom_validate(df: DataFrame, filters: dict, group_cols: list[str],
                   value_col: str, designed_p: float) -> DataFrame:
    """Measured-FPR / false-negative table, one row per group's filter.

    Returns (group_cols..., n_keys, false_negatives, probes,
    false_positives, measured_fpr, designed_p) where measured_fpr =
    cross-group hits / cross-group probes against that group's filter.
    """
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast({k: v.to_bytes() for k, v in filters.items()})
    single = len(group_cols) == 1
    sel = df.select(*group_cols, value_col)
    group_fields = [f for f in sel.schema.fields if f.name in group_cols]
    counts_schema = StructType(group_fields + [
        StructField("own", LongType(), False),
        StructField("fn", LongType(), False),
        StructField("probes", LongType(), False),
        StructField("fp", LongType(), False),
    ])

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sketchlib.core import hashing
        local = {k: sketch_from_bytes(b) for k, b in bc.value.items()}
        # per-partition partial counters keyed by the *filter's* group
        agg = {k: [0, 0, 0, 0] for k in local}  # own, fn, probes, fp
        seeds = sorted({bf.seed for bf in local.values()})
        for pdf in batches:
            for gkey, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                if isinstance(gkey, tuple) and single:
                    gkey = gkey[0]
                gkey = _norm_nan(gkey)
                vals = sub[value_col].dropna()
                if not len(vals):
                    continue
                # hash once per seed, not once per filter: the murmur
                # pass dominates and is identical across same-seed filters
                pairs = {s: hashing.hash64_pair(vals, s) for s in seeds}
                for fkey, bf in local.items():
                    h1, h2 = pairs[bf.seed]
                    hits = int(bf.contains_from_hash_pair(h1, h2).sum())
                    slot = agg[fkey]
                    if fkey == gkey:
                        slot[0] += len(vals)
                        slot[1] += len(vals) - hits  # misses = false negatives
                    else:
                        slot[2] += len(vals)
                        slot[3] += hits
        rows = []
        for fkey, v in agg.items():
            if any(v):
                kt = fkey if isinstance(fkey, tuple) else (fkey,)
                rows.append((*kt, *v))
        if rows:
            yield pd.DataFrame(rows, columns=[*group_cols, "own", "fn",
                                              "probes", "fp"])

    partials = sel.mapInPandas(probe, counts_schema)
    return (partials.groupBy(*group_cols)
            .agg(F.sum("own").alias("n_keys"),
                 F.sum("fn").alias("false_negatives"),
                 F.sum("probes").alias("probes"),
                 F.sum("fp").alias("false_positives"))
            .withColumn("measured_fpr",
                        F.when(F.col("probes") > 0,
                               F.col("false_positives") / F.col("probes"))
                        .otherwise(F.lit(None)))
            .withColumn("designed_p", F.lit(designed_p)))
