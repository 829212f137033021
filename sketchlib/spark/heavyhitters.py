"""Scale-true heavy hitters: CMS + distributed candidate tracking.

``q_cms_top_tokens`` estimates counts for candidates found by an exact
pass — fine at test scale, circular at 10^12 docs. This operator is
the real scale path: each input partition contributes (a) a partial
CMS and (b) its local top-C candidate tokens (a superset property:
any global top-k item is in some partition's local top-C for C >= k
when counts are spread, and Zipf skew concentrates them further).
The merge unions candidates, re-estimates each against the merged CMS
(overestimate-only), and keeps the global top-k.

Everything shuffles as fixed-size state: one CMS + C strings per
(partition, group). No token-level groupBy ever happens.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (ArrayType, BinaryType, IntegerType, LongType,
                               StringType, StructField, StructType)

from sketchlib.core.cms import CountMinSketch
from sketchlib.core.serde import sketch_from_bytes


def cms_heavy_hitters(df: DataFrame, group_cols: list[str], text_col: str,
                      k: int = 10, candidates_per_partition: int = 64,
                      w: int = 16384, d: int = 5, seed: int = 0) -> DataFrame:
    """Top-k tokens per group with CMS estimates.

    Returns (group_cols..., token, est_cnt, rnk) — est_cnt >= true count
    (CMS overestimate-only), rnk by (est_cnt desc, token asc).
    """
    sel = df.select(*group_cols, text_col)
    partial_schema = StructType(
        [f for f in sel.schema.fields if f.name in group_cols] + [
            StructField("cms", BinaryType(), False),
            StructField("cands", ArrayType(StringType()), False),
        ])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}  # gkey -> [cms, Counter-ish dict of local counts]
        for pdf in batches:
            for gkey, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                if not isinstance(gkey, tuple):
                    gkey = (gkey,)
                slot = acc.get(gkey)
                if slot is None:
                    slot = [CountMinSketch(w, d, seed), {}]
                    acc[gkey] = slot
                toks = (sub[text_col].dropna().astype(str)
                        .str.split(" ").explode().dropna())
                toks = toks[toks != ""]
                if not len(toks):
                    continue
                vc = toks.value_counts()
                slot[0].update_batch(vc.index.to_numpy(),
                                     vc.to_numpy(dtype=np.int64))
                local = slot[1]
                for t, c in vc.items():
                    local[t] = local.get(t, 0) + int(c)
                # bound the candidate tracker: CMS holds the counts, the
                # dict only nominates candidates — prune cold entries
                if len(local) > 64 * candidates_per_partition:
                    keep = sorted(local.items(), key=lambda kv: -kv[1])
                    slot[1] = dict(keep[:16 * candidates_per_partition])
        rows = []
        for gkey, (cms, local) in acc.items():
            top = sorted(local.items(), key=lambda kv: (-kv[1], kv[0]))
            rows.append((*gkey, cms.to_bytes(),
                         [t for t, _ in top[:candidates_per_partition]]))
        if rows:
            yield pd.DataFrame(rows, columns=[*group_cols, "cms", "cands"])

    partials = sel.mapInPandas(build, partial_schema)

    out_schema = StructType(
        [f for f in sel.schema.fields if f.name in group_cols] + [
            StructField("token", StringType(), False),
            StructField("est_cnt", LongType(), False),
            StructField("rnk", IntegerType(), False),
        ])

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cms = sketch_from_bytes(bytes(pdf["cms"].iloc[0]))
        for blob in pdf["cms"].iloc[1:]:
            cms.merge(sketch_from_bytes(bytes(blob)))
        cands = sorted({t for lst in pdf["cands"] for t in lst})
        if not cands:
            return pd.DataFrame(columns=[*group_cols, "token", "est_cnt", "rnk"])
        est = cms.query_batch(cands)
        order = sorted(range(len(cands)), key=lambda i: (-int(est[i]), cands[i]))
        top = order[:k]
        return pd.DataFrame({
            **{c: [key[i]] * len(top) for i, c in enumerate(group_cols)},
            "token": [cands[i] for i in top],
            "est_cnt": [int(est[i]) for i in top],
            "rnk": np.arange(1, len(top) + 1, dtype=np.int32),
        })

    return partials.groupBy(*group_cols).applyInPandas(merge, out_schema)
