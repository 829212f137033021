"""Skew handling: salted repartition sized from the calibration histogram.

The reference's `groupByKey` ships every raw row of a class to one
reducer (spark/main.py:146) — with our skewed langs (en ~45%) one task
would own half the data. The sketch build itself sidesteps this
(partials are per input partition), but any *downstream* per-group
processing (per-group exports, per-group model runs, the merge fan-in)
still needs bounded task sizes. Stage 1 already computes exactly the
histogram needed to size the salt (SURVEY.md §4) — reuse it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def salt_counts(group_counts: dict, target_rows_per_task: int) -> dict:
    """Salt fan-out per group: ceil(n / target), min 1."""
    if target_rows_per_task <= 0:
        raise ValueError("target_rows_per_task must be positive")
    return {g: max(1, math.ceil(n / target_rows_per_task))
            for g, n in group_counts.items()}


def with_salt(df: DataFrame, group_col: str, salts: dict,
              uid_col: str, salt_col: str = "salt") -> DataFrame:
    """Deterministic per-row salt in [0, salts[group]) from a hash of
    the row's uid — no RNG, so retries/resumes assign identical salts."""
    # a null group key is first-class upstream (calibration counts use
    # dropna=False) but cannot live in a Spark map literal (null map
    # keys are illegal) nor in sorted() — route it through its own
    # branch
    null_salt = salts.get(None)
    keyed = {g: s for g, s in salts.items() if g is not None}
    n_salt = F.lit(1)
    if keyed:
        mapping = F.create_map(*[x for g, s in sorted(keyed.items())
                                 for x in (F.lit(g), F.lit(int(s)))])
        n_salt = F.coalesce(mapping[F.col(group_col)], F.lit(1))
    if null_salt is not None:
        n_salt = F.when(F.col(group_col).isNull(),
                        F.lit(int(null_salt))).otherwise(n_salt)
    return df.withColumn(salt_col,
                         F.pmod(F.xxhash64(F.col(uid_col)), n_salt).cast("int"))


def salted_repartition(df: DataFrame, group_col: str, salts: dict,
                       uid_col: str, num_partitions: int | None = None) -> DataFrame:
    """Repartition by (group, salt): a skewed group spreads over
    ceil(n/target) tasks instead of one."""
    salted = with_salt(df, group_col, salts, uid_col)
    if num_partitions:
        return salted.repartition(num_partitions, group_col, "salt")
    return salted.repartition(group_col, "salt")


def write_partitioned(df: DataFrame, path: str, group_col: str,
                      fmt: str = "parquet") -> None:
    """Per-group named output (the reference's MultipleOutputs
    'rate<r>' files, CreationReducer.java:15,38) — Spark-native:
    partitionBy directory layout."""
    df.write.partitionBy(group_col).format(fmt).mode("overwrite").save(path)
