"""Salted repartition: bounded task sizes for skewed groups."""

import pyspark.sql.functions as F
import pytest

from sketchlib.spark.build import calibrate
from sketchlib.spark.salting import (salt_counts, salted_repartition,
                                     with_salt, write_partitioned)


def test_salt_counts_from_histogram():
    s = salt_counts({"en": 45_000, "nl": 2_500}, target_rows_per_task=5_000)
    assert s == {"en": 9, "nl": 1}
    with pytest.raises(ValueError):
        salt_counts({"en": 1}, 0)


def test_salting_bounds_max_task_size(spark, pages_tiny):
    counts = {r["lang"]: r["n"] for r in calibrate(pages_tiny, ["lang"]).collect()}
    target = 1000
    salts = salt_counts(counts, target)
    assert salts["en"] > 1  # skewed group fans out
    out = salted_repartition(pages_tiny, "lang", salts, uid_col="url",
                             num_partitions=sum(salts.values()))
    sizes = (out.groupBy(F.spark_partition_id().alias("pid"))
             .count().collect())
    assert max(r["count"] for r in sizes) < 2.5 * target


def test_salt_deterministic(spark, pages_tiny):
    counts = {r["lang"]: r["n"] for r in calibrate(pages_tiny, ["lang"]).collect()}
    salts = salt_counts(counts, 1000)
    a = with_salt(pages_tiny, "lang", salts, "url").select("url", "salt").collect()
    b = with_salt(pages_tiny, "lang", salts, "url").select("url", "salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n_en = {r for (u, r) in map(tuple, a)}
    assert len(n_en) == max(salts.values())  # all salt values used


def test_write_partitioned_layout(spark, pages_tiny, tmp_path):
    out = str(tmp_path / "by_lang")
    write_partitioned(pages_tiny.select("url", "lang"), out, "lang")
    import os
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert len(dirs) == 10
    back = spark.read.parquet(out)
    assert back.count() == pages_tiny.count()
