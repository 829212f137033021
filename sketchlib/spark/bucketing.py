"""Bucketed tables: pre-shuffled storage for co-located joins/aggs.

The reference tunes reducer counts per job (Driver.java:176 — SURVEY
G4); the storage-side generalization on Spark is bucketing: writing a
table ``bucketBy(N, key)`` hash-partitions rows into N buckets at write
time, so every LATER equi-join or aggregation on the bucket key reads
both sides already co-partitioned — no Exchange at query time. For a
corpus that is joined on the same key many times (doc_id joins in a
dedup pipeline, url joins across crawls), the shuffle is paid once at
ingest instead of per query.

Bucketed tables must go through the catalog (``saveAsTable``) — plain
``parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a parquet-backed bucketed catalog table.

    ``sort_cols`` additionally sorts within buckets (enables sort-merge
    join without the sort step). ``n_buckets`` should match across
    tables that will be joined (equal bucket counts join Exchange-free;
    Spark can also handle divisible counts with bucket coalescing).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w = (df.write.mode(mode).format("parquet")
         .bucketBy(int(n_buckets), *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def is_bucketed(spark: SparkSession, table: str) -> bool:
    """True iff the catalog table carries bucket metadata."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return any(r["col_name"] == "Num Buckets" for r in rows)
