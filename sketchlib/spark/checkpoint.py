"""Stage checkpointing with per-partition lineage + resume.

The reference's stages are resumable because each writes SequenceFiles
to HDFS and the next job re-reads them (Driver.java:226,
Driver.java:89-114 — "re-run job 2 from outStage1"). The Spark-native
version: the partial-sketch table is itself the checkpoint. Each row
carries its lineage (input partition id, row count, spec fingerprint),
so a resumed run:

  1. reads the surviving partials,
  2. rebuilds ONLY the input partitions with no stored partial
     (a JVM-side ``spark_partition_id() NOT IN completed`` filter —
     no Python work for completed partitions),
  3. merges stored + rebuilt partials into the final sketch table.

For the lossless sketches (Bloom/HLL/CMS) the resumed result is
bitwise-identical to an uninterrupted run (test-enforced).

Storage: a parquet partial table + a single-row JSON manifest, both
written through Spark IO so any Hadoop-compatible filesystem works
(file://, hdfs://, s3a://). ``iceberg_available()`` probes whether an
Iceberg catalog is usable so callers can layer an Iceberg table on
top; this sandbox has no Iceberg runtime, so the shipped store is the
parquet one. The manifest records the spec fingerprint so a resume
against changed specs or input is refused instead of silently mixing
states.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from sketchlib.spark.build import build_partials, merge_partials
from sketchlib.spark.specs import SketchSpec

_ICEBERG_STATE: dict = {}


def _is_path_missing(e: Exception) -> bool:
    msg = str(e)
    return ("PATH_NOT_FOUND" in msg or "Path does not exist" in msg
            or "FileNotFoundException" in msg)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is usable in this session."""
    key = id(spark)
    if key not in _ICEBERG_STATE:
        try:
            spark.sql("CREATE TABLE IF NOT EXISTS sketchlib_iceberg_probe "
                      "(x INT) USING iceberg")
            spark.sql("DROP TABLE IF EXISTS sketchlib_iceberg_probe")
            _ICEBERG_STATE[key] = True
        except Exception:
            _ICEBERG_STATE[key] = False
    return _ICEBERG_STATE[key]


def spec_fingerprint(df: DataFrame, group_cols: list[str],
                     specs: list[SketchSpec]) -> str:
    """Stable identity of (input identity, grouping, sketch params) — a
    resume against anything else must be refused.

    Input identity = schema + partition count + the sorted list of
    input files (``df.inputFiles()``), with (size, mtime) folded in for
    locally-resolvable paths. Without the file list, replacing the
    input with same-schema, same-partition-count DIFFERENT data resumed
    silently and mixed partials from two inputs (round-1 ADVICE
    finding); size+mtime additionally catches same-NAME in-place
    overwrites for file:// inputs. Remote filesystems contribute names
    only (documented weaker identity); derived DataFrames with no scan
    files (in-memory test frames) fall back to schema+count alone.
    """
    try:
        input_files = sorted(df.inputFiles())
    except Exception:
        input_files = []
    ids = []
    for f in input_files:
        local = f[7:] if f.startswith("file:") and f[5:7] == "//" else (
            f if f.startswith("/") else None)
        if local is not None and os.path.exists(local):
            st = os.stat(local)
            ids.append(f"{f}|{st.st_size}|{int(st.st_mtime)}")
        else:
            ids.append(f)
    input_files = ids
    payload = json.dumps({
        # partial-table format version: bump when the partials schema
        # changes (v2 added the 'chunk' column) so a pre-upgrade
        # checkpoint REFUSES to resume instead of mixing schemas
        "partials_fmt": 2,
        "schema": df.schema.simpleString(),
        "input_files": input_files,
        "n_partitions": df.rdd.getNumPartitions(),
        "group_cols": group_cols,
        "specs": [{"name": s.name, "kind": s.kind, "value_col": s.value_col,
                   "params": s.params, "per_group": s.per_group_params is not None,
                   "tokenize": s.tokenize, "weight_col": s.weight_col}
                  for s in specs],
    }, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class PartialCheckpoint:
    """Parquet-backed (Iceberg-ready) per-partition partial store."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.data_path = path.rstrip("/") + "/partials"
        # manifest goes through Spark text IO so remote checkpoint
        # paths (hdfs://, s3a://) work the same as local ones
        self.manifest_path = path.rstrip("/") + "/MANIFEST"

    def manifest(self) -> dict | None:
        try:
            rows = self.spark.read.text(self.manifest_path).collect()
        except Exception as e:
            if _is_path_missing(e):
                return None
            raise
        return json.loads("".join(r["value"] for r in rows))

    def completed_partitions(self) -> list[int]:
        """Partition ids with stored partials. A missing store is empty;
        any other read error propagates — treating a corrupt store as
        'nothing done' would append duplicate partials and silently
        double-count every merge thereafter."""
        if self.manifest() is None:
            return []
        try:
            rows = (self.spark.read.parquet(self.data_path)
                    .select("partition_id").distinct().collect())
        except Exception as e:
            if _is_path_missing(e):
                return []
            raise
        return sorted(r["partition_id"] for r in rows)

    def write(self, partials: DataFrame, fingerprint: str,
              append: bool = False) -> dict:
        mode = "append" if append else "overwrite"
        partials.write.mode(mode).parquet(self.data_path)
        stored = self.spark.read.parquet(self.data_path)
        # n_rows is carried per (partition, group, spec); count one
        # spec's worth, not the sum over specs
        one_spec = F.min("sketch_name")
        counters = stored.agg(
            F.count("*").alias("n_partials"),
            F.countDistinct("partition_id").alias("n_partitions"),
            one_spec.alias("_s")).collect()[0]
        n_rows = stored.filter(F.col("sketch_name") == counters["_s"]) \
            .agg(F.sum("n_rows")).collect()[0][0]
        counters = {"n_partials": int(counters["n_partials"]),
                    "n_rows": int(n_rows or 0),
                    "n_partitions": int(counters["n_partitions"])}
        man = {
            "fingerprint": fingerprint,
            "format": "parquet",
            "counters": counters,
        }
        (self.spark.createDataFrame([(json.dumps(man),)], "value string")
         .coalesce(1).write.mode("overwrite").text(self.manifest_path))
        return man


def build_sketches_checkpointed(df: DataFrame, group_cols: list[str],
                                specs: list[SketchSpec], ckpt_path: str,
                                fanout: int | str | None = "auto") -> DataFrame:
    """build_sketches with a partial-level checkpoint at ``ckpt_path``.

    First run: builds all partials, checkpoints them, merges.
    Resumed run (manifest present, fingerprint matches): rebuilds only
    input partitions missing from the store, appends, merges.
    Fingerprint mismatch raises (changed specs/input require a fresh
    checkpoint dir).
    """
    spark = df.sparkSession
    ckpt = PartialCheckpoint(spark, ckpt_path)
    fp = spec_fingerprint(df, group_cols, specs)
    man = ckpt.manifest()
    if man is not None:
        if man["fingerprint"] != fp:
            raise ValueError(
                f"checkpoint at {ckpt_path} was built from different "
                f"specs/input (fingerprint {man['fingerprint']} != {fp}); "
                "use a new checkpoint path")
        done = ckpt.completed_partitions()
        # spark_partition_id() is evaluated at the scan, and filter is a
        # narrow dependency, so partition numbering (the lineage key)
        # is preserved; completed partitions cost a scan but no Python
        remaining = df.filter(~F.spark_partition_id().isin(done)) if done else df
        new_partials = build_partials(remaining, group_cols, specs)
        ckpt.write(new_partials, fp, append=True)
        stored = spark.read.parquet(ckpt.data_path)
        return merge_partials(stored, group_cols, fanout=fanout)
    partials = build_partials(df, group_cols, specs)
    ckpt.write(partials, fp, append=False)
    stored = spark.read.parquet(ckpt.data_path)
    return merge_partials(stored, group_cols, fanout=fanout)
