"""Adversarial-skew build bench: one lang owns 90% of a 10M-row
corpus, so its per-group Bloom state is ~9x every other group's and a
single-stage merge funnels all of that group's partials into ONE task.
The salted merge tree (fanout=auto) is the fix SCALE.md's arithmetic
argues for; this measures it: wall time AND max merge-task duration at
salt in {1 (single-stage), auto (multi-level plan)}, max-task read
from the Spark status REST API (per-stage taskSummary, q=1.0).

Run: python BENCH/skew.py   (local[32], ~3 GB parquet input)
"""
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from sketchlib.io.fixtures import pages_path

ROWS = int(os.environ.get("SKEW_ROWS", "10000000"))
P = pages_path(str(ROWS))
# ~256 splits: partial count per group == split count == merge fan-in
os.environ["SKETCHLIB_MAX_PARTITION_BYTES"] = str(
    max(1 << 20, os.path.getsize(P) // 256))

from pyspark.sql import SparkSession
import pyspark.sql.functions as F

from sketchlib.spark.session import attach_package
from sketchlib.spark.specs import SketchSpec
from sketchlib.spark.build import (calibrate, bloom_params_by_group,
                                   build_sketches)

spark = (SparkSession.builder.master("local[32]")
         .appName("skew-bench")
         .config("spark.sql.shuffle.partitions", "128")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.files.maxPartitionBytes",
                 os.environ["SKETCHLIB_MAX_PARTITION_BYTES"])
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.ui.enabled", "true")  # REST status API
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
attach_package(spark)
sc = spark.sparkContext

# deterministic 90/10 skew: hash(url) -> 90% "hot", 10% across 9 cold
h = F.pmod(F.xxhash64("url"), F.lit(100))
pages = (spark.read.parquet(P).select("url")
         .withColumn("lang", F.when(h < 90, F.lit("hot"))
                     .otherwise(F.concat(F.lit("cold"),
                                         F.pmod(h, F.lit(9)).cast("string")))))
print(f"input: {ROWS} rows, {pages.rdd.getNumPartitions()} splits",
      flush=True)

bp = bloom_params_by_group(calibrate(pages, ["lang"]), 0.01)
specs = [SketchSpec("url_bloom", "bloom", "url", per_group_params=bp)]

UI = "http://localhost:4040/api/v1"
app_id = sc.applicationId


def rest(path: str):
    with urllib.request.urlopen(f"{UI}/applications/{app_id}{path}",
                                timeout=10) as r:
        return json.load(r)


def max_task_ms(group: str) -> float:
    """Max task duration (ms) across the MERGE stages of jobs in
    `group` — the scan/partial-build stage (one task per input split,
    row-balanced, skew-free) is excluded by its task count so the
    metric isolates the straggler the salt tree is meant to bound."""
    stages = set()
    for job in rest("/jobs?status=succeeded"):
        if job.get("jobGroup") == group:
            stages.update(job["stageIds"])
    worst = 0.0
    for sid in stages:
        try:
            info = rest(f"/stages/{sid}")[0]
            if info.get("numTasks", 0) >= 250:  # the 257-task scan stage
                continue
            s = rest(f"/stages/{sid}/0/taskSummary?quantiles=1.0")
            worst = max(worst, s["duration"][0])
        except Exception:
            pass  # skipped/small stages may lack summaries
    return worst


build_sketches(pages, ["lang"], specs, fanout="auto").collect()  # warm

results = {}
for label, fanout in (("salt=1", None), ("salt=auto", "auto")):
    for i in range(3):
        g = f"{label}-run{i}"
        sc.setJobGroup(g, label)
        t0 = time.time()
        build_sketches(pages, ["lang"], specs, fanout=fanout).collect()
        wall = time.time() - t0
        sc.setJobGroup("", "")
        mt = max_task_ms(g)
        results.setdefault(label, []).append((wall, mt))
        print(f"{label} run{i}: wall {wall:.2f}s  max-task {mt/1000:.2f}s",
              flush=True)

print()
for label, rs in results.items():
    wall = sorted(r[0] for r in rs)[1]
    mt = sorted(r[1] for r in rs)[1]
    print(f"{label}: median wall {wall:.2f}s  median max-task {mt/1000:.2f}s")

# ---------------------------------------------------------------------------
# stage 3 (validation) under the same 90% skew — the one stage without
# an adversarial measurement through round 4. Validation probes every
# row against every group's filter from a broadcast, so work per task
# is ROW-balanced regardless of how skewed the groups are (there is no
# group shuffle to straggle); the numbers below evidence that: the
# max probe-task should sit near the median, not 9x above it, and the
# broadcast stays within the deserialized-size budget guard.
# ---------------------------------------------------------------------------
from sketchlib.spark.validate import bloom_validate, collect_sketches

merged = build_sketches(pages, ["lang"], specs, fanout="auto")
filters = collect_sketches(merged, ["lang"], "url_bloom")
ser_bytes = sum(len(v.to_bytes()) for v in filters.values())
infl_bytes = sum(v.m // 8 + 1 for v in filters.values())
print(f"\nstage-3 broadcast: {len(filters)} filters, "
      f"{ser_bytes/1e6:.1f} MB serialized, "
      f"{infl_bytes/1e6:.1f} MB inflated (budget guard: 1 GiB)", flush=True)


def task_ms(group: str, q: float) -> float:
    stages = set()
    for job in rest("/jobs?status=succeeded"):
        if job.get("jobGroup") == group:
            stages.update(job["stageIds"])
    worst = 0.0
    for sid in stages:
        try:
            info = rest(f"/stages/{sid}")[0]
            if info.get("numTasks", 0) < 32:
                continue  # the probe scan is the big stage; skip finals
            s = rest(f"/stages/{sid}/0/taskSummary?quantiles={q}")
            worst = max(worst, s["duration"][0])
        except Exception:
            pass
    return worst


bloom_validate(pages, filters, ["lang"], "url", 0.01).collect()  # warm
vruns = []
for i in range(3):
    g = f"validate-run{i}"
    sc.setJobGroup(g, "validate")
    t0 = time.time()
    out = bloom_validate(pages, filters, ["lang"], "url", 0.01).collect()
    wall = time.time() - t0
    sc.setJobGroup("", "")
    mx, med = task_ms(g, 1.0), task_ms(g, 0.5)
    vruns.append((wall, mx, med))
    print(f"validate run{i}: wall {wall:.2f}s  max-task {mx/1000:.2f}s  "
          f"median-task {med/1000:.2f}s", flush=True)
wall = sorted(r[0] for r in vruns)[1]
mx = sorted(r[1] for r in vruns)[1]
med = sorted(r[2] for r in vruns)[1]
fn_total = sum(r["false_negatives"] for r in out)
print(f"validate: median wall {wall:.2f}s  max-task {mx/1000:.2f}s  "
      f"median-task {med/1000:.2f}s  "
      f"max/median {mx/max(med, 1):.2f}x  false_negatives {fn_total}")
spark.stop()
