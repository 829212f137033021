"""Apples-to-apples vs the reference: stages 1+2 (calibrate + Bloom
build) on 1.24M rows — the workload of report §5 Table 5."""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from sketchlib.io.fixtures import pages_path
p = pages_path("1240000")
os.environ.setdefault("SKETCHLIB_MAX_PARTITION_BYTES",
                      str(max(1 << 20, os.path.getsize(p) // 32)))

from sketchlib.spark.session import get_spark
from sketchlib.spark.specs import SketchSpec
from sketchlib.spark.build import calibrate, bloom_params_by_group, build_sketches

spark = get_spark("ref-compare", cpus=32, shuffle_partitions=32)
pages = spark.read.parquet(p)
pages.count()
build_sketches(pages, ["lang"], [SketchSpec("w", "hll", "url", {"b": 4})]).collect()
ts = []
for _ in range(3):
    t0 = time.time()
    bp = bloom_params_by_group(calibrate(pages, ["lang"]), 0.01)
    build_sketches(pages, ["lang"],
                   [SketchSpec("b", "bloom", "url", per_group_params=bp)],
                   fanout="auto").collect()
    ts.append(time.time() - t0)
best = sorted(ts)[1]
print(f"stages1+2 bloom-only 1.24M rows: median {best:.2f}s = "
      f"{1_240_000 / best:,.0f} rows/s (reference: 25.69s = ~48k rows/s)")
spark.stop()
