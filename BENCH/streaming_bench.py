"""Streaming-layer bench (VERDICT r4 item 6): end-to-end micro-batch
throughput of the persisted sketch-table sink, and bounded-state
streaming dedup vs Spark's dropDuplicates on the same stream.

Run: python BENCH/streaming_bench.py
(env: STREAM_ROWS [default 1M], STREAM_BATCHES [default 8],
SPARK_GRAFT_CPUS). Prints a markdown table; results recorded in
BENCH/EXTRA.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

ROWS = int(os.environ.get("STREAM_ROWS", "1000000"))
BATCHES = int(os.environ.get("STREAM_BATCHES", "8"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F
    from sketchlib.io.fixtures import pages_path
    from sketchlib.spark.session import get_spark, attach_package
    from sketchlib.spark.specs import SketchSpec
    from sketchlib.spark.streaming import (streaming_dedup,
                                           streaming_sketch_table)

    spark = get_spark("streaming-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    attach_package(spark)

    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    tbl = pq.read_table(pages_path(str(ROWS)))
    n = tbl.num_rows // BATCHES
    for i in range(BATCHES):
        part = tbl.slice(i * n, n if i < BATCHES - 1
                         else tbl.num_rows - (BATCHES - 1) * n)
        pq.write_table(part, f"{src_dir}/batch-{i:02d}.parquet")
    schema = spark.read.parquet(src_dir).schema

    def stream():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src_dir))

    results = []

    # --- persisted sketch-table sink: all 5 kernel families ---------
    specs = [SketchSpec("url_hll", "hll", "url", {"b": 14}),
             SketchSpec("url_bloom", "bloom", "url",
                        {"m": 1 << 22, "k": 5}),
             SketchSpec("tok_cms", "cms", "text", {"w": 16384, "d": 5},
                        tokenize=True),
             SketchSpec("len_kll", "kll", "n_chars", {"k": 200}),
             SketchSpec("len_td", "tdigest", "n_chars", {"delta": 200})]
    work = tempfile.mkdtemp(prefix="stream_tbl_")
    src = stream().withColumn("n_chars", F.length("text").cast("double"))
    t0 = time.time()
    q = (streaming_sketch_table(src, ["lang"], specs, f"{work}/tbl",
                                f"{work}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.time() - t0
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    results.append(("sketch-table sink (5 kernels, per-lang)",
                    f"{ROWS} rows / {n_batches} batches",
                    wall, ROWS / wall, "delta-fold per batch; "
                    "exactly-once versioned commits"))
    shutil.rmtree(work)

    # --- bounded-state dedup vs dropDuplicates ----------------------
    for label, build in (
        ("streaming_dedup (sharded Bloom, fixed state)",
         lambda s: streaming_dedup(s, "url", n_expected=ROWS, p=0.001,
                                   shards=64)),
        ("stream.dropDuplicates (exact, unbounded state)",
         lambda s: s.dropDuplicates(["url"])),
    ):
        work = tempfile.mkdtemp(prefix="stream_dd_")
        out = build(stream())
        t0 = time.time()
        q = (out.writeStream.format("parquet")
             .option("path", f"{work}/out")
             .option("checkpointLocation", f"{work}/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.time() - t0
        emitted = spark.read.parquet(f"{work}/out").count()
        state_bytes = state_rows = 0
        for p in q.recentProgress:
            for so in p.get("stateOperators", []):
                state_bytes = max(state_bytes,
                                  so.get("memoryUsedBytes", 0))
                state_rows = max(state_rows, so.get("numRowsTotal", 0))
        results.append((label,
                        f"emitted {emitted}; state {state_rows} rows / "
                        f"{state_bytes/1e6:.1f} MB",
                        wall, ROWS / wall, ""))
        shutil.rmtree(work)
    shutil.rmtree(src_dir)

    print("\n| operator | outcome | wall s | rows/s | notes |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r[0]} | {r[1]} | {r[2]:.1f} | {r[3]:,.0f} | {r[4]} |")
    spark.stop()


if __name__ == "__main__":
    main()
