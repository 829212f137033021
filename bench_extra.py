"""Per-query measurement harness for optimization work (guide §1).

NOT the driver bench — bench.py is frozen for measurement. This tool:
- times a chosen subset of catalog queries (median of N, .collect()
  like bench.py, or a noop sink with --noop to isolate computation),
- optionally dumps .explain("formatted") to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--runs N] [--noop] \
      [--plans plans/r06 --suffix before] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
os.environ.setdefault("PYTHONPATH", _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all bench queries)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf1.0"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="time via noop sink instead of collect()")
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from sketchlib.spark.session import get_spark, attach_package
    import __spark_entry__ as entry_mod
    from sketchlib.spark import queries as Q
    import pyspark.sql.functions as F

    spark = get_spark("sketchlib-bench-extra", cpus=args.cpus,
                      shuffle_partitions=max(args.cpus, 16))
    attach_package(spark)
    # same warmup as bench.py
    spark.range(1 << 20).select(F.sum("id")).collect()
    from sketchlib.spark.specs import SketchSpec
    from sketchlib.spark.build import build_sketches
    warm = spark.createDataFrame([("a", "x")], "g string, v string")
    build_sketches(warm, ["g"], [SketchSpec("w", "hll", "v", {"b": 4})]).collect()
    spark.read.parquet(f"{args.sf}/region.parquet").count()

    catalog = entry_mod.queries()
    names = args.queries or [
        "calib_counts_lang", "heavy_tokens_lang", "quantiles_nchars_lang",
        "distinct_users_daily", "pricing_summary", "ann_cosine_topk",
        "ngram_jaccard_pairs", "bloom_fpr_validation", "hll_distinct_lang",
        "cms_top_tokens", "kll_quantiles_nchars", "tdigest_quantiles_value",
        "minhash_lsh_pairs", "simhash_pairs", "bloom_semijoin",
        "sample_docs_lang", "countsketch_token_freq", "cms_join_size",
        "fd_embedding_spectrum", "url_canon_dedup", "decontamination",
        "sketch_set_algebra", "media_features"]
    qfns = {n: getattr(Q, f"q_{n}", None) or catalog[n] for n in names}

    times = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qfns[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            df = qfns[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(time.time() - t0)
        runs.sort()
        times[name] = round(runs[len(runs) // 2], 3)
        print(f"  {name}: median={times[name]} runs={[round(r, 3) for r in runs]}",
              file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf": args.sf, "noop": args.noop, "queries": times,
                      "total": round(sum(times.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
