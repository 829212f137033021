"""Local stand-in for the driver's correctness gate: run every
queries() entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + order-insensitive value hash on name-sorted columns)."""
import os, sys, time, hashlib
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> tuple[int, str]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        # v + 0.0 folds -0.0 into 0.0 (engines can disagree on the
        # sign of a zero sum); \x1f/\x1e separators cannot appear in
        # the fixture text (newlines/pipes DO — joining on them let
        # different row splits hash identical)
        cells = "\x1f".join("NULL" if pd.isna(v) else
                            (f"{v + 0.0:.6f}" if isinstance(v, float)
                             else str(v))
                            for v in t)
        rows.append(cells)
    rows.sort()
    return len(rows), hashlib.md5("\x1e".join(rows).encode()).hexdigest()

def main(only=None):
    import __spark_entry__ as E
    from sketchlib.spark.session import get_spark
    spark = get_spark("contract-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, oracles = E.queries(), E.oracle_sql()
    if only:
        unknown = set(only) - set(qs)
        if unknown:  # a typo must not produce a false-green gate
            raise SystemExit(f"unknown query name(s): {sorted(unknown)}")
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            fails.append(name); continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows [{dt:.1f}s] (rows-only)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            fails.append(name); continue
        (sn, sh), (on, oh) = canon(sdf), canon(odf)
        status = "OK   " if (sn, sh) == (on, oh) else "FAIL "
        extra = "" if status.startswith("OK") else f" spark={sn}/{sh[:8]} oracle={on}/{oh[:8]}"
        print(f"{status} {name}: {sn} rows [{dt:.1f}s]{extra}")
        if status.startswith("FAIL"):
            fails.append(name)
            sc, oc = set(sdf.columns), set(odf.columns)
            if sc != oc:
                print(f"      cols spark={sorted(sc)} oracle={sorted(oc)}")
    print("\nFAILURES:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
