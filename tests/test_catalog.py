"""Driver-contract catalog invariants (round 5): the CORRECTNESS
snapshot holds 50 rows, so the catalog must stay at exactly 50
entries with every oracle-checked query ahead of every rows-only
entry — otherwise registered queries silently fall outside driver
coverage (VERDICT r4 top finding)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_catalog_is_50_with_oracle_entries_first():
    import __spark_entry__ as E
    q, o = E.queries(), E.oracle_sql()
    assert len(q) == 50, f"driver snapshot caps at 50, catalog has {len(q)}"
    assert set(o) <= set(q), sorted(set(o) - set(q))
    ks = list(q)
    n_oracle = len(o)
    assert all(k in o for k in ks[:n_oracle]), (
        "oracle-checked queries must precede rows-only entries")
    assert all(k not in o for k in ks[n_oracle:])


def test_oracle_sql_strings_are_valid_duckdb(tmp_path):
    """Every oracle parses and runs in DuckDB against the sf0.001
    fixtures (cheap guard against SQL typos reaching the driver)."""
    import duckdb
    import __spark_entry__ as E
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    for name, sql in E.oracle_sql().items():
        con.sql(sql).df()
