"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin on the same
parquet, compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as E
    from spark_geo.session import get_spark

    spark = get_spark(cores=4, shuffle_partitions=8, app="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(oracles[name]).df()
        a, b = canon(sdf), canon(odf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = ok_rows and ok_cols and a.equals(b)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        print(f"  {name}: {status} (rows {len(a)} vs {len(b)}; cols {ok_cols}; vals {ok_vals})")
        if status == "FAIL":
            failures.append(name)
            if ok_rows and ok_cols:
                neq = ~(a == b).all(axis=1)
                print("    first diffs (spark vs oracle):")
                print(pd.concat([a[neq].head(3), b[neq].head(3)], axis=1).to_string()[:800])
            else:
                print("    spark cols:", list(a.columns), "oracle cols:", list(b.columns))
                print("    spark head:", a.head(2).to_dict("records"))
                print("    oracle head:", b.head(2).to_dict("records"))
    # entry smoke
    rows = E.entry(spark).collect()
    print(f"  entry(): {len(rows)} rows")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
