#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev-only, not part
of the engine). Usage: compare.py <sfDir> <verifyOutDir>

Registers each fixture parquet as a view named after the table, runs each
oracle_sql.json entry, and compares against the Spark parquet dump:
columns sorted by name, rows sorted, floats compared to 1e-9 rel tol.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import glob, os

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for sorting: stringify everything except floats
    key = df.apply(lambda r: tuple(str(v) for v in r), axis=1) if len(df) else None
    df = df.iloc[key.argsort(kind="stable")] if len(df) else df
    return df.reset_index(drop=True)

def cells_equal(a, b):
    import datetime
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
    if isinstance(a, (datetime.date, datetime.datetime, pd.Timestamp)) and \
       isinstance(b, (datetime.date, datetime.datetime, pd.Timestamp)):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        got = canon(pq.read_table(spark_dir).to_pandas())
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cells_equal(got[c].iloc[i], exp[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], exp[c].iloc[i]); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
