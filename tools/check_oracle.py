#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL from
Verify's oracle_sql.json in DuckDB over the same parquet tables, and compare
with the Spark result parquet (columns sorted by name, rows sorted, values
hashed loosely). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

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
            print(f"MISSING  {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pd.read_parquet(spark_dir))
            rel = con.sql(sql)
            # The driver hashes exact values; DuckDB HUGEINT becomes float64 in
            # pandas, so allclose would mask a guaranteed driver hash-mismatch.
            # Fail loudly here instead (cast sums AS BIGINT in the oracle).
            huge = [cn for cn, ct in zip(rel.columns, rel.types)
                    if "HUGEINT" in str(ct).upper()]
            if huge:
                print(f"TYPE     {name}: HUGEINT oracle column(s) {huge} — "
                      f"CAST AS BIGINT in the oracle SQL"); n_fail += 1; continue
            want = norm(rel.fetchdf())
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_fail += 1; continue
        if got.shape != want.shape:
            print(f"SHAPE    {name}: spark{got.shape} duckdb{want.shape}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"COLS     {name}: spark{list(got.columns)} duckdb{list(want.columns)}"); n_fail += 1; continue
        # value compare with float tolerance
        ok = True
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                        ok = False; break
                else:
                    if not (a.astype(str) == b.astype(str)).all():
                        ok = False; break
            except Exception as e:
                ok = False; break
        if ok:
            print(f"PASS     {name} ({got.shape[0]} rows)"); n_pass += 1
        else:
            print(f"VALUES   {name}: column '{c}' differs")
            merged = pd.concat([a.rename('spark'), b.rename('duckdb')], axis=1)
            print(merged[merged.spark.astype(str) != merged.duckdb.astype(str)].head(5))
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
