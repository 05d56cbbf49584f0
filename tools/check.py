#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare rows/schema/hash per query.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]
(run `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"` first)
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import hashlib

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    return hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_noora = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"{name}: NO OUTPUT"); n_fail += 1; continue
        spark_df = pd.read_parquet(qdir)
        if name not in oracles:
            print(f"{name}: no_oracle (rows={len(spark_df)})"); n_noora += 1; continue
        try:
            ora_df = con.execute(oracles[name]).fetchdf()
            a, b = norm(spark_df.copy()), norm(ora_df.copy())
            rows = len(a) == len(b)
            schema = list(a.columns) == list(b.columns)
            try:
                hmatch = rows and schema and (a.astype(object).where(pd.notnull(a), None).equals(
                    b.astype(object).where(pd.notnull(b), None)) or h(a) == h(b))
            except Exception:
                hmatch = False
            status = "PASS" if (rows and schema and hmatch) else "FAIL"
            if status == "PASS": n_pass += 1
            else:
                n_fail += 1
                print(f"{name}: {status} rows={len(spark_df)}/{len(ora_df)} schema={schema} hash={hmatch}")
                if rows and schema and not hmatch:
                    merged = a.compare(b) if a.shape == b.shape else None
                    if merged is not None and len(merged):
                        print(merged.head(5))
                continue
            print(f"{name}: PASS ({len(spark_df)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"{name}: ORACLE ERR {str(e)[:200]}")
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_noora}")

if __name__ == "__main__":
    main()
