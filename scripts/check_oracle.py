#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
Reads each <verifyOutDir>/<query>/ parquet (Spark output), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
sfDir parquet tables, and compares values exactly (columns sorted by name,
mimicking the driver's hash compare).
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no parquet output"); n_bad += 1; continue
        mine = con.execute(f"SELECT * FROM '{files[0]}'").fetch_arrow_table()
        if name not in oracle:
            print(f"[rows-only] {name}: {mine.num_rows} rows"); n_ok += 1
            continue
        try:
            ref = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_bad += 1; continue
        mc = {c.lower() for c in mine.column_names}
        rc = {c.lower() for c in ref.column_names}
        if mc != rc:
            print(f"[FAIL] {name}: columns {sorted(mc)} vs oracle {sorted(rc)}")
            n_bad += 1; continue
        m = mine.select(sorted(mine.column_names, key=str.lower)).to_pylist()
        r = ref.select(sorted(ref.column_names, key=str.lower)).to_pylist()
        m = [tuple(str(row[k]) for k in sorted(row, key=str.lower)) for row in m]
        r = [tuple(str(row[k]) for k in sorted(row, key=str.lower)) for row in r]
        if m == r:
            print(f"[ok] {name}: {len(m)} rows match"); n_ok += 1
        else:
            diff = [(a, b) for a, b in zip(m, r) if a != b][:3]
            print(f"[FAIL] {name}: {len(m)} vs {len(r)} rows; first diffs: {diff}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
