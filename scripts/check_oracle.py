#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate — DRIVER-FAITHFUL.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

The driver loads both sides into PANDAS (Spark parquet via pyarrow,
oracle via duckdb .fetchdf()), sorts columns by name, sorts rows, and
hashes with pandas.util.hash_pandas_object — which is DTYPE-SENSITIVE.
The round-9 postmortem: an Arrow-stringify compare here erased exactly
the int64-vs-float64 difference the driver trips on (DuckDB SUM(BIGINT)
returns HUGEINT -> float64 in fetchdf; Spark writes int64), so 10
queries shipped locally-green and driver-red. This version reproduces
the driver's compare semantics:

  1. pandas on both sides (duckdb .fetchdf() for the oracle, pyarrow
     read for the Spark parquet).
  2. Column-name sets must match (case-insensitive, like the driver).
  3. Rows sorted with DataFrame.sort_values on all columns — a list/
     ndarray column makes this CRASH on the driver, so it is a FAIL
     here (output contract: scalar columns only).
  4. DTYPE-STRICT kind check per column BEFORE value compare: integer
     vs float vs object vs bool vs datetime mismatches FAIL even when
     values are numerically equal. (Int width and float32/64 are
     normalized — hash_pandas_object hashes the 64-bit value, so those
     compare equal on the driver too. Datetimes are normalized to ns.)
  5. Value compare via pandas.util.hash_pandas_object on the sorted
     frame — the same primitive the driver hashes with.
"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(qdir):
    files = sorted(glob.glob(f"{qdir}/*.parquet"))
    if not files:
        return None
    frames = [pd.read_parquet(f) for f in files]
    return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]


def kind_of(dtype):
    """Normalized dtype kind: the equivalence classes hash_pandas_object
    preserves. int*/uint* -> 'i'; float* -> 'f'; datetime -> 'M';
    bool -> 'b'; everything else (object: str/Decimal/list) -> 'O'."""
    k = dtype.kind
    if k == 'u':
        return 'i'
    return k


def normalize(df):
    """Lowercase + sort columns, widen ints/floats, datetimes to ns."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        k = df[c].dtype.kind
        if k in 'iu':
            df[c] = df[c].astype('int64')
        elif k == 'f':
            df[c] = df[c].astype('float64')
        elif k == 'M':
            df[c] = df[c].astype('datetime64[ns]')
    return df


def compare(name, mine, ref):
    """Returns (ok: bool, msg: str)."""
    if set(mine.columns) != set(ref.columns):
        return False, f"columns {sorted(mine.columns)} vs oracle {sorted(ref.columns)}"
    ref = ref[mine.columns.tolist()]
    if len(mine) != len(ref):
        return False, f"row count {len(mine)} vs oracle {len(ref)}"
    # dtype-strict BEFORE value compare — the driver's hash is dtype-
    # sensitive, so kind mismatches are failures even with equal values.
    bad = [(c, str(mine[c].dtype), str(ref[c].dtype)) for c in mine.columns
           if kind_of(mine[c].dtype) != kind_of(ref[c].dtype)]
    if bad:
        return False, "DTYPE mismatch (driver hash would differ even on equal values): " + \
            ", ".join(f"{c}: spark={a} oracle={b}" for c, a, b in bad)
    # object columns holding non-hashable values (lists/ndarrays/dicts)
    # crash the driver's sort -> FAIL with a clear message.
    for c in mine.columns:
        for df_, side in ((mine, "spark"), (ref, "oracle")):
            if df_[c].dtype.kind == 'O' and len(df_) > 0:
                v = df_[c].iloc[0]
                if isinstance(v, (np.ndarray, list, dict)):
                    return False, (f"column '{c}' on {side} side is {type(v).__name__} — "
                                   "driver-unhashable; serialize it (array_join) in the query")
    cols = mine.columns.tolist()
    try:
        ms = mine.sort_values(cols, kind="mergesort").reset_index(drop=True)
        rs = ref.sort_values(cols, kind="mergesort").reset_index(drop=True)
    except TypeError as e:
        return False, f"row sort failed (driver would crash the same way): {e}"
    hm = pd.util.hash_pandas_object(ms, index=False)
    hr = pd.util.hash_pandas_object(rs, index=False)
    if hm.equals(hr):
        return True, f"{len(ms)} rows match (dtype-strict hash)"
    neq = (hm != hr)
    idx = neq[neq].index[:3]
    diffs = [(tuple(ms.iloc[i]), tuple(rs.iloc[i])) for i in idx]
    return False, f"hash mismatch on {int(neq.sum())}/{len(ms)} rows; first: {diffs}"


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark directory-parquet (e.g. GrowFixture)
            # recursive glob + hive_partitioning: a partitioned Spark write
            # (key=value subdirs) has no files directly under the dir, and
            # an empty dir would make CREATE VIEW error instead of being
            # skipped like a missing file (ADVICE r12). A crashed write
            # leaves _temporary/attempt_* part files — ingesting those
            # would silently corrupt the oracle input, so fail LOUDLY on
            # them instead of globbing them in.
            files = glob.glob(f"{p}/**/*.parquet", recursive=True)
            stale = [f for f in files if "_temporary" in f.split(os.sep)]
            if stale:
                sys.exit(f"{p} contains _temporary attempt files from a "
                         f"crashed write (e.g. {stale[0]}) — clean or "
                         "regenerate the fixture")
            if files:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{p}/**/*.parquet', hive_partitioning=true)")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or (only and name != only):
            continue
        mine = load_spark(qdir)
        if mine is None:
            print(f"[FAIL] {name}: no parquet output"); n_bad += 1; continue
        if name not in oracle:
            print(f"[rows-only] {name}: {len(mine)} rows"); n_ok += 1
            continue
        try:
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_bad += 1; continue
        try:
            ok, msg = compare(name, normalize(mine), normalize(ref))
        except Exception as e:
            ok, msg = False, f"compare crashed: {type(e).__name__}: {e}"
        if ok:
            print(f"[ok] {name}: {msg}"); n_ok += 1
        else:
            print(f"[FAIL] {name}: {msg}"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    only = sys.argv[3] if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
