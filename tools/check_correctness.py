#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Mirrors the driver's pandas-based comparator (round-1 lesson: a local
checker that string-canonicalizes passes queries the driver fails, and
vice versa). So: Spark output parquet -> pandas via pyarrow, oracle SQL
-> DuckDB .df() (pandas), columns sorted by name, rows sorted by all
columns, then VALUES COMPARED AT DTYPE LEVEL (no stringification, no
Decimal.normalize). Decimal/object and list-typed output columns are
treated as FORBIDDEN in final schemas, exactly because the driver either
hash-mismatches (decimal repr) or crashes (ndarray sort) on them.
Dev-tooling only — not shipped.
"""
import sys, os, json, glob
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def forbidden_cols(df):
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (Decimal, list, np.ndarray, dict)):
                bad.append((c, type(sample.iloc[0]).__name__))
    return bad


def canon(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def frames_equal(a, b):
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c], b[c]
        # Match the driver: compare post-pandas values. Floats exact
        # (the driver hashes), ints/strings exact, NaN==NaN.
        an, bn = av.isna(), bv.isna()
        if not an.equals(bn):
            return False
        mask = ~an
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            # The driver hash-compares post-pandas VALUES, so int64 99111 vs
            # float64 99111.0 is a MISMATCH even though the numbers are equal
            # (round-3 lesson: q48/q61 shipped red through the old
            # both-to-float compare). One side float => both must be float.
            if not (np.issubdtype(av.dtype, np.floating)
                    and np.issubdtype(bv.dtype, np.floating)):
                print(f"    dtype mix {av.dtype} vs {bv.dtype} "
                      "(int-vs-float hash-mismatches the driver)")
                return False
            if not np.array_equal(av[mask].astype("float64").values,
                                  bv[mask].astype("float64").values):
                return False
        else:
            if not (av[mask].astype(str).values == bv[mask].astype(str).values).all():
                return False
    return True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        name = os.path.basename(d)
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = pd.concat([pq.read_table(f).to_pandas() for f in files],
                        ignore_index=True)
        bad = forbidden_cols(got)
        if bad:
            print(f"FAIL {name}: forbidden output column types {bad} "
                  f"(decimal/list crash or hash-mismatch the driver)")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: rows={len(got)} (no oracle)")
            n_rowsonly += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: schema {sorted(got.columns)} != {sorted(exp.columns)}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if not frames_equal(g, e):
            print(f"FAIL {name}: values differ ({len(g)} vs {len(e)} rows)")
            for i in range(min(len(g), len(e))):
                if not frames_equal(g.iloc[[i]].reset_index(drop=True),
                                    e.iloc[[i]].reset_index(drop=True)):
                    print(f"  first diff row {i}:\n    spark={g.iloc[i].to_dict()}"
                          f"\n    duck ={e.iloc[i].to_dict()}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name}: {len(g)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
