#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, canonicalizes both sides (columns sorted by name, rows sorted by all
columns, values stringified) and diffs. Dev-tooling only — not shipped.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_value(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, list):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(n for n in names), out


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
        files = glob.glob(os.path.join(d, "*.parquet"))
        tbl = pa.concat_tables([pq.read_table(f) for f in files]) if files else None
        if tbl is None:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got_names = tbl.column_names
        got_rows = [tuple(r[c] for c in got_names) for r in tbl.to_pylist()]
        if name not in oracles:
            print(f"ROWS {name}: rows={len(got_rows)} (no oracle)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            exp_names = [x[0] for x in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gn, gr = canon(got_rows, got_names)
        en, er = canon(exp_rows, exp_names)
        if gn != en:
            print(f"FAIL {name}: schema {gn} != {en}")
            n_fail += 1
        elif gr != er:
            print(f"FAIL {name}: rows {len(gr)} vs {len(er)}")
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    print(f"  first diff row {i}:\n    spark={a}\n    duck ={b}")
                    break
            if len(gr) != len(er):
                only_g = set(gr) - set(er)
                only_e = set(er) - set(gr)
                for r in list(only_g)[:3]:
                    print(f"  only-spark: {r}")
                for r in list(only_e)[:3]:
                    print(f"  only-duck : {r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(gr)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
