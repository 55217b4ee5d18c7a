#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB (tables = parquet files in sfDir),
sort columns by name, sort rows, compare values (exact for ints/strings,
rtol 1e-9 for floats since the driver hashes — we flag ANY float diff).
"""
import json
import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((x is None, str(type(x)), str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b  # driver hashes → must be exactly equal
        return float(a) == float(b)
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        rel = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = [d[0] for d in rel.description]
        got = rel.fetchall()
        if name not in oracle:
            n_rowsonly += 1
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY!"
            print(f"{status:18s} {name:28s} rows={len(got)}")
            continue
        try:
            orel = con.execute(oracle[name])
            exp_cols = [d[0] for d in orel.description]
            exp = orel.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"{'ORACLE-ERR':18s} {name:28s} {e}")
            continue
        g, gc = canon(got, got_cols)
        x, xc = canon(exp, exp_cols)
        if gc != xc:
            n_fail += 1
            print(f"{'COLS-MISMATCH':18s} {name:28s} spark={gc} duck={xc}")
            continue
        if len(g) != len(x):
            n_fail += 1
            print(f"{'ROWS-MISMATCH':18s} {name:28s} spark={len(g)} duck={len(x)}")
            continue
        bad = None
        for i, (gr, xr) in enumerate(zip(g, x)):
            if not all(eq(a, b) for a, b in zip(gr, xr)):
                bad = (i, gr, xr)
                break
        if bad:
            n_fail += 1
            print(f"{'VALUE-MISMATCH':18s} {name:28s} row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}\n  cols ={gc}")
        else:
            n_pass += 1
            print(f"{'PASS':18s} {name:28s} rows={len(g)}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
