#!/usr/bin/env python3
"""Local self-check mimicking the driver's t2 oracle compare.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sf_dir parquet
tables, and compares row count, column names, and cell values
(column-name-sorted, row-sorted, with numeric normalization).
"""
import sys, os, json, glob, math
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    return cols, sorted(zip(*data), key=lambda r: tuple(str(norm(x)) for x in r)) if data else (cols, [])


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = n_noracle = 0
    for res_dir in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(res_dir.rstrip("/"))
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        if name not in oracle:
            print(f"SKIP {name}: no oracle sql (rows={spark_tbl.num_rows})")
            n_noracle += 1
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = rows_of(spark_tbl)
        dc, dr = rows_of(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            na, nb = tuple(norm(x) for x in a), tuple(norm(x) for x in b)
            ok = all(
                (isinstance(x, float) and isinstance(y, float)
                 and (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6)))
                or x == y
                for x, y in zip(na, nb))
            if not ok:
                bad = (i, na, nb)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
