#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the oracle SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), sorts
columns by name, canonicalizes values, and diffs row-by-row.
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(canon(r[i]) for i in order) for r in rows], [cols[i] for i in order]


fails = 0
for name in sorted(oracle):
    spark_dir = os.path.join(out_dir, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
    scols, srows = srel.columns, srel.fetchall()
    try:
        orel = con.sql(oracle[name])
        ocols, orows = orel.columns, orel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails += 1
        continue
    s, sc = canon_rows(scols, srows)
    o, oc = canon_rows(ocols, orows)
    if sc != oc:
        print(f"FAIL {name}: columns {sc} vs {oc}")
        fails += 1
    elif len(s) != len(o):
        print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
        fails += 1
    elif sorted(map(repr, s)) != sorted(map(repr, o)):
        bad = [(a, b) for a, b in zip(s, o) if a != b][:3]
        print(f"FAIL {name}: values differ, e.g. {bad}")
        fails += 1
    else:
        print(f"OK   {name} ({len(s)} rows)")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
