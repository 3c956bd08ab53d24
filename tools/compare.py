#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the oracle SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), sorts
columns by name, canonicalizes values, and diffs row-by-row.

Beyond the value diff, two hardening checks learned from round 6:

1. TYPE GUARD — the round-6 root cause: DuckDB's sum(BIGINT) returns
   HUGEINT (int128). The python fetchall() path converts HUGEINT to a
   lossless int (so this replica stayed green), but a pandas/arrow
   fetch — which the driver's harness evidently uses — converts
   HUGEINT to float64/object, so "300" hashes as "300.0" and every
   row mismatches. The 8 red rows in CORRECTNESS_r06.json were
   exactly the 8 oracles with un-CAST HUGEINT output columns.
   Any oracle whose result schema contains HUGEINT/UHUGEINT, or a
   DECIMAL the Spark side doesn't mirror, now FAILS here even when
   the values agree.

2. DIFF ARTIFACT — on any failure a canonical per-query diff
   (both engines' first mismatching rows, column names, types) is
   written to <verifyOutDir>/DIFF_<name>.json, and environment
   metadata (duckdb version, testdata schemas) to
   <verifyOutDir>/compare_meta.json, so a driver-vs-replica dispute
   becomes a one-line diff instead of a forensic hunt.
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])  # optional: restrict to named queries
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

# engine + data environment fingerprint, for driver-vs-replica triage
meta = {"duckdb": duckdb.__version__, "tables": {}}
for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
    t = os.path.basename(p)[:-len(".parquet")]
    rel = con.sql(f"DESCRIBE SELECT * FROM read_parquet('{p}')")
    meta["tables"][t] = {r[0]: r[1] for r in rel.fetchall()}
json.dump(meta, open(os.path.join(out_dir, "compare_meta.json"), "w"), indent=1)

# types that canonicalize differently across fetch paths (int128 has
# no arrow/pandas native type; decimal round-trips as object/str)
HAZARD_TYPES = ("HUGEINT", "UHUGEINT")


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


def dump_diff(name, scols, srows, ocols, orows, reason):
    s, _ = canon_rows(scols, srows)
    o, _ = canon_rows(ocols, orows)
    pairs = [(a, b) for a, b in zip(sorted(map(repr, s)), sorted(map(repr, o))) if a != b]
    art = {
        "query": name, "reason": reason, "duckdb": duckdb.__version__,
        "spark_cols": sorted(scols), "oracle_cols": sorted(ocols),
        "spark_rows": len(srows), "oracle_rows": len(orows),
        "first_mismatches": pairs[:5],
    }
    json.dump(art, open(os.path.join(out_dir, f"DIFF_{name}.json"), "w"), indent=1)


fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    spark_dir = os.path.join(out_dir, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
    scols, srows = srel.columns, srel.fetchall()
    try:
        orel = con.sql(oracle[name])
        otypes = [str(t) for t in orel.types]
        ocols, orows = orel.columns, orel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails += 1
        continue
    hazards = {c: t for c, t in zip(ocols, otypes)
               if any(h in t for h in HAZARD_TYPES) or t.startswith("DECIMAL")}
    if hazards:
        print(f"FAIL {name}: oracle output type hazard {hazards} "
              f"(HUGEINT/DECIMAL canonicalize differently on the driver's fetch path)")
        dump_diff(name, scols, srows, ocols, orows, f"type hazard {hazards}")
        fails += 1
        continue
    s, sc = canon_rows(scols, srows)
    o, oc = canon_rows(ocols, orows)
    if sc != oc:
        print(f"FAIL {name}: columns {sc} vs {oc}")
        dump_diff(name, scols, srows, ocols, orows, "column mismatch")
        fails += 1
    elif len(s) != len(o):
        print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
        dump_diff(name, scols, srows, ocols, orows, "row count")
        fails += 1
    elif sorted(map(repr, s)) != sorted(map(repr, o)):
        bad = [(a, b) for a, b in zip(s, o) if a != b][:3]
        print(f"FAIL {name}: values differ, e.g. {bad}")
        dump_diff(name, scols, srows, ocols, orows, "value mismatch")
        fails += 1
    else:
        print(f"OK   {name} ({len(s)} rows)")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
