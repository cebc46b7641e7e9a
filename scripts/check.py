#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sf_dir] [out_dir]

Runs DuckDB on each oracle_sql.json entry (tables registered under bare
names) and compares with the Verify-dumped parquet: schema (column-name
set), row count, and a hash of the row-sorted, column-name-sorted values.
This is a *local dev tool only* — the shipped library is pure Scala/Spark.
"""
import sys, json, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    pq = f"{out}/{name}"
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output dir"); fail += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    got = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        print(f"FAIL {name}: cols exp={ec} got={gc}"); fail += 1; continue
    e = exp[ec].sort_values(ec, kind="mergesort").reset_index(drop=True)
    g = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
    if len(e) != len(g):
        print(f"FAIL {name}: rows exp={len(e)} got={len(g)}"); fail += 1; continue
    # value compare (exact; floats must match bit-for-bit per our rules).
    # dtype-KIND-strict: the driver's hasher tolerates integer WIDTH
    # differences (row_number int32 in Spark vs int64 in DuckDB hashed green
    # in round 1) but NOT kind drift (DuckDB SUM -> HUGEINT -> float64 vs
    # Spark BIGINT burned 14 queries). Upcast ints to int64 on both sides,
    # then compare dtype-strict so int-vs-float kind drift still fails.
    import pandas as pd
    for df in (e, g):
        for c in df.columns:
            if df[c].dtype.kind in "iu":
                df[c] = df[c].astype("int64")
    try:
        pd.testing.assert_frame_equal(e, g, check_dtype=True, check_exact=True)
        print(f"PASS {name} ({len(e)} rows)")
    except AssertionError as ex:
        print(f"FAIL {name}: value mismatch\n{str(ex)[:500]}"); fail += 1
print(("ALL PASS", "FAILURES: %d" % fail)[fail > 0])
sys.exit(1 if fail else 0)
