#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet result against its DuckDB oracle SQL on the same
testdata tables. Columns sorted by name, rows sorted by all columns."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0

# A query added to SparkEntry.queries but forgotten in oracleSql would
# otherwise be dumped yet never compared — a silent false pass of the
# gate. Any q* result dir without an oracle entry is a failure.
dumped = {os.path.basename(d) for d in glob.glob(f"{out_dir}/q*")
          if os.path.isdir(d)}
for orphan in sorted(dumped - set(oracle.keys())):
    print(f"NOORACLE {orphan}: result dumped but no oracle SQL entry")
    fail += 1


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"MISSING {name}"); fail += 1; continue
    # one try per query: a canon/compare crash (e.g. TypeError sorting a
    # list-valued column) must record ONE failure and keep checking the
    # rest, not kill the script before the summary line
    try:
        spark_df = con.sql(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
        duck_df = con.sql(sql).df()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"SCHEMA  {name}: spark={list(a.columns)} "
                  f"duck={list(b.columns)}")
            fail += 1; continue
        if len(a) != len(b):
            print(f"ROWS    {name}: spark={len(a)} duck={len(b)}")
            fail += 1; continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"OK      {name} ({len(a)} rows)"); ok += 1
        except AssertionError as ex:
            print(f"VALUES  {name}: {str(ex)[:300]}")
            fail += 1
    except Exception as ex:
        print(f"ERROR   {name}: {type(ex).__name__}: {str(ex)[:200]}")
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
