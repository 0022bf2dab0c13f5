#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name ...]

Mimics the DRIVER's comparator as closely as possible: both sides are
materialized as pandas DataFrames (so DuckDB HUGEINT becomes float64,
exactly like the driver sees), columns sorted by name, rows lexsorted
over all columns (array columns raise, like the driver), and values
compared by their repr — no rounding, so float64 '14985.0' vs int64
'14985' is a FAIL here just as it hashes differently there.
"""
import json, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
unknown = only - set(oracle)
if unknown:
    sys.exit(f"unknown query name(s): {sorted(unknown)} — not in oracle_sql.json")

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df

def cells(df):
    return [tuple(repr(v) for v in row) for row in df.itertuples(index=False)]

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        sdf = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        ddf = canon(con.sql(sql).df())
        srows, drows = cells(sdf), cells(ddf)
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails += 1
        continue
    if [c.lower() for c in sdf.columns] != [c.lower() for c in ddf.columns]:
        print(f"FAIL {name}: columns spark={list(sdf.columns)} duck={list(ddf.columns)}")
        fails += 1
    elif srows != drows:
        diff_s = [r for r in srows if r not in set(drows)][:3]
        diff_d = [r for r in drows if r not in set(srows)][:3]
        print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
        print(f"  spark-only: {diff_s}")
        print(f"  duck-only:  {diff_d}")
        fails += 1
    else:
        print(f"OK   {name}: {len(srows)} rows")
print(f"\n{(len(only) or len(oracle))-fails} match, {fails} fail")
sys.exit(1 if fails else 0)
