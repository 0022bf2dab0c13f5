#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name> parquet against oracle_sql.json run in
DuckDB with views named after the testdata tables. Values compared
after sorting columns by name and rows by all columns, floats rounded
to 9 significant-ish decimals to spot real mismatches vs noise.
"""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols, srows = norm(spark_rel.fetchall(), spark_rel.columns)
        duck_rel = con.sql(sql)
        dcols, drows = norm(duck_rel.fetchall(), duck_rel.columns)
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails += 1
        continue
    if [c.lower() for c in scols] != [c.lower() for c in dcols]:
        print(f"FAIL {name}: columns spark={scols} duck={dcols}")
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
print(f"\n{len(oracle)-fails}/{len(oracle)} match")
sys.exit(1 if fails else 0)
