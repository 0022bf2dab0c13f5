#!/usr/bin/env python3
"""Assemble CORRECTNESS_SF01_rNN.json from a tools/check.py transcript.

Usage: python3 tools/mk_sf01_artifact.py <check_output.txt> <round> <out.json> [note]
Parses `OK   name: N rows` / `FAIL name: ...` lines into the committed
second-dataset artifact shape (see round 8's original).
"""
import json, re, sys

src, rnd, out = sys.argv[1], int(sys.argv[2]), sys.argv[3]
note = sys.argv[4] if len(sys.argv) > 4 else (
    "second-dataset oracle sweep (VERDICT r7 item 2), refreshed after the "
    "r8 third-pass operators: full Verify dump at sf0.1 compared by "
    "tools/check.py, which mimics the driver comparator (columns sorted by "
    "name, rows lexsorted, repr equality). The 3 declared rows-only sketch "
    "entries (g14/g14b/t10b) have no oracle_sql and are absent here, as in "
    "the driver gate.")

queries, n_match, n_fail = {}, 0, 0
for line in open(src):
    m = re.match(r"OK\s+(\w+): (\d+) rows", line)
    if m:
        queries[m.group(1)] = {"match": True, "rows": int(m.group(2))}
        n_match += 1
        continue
    m = re.match(r"FAIL (\w+):(.*)", line)
    if m:
        queries[m.group(1)] = {"match": False, "detail": m.group(2).strip()}
        n_fail += 1

doc = {"sf_dir": "/root/testdata/sf0.1", "round": rnd, "note": note,
       "n_match": n_match, "n_fail": n_fail,
       "queries": dict(sorted(queries.items()))}
with open(out, "w") as f:
    json.dump(doc, f, indent=1)
    f.write("\n")
print(f"wrote {out}: {n_match} match, {n_fail} fail")
