#!/usr/bin/env python3
"""SS12 bench adjudication, mechanized: compare two BENCH_FULL files.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [floor_ratio floor_abs]

Prints the common-key raw ratio, the canary-normalized ratio (new
canary_med preferred, canary_min fallback — pre-r16 artifacts only
carry min), the spread gate verdict, and every row above the
regression floor (default 1.25x normalized AND 0.3 s absolute), so a
round's drift question starts from one reproducible report instead of
ad-hoc arithmetic. Per SS12: a new-run canary_spread > 0.10 means
fleet-level drift may NOT be adjudicated from this pair — per-key
floor rows then go to the fresh-JVM pair protocol with an untouched
sibling key as the host reference (the r16 e5-vs-e3 template).
"""
import json
import sys

old_f, new_f = sys.argv[1], sys.argv[2]
floor_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
floor_abs = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3

o = json.load(open(old_f))
n = json.load(open(new_f))


def canary(d):
    # canary_med (r16+ interleaved protocol) over canary_min (legacy)
    return d.get("canary_med") or d["canary_min"]


qo, qn = o["queries"], n["queries"]
common = sorted(set(qo) & set(qn))
raw = sum(qn[k] for k in common) / sum(qo[k] for k in common)
host = canary(n) / canary(o)
print(f"common keys : {len(common)}  (+{len(set(qn) - set(qo))} new, "
      f"-{len(set(qo) - set(qn))} gone)")
print(f"raw ratio   : {raw:.3f}  (sum {sum(qn[k] for k in common):.1f}s "
      f"vs {sum(qo[k] for k in common):.1f}s)")
print(f"canary      : {canary(o):.3f} -> {canary(n):.3f}  (host {host:.2f}x)")
print(f"normalized  : {raw / host:.3f}")
spread = n.get("canary_spread")
if spread is not None:
    gate = "OK — fleet-level adjudication allowed" if spread <= 0.10 else \
        "EXCEEDED — defer fleet verdicts to the pair protocol"
    print(f"spread gate : {spread:.3f}  ({gate})")
else:
    print("spread gate : n/a (pre-r16 artifact)")
print(f"\nrows above the floor ({floor_ratio}x normalized AND "
      f"+{floor_abs}s absolute):")
flagged = False
for k in common:
    norm = (qn[k] / canary(n)) / (qo[k] / canary(o))
    if norm > floor_ratio and qn[k] - qo[k] > floor_abs:
        flagged = True
        print(f"  {k}: {norm:.2f}x  {qo[k]:.3f} -> {qn[k]:.3f} "
              f"({qn[k] - qo[k]:+.2f}s) -> pair-protocol candidate")
if not flagged:
    print("  (none)")
new_keys = {k: qn[k] for k in sorted(set(qn) - set(qo))}
if new_keys:
    print("\nnew keys:", ", ".join(f"{k}={v:.2f}s" for k, v in new_keys.items()))
