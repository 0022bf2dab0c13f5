#!/usr/bin/env python3
"""SS12 bench adjudication, mechanized: compare two BENCH_FULL files.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [floor_ratio floor_abs]

Prints the common-key raw ratio, the canary-normalized ratio, the
spread-gate tier, and every row above the regression floor, so a
round's drift question starts from one reproducible report instead of
ad-hoc arithmetic.

Canary estimator (ADVICE r16): like-for-like across eras — canary_med
on both sides when BOTH artifacts carry it (the r16+ interleaved
protocol), else canary_min on BOTH sides (the legacy end-of-pass
estimator; min is systematically below median, so mixing the two
inflates the host ratio and deflates normalized ratios, masking real
regressions). The report names the estimator used.

Spread gate, TIERED (r16 verdict #3 — the flat <0.10 gate never
passed on this host class; measured truth is 0.19-0.31 across four
same-day quiet-host runs, so a single threshold routed EVERY fleet
verdict to the pair protocol forever):
  - spread <= 0.10  FULL TRUST: fleet-level adjudication at the
    standard floor (1.25x normalized AND +0.3 s absolute).
  - 0.10 < spread <= 0.35  ADJUDICATE WIDENED: the host reference is
    within its measured normal band — fleet verdicts stand, but the
    per-key floor widens to 1.4x (same absolute arm) so host jitter
    at the band's edge cannot mint regression candidates; rows above
    the WIDENED floor are still pair-protocol candidates, not
    verdicts.
  - spread > 0.35  DEFER: a contended window (r16 measured med/min
    gaps to 3.7x above this line) — no fleet verdict from this pair;
    per-key questions go straight to the fresh-JVM pair protocol
    with an untouched sibling key as the host reference (the r16
    e5-vs-e3 template).
An explicit [floor_ratio] argument overrides the tier's floor.
"""
import json
import sys

old_f, new_f = sys.argv[1], sys.argv[2]
floor_override = float(sys.argv[3]) if len(sys.argv) > 3 else None
floor_abs = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3

o = json.load(open(old_f))
n = json.load(open(new_f))

# like-for-like estimator: med needs BOTH sides, else min on both
use_med = "canary_med" in o and "canary_med" in n
est = "canary_med" if use_med else "canary_min"


def canary(d):
    return d[est]


qo, qn = o["queries"], n["queries"]
common = sorted(set(qo) & set(qn))
raw = sum(qn[k] for k in common) / sum(qo[k] for k in common)
host = canary(n) / canary(o)
print(f"common keys : {len(common)}  (+{len(set(qn) - set(qo))} new, "
      f"-{len(set(qo) - set(qn))} gone)")
print(f"raw ratio   : {raw:.3f}  (sum {sum(qn[k] for k in common):.1f}s "
      f"vs {sum(qo[k] for k in common):.1f}s)")
print(f"canary      : {canary(o):.3f} -> {canary(n):.3f}  (host {host:.2f}x, "
      f"estimator {est}{'' if use_med else ' — like-for-like legacy fallback'})")
print(f"normalized  : {raw / host:.3f}")

spread = n.get("canary_spread")
if spread is None:
    tier, floor_ratio = "n/a (pre-r16 artifact) — standard floor", 1.25
elif spread <= 0.10:
    tier, floor_ratio = "FULL TRUST — fleet adjudication at the standard floor", 1.25
elif spread <= 0.35:
    tier, floor_ratio = ("ADJUDICATE WIDENED — fleet verdicts stand, "
                         "per-key floor widened to 1.4x"), 1.4
else:
    tier, floor_ratio = ("DEFER — contended window, no fleet verdict; "
                         "per-key questions go to the pair protocol"), 1.4
if floor_override is not None:
    floor_ratio = floor_override
if spread is not None:
    print(f"spread gate : {spread:.3f}  ({tier})")
else:
    print(f"spread gate : {tier}")

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
