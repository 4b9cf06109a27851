#!/usr/bin/env python3
"""Render target/bench_full.json as the BASELINE.md per-query table.
Round-8 format: run1/run2 columns (min is derivable but printed first
for the 2x-bar comparison) plus the per-run memo-build counts, so any
"min-of-2 was not memo-warm" claim is checkable per query. Errored
queries render as "err"; older files (pre-r8 "cold" map, or neither)
degrade to the columns they have — never a fabricated 0.00."""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_full.json"
d = json.load(open(path))
qs = d["queries"]
r1, r2 = d.get("run1") or d.get("cold"), d.get("run2")
builds = d.get("builds")


def cell(m, k):
    if m is None or k not in m:
        return "—"
    v = m[k]
    return "err" if v == "err" else f"{float(v):.2f}"


def bcell(k):
    if builds is None or k not in builds:
        return "—"
    b = builds[k]
    return f"{b[0]}/{b[1]}"


cold_total = f"{d['cold_total']:.1f} s cold" if "cold_total" in d else "no cold map"
print(f"**Total: {d['value']:.1f} s min-of-2 / {cold_total}** ({len(qs)} queries)\n")
print("| query | min sec | run1 sec | run2 sec | builds r1/r2 |")
print("|---|---|---|---|---|")
for k in sorted(qs):
    print(f"| {k} | {cell(qs, k)} | {cell(r1, k)} | {cell(r2, k)} | {bcell(k)} |")
