#!/usr/bin/env python3
"""Render target/bench_full.json as the BASELINE.md per-query table
(min-of-2 and cold first-run columns, 2dp). Errored queries render as
"err"; a pre-round-6 file without a cold map renders a dash, never a
fabricated 0.00."""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_full.json"
d = json.load(open(path))
qs, cs = d["queries"], d.get("cold")


def cell(m, k):
    if m is None or k not in m:
        return "—"
    v = m[k]
    return "err" if v == "err" else f"{float(v):.2f}"


cold_total = f"{d['cold_total']:.1f} s cold" if "cold_total" in d else "no cold map"
print(f"**Total: {d['value']:.1f} s min-of-2 / {cold_total}** ({len(qs)} queries)\n")
print("| query | min sec | cold sec |")
print("|---|---|---|")
for k in sorted(qs):
    print(f"| {k} | {cell(qs, k)} | {cell(cs, k)} |")
