#!/usr/bin/env python3
"""Render target/bench_full.json as the BASELINE.md per-query table
(min-of-2 and cold first-run columns, 2dp)."""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "target/bench_full.json"
d = json.load(open(path))
qs, cs = d["queries"], d.get("cold", {})
print(f"**Total: {d['value']:.1f} s min-of-2 / "
      f"{d.get('cold_total', 0):.1f} s cold** ({len(qs)} queries)\n")
print("| query | min sec | cold sec |")
print("|---|---|---|")
for k in sorted(qs):
    print(f"| {k} | {float(qs[k]):.2f} | {float(cs.get(k, 0)):.2f} |")
