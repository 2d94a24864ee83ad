"""Summarize .sweep_sf1/results.jsonl into the round-12 section of
CORRECTNESS_LOCAL_sf1.md: parity tally, the sf1/sf0.1 wall-ratio
distribution, and the table of >THRESHOLD movers that need a named
cause (the full per-query table goes to .sweep_sf1/ratios.md for
reference; the record keeps the movers + the tally).

Usage: python scripts/sf1_report.py [threshold]
"""

from __future__ import annotations

import json
import statistics
import sys

THRESHOLD = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0

rows = [json.loads(line) for line in open(".sweep_sf1/results.jsonl")]
seen: dict[str, dict] = {}
for r in rows:
    seen[r["name"]] = r  # last write wins (re-runs supersede)
rows = sorted(seen.values(), key=lambda r: r["name"])

passed = [r for r in rows if r.get("parity") == "pass"]
engine_only = [r for r in rows if str(r.get("parity", "")).startswith("engine-only")]
failed = [r for r in rows if r not in passed and r not in engine_only]

ratios = sorted(
    (r for r in rows if r.get("ratio") is not None),
    key=lambda r: -r["ratio"],
)
vals = [r["ratio"] for r in ratios]
print(f"queries: {len(rows)}  parity pass: {len(passed)}  "
      f"engine-only: {len(engine_only)}  FAILED: {len(failed)}")
for r in failed:
    print("  FAIL:", r["name"], r.get("parity"), r.get("error"))
print(f"ratio sf1/sf0.1 — median {statistics.median(vals):.2f}, "
      f"p90 {sorted(vals)[int(len(vals) * 0.9)]:.2f}, max {vals[0]:.2f}")
print(f"\nmovers > {THRESHOLD}x:")
for r in ratios:
    if r["ratio"] > THRESHOLD:
        print(f"  {r['name']}: sf0.1={r['sf01_s']}s sf1={r['sf1_s']}s "
              f"ratio={r['ratio']}")

with open(".sweep_sf1/ratios.md", "w") as f:
    f.write("| query | sf0.1 s | sf1 s | ratio | parity |\n|---|---|---|---|---|\n")
    for r in ratios:
        f.write(f"| {r['name']} | {r.get('sf01_s')} | {r.get('sf1_s')} | "
                f"{r.get('ratio')} | {str(r.get('parity'))[:30]} |\n")
print("\nfull table -> .sweep_sf1/ratios.md")
