"""Compare two bench.py JSON records and flag per-query movers.

The round checklist requires adjudicating every >1.3x mover between
the current quiet-window bench and the recorded baseline (BASELINE.md
/ a prior BENCH_r{N}.json). This makes that mechanical:

  python scripts/bench_compare.py BENCH_r05.json BENCH_r06.json [threshold]

Prints a sorted table of ratio = new/old for queries present in both
records (bench.py's driver tail sometimes truncates — missing queries
are listed, not silently dropped), plus the median ratio. Exit code 1
if any mover exceeds the threshold (default 1.3), so it can gate.
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        txt = f.read()
    # driver records may wrap the JSON line with metadata or truncate
    # the tail; find the queries object defensively
    try:
        d = json.loads(txt)
    except json.JSONDecodeError:
        at = txt.index('"queries"')
        start = txt.index("{", at)
        depth = 0
        for i in range(start, len(txt)):
            if txt[i] == "{":
                depth += 1
            elif txt[i] == "}":
                depth -= 1
                if depth == 0:
                    return json.loads(txt[start : i + 1])
        # truncated: recover complete "name": value pairs
        import re

        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', txt[start:])
        return {k: float(v) for k, v in pairs}
    if "queries" not in d and "tail" in d:
        # driver record: {"n", "rc", "tail": "<truncated bench line>"}
        import re

        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9][0-9.]*)', d["tail"])
        return {
            k: float(v)
            for k, v in pairs
            if k not in ("sf", "value", "n", "rc", "cpus")
        }
    q = d.get("queries", d)
    if isinstance(q, str):
        q = json.loads(q)
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old, new = _load(old_p), _load(new_p)
    both = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    ratios = {k: new[k] / old[k] for k in both if old[k] > 0}
    med = statistics.median(ratios.values())
    movers = {k: r for k, r in ratios.items() if r > threshold}
    print(f"{len(both)} queries in both; median new/old = {med:.3f}")
    if only_old:
        print(f"only in {old_p}: {', '.join(only_old)}")
    if only_new:
        print(f"only in {new_p}: {', '.join(only_new)}")
    for k in sorted(ratios, key=ratios.get, reverse=True)[:15]:
        flag = "  <-- MOVER" if k in movers else ""
        print(f"{k:36s} {old[k]:8.3f} -> {new[k]:8.3f}  x{ratios[k]:.2f}{flag}")
    return 1 if movers else 0


if __name__ == "__main__":
    sys.exit(main())
