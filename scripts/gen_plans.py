"""Regenerate PLANS.md: per-query physical plan node counts for the
whole registry (explain("formatted") at sf0.001). Run after any
plan-affecting change and diff — a new exchange or join-strategy
regression shows up as a one-line diff.

Usage: python scripts/gen_plans.py
"""

from __future__ import annotations

import contextlib
import io
import json
import re
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

COLS = [
    ("scan", r"Scan parquet"),
    ("exch", r"\bExchange\b"),
    ("hagg", r"\bHashAggregate\b"),
    ("oagg", r"ObjectHashAggregate"),
    ("sagg", r"SortAggregate"),
    ("win", r"\bWindow\b|WindowGroupLimit"),
    ("sort", r"\bSort\b"),
    ("bhj", r"BroadcastHashJoin"),
    ("smj", r"SortMergeJoin"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("gen", r"\bGenerate\b"),
    ("fmgp", r"FlatMapGroupsInPandas|FlatMapGroupsInArrow"),
    ("mip", r"MapInPandas|PythonMapInArrow"),
    ("expand", r"\bExpand\b"),
]

HDR = """# PLANS — physical-plan inventory of the whole registry

Machine-generated (`explain("formatted")` at sf0.001, AQE plans are
identical in node KIND at any sf — AQE only re-splits at runtime):
per-query operator-node counts, the raw material behind the plan-guard
assertions in tests/test_plans.py and the scale arguments in SCALE.md.
Regenerate after plan-affecting changes (`python scripts/gen_plans.py`)
and diff: a new exchange, a SortMergeJoin where a broadcast belongs, or
a BroadcastNestedLoopJoin outside the 1-row-scalar allowlist shows up
as a one-line diff here.

Column legend: scan=parquet scans, exch=Exchange (shuffles; broadcast
exchanges are NOT counted here), hagg/oagg=hash/object-hash
aggregates (partial+final each count), win=Window, sort=Sort,
bhj/smj/shj=broadcast-hash / sort-merge / shuffled-hash joins,
bnlj=BroadcastNestedLoopJoin (every occurrence is a 1-row scalar
broadcast from the documented allowlist — tests/test_plans.py:84),
gen=Generate (explode), mip/fmgp=mapInPandas / grouped-pandas Python
stages, expand=Expand (rollup/cube/grouping-sets multiplier).

Notes on the SortMergeJoin sites: merge_dim/merge_fact/
decimal_merge_fact/snapshot_diff are big-big FULL-OUTER merges (no
broadcastable side by definition); gap_fill_* join the spine to the
fact at equal cardinality; q17's semi-joined per-part averages are
bounded by part count. The IVF probe join formerly planned an SMJ
(corpus shuffled on cid); it now broadcasts the probe list
(plan-guarded in test_ivf_probe_broadcasts_onto_corpus), and
rank_fusion's dense leg composes the same retriever. Everything
else joins broadcast.

Codegen-size regression note (r15): multimodal_audio_mpeg_l2_hr's
fixture projection used to exceed janino's 64 KB method cap (4
compile ERRORs per run, silent interpreted fallback — whole-stage
codegen cannot split expressions pipelined over local variables).
Each frame's hex now evaluates inside a single-element transform()
lambda, which runs outside whole-stage codegen by design: no compile
attempt, clean logs, the same executor-side linear evaluation —
deliberate and bounded at one 288-byte frame per lambda
(operators/multimodal.py::synth_mpeg_audio_l2hr_assets).
"""


def source_fingerprint(spec) -> str:
    """sha256 over (function source, oracle SQL) — recorded to
    .plans_src_hashes.json at generation time so tests/test_lockstep.py
    can detect a query whose implementation changed after the last
    PLANS.md regeneration without re-running explain()."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(spec.fn)
    except OSError:
        src = repr(spec.fn)
    h = hashlib.sha256()
    h.update(src.encode())
    h.update((spec.oracle or "").encode())
    return h.hexdigest()


def main() -> None:
    from pyspark.sql import SparkSession

    from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    rows = []
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # count each physical node exactly once via its detail header
        # "(N) NodeName" — the tree section would double-count and node
        # names leak into argument text
        headers = re.findall(r"^\(\d+\) ([A-Za-z ]+?)(?: \[codegen.*)?$",
                             plan, re.M)
        counts = {
            key: sum(1 for h in headers if re.search(pat, h))
            for key, pat in COLS
        }
        counts["sort"] = sum(
            1 for h in headers if re.search(r"^Sort$", h.strip())
        )
        rows.append((name, counts))
        print(name, "done", file=sys.stderr)

    with open("/root/repo/PLANS.md", "w") as f:
        f.write(HDR + "\n")
        f.write(
            "| query | " + " | ".join(k for k, _ in COLS) + " |\n"
        )
        f.write("|---" * (len(COLS) + 1) + "|\n")
        for name, c in rows:
            cells = " | ".join(
                (str(c[k]) if c[k] else "") for k, _ in COLS
            )
            f.write(f"| `{name}` | {cells} |\n")
    with open("/root/repo/.plans_src_hashes.json", "w") as f:
        json.dump(
            {n: source_fingerprint(REGISTRY[n]) for n in sorted(REGISTRY)},
            f, indent=0, sort_keys=True,
        )
    print(f"wrote PLANS.md with {len(rows)} rows + source snapshot")


if __name__ == "__main__":
    main()
