"""Full-registry sf1 parity + ratio sweep (VERDICT r11 item 5).

For every oracle-backed registry query: run the Spark side at sf0.1
(timed) and at sf1 (timed + DuckDB-oracle parity), and record the
sf1/sf0.1 wall-time ratio. A query whose cost is linear in data volume
should land near 10x under identical parallelism and well under that
when fixed costs (session, planning, fixture synthesis) dominate; a
ratio far above ~30x flags super-linear work — exactly the class the
round-10 sweep caught in ann_recall_at_5/ndcg_at_5.

Oracle exclusions (engine-only rows, documented in
CORRECTNESS_LOCAL_sf1.md "Not swept at sf1"): the deliberately
quadratic-in-bucket DuckDB verification twins, where the ORACLE (not
the engine) is the sf1 bottleneck. Their Spark side still runs and is
timed at both scales.

Results stream to SWEEP_SF1.jsonl at the repo root (one JSON object
per query, append-mode so an interrupted sweep resumes with --resume).
The record is COMMITTED (VERDICT r16 item 8): it is the
driver-reproducible scale evidence — tiny per-query seconds, not the
dataset. Regenerate end-to-end with `python scripts/make_sf1.py`
(derives the sf1 parquet set deterministically from /root/testdata)
followed by `python scripts/sweep_sf1.py` on the tree under test.

Usage: python scripts/sweep_sf1.py [--resume] [--only name1,name2]
       python scripts/sweep_sf1.py --check

--check is the RATIO GATE (VERDICT r12 item 2): it re-reads the
recorded results.jsonl and fails (exit 1) when any swept query
exceeds RATIO_GATE x wall at 10x data without a named adjudication in
ADJUDICATED, or recorded a parity failure/error. The first two
registry quadratics were caught only because someone happened to run
the sweep and read the table; the gate makes the next super-linear
regression a CI failure instead of an archaeology find.
tests/test_sweep_gate.py runs the gate on the committed record.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cryptocoininsights_data_engineer_project_spark import queries as registry
from cryptocoininsights_data_engineer_project_spark.session import get_spark
from tests.oracle_compare import compare, duck_connection

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.sf1")
OUT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(OUT_DIR, "SWEEP_SF1.jsonl")

# DuckDB twins that are deliberately quadratic-in-bucket verification
# oracles; at 50k docs the oracle is the bottleneck, not the engine
# (CORRECTNESS_LOCAL_sf1.md "Not swept at sf1, and why").
ORACLE_EXCLUDED = {"dedup_text_embedding", "dedup_embedding", "fuzzy_name_match"}

# Hard per-side budget; a genuine linear query finishes far inside it.
TIMEOUT_S = 900

# --check gate: a linear query lands <= ~10x at 10x data (shared-VM
# wobble included); anything past this needs a NAMED adjudication.
RATIO_GATE = 12.0

# The adjudicated super-linear movers — each must name its reason, and
# the reason class must be one a reviewer can verify from the record
# itself (output growth is in the JSONL's rows columns; documented
# quadratics carry the engine-only parity marker).
ADJUDICATED = {
    "fuzzy_name_match": (
        "output-proportional: sf1 derivation manufactures near-dup "
        "cliques — 32x wall tracks 53x output rows (SCALE.md)"
    ),
    # basket_affinity_lift's former output-proportional adjudication
    # (2 -> 20 pair rows at 10x data) retired in r16: the re-swept
    # ratio reads 5.5x, inside the gate — the staleness guard
    # (test_adjudications_are_real_and_named) flags exactly this
    "dedup_embedding": (
        "oracle twin is deliberately quadratic (engine-only parity "
        "marker, SCALE.md); the ENGINE side has been constant since "
        "the ALL_PAIRS_CAP=4096 sampled-block default — the sweep "
        "record reads 0.54x at 10x data. The entry stays only for "
        "the oracle-side marker"
    ),
    "dedup_text_embedding": (
        "documented quadratic verification baseline for the LSH "
        "default (engine-only oracle row, SCALE.md)"
    ),
}


def check(records: list[dict]) -> list[str]:
    """The ratio gate over a sweep record. Returns problem strings
    (empty = green). Pure function of the parsed JSONL so the test
    suite can gate the committed record and unit-test the failure
    modes without running a sweep."""
    problems = []
    for r in records:
        name = r.get("name", "?")
        if "error" in r:
            problems.append(f"{name}: sweep errored: {r['error'][:120]}")
            continue
        parity = r.get("parity")
        if parity != "pass" and not (
            isinstance(parity, str) and parity.startswith("engine-only")
        ):
            problems.append(f"{name}: parity not green: {parity!r}")
        ratio = r.get("ratio") or 0.0
        if ratio > RATIO_GATE and name not in ADJUDICATED:
            problems.append(
                f"{name}: sf1/sf0.1 wall ratio {ratio} exceeds the "
                f"{RATIO_GATE}x gate with no adjudication — either fix "
                "the super-linear plan or add a NAMED entry to "
                "ADJUDICATED with a verifiable reason"
            )
    return problems


def run_check() -> None:
    if not os.path.exists(OUT):
        print(f"no sweep record at {OUT}; run the sweep first")
        sys.exit(2)
    with open(OUT) as f:
        records = [json.loads(line) for line in f if line.strip()]
    stale = [n for n in ADJUDICATED if n not in {r.get("name") for r in records}]
    problems = check(records)
    problems += [f"ADJUDICATED entry {n} not in the sweep record" for n in stale]
    if problems:
        print(f"RATIO GATE: {len(problems)} problem(s)")
        for p in problems:
            print(" -", p)
        sys.exit(1)
    n_adj = sum(1 for r in records if r.get("name") in ADJUDICATED)
    print(
        f"RATIO GATE: green — {len(records)} queries, "
        f"{n_adj} adjudicated, gate {RATIO_GATE}x"
    )


class _Cancel(Exception):
    pass


def _run_spark_side(spark, fn, sf_dir: str, name: str):
    """Run one registry query with a watchdog that cancels the job
    group on timeout (Spark jobs are otherwise uninterruptible from
    the driver thread)."""
    sc = spark.sparkContext
    group = f"sweep-{name}-{os.path.basename(sf_dir)}"
    sc.setJobGroup(group, name, interruptOnCancel=True)
    timer = threading.Timer(TIMEOUT_S, lambda: sc.cancelJobGroup(group))
    timer.start()
    try:
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        rows = df.count()
        wall = time.monotonic() - t0
        return df, rows, wall
    finally:
        timer.cancel()
        sc.setJobGroup("", "")


def main() -> None:
    if "--check" in sys.argv:
        run_check()
        return
    resume = "--resume" in sys.argv
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only" and i + 1 < len(sys.argv):
            only = set(sys.argv[i + 1].split(","))

    os.makedirs(OUT_DIR, exist_ok=True)
    done: set[str] = set()
    if resume and os.path.exists(OUT):
        with open(OUT) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["name"])
                except Exception:
                    pass
    elif os.path.exists(OUT):
        os.remove(OUT)

    spark = get_spark(app_name="sweep-sf1")
    con1 = duck_connection(SF1)

    names = sorted(n for n, s in registry.REGISTRY.items() if s.oracle)
    if only:
        names = [n for n in names if n in only]
    todo = [n for n in names if n not in done]
    print(f"sweeping {len(todo)} of {len(names)} oracle-backed queries", flush=True)

    for i, name in enumerate(todo):
        spec = registry.REGISTRY[name]
        rec: dict = {"name": name}
        try:
            _, rows01, wall01 = _run_spark_side(spark, spec.fn, SF01, name)
            rec["sf01_rows"] = rows01
            rec["sf01_s"] = round(wall01, 2)

            df1, rows1, wall1 = _run_spark_side(spark, spec.fn, SF1, name)
            rec["sf1_rows"] = rows1
            rec["sf1_s"] = round(wall1, 2)
            rec["ratio"] = round(wall1 / max(wall01, 1e-6), 2)

            if name in ORACLE_EXCLUDED:
                rec["parity"] = "engine-only (documented quadratic oracle twin)"
            else:
                t0 = time.monotonic()
                problems = compare(df1, con1, spec.oracle, name)
                rec["oracle_s"] = round(time.monotonic() - t0, 2)
                rec["parity"] = "pass" if not problems else problems[:3]
        except Exception as exc:  # noqa: BLE001 — record and continue
            rec["error"] = f"{type(exc).__name__}: {exc}"[:500]
            traceback.print_exc()
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        status = rec.get("parity", rec.get("error", "?"))
        print(
            f"[{i + 1}/{len(todo)}] {name}: sf0.1={rec.get('sf01_s')}s "
            f"sf1={rec.get('sf1_s')}s ratio={rec.get('ratio')} {status}",
            flush=True,
        )

    spark.stop()
    con1.close()
    print(f"done -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
