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

Results stream to .sweep_sf1/results.jsonl (one JSON object per query,
append-mode so an interrupted sweep resumes with --resume).

Usage: python scripts/sweep_sf1.py [--resume] [--only name1,name2]
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
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sweep_sf1")
OUT = os.path.join(OUT_DIR, "results.jsonl")

# DuckDB twins that are deliberately quadratic-in-bucket verification
# oracles; at 50k docs the oracle is the bottleneck, not the engine
# (CORRECTNESS_LOCAL_sf1.md "Not swept at sf1, and why").
ORACLE_EXCLUDED = {"dedup_text_embedding", "dedup_embedding", "fuzzy_name_match"}

# Hard per-side budget; a genuine linear query finishes far inside it.
TIMEOUT_S = 900


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
