"""Time a subset of registry queries through the bench methodology.

Usage: python scripts/qtime.py [--explain DIR] [--sf SF_DIR] name1 name2 ...

Same session shape as bench.py (get_spark, local[$SPARK_GRAFT_CPUS],
noop sink, job descriptions) but only the named queries — the
isolation tool guide §1.4 asks for, so one query's time is measured
without the other 299. With --explain DIR, also writes
DIR/<name>.txt with explain("formatted") for each query.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cryptocoininsights_data_engineer_project_spark import queries as registry
from cryptocoininsights_data_engineer_project_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    explain_dir = None
    plan_only = False
    suffix = ""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--explain":
            explain_dir = Path(args[i + 1])
            explain_dir.mkdir(parents=True, exist_ok=True)
            i += 2
        elif args[i] == "--plan-only":
            plan_only = True
            i += 1
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark(app_name="qtime")
    # engine warm (JVM + python worker fork), never the bench data
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        spec = registry.REGISTRY[name]
        spark.sparkContext.setJobDescription(name)
        if explain_dir is not None:
            df = spec.fn(spark, sf_dir)
            (explain_dir / f"{name}{suffix}.txt").write_text(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        if plan_only:
            if explain_dir is None:
                sys.exit("--plan-only requires --explain DIR")
            print(f"{name}: plan written", flush=True)
            spark.sparkContext.setJobDescription(None)
            continue
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
