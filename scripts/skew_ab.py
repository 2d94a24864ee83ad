"""Skewed-join A/B at sf1-like volume (VERDICT r5 #6 / r6 #1).

Measures the same hot-key join three ways on a parquet fixture big
enough that the hot key's shuffle partition crosses AQE's DEFAULT
skew thresholds (256 MB / 5x median) — no tuned-down knobs, the
split fires exactly as it would on a cluster:

  plain   shuffle SMJ, AQE skew split disabled (the straggler case)
  aqe     AQE skew split enabled (engine default posture)
  salt16  operators/skew.py::salted_join, split disabled

Fixture: 30M-row fact (40% of rows on ONE key, 64-char pad so the hot
partition is ~1.5 GB of map output), 3M-key dim — far past any
broadcast threshold, so the join shuffles both sides like a 100 TB
fact-dim join would. All three variants must return identical
(count, sum) — checked, not assumed.

Usage: python scripts/skew_ab.py [out_json]
Writes one JSON line per variant; paste the summary into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from cryptocoininsights_data_engineer_project_spark.operators.skew import (
    salted_join,
    skewed_join_fixture,
)
from cryptocoininsights_data_engineer_project_spark.session import get_spark

N_FACT = 30_000_000
N_KEYS = 3_000_000
HOT_FRAC = 0.4
PAD = 64
REPS = 2
WORK = os.path.join(REPO, ".skewab")


def main() -> None:
    spark = get_spark(app_name="skew-ab")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    os.makedirs(WORK, exist_ok=True)
    fact_p, dim_p = os.path.join(WORK, "fact"), os.path.join(WORK, "dim")
    if not os.path.exists(os.path.join(fact_p, "_SUCCESS")):
        fact, dim = skewed_join_fixture(
            spark, N_FACT, N_KEYS, hot_frac=HOT_FRAC, pad=PAD
        )
        fact.repartition(32).write.mode("overwrite").parquet(fact_p)
        dim.repartition(8).write.mode("overwrite").parquet(dim_p)

    fact = spark.read.parquet(fact_p)
    dim = spark.read.parquet(dim_p)

    # max(pad) forces the wide column THROUGH the join's shuffle: a
    # v+w-only aggregate lets Catalyst prune pad from the scan and the
    # A/B would measure a narrow join instead of the wide-fact case
    def plain_join():
        return fact.join(dim, "key").groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") + F.col("w")).alias("s"),
            F.max("pad").alias("p"),
        )

    def salted():
        return salted_join(fact, dim, "key").groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") + F.col("w")).alias("s"),
            F.max("pad").alias("p"),
        )

    variants = {
        "plain": ("false", plain_join),
        "aqe": ("true", plain_join),
        "salt16": ("false", salted),
    }

    results, answers = {}, {}
    for name, (skew_conf, build) in variants.items():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_conf)
        times = []
        fired = False
        for _ in range(REPS):
            df = build()
            t0 = time.time()
            rows = df.collect()
            times.append(round(time.time() - t0, 2))
            plan = df._jdf.queryExecution().executedPlan().toString()
            fired = fired or ("skew=true" in plan)
        answers[name] = (rows[0]["n"], rows[0]["s"], rows[0]["p"])
        results[name] = {
            "times_s": times,
            "best_s": min(times),
            "skew_split_fired": fired,
        }
        print(json.dumps({"variant": name, **results[name]}))

    assert len(set(answers.values())) == 1, f"variants disagree: {answers}"
    assert results["aqe"]["skew_split_fired"], "AQE split did not engage"
    assert not results["plain"]["skew_split_fired"]

    summary = {
        "n_fact": N_FACT,
        "n_keys": N_KEYS,
        "hot_frac": HOT_FRAC,
        "pad": PAD,
        "cpus": spark.sparkContext.defaultParallelism,
        "rows_joined": answers["aqe"][0],
        "best": {k: v["best_s"] for k, v in results.items()},
        "speedup_aqe_vs_plain": round(
            results["plain"]["best_s"] / results["aqe"]["best_s"], 2
        ),
        "speedup_salt_vs_plain": round(
            results["plain"]["best_s"] / results["salt16"]["best_s"], 2
        ),
    }
    print(json.dumps(summary))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(json.dumps(summary) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
