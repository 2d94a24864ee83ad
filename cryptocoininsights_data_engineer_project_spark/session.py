"""SparkSession factory.

Local harness: one JVM, ``local[$SPARK_GRAFT_CPUS]`` threads. The same
configuration is what we'd ship as cluster defaults: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), shuffle
partitions sized to the parallelism, Arrow for any pandas interchange,
UTC session timezone so results are deterministic and match the DuckDB
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "cryptocoininsights-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned local SparkSession.

    At cluster scale the master/memory settings come from spark-submit;
    everything set here is master-agnostic engine configuration.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Runtime bloom-filter join pruning: when a selective filtered
        # side is too big to broadcast (the 100 TB shuffle-join case),
        # inject a bloom filter of its join keys into the other side's
        # scan — a semi-join reduction that cuts shuffle volume by the
        # filter's selectivity. Self-activating: broadcast joins don't
        # need it and don't get it (verified in tests/test_plans.py).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # managed tables (S8) land in tmp, never in the repo checkout
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally-created session
    (the driver hands us its own SparkSession for ``queries()``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # an untouched Spark default of 200 shuffle partitions is wrong for
    # this harness (32 cores, sub-GB inputs); respect any explicit
    # non-default choice the session owner made
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    return spark
