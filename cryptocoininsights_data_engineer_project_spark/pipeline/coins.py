"""The reference pipeline, Spark-first.

Reference dataflow (see /root/reference):
- data-extract.py:12-33    — GET CoinGecko /coins/markets → one JSON
                             array per run in S3 ``raw_data/``,
                             wall-clock-timestamped filename.
- data-transformation.py   — list bucket, prefix-filter keys (27-33),
                             json_normalize (42), project/derive/rename
                             into coin_info (45-50) and coin_metrics
                             (53-59), CSV out (62-67).
- coininsights.py          — COPY into stage tables (75-108), MERGE
                             into dim/fact (110-165), TRUNCATE stage
                             (168-189), archive + purge raw files
                             (193-353).

Spark mapping (SURVEY.md §2.1/§2.2/§2.8): schema-on-read JSON scan →
nested-struct flattening via select (Catalyst handles ``roi.times``
natively — no json_normalize pass) → two projections → library MERGE →
Hadoop-FileSystem archive/purge. Wall-clock filenames become a
deterministic ``batch_id`` parsed from the filename, so runs are
reproducible and testable.

Scale notes: the per-file Lambda loop (data-transformation.py:32-67)
disappears — a single multi-file scan parallelizes across executors.
The stage/TRUNCATE dance (coininsights.py:168-189) collapses into
Spark's immutable per-run DataFrames. Warehouse tables are parquet,
partition-ready; MERGE rewrites would prune to touched partitions on a
bucketed layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.merge import merge
from . import manifest


def _bucket_of(partition_dir: str) -> int | None:
    """Bucket id embedded in a manifest partition dir ("bucket=3" or
    "p_date=2024-01-01/bucket=3")."""
    for seg in partition_dir.split("/"):
        if seg.startswith("bucket="):
            return int(seg[len("bucket=") :])
    return None

# CoinGecko /coins/markets row (FIXTURES.md B1; the reference ingests
# exactly this shape, data-extract.py:12-20). Explicit schema: the
# reference relies on pandas inference (data-transformation.py:42);
# at scale schema-on-read inference is both slow and nondeterministic.
RAW_COIN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("image", T.StringType()),
        T.StructField("current_price", T.DoubleType()),
        T.StructField("market_cap", T.LongType()),
        T.StructField("market_cap_rank", T.IntegerType()),
        T.StructField("fully_diluted_valuation", T.LongType()),
        T.StructField("total_volume", T.LongType()),
        T.StructField("high_24h", T.DoubleType()),
        T.StructField("low_24h", T.DoubleType()),
        T.StructField("price_change_24h", T.DoubleType()),
        T.StructField("price_change_percentage_24h", T.DoubleType()),
        T.StructField("market_cap_change_24h", T.LongType()),
        T.StructField("market_cap_change_percentage_24h", T.DoubleType()),
        T.StructField("circulating_supply", T.DoubleType()),
        T.StructField("total_supply", T.DoubleType()),
        T.StructField("max_supply", T.DoubleType()),
        T.StructField("ath", T.DoubleType()),
        T.StructField("ath_change_percentage", T.DoubleType()),
        T.StructField("ath_date", T.StringType()),
        T.StructField("atl", T.DoubleType()),
        T.StructField("atl_change_percentage", T.DoubleType()),
        T.StructField("atl_date", T.StringType()),
        T.StructField(
            "roi",
            T.StructType(
                [
                    T.StructField("times", T.DoubleType()),
                    T.StructField("currency", T.StringType()),
                    T.StructField("percentage", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("last_updated", T.StringType()),
    ]
)

INFO_COLS = ["id", "name", "symbol", "image_url"]  # data-transformation.py:49-50
METRIC_COLS = [  # data-transformation.py:58-59, exact order
    "id",
    "current_price_usd",
    "market_cap",
    "market_cap_rank",
    "total_volume",
    "price_change_percentage_24h",
    "market_cap_change_percentage_24h",
    "high_24h",
    "low_24h",
    "price_change_24h",
    "circulating_supply",
    "total_supply",
    "max_supply",
    "last_updated",
]


# ------------------------------------------------------------- S3/S4 scan
def read_raw_json(spark: SparkSession, path: str, mode: str = "FAILFAST") -> DataFrame:
    """Raw-layer scan: one JSON array per batch file (the shape
    data-extract.py:29-33 writes). ``multiLine`` because each file is
    a single JSON document, not JSON-lines. The glob replaces the
    reference's list-bucket + startswith prefix filter
    (data-transformation.py:27-33) — push the predicate into the
    listing, not a post-hoc loop.

    ``mode=FAILFAST``: a malformed raw file fails the batch loudly —
    the opposite of the reference's swallow-and-log error model
    (data-extract.py:35-46), where missing data surfaces only as a
    sensor timeout an hour later. Pass ``mode="PERMISSIVE"`` to get
    null-row salvage instead (streaming uses permissive so one bad
    file can't wedge the whole query)."""
    return (
        spark.read.schema(RAW_COIN_SCHEMA)
        .option("multiLine", "true")
        .option("mode", mode)
        .json(path)
        .withColumn(
            "batch_id",
            F.regexp_extract(F.input_file_name(), r"batch(\d+)", 1).cast("int"),
        )
    )


# ----------------------------------------------------------- S5 normalize
def normalize(raw: DataFrame) -> DataFrame:
    """Flatten nested structs (pd.json_normalize equivalent,
    data-transformation.py:42). Catalyst extracts struct fields in
    place — no row-level pass, prunes untouched fields from the scan."""
    return raw.select(
        *[c for c in raw.columns if c != "roi"],
        F.col("roi.times").alias("roi_times"),
        F.col("roi.currency").alias("roi_currency"),
        F.col("roi.percentage").alias("roi_percentage"),
    )


# ------------------------------------------------------ P1-P5 projections
def split_info(normalized: DataFrame) -> DataFrame:
    """coin_info dimension (data-transformation.py:45-50): id is a
    copy of symbol (py:46), image renamed image_url (py:47)."""
    return normalized.select(
        F.col("symbol").alias("id"),
        "name",
        "symbol",
        F.col("image").alias("image_url"),
        "batch_id",
    )


def split_metrics(normalized: DataFrame) -> DataFrame:
    """coin_metrics fact (data-transformation.py:53-59): symbol→id,
    current_price→current_price_usd, last_updated cast to timestamp
    (py:55-56), exact column order (py:58-59)."""
    return normalized.select(
        F.col("symbol").alias("id"),
        F.col("current_price").alias("current_price_usd"),
        "market_cap",
        "market_cap_rank",
        "total_volume",
        "price_change_percentage_24h",
        "market_cap_change_percentage_24h",
        "high_24h",
        "low_24h",
        "price_change_24h",
        "circulating_supply",
        "total_supply",
        "max_supply",
        F.to_timestamp("last_updated").alias("last_updated"),
        "batch_id",
    )


# ---------------------------------------------------------- S6/S7 CSV compat
def write_csv(df: DataFrame, path: str) -> None:
    """Transformed-layer CSV sink with the reference's exact dialect
    (data-transformation.py:63-67 writes; coininsights.py:85,103 reads
    back with FORMAT AS CSV DELIMITER ',' QUOTE '\"' IGNOREHEADER 1).
    Parquet is the engine default; CSV is the compat path."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("sep", ",")
        .option("quote", '"')
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """COPY-semantics CSV scan (coininsights.py:75-108): explicit
    schema (the stage table DDL), header skipped, same dialect."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("sep", ",")
        .option("quote", '"')
        .csv(path)
    )


# ------------------------------------------------- M1-M5 warehouse + maint
class CoinWarehouse:
    """Parquet-backed dim/fact warehouse with partition-pruned MERGE
    under a snapshot/manifest commit protocol (pipeline/manifest.py).

    Replaces Redshift ``dev.public.dim_coin_info`` /
    ``fact_coin_metrics`` (coininsights.py:110-165). Stage tables and
    TRUNCATE (coininsights.py:168-189) have no equivalent: each run's
    stage is an immutable DataFrame.

    Layout for scale: both tables are hash-bucketed on the merge key
    into ``bucket=N`` partition directories (``pmod(xxhash64(id),
    n_buckets)``); the fact additionally partitions by
    ``p_date=to_date(last_updated)`` above the bucket, so time-windowed
    reads prune to their dates (PartitionFilters — plan-tested) while
    the merge keeps pruning on bucket alone. An upsert then:

    1. computes the stage's bucket set (tiny distinct-collect);
    2. reads ONLY the committed files of those buckets (file-level
       pruning via the manifest — untouched buckets never even enter
       the scan's file index);
    3. merges, writes the result as NEW immutable files, and publishes
       a manifest in which only the touched buckets' entries changed.

    At 100 TB with e.g. 4096 buckets, a typical incremental batch
    touches a small fraction of buckets, so merge I/O is proportional
    to the delta, not the table. Commits are manifest CAS publishes:
    concurrent writers (the streaming candle maintainer racing a batch
    upsert/delete/compact) serialize optimistically — the loser
    re-reads the winner's snapshot and re-derives its merge, so no
    commit's rows are ever lost; readers pin one manifest and can
    never observe a mixed-version table. A crash mid-commit leaves
    only unreferenced files (``vacuum`` reclaims them) — there is no
    recovery step, because nothing live was ever touched. The
    reference needs none of this only because Airflow serializes its
    DAG (coininsights.py:358-363); that degenerate case (writers
    arriving one at a time) commits here without ever retrying.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 16,
        fact_date_col: str | None = "last_updated",
        max_commit_retries: int = 5,
    ):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        self.fact_date_col = fact_date_col
        self.max_commit_retries = max_commit_retries
        self.dim_path = os.path.join(root, "dim_coin_info")
        self.fact_path = os.path.join(root, "fact_coin_metrics")

    # -- table access -----------------------------------------------
    def _partition_cols(self, path: str) -> list[str]:
        if path == self.fact_path and self.fact_date_col:
            return ["p_date", "bucket"]
        return ["bucket"]

    def _snapshot(self, path: str, buckets=None):
        """(version, manifest, DataFrame|None) for the current commit;
        ``buckets`` restricts the frame to those buckets' files."""
        version, m = manifest.latest_manifest(self.spark, path)
        if m is None:
            return version, None, None
        dirs = None
        if buckets is not None:
            want = set(buckets)
            dirs = [
                d for d in m["partitions"] if _bucket_of(d) in want
            ]
        return version, m, manifest.snapshot_read(self.spark, path, m, dirs)

    def _read_or_none(self, path: str) -> DataFrame | None:
        _, _, df = self._snapshot(path)
        return df

    def dim(self) -> DataFrame | None:
        df = self._read_or_none(self.dim_path)
        return df.drop("bucket") if df is not None else None

    def fact(self) -> DataFrame | None:
        df = self._read_or_none(self.fact_path)
        if df is None:
            return None
        return df.drop("bucket", "p_date")

    def fact_snapshot(self) -> DataFrame | None:
        """The fact WITH its partition columns (p_date, bucket) — the
        form a time-windowed reader filters for partition pruning."""
        return self._read_or_none(self.fact_path)

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64("id"), F.lit(self.n_buckets))
        )

    # -- load -------------------------------------------------------
    def upsert_batch(
        self,
        info: DataFrame,
        metrics: DataFrame,
        evolve_schema: bool = False,
    ) -> None:
        """M1 + M2 for one batch. Stage duplicates resolve keep-latest
        (fact: by last_updated; dim: by batch_id) — the reference
        relies on one-row-per-coin API payloads; we make the rule
        explicit so replayed/duplicated batches stay idempotent.

        ``evolve_schema=True`` is MERGE WITH SCHEMA EVOLUTION: columns
        present in the stage but not in the table are appended (old
        rows read NULL); the default drops them, mirroring the
        reference's fixed column lists (coininsights.py:119-157).
        Either way, columns already evolved INTO the table persist
        through later upserts (the table schema is authoritative — a
        rewrite never narrows it)."""

        def _extras(df, base):
            known = set(base) | {"batch_id", "bucket"}
            return [c for c in df.columns if c not in known]

        info_cols = list(INFO_COLS) + (
            _extras(info, INFO_COLS) if evolve_schema else []
        )
        metric_cols = list(METRIC_COLS) + (
            _extras(metrics, METRIC_COLS) if evolve_schema else []
        )
        info = info.select(*info_cols, "batch_id")
        metrics = metrics.select(*metric_cols, "batch_id")
        self._upsert(self.dim_path, info, info_cols, dedupe_order=["batch_id"])
        self._upsert(
            self.fact_path,
            metrics,
            metric_cols,
            dedupe_order=["last_updated", "batch_id"],
        )

    def _with_partition_cols(self, df: DataFrame, path: str) -> DataFrame:
        if path == self.fact_path and self.fact_date_col:
            df = df.withColumn("p_date", F.to_date(self.fact_date_col))
        return df

    def _upsert(self, path, stage, cols, dedupe_order):
        from ..operators.merge import dedupe_latest

        stage = self._bucketed(stage)
        part_cols = self._partition_cols(path)
        # bucket pruning: only partitions holding stage keys participate
        touched = sorted(
            r["bucket"] for r in stage.select("bucket").distinct().collect()
        )
        for _ in range(self.max_commit_retries):
            version, m, _ = self._snapshot(path)
            if m is None:
                result = self._with_partition_cols(
                    dedupe_latest(stage, ["id"], dedupe_order).select(
                        *cols, "bucket"
                    ),
                    path,
                )
                if self._commit(path, result, part_cols, version, {}, set()):
                    return
                continue  # lost the create race: table exists now, merge
            _, _, target = self._snapshot(path, buckets=touched)
            out_cols = list(cols)
            # schema evolution, both directions: the table keeps columns
            # a narrower stage no longer carries (they pass through
            # merge and stay NULL on inserts), and new stage columns
            # materialize in the target as typed NULLs. The manifest
            # schema is authoritative on read, so untouched buckets'
            # older physical files surface evolved columns as typed
            # NULLs instead of schema roulette.
            out_cols += [
                c
                for c in target.columns
                if c not in out_cols and c not in ("bucket", "p_date")
            ]
            stage_fields = {f.name: f.dataType for f in stage.schema.fields}
            for c in out_cols:
                if c not in target.columns:
                    target = target.withColumn(
                        c, F.lit(None).cast(stage_fields[c])
                    )
            # bucket must be an update column: inserted keys have no
            # target row to pass it through from (and matched rows agree
            # anyway — same id, same hash)
            merged = merge(
                target.drop("p_date"),
                stage,
                keys=["id"],
                update_cols=[
                    c for c in out_cols if c != "id" and c in stage.columns
                ]
                + ["bucket"],
                dedupe_order=dedupe_order,
            ).select(*out_cols, "bucket")
            merged = self._with_partition_cols(merged, path)
            if self._commit(
                path, merged, part_cols, version, m["partitions"], set(touched)
            ):
                return
        raise manifest.ConcurrentWriteError(
            f"upsert lost the manifest CAS {self.max_commit_retries} times"
            f" at {path}"
        )

    def _commit(
        self, path, frame, part_cols, version, old_partitions, touched
    ) -> bool:
        """Stage ``frame``'s files (pure adds, per-commit token) and
        CAS-publish a manifest replacing exactly the touched buckets'
        entries. False = lost the race (caller re-reads and retries);
        the losing attempt's files stay as invisible orphans for
        vacuum — cheaper and crash-equivalent vs eager cleanup."""
        new_parts = manifest.stage_commit_files(
            self.spark, path, frame, part_cols
        )
        partitions = {
            d: fl
            for d, fl in old_partitions.items()
            if _bucket_of(d) not in touched
        }
        partitions.update(new_parts)
        return manifest.publish_manifest(
            self.spark,
            path,
            version + 1,
            {"schema": frame.schema.json(), "partitions": partitions,
             "n_buckets": self.n_buckets},
        )

    def delete_keys(self, path: str, ids) -> dict:
        """Targeted delete (the GDPR / right-to-be-forgotten
        maintenance op): remove the given ids from a bucketed table by
        REWRITING ONLY the buckets that can contain them — I/O is
        proportional to the touched buckets, untouched buckets' manifest
        entries (and files) carry over untouched. Returns
        {"deleted": n, "buckets_rewritten": k}.
        """
        ids_df = self._bucketed(
            self.spark.createDataFrame([(i,) for i in ids], "id string")
        )
        touched = sorted(
            r["bucket"] for r in ids_df.select("bucket").distinct().collect()
        )
        part_cols = self._partition_cols(path)
        for _ in range(self.max_commit_retries):
            version, m, _ = self._snapshot(path)
            if m is None:
                return {"deleted": 0, "buckets_rewritten": 0}
            _, _, sub = self._snapshot(path, buckets=touched)
            before = sub.count()
            kept = sub.join(ids_df.select("id"), "id", "left_anti")
            n_kept = kept.count()
            if "p_date" in kept.columns:
                kept = self._with_partition_cols(kept.drop("p_date"), path)
            if self._commit(
                path, kept, part_cols, version, m["partitions"], set(touched)
            ):
                return {
                    "deleted": before - n_kept,
                    "buckets_rewritten": len(touched),
                }
        raise manifest.ConcurrentWriteError(
            f"delete lost the manifest CAS {self.max_commit_retries} times"
            f" at {path}"
        )

    def compact(self, path: str, target_files_per_bucket: int = 1) -> dict:
        """OPTIMIZE-style small-file compaction: rewrite each partition
        directory holding more than ``target_files_per_bucket`` parquet
        files down to ONE file each, leaving compact partitions
        untouched (the parameter is the sickness threshold).

        Why it exists: every incremental upsert ADDS files to touched
        partitions (immutable-file commits), so at high batch cadence a
        partition accretes many small files — the classic warehouse
        small-file problem (scan tasks, open costs, and footer reads
        all scale with file count, not bytes). Compaction reads only
        the SICK partitions' files, rewrites them in ONE job
        (repartition on the partition columns → one file per
        directory), and commits through the same manifest CAS as every
        other writer — racing an upsert is safe, one of them retries.
        Row content never changes (tests assert row equality).

        Returns {partition_dir: files_before} for rewritten dirs.
        """
        for _ in range(self.max_commit_retries):
            version, m, _ = self._snapshot(path)
            if m is None:
                return {}
            sick = {
                d: len(fl)
                for d, fl in m["partitions"].items()
                if len(fl) > target_files_per_bucket
            }
            if not sick:
                return {}
            part_cols = self._partition_cols(path)
            frame = manifest.snapshot_read(
                self.spark, path, m, dirs=sorted(sick)
            )
            # one task per sick dir → exactly one output file per dir
            # (a task writes one file per partition directory it holds)
            frame = frame.repartition(len(sick), *part_cols)
            new_parts = manifest.stage_commit_files(
                self.spark, path, frame, part_cols
            )
            partitions = {
                d: fl for d, fl in m["partitions"].items() if d not in sick
            }
            partitions.update(new_parts)
            if manifest.publish_manifest(
                self.spark,
                path,
                version + 1,
                {"schema": m["schema"], "partitions": partitions,
                 "n_buckets": self.n_buckets},
            ):
                return sick
        raise manifest.ConcurrentWriteError(
            f"compact lost the manifest CAS {self.max_commit_retries} times"
            f" at {path}"
        )

    def vacuum(self, keep: int = 2) -> dict:
        """Reclaim orphaned data files (crashed/lost-race commits) and
        superseded snapshots on both tables; ``keep`` is the reader
        retention window (manifest.vacuum)."""
        out = {}
        for path in (self.dim_path, self.fact_path):
            if manifest.list_versions(self.spark, path):
                out[os.path.basename(path)] = manifest.vacuum(
                    self.spark, path, keep
                )
        return out

    # -- maintenance (M4/M5, coininsights.py:193-353) ----------------
    def _fs(self, path: str):
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, jpath

    def _jpath(self, path: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(path)

    def archive_files(self, files: list[str], archive_dir: str) -> None:
        """Copy processed raw files to archive/ (coininsights.py:219-265)
        via Hadoop FileSystem — works on file://, hdfs://, s3a://."""
        fs, _ = self._fs(archive_dir)
        dst_dir = self._jpath(archive_dir)
        if not fs.exists(dst_dir):
            fs.mkdirs(dst_dir)
        util = self.spark._jvm.org.apache.hadoop.fs.FileUtil
        conf = self.spark._jsc.hadoopConfiguration()
        for f in files:
            src = self._jpath(f)
            dst = self._jpath(os.path.join(archive_dir, os.path.basename(f)))
            util.copy(fs, src, fs, dst, False, True, conf)

    def purge_files(self, files: list[str]) -> None:
        """Delete consumed raw files (coininsights.py:268-312)."""
        for f in files:
            fs, jpath = self._fs(f)
            if fs.exists(jpath):
                fs.delete(jpath, False)


def _glob_files(spark: SparkSession, raw_glob: str) -> list[str]:
    """List the files a glob matches via Hadoop ``globStatus`` — pure
    namenode/listing metadata, no Spark job, no data scan. At 100 TB
    this is the right way to learn "which files did this run consume":
    O(files) RPCs against the filesystem index instead of a full scan +
    shuffle + driver collect over the data itself."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(raw_glob)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    return [s.getPath().toString() for s in statuses]


def run_batch_pipeline(
    spark: SparkSession,
    raw_glob: str,
    warehouse: CoinWarehouse,
    archive_dir: str | None = None,
    purge: bool = False,
    file_discovery: str = "glob",
) -> dict[str, int]:
    """One DAG run, end-to-end (the whole coininsights.py DAG):
    scan raw → normalize → split → merge into dim/fact → archive/purge.
    Returns row counts for observability.

    ``file_discovery`` picks how the maintenance file list is built:

    - ``"glob"`` (default): Hadoop ``globStatus`` listing — metadata
      only, no Spark job; holds at any file count.
    - ``"scan"``: ``input_file_name()`` distinct-collect over the data
      actually read — exact parity with what the scan consumed, but it
      is a full pass + driver collect; keep for small parity runs.

    For continuously-arriving data prefer the streaming ingest
    (streaming/ingest.py) whose file source archives consumed input
    natively via ``cleanSource=archive`` — maintenance there is the
    source's own bookkeeping, with no separate file list at all."""
    raw = read_raw_json(spark, raw_glob)
    normalized = normalize(raw)
    info = split_info(normalized)
    metrics = split_metrics(normalized)
    warehouse.upsert_batch(info, metrics)
    # materialize row/file stats BEFORE maintenance: raw is lazy, and
    # counting after purge would re-scan deleted files
    raw_rows = raw.count()
    if file_discovery == "glob":
        files = sorted(_glob_files(spark, raw_glob))
    elif file_discovery == "scan":
        files = [
            r.f
            for r in raw.select(F.input_file_name().alias("f")).distinct().collect()
        ]
    else:
        raise ValueError(
            f"file_discovery must be 'glob' or 'scan', got {file_discovery!r}"
        )
    if archive_dir:
        warehouse.archive_files(files, archive_dir)
    if purge:
        warehouse.purge_files(files)
    return {
        "raw_rows": raw_rows,
        "dim_rows": warehouse.dim().count(),
        "fact_rows": warehouse.fact().count(),
        "files": len(files),
    }


# --------------------------------------------------------- QC observation
def observed_metrics(df: DataFrame, name: str = "qc"):
    """Attach single-pass data-quality counters via ``df.observe``.

    Returns ``(df, observation)``: the counters (row count, null-price
    rows, negative-price rows, distinct-ish symbol count via HLL) are
    computed inside whatever action later consumes ``df`` — no second
    scan, no extra job, which is the only affordable way to run QC on
    a 100 TB ingest. ``observation.get`` blocks until that action
    finishes. The reference has no QC at all (a silent bad batch loads
    straight into Redshift, data-transformation.py:32-67); this is the
    Spark-native guardrail a production ingest bolts on first.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("current_price").isNull(), 1).otherwise(0)
        ).alias("null_price_rows"),
        F.sum(
            F.when(F.col("current_price") < 0, 1).otherwise(0)
        ).alias("negative_price_rows"),
        F.approx_count_distinct("symbol").alias("approx_symbols"),
    )
    return observed, obs
