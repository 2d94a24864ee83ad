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

from . import manifest
from .table import BucketedTable, _bucket_of  # noqa: F401 - re-export

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
def read_raw_json(
    spark: SparkSession,
    path: str,
    mode: str = "FAILFAST",
    lines: bool | None = None,
) -> DataFrame:
    """Raw-layer scan over BOTH raw shapes: one JSON array per batch
    file (the shape data-extract.py:29-33 writes; ``multiLine`` since
    each file is a single JSON document) or a ``raw_coins_batch{N}/``
    directory of JSON-lines part files (the executor-parallel bulk
    sink, sources/rest.py::write_raw_json_bulk). The shape is detected
    from the path (a directory means part files); pass ``lines=`` to
    override for non-local filesystems or mixed globs. The glob
    replaces the reference's list-bucket + startswith prefix filter
    (data-transformation.py:27-33) — push the predicate into the
    listing, not a post-hoc loop.

    ``mode=FAILFAST``: a malformed raw file fails the batch loudly —
    the opposite of the reference's swallow-and-log error model
    (data-extract.py:35-46), where missing data surfaces only as a
    sensor timeout an hour later. Pass ``mode="PERMISSIVE"`` to get
    null-row salvage instead (streaming uses permissive so one bad
    file can't wedge the whole query)."""
    if lines is None:
        # Shape-detect through the Hadoop FileSystem API so scheme-less
        # paths resolve against the CLUSTER's default filesystem (HDFS/
        # object store), not the driver's local disk — driver-local
        # os.path.isdir would call a remote bulk-sink directory a file
        # and misparse its JSON-lines parts. Globs (no single status)
        # fall back to array-file shape; pass ``lines=`` to override.
        from .manifest import _hadoop_fs

        try:
            fs, jp = _hadoop_fs(spark, path)
            lines = fs.exists(jp) and fs.getFileStatus(jp).isDirectory()
        except Exception:
            lines = False
    return (
        spark.read.schema(RAW_COIN_SCHEMA)
        .option("multiLine", "false" if lines else "true")
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
        self._dim = BucketedTable(
            spark, self.dim_path, ["id"], n_buckets,
            max_commit_retries=max_commit_retries,
        )
        self._fact = BucketedTable(
            spark, self.fact_path, ["id"], n_buckets,
            date_col=fact_date_col,
            max_commit_retries=max_commit_retries,
        )

    # -- table access -----------------------------------------------
    def _table(self, path: str) -> BucketedTable:
        if path == self.fact_path:
            return self._fact
        if path == self.dim_path:
            return self._dim
        raise KeyError(f"unknown table path {path!r}")

    def _partition_cols(self, path: str) -> list[str]:
        return self._table(path)._partition_cols()

    def _snapshot(self, path: str, buckets=None):
        """(version, manifest, DataFrame|None) for the current commit;
        ``buckets`` restricts the frame to those buckets' files."""
        return self._table(path)._snapshot(buckets)

    def dim(self) -> DataFrame | None:
        return self._dim.read()

    def fact(self) -> DataFrame | None:
        return self._fact.read()

    def fact_snapshot(self) -> DataFrame | None:
        """The fact WITH its partition columns (p_date, bucket) — the
        form a time-windowed reader filters for partition pruning."""
        return self._fact.read(with_partitions=True)

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return self._fact._bucketed(df)

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
        return self._table(path)._with_partition_cols(df)

    def _upsert(self, path, stage, cols, dedupe_order):
        self._table(path).upsert(stage, cols=cols, dedupe_order=dedupe_order)

    def delete_keys(self, path: str, ids) -> dict:
        """Targeted delete (the GDPR / right-to-be-forgotten
        maintenance op): remove the given ids from a bucketed table by
        REWRITING ONLY the buckets that can contain them — I/O is
        proportional to the touched buckets, untouched buckets' manifest
        entries (and files) carry over untouched. Returns
        {"deleted": n, "buckets_rewritten": k}."""
        return self._table(path).delete_keys(
            self.spark.createDataFrame([(i,) for i in ids], "id string")
        )

    def compact(self, path: str, target_files_per_bucket: int = 1) -> dict:
        """OPTIMIZE-style small-file compaction: rewrite each partition
        directory holding more than ``target_files_per_bucket`` parquet
        files down to ONE file each, leaving compact partitions
        untouched (BucketedTable.compact — one job, CAS-committed,
        content-preserving; tests assert row equality)."""
        return self._table(path).compact(target_files_per_bucket)

    def vacuum(self, keep: int = 2, retain_seconds: float = 4 * 3600.0) -> dict:
        """Reclaim orphaned data files (crashed/lost-race commits) and
        superseded snapshots on both tables; ``keep`` is the reader
        retention window (manifest.vacuum)."""
        out = {}
        for path in (self.dim_path, self.fact_path):
            if manifest.list_versions(self.spark, path):
                out[os.path.basename(path)] = manifest.vacuum(
                    self.spark, path, keep, retain_seconds
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
