"""BucketedTable: the generic manifest-committed keyed table.

The engine surface behind CoinWarehouse, extracted so ANY keyed table
gets the same storage contract — multi-column merge keys, hash-bucket
layout, optional date partition above the buckets, snapshot/manifest
commits (pipeline/manifest.py):

- **upsert** merges a stage frame on the key columns, reading and
  rewriting ONLY the buckets that contain stage keys (pruned at the
  manifest file-list level — merge I/O ∝ delta, the 100 TB property);
- **concurrent writers** serialize optimistically through the manifest
  CAS — the loser re-reads the winner's snapshot and re-derives, so a
  streaming maintainer and a batch job can share one table;
- **readers** pin one manifest: snapshot isolation, time travel via
  manifest.read_version, roll-forward undo via manifest.rollback;
- **delete / compact / vacuum** are the maintenance verbs, all
  committing through the same CAS.

Layout: ``[p_date=<date(date_col)>/]bucket=<pmod(xxhash64(keys), n)>``.
The date partition serves time-windowed readers (PartitionFilters);
the merge path prunes on bucket alone, so adding dates never widens
merge I/O. n_buckets is fixed at table creation (stored in the
manifest) — repartitioning a live table is a full rewrite, as in every
bucketed store.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import dedupe_latest, merge
from . import manifest


def _bucket_of(partition_dir: str) -> int | None:
    """Bucket id embedded in a manifest partition dir ("bucket=3" or
    "p_date=2024-01-01/bucket=3")."""
    for seg in partition_dir.split("/"):
        if seg.startswith("bucket="):
            return int(seg[len("bucket=") :])
    return None


class BucketedTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: Sequence[str],
        n_buckets: int = 16,
        date_col: str | None = None,
        max_commit_retries: int = 5,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.n_buckets = n_buckets
        self.date_col = date_col
        self.max_commit_retries = max_commit_retries

    # ----------------------------------------------------------- layout
    def _partition_cols(self) -> list[str]:
        return (["p_date"] if self.date_col else []) + ["bucket"]

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_buckets)),
        )

    def _with_partition_cols(self, df: DataFrame) -> DataFrame:
        if self.date_col:
            df = df.withColumn("p_date", F.to_date(self.date_col))
        return df

    # ------------------------------------------------------------ reads
    def _snapshot(self, buckets=None):
        version, m = manifest.latest_manifest(self.spark, self.path)
        if m is None:
            return version, None, None
        dirs = None
        if buckets is not None:
            want = set(buckets)
            dirs = [d for d in m["partitions"] if _bucket_of(d) in want]
        return (
            version,
            m,
            manifest.snapshot_read(self.spark, self.path, m, dirs),
        )

    def read(self, with_partitions: bool = False) -> DataFrame | None:
        _, _, df = self._snapshot()
        if df is None or with_partitions:
            return df
        return df.drop("bucket", "p_date")

    def history(self) -> list[dict]:
        return manifest.table_history(self.spark, self.path)

    # ----------------------------------------------------------- writes
    def _commit(
        self, frame, version, old_partitions, touched, old_txns=None, txn=None
    ) -> bool:
        """Stage ``frame``'s files (pure adds under a per-commit token)
        and CAS-publish a manifest replacing exactly the touched
        buckets' entries; False = lost the race (caller retries).
        Losing attempts' files stay as invisible orphans for vacuum."""
        new_parts = manifest.stage_commit_files(
            self.spark, self.path, frame, self._partition_cols()
        )
        partitions = {
            d: fl
            for d, fl in old_partitions.items()
            if _bucket_of(d) not in touched
        }
        partitions.update(new_parts)
        txns = dict(old_txns or {})
        if txn is not None:
            app_id, txn_version = txn
            txns[app_id] = txn_version
        return manifest.publish_manifest(
            self.spark,
            self.path,
            version + 1,
            {
                "schema": frame.schema.json(),
                "partitions": partitions,
                "n_buckets": self.n_buckets,
                "txns": txns,
            },
        )

    def upsert(
        self,
        stage: DataFrame,
        cols: Sequence[str] | None = None,
        dedupe_order: Sequence[str] | None = None,
        txn: tuple[str, int] | None = None,
    ) -> bool:
        """MERGE ``stage`` on the key columns. ``cols`` fixes the
        output column list (default: the stage's columns); the table
        additionally keeps columns an earlier schema carried (schema
        evolution both ways — new stage columns materialize, columns a
        narrower stage dropped pass through, and the manifest schema
        keeps reads deterministic either way).

        ``txn=(app_id, version)`` makes the commit TRANSACTIONALLY
        IDEMPOTENT (the Delta txn-marker pattern): the manifest records
        the highest version committed per app_id, and an upsert whose
        version is <= the recorded one returns False WITHOUT touching
        the table — so a replayed foreachBatch micro-batch (crash
        between sink commit and checkpoint commit) is skipped entirely,
        exactly-once rather than merely merge-idempotent. The check
        rides the same CAS loop as the commit itself, so it holds under
        concurrent writers too. Returns True if this call committed."""
        cols = list(cols) if cols is not None else [
            c for c in stage.columns if c != "bucket"
        ]
        stage = self._bucketed(stage)
        touched = sorted(
            r["bucket"] for r in stage.select("bucket").distinct().collect()
        )
        for _ in range(self.max_commit_retries):
            version, m, _ = self._snapshot()
            if (
                txn is not None
                and m is not None
                and (m.get("txns") or {}).get(txn[0], -1) >= txn[1]
            ):
                return False  # this transaction already committed
            if m is None:
                result = stage
                if dedupe_order:
                    result = dedupe_latest(
                        result, self.key_cols, dedupe_order
                    )
                result = self._with_partition_cols(
                    result.select(*cols, "bucket")
                )
                if self._commit(result, version, {}, set(), None, txn):
                    return True
                continue  # lost the create race: table exists now
            _, _, target = self._snapshot(buckets=touched)
            out_cols = list(cols) + [
                c
                for c in target.columns
                if c not in cols and c not in ("bucket", "p_date")
            ]
            stage_fields = {f.name: f.dataType for f in stage.schema.fields}
            for c in out_cols:
                if c not in target.columns:
                    target = target.withColumn(
                        c, F.lit(None).cast(stage_fields[c])
                    )
            # bucket is an update column: inserted keys have no target
            # row to pass it through from (matched rows agree anyway)
            merged = merge(
                target.drop("p_date"),
                stage,
                keys=self.key_cols,
                update_cols=[
                    c
                    for c in out_cols
                    if c not in self.key_cols and c in stage.columns
                ]
                + ["bucket"],
                dedupe_order=dedupe_order,
            ).select(*out_cols, "bucket")
            merged = self._with_partition_cols(merged)
            if self._commit(
                merged,
                version,
                m["partitions"],
                set(touched),
                m.get("txns"),
                txn,
            ):
                return True
        raise manifest.ConcurrentWriteError(
            f"upsert lost the manifest CAS {self.max_commit_retries} times"
            f" at {self.path}"
        )

    def delete_keys(self, keys_df: DataFrame) -> dict:
        """Remove the given keys (a frame carrying the key columns) by
        rewriting ONLY their candidate buckets. Returns
        {"deleted": n, "buckets_rewritten": k}."""
        keys_df = self._bucketed(keys_df.select(*self.key_cols))
        touched = sorted(
            r["bucket"]
            for r in keys_df.select("bucket").distinct().collect()
        )
        for _ in range(self.max_commit_retries):
            version, m, _ = self._snapshot()
            if m is None:
                return {"deleted": 0, "buckets_rewritten": 0}
            _, _, sub = self._snapshot(buckets=touched)
            before = sub.count()
            kept = sub.join(
                keys_df.select(*self.key_cols), self.key_cols, "left_anti"
            )
            n_kept = kept.count()
            if "p_date" in kept.columns:
                kept = self._with_partition_cols(kept.drop("p_date"))
            if self._commit(
                kept, version, m["partitions"], set(touched), m.get("txns")
            ):
                return {
                    "deleted": before - n_kept,
                    "buckets_rewritten": len(touched),
                }
        raise manifest.ConcurrentWriteError(
            f"delete lost the manifest CAS {self.max_commit_retries} times"
            f" at {self.path}"
        )

    def compact(self, threshold_files: int = 1) -> dict:
        """Rewrite every partition dir holding more than
        ``threshold_files`` files down to one file each, in ONE job,
        through the same CAS. Returns {dir: files_before}."""
        for _ in range(self.max_commit_retries):
            version, m, _ = self._snapshot()
            if m is None:
                return {}
            sick = {
                d: len(fl)
                for d, fl in m["partitions"].items()
                if len(fl) > threshold_files
            }
            if not sick:
                return {}
            frame = manifest.snapshot_read(
                self.spark, self.path, m, dirs=sorted(sick)
            )
            # one task per sick dir → one output file per dir
            frame = frame.repartition(len(sick), *self._partition_cols())
            new_parts = manifest.stage_commit_files(
                self.spark, self.path, frame, self._partition_cols()
            )
            partitions = {
                d: fl for d, fl in m["partitions"].items() if d not in sick
            }
            partitions.update(new_parts)
            if manifest.publish_manifest(
                self.spark,
                self.path,
                version + 1,
                {
                    "schema": m["schema"],
                    "partitions": partitions,
                    "n_buckets": self.n_buckets,
                    "txns": m.get("txns") or {},
                },
            ):
                return sick
        raise manifest.ConcurrentWriteError(
            f"compact lost the manifest CAS {self.max_commit_retries} times"
            f" at {self.path}"
        )

    def vacuum(
        self, keep: int = 2, retain_seconds: float = 4 * 3600.0
    ) -> dict:
        return manifest.vacuum(self.spark, self.path, keep, retain_seconds)
