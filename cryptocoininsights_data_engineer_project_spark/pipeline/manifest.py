"""Snapshot/manifest commit protocol for multi-writer parquet tables.

The reference serializes all table writes through a linear Airflow DAG
(coininsights.py:358-363 — extract >> transform >> load), so two
writers can never race. A 100 TB engine cannot rely on that: this repo
itself ships two natural concurrent writers (a streaming candle
maintainer, streaming/ingest.py, plus batch upsert/delete/compact on
the same warehouse). This module is the Iceberg/Delta-style answer,
cut down to the two ideas that carry all the safety:

1. **Immutable data files.** A commit only ever ADDS parquet files
   (under a fresh per-commit token so concurrent writers can never
   collide on a name) — it never modifies or deletes a live file.
   Files unreachable from a manifest are invisible to every reader, so
   a writer that crashes mid-commit leaves orphans, not corruption;
   ``vacuum`` reclaims them later.
2. **One atomic pointer.** The table state IS the highest-numbered
   manifest in ``_manifests/``: a JSON snapshot listing every live
   file per partition directory plus the authoritative table schema.
   Publishing version N+1 is a create-exclusive CAS — exactly one of
   any set of racing writers wins; the losers see the collision,
   re-read the new snapshot, re-derive their commit, and retry (or
   raise ``ConcurrentWriteError`` after bounded retries). Readers load
   the manifest once and read exactly its file list: a snapshot — a
   commit landing mid-read can never produce a mixed-version result,
   because old files outlive the manifests that reference them until
   ``vacuum``'s retention window passes.

CAS primitive by filesystem: local paths use ``os.link`` (POSIX link(2)
is atomic and fails EEXIST if the target exists — a true compare-and-
swap with full content, since the temp file is complete before the
link). Non-local paths go through Hadoop ``FileSystem.create(path,
overwrite=false)`` — atomic-exclusive on HDFS; on object stores the
same slot maps to a conditional PUT (S3 If-None-Match), which is why
readers tolerate an unparsable newest manifest by falling back one
version instead of failing.

Storing the schema in the manifest also retires schema roulette: a
plain ``spark.read.parquet(dir)`` samples one file's footer, so a
bucketed table mid-schema-evolution (touched buckets rewritten with a
new column, untouched buckets still on the old physical schema) reads
differently depending on listing order. Snapshot reads pass the
manifest schema explicitly — files missing an evolved column yield
typed NULLs, deterministically.
"""

from __future__ import annotations

import json
import os
import posixpath
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_DIR = "_manifests"
STAGING_DIR = "_staging"


class VacuumError(RuntimeError):
    """A manifest inside the retention window could not be read.
    Vacuum aborts rather than guessing: treating an unreadable retained
    manifest as empty would classify every file it references as an
    orphan and delete a live commit."""


class ConcurrentWriteError(RuntimeError):
    """A commit lost the CAS race more than ``max_retries`` times in a
    row — the table is under heavier write contention than the caller
    allowed for. Nothing was corrupted: every attempt's files are
    unreachable orphans awaiting vacuum."""


def _is_local(path: str) -> bool:
    return "://" not in path or path.startswith("file:")


def _strip_scheme(path: str) -> str:
    return path[len("file:") :] if path.startswith("file:") else path


def _manifest_name(version: int) -> str:
    return f"m-{version:012d}.json"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, MANIFEST_DIR, _manifest_name(version))


def _hadoop_fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def list_versions(spark: SparkSession, root: str) -> list[int]:
    """Committed manifest versions, ascending. Metadata-only: one
    directory listing, no data I/O."""
    mdir = os.path.join(root, MANIFEST_DIR)
    if _is_local(mdir):
        local = _strip_scheme(mdir)
        if not os.path.isdir(local):
            return []
        names = os.listdir(local)
    else:
        fs, jp = _hadoop_fs(spark, mdir)
        if not fs.exists(jp):
            return []
        names = [s.getPath().getName() for s in fs.listStatus(jp)]
    out = []
    for n in names:
        if n.startswith("m-") and n.endswith(".json"):
            try:
                out.append(int(n[2:-5]))
            except ValueError:
                continue
    return sorted(out)


def read_manifest(spark: SparkSession, root: str, version: int) -> dict | None:
    p = _manifest_path(root, version)
    try:
        if _is_local(p):
            with open(_strip_scheme(p), "rb") as f:
                return json.loads(f.read())
        fs, jp = _hadoop_fs(spark, p)
        stream = fs.open(jp)
        try:
            data = bytes(stream.readAllBytes())
        finally:
            stream.close()
        return json.loads(data)
    except (OSError, ValueError):
        return None


def latest_manifest(
    spark: SparkSession, root: str
) -> tuple[int, dict | None]:
    """(version, manifest) of the newest READABLE manifest; (0, None)
    for a table that does not exist yet. Falls back one version past an
    unparsable newest file (a non-atomic-content store mid-publish)."""
    for v in reversed(list_versions(spark, root)):
        m = read_manifest(spark, root, v)
        if m is not None:
            return v, m
    return 0, None


def publish_manifest(
    spark: SparkSession, root: str, version: int, manifest: dict
) -> bool:
    """CAS-publish ``manifest`` as version ``version``. True = this
    writer won the slot; False = another commit already holds it (the
    caller re-reads the new snapshot and retries)."""
    manifest = dict(manifest, version=version)
    payload = json.dumps(manifest, sort_keys=True).encode()
    final = _manifest_path(root, version)
    if _is_local(final):
        final_l = _strip_scheme(final)
        mdir = os.path.dirname(final_l)
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(payload)
        try:
            os.link(tmp, final)  # atomic; EEXIST = lost the race
            return True
        except FileExistsError:
            return False
        except OSError as e:
            # Only EPERM/EOPNOTSUPP/ENOTSUP mean "this mount cannot
            # hard-link" (some NFS/FUSE): surface that requirement.
            # Anything else (ENOSPC/EIO/EACCES/…) is a real I/O failure
            # and must propagate unwrapped so operators see the true
            # cause. The tmp file is cleaned up by the finally below.
            import errno as _errno

            _linkless = {_errno.EPERM, _errno.EOPNOTSUPP}
            if hasattr(_errno, "ENOTSUP"):
                _linkless.add(_errno.ENOTSUP)
            if e.errno not in _linkless:
                raise
            raise OSError(
                f"manifest CAS at {mdir} requires hard-link support "
                f"(os.link failed: {e}); mount the table on a POSIX "
                "filesystem or address it with a URI scheme "
                "(hdfs://, s3a://) to use the Hadoop create-exclusive "
                "path instead"
            ) from e
        finally:
            os.unlink(tmp)
    fs, jp = _hadoop_fs(spark, final)
    fs.mkdirs(jp.getParent())
    try:
        stream = fs.create(jp, False)  # atomic-exclusive on HDFS
    except Exception:
        return False
    try:
        stream.write(bytearray(payload))
    finally:
        stream.close()
    return True


def stage_commit_files(
    spark: SparkSession,
    root: str,
    frame: DataFrame,
    partition_cols: list[str],
) -> dict[str, list[str]]:
    """Write ``frame`` under a fresh commit token and move its parquet
    files into the live partition directories with collision-free
    names. Returns {relative partition dir: [file names]} — "" keys an
    unpartitioned table's root. Pure adds: nothing live is touched, so
    until (unless) the commit's manifest publishes, these files do not
    exist as far as any reader is concerned."""
    token = uuid.uuid4().hex[:12]
    tmp = os.path.join(root, STAGING_DIR, token)
    writer = frame.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    fs, _ = _hadoop_fs(spark, root)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    out: dict[str, list[str]] = {}
    # walk staging for data files; grouped by partition-relative dir
    stack = [""]
    while stack:
        rel = stack.pop()
        st_dir = jpath(os.path.join(tmp, rel) if rel else tmp)
        for st in fs.listStatus(st_dir):
            name = st.getPath().getName()
            if st.isDirectory():
                stack.append(posixpath.join(rel, name) if rel else name)
            elif name.endswith(".parquet"):
                dst_dir = os.path.join(root, rel) if rel else root
                fs.mkdirs(jpath(dst_dir))
                new_name = f"{token}-{name}"
                dst = jpath(os.path.join(dst_dir, new_name))
                # Hadoop rename signals failure by RETURN VALUE, not by
                # raising; an unchecked False here would publish a
                # manifest referencing a file that never landed.
                if not fs.rename(st.getPath(), dst):
                    raise IOError(
                        f"stage_commit_files: rename of staged file "
                        f"{st.getPath()} -> {dst} failed (destination "
                        "dir removed by a concurrent process?)"
                    )
                out.setdefault(rel, []).append(new_name)
    fs.delete(jpath(tmp), True)
    return out


def snapshot_read(
    spark: SparkSession, root: str, manifest: dict, dirs: list[str] | None = None
) -> DataFrame:
    """Read exactly the manifest's file list (optionally restricted to
    ``dirs`` — file-level pruning, stronger than a partition filter:
    unlisted files never even reach the scan's file index). The
    manifest schema is authoritative: files predating an evolved column
    surface typed NULLs, partition columns parse from directory names
    via basePath."""
    parts = manifest["partitions"]
    if dirs is not None:
        want = set(dirs)
        parts = {d: fl for d, fl in parts.items() if d in want}
    files = [
        os.path.join(root, d, f) if d else os.path.join(root, f)
        for d, fl in sorted(parts.items())
        for f in fl
    ]
    schema = T.StructType.fromJson(json.loads(manifest["schema"]))
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema).option("basePath", root).parquet(*files)
    )


def vacuum(
    spark: SparkSession,
    root: str,
    keep: int = 2,
    retain_seconds: float = 4 * 3600.0,
) -> dict[str, int]:
    """Reclaim space: delete data files referenced by NO retained
    manifest (commit-crash orphans and files superseded more than
    ``keep`` versions ago) plus manifests older than the newest
    ``keep``. ``keep`` is the version retention window — a reader
    holding a snapshot older than ``keep`` commits can lose files
    mid-read, the same time-travel-retention contract Delta/Iceberg
    document.

    ``retain_seconds`` is the AGE guard (Delta's
    ``deletedFileRetentionDuration``): an unreferenced file or staging
    directory is only deleted if its modification time is older than
    this threshold. This is what makes auto-vacuum safe next to an
    in-flight commit — ``stage_commit_files`` renames fresh files into
    live partition dirs BEFORE the manifest CAS publishes, so for a
    moment a live-to-be file is "unreferenced"; the age gate leaves
    any file younger than the longest plausible commit alone. Pass
    ``retain_seconds=0`` only when no writer can be mid-commit (tests,
    single-writer offline maintenance).

    Raises :class:`VacuumError` if a manifest inside the ``keep``
    window cannot be read: an unreadable retained manifest means its
    file references are unknown, and deleting "orphans" under that
    uncertainty could destroy a live commit.

    Returns {"data_files": n, "manifests": m} deleted."""
    versions = list_versions(spark, root)
    if not versions:
        return {"data_files": 0, "manifests": 0}
    kept, dropped = versions[-keep:], versions[:-keep]
    live: set[str] = set()
    for v in kept:
        m = read_manifest(spark, root, v)
        if m is None:
            # one re-read: a conditional-PUT store can expose a manifest
            # name before its content settles
            m = read_manifest(spark, root, v)
        if m is None:
            raise VacuumError(
                f"retained manifest version {v} at {root} is unreadable; "
                "aborting vacuum (its file references are unknown — "
                "deleting orphans now could destroy a live commit)"
            )
        for d, fl in m["partitions"].items():
            for f in fl:
                live.add(posixpath.join(d, f) if d else f)
    fs, jroot = _hadoop_fs(spark, root)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    cutoff_ms = time.time() * 1000.0 - retain_seconds * 1000.0
    n_data = 0
    # stack entries carry the directory's mtime AS LISTED BY ITS PARENT
    # (i.e. before this vacuum deleted anything inside it): the
    # empty-dir prune below is age-gated on that, so a partition dir
    # freshly mkdir'd by an in-flight stage_commit_files — momentarily
    # empty between fs.mkdirs and its first rename — is never swept.
    stack: list[tuple[str, float | None]] = [("", None)]
    while stack:
        rel, dir_mtime = stack.pop()
        if rel in (MANIFEST_DIR, STAGING_DIR):
            continue
        st_dir = jpath(os.path.join(root, rel) if rel else root)
        entries = list(fs.listStatus(st_dir))
        for st in entries:
            name = st.getPath().getName()
            child = posixpath.join(rel, name) if rel else name
            if st.isDirectory():
                if name not in (MANIFEST_DIR, STAGING_DIR):
                    stack.append((child, float(st.getModificationTime())))
            elif (
                name.endswith(".parquet")
                and child not in live
                and st.getModificationTime() <= cutoff_ms
            ):
                fs.delete(st.getPath(), False)
                n_data += 1
        # prune now-empty partition dirs (never the table root),
        # age-gated like files (see stack comment above)
        if (
            rel
            and dir_mtime is not None
            and dir_mtime <= cutoff_ms
            and not list(fs.listStatus(st_dir))
        ):
            fs.delete(st_dir, False)
    # staging dirs from crashed commits — age-gated per token dir, so a
    # commit still writing its staging files is never swept from under it
    jstag = jpath(os.path.join(root, STAGING_DIR))
    if fs.exists(jstag):
        for st in fs.listStatus(jstag):
            if st.getModificationTime() <= cutoff_ms:
                fs.delete(st.getPath(), True)
    for v in dropped:
        fs.delete(jpath(_manifest_path(root, v)), False)
    return {"data_files": n_data, "manifests": len(dropped)}


def table_history(spark: SparkSession, root: str) -> list[dict]:
    """Commit log, oldest first: [{version, n_files, n_partitions}].
    Pure metadata — one listing + one small JSON read per retained
    version (superseded manifests vanish at vacuum, like Delta's
    logRetentionDuration)."""
    out = []
    for v in list_versions(spark, root):
        m = read_manifest(spark, root, v)
        if m is None:
            continue
        out.append(
            {
                "version": v,
                "n_partitions": len(m["partitions"]),
                "n_files": sum(len(fl) for fl in m["partitions"].values()),
            }
        )
    return out


def read_version(
    spark: SparkSession, root: str, version: int
) -> DataFrame:
    """Time travel: the table AS OF ``version`` — exactly that
    manifest's file list, valid as long as the version is inside the
    vacuum retention window. Raises KeyError for a vacuumed/unknown
    version (loudly — a silently-empty past is worse than none)."""
    m = read_manifest(spark, root, version)
    if m is None:
        raise KeyError(
            f"version {version} not available at {root} "
            f"(retained: {list_versions(spark, root)})"
        )
    return snapshot_read(spark, root, m)


def snapshot_diff(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int,
    keys: list[str],
) -> DataFrame:
    """Change-data feed between two retained versions: one row per
    changed key with ``change_type`` in {insert, delete, update} plus
    null-safe ``old``/``new`` structs of the non-key columns (the
    Delta CDF shape, derived rather than logged). This is the
    PHYSICAL counterpart of the registry's `snapshot_diff` query
    (queries.py — a logical full-outer diff of two temporal cuts):
    same verdict semantics, but here the manifests prune the scans.

    Scale shape — the manifest does the heavy lifting BEFORE any I/O:
    data files are immutable and manifests carry per-partition file
    lists, so a partition whose list is IDENTICAL in both manifests
    cannot contain a change and is pruned from BOTH scans at the
    file-index level. A merge that touched 3 of 10k buckets diffs by
    reading ~6 bucket-files, not two full table snapshots; the join
    that remains is co-partitioned on the keys. Raises KeyError for
    vacuumed versions (same contract as read_version)."""
    m_from = read_manifest(spark, root, from_version)
    m_to = read_manifest(spark, root, to_version)
    if m_from is None or m_to is None:
        missing = from_version if m_from is None else to_version
        raise KeyError(
            f"version {missing} not available at {root} "
            f"(retained: {list_versions(spark, root)})"
        )
    pf, pt = m_from["partitions"], m_to["partitions"]
    changed = sorted(
        d
        for d in set(pf) | set(pt)
        if sorted(pf.get(d, [])) != sorted(pt.get(d, []))
    )
    old = snapshot_read(spark, root, m_from, dirs=changed)
    new = snapshot_read(spark, root, m_to, dirs=changed)
    nonkeys = [c for c in new.columns if c not in keys]
    # keys-only tables degrade to presence diffs (constant payload:
    # matched keys compare equal and drop, inserts/deletes survive)
    payload = (F.struct(*nonkeys) if nonkeys else F.lit(0))
    o = old.select(*keys, payload.alias("old"))
    n = new.select(*keys, payload.alias("new"))
    j = o.alias("o").join(n.alias("n"), keys, "full_outer")
    return j.select(
        *keys,
        F.when(F.col("o.old").isNull(), F.lit("insert"))
        .when(F.col("n.new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        F.col("o.old").alias("old"),
        F.col("n.new").alias("new"),
    ).filter(
        # unchanged rows re-read from a rewritten file are not changes
        ~F.col("o.old").eqNullSafe(F.col("n.new"))
    )


def rollback(spark: SparkSession, root: str, version: int) -> int:
    """Publish a NEW manifest whose content equals ``version`` — the
    roll-forward form of undo (history is preserved; nothing is
    deleted, so concurrent readers of the rolled-back-over commits are
    unaffected). Returns the new version number. The referenced files
    must still exist: only versions inside the retention window can be
    rolled back to."""
    m = read_manifest(spark, root, version)
    if m is None:
        raise KeyError(f"version {version} not available at {root}")
    for _ in range(5):
        cur, _m = latest_manifest(spark, root)
        if publish_manifest(
            spark,
            root,
            cur + 1,
            {k: v for k, v in m.items() if k != "version"},
        ):
            return cur + 1
    raise ConcurrentWriteError(f"rollback lost the manifest CAS at {root}")


class SnapshotTable:
    """Unpartitioned manifest-committed parquet table — the smallest
    useful shape of the protocol, for tables maintained by full-
    snapshot rewrite (the streaming candle table: a few thousand bars,
    rewritten per micro-batch). ``overwrite`` is crash-safe (orphans,
    never torn tables) and concurrency-safe (CAS + bounded retry);
    ``read`` returns None ONLY for a table with no committed manifest —
    a real read error propagates instead of masquerading as absence
    (the failure ADVICE.md flagged in the old overwrite-in-place form,
    where a corrupt table read silently became "table absent" and a
    replayed batch rebuilt the table from itself alone)."""

    def __init__(self, spark: SparkSession, path: str, max_retries: int = 5):
        self.spark = spark
        self.path = path
        self.max_retries = max_retries

    def read(self) -> DataFrame | None:
        _, m = latest_manifest(self.spark, self.path)
        if m is None:
            return None
        return snapshot_read(self.spark, self.path, m)

    def overwrite(self, df: DataFrame) -> int:
        """Commit ``df`` as the new full snapshot; returns the
        committed version. Last-writer-wins replace: a lost race
        retries into the next version slot unchanged. For
        read-modify-write (where a retry must see the racing commit)
        use ``update``."""
        return self.update(lambda _cur: df)

    def update(self, build) -> int:
        """Read-modify-write with optimistic concurrency:
        ``build(current: DataFrame | None) -> DataFrame`` derives the
        new snapshot from the CURRENT one; a lost CAS re-reads the
        fresh snapshot and re-runs ``build`` against it, so no
        concurrent commit's rows are ever silently dropped."""
        for _ in range(self.max_retries):
            version, m = latest_manifest(self.spark, self.path)
            cur = (
                snapshot_read(self.spark, self.path, m)
                if m is not None
                else None
            )
            df = build(cur)
            parts = stage_commit_files(self.spark, self.path, df, [])
            manifest = {"schema": df.schema.json(), "partitions": parts}
            if publish_manifest(self.spark, self.path, version + 1, manifest):
                return version + 1
        raise ConcurrentWriteError(
            f"lost the manifest CAS {self.max_retries} times at {self.path}"
        )

    def vacuum(
        self, keep: int = 2, retain_seconds: float = 4 * 3600.0
    ) -> dict[str, int]:
        return vacuum(self.spark, self.path, keep, retain_seconds)
