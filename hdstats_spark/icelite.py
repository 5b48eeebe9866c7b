"""icelite — Iceberg-semantics emulation over Parquet + JSON metadata.

The sandbox ships no Iceberg runtime jar (SURVEY.md §7), so tier tables get
Iceberg's *operational* semantics — immutable snapshots, per-partition
manifests, append / overwrite-by-partition, time travel by snapshot id, and
lineage records — from a thin layer: Parquet data files laid out by partition
plus a JSON metadata log.  The interface is deliberately shaped so a real
deployment swaps `IceliteTable` for ``spark.read.format("iceberg")`` /
``df.writeTo(...)`` without touching callers.

Layout:
    <root>/data/<partition>=<value>/part-*.parquet
    <root>/metadata/snapshot-<id>.json     (one per commit)
    <root>/metadata/current                 (id of the live snapshot)

Each snapshot records: parent id, operation, the partition→files manifest,
row counts, and a caller-supplied lineage dict (input snapshot-id, partition
range, rows processed, metrics) — the checkpoint/resume contract of the
north rule.  Commits are atomic via write-temp + rename of `current`.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed between manifest read and flip — the icelite
    analogue of Iceberg's CommitFailedException (callers retry the merge)."""


@dataclass
class Snapshot:
    snapshot_id: str
    parent_id: str | None
    operation: str
    partitions: dict  # partition value -> {"files": [...], "rows": int}
    lineage: dict = field(default_factory=dict)
    committed_at: float = 0.0

    def to_json(self) -> dict:
        return self.__dict__


class IceliteTable:
    # commits hold the lock for milliseconds; a lock this old means the
    # holder died mid-commit and the file is safe to reclaim
    LOCK_STALE_S = 30.0

    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")

    # ------------------------------------------------------------- metadata

    def _snapshot_path(self, sid: str) -> str:
        return os.path.join(self.meta_dir, f"snapshot-{sid}.json")

    def current_snapshot_id(self) -> str | None:
        cur = os.path.join(self.meta_dir, "current")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return f.read().strip() or None

    def snapshot(self, sid: str | None = None) -> Snapshot | None:
        sid = sid or self.current_snapshot_id()
        if sid is None:
            return None
        with open(self._snapshot_path(sid)) as f:
            return Snapshot(**json.load(f))

    def snapshots(self) -> list[Snapshot]:
        if not os.path.isdir(self.meta_dir):
            return []
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            if name.startswith("snapshot-"):
                with open(os.path.join(self.meta_dir, name)) as f:
                    out.append(Snapshot(**json.load(f)))
        return sorted(out, key=lambda s: s.committed_at)

    def _acquire_lock(self) -> tuple[int, str]:
        """O_EXCL commit lock with stale-lock reclamation; returns
        (fd, owner token).  The token (written into the lock file) lets
        release verify it still owns the lock — a long holder whose lock was
        reclaimed must NOT unlink the reclaimer's fresh lock, or mutual
        exclusion breaks for a third writer.  Reclamation itself renames the
        stale lock to a unique name before deleting (rename is atomic, so
        exactly one of several racing reclaimers wins — no stat-then-unlink
        TOCTOU where a reclaimer could delete a freshly re-acquired lock)."""
        os.makedirs(self.meta_dir, exist_ok=True)
        lock = os.path.join(self.meta_dir, ".commit.lock")
        token = f"{os.getpid()}:{uuid.uuid4().hex}"
        for _ in range(4000):  # ~20 s worst-case wait on a live lock
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, token.encode())
                return fd, token
            except FileExistsError:
                # stale-lock reclamation: a writer that crashed between
                # os.open(O_EXCL) and os.unlink would otherwise wedge every
                # future commit.  Commits hold the lock for milliseconds and
                # long maintenance holders heartbeat the mtime (_touch_lock),
                # so a lock older than LOCK_STALE_S seconds is dead.
                try:
                    if time.time() - os.stat(lock).st_mtime > self.LOCK_STALE_S:
                        grave = lock + f".reclaim.{uuid.uuid4().hex[:8]}"
                        os.rename(lock, grave)  # atomic: one reclaimer wins
                        os.unlink(grave)
                        continue
                except FileNotFoundError:
                    continue
                time.sleep(0.005)
        raise TimeoutError(f"commit lock busy: {lock}")

    def _touch_lock(self) -> None:
        """Heartbeat for long-running lock holders (maintenance): refresh the
        lock mtime so reclamation never steals a live lock."""
        try:
            os.utime(os.path.join(self.meta_dir, ".commit.lock"))
        except FileNotFoundError:
            pass

    def _release_lock(self, fd: int, token: str) -> None:
        os.close(fd)
        lock = os.path.join(self.meta_dir, ".commit.lock")
        try:
            with open(lock) as f:
                if f.read() != token:
                    # our lock was reclaimed as stale while we held it — the
                    # current file belongs to another writer; leave it alone
                    return
            # NB a read-then-unlink window technically remains (POSIX has no
            # portable compare-and-delete), but entering it requires OUR
            # mtime to be >LOCK_STALE_S old at this instant — impossible for
            # commits (held for milliseconds) and prevented for maintenance
            # by the _touch_lock heartbeat, so a reclaim between the read
            # above and this unlink cannot occur for a live holder.
            os.unlink(lock)
        except FileNotFoundError:
            pass

    def _commit(self, snap: Snapshot, expected_parent: str | None) -> Snapshot:
        """Optimistic-concurrency commit: flip `current` only while holding an
        O_EXCL lock AND only if the live snapshot is still the parent this
        commit was derived from (Iceberg's compare-and-swap on the metadata
        pointer).  A lost race raises CommitConflict; append/overwrite retry
        by re-reading the manifest and re-merging — data files are immutable
        and already written, so the retry is metadata-only."""
        fd, token = self._acquire_lock()
        try:
            if self.current_snapshot_id() != expected_parent:
                raise CommitConflict(
                    f"expected parent {expected_parent!r}, found "
                    f"{self.current_snapshot_id()!r}"
                )
            snap.committed_at = time.time()
            with open(self._snapshot_path(snap.snapshot_id), "w") as f:
                json.dump(snap.to_json(), f, indent=2, default=str)
            tmp = os.path.join(self.meta_dir, f".current.{snap.snapshot_id}")
            with open(tmp, "w") as f:
                f.write(snap.snapshot_id)
            os.replace(tmp, os.path.join(self.meta_dir, "current"))  # atomic flip
            return snap
        finally:
            self._release_lock(fd, token)

    # ------------------------------------------------------------- write

    def _write_partition_files(
        self, df: DataFrame, partition_col: str | None, cluster: str = "roundrobin"
    ) -> dict:
        """Write data files for this commit into a unique subdir and return
        the partition manifest {value: {files, rows}}.  Records a timing
        breakdown in ``self.last_write_timings`` (spark write vs driver-side
        footer/manifest work) for the scaling harness."""
        t_start = time.time()
        commit_dir = os.path.join(self.data_dir, f"commit-{uuid.uuid4().hex[:12]}")
        if partition_col is None:
            df.write.mode("overwrite").parquet(commit_dir)
            import pyarrow.parquet as pq

            paths = [
                os.path.join(commit_dir, name)
                for name in os.listdir(commit_dir)
                if name.endswith(".parquet")
            ]
            # row counts from the parquet FOOTERS just written — metadata-only
            # reads, no second Spark scan of fresh data (the partitioned path
            # below already proved footers suffice)
            rows = int(sum(pq.ParquetFile(p).metadata.num_rows for p in paths))
            files = [os.path.relpath(p, self.root) for p in paths]
            return {"__all__": {"files": files, "rows": rows}}
        # write clustering tradeoff:
        #   asis — NO extra exchange: write straight from the caller's
        #     partitioning (the co-partitioned tier plan arrives hash-
        #     clustered on conv_id with full parallelism — re-shuffling a
        #     36M-row tier just to pick writers was the single biggest
        #     avoidable data movement in the rollup phase).
        #   roundrobin — every core writes concurrently regardless of how few
        #     partition values exist (day-clustering caps writers at #days and
        #     hash collisions cut that further); cost: tasks×partitions files.
        #   bypart — one file per partition value; right for SMALL commits
        #     (1h/1d) whose readers would otherwise face a tiny-file storm.
        parallelism = df.sparkSession.sparkContext.defaultParallelism
        if cluster == "bypart":
            df = df.repartition(parallelism, partition_col)
        elif cluster == "roundrobin":
            df = df.repartition(parallelism)
        (
            df.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(commit_dir)
        )
        t_written = time.time()
        # per-partition row counts from the parquet FOOTERS just written —
        # metadata-only reads, no extra Spark job, and the manifest still
        # reflects exactly what landed on disk; footer reads are I/O-bound,
        # so a thread pool keeps the driver-side commit under a second even
        # for ~1000 files
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        part_files: dict[str, list[str]] = {}
        for entry in os.listdir(commit_dir):
            if "=" not in entry:
                continue
            # Spark escapes special chars (space, ':', '%', …) in partition
            # directory names; manifest keys carry the LOGICAL value so
            # read(partitions=[...]) / committed_partitions() match what the
            # caller wrote
            value = unquote(entry.split("=", 1)[1])
            pdir = os.path.join(commit_dir, entry)
            part_files[value] = [
                os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".parquet")
            ]
        all_files = [f for fs in part_files.values() for f in fs]
        with ThreadPoolExecutor(max_workers=16) as ex:
            counts = dict(
                zip(all_files, ex.map(lambda p: pq.ParquetFile(p).metadata.num_rows, all_files))
            )
        manifest = {}
        for value, fs in part_files.items():
            manifest[value] = {
                # manifest paths are TABLE-ROOT-RELATIVE so a table directory
                # can be relocated wholesale
                "files": [os.path.relpath(f, self.root) for f in fs],
                "rows": int(sum(counts[f] for f in fs)),
            }
        self.last_write_timings = {
            "write_s": round(t_written - t_start, 2),
            "manifest_s": round(time.time() - t_written, 2),
            "n_files": len(all_files),
        }
        return manifest

    def append(
        self, df: DataFrame, partition_col: str | None = None, lineage: dict | None = None
    ) -> Snapshot:
        new = self._write_partition_files(df, partition_col)
        for _ in range(20):  # optimistic retry on concurrent commits
            prev = self.snapshot()
            parts = dict(prev.partitions) if prev else {}
            for value, m in new.items():
                if value in parts:
                    parts[value] = {
                        "files": parts[value]["files"] + m["files"],
                        "rows": parts[value]["rows"] + m["rows"],
                    }
                else:
                    parts[value] = m
            try:
                return self._commit(
                    Snapshot(
                        snapshot_id=uuid.uuid4().hex[:16],
                        parent_id=prev.snapshot_id if prev else None,
                        operation="append",
                        partitions=parts,
                        lineage=lineage or {},
                    ),
                    expected_parent=prev.snapshot_id if prev else None,
                )
            except CommitConflict:
                continue
        raise CommitConflict("append lost 20 consecutive commit races")

    def overwrite_partitions(
        self,
        df: DataFrame,
        partition_col: str,
        lineage: dict | None = None,
        cluster: str = "roundrobin",
    ) -> Snapshot:
        """Idempotent re-roll: replace exactly the partitions present in df
        (late-data handling — SURVEY.md §2 streaming notes)."""
        new = self._write_partition_files(df, partition_col, cluster)
        for _ in range(20):
            prev = self.snapshot()
            parts = dict(prev.partitions) if prev else {}
            parts.update(new)  # replaced partitions point at the new files only
            try:
                return self._commit(
                    Snapshot(
                        snapshot_id=uuid.uuid4().hex[:16],
                        parent_id=prev.snapshot_id if prev else None,
                        operation="overwrite",
                        partitions=parts,
                        lineage=lineage or {},
                    ),
                    expected_parent=prev.snapshot_id if prev else None,
                )
            except CommitConflict:
                continue
        raise CommitConflict("overwrite lost 20 consecutive commit races")

    # ------------------------------------------------------------- read

    def read(
        self,
        spark: SparkSession,
        snapshot_id: str | None = None,
        partitions: list[str] | None = None,
    ) -> DataFrame:
        """Read a snapshot (default: current), optionally pruned to given
        partition values — manifest-level partition pruning, so Spark never
        even lists the skipped files."""
        snap = self.snapshot(snapshot_id)
        if snap is None:
            raise FileNotFoundError(f"no snapshot in {self.root}")
        files = []
        for value, m in snap.partitions.items():
            if partitions is None or value in partitions:
                files.extend(
                    f if os.path.isabs(f) else os.path.join(self.root, f)
                    for f in m["files"]
                )
        if not files:
            raise ValueError("no files match the partition filter")
        return spark.read.parquet(*files)

    def committed_partitions(self) -> set[str]:
        snap = self.snapshot()
        return set(snap.partitions) if snap else set()

    def rows(self, snapshot_id: str | None = None) -> int:
        snap = self.snapshot(snapshot_id)
        return sum(m["rows"] for m in snap.partitions.values()) if snap else 0

    # ------------------------------------------------------- maintenance

    def compact_partition(
        self,
        spark: SparkSession,
        partition_col: str,
        value: str,
        target_files: int = 1,
        lineage: dict | None = None,
    ) -> Snapshot | None:
        """Rewrite one partition's data files into ``target_files`` files —
        the icelite analogue of Iceberg's rewriteDataFiles (small-file
        compaction): continuous appends (one file per streaming micro-batch,
        one per writer task in the batch path) otherwise degrade scan
        parallelism into a tiny-file storm at 10^5+ commits.

        Content is unchanged: the replacement snapshot points the partition
        at the new files only, older snapshots keep the old files (time
        travel intact until expire_snapshots GCs them), and the commit is
        the same optimistic CAS as append/overwrite.  If another writer
        touched the partition between the rewrite and the commit, the
        compaction SKIPS (returns None, files are cleaned up) rather than
        clobbering the concurrent append — the next maintenance run
        retries, exactly Iceberg's rewrite-conflict behavior."""
        import shutil

        prev = self.snapshot()
        if prev is None or value not in prev.partitions:
            return None
        original = prev.partitions[value]
        df = self.read(spark, partitions=[value]).coalesce(max(1, target_files))
        commit_dir = os.path.join(self.data_dir, f"compact-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(commit_dir)
        import pyarrow.parquet as pq

        paths = [
            os.path.join(commit_dir, n)
            for n in os.listdir(commit_dir)
            if n.endswith(".parquet")
        ]
        rows = int(sum(pq.ParquetFile(p).metadata.num_rows for p in paths))
        if rows != original["rows"]:
            # a writer touched the partition between snapshot() and read()
            # (the rewrite saw more/fewer rows than the manifest this
            # compaction was planned against) — conflict-skip, same as the
            # manifest check below; never an exception in the sink path
            shutil.rmtree(commit_dir, ignore_errors=True)
            return None
        new_manifest = {
            "files": [os.path.relpath(p, self.root) for p in paths],
            "rows": rows,
        }
        try:
            for _ in range(20):
                prev = self.snapshot()
                if prev.partitions.get(value) != original:
                    # concurrent append/overwrite of this partition since the
                    # rewrite started — abandon, GC our files, retry next run
                    shutil.rmtree(commit_dir, ignore_errors=True)
                    return None
                parts = dict(prev.partitions)
                parts[value] = new_manifest
                try:
                    return self._commit(
                        Snapshot(
                            snapshot_id=uuid.uuid4().hex[:16],
                            parent_id=prev.snapshot_id,
                            operation="compact",
                            partitions=parts,
                            lineage=lineage or {"compacted": value},
                        ),
                        expected_parent=prev.snapshot_id,
                    )
                except CommitConflict:
                    continue
            raise CommitConflict("compact lost 20 consecutive commit races")
        except Exception:
            # incl. TimeoutError from the commit lock: the rewritten files
            # were never referenced by any snapshot — GC them, don't orphan
            shutil.rmtree(commit_dir, ignore_errors=True)
            raise

    def expire_snapshots(
        self, keep_last: int = 1, older_than_s: float | None = None
    ) -> dict:
        """Expire old snapshots and GC the data files only they reference —
        the icelite analogue of Iceberg's expireSnapshots: without it a
        long-lived table pins every file ever written (compaction and
        overwrite never physically delete).

        Retains the newest ``keep_last`` snapshots, everything newer than
        ``older_than_s`` seconds, and ALWAYS the current snapshot.  Runs
        entirely under the commit lock (maintenance, not hot path) so no
        concurrent commit can add a reference while the live-file set is
        computed; the lock mtime is heartbeated during the deletion loops so
        stale-lock reclamation never steals it from a long GC.  Returns
        {"snapshots_removed": n, "files_removed": n}."""
        fd, token = self._acquire_lock()
        try:
            snaps = self.snapshots()
            current = self.current_snapshot_id()
            cutoff = time.time() - older_than_s if older_than_s is not None else None
            keep: set[str] = set(s.snapshot_id for s in snaps[-keep_last:]) if keep_last else set()
            if current:
                keep.add(current)
            if cutoff is not None:
                keep.update(s.snapshot_id for s in snaps if s.committed_at >= cutoff)
            expired = [s for s in snaps if s.snapshot_id not in keep]
            live_files: set[str] = set()
            for s in snaps:
                if s.snapshot_id in keep:
                    for m in s.partitions.values():
                        live_files.update(m["files"])
            dead_files: set[str] = set()
            for s in expired:
                for m in s.partitions.values():
                    dead_files.update(f for f in m["files"] if f not in live_files)
            for i, f in enumerate(dead_files):
                if i % 1000 == 0:
                    self._touch_lock()  # heartbeat: GC can outlive LOCK_STALE_S
                path = f if os.path.isabs(f) else os.path.join(self.root, f)
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
            for i, s in enumerate(expired):
                if i % 1000 == 0:
                    self._touch_lock()
                os.unlink(self._snapshot_path(s.snapshot_id))
            # drop now-empty commit dirs so the data tree stays listable
            if os.path.isdir(self.data_dir):
                for entry in os.listdir(self.data_dir):
                    d = os.path.join(self.data_dir, entry)
                    if os.path.isdir(d) and not any(
                        files for _, _, files in os.walk(d)
                    ):
                        import shutil

                        shutil.rmtree(d, ignore_errors=True)
            return {
                "snapshots_removed": len(expired),
                "files_removed": len(dead_files),
            }
        finally:
            self._release_lock(fd, token)
