"""Transactional gold-layer MERGE over plain parquet: a minimal
manifest-pointer commit protocol (the Delta/Iceberg idea with no library
dependency — neither ships in this environment).

The reference's gold sink is per-key `put_item` into a key-value store
(`Configurable_ETL_Python.py:559-578`): each row lands atomically, but a
multi-row refresh is not atomic as a SET. `sinks/upsert.merge_upsert`
gives the partition-scoped MERGE with dynamic partition overwrite, whose
commit window is non-atomic across partitions (pinned by
tests/test_upsert.py). This module closes that gap:

  gold/
    _txlog/v{N}.json   immutable snapshot manifests: partition -> data dir
    _txlog/LATEST      single pointer file naming the current version
    data/{commit}/     each commit's parquet, partitioned by partition_col

  - Writers never mutate visible data: a merge writes NEW files under a
    fresh commit dir, then commits by creating the NEXT manifest
    v{N+1}.json with an ATOMIC create-if-absent (full content hard-linked
    into place — os.link fails with FileExistsError if v{N+1} exists, so
    exactly one of two racing writers wins). The manifest IS the commit,
    exactly Delta Lake's log-store contract: durable the instant it
    exists, and never partially visible (the link publishes complete
    bytes or nothing). A crash at any earlier point leaves only
    invisible orphan data files (vacuum_gold_tx removes them).
  - LATEST is a HINT, not the commit: publish updates it best-effort
    after the manifest lands, and readers probe forward from it for
    newer manifests. A crash between manifest-create and hint-update
    therefore leaves a COMMITTED version that the next reader/writer
    discovers by probing — no wedged table, no ambiguous debris.
  - Readers resolve the newest manifest once and read only the files
    that snapshot names — snapshot isolation: a concurrent merge never
    tears a read.
  - Writers are optimistic: publish checks that the newest manifest
    still names the snapshot the merge was based on, and the atomic
    create arbitrates the remaining race — the loser raises
    ConcurrentWriteError (retry = re-run the merge; it re-reads the new
    snapshot).

Scale notes: the manifest maps partitions to DIRECTORIES (one per commit
that last rewrote the partition), so its size is O(partitions), not
O(files); the merge reads and rewrites only touched partitions, exactly
like merge_upsert.

Storage is pluggable via sinks/logstore.LogStore: every function takes
`store=` (default LocalLogStore — os.link-if-absent, atomic on POSIX:
local, NFS, HDFS-via-fuse). For gold on an object store pass
`S3LogStore(bucket, prefix)` — the commit becomes a conditional put
(S3 `If-None-Match: *` / GCS `ifGenerationMatch=0`), which has identical
create-if-absent semantics; the LATEST hint stays best-effort either
way. Only manifest/hint blobs go through the store; data files are
written by Spark to `gold_path` (point both at the same bucket in
production).
"""

from __future__ import annotations

import json
import os
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .logstore import LocalLogStore, LogStore


class ConcurrentWriteError(RuntimeError):
    """Another merge committed between this merge's snapshot read and its
    publish; re-run the merge against the new snapshot."""


def _txdir(gold_path: str) -> str:
    return os.path.join(gold_path, "_txlog")


def _store(gold_path: str, store: LogStore | None) -> LogStore:
    return store if store is not None else LocalLogStore(_txdir(gold_path))


def _manifest_name(version: int) -> str:
    return f"v{version:08d}.json"


def _latest_version(gold_path: str, store: LogStore | None = None) -> int:
    """True current version: the LATEST hint, probed FORWARD for newer
    manifests (a crash between manifest-create and hint-update leaves the
    hint behind by a bounded number of commits — normally zero or one)."""
    st = _store(gold_path, store)
    hint = st.read("LATEST")
    try:
        version = int(hint.decode().strip()) if hint is not None else 0
    except ValueError:
        # a torn/garbled best-effort hint degrades like a missing one:
        # probe from 0 rather than bricking every read and write
        version = 0
    if version < 0:
        version = 0
    while st.exists(_manifest_name(version + 1)):
        version += 1
    if version > 0 and not st.exists(_manifest_name(version)):
        # a hint that PARSES but points past every manifest (overwritten
        # with junk, restored from a different table, ...) must degrade
        # like a garbled one — otherwise _read_latest json.loads(None)s.
        # Probing from 0 finds the true newest chain-reachable version.
        version = 0
        while st.exists(_manifest_name(version + 1)):
            version += 1
    return version


def _read_latest(
    gold_path: str, store: LogStore | None = None
) -> tuple[int, dict[str, str]]:
    """(version, {partition_value: data_dir}) of the current snapshot;
    (0, {}) for a table that does not exist yet."""
    st = _store(gold_path, store)
    version = _latest_version(gold_path, st)
    if version == 0:
        return 0, {}
    manifest = json.loads(st.read(_manifest_name(version)))
    return version, manifest["partitions"]


def _commit_manifest(gold_path: str, version: int, payload: dict,
                     store: LogStore | None = None) -> None:
    """THE commit: publish a complete manifest at v{version} iff no
    manifest with that version exists, atomically — the store's
    put_if_absent (os.link locally, a conditional put on an object
    store; see sinks/logstore.py). Two racing writers cannot both win,
    and readers can never observe a half-written manifest."""
    st = _store(gold_path, store)
    data = json.dumps(payload).encode()
    if not st.put_if_absent(_manifest_name(version), data):
        raise ConcurrentWriteError(
            f"concurrent writer already published v{version}"
        )


def _update_latest_hint(gold_path: str, version: int,
                        store: LogStore | None = None) -> None:
    """Best-effort pointer refresh AFTER the manifest committed. Failure
    here loses nothing: readers and writers probe forward from the stale
    hint, and the next successful publish heals it."""
    _store(gold_path, store).write("LATEST", str(version).encode())


def _publish(gold_path: str, base_version: int,
             partitions: dict[str, str],
             store: LogStore | None = None) -> int:
    """Advance the snapshot from base_version to base_version+1. The
    stale-snapshot check catches conflicts early; the atomic manifest
    create (_commit_manifest) arbitrates the remaining race — first
    writer wins, the loser raises ConcurrentWriteError."""
    st = _store(gold_path, store)
    current = _latest_version(gold_path, st)
    if current != base_version:
        raise ConcurrentWriteError(
            f"snapshot moved v{base_version} -> v{current} during merge"
        )
    version = base_version + 1
    _commit_manifest(
        gold_path, version, {"version": version, "partitions": partitions},
        st,
    )
    _update_latest_hint(gold_path, version, st)
    return version


def _read_partition_dirs(
    spark: SparkSession, dirs: dict[str, str], partition_col: str
) -> DataFrame | None:
    """Union the given {partition_value: dir} data as one DataFrame with
    the partition column restored. Dirs are grouped by commit so each
    group is ONE parquet read (file listing stays parallel)."""
    if not dirs:
        return None
    by_commit: dict[str, list[str]] = {}
    for value, d in dirs.items():
        by_commit.setdefault(os.path.dirname(d), []).append(d)
    parts = [
        spark.read.option("basePath", base).parquet(*sorted(ds))
        for base, ds in sorted(by_commit.items())
    ]
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
    )


def read_gold_tx(
    spark: SparkSession,
    gold_path: str,
    partition_col: str = "study_code",
    version: int | None = None,
    store: LogStore | None = None,
) -> DataFrame:
    """Snapshot of the transactional gold table. By default the current
    one (LATEST resolved once — concurrent merges cannot tear this read);
    pass `version` to time-travel to any still-un-vacuumed snapshot
    (manifests are immutable, so an old version reads exactly what it
    read the day it committed)."""
    st = _store(gold_path, store)
    if version is None:
        _, manifest = _read_latest(gold_path, st)
    else:
        raw = st.read(_manifest_name(version))
        if raw is None:
            raise FileNotFoundError(
                f"no snapshot v{version} at {gold_path}"
            )
        manifest = json.loads(raw)["partitions"]
    df = _read_partition_dirs(spark, manifest, partition_col)
    if df is None:
        raise FileNotFoundError(f"no committed snapshot at {gold_path}")
    return df


def tx_merge_upsert(
    spark: SparkSession,
    gold_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str = "study_code",
    store: LogStore | None = None,
) -> int:
    """merge_upsert semantics (update rows win by key, unmatched keys
    append, untouched partitions never read or written) with an ATOMIC
    commit: readers see the whole merge or none of it. Returns the
    committed snapshot version."""
    if partition_col not in updates.columns:
        raise ValueError(f"updates must carry partition column {partition_col!r}")
    for k in key_cols:
        if k not in updates.columns:
            raise ValueError(f"updates missing key column {k!r}")

    st = _store(gold_path, store)
    base_version, manifest = _read_latest(gold_path, st)
    touched = sorted(
        str(r[0])
        for r in updates.select(partition_col).distinct().collect()
    )

    commit_id = uuid.uuid4().hex
    commit_dir = os.path.join(gold_path, "data", commit_id)

    old_touched = {p: manifest[p] for p in touched if p in manifest}
    existing = _read_partition_dirs(spark, old_touched, partition_col)
    if existing is not None:
        keep = existing.join(
            updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
        )
        merged = keep.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    # no lineage cycle here (new files, old files untouched), so no
    # checkpoint is needed — the write itself is the materialization
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(commit_dir)

    written = {
        p: os.path.join(commit_dir, f"{partition_col}={p}") for p in touched
    }
    new_manifest = {**manifest, **written}
    return _publish(gold_path, base_version, new_manifest, st)


def compact_gold_tx(
    spark: SparkSession, gold_path: str, partition_col: str = "study_code",
    store: LogStore | None = None,
) -> int:
    """Rewrite the current snapshot as ONE commit: after many merges the
    snapshot references one directory per partition-touching commit, and
    readers pay a union per referenced commit — compaction collapses that
    back to a single dir (and makes every older data dir vacuumable once
    pre-compaction manifests age out). Same optimistic commit as a merge:
    concurrent writers are detected, readers never see a partial state.
    Returns the committed version."""
    st = _store(gold_path, store)
    base_version, manifest = _read_latest(gold_path, st)
    current = _read_partition_dirs(spark, manifest, partition_col)
    if current is None:
        raise FileNotFoundError(f"no committed snapshot at {gold_path}")
    commit_dir = os.path.join(gold_path, "data", uuid.uuid4().hex)
    current.write.mode("overwrite").partitionBy(partition_col).parquet(commit_dir)
    new_manifest = {
        p: os.path.join(commit_dir, f"{partition_col}={p}") for p in manifest
    }
    return _publish(gold_path, base_version, new_manifest, st)


def vacuum_gold_tx(
    gold_path: str,
    keep_versions: int | None = None,
    retention_s: float = 24 * 3600.0,
    store: LogStore | None = None,
    lister: "DataLister | None" = None,
) -> list[str]:
    """Delete data dirs no retained manifest references. By default every
    manifest <= LATEST is retained, so only debris from crashed commits
    goes. keep_versions=N additionally expires manifests older than the
    newest N snapshots — their time-travel reads stop working and their
    exclusively-referenced data dirs are removed; N is the retention
    window readers pinned to old versions must finish within (the
    Delta/Iceberg VACUUM contract). Returns the removed data dirs.

    A dir that NO manifest (current or expired) has ever referenced is
    ambiguous: crash debris, or a concurrent merge's freshly written
    commit that has not published yet. Deleting the latter would commit a
    snapshot pointing at missing files — silent data loss. So, exactly
    like Delta's VACUUM, never-referenced dirs are only removed once
    older than `retention_s` (default 24h — longer than any sane merge's
    write phase); dirs referenced by an expired manifest are provably not
    in-flight and go regardless of age. Pass retention_s=0 only when no
    writer can be running.

    Data-file enumeration/removal goes through `lister` (a
    sinks.logstore.DataLister). The default LocalDataLister walks the
    local filesystem; for object-store gold pass
    `S3DataLister(bucket, client)` — on a non-local gold_path with no
    lister this raises rather than silently finding nothing to delete
    (expiring manifests there would permanently orphan their data dirs:
    the expired manifest is the only record of what they were)."""
    from .logstore import LocalDataLister

    if lister is None:
        if not os.path.isdir(gold_path):
            raise NotImplementedError(
                f"{gold_path!r} is not a local directory; for object-store "
                f"gold pass lister=S3DataLister(bucket, client) so data "
                f"cleanup reaches the bucket before manifests expire"
            )
        lister = LocalDataLister()
    st = _store(gold_path, store)
    version, _ = _read_latest(gold_path, st)
    first_kept = 1
    expired_refs: set[str] = set()
    if keep_versions is not None:
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        first_kept = max(1, version - keep_versions + 1)
        # HEAL the hint BEFORE expiring manifests: _latest_version probes
        # forward from the hint, and expiry is about to delete the bottom
        # of that chain — a missing/stale-low hint afterwards would make
        # the table read as empty (and a merge would then re-commit v1,
        # shadowing the live snapshot). With the hint pinned at `version`
        # first, a crash mid-expiry leaves a fully working table.
        _update_latest_hint(gold_path, version, st)
        for v in range(1, first_kept):
            raw = st.read(_manifest_name(v))
            if raw is not None:
                for d in json.loads(raw)["partitions"].values():
                    expired_refs.add(os.path.dirname(d))
                st.delete(_manifest_name(v))
    live: set[str] = set()
    for v in range(first_kept, version + 1):
        raw = st.read(_manifest_name(v))
        if raw is not None:
            for d in json.loads(raw)["partitions"].values():
                live.add(os.path.dirname(d))
    removed = []
    for full in lister.list_commit_dirs(gold_path):
        if full in live:
            continue
        if full not in expired_refs:  # never referenced → maybe in-flight
            age = lister.age_s(full)
            if age is None or age < retention_s:
                continue
        lister.remove(full)
        removed.append(full)
    return removed
