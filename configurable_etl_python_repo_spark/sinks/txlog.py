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
    fresh commit dir, then publishes a NEW manifest, then swaps LATEST
    via os.replace — one atomic pointer move. A crash at ANY earlier
    point leaves LATEST (and every reader) on the old snapshot; the only
    debris is invisible orphan files (vacuum_gold_tx removes them).
  - Readers resolve LATEST once and read only the files that snapshot
    names — snapshot isolation: a concurrent merge never tears a read.
  - Writers are optimistic: publish re-checks that LATEST still names
    the snapshot the merge was based on and raises ConcurrentWriteError
    otherwise (retry = re-run the merge; it re-reads the new snapshot).

Scale notes: the manifest maps partitions to DIRECTORIES (one per commit
that last rewrote the partition), so its size is O(partitions), not
O(files); the merge reads and rewrites only touched partitions, exactly
like merge_upsert. os.replace is atomic on a POSIX filesystem (local,
NFS, HDFS-via-fuse); on an object store the pointer swap would ride a
conditional-put (S3 If-Match / GCS generation) behind the same
_read_latest/_publish seam.
"""

from __future__ import annotations

import json
import os
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """Another merge committed between this merge's snapshot read and its
    publish; re-run the merge against the new snapshot."""


def _txdir(gold_path: str) -> str:
    return os.path.join(gold_path, "_txlog")


def _read_latest(gold_path: str) -> tuple[int, dict[str, str]]:
    """(version, {partition_value: data_dir}) of the current snapshot;
    (0, {}) for a table that does not exist yet."""
    latest = os.path.join(_txdir(gold_path), "LATEST")
    try:
        with open(latest) as f:
            version = int(f.read().strip())
    except FileNotFoundError:
        return 0, {}
    with open(os.path.join(_txdir(gold_path), f"v{version:08d}.json")) as f:
        manifest = json.load(f)
    return version, manifest["partitions"]


def _publish(gold_path: str, base_version: int,
             partitions: dict[str, str]) -> int:
    """Atomically advance LATEST from base_version to base_version+1.
    Conflict check and pointer swap; manifests are immutable and never
    overwritten (os.open with O_EXCL refuses a concurrent same-version
    write — first writer wins, the loser raises)."""
    os.makedirs(_txdir(gold_path), exist_ok=True)
    current, _ = _read_latest(gold_path)
    if current != base_version:
        raise ConcurrentWriteError(
            f"snapshot moved v{base_version} -> v{current} during merge"
        )
    version = base_version + 1
    manifest_path = os.path.join(_txdir(gold_path), f"v{version:08d}.json")
    try:
        fd = os.open(manifest_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as e:
        raise ConcurrentWriteError(
            f"concurrent writer already published v{version}"
        ) from e
    with os.fdopen(fd, "w") as f:
        json.dump({"version": version, "partitions": partitions}, f)
    tmp = os.path.join(_txdir(gold_path), f"LATEST.tmp.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(_txdir(gold_path), "LATEST"))  # THE commit
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
) -> DataFrame:
    """Snapshot of the transactional gold table. By default the current
    one (LATEST resolved once — concurrent merges cannot tear this read);
    pass `version` to time-travel to any still-un-vacuumed snapshot
    (manifests are immutable, so an old version reads exactly what it
    read the day it committed)."""
    if version is None:
        _, manifest = _read_latest(gold_path)
    else:
        path = os.path.join(_txdir(gold_path), f"v{version:08d}.json")
        try:
            with open(path) as f:
                manifest = json.load(f)["partitions"]
        except FileNotFoundError:
            raise FileNotFoundError(
                f"no snapshot v{version} at {gold_path}"
            ) from None
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

    base_version, manifest = _read_latest(gold_path)
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
    return _publish(gold_path, base_version, new_manifest)


def compact_gold_tx(
    spark: SparkSession, gold_path: str, partition_col: str = "study_code"
) -> int:
    """Rewrite the current snapshot as ONE commit: after many merges the
    snapshot references one directory per partition-touching commit, and
    readers pay a union per referenced commit — compaction collapses that
    back to a single dir (and makes every older data dir vacuumable once
    pre-compaction manifests age out). Same optimistic commit as a merge:
    concurrent writers are detected, readers never see a partial state.
    Returns the committed version."""
    base_version, manifest = _read_latest(gold_path)
    current = _read_partition_dirs(spark, manifest, partition_col)
    if current is None:
        raise FileNotFoundError(f"no committed snapshot at {gold_path}")
    commit_dir = os.path.join(gold_path, "data", uuid.uuid4().hex)
    current.write.mode("overwrite").partitionBy(partition_col).parquet(commit_dir)
    new_manifest = {
        p: os.path.join(commit_dir, f"{partition_col}={p}") for p in manifest
    }
    return _publish(gold_path, base_version, new_manifest)


def vacuum_gold_tx(gold_path: str, keep_versions: int | None = None) -> list[str]:
    """Delete data dirs no retained manifest references. By default every
    manifest <= LATEST is retained, so only debris from crashed commits
    goes (safe any time for every reader). keep_versions=N additionally
    expires manifests older than the newest N snapshots — their
    time-travel reads stop working and their exclusively-referenced data
    dirs are removed; N is the retention window readers pinned to old
    versions must finish within (the Delta/Iceberg VACUUM contract).
    Returns the removed data dirs."""
    import shutil

    version, _ = _read_latest(gold_path)
    first_kept = 1
    if keep_versions is not None:
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        first_kept = max(1, version - keep_versions + 1)
        for v in range(1, first_kept):
            expired = os.path.join(_txdir(gold_path), f"v{v:08d}.json")
            if os.path.exists(expired):
                os.remove(expired)
    live: set[str] = set()
    for v in range(first_kept, version + 1):
        path = os.path.join(_txdir(gold_path), f"v{v:08d}.json")
        if os.path.exists(path):
            with open(path) as f:
                for d in json.load(f)["partitions"].values():
                    live.add(os.path.dirname(d))
    data_root = os.path.join(gold_path, "data")
    removed = []
    if os.path.isdir(data_root):
        for entry in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, entry)
            if full not in live:
                shutil.rmtree(full)
                removed.append(full)
    return removed
