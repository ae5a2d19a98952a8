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
