"""Training-shard writer: loader-order files + manifest contract."""

import glob
import json

import pytest

from configurable_etl_python_repo_spark.llm.text import pack_sequences
from configurable_etl_python_repo_spark.sinks.shards import (
    read_training_shard,
    write_training_shards,
)

SEQ_LEN = 64


def _packed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    return pack_sequences(docs, seq_len=SEQ_LEN)


def test_write_training_shards_layout_and_manifest(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    packed = _packed(spark, sf_dir)
    manifest = write_training_shards(packed, out, seq_len=SEQ_LEN)

    # one parquet file per shard (the loader's streaming unit)
    for shard in manifest["shards"]:
        files = glob.glob(f"{out}/source={shard}/*.parquet")
        assert len(files) == 1, shard
    # manifest written atomically and totals consistent
    disk = json.load(open(f"{out}/_MANIFEST.json"))
    assert disk == manifest
    assert manifest["total_docs"] == packed.count()
    assert manifest["total_docs"] == sum(
        s["n_docs"] for s in manifest["shards"].values()
    )


def test_shard_rows_are_in_loader_order_and_chain(spark, sf_dir, tmp_path):
    """Within a shard file: rows sorted by (seq_id, seq_offset), and the
    packing chain holds row-to-row — next offset = (offset + n_tokens)
    mod-progressed through seq_len boundaries."""
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        _packed(spark, sf_dir), out, seq_len=SEQ_LEN
    )
    shard = sorted(manifest["shards"])[0]
    rows = read_training_shard(spark, out, shard).collect()
    keys = [(r["seq_id"], r["seq_offset"]) for r in rows]
    assert keys == sorted(keys)  # physical row order == loader order
    running = 0
    for r in rows:
        assert r["seq_id"] == running // SEQ_LEN
        assert r["seq_offset"] == running % SEQ_LEN
        running += r["n_tokens"]
    assert manifest["shards"][shard]["n_tokens"] == running
    assert manifest["shards"][shard]["n_sequences"] == keys[-1][0] + 1


def test_write_training_shards_validates_input(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="pack_sequences"):
        write_training_shards(df, str(tmp_path / "x"), seq_len=8)


def test_read_shard_with_hive_escaped_name(spark, sf_dir, tmp_path):
    """derive_shard_key emits names like 'src0#3'; Spark Hive-escapes
    '#' in partition directory names ('shard=src0%233'), so the reader
    must prune on the partition COLUMN, not join the raw value into a
    path (which raises PATH_NOT_FOUND). This is the documented
    derive_shard_key -> write_training_shards -> read_training_shard
    composition end-to-end."""
    from pyspark.sql import functions as F

    from configurable_etl_python_repo_spark.llm.text import derive_shard_key

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .limit(200)
    )
    keyed = derive_shard_key(docs, target_tokens=2_000)
    packed = pack_sequences(keyed, seq_len=SEQ_LEN, shard_col="shard")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        packed, out, seq_len=SEQ_LEN, shard_col="shard"
    )
    hashed = [s for s in manifest["shards"] if "#" in s]
    assert hashed, "fixture produced no split shards; lower target_tokens"
    shard = sorted(hashed)[0]
    got = read_training_shard(spark, out, shard, shard_col="shard")
    assert got.count() == manifest["shards"][shard]["n_docs"]
    assert got.filter(F.col("shard") != shard).count() == 0
    # partition pruning, not a full scan: the shard predicate must reach
    # the scan as a partition filter (one directory read at any scale)
    plan = got._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "shard" in m.group(1), plan
