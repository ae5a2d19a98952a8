"""Training-shard writer: materialize a packed corpus as the files a
data loader streams.

pack_sequences (llm/text.py) decides WHERE every document's tokens land
((shard, seq_id, seq_offset)); this sink lays the documents down in that
order: one parquet file per shard, rows sorted by (seq_id, seq_offset),
plus a _MANIFEST.json recording per-shard sequence/token totals — the
contract a sequential loader needs to mmap-or-stream shards without
shuffling anything at load time.

Plan shape: repartition by the shard key (each shard = one task = one
file, the pack_sequences parallelism atom) + sortWithinPartitions — one
shuffle, no global sort. The manifest aggregation collects one row per
shard (bounded by the shard count, like the txlog partition listing).
At 100 TB you'd bound shard size upstream by choosing a finer shard key
(pack_sequences packs any key); this sink is agnostic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    packed: DataFrame,
    out_dir: str,
    seq_len: int,
    shard_col: str = "source",
    manifest_name: str = "_MANIFEST.json",
) -> dict:
    """Write `packed` (a pack_sequences result, optionally joined with
    payload columns) as one ordered parquet file per shard + a manifest.

    Returns the manifest dict: {shard: {n_docs, n_tokens, n_sequences}}
    with `seq_len` and the grand totals alongside. n_sequences counts
    COMPLETE-or-partial sequences actually occupied: the last sequence
    is (max seq_id over the shard) + 1.
    """
    for c in (shard_col, "seq_id", "seq_offset", "n_tokens"):
        if c not in packed.columns:
            raise ValueError(
                f"packed input missing column {c!r} — run pack_sequences "
                f"first (its output carries the placement columns)"
            )
    (
        packed.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, "seq_id", "seq_offset")
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(out_dir)
    )
    # manifest stats aggregate over the files JUST WRITTEN, not the
    # input lineage — re-running `packed` here would execute the whole
    # upstream pipeline a second time (the x14 multi-consumer lesson),
    # and the read-back also makes the manifest describe what is
    # actually on disk
    written = packed.sparkSession.read.parquet(out_dir)
    stats = (
        written.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            (F.max("seq_id") + 1).alias("n_sequences"),
        )
        .collect()  # bounded: one row per shard
    )
    manifest = {
        "seq_len": seq_len,
        "shards": {
            str(r[shard_col]): {
                "n_docs": r["n_docs"],
                "n_tokens": int(r["n_tokens"]),
                "n_sequences": int(r["n_sequences"]),
            }
            for r in sorted(stats, key=lambda r: str(r[shard_col]))
        },
    }
    manifest["total_docs"] = sum(
        s["n_docs"] for s in manifest["shards"].values()
    )
    manifest["total_tokens"] = sum(
        s["n_tokens"] for s in manifest["shards"].values()
    )
    tmp = os.path.join(out_dir, f".{manifest_name}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=2)
    os.replace(tmp, os.path.join(out_dir, manifest_name))
    return manifest


def read_training_shard(spark, out_dir: str, shard: str,
                        shard_col: str = "source") -> DataFrame:
    """One shard, in loader order. Row order within a parquet file is
    preserved on read as long as the read is not re-shuffled; the single
    file per shard makes that the default.

    Filters on the partition column rather than joining the raw shard
    value into a path: Spark Hive-escapes special characters in
    partition directory names ('src0#3' -> 'shard=src0%233'), so a
    literal path join breaks for derive_shard_key outputs. The filter
    compiles to partition pruning — still exactly one directory read.
    """
    return (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .filter(F.col(shard_col) == F.lit(shard))
    )
