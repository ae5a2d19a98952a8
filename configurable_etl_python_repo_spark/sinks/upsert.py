"""Row-level upsert for the partitioned gold layer.

The reference's gold sink is per-row `put_item` into a key-value store
(`Configurable_ETL_Python.py:559-578`) — i.e. last-write-wins upsert by
key. The distributed equivalent over partitioned parquet is a
partition-scoped MERGE:

  1. find the partitions the update set touches (a tiny distinct),
  2. read ONLY those partitions of the existing table (partition pruning),
  3. keep existing rows whose key is not updated (left-anti join),
  4. rewrite just those partitions via dynamic partition overwrite.

Cost scales with the size of the touched partitions, never the table —
the property that makes per-study refreshes viable on a 100 TB gold
layer. (A lakehouse table format with MERGE — Delta/Iceberg — gives the
same semantics transactionally; this is the dependency-free equivalent,
with the same write amplification: one partition.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    gold_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str = "study_code",
) -> None:
    """Upsert `updates` into the parquet dataset at gold_path, matching on
    key_cols (update rows win; unmatched keys append). Partitions absent
    from the update set are not read and not rewritten."""
    if partition_col not in updates.columns:
        raise ValueError(f"updates must carry partition column {partition_col!r}")
    for k in key_cols:
        if k not in updates.columns:
            raise ValueError(f"updates missing key column {k!r}")

    try:
        existing = spark.read.parquet(gold_path)
        first_write = False
    except Exception:  # AnalysisException: path does not exist yet
        first_write = True

    if first_write:
        updates.write.mode("overwrite").partitionBy(partition_col).parquet(
            gold_path
        )
        return

    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    scoped = existing.where(F.col(partition_col).isin(touched))
    keep = scoped.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    merged = keep.unionByName(updates, allowMissingColumns=True)
    # materialize BEFORE the overwrite: the merged plan reads gold_path,
    # and Spark (correctly) refuses to overwrite a path its own input
    # lineage still references. localCheckpoint severs the lineage; its
    # footprint is the touched partitions only.
    merged = merged.localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            gold_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
