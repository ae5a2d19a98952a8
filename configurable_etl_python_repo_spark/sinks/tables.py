"""Bucketed-table support: pre-shuffle once at write time, join for free
forever after.

At 100 TB the recurring cost of a fact-fact join is the shuffle. Writing
both sides bucketed by the join key (`bucketBy(n, key).sortBy(key)`)
co-locates matching keys in the same bucket files, so Catalyst plans the
join with NO Exchange on either side (verify: the executed plan has no
`Exchange hashpartitioning` above the scans). Bucket counts must match on
both sides; pick a count that keeps bucket files in the 100MB-1GB range at
the target scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> bool:
    """True when a sort-merge join of the two bucketed tables plans with no
    shuffle exchange on either side. Broadcast is disabled for the check —
    otherwise a small right side goes BroadcastHashJoin and the bucketing
    is never exercised (which is what production would rightly do; this
    helper answers the large-large question)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(left).join(spark.table(right), on=on)
        plan = j._jdf.queryExecution().executedPlan().toString()
        return (
            "Exchange hashpartitioning" not in plan
            and "SortMergeJoin" in plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
