"""Bronze consolidation store: the Spark-native re-founding of the
reference's DynamoDB document layout.

Reference layout: one DynamoDB item per (study_code, view) with the ENTIRE
source table nested as `data: List[Dict]` plus `header` metadata
(`/root/reference/Data_Ingestion_Python.py:101-139`), read back via a keyed
query + json_normalize explode (`Configurable_ETL_Python.py:30-41`). That
caps a view at the 400KB item limit and forces whole-item transfer.

Here: a Parquet dataset partitioned by (study_code, view) where `data` is an
ARRAY<STRUCT<...>> per consolidation row. Key-equality reads become partition
pruning (the moral equivalent of the DynamoDB KeyConditionExpression, but
scale-free); the nested form is preserved so header/lineage metadata rides
along, and `read_bronze` explodes back to tabular. At 100 TB, one nested row
per file-load keeps the store append-only and the explode is a narrow op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_COLS = ("study_code", "view")


def write_bronze(
    df: DataFrame,
    path: str,
    study_code: str | None = None,
    view: str | None = None,
    header: dict[str, str] | None = None,
    key_columns: list[str] | None = None,
    mode: str = "append",
) -> None:
    """Nest a flat source table into one bronze row per (study_code, view).

    Equivalent of the reference's `final_dataframe_creation` — which is an
    O(n²) iterrows+concat loop (`Data_Ingestion_Python.py:101-109`) — as a
    single `groupBy(keys).agg(collect_list(struct(*)))` (A5).
    Rows are ordered by ``key_columns`` inside the nest via sort_array on a
    (keys, payload) struct (W4: the reference sorts before nesting).
    """
    if study_code is not None:
        df = df.withColumn("study_code", F.lit(study_code))
    if view is not None:
        df = df.withColumn("view", F.lit(view))
    payload_cols = [c for c in df.columns if c not in META_COLS]
    row_struct = F.struct(*[F.col(c) for c in payload_cols])
    if key_columns:
        # sort_array on a struct whose leading fields are the sort keys
        keyed = F.struct(*[F.col(k) for k in key_columns], row_struct.alias("__r"))
        data = F.transform(F.sort_array(F.collect_list(keyed)), lambda x: x["__r"])
    else:
        data = F.collect_list(row_struct)
    nested = df.groupBy(*META_COLS).agg(data.alias("data"))
    if header:
        nested = nested.withColumn(
            "header",
            F.array(
                F.create_map(
                    *[x for k, v in header.items() for x in (F.lit(k), F.lit(v))]
                )
            ),
        )
    nested.write.mode(mode).partitionBy(*META_COLS).parquet(path)


def read_bronze(
    spark: SparkSession,
    path: str,
    study_code: str | None = None,
    view: str | None = None,
) -> DataFrame:
    """Keyed bronze read → flat table.

    (study_code, view) equality predicates hit partition pruning — check
    `.explain()` for `PartitionFilters` — then `data` explodes back to rows
    with the meta columns carried along, mirroring
    `pd.json_normalize(record_path=['data'], meta=[...])`
    (`Configurable_ETL_Python.py:36-40`).
    """
    if study_code is not None and view is not None:
        # fully-keyed read: address the partition directory itself — exact
        # per-view payload schema (views differ; a whole-store read would
        # lock onto one file's struct) and pruning by construction
        sub = f"{path}/study_code={study_code}/view={view}"
        df = (
            spark.read.parquet(sub)
            .withColumn("study_code", F.lit(study_code))
            .withColumn("view", F.lit(view))
        )
    else:
        # partial/no keys: union payload schemas across views
        df = spark.read.option("mergeSchema", "true").parquet(path)
        if study_code is not None:
            df = df.where(F.col("study_code") == study_code)
        if view is not None:
            df = df.where(F.col("view") == view)
    exploded = df.select(*META_COLS, F.explode("data").alias("__r"))
    return exploded.select(*META_COLS, "__r.*")
