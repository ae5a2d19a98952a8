"""Boundary/sink adapters.

Internally the engine uses real NULLs and native types; the reference's
string-sentinel and all-string conventions are applied ONLY at storage
boundaries, exactly where the reference applies them:
  - 'Null' sentinel: `Configurable_ETL_Python.py:538-539`,
    `Data_Ingestion_Python.py:232`
  - all-string cast: `Configurable_ETL_Python.py:541-542`,
    `Athena_DynamoDB_Normalized.py:62-63`
  - composite key + Retention nesting: `Configurable_ETL_Python.py:300-308,545`
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NULL_SENTINEL = "Null"


def to_boundary_strings(df: DataFrame, sentinel: str = NULL_SENTINEL) -> DataFrame:
    """C9+C10: cast every column to string, replace NULL with the sentinel."""
    return df.select(
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(sentinel)).alias(c)
            for c in df.columns
        ]
    )


def to_standardized_form(
    df: DataFrame,
    study_code: str,
    retention_cols: list[str],
    country: str = "country",
    site: str = "site",
    subject: str = "subject",
    sentinel: bool = True,
) -> DataFrame:
    """Gold record: composite `subject_hierarchy` key (C11) + nested
    `Retention` struct of the analyte values (C12).

    Reference: converting_standardized_form,
    `Configurable_ETL_Python.py:537-578` (which then put_items row by row;
    we write once, distributed)."""
    if sentinel:
        df = to_boundary_strings(df)
    return df.select(
        F.lit(study_code).alias("study_code"),
        F.concat_ws("#", F.col(country), F.col(site), F.col(subject)).alias(
            "subject_hierarchy"
        ),
        F.col(country).alias("country"),
        F.col(site).alias("site"),
        F.col(subject).alias("subject"),
        F.struct(*[F.col(c) for c in retention_cols]).alias("Retention"),
    )


def write_gold(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed gold write (vs per-row put_item,
    Configurable_ETL_Python.py:559-578). For a DynamoDB-compatible target
    this is where a foreachPartition + batch-writer adapter would plug in."""
    df.write.mode(mode).partitionBy("study_code").parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    sentinel: bool = True,
    single_file: bool = False,
    **options: str,
) -> None:
    """K4: CSV sink with the reference's boundary conventions applied
    (all-string + 'Null' sentinel — the reference's CSV export writes
    the DynamoDB-normalized string form, Athena_DynamoDB_Normalized.py:
    15-28, where the reference version writes an empty object; this one
    writes the data).

    `single_file=True` coalesces to one part file — the debug/hand-off
    shape for small extracts; the default keeps one file per partition
    (the only CSV layout that scales)."""
    if sentinel:
        df = to_boundary_strings(df)
    if single_file:
        df = df.coalesce(1)
    opts = {"header": "true", **options}
    df.write.mode(mode).options(**opts).csv(path)


def export_normalized(
    bronze,
    path: str,
    mode: str = "append",
    spark=None,
) -> None:
    """Serving-layer export: bronze → flat all-string Parquet dataset with
    schema evolution (reference: Athena_DynamoDB_Normalized.py:30-81 —
    full scan → explode → to_parquet(schema_evolution=True)).

    Accepts a bronze PATH (preferred: reads with mergeSchema so views whose
    payload structs differ union into one flat schema, like json_normalize
    unions row-dict keys) or an already-loaded bronze DataFrame."""
    if isinstance(bronze, str):
        bronze_df = spark.read.option("mergeSchema", "true").parquet(bronze)
    else:
        bronze_df = bronze
    flat = bronze_df.select(
        "study_code", "view", F.explode("data").alias("__r")
    ).select("study_code", "view", "__r.*")
    to_boundary_strings(flat).write.mode(mode).option(
        "mergeSchema", "true"
    ).partitionBy("view").parquet(path)
