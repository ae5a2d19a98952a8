"""Event-driven ingestion re-founded on Structured Streaming.

Reference (`/root/reference/Data_Ingestion_Python.py`): an S3 ObjectCreated
event (SQS→SNS envelopes, :196-206) triggers one Lambda per file, which
routes the filename against `view_names_list` substrings (:215-229),
extracts study/view/timestamps from path segments (:44-99), nests rows per
(study, view) via an O(n²) iterrows loop (:101-109), and put_items to
DynamoDB (:111-194) — at-least-once, idempotent by key overwrite.

Here the whole path is ONE streaming query: a file source discovers new
files, `foreachBatch` runs the identical transform as a batch (so it is
unit-testable without a stream), and idempotence comes from dynamic
partition overwrite on the (study_code, view) bronze partitions — the
scale-correct analogue of the reference's per-item overwrite. Filename
metadata is a Column expression over input_file_name(); the nest is one
groupBy(collect_list) — no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.bronze import META_COLS


def route_view(filename: str, view_names: list[str]) -> str | None:
    """Reference routing: first view whose name appears in the filename
    (Data_Ingestion_Python.py:215-229, substring match)."""
    for view in view_names:
        if view.lower() in filename.lower():
            return view
    return None


def with_file_metadata(df: DataFrame, study_regex: str = r"([A-Z]{2}\d{9})") -> DataFrame:
    """C14: parse study/view metadata out of the input file path + stamp the
    load time — input_file_name() + regexp, never a Python loop."""
    full = F.input_file_name()
    return df.withColumns(
        {
            "source_file": F.element_at(F.split(full, "/"), -1),
            # search the whole path: with parquet the study/view tokens live
            # in the directory name, not the part-file name
            "study_code_extracted": F.regexp_extract(full, study_regex, 1),
            "load_timestamp": F.current_timestamp(),
        }
    )


def ingest_batch(
    batch_df: DataFrame,
    bronze_path: str,
    study_code: str,
    view_of_file: dict[str, str] | None = None,
    view_col: str | None = None,
    key_columns: list[str] | None = None,
) -> None:
    """One micro-batch → nested bronze rows, idempotently.

    View routing: either a filename→view map (reference-style substring
    routing resolved on the driver) or an existing column. The nest is
    groupBy(study, view).agg(sort_array(collect_list(struct(*)))) — the
    reference's O(n²) loop as one shuffle (SURVEY A5/W4)."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df = batch_df
    if view_col is None:
        fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
        mapping = F.create_map(
            *[x for k, v in (view_of_file or {}).items()
              for x in (F.lit(k), F.lit(v))]
        )
        df = df.withColumn("view", mapping[fname])
    else:
        df = df.withColumn("view", F.col(view_col))
    df = df.withColumn("study_code", F.lit(study_code))
    payload_cols = [c for c in df.columns if c not in META_COLS]
    row_struct = F.struct(*[F.col(c) for c in payload_cols])
    if key_columns:
        keyed = F.struct(*[F.col(k) for k in key_columns], row_struct.alias("__r"))
        data = F.transform(F.sort_array(F.collect_list(keyed)), lambda x: x["__r"])
    else:
        data = F.collect_list(row_struct)
    nested = df.groupBy(*META_COLS).agg(data.alias("data"))
    # dynamic overwrite of exactly the touched (study_code, view) partitions
    # == the reference's idempotent per-key put_item, but distributed
    nested.write.mode("overwrite").partitionBy(*META_COLS).parquet(bronze_path)


def start_file_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    bronze_path: str,
    checkpoint: str,
    study_code: str,
    view_col: str,
    key_columns: list[str] | None = None,
    fmt: str = "parquet",
    trigger_available_now: bool = True,
):
    """The streaming wrapper: file source → foreachBatch(ingest_batch).
    availableNow=True drains the backlog then stops (batch-like test mode);
    at scale, drop it and set a processingTime trigger."""
    stream = (
        spark.readStream.format(fmt).schema(schema).load(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            lambda bdf, _epoch: ingest_batch(
                bdf, bronze_path, study_code,
                view_col=view_col, key_columns=key_columns,
            )
        )
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
