"""Streaming incremental-dedup admission: the daily-ingest composition
(probe the persisted MinHash index → drop near-duplicates → tagged
extend) run continuously under Structured Streaming.

This is the x22 batch ingest re-founded as a stream: every micro-batch
of new documents is probed against the PERSISTED index
(llm/dedup_index.py — corpus signatures are never recomputed), the
matched docs are dropped, the admitted remainder is written to the
output table AND appended to the index so the NEXT micro-batch
deduplicates against it. Exactly-once admission over an at-least-once
stream comes from two idempotence mechanisms working together:

- the OUTPUT write is a dynamic partition overwrite of the epoch's own
  partition (the streaming/ingest.py contract): a retried epoch
  replaces its partition instead of double-appending;
- the INDEX extend carries ``tag=f"{tag_prefix}{epoch_id}"`` — the
  manifest commit is atomic, so a retried epoch whose extend already
  committed is detected (llm/_store.committed_tags) and the WHOLE
  epoch is skipped. The ordering inside the batch body (output
  overwrite BEFORE the tagged extend) makes every crash point safe:

    crash before the output write   -> retry redoes everything
    crash between output and extend -> retry re-probes the UNCHANGED
                                       index (the extend's half-written
                                       segment is an invisible orphan),
                                       recomputes the same admitted
                                       set, overwrites the same
                                       partition, then commits
    crash after the extend commit   -> retry sees the tag and skips;
                                       the output partition was already
                                       written (it precedes the commit)

  so no doc is ever double-admitted OR double-extended — pinned in
  tests/test_streaming_admission.py.

Batch==stream parity: `admit_against_index` is the per-epoch transform
and a plain DataFrame function; the stream is just foreachBatch over
it, so an availableNow run over E file-epochs equals E sequential
batch admissions (pytest-pinned, the perplexity_partition_stream
treatment).

Reference parity: the reference's ingest is one Lambda per S3 file
with per-row put_item overwrites (/root/reference/
Data_Ingestion_Python.py:111-194) and no dedup or persisted state at
all; this module is LLM-curation extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def admit_against_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """The admission TRANSFORM: batch docs that near-duplicate nothing
    in the persisted MinHash index at ``path`` (probe + anti-join, the
    x22 composition as one call). Pure DataFrame-in/DataFrame-out, so
    it is the shared body of the batch config op and the streaming
    foreachBatch — the duals cannot drift."""
    from ..llm.dedup_index import dedup_against_index

    pairs = dedup_against_index(
        spark, path, batch, id_col=id_col, text_col=text_col,
        threshold=threshold,
    )
    matched = pairs.select(F.col("id_a").alias(id_col)).distinct()
    return batch.join(matched, [id_col], "left_anti")


def admission_batch(
    batch_df: DataFrame,
    epoch_id: int,
    index_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    tag_prefix: str = "admit-",
) -> DataFrame | None:
    """One micro-batch of the admission stream (the foreachBatch body,
    unit-testable without a stream): probe, anti-join, overwrite the
    epoch's output partition, tagged extend — in THAT order; see the
    module docstring for why each crash point is then safe. Returns
    the admitted rows (None when the epoch was already committed or
    the batch is empty). Epoch tags live in the index manifest, so a
    REBUILD of the index resets them — a new corpus generation
    re-admits (llm/_store.commit_build)."""
    from ..llm._store import committed_tags

    tag = f"{tag_prefix}{int(epoch_id)}"
    if tag in committed_tags(index_path):
        # the whole epoch committed in a previous attempt (extend is
        # the LAST step) — output partition included; full no-op
        return None
    if batch_df.isEmpty():
        return None
    from ..llm.dedup_index import minhash_extend_index

    spark = batch_df.sparkSession
    admitted = admit_against_index(
        spark, index_path, batch_df, id_col=id_col, text_col=text_col,
        threshold=threshold,
    )
    # materialize BEFORE the extend mutates the store a retry would
    # re-read (the eager-write-then-lazy-read hazard), and before the
    # output write so probe work isn't paid twice
    admitted = admitted.localCheckpoint(eager=True)
    # per-WRITER dynamic overwrite: scoping it to this write (not
    # spark.conf) keeps the session's default intact — a later
    # full-table overwrite elsewhere must not silently become partial
    (
        admitted.withColumn("epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch").parquet(out_path)
    )
    minhash_extend_index(
        admitted, index_path, id_col=id_col, text_col=text_col, tag=tag
    )
    return admitted


def start_index_admission(
    spark: SparkSession,
    source_dir: str,
    schema,
    index_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    fmt: str = "parquet",
    max_files_per_trigger: "int | None" = None,
    trigger_available_now: bool = True,
    tag_prefix: "str | None" = None,
):
    """The streaming wrapper: file source → foreachBatch(
    admission_batch). availableNow=True drains the backlog then stops
    (batch-like test mode); at scale drop it for a processingTime
    trigger. max_files_per_trigger bounds epoch size (and makes
    multi-epoch runs deterministic in tests).

    tag_prefix defaults to a digest of the CHECKPOINT path: a restart
    from the same checkpoint resumes the same epoch numbering, so its
    redeliveries must hit the same tags (idempotence) — but a NEW
    stream incarnation (fresh checkpoint, epoch ids restart at 0)
    against the same index must NOT collide with a previous
    incarnation's tags, or its early epochs of brand-new documents
    would be silently skipped as already-committed."""
    if tag_prefix is None:
        import hashlib
        import os as _os

        digest = hashlib.md5(
            _os.path.abspath(checkpoint).encode("utf-8")
        ).hexdigest()[:8]
        tag_prefix = f"admit-{digest}-"
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    stream = reader.load(source_dir)
    writer = (
        stream.writeStream.foreachBatch(
            lambda bdf, epoch: admission_batch(
                bdf, epoch, index_path, out_path,
                id_col=id_col, text_col=text_col, threshold=threshold,
                tag_prefix=tag_prefix,
            )
        )
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
