"""applyInPandasWithState operators: state must survive ACROSS micro-batches
(two files → two batches via maxFilesPerTrigger)."""

import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.llm.text import fingerprint
from configurable_etl_python_repo_spark.streaming.stateful import (
    running_user_stats,
    streaming_dedup,
)


import pytest


@pytest.fixture(autouse=True)
def few_partitions(spark):
    """Stateful queries create one state store per shuffle partition per
    operator — pin partitions low so these tiny-data tests don't spend
    minutes instantiating stores."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


def _drain(q, timeout=180):
    q.awaitTermination(timeout)


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    # batch 1: two docs, one duplicate pair; batch 2: re-sends doc text A
    b1 = spark.createDataFrame(
        [Row(source="s", doc_id=1, text="alpha beta"),
         Row(source="s", doc_id=2, text="alpha beta"),
         Row(source="s", doc_id=3, text="gamma")]
    )
    b2 = spark.createDataFrame(
        [Row(source="s", doc_id=4, text="alpha beta"),
         Row(source="s", doc_id=5, text="delta")]
    )
    fingerprint(b1).select("source", "doc_id", "doc_fp").write.parquet(f"{src}/f1")
    time.sleep(0.01)
    fingerprint(b2).select("source", "doc_id", "doc_fp").write.parquet(f"{src}/f2")

    schema = "source string, doc_id bigint, doc_fp string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")  # part files of one write
        .parquet(f"{src}/*")
    )
    out = streaming_dedup(stream, key_col="source")
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = {r.doc_id: r.is_first_seen for r in spark.table("dedup_out").collect()}
    assert rows[1] != rows[2] or not (rows[1] and rows[2])  # dup pair: only one first
    assert rows[3] is True and rows[5] is True
    # doc 4 repeats batch-1 content -> state remembered it across batches
    if 4 in rows and len(rows) == 5:
        assert rows[4] is False


def test_running_user_stats(spark, tmp_path):
    src = str(tmp_path / "ev_in")
    spark.createDataFrame(
        [Row(user_id=1, value=10.0), Row(user_id=1, value=5.0),
         Row(user_id=2, value=1.0)]
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id bigint, value double").parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory").queryName("stats_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {r.user_id: (r.n_events_total, r.value_sum_total)
           for r in spark.table("stats_out").collect()}
    assert got == {1: (2, 15.0), 2: (1, 1.0)}
