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


class _FakeState:
    """Minimal GroupState stand-in for driving state fns directly."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def setTimeoutDuration(self, ms):
        pass


def _drive(fn, batches):
    import pandas as pd

    state = _FakeState()
    out = []
    for pdf in batches:
        out.extend(
            pd.concat(list(fn(("k",), iter([pdf]), state))).to_dict("records")
        )
    return out, state


def test_bloom_dedup_state_is_bounded():
    """Duplicate-heavy stream, many distinct docs: Bloom state stays at
    exactly bloom_bits/8 bytes while the exact-set state grows linearly."""
    import hashlib

    import pandas as pd

    from configurable_etl_python_repo_spark.streaming.stateful import (
        _make_bloom_dedup_fn,
        _make_dedup_fn,
    )

    def batch(lo, hi, repeat_of=None):
        ids = list(range(lo, hi))
        fps = [hashlib.md5(str(repeat_of[i - lo] if repeat_of else i).encode())
               .hexdigest() for i in ids]
        return pd.DataFrame({"doc_id": ids, "doc_fp": fps})

    m = 1 << 16  # 64 Kib -> 8 KiB state, sized for ~6.5k docs at 1%
    batches = [batch(0, 2000), batch(2000, 4000),
               batch(4000, 6000, repeat_of=list(range(2000)))]  # batch 3 = dups
    bloom_out, bloom_state = _drive(_make_bloom_dedup_fn(m, 6, None), batches)
    exact_out, exact_state = _drive(_make_dedup_fn(None), batches)

    assert len(bloom_state.get[0]) == m // 8  # fixed, forever
    assert len(exact_state.get[0]) == 4000    # grows with distinct corpus

    exact_first = {r["doc_id"]: r["is_first_seen"] for r in exact_out}
    bloom_first = {r["doc_id"]: r["is_first_seen"] for r in bloom_out}
    # batch-3 repeats are caught by BOTH (bloom never misses a true dup)
    assert all(not exact_first[i] for i in range(4000, 6000))
    assert all(not bloom_first[i] for i in range(4000, 6000))
    # bloom's only error mode is a false "dup" for a true first — rare
    fp_errors = sum(1 for i in range(4000) if not bloom_first[i])
    assert fp_errors <= 40  # ~1% budget at this sizing


def test_streaming_dedup_bloom_rocksdb(spark, tmp_path):
    """Bloom dedup end-to-end under the RocksDB state store provider."""
    from configurable_etl_python_repo_spark.streaming.stateful import (
        ROCKSDB_STATE_CONF,
        streaming_dedup,
    )

    src = str(tmp_path / "docs_in")
    b1 = spark.createDataFrame(
        [Row(source="s", doc_id=1, text="alpha beta"),
         Row(source="s", doc_id=2, text="gamma")]
    )
    b2 = spark.createDataFrame(
        [Row(source="s", doc_id=3, text="alpha beta"),
         Row(source="s", doc_id=4, text="delta")]
    )
    fingerprint(b1).select("source", "doc_id", "doc_fp").write.parquet(f"{src}/f1")
    time.sleep(0.01)
    fingerprint(b2).select("source", "doc_id", "doc_fp").write.parquet(f"{src}/f2")

    prev = {k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF}
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        stream = (
            spark.readStream.schema("source string, doc_id bigint, doc_fp string")
            .option("maxFilesPerTrigger", "2")
            .parquet(f"{src}/*")
        )
        out = streaming_dedup(stream, key_col="source", bloom_bits=1 << 13)
        q = (
            out.writeStream.format("memory").queryName("bloom_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_bloom"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        rows = {r.doc_id: r.is_first_seen
                for r in spark.table("bloom_out").collect()}
        assert rows[1] is True and rows[2] is True and rows[4] is True
        assert rows[3] is False  # repeat of batch-1 content, across batches
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


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
