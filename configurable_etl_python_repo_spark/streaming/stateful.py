"""Custom stateful streaming operators via applyInPandasWithState.

Built-in watermarked aggregations (windows.py) cover the declarative
shapes; this module is the escape hatch for semantics Spark lacks —
cross-batch exact dedup and running per-key profiles — implemented with
Arrow-batched grouped state (GroupState), the modern replacement for
DStream updateStateByKey.

State discipline for 100 TB streams:
  - state per key is O(1) (counters / bounded digests), never an unbounded
    row buffer;
  - long-running deployments pass timeout_ms so abandoned keys expire and
    state size tracks the ACTIVE key set. Timeouts are OPT-IN because a
    ProcessingTimeTimeout makes trigger(availableNow) loop forever firing
    timeout-only batches — batch-style drains must run with NoTimeout;
  - dedup state stores md5 fingerprints (16 bytes/doc) — for truly
    unbounded corpora swap the set for a Bloom filter at the same call
    site.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# RocksDB state store: off-heap, incremental-checkpoint state — the
# production choice once per-key state stops fitting the executor heap
# (the default HDFS-backed provider keeps every store's map in memory).
# Pass to get_spark(extra_conf=ROCKSDB_STATE_CONF) or set on an existing
# session before starting the query: the provider class is read at query
# start. Ships inside stock Spark — no extra jars.
ROCKSDB_STATE_CONF = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    # checkpoint only the changelog per batch, not full snapshots
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
        "true",
}

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("is_first_seen", T.BooleanType(), False),
    ]
)
DEDUP_STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.StringType()), True)]
)
BLOOM_STATE_SCHEMA = T.StructType(
    [T.StructField("bits", T.BinaryType(), True)]
)

STATS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events_total", T.LongType(), False),
        T.StructField("value_sum_total", T.DoubleType(), False),
    ]
)
STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), True),
        T.StructField("s", T.DoubleType(), True),
    ]
)


def _make_dedup_fn(timeout_ms: int | None):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        out_ids, out_first = [], []
        for pdf in pdfs:
            for doc_id, fp in zip(pdf["doc_id"], pdf["doc_fp"]):
                first = fp not in seen
                seen.add(fp)
                out_ids.append(int(doc_id))
                out_first.append(first)
        state.update((list(seen),))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"key": key[0], "doc_id": out_ids, "is_first_seen": out_first}
        )

    return fn


def _bloom_positions(fp: str, m: int, k: int) -> list[int]:
    """k bit positions in [0, m) from an md5 hex fingerprint via double
    hashing (Kirsch-Mitzenmacher: h_i = h1 + i*h2 — as good as k
    independent hashes for Bloom filters)."""
    h1 = int(fp[:16], 16)
    h2 = int(fp[16:32], 16) | 1  # odd → cycles all residues for m = 2^b
    return [(h1 + i * h2) % m for i in range(k)]


def _make_bloom_dedup_fn(bloom_bits: int, bloom_hashes: int,
                         timeout_ms: int | None):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        bits = bytearray(state.get[0]) if state.exists else bytearray(
            bloom_bits // 8
        )
        out_ids, out_first = [], []
        for pdf in pdfs:
            for doc_id, fp in zip(pdf["doc_id"], pdf["doc_fp"]):
                pos = _bloom_positions(fp, bloom_bits, bloom_hashes)
                first = any(not ((bits[p >> 3] >> (p & 7)) & 1) for p in pos)
                for p in pos:
                    bits[p >> 3] |= 1 << (p & 7)
                out_ids.append(int(doc_id))
                out_first.append(first)
        state.update((bytes(bits),))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"key": key[0], "doc_id": out_ids, "is_first_seen": out_first}
        )

    return fn


def streaming_dedup(
    stream: DataFrame,
    key_col: str = "source",
    timeout_ms: int | None = None,
    bloom_bits: int | None = None,
    bloom_hashes: int = 6,
) -> DataFrame:
    """Cross-batch dedup: emits every document tagged is_first_seen;
    downstream keeps the firsts. Input needs (key_col, doc_id, doc_fp) —
    doc_fp from llm.text.fingerprint.

    State per key:
      - default: the exact fingerprint set (16 bytes/doc) — exact answers,
        state grows with the distinct corpus;
      - bloom_bits=M (a power of two): a FIXED M-bit Bloom filter — state
        is M/8 bytes per key forever, the unbounded-corpus mode. Trade-off:
        a false-positive rate of ~(1-e^{-k·n/M})^k marks a few true firsts
        as dupes (never the reverse); size M for the expected distinct
        count (M ≈ 10·n bits → ~1% at k=6).
    Pass timeout_ms only under a continuous trigger (see module note)."""
    if bloom_bits is not None:
        if bloom_bits % 8 or bloom_bits & (bloom_bits - 1):
            raise ValueError("bloom_bits must be a power of two >= 8")
        fn, state_schema = (
            _make_bloom_dedup_fn(bloom_bits, bloom_hashes, timeout_ms),
            BLOOM_STATE_SCHEMA,
        )
    else:
        fn, state_schema = _make_dedup_fn(timeout_ms), DEDUP_STATE_SCHEMA
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout if timeout_ms
                         else GroupStateTimeout.NoTimeout),
        )
    )


def _make_stats_fn(timeout_ms: int | None):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((int(n), float(s)))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events_total": [n],
             "value_sum_total": [s]}
        )

    return fn


def running_user_stats(
    stream: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """Per-user lifetime counters, one updated row per user per batch —
    the classic running-profile operator. Input: (user_id, value)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_stats_fn(timeout_ms),
        outputStructType=STATS_OUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout if timeout_ms
                     else GroupStateTimeout.NoTimeout),
    )
