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


def streaming_dedup(
    stream: DataFrame, key_col: str = "source", timeout_ms: int | None = None
) -> DataFrame:
    """Cross-batch exact dedup: emits every document tagged is_first_seen;
    downstream keeps the firsts. Input needs (key_col, doc_id, doc_fp) —
    doc_fp from llm.text.fingerprint. State per key = fingerprint set.
    Pass timeout_ms only under a continuous trigger (see module note)."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _make_dedup_fn(timeout_ms),
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
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
