"""Temporal joins: as-of (window compilation, no join node) and range
(bucketed equi-join scale path)."""

from datetime import datetime

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.operators.temporal import (
    asof_join,
    range_join,
)


def _ts(h, m=0):
    return datetime(2021, 1, 1, h, m)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame([
        Row(key="a", ts=_ts(9), px=1.0),
        Row(key="a", ts=_ts(11), px=2.0),
        Row(key="b", ts=_ts(10), px=9.0),
    ])


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame([
        Row(key="a", ts=_ts(8), qty=1),    # before any quote
        Row(key="a", ts=_ts(9), qty=2),    # exactly on a quote (inclusive)
        Row(key="a", ts=_ts(10), qty=3),   # between quotes
        Row(key="a", ts=_ts(12), qty=4),   # after the last quote
        Row(key="b", ts=_ts(12), qty=5),   # other key
        Row(key="c", ts=_ts(12), qty=6),   # key with no quotes at all
    ])


def test_asof_backward(trades, quotes):
    out = {(r.key, r.qty): r.px
           for r in asof_join(trades, quotes, on=["key"]).collect()}
    assert out == {
        ("a", 1): None, ("a", 2): 1.0, ("a", 3): 1.0, ("a", 4): 2.0,
        ("b", 5): 9.0, ("c", 6): None,
    }


def test_asof_forward(trades, quotes):
    out = {(r.key, r.qty): r.px
           for r in asof_join(trades, quotes, on=["key"],
                              direction="forward").collect()}
    assert out == {
        ("a", 1): 1.0, ("a", 2): 1.0, ("a", 3): 2.0, ("a", 4): None,
        ("b", 5): None, ("c", 6): None,
    }


def test_asof_tolerance(trades, quotes):
    # 1h tolerance: only matches within an hour survive
    out = {(r.key, r.qty): r.px
           for r in asof_join(trades, quotes, on=["key"],
                              tolerance_s=3600).collect()}
    assert out == {
        ("a", 1): None, ("a", 2): 1.0, ("a", 3): 1.0, ("a", 4): 2.0,
        ("b", 5): None,  # 2h gap > tolerance
        ("c", 6): None,
    }


def test_asof_suffixes_colliding_payload(spark, trades):
    right = spark.createDataFrame([Row(key="a", ts=_ts(9), qty=99)])
    out = asof_join(trades, right, on=["key"])
    assert "qty_right" in out.columns and "qty" in out.columns


def test_asof_plan_has_no_join(trades, quotes):
    """The as-of compiles to a tagged union + ONE key-partitioned window:
    no join operator, a single hash exchange — per-key cost is linear, so
    the plan survives any key cardinality / time density at 100 TB."""
    plan = (asof_join(trades, quotes, on=["key"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_range_join_half_open_boundaries(spark):
    ev = spark.createDataFrame([
        Row(k="a", ts=_ts(9, 0), eid=1),    # == start: in
        Row(k="a", ts=_ts(9, 30), eid=2),   # inside
        Row(k="a", ts=_ts(10, 0), eid=3),   # == end: out (half-open)
        Row(k="b", ts=_ts(9, 30), eid=4),   # wrong key
    ])
    iv = spark.createDataFrame([
        Row(k="a", w_start=_ts(9, 0), w_end=_ts(10, 0), ivid=7),
    ])
    for width in (None, 600):
        got = {(r.eid, r.ivid) for r in range_join(
            ev, iv, on=["k"], ts_col="ts", start_col="w_start",
            end_col="w_end", bin_width_s=width).collect()}
        assert got == {(1, 7), (2, 7)}, f"bin_width_s={width}"


def test_range_join_binned_matches_plain(spark, sf_dir):
    from configurable_etl_python_repo_spark.sources.files import read_events

    ev = read_events(spark, f"{sf_dir}/events.parquet")
    iv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("w_end"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", "ts"
    )

    def run(width):
        return {(r.cid, r.pid) for r in range_join(
            clicks, iv, on=["user_id"], ts_col="ts", start_col="w_start",
            end_col="w_end", bin_width_s=width).collect()}

    assert run(None) == run(900) == run(86400)


def test_range_join_binned_never_nested_loop(spark):
    """With NO equi-key (on=[]), the plain path degrades to a nested-loop
    join but the binned path stays an equi-join on the time bin."""
    ev = spark.createDataFrame([Row(ts=_ts(9, 30), eid=1)])
    iv = spark.createDataFrame(
        [Row(w_start=_ts(9), w_end=_ts(10), ivid=7)]
    )

    def plan(width):
        return (range_join(ev, iv, on=[], ts_col="ts",
                           start_col="w_start", end_col="w_end",
                           bin_width_s=width)
                ._jdf.queryExecution().executedPlan().toString())

    degraded = plan(None)
    assert ("BroadcastNestedLoopJoin" in degraded
            or "CartesianProduct" in degraded)          # the degraded shape
    binned = plan(600)
    assert "BroadcastNestedLoopJoin" not in binned      # the scale path
    assert "CartesianProduct" not in binned
    got = {(r.eid, r.ivid) for r in range_join(
        ev, iv, on=[], ts_col="ts", start_col="w_start",
        end_col="w_end", bin_width_s=600).collect()}
    assert got == {(1, 7)}


def test_asof_matches_pandas_merge_asof_model(spark):
    """Model check: on seeded-random frames, asof_join must equal pandas'
    merge_asof per key (the single-node reference implementation of the
    same operator) — backward, inclusive, left-join semantics."""
    import random

    import pandas as pd

    rng = random.Random(11)
    for trial in range(4):
        lrows = [Row(key=rng.choice("abc"), ts=_ts(rng.randint(0, 23),
                                                   rng.choice([0, 15, 30, 45])),
                     lv=i)
                 for i in range(rng.randint(1, 25))]
        # unique (key, ts) on the right so the match is well-defined
        seen = set()
        rrows = []
        for i in range(rng.randint(1, 25)):
            k = (rng.choice("abc"),
                 _ts(rng.randint(0, 23), rng.choice([0, 15, 30, 45])))
            if k in seen:
                continue
            seen.add(k)
            rrows.append(Row(key=k[0], ts=k[1], rv=100 + i))
        left = spark.createDataFrame(lrows)
        right = spark.createDataFrame(rrows)

        got = {(r.key, r.ts, r.lv): r.rv
               for r in asof_join(left, right, on=["key"]).collect()}

        lp = pd.DataFrame([r.asDict() for r in lrows]).sort_values("ts")
        rp = pd.DataFrame([r.asDict() for r in rrows]).sort_values("ts")
        model_df = pd.merge_asof(lp, rp, on="ts", by="key",
                                 direction="backward")
        model = {
            (r.key, r.ts.to_pydatetime(), r.lv):
                (None if pd.isna(r.rv) else int(r.rv))
            for r in model_df.itertuples()
        }
        assert got == model, f"trial {trial} diverged"


def test_asof_null_payload_propagates_from_matched_row(spark):
    """When the MATCHED right row carries NULL payload values, those NULLs
    must come through — not a stale non-null value from an older right row
    — and multi-column payloads must all come from the same right row
    (pandas merge_asof / DuckDB ASOF JOIN semantics). Regression: the
    per-column last(ignorenulls) formulation mixed rows."""
    left = spark.createDataFrame([
        Row(key="a", ts=_ts(10), lv=1),   # matches ts=9 row
        Row(key="a", ts=_ts(12), lv=2),   # matches ts=11 row
    ])
    right = spark.createDataFrame(
        [("a", _ts(9), 1.0, None), ("a", _ts(11), None, 2.0)],
        "key string, ts timestamp, v1 double, v2 double",
    )
    got = {r.lv: (r.v1, r.v2)
           for r in asof_join(left, right, on=["key"]).collect()}
    # row-consistent: lv=2 matched the ts=11 row wholesale → v1 is NULL,
    # not the stale 1.0 from ts=9
    assert got == {1: (1.0, None), 2: (None, 2.0)}


def test_asof_null_payload_with_tolerance(spark):
    """Tolerance gating keys off the matched row's timestamp carried in
    the same struct, so all-NULL payload rows still count as matches."""
    left = spark.createDataFrame([Row(key="a", ts=_ts(10), lv=1)])
    right = spark.createDataFrame(
        [("a", _ts(8), 7.0), ("a", _ts(9, 45), None)],
        "key string, ts timestamp, px double",
    )
    got = asof_join(left, right, on=["key"], tolerance_s=3600).collect()
    # matched row is ts=9:45 (within tolerance) whose px is NULL — the
    # older 7.0 must not leak through
    assert got[0].px is None


def test_engine_asof_and_range_ops(spark):
    """The config-program surface: ASOF JOIN / RANGE JOIN dispatch through
    the engine like any reference op."""
    from configurable_etl_python_repo_spark.plans import Engine
    from configurable_etl_python_repo_spark.plans.spec import OpSpec

    trades = spark.createDataFrame([Row(key="a", ts=_ts(10), qty=3)])
    quotes = spark.createDataFrame([Row(key="a", ts=_ts(9), px=1.5)])
    eng = Engine(spark)
    eng.bind("t", trades)
    eng.bind("q", quotes)
    eng.run_op(OpSpec(op="ASOF JOIN", target="j", inputs=["t", "q"],
                      args={"on": ["key"], "ts": "ts"}))
    assert eng.resolve("j").collect()[0].px == 1.5

    iv = spark.createDataFrame(
        [Row(key="a", w_start=_ts(9), w_end=_ts(11), ivid=1)]
    )
    eng.bind("iv", iv)
    eng.run_op(OpSpec(op="RANGE JOIN", target="r", inputs=["t", "iv"],
                      args={"on": ["key"], "ts": "ts", "start": "w_start",
                            "end": "w_end", "bin_width_s": 3600}))
    assert eng.resolve("r").collect()[0].ivid == 1


def test_asof_null_ts_matches_nothing_either_side(spark):
    """NULL timestamps match nothing on EITHER side, both directions:
    a NULL-ts LEFT row gets no payload (desc ordering defaults to
    nulls LAST, which seated such rows after the whole right side and
    handed them the min-ts payload under direction='forward'), and a
    NULL-ts RIGHT row is dropped before the sort (its non-null payload
    STRUCT would otherwise sort to the head of every window under
    nulls-first and become a universal fallback match for every
    otherwise-unmatched left row — both regressions live-reproduced)."""
    left = spark.createDataFrame(
        [Row(key="a", ts=None, qty=1), Row(key="a", ts=_ts(10), qty=2),
         Row(key="a", ts=_ts(1), qty=3)],
        "key string, ts timestamp, qty int",
    )
    right = spark.createDataFrame(
        [Row(key="a", ts=None, px=99.0), Row(key="a", ts=_ts(5), px=1.0)],
        "key string, ts timestamp, px double",
    )
    results = {}
    for direction in ("backward", "forward"):
        results[direction] = {r.qty: r.px for r in asof_join(
            left, right, on=["key"], direction=direction
        ).collect()}
    # NULL-ts left row: no match either way
    assert results["backward"][1] is None
    assert results["forward"][1] is None
    # the NULL-ts right row is never the fallback: qty=2 (ts 10:00)
    # has no forward match, qty=3 (ts 01:00) no backward match
    assert results["forward"][2] is None
    assert results["backward"][3] is None
    # and the real quote still matches normally
    assert results["backward"][2] == 1.0
    assert results["forward"][3] == 1.0


def test_asof_join_matches_reference_model(spark):
    """Property test: asof_join == a pure-Python per-row argmin/argmax
    reference over randomized inputs — keys, duplicate left times,
    NULL left times, boundary-inclusive matches, both directions, with
    and without tolerance. Right rows are unique per (key, ts), the
    operator's documented determinism precondition."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rights = st.lists(
        st.tuples(st.integers(0, 2),
                  st.one_of(st.none(), st.integers(0, 20))),
        min_size=0, max_size=8, unique=True,
    )
    lefts = st.lists(
        st.tuples(st.integers(0, 2),
                  st.one_of(st.none(), st.integers(0, 20))),
        min_size=1, max_size=8,
    )

    def reference(lrows, rrows, direction, tol):
        out = []
        for i, (k, lt) in enumerate(lrows):
            best = None
            if lt is not None:
                for rk, rt in rrows:
                    if rk != k or rt is None:
                        continue
                    if direction == "backward" and rt <= lt:
                        if best is None or rt > best:
                            best = rt
                    if direction == "forward" and rt >= lt:
                        if best is None or rt < best:
                            best = rt
            if best is not None and tol is not None and abs(
                lt - best
            ) > tol:
                best = None
            out.append((i, None if best is None else float(best * 10)))
        return sorted(out)

    @settings(max_examples=25, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(lefts, rights, st.sampled_from(["backward", "forward"]),
           st.sampled_from([None, 3]))
    def check(lrows, rrows, direction, tol):
        left = spark.createDataFrame(
            [(i, k, lt) for i, (k, lt) in enumerate(lrows)],
            "i int, key int, ts int",
        )
        right = spark.createDataFrame(
            [(k, rt, 99.0 if rt is None else float(rt * 10))
             for k, rt in rrows],
            "key int, ts int, px double",
        )
        got = sorted(
            (r.i, r.px)
            for r in asof_join(
                left, right, on=["key"], direction=direction,
                tolerance_s=tol,
            ).collect()
        )
        assert got == reference(lrows, rrows, direction, tol)

    check()


def test_range_join_matches_reference_model(spark):
    """Property test: range_join == a pure-Python half-open interval
    reference over randomized inputs, for the plain key-join path AND
    the binned scale path (several bin widths) — the two plans must be
    semantically identical by construction."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    events_s = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20)),
        min_size=1, max_size=8,
    )
    ivals_s = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20),
                  st.integers(0, 8)),
        min_size=0, max_size=6,
    )

    def reference(evs, ivs):
        out = []
        for i, (k, t) in enumerate(evs):
            for j, (ik, s0, w) in enumerate(ivs):
                if ik == k and s0 <= t < s0 + w:
                    out.append((i, j))
        return sorted(out)

    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(events_s, ivals_s, st.sampled_from([None, 2, 7]))
    def check(evs, ivs, bin_w):
        events = spark.createDataFrame(
            [(i, k, t) for i, (k, t) in enumerate(evs)],
            "i int, key int, ts int",
        )
        intervals = spark.createDataFrame(
            [(j, k, s0, s0 + w) for j, (k, s0, w) in enumerate(ivs)],
            "j int, key int, start int, end int",
        )
        got = sorted(
            (r.i, r.j)
            for r in range_join(
                events, intervals, on=["key"], bin_width_s=bin_w
            ).collect()
        )
        assert got == reference(evs, ivs)

    check()
