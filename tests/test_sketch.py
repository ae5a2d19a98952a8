"""HLL distinct sketch: merge identity, accuracy, determinism, edges."""

import pytest
from pyspark.sql import functions as F

from configurable_etl_python_repo_spark.llm.sketch import (
    approx_distinct,
    distinct_sketch,
    merge_sketches,
    sketch_estimate,
)


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_sketch_merge_identity_three_way(spark):
    """sketch(A) ⊔ sketch(B) ⊔ sketch(C) == sketch(A ∪ B ∪ C) EXACTLY —
    including overlapping parts (max is idempotent)."""
    whole = _ids(spark, 0, 3000)
    parts = [_ids(spark, 0, 1200), _ids(spark, 1000, 2200),
             _ids(spark, 2000, 3000)]
    merged = merge_sketches(
        *[distinct_sketch(p, ["k"], b=8) for p in parts]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, distinct_sketch(whole, ["k"], b=8).collect())
    )


def test_sketch_estimate_accuracy_and_determinism(spark):
    """Error within ~3 standard errors (1.04/sqrt(m)) at two b values;
    repeated builds are bit-identical (md5-derived, no RNG state)."""
    n = 5000
    df = _ids(spark, 0, n)
    for b in (10, 12):
        se = 1.04 / (1 << b) ** 0.5
        est = approx_distinct(df, ["k"], b=b).collect()[0]["est"]
        assert abs(est - n) / n < 3 * se, (b, est)
    a = approx_distinct(df, ["k"], b=12).collect()[0]
    c = approx_distinct(df, ["k"], b=12).collect()[0]
    assert (a["est"], a["v_zero"]) == (c["est"], c["v_zero"])


def test_sketch_linear_counting_small_range(spark):
    """Tiny cardinalities take the linear-counting branch and stay
    accurate (raw HLL is biased there); empty input estimates 0."""
    est = approx_distinct(_ids(spark, 0, 10), ["k"], b=12).collect()[0]
    assert est["v_zero"] >= (1 << 12) - 10
    assert abs(est["est"] - 10) < 1.0
    empty = approx_distinct(
        _ids(spark, 0, 0), ["k"], b=12
    ).collect()[0]
    assert est["m"] == 1 << 12
    assert empty["est"] == 0.0 and empty["v_zero"] == 1 << 12


def test_sketch_partitioning_invariance(spark):
    """The sketch (and so the estimate) is identical at any input
    partitioning — a pure groupBy-max over content hashes."""
    df = _ids(spark, 0, 2000)
    one = distinct_sketch(df.coalesce(1), ["k"], b=9)
    many = distinct_sketch(df.repartition(13), ["k"], b=9)
    assert sorted(map(tuple, one.collect())) == sorted(
        map(tuple, many.collect())
    )


def test_sketch_validation_and_multi_column(spark):
    df = _ids(spark, 0, 100).withColumn("g", F.col("k") % 10)
    # multi-column distinct: 100 (k, g) pairs, not 10
    est = approx_distinct(df, ["k", "g"], b=12).collect()[0]["est"]
    assert abs(est - 100) < 10
    with pytest.raises(ValueError, match="b must be"):
        distinct_sketch(df, ["k"], b=6)
    with pytest.raises(ValueError, match="b must be"):
        sketch_estimate(distinct_sketch(df, ["k"]), b=17)
    with pytest.raises(ValueError, match="cols"):
        distinct_sketch(df, [])
    with pytest.raises(ValueError, match="at least one sketch"):
        merge_sketches()


def test_sketch_config_ops(spark):
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    eng.bind("t", _ids(spark, 0, 500))
    sk = eng.run_op(OpSpec(
        "DISTINCT SKETCH", "s", ["t"], {"columns": ["k"], "b": 10}))
    assert set(sk.columns) == {"register", "max_rho"}
    eng.bind("sk", sk)
    est = eng.run_op(OpSpec("SKETCH ESTIMATE", "e", ["sk"], {"b": 10}))
    one = eng.run_op(OpSpec(
        "APPROX DISTINCT", "a", ["t"], {"columns": ["k"], "b": 10}))
    assert est.collect()[0]["est"] == one.collect()[0]["est"]


def test_sketch_saturated_registers_finite_estimate(spark):
    """Saturated registers push e_raw past 2^32 (up to ~alpha_m*m*2^33);
    the large-range correction must CLAMP below 2^32 instead of feeding
    ln() a negative argument (NaN/NULL est). The capped estimate is the
    documented saturation ceiling 2^32 * 32*ln(2) ~ 9.5e10."""
    import math

    m = 1 << 7
    saturated = spark.createDataFrame(
        [(r, 33) for r in range(m)], "register long, max_rho int"
    )
    row = sketch_estimate(saturated, b=7).collect()[0]
    assert row["est"] is not None and not math.isnan(row["est"])
    cap = -float(1 << 32) * round(math.log(1.0 - (2**32 - 1) / 2**32), 6)
    assert row["est"] == pytest.approx(cap, rel=1e-9)
    # near-saturation (rho=20 everywhere): e_raw ~ alpha*m*2^20 > 2^32/30
    # takes the branch too and must stay finite and monotone below cap
    high = spark.createDataFrame(
        [(r, 20) for r in range(m)], "register long, max_rho int"
    )
    est_high = sketch_estimate(high, b=7).collect()[0]["est"]
    assert est_high is not None and 0 < est_high <= row["est"]
