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


def test_sketch_null_key_is_a_distinct_value(spark):
    """NULL values in distinct_cols coalesce to a chr(1) sentinel, so a
    NULL is ONE distinct value (not silently folded into the seed-only
    key) and the Spark key matches the SQL oracle's `||` concat, which
    would nullify on NULL. Regression for the Spark/oracle divergence
    flagged in round-8 ADVICE; also pins the duckdb replay on a
    NULL-carrying fixture."""
    import duckdb

    df = spark.createDataFrame(
        [(None,), (None,), ("x",), ("y",)], "k string"
    )
    est = approx_distinct(df, ["k"], b=12).collect()[0]
    # 3 distinct values: NULL, x, y (b=12 linear counting is ~exact at
    # this size; the pre-fix key would have estimated 2-ish, folding
    # both NULLs and the seed-only key together)
    assert abs(est["est"] - 3) < 0.1, est["est"]
    # the oracle generator's coalesce(…, chr(1)) replays the same key
    pdf = df.toPandas()
    got = duckdb.sql(
        "SELECT count(DISTINCT md5('hll' || '|' || "
        "coalesce(k, chr(1)))) FROM pdf"
    ).fetchone()[0]
    assert got == 3


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


# ---------------------------------------------------------------------------
# Quantile sketch (HDR log buckets)
# ---------------------------------------------------------------------------

from configurable_etl_python_repo_spark.llm.sketch import (  # noqa: E402
    approx_quantiles,
    merge_value_sketches,
    sketch_quantiles,
    value_sketch,
)


def _vals(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v long")


def test_value_sketch_merge_identity(spark):
    """sketch(A) ⊔ sketch(B) ⊔ sketch(C) == sketch(A ∪ B ∪ C) EXACTLY —
    counts are additive per bucket, including duplicated values."""
    whole = _vals(spark, list(range(0, 3000)) + [7] * 50)
    parts = [_vals(spark, list(range(0, 1200)) + [7] * 50),
             _vals(spark, list(range(1200, 2200))),
             _vals(spark, list(range(2200, 3000)))]
    merged = merge_value_sketches(
        *[value_sketch(p, "v", s=5) for p in parts]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, value_sketch(whole, "v", s=5).collect())
    )


def test_quantiles_relative_error_bound(spark):
    """Estimates carry <= 2^-s relative error at any magnitude (bucket
    midpoints of <= 2^-s-wide buckets); values below 2^(s+1) are EXACT."""
    import random

    rng = random.Random(8)
    values = [rng.randrange(1, 10**9) for _ in range(5000)]
    df = _vals(spark, values)
    for s in (5, 7):
        got = {r.q: r.est for r in
               approx_quantiles(df, "v", [0.5, 0.95, 0.99], s=s).collect()}
        sv = sorted(values)
        import math
        for q, est in got.items():
            exact = sv[max(math.ceil(q * len(sv)), 1) - 1]
            assert abs(est - exact) / exact <= 2 ** -s, (s, q, est, exact)
    # small-value exactness: every value < 2^(s+1) sits in its own bucket
    small = _vals(spark, [1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    got = {r.q: (r.est, r.n) for r in
           approx_quantiles(small, "v", [0.5, 1.0], s=7).collect()}
    assert got[0.5] == (5.0, 10) and got[1.0] == (10.0, 10)


def test_quantiles_determinism_partitioning_and_zero(spark):
    """Bit-identical under any input partitioning (pure integer
    bucketing, no RNG); zero values bucket exactly; NULLs skipped."""
    values = [0, 0, 1, 17, 300, 4096, 10**12]
    df = spark.createDataFrame(
        [(v,) for v in values] + [(None,)], "v long"
    )
    a = sorted(map(tuple, value_sketch(df, "v").collect()))
    b = sorted(map(tuple,
                   value_sketch(df.repartition(13), "v").collect()))
    assert a == b
    got = {r.q: r for r in
           sketch_quantiles(value_sketch(df, "v"), [0.25, 1.0]).collect()}
    assert got[0.25].n == 7  # NULL skipped
    assert got[0.25].est == 0.0  # rank-2 of 7 is the second zero


def test_quantiles_scale_and_validation(spark):
    """Fractional inputs ride a fixed decimal scale (floor(v*scale));
    s and q ranges are validated; negatives raise."""
    import pytest

    from pyspark.sql.utils import AnalysisException  # noqa: F401

    df = spark.createDataFrame(
        [(0.001,), (0.5,), (2.75,), (1000.25,)], "v double"
    )
    got = {r.q: r.est for r in
           approx_quantiles(df, "v", [0.5, 1.0], scale=10**6).collect()}
    assert abs(got[0.5] - 0.5) / 0.5 <= 2 ** -7
    assert abs(got[1.0] - 1000.25) / 1000.25 <= 2 ** -7
    # at scale=100, 0.5 -> 50 < 2^8: exact (scale trades range for
    # small-value exactness)
    exact = {r.q: r.est for r in
             approx_quantiles(df, "v", [0.5], scale=100).collect()}
    assert exact[0.5] == 0.5
    with pytest.raises(ValueError, match="s must be"):
        value_sketch(df, "v", s=1)
    with pytest.raises(ValueError, match="quantiles must be"):
        sketch_quantiles(value_sketch(df, "v", scale=10), [0.0])
    with pytest.raises(ValueError, match="at least one quantile"):
        sketch_quantiles(value_sketch(df, "v", scale=10), [])
    with pytest.raises(ValueError, match="at least one sketch"):
        merge_value_sketches()
    neg = spark.createDataFrame([(-3,)], "v long")
    with pytest.raises(Exception, match="negative value"):
        value_sketch(neg, "v").collect()


def test_quantile_sketch_config_ops(spark):
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    eng.bind("t", _vals(spark, list(range(1, 101))))
    sk = eng.run_op(OpSpec(
        "VALUE SKETCH", "s", ["t"], {"column": "v", "s": 7}))
    assert set(sk.columns) == {"idx", "cnt"}
    eng.bind("sk", sk)
    est = eng.run_op(OpSpec(
        "SKETCH QUANTILES", "e", ["sk"], {"qs": [0.5], "s": 7}))
    one = eng.run_op(OpSpec(
        "APPROX QUANTILES", "a", ["t"], {"column": "v", "qs": [0.5]}))
    assert est.collect()[0]["est"] == one.collect()[0]["est"] == 50.0


def test_quantiles_top_bucket_no_overflow(spark):
    """Buckets above ~2^62 must not overflow the midpoint decode
    (lo + (width-1)/2, never (lo+hi)/2 — the summed form wraps
    negative in Spark and raises in DuckDB): estimates stay positive
    and within the relative-error bound for any representable long."""
    import math

    for big in (
        # exponent 31: shiftleft(1, 31) on an INT literal is INT_MIN and
        # the -1 overflows under ANSI — the masked-shift crash range
        [(1 << 38) + 5, (1 << 39) - 7],
        # exponent 55: int shifts wrap mod 32 and decode silently wrong
        [1 << 62, (1 << 62) + 12345, 9_223_372_036_854_775_000],
    ):
        df = _vals(spark, big)
        got = {r.q: r.est for r in
               approx_quantiles(df, "v", [0.5, 1.0], s=7).collect()}
        exact = sorted(big)
        for q, est in got.items():
            assert est > 0, (q, est)
            want = exact[max(math.ceil(q * len(exact)), 1) - 1]
            # the true midpoint bound is HALF the bucket width
            assert abs(est - want) / want <= 2 ** -8, (q, est, want)


def test_sketches_are_streaming_legal(spark, sf_dir, tmp_path):
    """Both sketches run UNCHANGED under readStream (complete mode —
    register-max and count-sum are legal unwindowed streaming
    aggregations) and converge to exactly the batch sketch: the
    mergeability that makes per-day sketches roll up also makes them
    valid incremental streaming state. Quantile/estimate decode then
    runs as a tiny batch over the completed sketch table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").alias("len")
    )
    src = str(tmp_path / "sketch_src")
    docs.write.parquet(src)
    stream = spark.readStream.format("parquet").schema(docs.schema).load(src)

    dsk = distinct_sketch(stream, ["doc_id"], b=10)
    assert dsk.isStreaming
    q1 = (dsk.writeStream.format("memory").queryName("hll_stream")
          .outputMode("complete")
          .option("checkpointLocation", str(tmp_path / "ck1"))
          .trigger(availableNow=True).start())
    assert q1.awaitTermination(120)
    got = sorted(map(tuple, spark.table("hll_stream").collect()))
    want = sorted(map(tuple,
                      distinct_sketch(docs, ["doc_id"], b=10).collect()))
    assert got == want and got

    vsk = value_sketch(stream, "len", s=7)
    assert vsk.isStreaming
    q2 = (vsk.writeStream.format("memory").queryName("vs_stream")
          .outputMode("complete")
          .option("checkpointLocation", str(tmp_path / "ck2"))
          .trigger(availableNow=True).start())
    assert q2.awaitTermination(120)
    got_v = sorted(map(tuple, spark.table("vs_stream").collect()))
    want_v = sorted(map(tuple, value_sketch(docs, "len", s=7).collect()))
    assert got_v == want_v and got_v
    # decode over the completed sketch table == batch end-to-end
    stream_q = {r.q: r.est for r in sketch_quantiles(
        spark.table("vs_stream"), [0.5, 0.95], s=7).collect()}
    batch_q = {r.q: r.est for r in approx_quantiles(
        docs, "len", [0.5, 0.95], s=7).collect()}
    assert stream_q == batch_q


def test_grouped_sketches_equal_per_group_runs(spark):
    """group_cols threads one independent sketch per group through the
    whole family: the grouped run must equal filtering each group and
    running ungrouped — for the distinct sketch, its estimate, the
    value sketch, and the quantiles (incl. a NULL group key, which is
    a real group via eqNullSafe)."""
    from configurable_etl_python_repo_spark.llm.sketch import (
        approx_quantiles,
        merge_value_sketches,
        sketch_quantiles,
        value_sketch,
    )

    df = spark.range(0, 3000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, F.lit("a"))
        .when(F.col("id") % 3 == 1, F.lit("b"))
        .otherwise(F.lit(None).cast("string"))
        .alias("g"),
        (F.col("id") % 97 + 1).alias("v"),
    )
    groups = [("a",), ("b",), (None,)]
    # distinct sketch + estimate
    grouped = sketch_estimate(
        distinct_sketch(df, ["k"], b=8, group_cols=["g"]),
        b=8, group_cols=["g"],
    ).collect()
    assert len(grouped) == 3
    for (gv,) in groups:
        part = df.where(F.col("g").eqNullSafe(F.lit(gv)))
        want = sketch_estimate(distinct_sketch(part, ["k"], b=8), b=8)
        wrow = want.collect()[0]
        grow = next(r for r in grouped
                    if (r.g == gv if gv is not None else r.g is None))
        assert (grow.m, grow.v_zero, grow.est) == (
            wrow.m, wrow.v_zero, wrow.est)
    # grouped merge identity (both families)
    halves = [df.where(F.col("k") % 2 == p) for p in (0, 1)]
    nkey = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    m1 = merge_sketches(
        *[distinct_sketch(h, ["k"], b=8, group_cols=["g"])
          for h in halves],
        group_cols=["g"],
    )
    assert sorted(map(tuple, m1.collect()), key=nkey) == sorted(
        map(tuple,
            distinct_sketch(df, ["k"], b=8, group_cols=["g"]).collect()),
        key=nkey,
    )
    m2 = merge_value_sketches(
        *[value_sketch(h, "v", s=4, group_cols=["g"]) for h in halves],
        group_cols=["g"],
    )
    assert sorted(map(tuple, m2.collect()), key=nkey) == sorted(
        map(tuple,
            value_sketch(df, "v", s=4, group_cols=["g"]).collect()),
        key=nkey,
    )
    # grouped quantiles == per-group ungrouped quantiles
    qs = [0.5, 0.95]
    gq = sketch_quantiles(m2, qs, s=4, group_cols=["g"]).collect()
    assert len(gq) == 6
    for (gv,) in groups:
        part = df.where(F.col("g").eqNullSafe(F.lit(gv)))
        want = {(r.q, r.est, r.n)
                for r in approx_quantiles(part, "v", qs, s=4).collect()}
        got = {(r.q, r.est, r.n) for r in gq
               if (r.g == gv if gv is not None else r.g is None)}
        assert got == want


def test_grouped_sketch_config_ops(spark):
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    eng.bind("t", spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 10 + 1).alias("v"),
    ))
    est = eng.run_op(OpSpec(
        "APPROX DISTINCT", "e", ["t"],
        {"columns": ["k"], "b": 8, "group_columns": ["g"]}))
    assert {r.g for r in est.collect()} == {"0", "1"}
    qq = eng.run_op(OpSpec(
        "APPROX QUANTILES", "q", ["t"],
        {"column": "v", "qs": [0.5], "s": 4, "group_columns": ["g"]}))
    rows = qq.collect()
    assert len(rows) == 2 and all(r.n == 200 for r in rows)


def test_grouped_sketches_are_streaming_legal(spark, sf_dir, tmp_path):
    """The grouped variants stay streaming-legal: groupBy(group, key)
    max/sum are still unwindowed streaming aggregations, so one stream
    maintains a live per-domain sketch; the grouped quantile decode
    then runs as a tiny batch over the completed sketch table."""
    from configurable_etl_python_repo_spark.llm.sketch import (
        merge_value_sketches,
        value_sketch,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", F.length("text").alias("len")
    )
    src = str(tmp_path / "gsketch_src")
    docs.write.parquet(src)
    stream = spark.readStream.format("parquet").schema(docs.schema).load(src)

    vsk = value_sketch(stream, "len", s=6, group_cols=["lang"])
    assert vsk.isStreaming
    q = (vsk.writeStream.format("memory").queryName("gvs_stream")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "gck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("gvs_stream").collect()))
    want = sorted(map(tuple, value_sketch(
        docs, "len", s=6, group_cols=["lang"]).collect()))
    assert got == want and got
    # grouped decode over the completed stream table == grouped batch
    stream_q = {(r.lang, r.q): r.est for r in sketch_quantiles(
        spark.table("gvs_stream"), [0.5], s=6, group_cols=["lang"]
    ).collect()}
    batch_q = {(r.lang, r.q): r.est for r in approx_quantiles(
        docs, "len", [0.5], s=6, group_cols=["lang"]).collect()}
    assert stream_q == batch_q and len(stream_q) == 5
    # grouped stream sketch merges with a batch sketch group-wise:
    # counts are ADDITIVE, so self-merge exactly doubles every bucket
    merged = merge_value_sketches(
        spark.table("gvs_stream"),
        value_sketch(docs, "len", s=6, group_cols=["lang"]),
        group_cols=["lang"],
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        (lang, idx, 2 * cnt) for lang, idx, cnt in want
    )


def test_corpus_report_equals_its_stages(spark):
    """The report row for each group must equal the standalone stages
    run per group (count/sum, grouped approx_distinct, grouped
    approx_quantiles), including a NULL group; validation rejects an
    empty group list."""
    from configurable_etl_python_repo_spark.llm.sketch import (
        approx_distinct,
        approx_quantiles,
        corpus_report,
    )

    df = spark.range(0, 900).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, F.lit("a"))
        .when(F.col("id") % 3 == 1, F.lit("b"))
        .otherwise(F.lit(None).cast("string"))
        .alias("g"),
        (F.col("id") % 50 + 1).alias("v"),
    )
    rep = {r.g: r for r in corpus_report(
        df, group_cols=["g"], distinct_cols=["k"], value_col="v",
        qs=[0.5, 0.95], b=8, s=4,
    ).collect()}
    assert set(rep) == {"a", "b", None}
    dist = {r.g: r.est for r in approx_distinct(
        df, ["k"], b=8, group_cols=["g"]).collect()}
    qnt = {(r.g, r.q): r.est for r in approx_quantiles(
        df, "v", [0.5, 0.95], s=4, group_cols=["g"]).collect()}
    for gv in ("a", "b", None):
        row = rep[gv]
        assert row.n_rows == 300 and row.value_sum > 0
        assert row.distinct_est == dist[gv]
        assert row.p50 == qnt[(gv, 0.5)]
        assert row.p95 == qnt[(gv, 0.95)]
    # a group whose values are ALL NULL still reports: n_rows counts,
    # value_sum and every quantile column NULL (left-join semantics)
    withnull = df.unionByName(spark.createDataFrame(
        [(9001, "z", None), (9002, "z", None)],
        "k long, g string, v long"))
    zrow = {r.g: r for r in corpus_report(
        withnull, group_cols=["g"], distinct_cols=["k"], value_col="v",
        qs=[0.5], b=8, s=4,
    ).collect()}["z"]
    assert zrow.n_rows == 2 and zrow.value_sum is None
    assert zrow.p50 is None and zrow.distinct_est is not None
    import pytest

    with pytest.raises(ValueError, match="group_cols"):
        corpus_report(df, group_cols=[], distinct_cols=["k"],
                      value_col="v")


def test_corpus_report_as_config_op(spark):
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    eng.bind("t", spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 7 + 1).alias("v"),
    ))
    out = eng.run_op(OpSpec(
        "CORPUS REPORT", "r", ["t"],
        {"group_columns": ["g"], "distinct_columns": ["k"],
         "value_column": "v", "qs": [0.5], "b": 8, "s": 4}))
    rows = {r.g: r for r in out.collect()}
    assert set(rows) == {"0", "1"}
    assert all(r.n_rows == 50 and r.p50 is not None
               for r in rows.values())


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

from configurable_etl_python_repo_spark.llm.sketch import (  # noqa: E402
    cms_estimate,
    count_min_sketch,
    merge_cms,
)


def _zipfish(spark, n_rows=2000):
    """Skewed keys: key k appears ~n/(k+1) times — the heavy-hitter
    regime count-min is for."""
    return spark.range(n_rows).select(
        F.floor(F.sqrt(F.col("id"))).cast("string").alias("k")
    )


def test_cms_one_sided_and_exact_when_wide(spark):
    """est >= exact for EVERY key (the count-min guarantee), and at a
    width far above the key cardinality (no collisions possible to
    matter) est == exact for every key."""
    df = _zipfish(spark)
    exact = {r.k: r.n for r in df.groupBy("k").count()
             .withColumnRenamed("count", "n").collect()}
    keys = df.select("k").distinct()
    for wb, must_be_exact in ((6, False), (14, True)):
        sk = count_min_sketch(df, ["k"], depth=4, width_bits=wb)
        est = {r.k: r.est for r in cms_estimate(
            sk, keys, ["k"], depth=4, width_bits=wb).collect()}
        assert set(est) == set(exact)
        assert all(est[k] >= exact[k] for k in exact), wb
        if must_be_exact:
            assert est == exact


def test_cms_merge_identity_three_way(spark):
    """cms(A) + cms(B) + cms(C) == cms(A ∪ B ∪ C) EXACTLY, counter for
    counter — parts here OVERLAP as a union-all (addition counts
    multiplicity, unlike the HLL max)."""
    whole = _zipfish(spark, 3000)
    parts = [
        spark.range(lo, hi).select(
            F.floor(F.sqrt(F.col("id"))).cast("string").alias("k"))
        for lo, hi in ((0, 1200), (1200, 2400), (2400, 3000))
    ]
    merged = merge_cms(
        *[count_min_sketch(p, ["k"], depth=3, width_bits=8)
          for p in parts]
    )
    one = count_min_sketch(whole, ["k"], depth=3, width_bits=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, one.collect())
    )


def test_cms_weighted_grouped_and_nulls(spark):
    """weight_col sums exact BIGINTs; group_cols give independent
    per-group counters estimated group-wise (null-safe — a NULL group
    is a real group); a NULL key is a countable value."""
    rows = [("a", "x", 5), ("a", "x", 7), ("a", None, 2),
            (None, "x", 11), (None, "x", 1)]
    df = spark.createDataFrame(rows, "g string, k string, w long")
    sk = count_min_sketch(df, ["k"], depth=4, width_bits=10,
                          weight_col="w", group_cols=["g"])
    est = cms_estimate(sk, df.select("g", "k"), ["k"], depth=4,
                       width_bits=10, group_cols=["g"])
    got = {(r.g, r.k): r.est for r in est.collect()}
    assert got == {("a", "x"): 12, ("a", None): 2, (None, "x"): 12}


def test_cms_absent_key_and_bounded_size(spark):
    """A key never inserted estimates 0 when its buckets are empty;
    the counter relation never exceeds depth * 2^width_bits rows no
    matter the input size."""
    df = _ids(spark, 0, 4000).select(F.col("k").cast("string").alias("k"))
    d, wb = 5, 6
    sk = count_min_sketch(df, ["k"], depth=d, width_bits=wb)
    assert sk.count() <= d * (1 << wb)
    ghost = spark.createDataFrame(
        [("definitely-not-a-key-\x1f",)], "k string")
    est = cms_estimate(sk, ghost, ["k"], depth=d, width_bits=wb)
    (row,) = est.collect()
    assert row.est >= 0  # may collide at this tiny width, never negative
    # at a wide sketch the ghost's estimate is exactly 0
    wide = count_min_sketch(df, ["k"], depth=4, width_bits=16)
    (row,) = cms_estimate(wide, ghost, ["k"], depth=4,
                          width_bits=16).collect()
    assert row.est == 0


def test_cms_validation(spark):
    df = _ids(spark, 0, 10).select(F.col("k").cast("string").alias("k"))
    with pytest.raises(ValueError, match="depth"):
        count_min_sketch(df, ["k"], depth=0)
    with pytest.raises(ValueError, match="width_bits"):
        count_min_sketch(df, ["k"], width_bits=3)
    with pytest.raises(ValueError, match="cols"):
        count_min_sketch(df, [])
    with pytest.raises(ValueError, match="depth"):
        cms_estimate(count_min_sketch(df, ["k"]), df, ["k"], depth=99)


def test_cms_config_ops(spark):
    """COUNT MIN SKETCH / MERGE CMS / CMS ESTIMATE as config op types;
    CMS ESTIMATE refuses a single input loudly."""
    from configurable_etl_python_repo_spark.plans import Engine, OpSpec

    eng = Engine(spark)
    df = _zipfish(spark, 800)
    eng.bind("a", df.limit(400))
    eng.bind("b", df.exceptAll(df.limit(400)))
    eng.bind("keys", df.select("k").distinct())
    kw = {"columns": ["k"], "depth": 4, "width_bits": 12}
    sa = eng.run_op(OpSpec("COUNT MIN SKETCH", "sa", ["a"], kw))
    sb = eng.run_op(OpSpec("COUNT MIN SKETCH", "sb", ["b"], kw))
    eng.bind("sa", sa)
    eng.bind("sb", sb)
    merged = eng.run_op(OpSpec("MERGE CMS", "m", ["sa", "sb"], {}))
    eng.bind("m", merged)
    est = eng.run_op(OpSpec("CMS ESTIMATE", "e", ["m", "keys"], kw))
    exact = {r.k: r.n for r in df.groupBy("k").count()
             .withColumnRenamed("count", "n").collect()}
    got = {r.k: r.est for r in est.collect()}
    assert set(got) == set(exact)
    assert all(got[k] >= exact[k] for k in exact)
    with pytest.raises(ValueError, match="sketch, keys"):
        eng.run_op(OpSpec("CMS ESTIMATE", "e2", ["m"], kw))


def test_cms_fractional_weight_column_refused(spark):
    """r13 ADVICE: cast('long') on a fractional weight silently
    truncated, voiding the exact-BIGINT contract — the build must
    refuse non-integral weight dtypes loudly (and still accept every
    integral width)."""
    import pytest

    rows = [("x", 1.5), ("y", 2.0)]
    df = spark.createDataFrame(rows, "k string, w double")
    with pytest.raises(ValueError, match="integral type"):
        count_min_sketch(df, ["k"], depth=3, width_bits=8,
                         weight_col="w")
    ok = spark.createDataFrame([("x", 2)], "k string, w int")
    assert count_min_sketch(ok, ["k"], depth=3, width_bits=8,
                            weight_col="w").count() > 0
