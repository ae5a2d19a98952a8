"""Deterministic, mergeable distinct-count sketches (HyperLogLog family).

At 100 TB "how many distinct URLs / documents / users" is a first-class
pipeline question, and the exact answer (a full groupBy on the key) is
a corpus-sized shuffle. A register sketch answers it with ONE
map-side-combinable aggregation whose output is at most m = 2^b rows —
and two sketches MERGE by register-wise max, so per-shard / per-day
sketches roll up to the global count without touching the data again
(the property exact counts fundamentally lack).

Unlike Spark's builtin approx_count_distinct (HLL++ with
implementation-defined hashing), this sketch is built from the repo's
md5-derived hash family, so it is bit-deterministic, engine-portable,
and fully replayable in ANSI SQL — the DuckDB oracle reproduces every
register and the final estimate exactly. Bias behavior is the classic
Flajolet et al. 2007 HLL (alpha_m constant, linear counting below
2.5m, 32-bit large-range correction), not HLL++'s empirically
bias-corrected variant: determinism and mergeability are the point
here, the ~1.04/sqrt(m) error is the standard one.

Determinism recipe (the repo-wide discipline): md5-derived register
and rho bits; the harmonic sum kept EXACT by scaling 2^-rho to the
integer 2^(33-rho) (BIGINT-safe for b <= 16); every ln() rounded to
6dp FIRST; the alpha_m * m^2 numerator folded to one Python double
literal; a single final round.

Reference parity: the reference has no sketches (its distinct is
pandas drop_duplicates, /root/reference/Configurable_ETL_Python.py
:243-252); this is part of the LLM-curation extension surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rho is counted in a 32-bit window; 2^-rho scaled by 2^33 stays integral
_RHO_SCALE = 33


def _check_b(b: int) -> None:
    if not (7 <= b <= 16):
        raise ValueError(
            f"b must be in [7, 16] (m = 2^b registers, alpha_m constant "
            f"valid from m >= 128, BIGINT-exact harmonic sum to m <= "
            f"65536), got {b}"
        )


def _gcols(group_cols) -> "list[str]":
    """Normalized per-group sketch key (empty = one global sketch).
    Grouped sketches bound state at <= groups * sketch_size rows and
    keep the map-side partial combine — the per-domain / per-language
    corpus report shape."""
    return list(group_cols) if group_cols else []


def _prefix_group_cols(df: DataFrame, g: "list[str]", prefix: str) -> DataFrame:
    """Rename a relation's group columns with a prefix before a
    null-safe group join. ONE definition for every such join here:
    renamed columns cannot hit Spark's self-join attribute ambiguity
    (both sides of these joins can derive from the SAME relation),
    where DataFrame aliases do."""
    out = df
    for c in g:
        out = out.withColumnRenamed(c, f"{prefix}{c}")
    return out


def quantile_col_name(q: float) -> str:
    """Column name for a quantile estimate: p50 / p95 / p99 / p99_9 —
    shared by corpus_report and its SQL oracle generator so the pivot
    names cannot drift."""
    return "p" + format(q * 100, "g").replace(".", "_")


def distinct_sketch(
    df: DataFrame,
    cols: "list[str]",
    b: int = 12,
    seed: str = "hll",
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Build the (register, max_rho) sketch of COUNT(DISTINCT cols).

    Each row hashes to 64 md5 bits split in two independent 32-bit
    halves: the low b bits of the first half pick the register, the
    second half's leading-zero count + 1 is rho (a 0 half = rho 33,
    the exhausted-window convention). The sketch is the per-register
    MAX of rho — one hash-partitioned groupBy over at most 2^b groups,
    map-side partial combine, so a 100 TB corpus ships <= 2^b rows per
    map partition no matter how skewed the data.

    NULL values in `cols` coalesce to a chr(1) sentinel BEFORE the
    concat (distinct is over the normalized key string, and NULL is a
    distinct value). The sentinel — not concat_ws's skip-NULLs — keeps
    the Spark key bit-identical to the SQL oracle's `||` concatenation,
    where a NULL operand would nullify the whole key; non-NULL values
    hash exactly as before.

    Output: (register long, max_rho int), <= 2^b rows, mergeable with
    merge_sketches. With group_cols, one independent sketch per group
    — (group_cols..., register, max_rho), <= 2^b rows per group — so a
    single pass answers "distinct X per domain/language" without one
    job per group."""
    _check_b(b)
    if not cols:
        raise ValueError("cols must name at least one column")
    g = _gcols(group_cols)
    key = F.concat_ws(
        "|",
        F.lit(seed),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x01"))
            for c in cols
        ],
    )
    h = F.md5(key)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    register = F.pmod(hi, F.lit(1 << b))
    # leading zeros in the 32-bit window: 32 - bitlen(lo); rho = lz + 1.
    # length(bin(x)) is bitlen for x > 0 in Spark AND DuckDB (both
    # print without leading zeros); lo = 0 exhausts the window.
    rho = F.when(lo == 0, F.lit(_RHO_SCALE)).otherwise(
        F.lit(_RHO_SCALE) - F.length(F.bin(lo))
    )
    return (
        df.select(
            *[F.col(c) for c in g],
            register.alias("register"),
            rho.alias("rho"),
        )
        .groupBy(*g, "register")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def merge_sketches(
    *sketches: DataFrame, group_cols: "list[str] | None" = None
) -> DataFrame:
    """Union register sketches built with the SAME (b, seed, cols
    schema) into one: register-wise max. sketch(A) ⊔ sketch(B) ==
    sketch(A ∪ B) EXACTLY (max is associative/commutative/idempotent),
    which is what makes per-shard sketches roll up lossless-ly.
    Grouped sketches merge group-wise (pass the same group_cols)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    g = _gcols(group_cols)
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*g, "register").agg(
        F.max("max_rho").cast("int").alias("max_rho")
    )


def _alpha_m(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def sketch_estimate(
    sketch: DataFrame,
    b: int = 12,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """The HLL estimate from a (register, max_rho) sketch: one row
    (m, v_zero, est) where v_zero counts empty registers — or one row
    PER GROUP (group_cols..., m, v_zero, est) for a grouped sketch
    (v_zero counts that group's empty registers).

    est = alpha_m * m^2 / sum_j 2^(-rho_j) with the standard
    corrections — linear counting m*ln(m/v_zero) when the raw estimate
    is <= 2.5m and empty registers remain, and the 32-bit large-range
    correction -2^32*ln(1 - E/2^32) at the top. The harmonic sum is
    EXACT: each 2^(-rho) is scaled to the integer 2^(33-rho) (empty
    registers contribute 2^33), summed as BIGINT, and divided once —
    the only float ops are that single division, the pre-rounded
    ln()s, and the final 6dp round, all bit-identical across engines.

    Cardinality ceiling: rho lives in a 32-bit window, so the raw
    estimate E can exceed 2^32 when registers saturate (up to
    ~alpha_m*m*2^33). Inside the large-range branch E is clamped to
    2^32 - 1 so ln(1 - E/2^32) stays defined; the resulting cap,
    2^32 * 32*ln(2) ~ 9.5e10, is the sketch's saturation value — the
    32-bit-rho design is honest to ~2^32 distincts and pins at the cap
    beyond (use a 64-bit-rho variant past that, as HLL++ does)."""
    _check_b(b)
    g = _gcols(group_cols)
    m = 1 << b
    agg = sketch.groupBy(*g).agg(
        F.count(F.lit(1)).alias("__used"),
        F.coalesce(
            F.sum(
                F.pow(F.lit(2.0), F.lit(_RHO_SCALE) - F.col("max_rho"))
                .cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("__s_present"),
    )
    v_zero = (F.lit(m) - F.col("__used")).cast("long")
    s_scaled = (
        F.col("__s_present") + v_zero * F.lit(1 << _RHO_SCALE).cast("long")
    )
    num = _alpha_m(m) * m * m * float(1 << _RHO_SCALE)
    e_raw = F.lit(num) / s_scaled.cast("double")
    two32 = float(1 << 32)
    ln6 = lambda x: F.round(F.log(x), 6)  # noqa: E731 — the 6dp-first rule
    est = (
        F.when(
            (e_raw <= F.lit(2.5 * m)) & (v_zero > 0),
            F.lit(float(m)) * ln6(F.lit(float(m)) / v_zero.cast("double")),
        )
        .when(
            e_raw > F.lit(two32 / 30.0),
            # clamp below 2^32: saturated registers push e_raw past the
            # 32-bit rho window's range and ln(1 - e/2^32) would go NaN
            F.lit(-two32)
            * ln6(
                F.lit(1.0)
                - F.least(e_raw, F.lit(two32 - 1.0)) / F.lit(two32)
            ),
        )
        .otherwise(e_raw)
    )
    return agg.select(
        *[F.col(c) for c in g],
        F.lit(m).cast("long").alias("m"),
        v_zero.alias("v_zero"),
        F.round(est, 6).cast("double").alias("est"),
    )


def approx_distinct(
    df: DataFrame,
    cols: "list[str]",
    b: int = 12,
    seed: str = "hll",
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """distinct_sketch |> sketch_estimate: one-row approximate
    COUNT(DISTINCT cols) with ~1.04/sqrt(2^b) standard error — one row
    per group with group_cols (the per-domain corpus report)."""
    return sketch_estimate(
        distinct_sketch(df, cols, b=b, seed=seed, group_cols=group_cols),
        b=b,
        group_cols=group_cols,
    )


# ---------------------------------------------------------------------------
# Deterministic mergeable quantile sketch (HDR-histogram log buckets)
# ---------------------------------------------------------------------------
#
# The distribution dual of the distinct sketch above: "p50/p95/p99 of doc
# length / score" without a global sort. Design follows the public
# HdrHistogram technique (Tene; also the base-2 variant of DDSketch,
# Masson et al. VLDB 2019): a value maps to a log-spaced bucket built
# from INTEGER ops only — shift = max(bitlen(v) - 1 - s, 0) drops all
# but the top s+1 significant bits, idx = shift * 2^(s+1) + (v >> shift).
# idx is monotone in v, at most ~64 * 2^(s+1) buckets exist (s=7 ->
# <= 16k rows, one map-side-combinable groupBy), two sketches merge by
# idx-wise count sum (sketch(A) ⊔ sketch(B) == sketch(A ∪ B) exactly),
# and every step is bit-identical in ANSI SQL — no ln()/pow() float
# trees to keep in sync across engines (the reason this is HDR and not
# gamma-bucket DDSketch: JVM Math.pow and C pow may differ in ULPs; bit
# shifts cannot). Values below 2^(s+1) are EXACT (shift 0); above, the
# bucket spans a <= 2^-s relative range, so quantile estimates (bucket
# midpoints) carry <= ~2^-(s+1) relative error at any scale.
#
# Doubles ride the same machinery through a fixed decimal `scale`
# (floor(v * scale)): the repo-wide 6dp discipline — scale=10**6
# sketches scores at 6-decimal resolution.


def _check_s(s: int) -> None:
    if not (2 <= s <= 20):
        raise ValueError(
            f"s must be in [2, 20] (2^(s+1)-wide mantissa, <= 64*2^(s+1) "
            f"buckets), got {s}"
        )


def _scaled(col, scale: int):
    v = F.col(col) if isinstance(col, str) else col
    if scale != 1:
        v = F.floor(v.cast("double") * F.lit(float(scale)))
    return v.cast("long")


def value_sketch(
    df: DataFrame,
    col: str,
    s: int = 7,
    scale: int = 1,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Build the (idx, cnt) log-bucket histogram of a NON-NEGATIVE
    numeric column. One hash aggregation over at most ~64 * 2^(s+1)
    groups — map-side partial combine, so a 100 TB corpus ships a
    bounded sketch per map partition regardless of skew. NULLs are
    skipped (they have no place on the value axis); negative values
    raise downstream of floor-scaling via an assert column.

    scale: fixed decimal resolution for fractional inputs
    (floor(v * scale) enters the integer machinery); keep the SAME
    scale at estimate time. Output: (idx long, cnt long), mergeable
    with merge_value_sketches. With group_cols, one independent
    histogram per group — (group_cols..., idx, cnt), bounded per
    group."""
    _check_s(s)
    g = _gcols(group_cols)
    guard = F.assert_true(
        F.col("__sv") >= 0,
        F.lit(f"value_sketch({col}): negative value after scaling"),
    )
    # the Python shiftright/shiftleft wrappers take only int shift
    # amounts; the SQL expressions accept a column — hence F.expr here
    idx = F.expr(
        f"cast(greatest(length(bin(greatest(__sv, 1))) - {1 + s}, 0) "
        f"as int)"
    ).alias("__shift")
    gsel = [F.col(c) for c in g]
    return (
        df.where(F.col(col).isNotNull())
        .select(*gsel, _scaled(col, scale).alias("__sv"))
        .select(*gsel, F.when(guard.isNull(), F.col("__sv")).alias("__sv"))
        .select(*gsel, "__sv", idx)
        .select(
            *gsel,
            (
                F.col("__shift").cast("long")
                * F.lit(1 << (s + 1)).cast("long")
                + F.expr("shiftright(__sv, __shift)")
            ).alias("idx"),
        )
        .groupBy(*g, "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_value_sketches(
    *sketches: DataFrame, group_cols: "list[str] | None" = None
) -> DataFrame:
    """Union (idx, cnt) sketches built with the SAME (s, scale) into
    one: idx-wise count sum. sketch(A) ⊔ sketch(B) == sketch(A ∪ B)
    EXACTLY (counts are additive), so per-shard / per-day sketches roll
    up lossless-ly without re-touching the data. Grouped sketches merge
    group-wise (pass the same group_cols)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    g = _gcols(group_cols)
    out = sketches[0]
    for sk in sketches[1:]:
        out = out.unionByName(sk)
    return out.groupBy(*g, "idx").agg(F.sum("cnt").alias("cnt"))


def sketch_quantiles(
    sketch: DataFrame,
    qs: "list[float]",
    s: int = 7,
    scale: int = 1,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Type-1 quantile estimates from a (idx, cnt) sketch: for each q,
    the midpoint of the bucket holding the rank-ceil(q*n) value (rank
    clamped to [1, n]). The sketch is at most ~64 * 2^(s+1) rows, so
    the cumulative walk is a single tiny unpartitioned window — driver-
    bounded by construction, never data-sized. Estimates are exact for
    values below 2^(s+1) and within ~2^-(s+1) relative error above.

    Output: (q double, est double, n long), one row per requested q,
    est on the ORIGINAL value scale (midpoint / scale, 6dp-rounded).
    For a grouped sketch pass the same group_cols: one row per (group,
    q), the cumulative walk partitioned per group (still bounded — each
    group's sketch is <= ~64 * 2^(s+1) rows)."""
    from pyspark.sql import Window

    _check_s(s)
    g = _gcols(group_cols)
    if not qs:
        raise ValueError("qs must name at least one quantile")
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    w = (
        Window.partitionBy(*[F.col(c) for c in g])
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sketch.select(
        *[F.col(c) for c in g], "idx", F.sum("cnt").over(w).alias("cum")
    )
    total = sketch.groupBy(*g).agg(F.sum("cnt").alias("n"))
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    ranks = total.crossJoin(qdf).select(
        *[F.col(c) for c in g],
        "q",
        "n",
        F.least(
            F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1)),
            F.col("n"),
        ).alias("r"),
    )
    # rename the cum side instead of DataFrame aliases: both sides can
    # derive from the SAME relation (a memory-sink view, a cached
    # sketch), where alias-qualified attributes hit Spark's self-join
    # ambiguity; distinct names cannot
    cum2 = _prefix_group_cols(cum, g, "__sq_").withColumnsRenamed(
        {"idx": "__sq_idx", "cum": "__sq_cum"}
    )
    cond = F.col("__sq_cum") >= F.col("r")
    for c in g:
        # eqNullSafe: a NULL group key is a real group (e.g. lang NULL)
        cond = F.col(c).eqNullSafe(F.col(f"__sq_{c}")) & cond
    hit = (
        ranks.join(cum2, cond)
        .groupBy(*g, "q", "n")
        .agg(F.min("__sq_idx").alias("idx"))
    )
    # decode stays in integer ops end-to-end (shifts, never float
    # division) — the same cross-engine-exactness rule as the encode.
    # mid = lo + (bucket_width - 1)/2, NOT (lo + hi)/2: summing lo and
    # hi first overflows signed 64-bit for buckets above ~2^62 (Spark
    # wraps negative, DuckDB raises — engine divergence); this form
    # stays in range for any value the encode itself can represent
    # the 1 literal MUST be bigint: shiftleft on an int masks the shift
    # amount to 5 bits (Java semantics), so exponents >= 31 crash under
    # ANSI or silently wrap — bigint shifts use the full 6-bit window
    mid = F.expr(
        f"shiftleft(idx % {1 << (s + 1)}, "
        f"cast(shiftright(idx, {s + 1}) as int)) "
        f"+ shiftright(shiftleft(cast(1 as bigint), "
        f"cast(shiftright(idx, {s + 1}) as int)) - 1, 1)"
    )
    return hit.select(
        *[F.col(c) for c in g],
        "q",
        F.round(mid.cast("double") / F.lit(float(scale)), 6).alias("est"),
        F.col("n").cast("long").alias("n"),
    )


def approx_quantiles(
    df: DataFrame,
    col: str,
    qs: "list[float]",
    s: int = 7,
    scale: int = 1,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """value_sketch |> sketch_quantiles: deterministic approximate
    quantiles of a column in one bounded aggregation — the sort-free
    distribution report (p50/p95/p99 of doc length, token counts,
    scores) a 100 TB curation run wants next to approx_distinct; one
    row per (group, q) with group_cols (t18's per-language report
    without its per-stratum sorts)."""
    return sketch_quantiles(
        value_sketch(df, col, s=s, scale=scale, group_cols=group_cols),
        qs,
        s=s,
        scale=scale,
        group_cols=group_cols,
    )


def corpus_report(
    df: DataFrame,
    group_cols: "list[str]",
    distinct_cols: "list[str]",
    value_col: str,
    qs: "list[float]" = (0.5, 0.95, 0.99),
    b: int = 12,
    s: int = 7,
    scale: int = 1,
) -> DataFrame:
    """The per-domain corpus report in one operator: for each group,
    row count, sum of `value_col`, the HLL distinct estimate of
    `distinct_cols`, and the HDR quantiles of `value_col` — the
    "dataset card" table (docs / bytes / distinct texts / length
    distribution per source) a 100 TB curation run publishes, without
    a global sort or one job per domain.

    Output: (group_cols..., n_rows, value_sum, distinct_est,
    p<q>...) — quantile columns named p50/p95/p99 for the default qs.

    Plan shape: three map-side-combinable aggregation passes over the
    input (plain stats, register sketch, bucket histogram — different
    grouping shapes, so they cannot fuse), each reading only its own
    columns (column pruning applies per branch); every branch is
    bounded per group and the final assembly joins <= groups-sized
    relations with null-safe keys (a NULL group is a real group).
    NULL `value_col` rows count in n_rows but not in the histogram
    (the value_sketch convention) — a group whose values are ALL NULL
    still reports, with NULL value_sum and quantile columns.
    `value_sum` keeps the native sum type (a long column sums to long,
    a double column to double — never truncated)."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    g = list(group_cols)
    base = df.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col(value_col)).alias("value_sum"),
    )
    est = sketch_estimate(
        distinct_sketch(df, distinct_cols, b=b, group_cols=g),
        b=b,
        group_cols=g,
    ).select(*g, F.col("est").alias("distinct_est"))
    qrows = sketch_quantiles(
        value_sketch(df, value_col, s=s, scale=scale, group_cols=g),
        list(qs),
        s=s,
        scale=scale,
        group_cols=g,
    )
    piv = qrows.groupBy(*g).agg(
        *[
            F.max(F.when(F.col("q") == float(q), F.col("est"))).alias(
                quantile_col_name(q)
            )
            for q in qs
        ]
    )

    def _nsjoin(left: DataFrame, right: DataFrame) -> DataFrame:
        # left join: a group can be missing from a sketch branch (all
        # its values NULL -> no histogram rows) but must still report
        r = _prefix_group_cols(right, g, "__cr_")
        cond = None
        for c in g:
            e = F.col(c).eqNullSafe(F.col(f"__cr_{c}"))
            cond = e if cond is None else (cond & e)
        return left.join(r, cond, "left").drop(
            *[f"__cr_{c}" for c in g]
        )

    return _nsjoin(_nsjoin(base, est), piv)


# ---------------------------------------------------------------------------
# Count-min sketch (frequency / heavy hitters)
# ---------------------------------------------------------------------------

#: h1 + i*h2 stays < 2^36 for depth <= 16 (both halves are 32-bit) —
#: BIGINT-safe with no modular wraparound to reason about
_CMS_MAX_DEPTH = 16


def _check_cms(depth: int, width_bits: int) -> None:
    if not (1 <= depth <= _CMS_MAX_DEPTH):
        raise ValueError(
            f"depth must be in [1, {_CMS_MAX_DEPTH}], got {depth}"
        )
    if not (4 <= width_bits <= 20):
        raise ValueError(
            f"width_bits must be in [4, 20] (w = 2^width_bits buckets; "
            f"beyond 2^20 the 'sketch' stops being small), got "
            f"{width_bits}"
        )


def count_min_sketch(
    df: DataFrame,
    cols: "list[str]",
    depth: int = 4,
    width_bits: int = 12,
    seed: str = "cms",
    weight_col: "str | None" = None,
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Build the count-min sketch of the frequency of `cols` values
    (Cormode & Muthukrishnan 2005): a depth x 2^width_bits counter
    matrix where each occurrence increments one bucket per row, chosen
    by Kirsch-Mitzenmacher double hashing h1 + i*h2 over the repo's
    md5-derived 32-bit halves — the same bit-deterministic,
    engine-portable hash family as distinct_sketch and the
    decontamination bloom filter, so the DuckDB oracle replays every
    counter exactly.

    Why it earns a place next to the exact x12 count at 100 TB: the
    exact token count shuffles EVERY distinct key; the sketch is ONE
    map-side-combinable aggregation whose output is bounded at
    depth * 2^width_bits rows no matter the vocabulary, and two
    sketches MERGE by counter-wise ADD (merge_cms) — per-shard /
    per-day frequency state rolls up to the corpus answer without
    touching the data again. The estimate (cms_estimate) is one-sided:
    est >= true count always, with the overestimate bounded by
    collisions (e*N/w with probability 1 - 1/e^depth).

    NULL values in `cols` coalesce to the chr(1) sentinel before the
    concat (the distinct_sketch discipline — NULL is a countable
    value, and the key string stays bit-identical to the SQL oracle's
    ``||`` concatenation). `weight_col` (exact BIGINT add; integral
    types only — a fractional column is refused rather than silently
    truncated) turns the sketch into a weighted-frequency summary,
    e.g. token counts weighted by upsampling multiplicity. Negative
    weights are accepted (deletion/correction streams) but void the
    one-sided est >= true guarantee — CMS counters are only an upper
    bound when every update is non-negative.

    Output: (group_cols..., row int, bucket long, cnt long), at most
    depth * 2^width_bits rows per group, mergeable with merge_cms.
    With group_cols, one independent sketch per group (per-domain /
    per-language frequency state in a single pass)."""
    _check_cms(depth, width_bits)
    if not cols:
        raise ValueError("cols must name at least one column")
    g = _gcols(group_cols)
    w = 1 << width_bits
    h = F.md5(_cms_key(cols, seed))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    if weight_col:
        # r13 ADVICE: cast('long') on a fractional weight column would
        # TRUNCATE silently, voiding the exact-BIGINT contract — refuse
        # non-integral types loudly. NEGATIVE integral weights are
        # accepted (deletions/corrections) but void the one-sided
        # est >= true guarantee; documented in the docstring rather
        # than filtered, because dropping rows would change the sums.
        wt_type = df.schema[weight_col].dataType.simpleString()
        if wt_type not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"weight_col {weight_col!r} must be an integral type "
                f"(the sketch sums exact BIGINTs; casting {wt_type} "
                f"to long would silently truncate) — round or scale "
                f"the weights to integers first"
            )
        wt = F.col(weight_col).cast("long")
    else:
        wt = F.lit(1).cast("long")
    buckets = F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(w)) for i in range(depth)]
    )
    ex = df.select(
        *g, wt.alias("__w"), F.posexplode(buckets).alias("row", "bucket")
    )
    return ex.groupBy(*g, "row", "bucket").agg(
        F.sum("__w").alias("cnt")
    )


def _cms_key(cols: "list[str]", seed: str):
    """The seeded, NULL-sentineled key string both the build and the
    probe hash — ONE definition so they cannot drift."""
    return F.concat_ws(
        "|",
        F.lit(seed),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x01"))
            for c in cols
        ],
    )


def merge_cms(
    *sketches: DataFrame, group_cols: "list[str] | None" = None
) -> DataFrame:
    """Union count-min sketches built with the SAME (depth, width_bits,
    seed, cols schema) into one: counter-wise ADD. cms(A) + cms(B) ==
    cms(A ∪ B) EXACTLY (each occurrence lands in the same buckets
    either way and addition is associative/commutative) — the lossless
    shard roll-up. Grouped sketches merge group-wise."""
    if not sketches:
        raise ValueError("need at least one sketch")
    g = _gcols(group_cols)
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*g, "row", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    cols: "list[str]",
    depth: int = 4,
    width_bits: int = 12,
    seed: str = "cms",
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """Point-query the sketch for each distinct key in `keys`:
    est = MIN over the depth rows of that key's bucket counter
    (missing counter = 0). One-sided: est >= the true (weighted)
    count, exactly equal when none of the key's depth buckets
    collided.

    Plan shape: the probe set is keys-sized (distinct-ed first — each
    key hashes once). UNGROUPED, the sketch side is constant-bounded
    (depth * 2^width_bits rows), so the join force-broadcasts the
    SKETCH at any corpus scale — frequency answers for ad-hoc key sets
    without re-reading the corpus. With group_cols, `keys` must carry
    the group columns and each key is estimated against its own
    group's counters (null-safe: a NULL group is a real group) — the
    sketch is then depth * 2^width_bits rows PER GROUP (up to 16·2^20
    per group), so high-cardinality groups could blow a forced
    broadcast; grouped probes leave the strategy to AQE, which still
    broadcasts when the measured size fits (ADVICE r13).

    Output: (group_cols..., cols..., est long)."""
    _check_cms(depth, width_bits)
    if not cols:
        raise ValueError("cols must name at least one column")
    g = _gcols(group_cols)
    w = 1 << width_bits
    k = keys.select(*g, *cols).distinct()
    h = F.md5(_cms_key(cols, seed))
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    buckets = F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(w)) for i in range(depth)]
    )
    ex = k.select(
        *g, *cols, F.posexplode(buckets).alias("row", "bucket")
    )
    sk = _prefix_group_cols(
        sketch.withColumnRenamed("row", "__s_row")
        .withColumnRenamed("bucket", "__s_bucket"),
        g, "__s_",
    )
    cond = (F.col("row") == F.col("__s_row")) & (
        F.col("bucket") == F.col("__s_bucket")
    )
    for c in g:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__s_{c}"))
    joined = ex.join(F.broadcast(sk) if not g else sk, cond, "left")
    return joined.groupBy(*g, *cols).agg(
        F.min(
            F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
        ).alias("est")
    )
