"""Temporal joins the reference (and stock Spark SQL) lack as operators:
AS-OF join and RANGE (interval) join — the two standard time-series
shapes a clinical/event pipeline asks for ("the last lab value before
this visit", "every event inside this dosing window").

Spark-first designs, no UDFs:

  asof_join — the naive formulation is a per-left-row MAX over an
  inequality join (quadratic per key). Instead: UNION both sides tagged,
  ONE window ordered by (ts, side) per key, and `last(payload,
  ignorenulls=True)` carries the most recent right payload forward onto
  each left row. One hash shuffle on the key, linear work, no join node
  at all — the plan survives any key cardinality. (Same algorithm Pandas
  merge_asof runs per group, expressed as a distributed window.)

  range_join — Spark handles key + range predicates as a regular join
  with a post-filter, which is fine when an equi-key exists; with no
  (or a low-selectivity) key it degrades to BroadcastNestedLoopJoin.
  The scale path BUCKETIZES time: each interval explodes to the coarse
  bins it covers, each event maps to its bin, and the join is a plain
  equi-join on (key, bin) + exact-range filter. Bin width trades
  duplication (long intervals explode to more bins) against join
  fan-out; intervals are deduped by construction since an event's bin
  matches an interval exactly once (the event's own bin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_RTS = "__asof_rts"
_PAY = "__asof_pay"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the payload of the single right row with
    the greatest right_ts <= left_ts (direction='backward', inclusive; or
    smallest right_ts >= left_ts for 'forward') within the same `on` key —
    NULLs when no such row exists (left-join semantics).

    tolerance_s drops matches further than that many seconds away.
    Right payload columns that collide with left names get `suffix`.
    Rows on the right should be unique per (key, ts); with duplicates the
    carried payload is the window-order-last one (pre-aggregate to make
    that deterministic).

    All payload columns ride in ONE struct carried by a single
    last(struct, ignorenulls=True): the struct is non-null for every
    right row even when its fields are NULL, so a matched row's NULL
    payload values propagate as NULLs (instead of leaking a stale
    non-null value from an older row) and multi-column payloads always
    come from the SAME right row — exactly DuckDB ASOF JOIN / pandas
    merge_asof semantics."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_ts = right_ts or left_ts
    payload = [c for c in right.columns if c not in on and c != right_ts]
    renames = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }

    l_side = left.withColumn(_SIDE, F.lit(1)).withColumn(
        "__asof_ts", F.col(left_ts)
    )
    # one struct per right row — non-null even when every field is NULL,
    # so last(..., ignorenulls) selects by ROW, not per-column
    r_side = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        F.struct(
            F.col(right_ts).alias(_RTS),
            *[F.col(c).alias(renames[c]) for c in payload],
        ).alias(_PAY),
    ).withColumn(_SIDE, F.lit(0)).where(
        # a NULL-time right row can never legitimately match — and its
        # payload STRUCT is non-null, so if it stayed it would sort to
        # the head of every window (nulls first) and become a universal
        # fallback match for every otherwise-unmatched left row
        F.col("__asof_ts").isNotNull()
    )
    u = l_side.unionByName(r_side, allowMissingColumns=True)

    # nulls FIRST under either direction: a left row with a NULL time
    # matches nothing. The asc default already sorts nulls first, but
    # desc defaults to nulls LAST — which would seat every NULL-ts left
    # row after the whole right side and hand it the min-ts payload
    # (regression-pinned in tests)
    ts_ord = F.col("__asof_ts").asc_nulls_first()
    if direction == "forward":
        ts_ord = F.col("__asof_ts").desc_nulls_first()
    # right rows (side 0) sort before left rows at equal ts → inclusive
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_ord, F.col(_SIDE))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pay = F.last(_PAY, ignorenulls=True).over(w)
    out = (
        u.select("*")
        .select(*left.columns, _SIDE, pay.alias(_PAY))
        .where(F.col(_SIDE) == 1)
    )
    pay = F.col(_PAY)
    if tolerance_s is not None:
        gap = F.abs(
            F.col(left_ts).cast("double") - pay.getField(_RTS).cast("double")
        )
        keep = pay.getField(_RTS).isNotNull() & (gap <= F.lit(float(tolerance_s)))
        out = out.select(
            *left.columns,
            *[
                F.when(keep, pay.getField(renames[c])).alias(renames[c])
                for c in payload
            ],
        )
    else:
        out = out.select(
            *left.columns,
            *[pay.getField(renames[c]).alias(renames[c]) for c in payload],
        )
    return out


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_width_s: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each event row to every interval row with the same `on` key
    and start <= ts < end (half-open, the streaming-window convention).

    bin_width_s=None lets Spark plan the key equi-join with the range as
    a join filter — right whenever the key carries the selectivity. With
    bin_width_s set, intervals explode to the coarse time bins they
    overlap and events join on (key, bin) — the scale path when keys are
    few/hot or absent (pass on=[]): fan-out becomes events × the one bin
    they land in, never events × intervals. Exact semantics either way;
    an (event, interval) pair matches in exactly one bin (the event's),
    so no dedup pass is needed."""
    if how != "inner":
        raise ValueError("range_join supports inner joins")
    ts, start, end = F.col(ts_col), F.col(start_col), F.col(end_col)
    rng = (start <= ts) & (ts < end)
    if bin_width_s is None:
        cond = rng
        for k in on:
            cond = (events[k] == intervals[k]) & cond
        out = events.join(intervals, cond, "inner")
        for k in on:
            out = out.drop(intervals[k])
        return out

    width = int(bin_width_s)
    ev_bin = F.floor(ts.cast("double") / width).cast("long").alias("__bin")
    iv_bins = F.explode(
        F.sequence(
            F.floor(start.cast("double") / width).cast("long"),
            # end is exclusive: an interval ending exactly on a bin edge
            # does not reach into that bin
            F.floor(
                (end.cast("double") - F.lit(1e-6)) / width
            ).cast("long"),
        )
    ).alias("__bin")
    e = events.select("*", ev_bin)
    i = intervals.select("*", iv_bins)
    cond = e["__bin"] == i["__bin"]
    for k in on:
        cond = (e[k] == i[k]) & cond
    out = e.join(i, cond, "inner").where(rng).drop("__bin")
    for k in on:
        out = out.drop(i[k])
    return out
