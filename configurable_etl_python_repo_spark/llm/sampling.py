"""Deterministic sampling for training-data curation.

`df.sample()` is seed-stable only for a fixed partitioning — repartition
the corpus (or re-run after compaction) and the sample changes, which is
unacceptable for a reproducible 100 TB curation run. These operators
sample by CONTENT: a row is kept iff the md5 of its key falls under the
fraction cutoff, so the decision is a pure function of (key, seed) —
independent of partitioning, cluster size, execution order, or engine
(the DuckDB oracle reproduces it bit-for-bit). Zero shuffles: both
operators are a scan-stage filter.

The first 8 hex chars of md5(seed|key) read as a uniform 32-bit integer;
keep iff value < fraction * 2^32. Exact integer threshold — no float
comparison ambiguity at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1 << 32


def _bucket(key_col, seed: str):
    """Uniform 32-bit integer derived from the row key: the first 8 hex
    chars of md5(seed|key)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), key_col.cast("string"))), 1, 8),
        16, 10,
    ).cast("long")


def _cutoff(fraction: float) -> int:
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(round(fraction * _SCALE))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Keep ~fraction of rows, chosen deterministically by key content.
    Same (key, seed) → same decision on any cluster, any partitioning,
    any engine. Pure scan-stage filter (no shuffle, no state)."""
    return df.where(_bucket(F.col(key_col), seed) < F.lit(_cutoff(fraction)))


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Resample to a target domain mixture — the data-mixing step of a
    pre-training pipeline (e.g. "2 parts web : 1 part code : 3 parts
    books"). Keeps the LARGEST corpus achievable at exactly the requested
    integer weight ratios: with W = Σw and per-stratum counts n_s, the
    binding stratum caps the total at T* = min_s ⌊n_s·W / w_s⌋, each
    stratum targets q_s = ⌊w_s·T* / W⌋ rows (the binding stratum keeps
    ~100%), and rows are admitted by the deterministic md5 bucket under
    the integer cutoff ⌊q_s·2^20 / n_s⌋. All arithmetic is BIGINT — no
    float boundary, so the DuckDB oracle reproduces the sample row-for-row
    (exact for n_s < 2^43 with the 20-bit bucket). Strata absent from
    `weights` are dropped (weight 0).

    Plan shape: one tiny per-stratum count (map-side partial, output =
    #strata rows), a scalar min over it, and a broadcast join of the
    cutoffs back onto the scan — the corpus itself is never shuffled.
    """
    if not weights:
        raise ValueError("weights must be a non-empty {stratum: int} map")
    for v, w in weights.items():
        if not isinstance(w, int) or w <= 0:
            raise ValueError(f"weight for {v!r} must be a positive int, got {w!r}")

    strata = F.col(strata_col)
    wcol = None
    for value, w in sorted(weights.items()):
        cond, val = strata == F.lit(value), F.lit(w).cast("long")
        wcol = F.when(cond, val) if wcol is None else wcol.when(cond, val)
    in_mix = df.where(strata.isin(*weights)).withColumn("__w", wcol)

    counts = in_mix.groupBy(strata_col, "__w").agg(
        F.count(F.lit(1)).alias("__n")
    )
    # W over strata PRESENT in the data (an absent stratum can't bind);
    # T* = min_s floor(n_s*W/w_s); both are one tiny scalar row
    # (column names differ beyond case: resolution is case-insensitive)
    wsum = counts.agg(F.sum("__w").alias("__wtot"))
    totals = (
        counts.crossJoin(F.broadcast(wsum))
        .agg(
            F.max("__wtot").alias("__wtot"),
            F.min(F.expr("__n * __wtot div __w")).alias("__tstar"),
        )
    )
    cutoffs = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            strata_col,
            F.expr(f"(__w * __tstar div __wtot) * {1 << 20} div __n")
            .alias("__cutoff"),
        )
    )
    bucket20 = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(key_col).cast("string"))),
            1, 5,
        ),
        16, 10,
    ).cast("long")
    return (
        in_mix.drop("__w")
        .join(F.broadcast(cutoffs), on=strata_col, how="inner")
        .where(bucket20 < F.col("__cutoff"))
        .drop("__cutoff")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    key_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value keeps its
    own fraction (e.g. downsample dominant languages, keep all of rare
    ones). Strata not listed keep default_fraction. The per-stratum
    cutoff compiles to a CASE chain — still a pure scan-stage filter."""
    cut = F.lit(_cutoff(default_fraction))
    for value, frac in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_cutoff(frac))
        ).otherwise(cut)
    return df.where(_bucket(F.col(key_col), seed) < cut)
