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
