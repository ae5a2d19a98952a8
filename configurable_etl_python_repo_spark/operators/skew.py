"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in the session factory) handles most
skew at runtime; this module is the explicit fallback for the cases AQE
can't fix — e.g. one pathological hot key in a large-large join, or a
deliberately pre-partitioned layout.

`salted_left_join` implements classic key salting: the skewed (left) side
gets a random salt in [0, salt); the right side is replicated `salt` times
(explode over the salt range); the join key becomes (key, salt), spreading
each hot key over `salt` reducers. Replication cost is |right| × salt, so
use it when the right side is much smaller than the left but too big to
broadcast."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__cetl_salt__"


def salted_left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "left",
) -> DataFrame:
    """Equi-join with salting on the left side's hot keys.

    Deterministic output (same rows as a plain join); only the physical
    distribution changes. rand() is evaluated per-row at runtime — it never
    affects which rows match, only which reducer handles them.

    Only left/inner are supported: for right/full joins the salt-replicated
    right side would emit `salt` null-extended copies of every unmatched
    right key."""
    if how not in ("left", "inner"):
        raise ValueError(
            f"salted_left_join supports how in {{'left','inner'}}, got {how!r}"
        )
    lsalted = left.withColumn(_SALT, (F.rand(seed=42) * salt).cast("int"))
    rsalted = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lsalted.join(rsalted, on=[*on, _SALT], how=how)
    return out.drop(_SALT)


def top_keys(df: DataFrame, key: str, n: int = 10) -> list[tuple]:
    """Diagnostic: the n heaviest key values with counts — decide whether
    salting/broadcast isolation is warranted before paying for it."""
    return [
        (r[key], r["cnt"])
        for r in df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc()).limit(n).collect()
    ]
