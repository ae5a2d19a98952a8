"""Shared plumbing for the persisted index stores (MinHash, SimHash,
embedding, BM25, ANN IVF): the `_meta` read + layout guard every
probe/search/extend runs first. ONE definition on purpose — a
load-bearing guard duplicated per store could drift (one copy gaining
a check the others miss).

Durability contract, stated once for every store: build is
mode=overwrite and safely re-runnable; EXTEND is append-only and NOT
atomic across a store's relations — a job that dies mid-extend leaves
a partial segment (and re-running double-appends what already landed).
On a failed extend, rebuild the index; the transactional write surface
in this repo is the txlog gold store (sinks/txlog.py), and a
segment-manifest commit for the index families is a recorded ROADMAP
candidate.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def read_meta(
    spark: SparkSession,
    path: str,
    expected_layout: str,
    kind: str = "index",
):
    """Read a store's single-row `_meta` and refuse a tree whose layout
    stamp differs (appending into or probing a different physical
    layout corrupts / misreads the store)."""
    rows = spark.read.parquet(path + "/_meta").collect()
    if len(rows) != 1:
        raise ValueError(
            f"corrupt {kind} at {path}: _meta has {len(rows)} rows"
        )
    meta = rows[0]
    layout = getattr(meta, "layout", None)
    if layout != expected_layout:
        raise ValueError(
            f"{kind} at {path} has layout {layout!r}; this code reads "
            f"{expected_layout!r} — rebuild the index (a mismatched "
            f"layout would corrupt the store)"
        )
    return meta
