"""Store-layout scale points the r9 verdict asked for, measured at
sf0.1 (run ALONE — timing):

1. SEGMENT-COUNT COST: the same corpus indexed as 1 segment (one
   build) vs 50 segments (build + 49 extends) vs 50-then-compacted —
   min-of-N probe/search times for the BM25 index and the MinHash
   index. This is the number that justifies compact_index: the
   50-segment read amplification a year of daily extends accrues, and
   how much one compaction claws back.
2. EMBEDDING STORE MODES: probe time under the AUTO-SIZED centroid
   default (n_centroids=None -> ceil(N/1024)) vs the d18 pinned-8
   fixture, and exact (array<double>) vs quantize=True (int8+scale)
   store size on disk + probe time in the dequantized domain.

3. TOMBSTONE + SNAPSHOT COST (late-r10): probe time with 0 / 1 / 20
   accumulated tombstone segments (daily takedowns before the next
   compaction) and after the compaction that purges them — the number
   that justifies 'compact after takedown bursts'; and an
   as_of_version=1 snapshot probe vs the latest-version probe on the
   same mutated store (the snapshot resolves ONE pinned manifest, so
   it should cost the same or less — fewer segments).

Output: one JSON object on stdout (recorded into BENCH_sf1_r10.json
alongside the scale_smoke exponents).

    python scripts/store_scale.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LSH = dict(n=3, bands=8, rows_per_band=2)
_SEGS = 50
_SAMPLES = 5


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _best(fn, samples: int = _SAMPLES) -> float:
    fn()  # warm
    best = float("inf")
    for _ in range(samples):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--samples", type=int, default=_SAMPLES)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.llm import _store as ST
    from configurable_etl_python_repo_spark.llm.dedup_index import (
        dedup_against_index,
        embedding_against_index,
        embedding_build_index,
        minhash_build_index,
        minhash_extend_index,
    )
    from configurable_etl_python_repo_spark.llm.search import (
        bm25_build_index,
        bm25_extend_index,
        bm25_search_index,
    )

    spark = get_spark("store_scale")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    batch = docs.where(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    vbatch = emb.where(F.col("vec_id") % 97 == 0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    root = tempfile.mkdtemp(prefix="store_scale_")
    report: dict = {"sf": args.sf, "samples": args.samples,
                    "segments": _SEGS}

    # --- 1a. BM25: 1 segment vs 50 vs compacted --------------------------
    one = os.path.join(root, "bm_one")
    many = os.path.join(root, "bm_many")
    bm25_build_index(docs, one, term_buckets=64)
    parts = [docs.where(F.col("doc_id") % _SEGS == i)
             for i in range(_SEGS)]
    bm25_build_index(parts[0], many, term_buckets=64)
    for p in parts[1:]:
        bm25_extend_index(p, many)
    q = " ".join(
        r.w for r in docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        ).where(F.length("w") > 3).limit(4).collect()
    )
    t_one = _best(lambda: _noop(bm25_search_index(spark, one, q, k=10)),
                  args.samples)
    t_many = _best(lambda: _noop(bm25_search_index(spark, many, q, k=10)),
                   args.samples)
    ST.compact_index(spark, many)
    t_compacted = _best(
        lambda: _noop(bm25_search_index(spark, many, q, k=10)),
        args.samples,
    )
    report["bm25_search"] = {
        "seg1_s": t_one, f"seg{_SEGS}_s": t_many,
        "compacted_s": t_compacted,
        "seg_penalty": round(t_many / max(t_one, 1e-3), 2),
        "compact_recovery": round(t_compacted / max(t_one, 1e-3), 2),
    }

    # --- 1b. MinHash probe: 1 segment vs 50 vs compacted ----------------
    mone = os.path.join(root, "mh_one")
    mmany = os.path.join(root, "mh_many")
    minhash_build_index(docs, mone, **_LSH)
    minhash_build_index(parts[0], mmany, **_LSH)
    for p in parts[1:]:
        minhash_extend_index(p, mmany)
    p_one = _best(
        lambda: _noop(dedup_against_index(spark, mone, batch,
                                          threshold=0.5)),
        args.samples,
    )
    p_many = _best(
        lambda: _noop(dedup_against_index(spark, mmany, batch,
                                          threshold=0.5)),
        args.samples,
    )
    ST.compact_index(spark, mmany)
    p_compacted = _best(
        lambda: _noop(dedup_against_index(spark, mmany, batch,
                                          threshold=0.5)),
        args.samples,
    )
    report["minhash_probe"] = {
        "seg1_s": p_one, f"seg{_SEGS}_s": p_many,
        "compacted_s": p_compacted,
        "seg_penalty": round(p_many / max(p_one, 1e-3), 2),
        "compact_recovery": round(p_compacted / max(p_one, 1e-3), 2),
    }

    # --- 2. Embedding store: auto-centroid default; exact vs int8 -------
    auto = os.path.join(root, "emb_auto")
    pin8 = os.path.join(root, "emb_pin8")
    quant = os.path.join(root, "emb_q8")
    embedding_build_index(emb, auto)  # THE policy default
    embedding_build_index(emb, pin8, n_centroids=8)  # d18 fixture pin
    embedding_build_index(emb, quant, quantize=True)  # auto + int8
    n_auto = spark.read.parquet(auto + "/_meta").collect()[0].n_centroids
    np_auto = min(2, int(n_auto))  # tiny fixtures auto-size to 1 list
    e_auto = _best(
        lambda: _noop(embedding_against_index(spark, auto, vbatch,
                                              threshold=0.9,
                                              n_probe=np_auto)),
        args.samples,
    )
    e_pin8 = _best(
        lambda: _noop(embedding_against_index(spark, pin8, vbatch,
                                              threshold=0.9)),
        args.samples,
    )
    e_quant = _best(
        lambda: _noop(embedding_against_index(spark, quant, vbatch,
                                              threshold=0.9,
                                              n_probe=np_auto)),
        args.samples,
    )
    sz = lambda p: _tree_bytes(os.path.join(p, "vectors"))  # noqa: E731
    report["embedding_store"] = {
        "auto_n_centroids": int(n_auto),
        "corpus_vectors": emb.count(),
        "probe_auto_s": e_auto,
        "probe_pinned8_s": e_pin8,
        "probe_quantized_s": e_quant,
        "exact_bytes": sz(auto),
        "quantized_bytes": sz(quant),
        "size_ratio": round(sz(auto) / max(sz(quant), 1), 2),
    }

    # --- 3. Tombstone + snapshot cost ------------------------------------
    tomb = os.path.join(root, "mh_tomb")
    minhash_build_index(docs, tomb, **_LSH)                      # v1
    t_clean = _best(
        lambda: _noop(dedup_against_index(spark, tomb, batch,
                                          threshold=0.5)),
        args.samples,
    )
    ids = docs.select(F.col("doc_id").alias("id"))
    ST.delete_from_index(ids.where(F.col("id") % 101 == 0), tomb)  # v2
    t_1seg = _best(
        lambda: _noop(dedup_against_index(spark, tomb, batch,
                                          threshold=0.5)),
        args.samples,
    )
    for i in range(1, 20):  # 19 more daily takedown batches
        ST.delete_from_index(
            ids.where(F.col("id") % 2011 == i), tomb
        )
    t_20seg = _best(
        lambda: _noop(dedup_against_index(spark, tomb, batch,
                                          threshold=0.5)),
        args.samples,
    )
    t_asof1 = _best(
        lambda: _noop(dedup_against_index(spark, tomb, batch,
                                          threshold=0.5,
                                          as_of_version=1)),
        args.samples,
    )
    ST.compact_index(spark, tomb)
    t_purged = _best(
        lambda: _noop(dedup_against_index(spark, tomb, batch,
                                          threshold=0.5)),
        args.samples,
    )
    report["tombstone_and_snapshot"] = {
        "probe_no_deletes_s": t_clean,
        "probe_1_tombstone_seg_s": t_1seg,
        "probe_20_tombstone_segs_s": t_20seg,
        "probe_as_of_v1_s": t_asof1,
        "probe_after_compaction_s": t_purged,
        "tombstone20_penalty": round(t_20seg / max(t_clean, 1e-3), 2),
        "asof_vs_latest": round(t_asof1 / max(t_20seg, 1e-3), 2),
        "compact_recovery": round(t_purged / max(t_clean, 1e-3), 2),
    }

    # --- 4. MAINTAIN INDEX policy (r11): before/after one policy tick ----
    # 16 daily extends + a takedown reach both default triggers
    # (segments >= 16, tombstone share touched); ONE maintain_index
    # call compacts + vacuums — the number that justifies wiring
    # maintain_every_n_epochs into the admission stream.
    mnt = os.path.join(root, "mh_maint")
    mparts = [docs.where(F.col("doc_id") % 16 == i) for i in range(16)]
    minhash_build_index(mparts[0], mnt, **_LSH)
    for p in mparts[1:]:
        minhash_extend_index(p, mnt)
    ST.delete_from_index(ids.where(F.col("id") % 101 == 0), mnt)
    m_before = _best(
        lambda: _noop(dedup_against_index(spark, mnt, batch,
                                          threshold=0.5)),
        args.samples,
    )
    t0 = time.time()
    receipt = ST.maintain_index(spark, mnt, retention_s=0.0)
    maint_wall = round(time.time() - t0, 3)
    assert receipt["compacted"], receipt
    m_after = _best(
        lambda: _noop(dedup_against_index(spark, mnt, batch,
                                          threshold=0.5)),
        args.samples,
    )
    report["maintain_policy"] = {
        "segments_before": 17, "tombstones_before": 1,
        "probe_before_s": m_before,
        "maintain_call_s": maint_wall,
        "probe_after_s": m_after,
        "receipt": receipt,
        "probe_recovery": round(m_after / max(m_before, 1e-3), 2),
    }

    print(json.dumps(report, indent=1))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
