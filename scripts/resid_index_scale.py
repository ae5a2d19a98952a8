"""Persisted residual-PQ index (n11) scale points at sf0.1, run ALONE:

- BUILD + SEARCH wall for residual vs global persisted PQ indexes at
  the same code budget (m=8, k=64) over the full embeddings table
  (same-box relative numbers; min-of-N noop writes for search).
- INDEX SIZE on disk (code rows partitioned by cid) — residual and
  global store the identical (cid, id, codes) shape, so the sizes
  should match; the point is recorded to prove the residual accuracy
  gain is storage-free.
- RECALL vs exact cosine top-5 on the clustered synthetic fixture
  (the regime the r12 one-shot measurement used): residual vs global
  at the equal byte budget through the PERSISTED path — the n10 claim
  re-verified through the store.

Output: one JSON object on stdout (recorded into BENCH_sf1_r13.json).

    python scripts/resid_index_scale.py [--sf /root/testdata/sf0.1]
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

_SAMPLES = 5


def _tree_bytes(path: str, rel: str = "") -> int:
    total = 0
    for root, _, files in os.walk(os.path.join(path, rel)):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.llm import similarity as S

    spark = get_spark("resid_index_scale")
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    queries = emb.where(F.col("vec_id") < 32)
    root = tempfile.mkdtemp(prefix="resid_index_scale_")
    out: dict = {
        "protocol": (
            f"scripts/resid_index_scale.py at {args.sf} ({n} vectors; "
            f"m=8, k=64, n_centroids=64, n_probe=4, k_top=5, 32 "
            f"queries; min-of-{_SAMPLES} noop writes, box idle)"
        ),
    }
    kw = dict(dim=64, m_subspaces=8, n_codes=64, n_iter=1,
              n_centroids=64)

    paths = {}
    out["build_sec"] = {}
    for name, residual in (("global", False), ("residual", True)):
        p = os.path.join(root, name)
        t0 = time.time()
        S.pq_build_index(emb, p, residual=residual, **kw)
        out["build_sec"][name] = round(time.time() - t0, 3)
        paths[name] = p

    out["index_bytes"] = {
        name: _tree_bytes(p) for name, p in paths.items()
    }

    def search_time(p) -> "list[float]":
        def one() -> float:
            t0 = time.time()
            S.pq_search_index(
                spark, p, queries, k=5, n_probe=4
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        one()
        return [round(one(), 3) for _ in range(_SAMPLES)]

    out["search_sec"] = {
        name: {"samples": (s := search_time(p)), "min": min(s)}
        for name, p in paths.items()
    }

    # recall through the PERSISTED path on the clustered fixture AT
    # THE PINNED BUDGET (dim=32, m=8, n_codes=128 — the exact
    # configuration tests/test_pq.py pins residual > global at; the
    # advantage is budget-dependent, NOT universal: at dim=64/k=64 a
    # first probe of this script measured the REVERSE, 0.375 vs 0.5 —
    # recorded honestly here so the regime boundary is on the record)
    rng = np.random.default_rng(3)
    dim_cl = 32
    centers = rng.normal(size=(8, dim_cl))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in range(8):
        for _ in range(100):
            v = centers[c] + rng.normal(scale=0.15, size=dim_cl)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    cl = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    clq = cl.where(F.col("vec_id") % 100 == 0)
    bf = {(r.query_id, r.neighbor_id)
          for r in S.brute_force_topk(cl, clq, k=5).collect()}
    ckw = dict(dim=dim_cl, m_subspaces=8, n_codes=128, n_iter=2,
               n_centroids=8)
    rec = {}
    for name, residual in (("global", False), ("residual", True)):
        p = os.path.join(root, f"cl_{name}")
        S.pq_build_index(cl, p, residual=residual, **ckw)
        got = {(r.query_id, r.neighbor_id)
               for r in S.pq_search_index(spark, p, clq, k=5,
                                          n_probe=3).collect()}
        rec[name] = round(len(got & bf) / len(bf), 3)
    out["clustered_recall_top5_m8_k128_dim32"] = rec
    out["recall_regime_note"] = (
        "residual > global holds at the pinned budget (m=8, k=128, "
        "dim=32 — test_residual_beats_global_books_at_equal_code_"
        "budget); at dim=64/k=64 the same fixture measured global "
        "0.5 vs residual 0.375 — the residual advantage is a "
        "budget-dependent trade, not a free win"
    )

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
