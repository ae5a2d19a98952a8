"""Embedding-store storage-mode scale points (verdict r11 item 3),
measured at sf0.1, run ALONE (timing):

- STORE SIZE on disk: exact (array<double>) vs int8 (scale+qvec) vs
  pq (codes+den+err+scale+qvec) — and the pq store's CODE-COLUMN
  bytes alone (codes/den/err), the slice the ADC shortlist scan reads
  after parquet column pruning.
- PROBE TIME: int8 vs pq at the fixture code budget (m=4, k=8) and a
  realistic one (m=8, k=64), min-of-N noop writes.
- SHORTLIST RATIO: candidates -> ADC shortlist -> final pairs at
  threshold 0.9 / n_probe 2 (the pruning the err bound buys at each
  budget; results are bit-equal to int8 by construction, which the
  pytest + d22 oracle pin).

Output: one JSON object on stdout (recorded into BENCH_sf1_r12.json).

    python scripts/pq_store_scale.py [--sf /root/testdata/sf0.1]
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

    from pyspark.sql import functions as F

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.llm import dedup_index as DI

    spark = get_spark("pq_store_scale")
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    n_corpus, n_batch = corpus.count(), batch.count()

    root = tempfile.mkdtemp(prefix="pq_store_scale_")
    out: dict = {
        "protocol": (
            f"scripts/pq_store_scale.py at {args.sf} (corpus "
            f"{n_corpus} vectors = even ids, batch {n_batch}; probe "
            f"threshold 0.9, n_probe 2, min-of-{_SAMPLES} noop "
            f"writes, box idle)"
        ),
    }

    def build(name, **kw):
        p = os.path.join(root, name)
        DI.embedding_build_index(corpus, p, n_centroids=8, **kw)
        return p

    stores = {
        "exact": build("exact"),
        "int8": build("int8", quantize=True),
        "pq_m4_k8": build("pq48", quantize="pq", m_subspaces=4,
                          n_codes=8),
        "pq_m8_k64": build("pq864", quantize="pq", m_subspaces=8,
                           n_codes=64),
    }

    sizes = {k: _tree_bytes(p, "vectors") for k, p in stores.items()}
    # the ADC scan's column slice: re-written as its own parquet to
    # measure the codes/den/err bytes the stage-1 scan actually pays
    from configurable_etl_python_repo_spark.llm._store import (
        read_committed,
    )

    _, meta, segs, _, _ = DI._emb_committed(spark, stores["pq_m8_k64"])
    slim = os.path.join(root, "slim")
    read_committed(
        spark, stores["pq_m8_k64"], "vectors", segs
    ).select("cid", "id", "codes", "den", "err").write.parquet(slim)
    sizes["pq_m8_k64_adc_columns"] = _tree_bytes(slim)
    out["store_bytes"] = sizes
    out["size_ratios_vs_exact"] = {
        k: round(v / sizes["exact"], 3) for k, v in sizes.items()
    }

    def probe_time(p) -> "list[float]":
        def one() -> float:
            t0 = time.time()
            DI.embedding_against_index(
                spark, p, batch, threshold=0.9, n_probe=2
            ).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        one()  # warm-up
        return [round(one(), 3) for _ in range(_SAMPLES)]

    out["probe_sec"] = {
        k: {"samples": (s := probe_time(p)), "min": min(s)}
        for k, p in stores.items()
    }

    # shortlist pruning at each pq budget (counts, not timings)
    from configurable_etl_python_repo_spark.llm.dedup_index import (
        _PQ_ERR_SLACK,
    )
    from configurable_etl_python_repo_spark.llm.similarity import (
        _dot,
        _pq_codebook_df,
        _read_codebooks,
        _with_norm,
        ivf_assignments_arrow,
    )

    prune = {}
    for k in ("pq_m4_k8", "pq_m8_k64"):
        p = stores[k]
        _, meta, segs, _, _ = DI._emb_committed(spark, p)
        rows = read_committed(spark, p, "vectors", segs)
        cents = DI._stored_centroids(spark, p, meta.meta_id)
        probe = ivf_assignments_arrow(cents, n_best=2)
        q = batch.select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("qv"),
        ).withColumn("cid", F.explode(probe(F.col("qv"))))
        cand = q.join(rows.select("cid", "id"), "cid").count()
        books = _read_codebooks(spark, p, meta.meta_id)
        dim, m = int(meta.dim), int(meta.m_subspaces)
        sd = dim // m
        cb = F.broadcast(
            _pq_codebook_df(spark, books)
            .withColumnRenamed("cid", "code_cid")
            .select("s", "code_cid", "cv")
        )
        qv1 = _with_norm(q.select("id_a", "qv").distinct(), "qv", "nq")
        lut = qv1.crossJoin(cb).select(
            "id_a", "nq", "s", "code_cid",
            F.round(
                _dot(F.slice(F.col("qv"), F.col("s") * sd + 1,
                             F.lit(sd)), F.col("cv")), 6,
            ).alias("d"),
        )
        ex = rows.select(
            "cid", F.col("id").alias("id_b"), "den", "err",
            F.posexplode("codes").alias("s", "code_cid"),
        )
        num = (
            ex.join(q.select("id_a", "cid"), "cid")
            .join(lut, ["id_a", "s", "code_cid"])
            .groupBy("id_a", "id_b", "den", "err", "nq")
            .agg(F.sum(F.col("d").cast("decimal(28,10)"))
                 .cast("double").alias("num"))
        )
        short = num.where(
            F.round(F.col("num") / (F.col("nq") * F.sqrt("den")), 6)
            >= F.lit(0.9) - F.col("err") - F.lit(_PQ_ERR_SLACK)
        ).count()
        final = DI.embedding_against_index(
            spark, p, batch, threshold=0.9, n_probe=2
        ).count()
        prune[k] = {
            "candidates": cand, "adc_shortlist": short, "final": final,
            "shortlist_share": round(short / max(cand, 1), 4),
        }
    out["shortlist_pruning"] = prune

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
