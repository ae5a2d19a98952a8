"""Phase-level wall breakdown of d11_semantic_dedup at sf0.1 (guide §1:
measure first; isolate with the noop sink). Times each pipeline phase
separately so the 13.3s r13 recording can be attributed: Lloyd driver
loop (sample collect + per-iter agg collect), Arrow assignment pass,
and the within-cluster pairwise join + witness agg + output join.

Usage: python scripts/profile_d11.py [--sf DIR] [--repeat N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark import catalog  # noqa: F401  (registers all queries first)
    from configurable_etl_python_repo_spark.catalog_llm import (
        _IVF_N_CENTROIDS, _KM_ITER, _SEMDEDUP_T,
    )
    from configurable_etl_python_repo_spark.llm import similarity as S
    from configurable_etl_python_repo_spark.llm.dedup import (
        _scope_cache, clear_shingle_cache,
    )

    spark = get_spark("profile_d11")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    emb_path = os.path.join(args.sf, "embeddings.parquet")

    for it in range(args.repeat):
        clear_shingle_cache()
        spark.catalog.clearCache()
        t_all0 = time.time()

        emb = spark.read.parquet(emb_path)

        sc.setJobDescription("d11: lloyd_centroids")
        t0 = time.time()
        cents = S.lloyd_centroids(emb, _IVF_N_CENTROIDS, _KM_ITER,
                                  "vec_id", "embedding", mean_digits=6)
        t_lloyd = time.time() - t0

        sc.setJobDescription("d11: assignment pass (cache fill)")
        assign1 = S.ivf_assignments_arrow(cents, n_best=1, digits=6)
        a = _scope_cache(S._with_norm(
            emb.select(
                F.col("vec_id").alias("id"),
                F.col("embedding").alias("v"),
                assign1(F.col("embedding"))[0].alias("cid"),
            ),
            "v", "nv",
        ))
        t0 = time.time()
        noop(a)
        t_assign = time.time() - t0

        sc.setJobDescription("d11: pairwise + witness + output join")
        b = a.select(
            F.col("id").alias("id_b"), F.col("v").alias("vb"),
            F.col("nv").alias("nb"), "cid",
        )
        pairs = (
            a.join(b, "cid")
            .where(F.col("id") < F.col("id_b"))
            .withColumn(
                "sim",
                S._sim(F.col("v"), F.col("vb"), F.col("nv"), F.col("nb"), 6),
            )
            .where(F.col("sim") >= _SEMDEDUP_T)
        )
        wit = pairs.groupBy("id_b").agg(F.min("id").alias("dup_of"))
        out = (
            a.select("id", "cid")
            .join(wit, F.col("id") == F.col("id_b"), "left")
            .select(
                F.col("id").alias("vec_id"), "cid", "dup_of",
                F.col("dup_of").isNull().alias("kept"),
            )
        )
        t0 = time.time()
        noop(out)
        t_pairs = time.time() - t0
        sc.setJobDescription(None)

        t_total = time.time() - t_all0
        print(f"iter={it} lloyd={t_lloyd:.2f}s assign={t_assign:.2f}s "
              f"pairs={t_pairs:.2f}s total={t_total:.2f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
