"""Scale smoke: replicate the sf0.1 fixtures N× (key-shifted so join
cardinalities scale linearly, not quadratically) and time the
reference-surface headline queries at 1× and N×.

This is the would-it-hold-at-scale check the small-SF gates can't give:
work per query should grow ~linearly with N (shuffle-bound ops slightly
worse), and the audit ensures no plan degenerates (e.g. a broadcast that
silently becomes a nested loop). Run:

    python scripts/scale_smoke.py [--factor 16] [--keep DIR]
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

REPLICATED = ["lineitem", "orders", "customer"]
COPIED = ["part", "supplier", "nation", "region", "events", "documents",
          "embeddings"]
#: key columns shifted per replica so keys stay unique across copies
KEY_SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
}
QUERIES = [
    "flagship_earliest_event",
    "a1_groupby_summarise",
    "w2_sort_slice_topn",
    "j1_left_join_two_keys",
    "j3_spine_study",
    "x4_global_topk",
]


def replicate(spark, src_dir: str, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    for name in COPIED:
        shutil.copyfile(f"{src_dir}/{name}.parquet", f"{out_dir}/{name}.parquet")
    for name in REPLICATED:
        df = spark.read.parquet(f"{src_dir}/{name}.parquet")
        copies = df.crossJoin(
            spark.range(factor).withColumnRenamed("id", "__rep")
        )
        shift = 10_000_000
        for k in KEY_SHIFT[name]:
            copies = copies.withColumn(k, F.col(k) + F.col("__rep") * shift)
        copies.drop("__rep").write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from configurable_etl_python_repo_spark.catalog import QUERIES as Q

    out = {}
    for name in QUERIES:
        Q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        Q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=16)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", help="reuse/keep the replicated dir")
    args = ap.parse_args()

    from configurable_etl_python_repo_spark import get_spark

    spark = get_spark("scale_smoke")
    base = time_queries(spark, args.src)

    big_dir = args.keep or tempfile.mkdtemp(prefix="scale_smoke_")
    os.makedirs(big_dir, exist_ok=True)
    if not os.path.exists(f"{big_dir}/lineitem.parquet") or not args.keep:
        replicate(spark, args.src, big_dir, args.factor)
    big = time_queries(spark, big_dir)

    report = {
        "factor": args.factor,
        "queries": {
            n: {
                "base_s": base[n],
                "scaled_s": big[n],
                "ratio": round(big[n] / max(base[n], 1e-9), 1),
            }
            for n in QUERIES
        },
    }
    print(json.dumps(report, indent=2))
    if not args.keep:
        shutil.rmtree(big_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
