"""Per-query min-of-N prober for A/B tree comparisons (ROADMAP bisect
protocol, rounds 7/8/10/12).

Runs a comma-separated list of catalog queries from WHICHEVER tree is
first on PYTHONPATH (so the same script probes HEAD and a `git archive`
of an older round side by side), one warm-up + N measured samples each,
plus the fixtures-independent calib probe (range -> shuffle -> agg,
min-of-5) so tree deltas can be read against a host-speed baseline.
Prints ONE JSON line:

  {"tree": <label>, "calib_sec": ..., "queries": {name: {"samples": [...],
   "min": ...}}}

Usage (idle box, nothing else running):
  PYTHONPATH=/tmp/ab_r10 python scripts/ab_probe.py --label r10 \
      --queries d9_decontaminate,d11_semantic_dedup --repeat 5
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--label", default="tree")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.catalog import QUERIES

    spark = get_spark("ab_probe")

    def run(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    from pyspark.sql import functions as F

    def calib_one() -> float:
        t0 = time.time()
        (spark.range(0, 10_000_000)
            .withColumn("k", F.col("id") % 97)
            .groupBy("k").count()
            .write.format("noop").mode("overwrite").save())
        return time.time() - t0

    calib_one()
    calib = round(min(calib_one() for _ in range(5)), 3)

    out: dict[str, dict] = {}
    for name in args.queries.split(","):
        name = name.strip()
        run(name)  # warm-up
        samples = [round(run(name), 3) for _ in range(args.repeat)]
        out[name] = {"samples": samples, "min": min(samples)}

    print(json.dumps({"tree": args.label, "calib_sec": calib, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
