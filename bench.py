"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion via a noop sink (full pipeline runs, no
driver collect). Timings include Spark planning but not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_earliest_event",   # multi-op analyte program
    "tpch_q3_shaped",            # 3-table join + agg + fused top-10
    "a1_groupby_summarise",      # TPC-H Q1-shaped aggregate
    "w2_sort_slice_topn",        # fused window top-N
    "j3_spine_study",            # study DAG + broadcast spine joins
    "j1_left_join_two_keys",     # two-key equi join
    "e2_sessionize_gap30m",      # event sessionization windows
    "d2_ngram_jaccard_pairs",    # inverted-index similarity join
    "d3_minhash_lsh_pairs",      # minhash banding + verify
    "n1_ann_cosine_topk",        # brute-force cosine top-k
    "t1_text_stats",             # text quality features
    "m1_multimodal_features",    # Arrow-batched decode plumbing
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.catalog import QUERIES

    spark = get_spark("bench")
    timings: dict[str, float] = {}
    for name in HEADLINE:
        # warm-up run: JIT/codegen/file-listing warm, then measure steady-state
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
