"""x14 skew stress (verdict r4 item #6): run the composed pre-training
pipeline at sf1 with DELIBERATELY skewed fixtures and bound the
max-task / median-task time ratio per stage.

Skew injected on top of scale_smoke's content-aware x10 replication:

  - HOT STRATUM: every replica's documents are reassigned source='src0'
    with probability ~1/2 (hash-deterministic), so one mixture stratum
    holds ~10x its base share — stressing x13's counting pass and the
    literal-CASE filter;
  - BOILERPLATE SHARD: docs with doc_id % 7 == 0 get the SAME 24-word
    boilerplate sentence appended (identical across replicas — the text
    rotation is deliberately NOT applied to it), so d8's span dedup and
    d9's gram build see a span/gram duplicated across ~1/7 of an
    sf1-sized corpus — exactly the hot-key shape the min-struct partial
    aggregate exists for.

Per-stage task-time quantiles come from the Spark UI REST API
(status/api/v1) — the script enables the UI for its own session. The
headline number is the worst max/median task-duration ratio across
stages with >= MIN_TASKS tasks (tiny stages are all fixed overhead and
would dominate the ratio meaninglessly).

Run:  python scripts/skew_stress.py [--factor 10] [--keep DIR]
Writes JSON to stdout; record the result in ROADMAP.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_UI", "true")

from scale_smoke import COPIED, KEY_SHIFT, _transform_replica  # noqa: E402

#: 24 words = spans at k=10 plus 13-gram decontamination grams all hot
BOILERPLATE = (
    "all rights reserved unauthorized reproduction of this document "
    "is strictly prohibited please contact the publisher for licensing "
    "terms and additional information about reuse"
)

MIN_TASKS = 8
#: stages whose MEDIAN task is under this are pure per-task fixed
#: overhead (scheduler jitter makes a 1ms-median stage report ratios of
#: 10+ that say nothing about data skew) — excluded from worst_ratio
MIN_MEDIAN_MS = 50

QUERIES = ["d8_span_dedup", "d9_decontaminate", "d10_substring_dedup",
           "x14_pretraining_pipeline", "x15_web_curation_pipeline"]


def replicate_skewed(spark, src_dir: str, out_dir: str, factor: int) -> None:
    from functools import reduce

    from pyspark.sql import functions as F

    for name in COPIED:
        shutil.copyfile(
            f"{src_dir}/{name}.parquet", f"{out_dir}/{name}.parquet"
        )
    for name in KEY_SHIFT:
        df = spark.read.parquet(f"{src_dir}/{name}.parquet")
        parts = [_transform_replica(name, df, r) for r in range(factor)]
        out = reduce(lambda a, b: a.unionByName(b), parts)
        if name == "documents":
            out = out.withColumn(
                "source",
                F.when(F.xxhash64("doc_id") % 2 == 0, F.lit("src0"))
                .otherwise(F.col("source")),
            ).withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.concat_ws(" ", F.col("text"), F.lit(BOILERPLATE)),
                ).otherwise(F.col("text")),
            )
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def stage_task_ratios(spark, since_stage: int) -> "list[dict]":
    """(stage, tasks, median_ms, max_ms, ratio) for completed stages with
    id > since_stage and >= MIN_TASKS tasks."""
    out = []
    for st in _rest(spark, "/stages?status=complete"):
        sid = st["stageId"]
        if sid <= since_stage or st.get("numCompleteTasks", 0) < MIN_TASKS:
            continue
        try:
            q = _rest(
                spark,
                f"/stages/{sid}/{st['attemptId']}/taskSummary"
                f"?quantiles=0.5,1.0",
            )
        except Exception:
            continue
        med, mx = q["executorRunTime"]
        if med < MIN_MEDIAN_MS:
            continue
        out.append({
            "stage": sid,
            "name": st.get("name", "")[:60],
            "tasks": st["numCompleteTasks"],
            "median_ms": round(med),
            "max_ms": round(mx),
            "ratio": round(mx / max(med, 1.0), 2),
        })
    return out


def latest_stage_id(spark) -> int:
    stages = _rest(spark, "/stages")
    return max((s["stageId"] for s in stages), default=-1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", help="parent dir to build/reuse the fixture in")
    ap.add_argument("--queries",
                    help="comma-separated subset/override of QUERIES")
    args = ap.parse_args()
    names = ([n.strip() for n in args.queries.split(",") if n.strip()]
             if args.queries else QUERIES)

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.catalog import QUERIES as Q

    unknown = [n for n in names if n not in Q]
    if unknown:  # fail BEFORE the minutes-long fixture build, not after
        ap.error(f"unknown queries: {', '.join(unknown)}")

    spark = get_spark("skew_stress")
    parent = args.keep or tempfile.mkdtemp(prefix="skew_stress_")
    big_dir = os.path.join(parent, f"skew_x{args.factor}")
    marker = os.path.join(big_dir, "_REPLICATED_SKEW")
    stamp = f"{os.path.abspath(args.src)} x{args.factor} skew1"
    if not (os.path.exists(marker) and open(marker).read() == stamp):
        os.makedirs(big_dir, exist_ok=True)
        replicate_skewed(spark, args.src, big_dir, args.factor)
        with open(marker, "w") as fh:
            fh.write(stamp)

    report = {"factor": args.factor, "src": args.src, "queries": {}}
    for name in names:
        Q[name](spark, big_dir).write.format("noop").mode("overwrite").save()  # warm
        mark = latest_stage_id(spark)
        t0 = time.time()
        Q[name](spark, big_dir).write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        ratios = stage_task_ratios(spark, mark)
        worst = max(ratios, key=lambda r: r["ratio"], default=None)
        report["queries"][name] = {
            "wall_s": wall,
            "stages_measured": len(ratios),
            "worst_ratio": worst["ratio"] if worst else None,
            "worst_stage": worst,
            "stages": sorted(
                ratios, key=lambda r: -r["ratio"]
            )[:5],
        }
    print(json.dumps(report, indent=2))
    if not args.keep:
        shutil.rmtree(parent, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
