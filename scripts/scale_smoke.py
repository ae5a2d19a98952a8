"""Scale stress: replicate the sf0.1 fixtures N× and time the headline
queries at 1× and each requested factor, reporting a per-query scaling
exponent: the x1 -> largest-factor ENDPOINT log-log slope (the widest
range, least biased by the ~0.4s fixed stage-latency floor, and —
unlike a min-over-pairs — unable to hide a top-factor blowup behind a
floor-bound short pair). The full pairwise slope table is recorded
alongside (`exponent_pairs`) so a reader can see which pairs were
floor-bound.

Replication is content-aware so the measurement reflects the ALGORITHM's
scaling, not replication artifacts:

  - join keys are shifted per replica (join cardinalities grow linearly,
    not quadratically);
  - `documents.text` is alphabet-rotated per replica (a bijective
    `translate`), so shingles are disjoint across replicas and near-dup
    pair counts grow linearly — naive copying would make every doc an
    exact dup of its N-1 siblings and inflate d2/d3 output O(N²);
  - `embeddings.embedding` is circularly rotated per replica (norms
    preserved, cross-replica cosines decorrelated) for the same reason;
  - `events.user_id` is shifted, so sessions grow linearly.

tests/test_scale_utils.py pins the linearity of these transforms at
sf0.001. Run:

    python scripts/scale_smoke.py [--factors 4,10] [--keep DIR]

Verdict r3 asked for "an sf1 table showing <=~linear scaling, or named
fixes" — factor 10 on sf0.1 is sf1; results recorded in ROADMAP.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: replica key shift, large enough to clear every base key range
SHIFT = 10_000_000
KEY_SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPIED = ["part", "supplier", "nation", "region"]
QUERIES = [
    # reference-surface headliners
    "flagship_earliest_event",
    "a1_groupby_summarise",
    "w2_sort_slice_topn",
    "j1_left_join_two_keys",
    "j3_spine_study",
    "x4_global_topk",
    # verdict-named scale probes
    "d2_ngram_jaccard_pairs",
    "d3_minhash_lsh_pairs",
    "t2_language_id",
    "e2_sessionize_gap30m",
    "x9_curation_pipeline",
    # extra coverage: winnowing + partitioned ANN
    "t5_winnowing_fingerprints",
    "n3_ann_ivf_topk",
]

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _transform_replica(name: str, df, rep: int):
    """Per-replica content transform (constant `rep`, stays in codegen)."""
    from pyspark.sql import functions as F

    for k in KEY_SHIFT.get(name, []):
        df = df.withColumn(k, F.col(k) + F.lit(rep * SHIFT))
    if rep == 0:
        return df
    if name == "documents":
        rot = rep % 25 + 1  # never identity for rep > 0
        rotated = _ALPHA[rot:] + _ALPHA[:rot]
        df = df.withColumn(
            "text",
            F.translate("text", _ALPHA + _ALPHA.upper(),
                        rotated + rotated.upper()),
        )
    elif name == "embeddings":
        # dim comes from the data, not a literal: a hardcoded 64 would
        # silently truncate/malform vectors if the fixture's dimension
        # ever changed, quietly corrupting the scale measurement
        dim = F.size("embedding")
        rot = F.lit(rep) % (dim - F.lit(1)) + F.lit(1)
        df = df.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", rot + F.lit(1), dim - rot),
                F.slice("embedding", F.lit(1), rot),
            ),
        )
    return df


def replicate(spark, src_dir: str, out_dir: str, factor: int) -> None:
    from functools import reduce

    for name in COPIED:
        shutil.copyfile(f"{src_dir}/{name}.parquet", f"{out_dir}/{name}.parquet")
    for name in KEY_SHIFT:
        df = spark.read.parquet(f"{src_dir}/{name}.parquet")
        parts = [_transform_replica(name, df, r) for r in range(factor)]
        out = reduce(lambda a, b: a.unionByName(b), parts)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def time_queries(spark, sf_dir: str, names=QUERIES,
                 samples: int = 3) -> dict[str, float]:
    """Warm once, then min-of-`samples`: single warm samples on this box
    swing 1.5-3x (transient stalls land on random queries), and a noisy
    point in either the x4 or x10 slot corrupts the exponent."""
    from configurable_etl_python_repo_spark.catalog import QUERIES as Q

    out = {}
    for name in names:
        Q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(samples):
            t0 = time.time()
            Q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="4,10",
                    help="comma-separated replication factors (besides 1)")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", help="parent dir to build/reuse replicated sets in")
    ap.add_argument("--queries", help="comma-separated subset of queries")
    ap.add_argument("--samples", type=int, default=3,
                    help="timed runs per query after 1 warm-up (min kept)")
    args = ap.parse_args()
    factors = sorted({int(f) for f in args.factors.split(",")} - {1})
    if not factors:  # fail fast, not IndexError after minutes of timing
        ap.error("--factors needs at least one factor > 1")
    names = ([n.strip() for n in args.queries.split(",") if n.strip()]
             if args.queries else QUERIES)

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.catalog import QUERIES as _Q

    unknown = [n for n in names if n not in _Q]
    if unknown:  # fail BEFORE the minutes-long replication, not after
        ap.error(f"unknown queries: {', '.join(unknown)}")

    spark = get_spark("scale_smoke")
    timings: dict[int, dict[str, float]] = {1: time_queries(spark, args.src, names, args.samples)}

    parent = args.keep or tempfile.mkdtemp(prefix="scale_smoke_")
    for f in factors:
        big_dir = os.path.join(parent, f"x{f}")
        # completion marker records (src, factor): a crashed or
        # different-source build is rebuilt, never silently timed
        marker = os.path.join(big_dir, "_REPLICATED")
        stamp = f"{os.path.abspath(args.src)} x{f}"
        if not (os.path.exists(marker) and open(marker).read() == stamp):
            os.makedirs(big_dir, exist_ok=True)
            replicate(spark, args.src, big_dir, f)
            with open(marker, "w") as fh:
                fh.write(stamp)
        timings[f] = time_queries(spark, big_dir, names, args.samples)

    # The RECORDED exponent is the ENDPOINT fit (x1 -> largest factor):
    # it spans the widest factor range, so a stage-latency floor at the
    # low point biases it the LEAST of any pair, and — unlike a
    # min-over-pairs — it can never report sub-linear for a query that
    # blows up at the top factor (a floor-bound SHORT pair like x1-x4
    # fits near zero and a min would hide the blowup; the old
    # two-LARGEST-factors fit had the opposite failure, inflating
    # floor-bound slopes: t17 1.38 recorded vs the true 0.64,
    # BENCH_sf1_r07). All pairwise slopes ride along for transparency,
    # so a reader can see which pairs were floor-bound.
    all_f = [1] + factors

    def _slope(n: str, lo: int, hi: int) -> float:
        return round(
            math.log(max(timings[hi][n], 1e-3)
                     / max(timings[lo][n], 1e-3))
            / math.log(hi / lo), 2)

    pairs = [(lo, hi) for i, lo in enumerate(all_f)
             for hi in all_f[i + 1:]]
    report = {
        "src": args.src,
        "factors": all_f,
        "queries": {
            n: {
                **{f"x{f}_s": timings[f][n] for f in all_f},
                "exponent": _slope(n, 1, all_f[-1]),
                "exponent_pairs": {
                    f"x{lo}_x{hi}": _slope(n, lo, hi)
                    for lo, hi in pairs
                },
            }
            for n in names
        },
    }
    print(json.dumps(report, indent=2))
    if not args.keep:
        shutil.rmtree(parent, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
