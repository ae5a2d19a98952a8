"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion via a noop sink (full pipeline runs, no
driver collect). Timings include Spark planning but not session startup.

Run-to-run wall-clock on a shared box swings 1.5-3x (measured in round 1:
d3 2.9s <-> 9.9s, identical code), so each query is measured --repeat times
(default 3, env SPARK_GRAFT_BENCH_REPEAT) after one warm-up and the MEDIAN
is reported — round-over-round deltas are attributable to code, not noise.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
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
    "d6_embedding_cosine_srp",   # SRP-prefiltered cosine pairs (scale path)
    "n1_ann_cosine_topk",        # brute-force cosine top-k
    "t1_text_stats",             # text quality features
    "m1_multimodal_features",    # Arrow-batched decode plumbing
    "d8_span_dedup",             # sub-document span dedup (r4)
    "d9_decontaminate",          # eval-set 13-gram decontamination (r4)
    "d10_substring_dedup",       # shift-robust substring dedup (r5)
    "t9_bpe_pack_sequences",     # merges-table BPE + packing (r5)
    "t10_unigram_surprisal",     # unigram-LM fluency scoring (r5)
    "x15_web_curation_pipeline", # composed r5 curation chain (r5)
    "d11_semantic_dedup",        # SemDeDup, k-means-bounded pairwise (r5)
    "x18_dsir_selection",        # DSIR importance resampling (r7)
    "x19_targeted_pipeline",     # composed targeted-selection chain (r7)
    "d15_dedup_against_index",   # incremental cross-corpus dedup probe (r8)
    "d18_embedding_against_index",  # incremental embedding-dedup probe (r8)
    "t21_dedup_repeated_lines",  # within-doc line dedup (r8)
    "x26_mixture_upsample",      # epoch-capped mixture upsampling (r8)
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--repeat", type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")),
        help="measured runs per query (median reported); 1 warm-up run first",
    )
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.catalog import QUERIES

    spark = get_spark("bench")

    def run(name: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def calibrate() -> float:
        """Fixtures-independent box probe: one range -> shuffle -> agg job
        (min-of-5 after warm-up). Round-over-round code deltas can only be
        read against this number — the r4->r5 '20-40% regression' on short
        queries was HOST drift, reproduced bit-identically by the r4 code
        on the later box (see ROADMAP round-7 root cause). Compare
        calib_sec across rounds before attributing query deltas to code."""
        from pyspark.sql import functions as F

        def one() -> float:
            t0 = time.time()
            (spark.range(0, 10_000_000)
                .withColumn("k", F.col("id") % 97)
                .groupBy("k").count()
                .write.format("noop").mode("overwrite").save())
            return time.time() - t0
        one()
        return round(min(one() for _ in range(5)), 3)

    calib = calibrate()

    timings: dict[str, float] = {}
    minima: dict[str, float] = {}
    samples_by_name: dict[str, list[float]] = {}
    for name in HEADLINE:
        run(name)  # warm-up: JIT/codegen/file-listing warm, then steady-state
        samples = [run(name) for _ in range(max(args.repeat, 1))]
        samples_by_name[name] = samples
        timings[name] = round(statistics.median(samples), 3)
        minima[name] = round(min(samples), 3)

    # Min-of-5 recording rule (verdict r6 item #3), applied by the bench
    # itself: any query whose min is >15% off the previous recorded round's
    # min gets 5 extra samples, and the better-attested (smaller) min is
    # kept — a noise-high recording must never ship as a round number.
    remeasured: list[str] = []
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    prev = _previous_round_minima(sf)
    for name in HEADLINE:
        p = prev.get(name)
        if p and abs(minima[name] - p) / p > 0.15:
            extra = [run(name) for _ in range(5)]
            all_samples = samples_by_name[name] + extra
            # publish the same statistics over the pooled samples — the
            # median stays a median (mixing a remeasured MIN into the
            # median column would bias cross-round comparisons low)
            timings[name] = round(statistics.median(all_samples), 3)
            minima[name] = round(min(all_samples), 3)
            remeasured.append(name)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # per-query min alongside the median: box-load noise inflates a
        # single sample 1.5-3x, and the min is the better floor estimate
        # when comparing rounds run under different load
        "queries_min": minima,
        "min_total": round(sum(minima.values()), 3),
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "repeat": args.repeat,
        # host-speed probe (fixtures-independent); compare across rounds
        # before attributing query-time deltas to code
        "calib_sec": calib,
        # queries whose first-pass min was >15% off the previous round and
        # were re-sampled (min-of-5) before recording
        "remeasured": remeasured,
    }))
    spark.stop()


def _current_round() -> "int | None":
    """The round now RUNNING, from VERDICT.md's 'round N' header
    (written at the END of round N, so current = N + 1). Searches the
    whole file case-insensitively — a header-format change must not
    silently disable the strictly-below filter (which would re-enable
    the in-round self-comparison bug). None in round 1 / when
    VERDICT.md is absent."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "VERDICT.md")) as f:
            m = re.search(r"\bround\s+(\d+)", f.read(), re.IGNORECASE)
        return int(m.group(1)) + 1 if m else None
    except OSError:
        return None


def _previous_round_minima(sf: str) -> dict[str, float]:
    """queries_min from the newest BENCH_r*.json STRICTLY BELOW the
    current round (an in-round re-run must not compare against its own
    recording — the >15% rule would then never fire), empty when none
    parse or the previous round ran at a DIFFERENT sf (cross-sf
    comparison would flag every query)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    cur = _current_round()
    best: tuple[int, str] | None = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            n = int(m.group(1))
            if cur is not None and n >= cur:
                continue
            if best is None or n > best[0]:
                best = (n, p)
    if not best:
        return {}
    try:
        with open(best[1]) as f:
            doc = json.load(f)
        parsed = doc.get("parsed") or doc  # {"parsed": null} wrappers exist
        if not isinstance(parsed, dict) or str(parsed.get("sf")) != str(sf):
            return {}
        return dict(parsed.get("queries_min") or {})
    except (OSError, ValueError):
        return {}


if __name__ == "__main__":
    main()
