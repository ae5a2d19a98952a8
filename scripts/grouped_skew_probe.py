"""Measure the grouped-LSH skew claim (r10 verdict item 3): d19/d20's
headline argument is that folding the group INTO the band key splits
hot buckets per group (llm/dedup._fold_group_keys) — so on a fixture
where ~1/7 of docs share a boilerplate sentence ACROSS groups (the
skew_stress BOILERPLATE shard, whose source column was skew-scattered
over 'src0' + the originals), the grouped variant's candidate join
should see smaller worst buckets and fewer candidate pairs.

Two kinds of evidence, per family (MinHash d3/d19 params, SimHash
d13/d20 params):

- BUCKET SHAPE (exact, no timing noise): per-(band, key) bucket sizes
  of the ungrouped vs the group-folded bucket relation — max bucket
  size and sum of C(n,2) over buckets (the candidate-join work an
  equi-join on the key performs). This is the skew claim itself,
  stated as a number.
- WALL TIME (min-of-N, run ALONE): the full verified pairs op,
  grouped vs ungrouped. Honest caveat recorded in the output: the
  grouped op answers a NARROWER question (same-group pairs only), so
  some of the wall-time drop is less output, not just better buckets —
  the bucket metrics are the skew evidence proper.

Reuses the skew_stress fixture (content-aware x10 replication +
boilerplate shard + hot stratum) via --keep, the SKEW_r08 protocol.

Run ALONE:  python scripts/grouped_skew_probe.py \
    [--keep /root/scale_fixtures] [--factor 10] [--samples 3]
Writes one JSON object to stdout; record into SKEW_r11.json.
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

from skew_stress import replicate_skewed  # noqa: E402

_MINHASH = dict(n=3, bands=8, rows_per_band=2, threshold=0.1)  # d3/d19
_SIMHASH_K = 3                                                 # d13/d20


def _bucket_shape(buckets) -> dict:
    """max bucket size + total candidate-join work (sum C(n,2)) of a
    (band, key) bucket relation — one aggregate, exact."""
    from pyspark.sql import functions as F

    row = (
        buckets.groupBy("band", "key").count()
        .agg(
            F.max("count").alias("max_bucket"),
            F.sum(F.col("count") * (F.col("count") - 1) / 2)
            .cast("long").alias("cand_pairs"),
            F.count("*").alias("n_buckets"),
        )
        .collect()[0]
    )
    return {
        "max_bucket": int(row.max_bucket),
        "cand_pairs": int(row.cand_pairs),
        "n_buckets": int(row.n_buckets),
    }


def _best(fn, samples: int) -> float:
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
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", help="parent dir to build/reuse the fixture in")
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.llm import dedup as D

    spark = get_spark("grouped_skew_probe")
    parent = args.keep or tempfile.mkdtemp(prefix="grouped_skew_")
    big_dir = os.path.join(parent, f"skew_x{args.factor}")
    marker = os.path.join(big_dir, "_REPLICATED_SKEW")
    stamp = f"{os.path.abspath(args.src)} x{args.factor} skew1"
    if not (os.path.exists(marker) and open(marker).read() == stamp):
        os.makedirs(big_dir, exist_ok=True)
        replicate_skewed(spark, args.src, big_dir, args.factor)
        with open(marker, "w") as fh:
            fh.write(stamp)

    docs = spark.read.parquet(f"{big_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    n_docs = docs.count()
    n_groups = docs.select("source").distinct().count()
    boiler = docs.where(F.col("doc_id") % 7 == 0)
    boiler_groups = boiler.select("source").distinct().count()
    report = {
        "factor": args.factor,
        "n_docs": n_docs,
        "n_groups": n_groups,
        "boilerplate_docs": boiler.count(),
        "boilerplate_spans_groups": int(boiler_groups),
        "caveat": (
            "grouped wall time also reflects the narrower question "
            "(same-group pairs only); bucket shape is the skew "
            "evidence proper"
        ),
        "families": {},
    }

    # ---- MinHash (d3 vs d19 shapes)
    mh = _MINHASH
    sig = D.minhash_sigarr(
        docs, "doc_id", "text", mh["n"], mh["bands"] * mh["rows_per_band"]
    )
    buckets = D.explode_band_keys(sig, mh["bands"], mh["rows_per_band"])
    folded = D._fold_group_keys(buckets, docs, "doc_id", ["source"])
    shape_u = _bucket_shape(buckets)
    shape_g = _bucket_shape(folded)
    t_u = _best(lambda: _noop(D.minhash_lsh_pairs(docs, **mh)),
                args.samples)
    t_g = _best(
        lambda: _noop(
            D.minhash_lsh_pairs(docs, **mh, group_cols=["source"])
        ),
        args.samples,
    )
    out_u = D.minhash_lsh_pairs(docs, **mh).count()
    out_g = D.minhash_lsh_pairs(docs, **mh, group_cols=["source"]).count()
    report["families"]["minhash"] = {
        "ungrouped": {**shape_u, "wall_s": t_u, "out_pairs": out_u},
        "grouped": {**shape_g, "wall_s": t_g, "out_pairs": out_g},
        "cand_pair_ratio": round(
            shape_g["cand_pairs"] / max(shape_u["cand_pairs"], 1), 4
        ),
        "max_bucket_ratio": round(
            shape_g["max_bucket"] / max(shape_u["max_bucket"], 1), 4
        ),
    }

    # ---- SimHash (d13 vs d20 shapes)
    fp = D.simhash64(docs, "doc_id", "text")
    sbuckets = D.simhash_band_rows(fp, _SIMHASH_K).select(
        "id", "band", "key"
    )
    sfolded = D._fold_group_keys(sbuckets, docs, "doc_id", ["source"])
    sshape_u = _bucket_shape(sbuckets)
    sshape_g = _bucket_shape(sfolded)
    st_u = _best(
        lambda: _noop(D.simhash_pairs(docs, max_hamming=_SIMHASH_K)),
        args.samples,
    )
    st_g = _best(
        lambda: _noop(
            D.simhash_pairs(
                docs, max_hamming=_SIMHASH_K, group_cols=["source"]
            )
        ),
        args.samples,
    )
    sout_u = D.simhash_pairs(docs, max_hamming=_SIMHASH_K).count()
    sout_g = D.simhash_pairs(
        docs, max_hamming=_SIMHASH_K, group_cols=["source"]
    ).count()
    report["families"]["simhash"] = {
        "ungrouped": {**sshape_u, "wall_s": st_u, "out_pairs": sout_u},
        "grouped": {**sshape_g, "wall_s": st_g, "out_pairs": sout_g},
        "cand_pair_ratio": round(
            sshape_g["cand_pairs"] / max(sshape_u["cand_pairs"], 1), 4
        ),
        "max_bucket_ratio": round(
            sshape_g["max_bucket"] / max(sshape_u["max_bucket"], 1), 4
        ),
    }

    print(json.dumps(report, indent=2))
    if not args.keep:
        shutil.rmtree(parent, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
