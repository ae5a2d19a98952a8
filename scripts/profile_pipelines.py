"""Stage-level wall breakdown of the composed pipelines x19 and x15 at
sf0.1 (guide §1: measure first; isolate with the noop sink). Each stage
is timed via a noop sink on the stage's OWN output with the upstream
lazy-localCheckpoint boundaries exactly as the catalog queries place
them, so the breakdown attributes wall time to the stage that first
materializes each boundary.

Usage: python scripts/profile_pipelines.py [--sf DIR] [--repeat N]
                                           [--which x19,x15]
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
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--which", default="x19,x15")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark import catalog  # noqa: F401
    from configurable_etl_python_repo_spark import catalog_llm as CL
    from configurable_etl_python_repo_spark.llm.dedup import clear_shingle_cache

    spark = get_spark("profile_pipelines")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, df):
        sc.setJobDescription(label)
        t0 = time.time()
        noop(df)
        dt = time.time() - t0
        sc.setJobDescription(None)
        print(f"    {label}: {dt:.2f}s", flush=True)
        return dt

    _tb = [time.time()]

    def build(label):
        """Print the driver-side (no job) construction time since the
        previous mark — plan building + analysis + checkpoint planning."""
        now = time.time()
        print(f"    [build] {label}: {now - _tb[0]:.2f}s", flush=True)
        _tb[0] = now

    def mark():
        _tb[0] = time.time()

    which = set(args.which.split(","))

    for it in range(args.repeat):
        print(f"== iter {it}", flush=True)
        if "x19" in which:
            clear_shingle_cache()
            spark.catalog.clearCache()
            t_all = time.time(); mark()
            from configurable_etl_python_repo_spark.plans import (
                Engine, OpSpec, ScanSpec,
            )

            eng = Engine(spark)
            eng.run_scan(ScanSpec("docs_raw", "parquet",
                                  CL._pq(args.sf, "documents")))
            docs = eng.peek("docs_raw")[0].select("doc_id", "source", "text")
            eng.bind("docs", docs)
            eng.bind("tgt", docs.where(
                F.col("source") == CL._DSIR_TARGET_SRC
            ).select("doc_id", "text"))
            run = eng.run_op
            sel = run(OpSpec(
                "DSIR SELECT", "sel", ["docs", "tgt"],
                {"k": CL._DSIR_K, "buckets": CL._DSIR_BUCKETS},
            )).select("doc_id", "source", "text").localCheckpoint(eager=False)
            eng.bind("sel", sel)
            build("x19/1 dsir-select")
            timed("x19/1 dsir-select", sel)
            mark()
            bs = run(OpSpec("SURPRISAL BACKOFF", "bs", ["sel", "tgt"], {}))
            eng.bind("bs", bs)
            build("x19/2 backoff")
            timed("x19/2 backoff-surprisal", bs)
            mark()
            eng.bind("bs2", run(OpSpec(
                "REMOVE COLUMN", "bs2", ["bs"], {"columns": ["n_words"]},
            )))
            eng.bind("joined", run(OpSpec(
                "INNER JOIN", "joined", ["sel", "bs2"], {"on": ["doc_id"]},
            )))
            gated = run(OpSpec(
                "FILTER", "gated", ["joined"],
                {"condition":
                 f"avg_surprisal <= NUMBER({CL._X19_SUP_MAX})"},
            )).localCheckpoint(eager=False)
            eng.bind("gated", gated)
            build("x19/3 gate")
            timed("x19/3 gate-join+filter", gated)
            mark()
            eng.bind("evalset", docs.where(F.expr(CL._DECONTAM_PRED)).select(
                (F.col("doc_id") + 500000).alias("doc_id"), "text"
            ))
            clean = run(OpSpec(
                "DECONTAMINATE", "clean", ["gated", "evalset"],
                {"n": CL._DECONTAM_N, "mode": "drop"},
            ))
            eng.bind("clean", clean)
            build("x19/4 decontaminate")
            timed("x19/4 decontaminate", clean)
            mark()
            eng.bind("tok", run(OpSpec("TOKEN COUNT", "tok", ["clean"], {})))
            packed = run(OpSpec(
                "PACK SEQUENCES", "packed", ["tok"],
                {"seq_len": CL._X19_SEQ_LEN, "shard_column": "source",
                 "tokens_col": "n_tokens"},
            ))
            eng.bind("packed", packed)
            out = eng.peek("packed")[0].select(
                "doc_id", "source", "n_tokens", "seq_id", "seq_offset"
            )
            build("x19/5 tokcount+pack")
            timed("x19/5 tokcount+pack", out)
            mark()
            print(f"  x19 total {time.time()-t_all:.2f}s", flush=True)

        if "x15" in which:
            clear_shingle_cache()
            spark.catalog.clearCache()
            t_all = time.time(); mark()
            from configurable_etl_python_repo_spark.plans import (
                Engine, OpSpec, ScanSpec,
            )

            eng = Engine(spark)
            eng.run_scan(ScanSpec("docs_raw", "parquet",
                                  CL._pq(args.sf, "documents")))
            eng.bind("docs", eng.peek("docs_raw")[0].select(
                "doc_id", "source", F.expr(CL._URL_INJ).alias("text")
            ))
            run = eng.run_op
            urlkept = run(OpSpec(
                "URL BLOCKLIST", "urlkept", ["docs"],
                {"blocked_domains": list(CL._BLOCKED_DOMAINS),
                 "mode": "drop"},
            )).localCheckpoint(eager=False)
            eng.bind("urlkept", urlkept)
            build("x15/1 url-blocklist")
            timed("x15/1 url-blocklist", urlkept)
            mark()
            sup = run(OpSpec(
                "SURPRISAL SCORE", "sup", ["urlkept"],
                {"id_column": "doc_id"},
            ))
            eng.bind("sup", sup)
            build("x15/2 surprisal")
            timed("x15/2 surprisal", sup)
            mark()
            eng.bind("sup2", run(OpSpec(
                "REMOVE COLUMN", "sup2", ["sup"], {"columns": ["n_words"]},
            )))
            eng.bind("joined", run(OpSpec(
                "INNER JOIN", "joined", ["urlkept", "sup2"],
                {"on": ["doc_id"]},
            )))
            gated = run(OpSpec(
                "FILTER", "gated", ["joined"],
                {"condition":
                 f"avg_surprisal <= NUMBER({CL._X15_SUP_MAX})"},
            )).localCheckpoint(eager=False)
            eng.bind("gated", gated)
            build("x15/3 gate")
            timed("x15/3 gate-join+filter", gated)
            mark()
            dd = run(OpSpec(
                "DEDUP SUBSTRINGS", "dd", ["gated"],
                {"id_column": "doc_id", "k": CL._SPAN_K},
            ))
            eng.bind("dd", dd)
            build("x15/4 substring-dedup")
            timed("x15/4 substring-dedup", dd)
            mark()
            eng.bind("dd2", run(OpSpec(
                "REMOVE COLUMN", "dd2", ["dd"], {"columns": ["n_words"]},
            )))
            eng.bind("src_map", eng.peek("gated")[0].select(
                "doc_id", "source"))
            eng.bind("withsrc", run(OpSpec(
                "INNER JOIN", "withsrc", ["dd2", "src_map"],
                {"on": ["doc_id"]},
            )))
            eng.bind("tok", run(OpSpec(
                "TOKEN COUNT BPE", "tok", ["withsrc"],
                {"text_column": "text_deduped"},
            )))
            packed = run(OpSpec(
                "PACK SEQUENCES", "packed", ["tok"],
                {"seq_len": CL._X15_SEQ_LEN, "shard_column": "source",
                 "tokens_col": "n_tokens"},
            ))
            eng.bind("packed", packed)
            out = run(OpSpec(
                "SELECT COLUMNS", "out", ["packed"],
                {"columns": ["doc_id", "source", "n_tokens", "seq_id",
                             "seq_offset"]},
            ))
            build("x15/5 join+bpe+pack")
            timed("x15/5 join+bpe+pack", out)
            mark()
            print(f"  x15 total {time.time()-t_all:.2f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
