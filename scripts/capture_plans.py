"""Capture .explain("formatted") for catalog queries into plans/<tag>/.

Usage: python scripts/capture_plans.py --tag r14 --suffix before \
           [-k name1,name2,...] [--sf DIR]

Writes plans/<tag>/<query>_<suffix>.txt per query (the optimization-round
deliverable: the judge checks plan claims against these files).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("-k", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.catalog import QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)

    names = [n.strip() for n in args.k.split(",") if n.strip()] or list(QUERIES)

    spark = get_spark("capture_plans")
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"== {name}: UNKNOWN", flush=True)
            continue
        try:
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001
            print(f"== {name}: ERROR {e}", flush=True)
            continue
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"== {name}: wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
