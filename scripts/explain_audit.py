"""Plan audit: prints the scale-relevant physical-plan properties of every
headline query — pushed filters, read schemas, join strategies, window
top-k pushdown, exchange counts. Run after any operator change; a scan
reading all columns for a two-column projection, or a broadcast that became
a sort-merge join, shows up here before it shows up in bench numbers.

Usage: python scripts/explain_audit.py [-k substring] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERESTING = re.compile(
    r"PushedFilters: \[[^\]]*\]|ReadSchema: [^\n,]*|PartitionFilters: \[[^\]]*\]"
)
NODES = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin"
    r"|WindowGroupLimit|TakeOrderedAndProject|Exchange hashpartitioning"
    r"|Exchange rangepartitioning|BroadcastExchange|HashAggregate|SortAggregate"
    r"|ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas)\b"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from configurable_etl_python_repo_spark import get_spark
    from configurable_etl_python_repo_spark.catalog import QUERIES

    spark = get_spark("explain_audit")
    for name, fn in QUERIES.items():
        if args.k not in name:
            continue
        try:
            plan = fn(spark, args.sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"== {name}: ERROR {e}")
            continue
        node_counts: dict[str, int] = {}
        for m in NODES.finditer(plan):
            node_counts[m.group(0)] = node_counts.get(m.group(0), 0) + 1
        print(f"== {name}")
        print("   nodes:", dict(sorted(node_counts.items())))
        for m in INTERESTING.finditer(plan):
            frag = m.group(0)
            if frag not in ("PushedFilters: []", "PartitionFilters: []"):
                print("   ", frag[:150])
    spark.stop()


if __name__ == "__main__":
    main()
