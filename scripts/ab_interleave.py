"""Interleaved A/B prober: alternates tree legs (subprocess per leg, so
each tree imports cleanly) over several rounds and reports per-tree
minima with the calib recorded per leg. On a host with minute-scale
speed swings, interleaving is the only layout where a swing hits both
trees symmetrically; single-leg A/Bs (ab_probe.py back to back) were
measured 3.4x apart in calib within ten minutes this round.

Usage:
  python scripts/ab_interleave.py --tree-a /tmp/ab_r14 --tree-b /root/repo \
      --queries d8_span_dedup,d10_substring_dedup --rounds 3 --repeat 3
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def leg(tree: str, label: str, queries: str, repeat: int) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "scripts", "ab_probe.py"),
         "--label", label, "--queries", queries, "--repeat", str(repeat)],
        capture_output=True, text=True, env=env, cwd=tree, check=False,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from {label}: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree-a", required=True)
    ap.add_argument("--tree-b", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    mins: dict[str, dict[str, float]] = {"a": {}, "b": {}}
    calibs: dict[str, list[float]] = {"a": [], "b": []}
    for r in range(args.rounds):
        for key, tree in (("a", args.tree_a), ("b", args.tree_b)):
            doc = leg(tree, f"{key}{r}", args.queries, args.repeat)
            calibs[key].append(doc["calib_sec"])
            for q, rec in doc["queries"].items():
                cur = mins[key].get(q)
                mins[key][q] = min(cur, rec["min"]) if cur else rec["min"]
            print(f"round {r} leg {key}: calib={doc['calib_sec']} "
                  + " ".join(f"{q}={rec['min']}" for q, rec in
                             doc["queries"].items()), flush=True)
    print(json.dumps({
        "tree_a": args.tree_a, "tree_b": args.tree_b,
        "calib_a": calibs["a"], "calib_b": calibs["b"],
        "min_a": mins["a"], "min_b": mins["b"],
        "ratio_b_over_a": {
            q: round(mins["b"][q] / mins["a"][q], 3) for q in mins["a"]
        },
    }))


if __name__ == "__main__":
    main()
