"""Interleaved bench.py A/B — the round-3 verdict's reconciliation
protocol ("Next round" #3).

BENCH_r03.json (driver snapshot) read ~10-20% slower than BENCH_r02.json
across queries the round never touched, while the builder's same-session
A/B showed the round-3 code FASTER — the signature of the documented
±20% box drift.  This runner settles it the way the verdict prescribed:
run bench.py from the CURRENT repo and from a worktree pinned at the r2
close commit (e4a8a12) strictly interleaved (A B A B A B ...), same
box phase, and report per-query MEDIANS of >=3 runs each.

Usage:  python BENCH/bench_ab.py [--runs 3] [--r2-worktree /tmp/wt_r2]
Writes: BENCH/bench_ab_result.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(repo_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(repo_dir, "bench.py")],
        cwd=repo_dir, capture_output=True, text=True, timeout=1800,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def medians(runs: list[dict]) -> dict:
    qs = {}
    for q in runs[0]["queries"]:
        qs[q] = round(statistics.median(r["queries"][q] for r in runs), 2)
    return {
        "total_median": round(statistics.median(r["value"] for r in runs), 2),
        "totals": [r["value"] for r in runs],
        "queries": qs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--r2-worktree", default="/tmp/wt_r2")
    args = ap.parse_args()

    cur_runs, r2_runs = [], []
    for i in range(args.runs):
        cur = run_bench(REPO)
        cur_runs.append(cur)
        print(f"run {i + 1} current: total={cur['value']}", flush=True)
        r2 = run_bench(args.r2_worktree)
        r2_runs.append(r2)
        print(f"run {i + 1} r2     : total={r2['value']}", flush=True)

    cur_m, r2_m = medians(cur_runs), medians(r2_runs)
    shared = sorted(set(cur_m["queries"]) & set(r2_m["queries"]))
    per_q = {
        q: {
            "current": cur_m["queries"][q],
            "r2": r2_m["queries"][q],
            "ratio": round(cur_m["queries"][q] / r2_m["queries"][q], 3),
        }
        for q in shared
    }
    result = {
        "current": cur_m,
        "r2_e4a8a12": r2_m,
        "shared_queries": per_q,
        "shared_total_current": round(
            sum(cur_m["queries"][q] for q in shared), 2),
        "shared_total_r2": round(sum(r2_m["queries"][q] for q in shared), 2),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH", "bench_ab_result.json"), "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
