#!/usr/bin/env python3
"""A/B micro-bench harness — the CLAUDE.md discipline, mechanized.

Host contention swings absolute bench numbers 2-3x between sessions, so a
"regression" vs a prior round's BENCH_r{N}.json means nothing without a
back-to-back A/B of both commits in ONE session. This tool does exactly
that: build each commit in its own git worktree, run the SAME query list
through graft.Bench (SPARK_GRAFT_BENCH_ONLY) alternating A,B per round,
and print a per-query table of medians.

Usage:
  python3 tools/ab.py <commitA> <commitB> <q1,q2,...> \
      [--sf /root/testdata/sf0.1] [--cpus 32] [--rounds 3]

Commits can be any git refs (HEAD, HEAD~1, a sha, a branch). Worktrees
live under /tmp/graft_ab_<shortsha> and are reused across invocations
(delete them to force a fresh checkout; `git worktree prune` afterwards).
"""
import argparse
import json
import re
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def sh(cmd, cwd=None, env=None, capture=False):
    return subprocess.run(
        cmd, cwd=cwd, env=env, check=True,
        stdout=subprocess.PIPE if capture else None,
        stderr=subprocess.STDOUT if capture else None, text=True)


def worktree_for(ref):
    sha = sh(["git", "rev-parse", "--short", ref], cwd=REPO,
             capture=True).stdout.strip()
    wt = Path(f"/tmp/graft_ab_{sha}")
    if not wt.exists():
        sh(["git", "worktree", "add", "--detach", str(wt), sha], cwd=REPO)
    print(f"[ab] compiling {ref} ({sha}) in {wt} ...", flush=True)
    sh(["sbt", "-batch", "compile"], cwd=wt, capture=True)
    return sha, wt


def run_bench(wt, queries, sf, cpus):
    import os
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_BENCH_ONLY=",".join(queries))
    out = sh(["sbt", "-batch", "runMain graft.Bench"], cwd=wt, env=env,
             capture=True).stdout
    for line in out.splitlines():
        # r14 lines lead with "metric" (driver contract), pre-r14 with
        # "queries" — match either, A/B worktrees span both formats.
        m = re.search(r'\{"(?:queries|metric)":.*\}\s*$', line)
        if m:
            return json.loads(m.group(0))["queries"]
    sys.exit(f"[ab] no bench JSON line in output from {wt}:\n{out[-3000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("commit_a")
    ap.add_argument("commit_b")
    ap.add_argument("queries", help="comma-separated SparkEntry query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    queries = args.queries.split(",")

    sha_a, wt_a = worktree_for(args.commit_a)
    sha_b, wt_b = worktree_for(args.commit_b)

    runs_a, runs_b = [], []
    for r in range(args.rounds):
        print(f"[ab] round {r + 1}/{args.rounds}: A={sha_a}", flush=True)
        runs_a.append(run_bench(wt_a, queries, args.sf, args.cpus))
        print(f"[ab] round {r + 1}/{args.rounds}: B={sha_b}", flush=True)
        runs_b.append(run_bench(wt_b, queries, args.sf, args.cpus))

    def med(runs, q):
        vals = [r[q] for r in runs if q in r]
        return statistics.median(vals) if vals else float("nan")

    wq = max(len(q) for q in queries)
    print(f"\n{'query'.ljust(wq)}  A={sha_a:>9}  B={sha_b:>9}   B/A")
    tot_a = tot_b = 0.0
    for q in queries:
        a, b = med(runs_a, q), med(runs_b, q)
        tot_a += a
        tot_b += b
        ratio = b / a if a else float("nan")
        print(f"{q.ljust(wq)}  {a:9.3f}s  {b:9.3f}s  {ratio:5.2f}")
    print(f"{'TOTAL'.ljust(wq)}  {tot_a:9.3f}s  {tot_b:9.3f}s  "
          f"{(tot_b / tot_a if tot_a else float('nan')):5.2f}")
    print(f"[ab] medians of {args.rounds} interleaved rounds; "
          "within ±25% is host noise (CLAUDE.md r5 measurement)")


if __name__ == "__main__":
    main()
