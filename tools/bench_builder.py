#!/usr/bin/env python3
"""Reproducibility artifact: two consecutive full Bench runs of the same
jar/data/harness -> BENCH_BUILDER_r<N>.json with per-query ratios.
Gate: every query's run1/run2 ratio within 2x.

Usage: python3 tools/bench_builder.py <round> [sfDir]
"""
import json
import os
import subprocess
import sys


def run_bench(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(["sbt", "runMain graft.Bench"], env=env,
                         capture_output=True, text=True)
    for line in (out.stdout + "\n" + out.stderr).splitlines():
        s = line.strip()
        if s.startswith("[info] "):
            s = s[len("[info] "):]
        if s.startswith('{"metric"'):
            return json.loads(s)
    sys.stderr.write(out.stdout[-3000:] + out.stderr[-3000:])
    raise SystemExit("no bench JSON line found")


def main():
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    run1 = run_bench(sf_dir)
    run2 = run_bench(sf_dir)
    qs = set(run1["queries"]) & set(run2["queries"])
    ratios = {}
    for q in qs:
        a, b = run1["queries"][q], run2["queries"][q]
        lo, hi = min(a, b), max(a, b)
        ratios[q] = hi / max(lo, 0.001)
    worst = max(ratios, key=ratios.get)
    artifact = {
        "note": ("two consecutive full bench runs of the same jar/data/harness "
                 "(per-query untimed warm pass + timed min-of-2); "
                 "reproducibility gate = every query within 2x"),
        "max_ratio": round(ratios[worst], 3),
        "worst_query": worst,
        "n_queries": len(qs),
        "n_over_2x": sum(1 for r in ratios.values() if r > 2.0),
        "run1": run1,
        "run2": run2,
    }
    path = f"BENCH_BUILDER_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {path}: n={len(qs)} max_ratio={artifact['max_ratio']} "
          f"({worst}) n_over_2x={artifact['n_over_2x']} "
          f"totals={run1['value']:.1f}/{run2['value']:.1f}s")


if __name__ == "__main__":
    main()
