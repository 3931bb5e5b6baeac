#!/usr/bin/env python3
"""Reproducibility artifact: two full Bench runs of the same jar/data/
harness -> BENCH_BUILDER_r<N>.json with per-query ratios.
Gate: every query's run1/run2 ratio within 2x.

Default mode is INTERLEAVED (VERDICT r12 #2): the two runs are two
concurrent JVMs that alternate per-query turns through a file baton
(SPARK_GRAFT_BENCH_LOCKSTEP / _ROLE in graft.Bench), so both sample the
SAME wall-clock windows and box-level drift cancels in the ratio —
BENCH_DRIFT_r12.md showed two SEQUENTIAL runs expose that drift
maximally (totals, worst queries and the calibration sentinel all move
together). Only one JVM computes at a time; the other polls a file.

The JVMs launch as plain `java -cp` (not sbt) because two sbt processes
would contend on the project lock; run `sbt compile` first.

Usage: python3 tools/bench_builder.py <round> [sfDir] [--sequential]
"""
import json
import os
import subprocess
import sys
import tempfile

JAVA_OPTS = [
    "--add-opens=java.base/java.lang=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
    "--add-opens=java.base/java.io=ALL-UNNAMED",
    "--add-opens=java.base/java.net=ALL-UNNAMED",
    "--add-opens=java.base/java.nio=ALL-UNNAMED",
    "--add-opens=java.base/java.util=ALL-UNNAMED",
    "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
    "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
    "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
    "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
    "-Dspark.ui.enabled=false",
    "-Dspark.sql.session.timeZone=UTC",
    "-Xmx" + os.environ.get("SPARK_DRIVER_MEM", "8g"),
    "-Xss32m",
]
CLASSPATH = "target/scala-2.13/classes:/opt/spark/jars/*"


def parse_bench_json(text):
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("[info] "):
            s = s[len("[info] "):]
        if s.startswith('{"metric"'):
            return json.loads(s)
    return None


def run_bench_sbt(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(["sbt", "runMain graft.Bench"], env=env,
                         capture_output=True, text=True)
    r = parse_bench_json(out.stdout + "\n" + out.stderr)
    if r is None:
        sys.stderr.write(out.stdout[-3000:] + out.stderr[-3000:])
        raise SystemExit("no bench JSON line found")
    return r


def run_pair_interleaved(sf_dir):
    lock_dir = tempfile.mkdtemp(prefix="graft-lockstep-")
    procs = {}
    outs = {}
    for role in ("A", "B"):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_BENCH_LOCKSTEP=lock_dir,
                   SPARK_GRAFT_BENCH_ROLE=role)
        # output goes to FILES, never PIPE: Spark logs megabytes to
        # stderr, and an undrained 64KB pipe would block the JVM (the
        # builder only reads role A while role B still runs)
        out_f = open(os.path.join(lock_dir, f"out-{role}.log"), "w")
        err_f = open(os.path.join(lock_dir, f"err-{role}.log"), "w")
        outs[role] = (out_f, err_f)
        procs[role] = subprocess.Popen(
            ["java"] + JAVA_OPTS + ["-cp", CLASSPATH, "graft.Bench"],
            env=env, stdout=out_f, stderr=err_f, text=True)
    results = {}
    for role, p in procs.items():
        try:
            rc = p.wait(timeout=7200)
        except subprocess.TimeoutExpired:
            # kill BOTH sides: a hung role would otherwise orphan two
            # JVMs holding the box (and the peer would spin on the
            # baton until its own stuck-detector fired mid-suite)
            for other in procs.values():
                if other.poll() is None:
                    other.kill()
            raise SystemExit(f"interleaved bench role {role} timed out")
        out_f, err_f = outs[role]
        out_f.close()
        err_f.close()
        with open(os.path.join(lock_dir, f"out-{role}.log")) as f:
            out = f.read()
        r = parse_bench_json(out)
        if rc != 0 or r is None:
            with open(os.path.join(lock_dir, f"err-{role}.log")) as f:
                err = f.read()
            sys.stderr.write(f"--- role {role} rc={rc} ---\n")
            sys.stderr.write(out[-2000:] + err[-4000:] + "\n")
            for other in procs.values():
                if other.poll() is None:
                    other.kill()
            raise SystemExit(f"interleaved bench role {role} failed")
        results[role] = r
    return results["A"], results["B"]


def main():
    rnd = int(sys.argv[1])
    args = [a for a in sys.argv[2:] if not a.startswith("--")]
    sequential = "--sequential" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    if sequential:
        run1, run2 = run_bench_sbt(sf_dir), run_bench_sbt(sf_dir)
        note = ("two consecutive full bench runs of the same jar/data/harness "
                "(per-query untimed warm pass + timed min-of-2); "
                "reproducibility gate = every query within 2x")
    else:
        run1, run2 = run_pair_interleaved(sf_dir)
        note = ("INTERLEAVED pair: two concurrent JVMs alternate per-query "
                "turns through a file baton, so both sample the same "
                "wall-clock windows and box drift cancels in the ratio "
                "(per-query untimed warm pass + timed converged min); "
                "reproducibility gate = every query within 2x")
    qs = set(run1["queries"]) & set(run2["queries"])
    ratios = {}
    for q in qs:
        a, b = run1["queries"][q], run2["queries"][q]
        lo, hi = min(a, b), max(a, b)
        ratios[q] = hi / max(lo, 0.001)
    worst = max(ratios, key=ratios.get)
    artifact = {
        "note": note,
        "mode": "sequential" if sequential else "interleaved",
        "max_ratio": round(ratios[worst], 3),
        "worst_query": worst,
        "n_queries": len(qs),
        "n_over_2x": sum(1 for r in ratios.values() if r > 2.0),
        "n_over_1_4x": sum(1 for r in ratios.values() if r > 1.4),
        "run1": run1,
        "run2": run2,
    }
    path = f"BENCH_BUILDER_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {path}: n={len(qs)} max_ratio={artifact['max_ratio']} "
          f"({worst}) n_over_2x={artifact['n_over_2x']} "
          f"n_over_1.4x={artifact['n_over_1_4x']} "
          f"totals={run1['value']:.1f}/{run2['value']:.1f}s")


if __name__ == "__main__":
    main()
