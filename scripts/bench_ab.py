#!/usr/bin/env python3
"""Interleaved old-jar/new-jar A/B bench (r20).

The host's same-code run-to-run spread (0.95x-1.28x on shared-subset
totals across r17-r19) exceeds any regression we care about, so raw
cross-round totals cannot arbitrate performance. This harness
institutionalizes the r14 lesson: run the PREVIOUS round's assembled
jar and the CURRENT jar alternately within one session (O N O N ...),
pair each old run with the new run that follows it, and report paired
per-query ratios - ambient load shifts hit both sides of a pair and
cancel; a structural regression does not.

Usage:
  python3 scripts/bench_ab.py <old.jar> <new.jar> [pairs] [sfdir] [out.json]
  python3 scripts/bench_ab.py --merge <ab.json> <bench_rN_local.json>

The first form runs 2*pairs Bench invocations (each = 2 warmup passes
+ SPARK_GRAFT_BENCH_REPS timed passes; reps floor is 3 in Bench) and
writes the paired report. The second form folds the report into a
round's bench_rN_local.json as its "paired_vs_prev" field.
"""
import json
import math
import os
import re
import statistics
import subprocess
import sys

ADD_OPENS_PKGS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def run_bench(jar, tag, idx, sfdir):
    qfile = f"/tmp/ab_queries_{tag}_{idx}.json"
    sfile = f"/tmp/ab_samples_{tag}_{idx}.json"
    # Remove stale sidecars from a previous invocation: existence of
    # qfile AFTER the run is how we detect an r20-format jar, so a
    # leftover file would be silently read as this run's data when the
    # launched jar (r19-era) does not write it (r20 ADVICE).
    for path in (qfile, sfile):
        if os.path.exists(path):
            os.remove(path)
    env = os.environ.copy()
    env.update({
        "SPARK_GRAFT_SF_DIR": sfdir,
        "SPARK_GRAFT_CPUS": env.get("SPARK_GRAFT_CPUS", "32"),
        "SPARK_GRAFT_BENCH_REPS": env.get("AB_REPS", "3"),
        "SPARK_GRAFT_QUIET_WAIT_SEC": "60",
        "SPARK_GRAFT_BENCH_SAMPLES": sfile,
        "SPARK_GRAFT_BENCH_QUERIES_FILE": qfile,
    })
    cmd = ["java"]
    for p in ADD_OPENS_PKGS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Xmx" + env.get("SPARK_DRIVER_MEM", "8g"),
            "-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC",
            "-cp", f"{jar}:/opt/spark/jars/*", "graft.Bench"]
    print(f"[ab] run {tag}#{idx}: {os.path.basename(jar)}", flush=True)
    res = subprocess.run(cmd, capture_output=True, text=True, env=env)
    # Per-query medians live in the queries sidecar (r20 Bench) or in
    # the single stdout JSON line (r19 Bench and earlier).
    payload = None
    if os.path.exists(qfile):
        with open(qfile) as f:
            payload = json.load(f)
    else:
        for line in res.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                payload = json.loads(line)
    if not payload or "queries" not in payload:
        sys.stderr.write(res.stdout[-2000:] + "\n" + res.stderr[-2000:])
        raise SystemExit(f"no per-query payload from {jar} run {idx}")
    if payload.get("failed"):
        raise SystemExit(f"failed queries in {jar} run {idx}: "
                         f"{payload['failed']}")
    return {k: float(v) for k, v in payload["queries"].items()}, \
        payload.get("load_max", -1)


def ab(old_jar, new_jar, pairs, sfdir, out_path):
    runs = []  # (tag, queries, load_max) in execution order
    by_pair = []  # (old_queries, new_queries) regardless of order
    for i in range(pairs):
        # Balanced within-pair order (r20 verdict task): O N on even
        # pairs, N O on odd — a position effect (e.g. the session that
        # runs second inheriting a warmer page cache) then hits old and
        # new symmetrically across pairs instead of always favoring one
        # side.
        order = (("old", old_jar), ("new", new_jar)) if i % 2 == 0 \
            else (("new", new_jar), ("old", old_jar))
        got = {}
        for tag, jar in order:
            q, load = run_bench(jar, tag, i, sfdir)
            runs.append((tag, q, load))
            got[tag] = q
        by_pair.append((got["old"], got["new"]))
        if i == 0:
            early = set(got["old"]) & set(got["new"])
            if not early:
                raise SystemExit(
                    "[ab] the two jars share no query names - aborting "
                    "after the first pair (raw maps kept in /tmp/"
                    "ab_queries_*.json for salvage)")
    shared = sorted(set.intersection(
        *[set(q.keys()) for _, q, _ in runs]))
    if not shared:
        raise SystemExit("[ab] no shared queries across all runs")
    per_query = {}
    pair_total_ratios = []
    for i in range(pairs):
        old_q, new_q = by_pair[i]
        t_old = sum(old_q[k] for k in shared)
        t_new = sum(new_q[k] for k in shared)
        pair_total_ratios.append(t_new / t_old)
        for k in shared:
            per_query.setdefault(k, {"old": [], "new": []})
            per_query[k]["old"].append(round(old_q[k], 4))
            per_query[k]["new"].append(round(new_q[k], 4))
    for k, d in per_query.items():
        rs = [n / o for o, n in zip(d["old"], d["new"])]
        d["ratio"] = round(statistics.median(rs), 4)
    ratios = [d["ratio"] for d in per_query.values()]
    geomean = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    report = {
        "protocol": "interleaved paired A/B, old/new alternating in one "
                    "session; ratio = median over pairs of new/old",
        "old_jar": os.path.basename(old_jar),
        "new_jar": os.path.basename(new_jar),
        "sf": sfdir,
        "pairs": pairs,
        "shared_queries": len(shared),
        "load_max_per_run": [r[2] for r in runs],
        "paired_total_ratio": round(statistics.median(pair_total_ratios), 4),
        "pair_total_ratios": [round(r, 4) for r in pair_total_ratios],
        "geomean_query_ratio": round(geomean, 4),
        "regressed_over_1.3": sorted(
            k for k, d in per_query.items() if d["ratio"] > 1.3),
        "improved_under_0.77": sorted(
            k for k, d in per_query.items() if d["ratio"] < 0.77),
        "per_query": per_query,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=False)
    print(f"[ab] paired_total_ratio={report['paired_total_ratio']} "
          f"geomean={report['geomean_query_ratio']} -> {out_path}")


def merge(ab_path, bench_path):
    with open(ab_path) as f:
        report = json.load(f)
    with open(bench_path) as f:
        bench = json.load(f)
    bench["paired_vs_prev"] = {
        k: report[k] for k in (
            "protocol", "old_jar", "new_jar", "pairs", "shared_queries",
            "paired_total_ratio", "pair_total_ratios",
            "geomean_query_ratio", "regressed_over_1.3",
            "improved_under_0.77")}
    bench["paired_vs_prev"]["per_query_ratio"] = {
        k: d["ratio"] for k, d in report["per_query"].items()}
    with open(bench_path, "w") as f:
        json.dump(bench, f, indent=None, separators=(",", ":"))
    print(f"[ab] merged paired_vs_prev into {bench_path}")


if __name__ == "__main__":
    if sys.argv[1] == "--merge":
        merge(sys.argv[2], sys.argv[3])
    else:
        old_jar, new_jar = sys.argv[1], sys.argv[2]
        pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        sfdir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
        out = sys.argv[5] if len(sys.argv) > 5 else "/tmp/ab_report.json"
        ab(old_jar, new_jar, pairs, sfdir, out)
