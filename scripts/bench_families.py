#!/usr/bin/env python3
"""Compose the round-end bench artifact from per-family FRESH-JVM runs.

Why: a single 278-query JVM accumulates heap/JIT/codegen-cache pressure
that inflates heavy gates 2-4x vs their isolated cost (r13 judge
measurement: knn_lsh_deleted 3.46s in-suite vs 0.89s isolated), so
in-suite medians cannot distinguish a real regression from suite
pressure. This orchestrator bin-packs the query set into N batches,
runs each batch as its own JVM (graft.Bench with
SPARK_GRAFT_BENCH_FILTER + SPARK_GRAFT_BENCH_EXACT=1), and composes one
artifact, bench/families_latest.json, whose per-query min/median are
fresh-JVM numbers.

COMPARISON RULE (the committed protocol): round-over-round per-query
regression calls are based on families_latest.json ONLY. The full-suite
line (bench/full_latest.json, written by an unfiltered graft.Bench) is
kept as the whole-suite-throughput headline; a per-query delta seen
there but absent from the families artifact is shared-JVM suite
pressure, not a regression.

Usage: python3 scripts/bench_families.py [--sf DIR] [--batches N]
          [--reps N] [--names-from JSON] [--out FILE]
Query names come from --names-from (a JSON object whose keys are query
names — a Verify outDir's oracle_sql.json, the authoritative set) and
fall back to bench/full_latest.json's "queries" keys. Batch packing is
greedy longest-processing-time using the previous artifact's medians as
estimates (new queries default to 1s), so batch wall-times stay even.
"""
import argparse, json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# HOST-DRIFT CANARY (committed protocol, round 16+): a PINNED batch of
# stable, multi-second, rarely-touched queries spanning the major
# families (graph, OLAP, streaming, dedup-LSH, multimodal, sink,
# components, anomaly). Run fresh-JVM min-of-3 as ONE batch every
# round -> bench/canary_latest.json + a line in
# bench/canary_history.jsonl. Round-over-round normalization rule (see
# BASELINE.md): host_ratio = canary_total(now) / canary_total(prev
# round's history line); per-query regression thresholds on
# families_latest.json scale by that ratio. DO NOT edit this list
# without recording a fresh reference point in the same commit —
# comparability is the whole point.
CANARY = [
    "d3b_minhash_bands", "d6d_components_star", "event_anomalies",
    "graph_pagerank", "mm_jpeg_neardup", "s8_patch_roundtrip",
    "stream_sessionize_exec", "table_stats",
]

ADD_OPENS_PKGS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def load_names(path):
    with open(path) as f:
        return sorted(json.load(f).keys())


def load_estimates():
    """Previous medians (any source is fine — only used for packing)."""
    for fname in ("families_latest.json", "full_latest.json"):
        p = os.path.join(REPO, "bench", fname)
        if os.path.exists(p):
            try:
                d = json.load(open(p))
                m = d.get("queries_median") or d.get("queries") or {}
                if m:
                    return m
            except (ValueError, OSError):
                pass
    return {}


def pack(names, est, nbatches):
    """Greedy LPT bin-packing by estimated median."""
    batches = [[] for _ in range(nbatches)]
    loads = [0.0] * nbatches
    for name in sorted(names, key=lambda n: -est.get(n, 1.0)):
        i = loads.index(min(loads))
        batches[i].append(name)
        loads[i] += est.get(name, 1.0)
    return [sorted(b) for b in batches if b]


def run_batch(batch, sf, cpus, reps, mem):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_REPS=str(reps),
               SPARK_GRAFT_BENCH_FILTER=",".join(batch),
               SPARK_GRAFT_BENCH_EXACT="1")
    cmd = ["java"]
    for p in ADD_OPENS_PKGS:
        cmd += ["--add-opens", p + "=ALL-UNNAMED"]
    cmd += ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            f"-Xmx{mem}",
            "-cp", os.path.join(REPO, "target/scala-2.13/classes")
            + ":/opt/spark/jars/*",
            "graft.Bench"]
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                          text=True)
    wall = time.time() - t0
    line = next((l for l in proc.stdout.splitlines()
                 if l.startswith('{"metric"')), None)
    if proc.returncode != 0 or line is None:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
        raise SystemExit(f"batch failed (rc={proc.returncode}): "
                         f"{batch[:3]}... ({len(batch)} queries)")
    return json.loads(line), wall


def run_canary(args):
    """One fresh-JVM min-of-reps run of the pinned CANARY batch ->
    bench/canary_latest.json + an append-only history line. Cheap
    (~2 min), so it runs before every families composition AND can run
    standalone (--canary-only) to normalize an ad-hoc comparison."""
    res, wall = run_batch(CANARY, args.sf, args.cpus, args.reps, args.mem)
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         cwd=REPO, capture_output=True,
                         text=True).stdout.strip()
    art = {
        "metric": "canary_total",
        "value": round(sum(res["queries"][q] for q in CANARY
                           if q in res["queries"]), 3),
        "unit": "sec",
        "reps": args.reps,
        "queries": {q: res["queries"][q] for q in CANARY
                    if q in res["queries"]},
        "queries_median": {q: res["queries_median"][q] for q in CANARY
                           if q in res["queries_median"]},
        "sf": args.sf,
        "git_rev": rev,
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "protocol": "pinned fresh-JVM canary batch; host_ratio = "
                    "value(now)/value(previous history line); scale "
                    "families_latest.json regression thresholds by "
                    "host_ratio (BASELINE.md round-16 protocol)",
    }
    with open(os.path.join(REPO, "bench/canary_latest.json"), "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    with open(os.path.join(REPO, "bench/canary_history.jsonl"), "a") as f:
        f.write(json.dumps(art, sort_keys=True) + "\n")
    hist = [json.loads(l) for l in
            open(os.path.join(REPO, "bench/canary_history.jsonl"))]
    line = f"canary: {art['value']:.1f}s (wall {wall:.0f}s, rev {rev})"
    if len(hist) > 1:
        prev = hist[-2]
        line += (f"; host_ratio vs {prev['git_rev']} "
                 f"({prev['value']:.1f}s) = "
                 f"{art['value'] / prev['value']:.3f}")
    print(line)
    return art


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--mem", default=os.environ.get("SPARK_DRIVER_MEM", "8g"))
    ap.add_argument("--names-from", default="/tmp/verify_out/oracle_sql.json")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "bench/families_latest.json"))
    ap.add_argument("--canary-only", action="store_true",
                    help="run just the pinned canary batch and exit")
    ap.add_argument("--skip-canary", action="store_true")
    args = ap.parse_args()

    if args.canary_only:
        run_canary(args)
        return
    if not args.skip_canary:
        run_canary(args)

    names_src = args.names_from
    if not os.path.exists(names_src):
        names_src = os.path.join(REPO, "bench/full_latest.json")
        names = sorted(json.load(open(names_src))["queries"].keys())
    else:
        names = load_names(names_src)
    est = load_estimates()
    batches = pack(names, est, args.batches)
    print(f"{len(names)} queries -> {len(batches)} fresh-JVM batches "
          f"(estimates from previous artifact: {len(est)} known)")

    mins, meds, batch_of, batch_wall = {}, {}, {}, []
    for i, batch in enumerate(batches):
        res, wall = run_batch(batch, args.sf, args.cpus, args.reps, args.mem)
        for q in batch:
            if q in res["queries"]:
                mins[q] = res["queries"][q]
                meds[q] = res["queries_median"][q]
                batch_of[q] = i
        batch_wall.append(round(wall, 1))
        print(f"  batch {i}: {len(batch)} queries, "
              f"timed sum {sum(res['queries'].values()):.1f}s, "
              f"wall {wall:.0f}s")

    missing = [q for q in names if q not in mins]
    if missing:
        sys.stderr.write(f"WARNING: {len(missing)} queries not timed: "
                         f"{missing}\n")
    artifact = {
        "metric": "families_total",
        "value": sum(mins.values()),
        "unit": "sec",
        "reps": args.reps,
        "batches": len(batches),
        "protocol": "per-query numbers are from FRESH-JVM batch runs "
                    "(SPARK_GRAFT_BENCH_FILTER exact mode); regression "
                    "calls use THIS file, full_latest.json is the "
                    "whole-suite-throughput headline only",
        "queries": mins,
        "queries_median": meds,
        "batch_of": batch_of,
        "batch_wall_sec": batch_wall,
        "sf": args.sf,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}: {len(mins)} queries, "
          f"sum-of-mins {artifact['value']:.1f}s")


if __name__ == "__main__":
    main()
