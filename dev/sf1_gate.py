#!/usr/bin/env python3
"""Standing per-round sf1 gate (r11 verdict item 5).

The r11 sf1 sweep caught two scale-weak parameter points and an
oracle-side blowup that no sf<=0.1 run could see, so it graduates from
a one-off to a scripted gate: regenerate the deterministic x10 stress
fixture from the driver's sf0.1, run the FULL oracle sweep over it,
run the bench surface over it, and record a per-cell artifact
(dev/sf1_gate_r{N}.json) the way the driver records CORRECTNESS_r*.

Usage:
  python3 dev/sf1_gate.py --round 12 [--skip-gen] [--skip-bench]
                          [--only qNN ...]

 - --skip-gen    reuse an existing dev/sf1 fixture (gen_sf1.py is
                 deterministic, so regen is only needed after a driver
                 fixture refresh; the artifact records the fixture
                 fingerprint either way).
 - --skip-bench  correctness sweep only.
 - --only        restrict both sweeps to the named queries (triage).

Exit code: nonzero iff any correctness FAIL (bench ratios are recorded,
not gated — the per-cell ratio table is what the round review reads).
"""
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SF1 = os.path.join(HERE, "sf1")
ARGS = sys.argv[1:]


def flag(name):
    return f"--{name}" in ARGS


def opt(name, default):
    if f"--{name}" in ARGS:
        return ARGS[ARGS.index(f"--{name}") + 1]
    return default


RND = opt("round", "0")
ONLY = ARGS[ARGS.index("--only") + 1:] if "--only" in ARGS else []
OUT = os.path.join(HERE, f"sf1_gate_r{RND}.json")


def fingerprint(d):
    out = []
    for f in sorted(os.listdir(d)):
        p = os.path.join(d, f)
        out.append(f"{f}:{os.path.getsize(p)}:{int(os.path.getmtime(p))}")
    return ";".join(out)


def main():
    artifact = {"round": int(RND), "fixture": SF1}

    if not flag("skip-gen"):
        print("[sf1_gate] regenerating fixture ...", flush=True)
        r = subprocess.run([sys.executable, os.path.join(HERE, "gen_sf1.py"),
                            "/root/testdata/sf0.1", SF1], cwd=REPO)
        if r.returncode != 0:
            print("[sf1_gate] gen_sf1.py failed"); sys.exit(1)
    artifact["fixture_fingerprint"] = fingerprint(SF1)

    # -- correctness sweep (check.py = the driver's own gate logic) --
    print("[sf1_gate] oracle sweep ...", flush=True)
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "check.py"), SF1,
         "/tmp/graft_sf1_verify"] + ONLY,
        cwd=REPO, capture_output=True, text=True)
    cells, failures = {}, []
    for line in r.stdout.splitlines():
        m = re.match(r"(PASS|FAIL|ROWS-ONLY) (\S+?):? (.*)", line)
        if m:
            status, name = m.group(1), m.group(2).rstrip(":")
            cells[name] = status
            if status == "FAIL":
                failures.append(line.strip())
    tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    harness_crash = not re.match(r"== \d+ pass, \d+ fail ==", tail)
    print(f"[sf1_gate] {tail}" +
          (" (HARNESS CRASH — sweep incomplete)" if harness_crash else ""),
          flush=True)
    artifact["correctness"] = {
        "summary": tail,
        "harness_crash": harness_crash,
        "n_pass": sum(1 for v in cells.values() if v == "PASS"),
        "n_fail": sum(1 for v in cells.values() if v == "FAIL"),
        "n_rows_only": sum(1 for v in cells.values() if v == "ROWS-ONLY"),
        "cells": cells,
        "failures": failures,
        "check_rc": r.returncode,
    }
    if r.returncode != 0 and not failures:
        # harness-level failure (verify crash) — keep the evidence
        artifact["correctness"]["stderr_tail"] = r.stderr[-3000:]

    # -- bench sweep + per-cell decade ratios vs the sf0.1 reference --
    if not flag("skip-bench"):
        print("[sf1_gate] bench sweep ...", flush=True)
        opens = []
        for p in ["java.lang", "java.lang.invoke", "java.lang.reflect",
                  "java.io", "java.net", "java.nio", "java.util",
                  "java.util.concurrent", "java.util.concurrent.atomic",
                  "sun.nio.ch", "sun.nio.cs", "sun.security.action",
                  "sun.util.calendar"]:
            opens.append(f"--add-opens=java.base/{p}=ALL-UNNAMED")
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF1)
        if ONLY:
            env["SPARK_GRAFT_ONLY"] = ",".join(ONLY)
        rb = subprocess.run(
            ["java"] + opens +
            ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
             "-Xmx24g", "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
             "graft.Bench"],
            cwd=REPO, env=env, capture_output=True, text=True)
        bench = {}
        for line in rb.stdout.splitlines():
            try:
                j = json.loads(line)
            except ValueError:
                continue
            if j.get("metric") == "total" and "queries" in j:
                bench = j
        if bench:
            ref = json.load(open(os.path.join(HERE, "bench_reference.json")))
            refq = ref.get("queries", {})
            ratios = {}
            for name, dt in bench["queries"].items():
                r0 = refq.get(name)
                if dt and dt > 0 and r0:
                    ratios[name] = round(dt / r0, 2)
            top = sorted(ratios.items(), key=lambda kv: -kv[1])[:12]
            artifact["bench"] = {
                "total_sec": round(bench["value"], 2),
                "n_queries": len(bench["queries"]),
                "n_failed": sum(1 for v in bench["queries"].values() if v < 0),
                "queries": {k: round(v, 3) for k, v in bench["queries"].items()},
                "decade_ratio_vs_sf01_reference": ratios,
                "overall_ratio": round(
                    bench["value"] / ref["value"], 2) if ref.get("value") else None,
                "top_ratios": top,
            }
            print(f"[sf1_gate] bench total {artifact['bench']['total_sec']} s, "
                  f"overall ratio {artifact['bench']['overall_ratio']}, "
                  f"top cells {top[:4]}", flush=True)
        else:
            artifact["bench"] = {"error": rb.stdout[-2000:] + rb.stderr[-2000:]}

    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"[sf1_gate] wrote {OUT}", flush=True)
    bad = artifact["correctness"]["n_fail"] or artifact["correctness"]["harness_crash"]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
