#!/usr/bin/env python3
"""Local dev oracle-check: mimic the driver's t2 gate.

Usage: python3 dev/check.py [sfDir] [outDir] [--skip-verify] [query...]

Runs graft.Verify (Spark) on sfDir -> outDir, then replays every
oracle_sql.json entry in DuckDB over the same parquet tables and
compares: columns sorted by name, row order as produced, exact value
equality (floats compared bitwise).
"""
import json, math, subprocess, sys, os, glob

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
FLAGS = set(a for a in sys.argv[3:] if a.startswith("--"))
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", p + "=ALL-UNNAMED"]


def run_verify():
    cmd = (["java"] + ADD_OPENS +
           ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-Xmx8g", "-cp",
            "target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Verify", SF_DIR, OUT_DIR])
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print(line)
    if r.returncode != 0:
        print("VERIFY FAILED rc=", r.returncode)
        print(r.stderr[-3000:])
        sys.exit(1)


def norm(v):
    if isinstance(v, float):
        return ("f", v.hex() if not math.isnan(v) else "nan")
    return v


# The driver's hash is representation-sensitive: DuckDB sum(BIGINT)
# yields HUGEINT while Spark emits BIGINT, and Python-int comparison
# hides the difference (that blind spot shipped 7 hash-fails in r4).
# Normalize ordinary integer widths, then require the oracle's output
# types to match the Spark parquet's — HUGEINT/UHUGEINT never
# normalize, so an un-cast integer sum now fails locally.
_INT_WIDTHS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER"}


def norm_type(t):
    t = str(t).upper()
    return "BIGINT" if t in _INT_WIDTHS else t


def type_mismatches(gcols, gtypes, gi, ecols, etypes, ei):
    out = []
    for i, j in zip(gi, ei):
        gt, et = norm_type(gtypes[i]), norm_type(etypes[j])
        if gt != et:
            out.append(f"{ecols[j]}: spark={gtypes[i]} duck={etypes[j]}")
    return out


def main():
    if "--skip-verify" not in FLAGS:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    # Iterate the REGISTERED roster, not the outDir listing: a query
    # that failed Spark-side leaves no output dir, and skipping it
    # would under-count failures (that blind spot hid 19 breakages
    # when the events fixture changed physical ts type).
    reg_path = os.path.join(OUT_DIR, "_registered.json")
    if os.path.exists(reg_path):
        registered = json.load(open(reg_path))
    else:
        print("WARNING: no _registered.json in outDir (pre-roster Verify "
              "build or interrupted run) — Spark-side failures are "
              "UNDETECTABLE in this mode")
        registered = sorted(n for n in os.listdir(OUT_DIR)
                            if os.path.isdir(os.path.join(OUT_DIR, n)))
    names = ONLY or registered
    n_pass = n_fail = 0
    for name in names:
        d = os.path.join(OUT_DIR, name)
        if not os.path.isdir(d):
            print(f"FAIL {name}: no output dir (Spark-side failure)")
            n_fail += 1
            continue
        files = glob.glob(d + "/*.parquet")
        if not files:
            print(f"FAIL {name}: no output parquet"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet('{files[0]}')")
        gcols, gtypes = got.columns, got.types
        grows = got.fetchall()
        if name not in oracle:
            # An empty rows-only result is a broken query, not a pass:
            # the driver's weaker rows-only check requires rows > 0,
            # so mirror that here instead of alarming without failing.
            if grows:
                print(f"ROWS-ONLY {name}: {len(grows)} rows OK")
            else:
                print(f"FAIL {name}: rows-only query returned 0 rows")
                n_fail += 1
            continue
        try:
            exp = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        ecols, etypes = exp.columns, exp.types
        erows = exp.fetchall()
        gi = sorted(range(len(gcols)), key=lambda i: gcols[i])
        ei = sorted(range(len(ecols)), key=lambda i: ecols[i])
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1; continue
        tmis = type_mismatches(gcols, gtypes, gi, ecols, etypes, ei)
        if tmis:
            print(f"FAIL {name}: column type mismatch (driver hash is "
                  f"representation-sensitive): {'; '.join(tmis)}")
            n_fail += 1; continue
        g = [tuple(norm(r[i]) for i in gi) for r in grows]
        e = [tuple(norm(r[i]) for i in ei) for r in erows]
        if g == e:
            print(f"PASS {name}: {len(g)} rows"); n_pass += 1
        else:
            n_fail += 1
            if len(g) != len(e):
                print(f"FAIL {name}: rowcount {len(g)} != {len(e)}")
            else:
                k = next(i for i in range(len(g)) if g[i] != e[i])
                print(f"FAIL {name}: first diff at row {k}:")
                print(f"  cols : {sorted(gcols)}")
                print(f"  spark: {g[k]}")
                print(f"  duck : {e[k]}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
