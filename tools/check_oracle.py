#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only; the
shipped library is pure Scala). Runs graft.Verify, then executes each
oracle SQL in DuckDB over the same parquet tables and diffs the results.

Usage: python3 tools/check_oracle.py [sfdir] [--skip-verify] [keys...]
"""
import json, os, subprocess, sys, glob

import duckdb
import pandas as pd
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "target", "verify_out")
ONLY = [a for a in sys.argv[2:] if not a.startswith("--")]

ADD_OPENS = [f"--add-opens={p}=ALL-UNNAMED" for p in [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
    "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar"]]

def run_verify():
    cp = os.path.join(REPO, "target", "scala-2.13", "classes") + ":" + \
        "/opt/spark/jars/*"
    cmd = ["java"] + ADD_OPENS + [
        "-Xmx8g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC", "-cp", cp,
        "graft.Verify", SF, OUT] + ONLY
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  !!", line)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        sys.exit(1)

def compare(name, sql, con):
    spark_files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not spark_files:
        return f"FAIL {name}: no spark output"
    got = con.execute(
        f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        return f"FAIL {name}: oracle error: {e}"
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        return f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return f"FAIL {name}: rows {len(got)} vs {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        # Dtype-family gate (the r7 lesson): DuckDB sum(BIGINT) yields
        # HUGEINT which pandas materializes as float64 while Spark writes
        # int64 — values compare equal but the driver's TYPED hash differs.
        # np.allclose alone is blind to that, so assert families match
        # before any value comparison. Families: integer {i,u}, float {f},
        # everything else compared exactly by its own kind.
        fam = lambda k: "i" if k in "iu" else k
        ka, kb = fam(a.dtype.kind), fam(b.dtype.kind)
        if {ka, kb} == {"i", "f"}:
            return (f"FAIL {name}: col {c} dtype family mismatch "
                    f"{a.dtype} (spark) vs {b.dtype} (oracle) — "
                    f"likely an uncast DuckDB integer sum (HUGEINT); "
                    f"CAST(... AS BIGINT) in the oracle SQL")
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            av, bv = a.astype(float).values, b.astype(float).values
            ok = (np.isnan(av) & np.isnan(bv)) | (av == bv)
            if not ok.all():
                i = int(np.argmin(ok))
                close = np.allclose(np.nan_to_num(av), np.nan_to_num(bv),
                                    atol=1e-9)
                return (f"FAIL {name}: col {c} row {i}: "
                        f"{av[i]!r} vs {bv[i]!r} (close={close})")
        else:
            an = a.isna().values; bn = b.isna().values
            eq = (an & bn) | ((~an) & (~bn) &
                              (a.astype(object).values == b.astype(object).values))
            if not eq.all():
                i = int(np.argmin(eq))
                return (f"FAIL {name}: col {c} ({a.dtype}/{b.dtype}) row {i}: "
                        f"{a.iloc[i]!r} vs {b.iloc[i]!r}")
    return f"PASS {name} ({len(got)} rows)"

def main():
    if "--skip-verify" not in sys.argv:
        print(f"running graft.Verify on {SF} ...")
        run_verify()
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if ONLY and name not in ONLY:
            continue
        res = compare(name, sql, con)
        print(" ", res)
        if res.startswith("PASS"):
            n_pass += 1
        else:
            n_fail += 1
    # rows-only keys (no oracle)
    for d in sorted(glob.glob(f"{OUT}/q_*")):
        name = os.path.basename(d)
        if name not in oracle and (not ONLY or name in ONLY):
            n = con.execute(f"SELECT count(*) FROM "
                            f"read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"  ROWS {name}: {n} rows (no oracle)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
