#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then run each oracle SQL in DuckDB over the same tables and
compare (columns sorted by name, rows sorted, values compared with exact
match for non-floats and tiny-epsilon for floats so we can see how close
rounding gets us)."""
import json, math, subprocess, sys, os
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
RUN_SBT = os.environ.get("SKIP_SBT", "") != "1"

if RUN_SBT:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
    if r.returncode != 0:
        print("VERIFY FAILED rc=", r.returncode, "\n", tail)
        sys.exit(1)

print(f"duckdb {duckdb.__version__}")  # oracle-engine version, for skew diagnosis
con = duckdb.connect()
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written dataset (e.g. ScaleUp output)
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        spark_df = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
    except Exception as e:
        bad.append((name, f"spark output missing: {e}")); continue
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        bad.append((name, f"oracle sql error: {e}")); continue

    sc = sorted(spark_df.columns); dc = sorted(duck_df.columns)
    if sc != dc:
        bad.append((name, f"schema mismatch: spark={sc} duck={dc}")); continue
    a = spark_df[sc].sort_values(sc).reset_index(drop=True)
    b = duck_df[dc].sort_values(dc).reset_index(drop=True)
    if len(a) != len(b):
        bad.append((name, f"row count: spark={len(a)} duck={len(b)}")); continue
    mismatch = None
    for c in sc:
        av, bv = a[c].values, b[c].values
        try:
            import numpy as np
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                av = av.astype(float); bv = bv.astype(float)
                # signbit check: the driver hashes values, so -0.0 != 0.0 there
                diff = ~(((av == bv) & (np.signbit(av) == np.signbit(bv)))
                         | (np.isnan(av) & np.isnan(bv)))
                if diff.any():
                    i = int(np.argmax(diff))
                    mx = float(np.nanmax(np.abs(av - bv)))
                    mismatch = f"col {c}: {int(diff.sum())}/{len(av)} differ, first@{i}: {av[i]} vs {bv[i]}, maxabs={mx}"
                    break
            else:
                if not (av == bv).all():
                    neq = (av != bv)
                    i = int(neq.argmax())
                    mismatch = f"col {c}: {int(neq.sum())}/{len(av)} differ, first@{i}: {av[i]!r} vs {bv[i]!r}"
                    break
        except Exception as e:
            mismatch = f"col {c}: compare error {e}"; break
    if mismatch: bad.append((name, mismatch))
    else: ok.append((name, len(a)))

for n, rows in ok: print(f"PASS {n} ({rows} rows)")
for n, msg in bad: print(f"FAIL {n}: {msg}")
print(f"\n{len(ok)} pass / {len(bad)} fail")
sys.exit(1 if bad else 0)
