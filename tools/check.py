#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare with the Verify parquet output
(sort columns by name, sort rows, compare values)."""
import json, sys, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional resume: arg3 = a prior run's log; queries it marks PASS are
# re-reported as PASS (cached) without re-running the oracle — but ONLY
# if the Spark output dir hasn't been regenerated since that log was
# written (a newer output could have regressed; trust nothing newer
# than the verdict that blessed it)
skip = set()
log_mtime = 0.0
if len(sys.argv) > 3 and os.path.exists(sys.argv[3]):
    log_mtime = os.path.getmtime(sys.argv[3])
    for line in open(sys.argv[3]):
        if line.startswith("PASS "):
            skip.add(line.split()[1])


def output_newer_than_log(rdir):
    if not os.path.isdir(rdir):
        return True  # vanished output: fall through to the normal FAIL path
    parts = glob.glob(f"{rdir}/*")
    newest = max((os.path.getmtime(f) for f in parts), default=0.0)
    return max(newest, os.path.getmtime(rdir)) > log_mtime

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # driver testdata ships single parquet FILES; ScaleUp fixtures are
    # Spark DIRECTORIES of part files — read whichever layout this is
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    rdir = f"{outdir}/{q}"
    if q in skip:
        if not output_newer_than_log(rdir):
            print(f"PASS {q} (cached)"); continue
        print(f"  note {q}: output newer than cached log, re-running oracle")
    if not os.path.isdir(rdir):
        print(f"FAIL {q}: no spark output"); fails += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {q}: oracle error {str(e)[:200]}"); fails += 1; continue
    try:
        got = duckdb.sql(f"SELECT * FROM '{rdir}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {q}: spark output unreadable {str(e)[:120]}"); fails += 1; continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {q}: columns exp={list(exp.columns)} got={list(got.columns)}"); fails += 1; continue
    if len(exp) != len(got):
        print(f"FAIL {q}: rows exp={len(exp)} got={len(got)}"); fails += 1; continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    eq = True
    for c in exp.columns:
        a, b = exp[c], got[c]
        if str(a.dtype) != str(b.dtype):
            print(f"  note {q}.{c}: dtype exp={a.dtype} got={b.dtype}")
        if not a.astype(str).equals(b.astype(str)):
            bad = (a.astype(str) != b.astype(str))
            i = bad.idxmax()
            print(f"FAIL {q}: col {c} differs at row {i}: exp={a[i]} got={b[i]} ({int(bad.sum())} rows)")
            eq = False
            break
    if eq:
        print(f"PASS {q} ({len(exp)} rows)")
    else:
        fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
