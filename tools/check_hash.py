#!/usr/bin/env python3
"""Hash-compare variant of check.py for LARGE-output gates (the sf100
third-decade spot oracles): instead of materializing both result sets in
pandas (text_winnow at sf100 is ~600M rows), BOTH sides are reduced
inside DuckDB to (row_count, sum of per-row portable h32) over the
name-sorted column rendering — the same canonicalization check.py's
sort-columns-by-name + value compare performs, folded to two scalars.

Per row: h32(concat_ws('|', cols sorted by name, CAST AS VARCHAR,
NULL -> chr(1))) summed as HUGEINT (no overflow, order-free). Both the
oracle result and the Spark parquet are rendered by DuckDB, so value
formatting is engine-consistent; a single differing value changes the
sum with probability 1 - 2^-32 per row.

Usage: check_hash.py <sfdir> <outdir> [query ...]
(no query args = every query in outdir/oracle_sql.json)
"""
import json, sys, glob, os, time
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
checked = 0
for q, sql in sorted(oracle.items()):
    if only and q not in only:
        continue
    checked += 1
    rdir = f"{outdir}/{q}"
    if not os.path.isdir(rdir):
        print(f"FAIL {q}: no spark output"); fails += 1; continue
    try:
        spark_cols = sorted(
            duckdb.sql(f"SELECT * FROM '{rdir}/*.parquet' LIMIT 0").columns)
    except Exception as e:
        print(f"FAIL {q}: spark output unreadable {str(e)[:120]}"); fails += 1; continue
    try:
        oracle_cols = sorted(con.sql(f"SELECT * FROM ({sql}) LIMIT 0").columns)
    except Exception as e:
        print(f"FAIL {q}: oracle error {str(e)[:200]}"); fails += 1; continue
    if spark_cols != oracle_cols:
        print(f"FAIL {q}: columns exp={oracle_cols} got={spark_cols}")
        fails += 1; continue

    def digest(src_sql, cols):
        rowstr = "||'|'||".join(
            f"COALESCE(CAST(\"{c}\" AS VARCHAR), chr(1))" for c in cols)
        h = f"cast(('0x'||substr(md5({rowstr}),1,8)) as bigint)"
        return (f"SELECT count(*) AS n, "
                f"COALESCE(sum(cast({h} AS HUGEINT)), 0) AS s "
                f"FROM ({src_sql})")

    t0 = time.time()
    try:
        got = con.sql(digest(f"SELECT * FROM '{rdir}/*.parquet'", spark_cols)).fetchone()
        t_spark = time.time() - t0
        t0 = time.time()
        exp = con.sql(digest(sql, oracle_cols)).fetchone()
        t_oracle = time.time() - t0
    except Exception as e:
        print(f"FAIL {q}: digest error {str(e)[:200]}"); fails += 1; continue
    if got[0] != exp[0]:
        print(f"FAIL {q}: rows exp={exp[0]} got={got[0]}"); fails += 1; continue
    if got[1] != exp[1]:
        print(f"FAIL {q}: value hash-sum mismatch over {exp[0]} rows"); fails += 1; continue
    print(f"PASS {q} ({exp[0]} rows, hash-sum equal; "
          f"spark-read {t_spark:.1f}s oracle {t_oracle:.1f}s)")
print(f"\n{checked-fails}/{checked} pass")
sys.exit(1 if fails else 0)
