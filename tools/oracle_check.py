#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, canonicalizes both (tools/oracle_common.py — the shared
equality definition, also used by correctness_json.py), and compares
values exactly (Decimal compared numerically).
"""
import sys, json, os
import duckdb
from oracle_common import register_views, canon

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
register_views(con, sf_dir)

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

fails, passes, skipped = [], 0, 0
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    sres = con.sql(f"SELECT * FROM '{path}/*.parquet'")
    scols, srows = list(sres.columns), sres.fetchall()
    if name not in oracle:
        skipped += 1
        print(f"  [rows-only] {name}: {len(srows)} rows")
        continue
    try:
        ores = con.sql(oracle[name])
        ocols, orows = list(ores.columns), ores.fetchall()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    if sc != oc:
        fails.append((name, f"columns differ: spark={sc} oracle={oc}"))
    elif sr != orr:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(sr + [None]*len(orr), orr + [None]*len(sr))) if a != b)
        fails.append((name, f"rows differ ({len(sr)} vs {len(orr)}): first diff at {diff[0]}:\n    spark : {diff[1]}\n    oracle: {diff[2]}"))
    else:
        passes += 1

print(f"\nPASS {passes}  FAIL {len(fails)}  ROWS-ONLY {skipped}")
for n, msg in fails:
    print(f"FAIL {n}: {msg}")
sys.exit(1 if fails else 0)
