#!/usr/bin/env python3
"""Emit a driver-format correctness artifact from a Verify dump.

Usage: correctness_json.py <sfDir> <verifyOutDir> <outJson>

Same canonicalization as oracle_check.py (tools/oracle_common.py —
the shared equality definition), but writes the per-query
{rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}
map the driver's CORRECTNESS_r*.json artifacts use — for the committed
CORRECTNESS_sf01.json big-scale gate.
"""
import sys, json, os, hashlib
import duckdb
from oracle_common import register_views, canon

sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
register_views(con, sf_dir)

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def rowhash(rows):
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


result = {}
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    entry = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        sres = con.sql(f"SELECT * FROM '{path}/*.parquet'")
        scols, srows = list(sres.columns), sres.fetchall()
        entry["spark_rows"] = len(srows)
        if name not in oracle:
            entry["err"] = "rows-only (no oracle SQL)"
            result[name] = entry
            continue
        ores = con.sql(oracle[name])
        ocols, orows = list(ores.columns), ores.fetchall()
        entry["oracle_rows"] = len(orows)
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        entry["rows_match"] = len(sr) == len(orr)
        entry["schema_match"] = sc == oc
        entry["hash_match"] = sc == oc and rowhash(sr) == rowhash(orr)
    except Exception as e:
        entry["err"] = str(e)
    result[name] = entry

with open(out_json, "w") as f:
    json.dump(result, f, indent=1)

total = len(result)
green = sum(1 for v in result.values() if v["hash_match"])
ro = sum(1 for v in result.values() if v["err"] == "rows-only (no oracle SQL)")
fail = total - green - ro
print(f"wrote {out_json}: {total} queries, {green} hash-match, {ro} rows-only, {fail} FAIL")
sys.exit(1 if fail else 0)
