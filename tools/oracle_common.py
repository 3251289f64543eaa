"""The correctness gate's shared equality definition.

norm/canon ARE what "rows equal" means for the DuckDB-oracle compare —
oracle_check.py (the PASS/FAIL gate) and correctness_json.py (the
committed artifact writer) must use the SAME rules, so they both import
from here; a canonicalization fix lands in one place.
"""
import glob
import os
from decimal import Decimal


def register_views(con, sf_dir):
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")


def norm(v):
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    return ("o", str(v))


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(map(repr, t)))
