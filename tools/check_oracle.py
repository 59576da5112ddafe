"""Local mirror of the driver's correctness gate (SURVEY §5.2 item 1).

Runs every registered query on Spark and its DuckDB oracle on the same
parquet tables, and compares row count, schema width, and an
order-insensitive multiset of rows (exact equality; floats compared
bit-exactly because the §2.5 determinism rules are supposed to make them
identical — a tolerance here would hide the very bugs this exists to
catch).

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [q18 q01 ...]
"""

from __future__ import annotations

import argparse
import math
import os
import re
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_processing_system_spark.engine.io import TABLES
from batch_processing_system_spark.engine.session import get_spark
from batch_processing_system_spark.queries import REGISTRY, _ensure_loaded


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_type(t: str) -> str:
    """Normalize Spark and DuckDB type spellings to a common form so the
    schema check compares semantics, not dialect names."""
    t = t.lower().strip()
    aliases = {
        "bigint": "int64", "int64": "int64", "long": "int64", "hugeint": "int128",
        "int": "int32", "integer": "int32", "int32": "int32",
        "smallint": "int16", "tinyint": "int8",
        "double": "float64", "float": "float32", "real": "float32",
        "varchar": "string", "string": "string", "text": "string",
        "boolean": "bool", "bool": "bool",
        "date": "date", "timestamp": "timestamp", "timestamp_ns": "timestamp",
        "timestamp with time zone": "timestamp",
    }
    if t in aliases:
        return aliases[t]
    m = re.match(r"(array|list)<(.+)>$", t) or re.match(r"(.+)\[\]$", t)
    if m:
        inner = m.group(2) if m.lastindex == 2 else m.group(1)
        return f"list<{_norm_type(inner)}>"
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith("struct"):
        return "struct"
    return t


def normalize(v):
    """Normalize a cell to a hashable, cross-engine-comparable value."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    return v


def to_multiset(rows, colnames):
    from collections import Counter

    return Counter(tuple(normalize(v) for v in row) for row in rows)


def run_one(spark, con, name, spec, sf_dir) -> dict:
    out = {"name": name, "ok": False, "tier": 1 if spec.oracle else 2}
    t0 = time.time()
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    out["spark_rows"] = len(srows)
    out["spark_s"] = round(time.time() - t0, 2)
    if spec.oracle is None:
        out["ok"] = True  # rows-only check
        out["note"] = "tier-2 rows-only"
        return out
    rel = con.sql(spec.oracle)
    drows = rel.fetchall()
    dcols = list(rel.columns)
    dtypes = [str(t).lower() for t in rel.types]
    out["duck_rows"] = len(drows)
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
        out["note"] = f"SCHEMA mismatch: spark={scols} duck={dcols}"
        return out
    # type-level schema check (the driver may compare types, not just
    # names): normalize both engines' spellings and compare per column
    stypes = {f.name.lower(): _norm_type(f.dataType.simpleString()) for f in sdf.schema.fields}
    for c, t in zip(dcols, dtypes):
        dt, st = _norm_type(t), stypes[c.lower()]
        if dt != st:
            out["note"] = f"TYPE mismatch on {c}: spark={st} duck={dt}"
            return out
    # align duck column order to spark's
    idx = [
        [c.lower() for c in dcols].index(c.lower()) for c in scols
    ]
    drows = [tuple(row[i] for i in idx) for row in drows]
    if len(srows) != len(drows):
        out["note"] = f"ROWCOUNT mismatch: spark={len(srows)} duck={len(drows)}"
        return out
    ms_s, ms_d = to_multiset(srows, scols), to_multiset(drows, scols)
    if ms_s != ms_d:
        diff_s = list((ms_s - ms_d).items())[:3]
        diff_d = list((ms_d - ms_s).items())[:3]
        out["note"] = f"VALUE mismatch: only-spark={diff_s} only-duck={diff_d}"
        return out
    out["ok"] = True
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01"))
    args = ap.parse_args()

    _ensure_loaded()
    names = args.names or sorted(REGISTRY)
    spark = get_spark("oracle-check")
    con = duck_connect(args.sf)

    failures = 0
    for name in names:
        spec = REGISTRY[name]
        try:
            r = run_one(spark, con, name, spec, args.sf)
        except Exception:
            r = {"name": name, "ok": False, "note": traceback.format_exc(limit=5)}
        status = "PASS" if r["ok"] else "FAIL"
        note = r.get("note", "")
        print(f"{status} {name:6s} rows={r.get('spark_rows','?'):>7} {r.get('spark_s','?'):>6}s {note}")
        if not r["ok"]:
            failures += 1
    print(f"\n{len(names) - failures}/{len(names)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
