"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted,
values stringified with float rounding).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from ffi_etl_spark.catalog import TESTDATA_TABLES
from ffi_etl_spark.session import get_session


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = table_hash(scols, [tuple(r) for r in srows])
        oh = table_hash(ocols, orows)
        ok_hash = sh == oh
        if ok_count and ok_cols and ok_hash:
            print(f"PASS  {name}: {len(srows)} rows")
        else:
            failures.append(name)
            print(
                f"FAIL  {name}: rows {len(srows)}/{len(orows)} cols_ok={ok_cols} "
                f"hash {sh} vs {oh}"
            )
            if not ok_cols:
                print(f"      spark cols:  {sorted(scols)}")
                print(f"      oracle cols: {sorted(ocols)}")
            elif not ok_hash and len(srows) and len(srows) < 20:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(canon(r[i]) for i in order) for r in [tuple(x) for x in srows])
                oset = sorted("|".join(canon(r[i]) for i in order) for r in orows)
                for a, b in zip(sset, oset):
                    if a != b:
                        print(f"      spark:  {a}\n      oracle: {b}")
                        break
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
