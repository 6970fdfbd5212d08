"""Static type-lint over every registered oracle (round 8).

The dsir_budget_selection driver red (rounds 6-7) was an UNCAST
windowed SUM: DuckDB types it HUGEINT, pandas surfaces it float64, and
the driver's canonicalizer hash-mismatches it against Spark's int64 on
every row — while the local gate's %g float formatting collapses the
difference and stays green. tools/check_oracle.py now fails on
int-vs-float dtype-kind asymmetry at gate time; this test enforces the
same rule at AUTHORING time, with no Spark session: bind each oracle in
DuckDB (LIMIT 0 — no execution) and reject any output column whose type
would change pandas dtype-kind relative to the BIGINT/DOUBLE/VARCHAR
the Spark side emits.

Exceptions are explicit and must carry a driver-green justification.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from ffi_etl_spark.catalog import TESTDATA_TABLES

# (query, column) pairs allowed to deviate from BIGINT, each with a
# prior driver-green row proving the driver canon handles the pair:
# - dedup_simhash.hamming: TINYINT -> pandas int8, still integer-kind
#   vs Spark's int — green r01 AND r07.
# - tree_ensemble_score.margin: DECIMAL(7,4) -> float64, and the SPARK
#   side emits a float too (kinds agree) — green r06.
_ALLOWED = {
    ("dedup_simhash", "hamming"): {"TINYINT"},
    ("tree_ensemble_score", "margin"): {"DECIMAL(7,4)"},
}

# Integer types that keep pandas integer-kind — safe against int-kind
# Spark outputs. HUGEINT/UHUGEINT are NOT here: they exceed int64 and
# fall to float64/object in pandas, the exact r6/r7 failure mode.
_SAFE_INT = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER"}


@pytest.fixture(scope="module")
def oracle_types():
    import __spark_entry__ as entry_mod

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    out = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        out[name] = list(zip(rel.columns, [str(t) for t in rel.types]))
    return out


def test_every_oracle_binds(oracle_types):
    """Binding alone catches syntax drift in all 247 oracle strings
    without a Spark session (the fixture raised otherwise)."""
    assert len(oracle_types) >= 240


def test_no_hugeint_or_kind_hazard_outputs(oracle_types):
    """No oracle output column may be HUGEINT/UHUGEINT (uncast integer
    SUM — the dsir r6/r7 driver-red class), and any non-BIGINT integer
    width or DECIMAL must be explicitly allowed with a driver-green
    justification above."""
    bad = []
    for name, cols in oracle_types.items():
        for c, t in cols:
            if t in ("HUGEINT", "UHUGEINT"):
                bad.append(f"{name}.{c}: {t} (uncast integer SUM?)")
            elif t.startswith("DECIMAL") or (
                t in _SAFE_INT and t not in ("BIGINT", "INTEGER")
            ):
                if t not in _ALLOWED.get((name, c), set()):
                    bad.append(f"{name}.{c}: {t} (not in the allow-list)")
    assert not bad, bad
