"""Guards for tools/gen_testdata.py — the scaling-ladder generator.

The sf1 evidence in BASELINE.md §scaling is only as good as the
generator's (a) determinism (same sf -> byte-identical parquet, so a
re-run reproduces the ladder) and (b) schema parity with the driver
tables (so every registry query runs unmodified at generated SFs).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def gen_dirs(tmp_path_factory):
    from gen_testdata import generate

    a = tmp_path_factory.mktemp("gen_a")
    b = tmp_path_factory.mktemp("gen_b")
    generate(0.002, str(a))
    generate(0.002, str(b))
    return str(a), str(b)


def test_generate_is_deterministic(gen_dirs):
    a, b = gen_dirs
    for t in TABLES:
        fa, fb = os.path.join(a, f"{t}.parquet"), os.path.join(b, f"{t}.parquet")
        with open(fa, "rb") as ha, open(fb, "rb") as hb:
            assert ha.read() == hb.read(), f"{t} not byte-identical across runs"


def test_generated_schemas_match_driver(gen_dirs):
    a, _ = gen_dirs
    con = duckdb.connect()
    for t in TABLES:
        drv = con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        ).fetchall()
        gen = con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{os.path.join(a, t + '.parquet')}')"
        ).fetchall()
        assert [(c[0], c[1]) for c in gen] == [(c[0], c[1]) for c in drv], t


def test_generated_rows_scale_and_dups_planted(gen_dirs):
    a, _ = gen_dirs
    con = duckdb.connect()
    nd = con.sql(
        f"SELECT count(*) FROM read_parquet('{os.path.join(a, 'documents.parquet')}')"
    ).fetchone()[0]
    assert nd == 100  # 50_000 * 0.002
    # exact-dup planting: adjacent copies exist
    n_exact = con.sql(
        f"""SELECT count(*) FROM (
              SELECT text, count(*) c
              FROM read_parquet('{os.path.join(a, 'documents.parquet')}')
              GROUP BY text HAVING c > 1)"""
    ).fetchone()[0]
    assert n_exact >= 1
