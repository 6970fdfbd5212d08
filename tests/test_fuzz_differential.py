"""Differential fuzzing as a gate (tools/fuzz_differential.py).

A bounded seeded slice of the fuzz space runs in CI; deeper sweeps run
ad hoc (`python tools/fuzz_differential.py <sf_dir> <n> <seed0>` —
150 seeds across sf0.001/sf0.01 were green when this landed). Seeds
are FIXED so a failure here is reproducible by number."""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from ffi_etl_spark.catalog import load_tables
from tools.fuzz_differential import TABLES, gen_query, run_case


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    load_tables(spark, sf_dir, tuple(TABLES), register=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )
    return spark, con


def test_fuzz_slice_agrees(engines):
    spark, con = engines
    failures = []
    for seed in range(20):
        sql = gen_query(random.Random(seed))
        ok, detail = run_case(spark, con, sql)
        if not ok:
            failures.append((seed, detail, sql))
    assert failures == []


def test_fuzz_generator_is_deterministic():
    """Same seed, same SQL — reproducibility is what makes a fuzz
    failure actionable."""
    for seed in (0, 7, 19, 123):
        assert gen_query(random.Random(seed)) == gen_query(random.Random(seed))
