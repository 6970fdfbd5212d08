"""HyperLogLog register sketch: determinism, mergeability, accuracy."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ffi_etl_spark.operators.sketches import (
    HLL_P,
    hll_estimate,
    hll_registers,
)


def _df(spark, ids, tag="a"):
    return spark.createDataFrame([(tag, i) for i in ids], "g string, k long")


def test_hll_estimate_within_band(spark):
    # raw estimator std error ~1.04/sqrt(1024) ≈ 3.3%; small-range bias
    # is high, so allow a generous one-sided band and check linear
    # counting is tight where it applies
    n = 3000
    regs = hll_registers(_df(spark, range(n)), "k", ("g",))
    row = hll_estimate(regs, ("g",)).collect()[0]
    assert 0.8 * n < row["hll_estimate"] < 1.3 * n
    if row["lc_estimate_s"] is not None:
        assert abs(float(row["lc_estimate_s"]) - n) / n < 0.1


def test_hll_registers_merge_by_max(spark):
    # sketch(A ∪ B) == MAX-merge of sketch(A), sketch(B) — register by
    # register, the property that makes the sketch shardable/IVM-able
    a = hll_registers(_df(spark, range(0, 1000)), "k", ("g",))
    b = hll_registers(_df(spark, range(500, 1500)), "k", ("g",))
    merged = (
        a.unionByName(b)
        .groupBy("g", "bucket")
        .agg(F.max("reg").cast("int").alias("reg"))
    )
    direct = hll_registers(_df(spark, range(0, 1500)), "k", ("g",))
    sym_diff = merged.exceptAll(direct).count() + direct.exceptAll(merged).count()
    assert sym_diff == 0


def test_hll_estimate_deterministic_under_repartition(spark):
    df = _df(spark, range(2000))
    e1 = hll_estimate(hll_registers(df, "k", ("g",)), ("g",)).collect()[0]
    e2 = hll_estimate(
        hll_registers(df.repartition(13), "k", ("g",)), ("g",)
    ).collect()[0]
    assert e1["hll_estimate"] == e2["hll_estimate"]
    assert e1["z_scaled"] == e2["z_scaled"]


def test_hll_register_bounds(spark):
    rows = hll_registers(_df(spark, range(500)), "k", ("g",)).collect()
    m = 1 << HLL_P
    assert all(0 <= r["bucket"] < m for r in rows)
    tail_bits = 60 - HLL_P
    assert all(1 <= r["reg"] <= tail_bits + 1 for r in rows)
    # duplicate keys change nothing: registers are max-of-set
    dup = hll_registers(
        _df(spark, list(range(500)) * 3), "k", ("g",)
    ).collect()
    assert sorted((r["bucket"], r["reg"]) for r in rows) == sorted(
        (r["bucket"], r["reg"]) for r in dup
    )


def test_bloom_audit_invariants(spark, sf_dir):
    from ffi_etl_spark.queries import QUERIES

    row = QUERIES["bloom_filter_audit"](spark, sf_dir).collect()[0]
    # the Bloom guarantee: never a false negative
    assert row["n_false_neg"] == 0
    # claimed = present + false positives, exactly
    assert row["n_claimed"] == row["n_present"] + row["n_false_pos"]
    # the filter holds at most k*n bits
    assert row["n_bits_set"] <= 3 * row["n_members"]
    spark.catalog.clearCache()
