"""Round-4c: incremental aggregate maintenance + deterministic DP release."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ffi_etl_spark.operators.ivm import merge_grouped_partials


def _agg(df, keys):
    cents = F.floor(F.col("value") * 100).cast("long")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("cents"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


_SPEC = {"n": "sum", "cents": "sum", "vmin": "min", "vmax": "max"}


def test_merge_partials_equals_full_recompute(spark):
    """The IVM identity: agg(base ∪ delta) == merge(agg(base), agg(delta)),
    including groups on only one side and overlapping groups."""
    rows = [
        ("a", 1.25),
        ("a", 2.75),
        ("b", -3.5),
        ("b", 10.0),
        ("c", 0.01),
    ]
    df = spark.createDataFrame(rows, "k string, value double")
    base = df.filter(F.col("value") < 1.0)   # b(-3.5), c — group 'a' absent
    delta = df.filter(F.col("value") >= 1.0)  # a, a, b(10.0) — 'c' absent
    merged = merge_grouped_partials(_agg(base, ["k"]), _agg(delta, ["k"]), ["k"], _SPEC)
    direct = _agg(df, ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_merge_partials_rejects_unknown_rule(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, value double")
    a = _agg(df, ["k"])
    try:
        merge_grouped_partials(a, a, ["k"], {"n": "avg"})
    except ValueError as e:
        assert "avg" in str(e)
    else:
        raise AssertionError("expected ValueError for non-mergeable rule")


def test_dp_release_is_deterministic_and_noised(spark, sf_dir):
    """Same inputs → bit-identical release (keyed-hash draw, no RNG
    state); the released value actually differs from the raw count;
    the noise magnitude is Laplace(1)-plausible (|noise| < 40 ≈
    b·ln(2^52) upper bound of the inverse-CDF at 52-bit resolution)."""
    from ffi_etl_spark.queries import QUERIES

    out1 = {r["event_type"]: r["released_s"] for r in QUERIES["dp_noised_release"](spark, sf_dir).collect()}
    out2 = {r["event_type"]: r["released_s"] for r in QUERIES["dp_noised_release"](spark, sf_dir).collect()}
    assert out1 == out2 and len(out1) > 0
    raw = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for et, released in out1.items():
        noise = float(released) - raw[et]
        assert noise != 0.0
        assert abs(noise) < 40.0
        assert math.isfinite(noise)
