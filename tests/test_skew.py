"""AQE skew-join verification: a pathological hot key gets split.

The engine's conf (session.ENGINE_CONFS) enables
``spark.sql.adaptive.skewJoin``; this test proves the mechanism
actually engages by forcing a sort-merge join over a 99%-hot-key
distribution with test-sized skew thresholds and asserting the
executed (adaptive) plan marks the join ``skew=true``.
"""

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_skew_join_is_split(spark, skew_confs):
    # 200k rows on key 0 (one fat shuffle partition), 100 singleton keys
    left = spark.range(200_000).select(
        F.when(F.col("id") < 199_900, 0).otherwise(F.col("id") % 100 + 1).alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pad"),
    )
    right = spark.range(101).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
    joined = left.join(right, "k")
    # execute THIS plan (count() would build a separate query execution,
    # leaving joined's own AQE plan unfinalized)
    n = len(joined.collect())
    assert n == 200_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan  # AQE split the hot partition


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.olap import salted_join

    # 5000 rows on one hot key + a uniform tail, joined to a 6-key dim
    big = spark.range(0, 5500).select(
        F.when(F.col("id") < 5000, F.lit(0)).otherwise(F.col("id") % 5 + 1).alias("k"),
        F.col("id").alias("row_id"),
    )
    dim = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(6)], "k long, name string"
    )
    got = salted_join(big, dim, ["k"], n_salts=4)
    want = big.join(dim, ["k"])
    assert got.count() == want.count() == 5500
    assert (
        sorted((r.row_id, r.name) for r in got.collect())
        == sorted((r.row_id, r.name) for r in want.collect())
    )


def test_salted_join_left_keeps_unmatched(spark):
    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.olap import salted_join

    big = spark.range(0, 100).select((F.col("id") % 10).alias("k"), F.col("id").alias("row_id"))
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k long, name string")
    got = salted_join(big, dim, ["k"], n_salts=4, how="left")
    assert got.count() == 100  # unmatched rows appear exactly once
    assert got.filter(F.col("name").isNull()).count() == 80


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """The third skew/scale lever beside AQE-skew and salting: with
    BLOOM_JOIN_CONFS on, a selective build-side filter on a SHUFFLE
    join injects a bloom_filter_agg subquery and a might_contain
    pre-filter on the probe scan — and the result is identical to the
    unfiltered plan's."""
    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.session import BLOOM_JOIN_CONFS

    sf = "/root/testdata/sf0.001"
    confs = dict(BLOOM_JOIN_CONFS)
    confs["spark.sql.autoBroadcastJoinThreshold"] = "-1"  # force shuffle join
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = table(spark, sf, "lineitem")
        o = table(spark, sf, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        got = {(r.o_orderpriority, r.n) for r in j.collect()}
    finally:
        for k, v in old.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)
    want = {
        (r.o_orderpriority, r.n)
        for r in table(spark, sf, "lineitem")
        .join(
            table(spark, sf, "orders").where(F.col("o_orderpriority") == "1-URGENT"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) == 1


def test_salted_join_adaptive_branches(spark):
    """The probe salts only under real skew; both branches match the
    plain join exactly."""
    from ffi_etl_spark.operators.olap import salted_join_adaptive

    # hot: 90% of fact rows on key 1
    hot = spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, F.lit(1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    uniform = spark.range(2000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") % 7).alias("v")
    )
    dim = spark.range(2000).select(F.col("id").alias("k"), F.lit(10).alias("w"))

    for fact, expect_salted in ((hot, True), (uniform, False)):
        out = salted_join_adaptive(fact, dim, ["k"], probe_fraction=0.5)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert ("_salt" in plan) == expect_salted, plan[:500]
        got = out.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        ).collect()[0]
        want = fact.join(dim, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        ).collect()[0]
        assert (got["n"], got["s"]) == (want["n"], want["s"])
