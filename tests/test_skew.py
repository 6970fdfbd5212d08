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
