"""Unit tests: as-of join and binned range join semantics."""

from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from ffi_etl_spark.operators.olap import asof_join, range_join_binned


def _t(m):
    return datetime(2024, 1, 1, 12, m)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [Row(k=1, lid=1, ts=_t(10)), Row(k=1, lid=2, ts=_t(30)), Row(k=2, lid=3, ts=_t(10))]
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=_t(5), v="early"), Row(k=1, rts=_t(10), v="tie"),
         Row(k=1, rts=_t(20), v="mid"), Row(k=1, rts=_t(40), v="late")]
    )
    out = {r.lid: r for r in asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["v"]
    ).collect()}
    assert out[1].v == "tie"           # rts == ts is matched (inclusive)
    assert out[2].v == "mid"           # latest prior, never the future 'late'
    assert out[3].v is None            # key 2 has no right rows -> NULLs
    assert out[3].asof_rts is None


def test_asof_tolerance(spark):
    left = spark.createDataFrame([Row(k=1, lid=1, ts=_t(59))])
    right = spark.createDataFrame([Row(k=1, rts=_t(0), v="stale")])
    fresh = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                      right_cols=["v"], tolerance_seconds=3600).collect()[0]
    assert fresh.v == "stale"          # 59 min old, within 1h tolerance
    expired = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                        right_cols=["v"], tolerance_seconds=600).collect()[0]
    assert expired.v is None           # older than 10 min -> nulled


def test_range_join_binned_boundaries(spark):
    left = spark.createDataFrame([Row(k=1, lid=1, lts=_t(0))])
    right = spark.createDataFrame(
        [Row(k=1, rid=10, rts=_t(0)),    # gap 0: excluded (strict >)
         Row(k=1, rid=11, rts=_t(10)),   # gap 600 <= 900: kept
         Row(k=1, rid=12, rts=_t(15)),   # gap 900 == max: kept (inclusive)
         Row(k=1, rid=13, rts=_t(16)),   # gap 960 > max: excluded
         Row(k=2, rid=14, rts=_t(10))]   # other key: excluded
    )
    out = range_join_binned(left, right, on=["k"], left_ts="lts",
                            right_ts="rts", max_gap_seconds=900)
    assert sorted(r.rid for r in out.collect()) == [11, 12]


def test_interval_overlap_join_edges(spark):
    from datetime import datetime as dt

    from pyspark.sql import Row

    from ffi_etl_spark.operators.olap import interval_overlap_join

    def iv(i, h0, m0, h1, m1):
        return Row(id=i, s=dt(2024, 1, 1, h0, m0), e=dt(2024, 1, 1, h1, m1))

    # a1 overlaps b1 (proper), touches b2 exactly at the endpoint
    # (closed intervals -> overlap), and misses b3; a2 spans many bins
    # and overlaps b1 AND b3 (must appear once each, not once per bin)
    a = spark.createDataFrame([iv(1, 10, 0, 11, 0), iv(2, 9, 0, 15, 0)])
    b = spark.createDataFrame([iv(10, 10, 30, 12, 0), iv(20, 11, 0, 11, 30), iv(30, 14, 0, 14, 5)])
    a2 = a.select(F.col("id").alias("a_id"), F.col("s").alias("a_s"), F.col("e").alias("a_e"))
    b2 = b.select(F.col("id").alias("b_id"), F.col("s").alias("b_s"), F.col("e").alias("b_e"))
    out = interval_overlap_join(a2, b2, "a_s", "a_e", "b_s", "b_e", bin_seconds=3600)
    got = sorted((r.a_id, r.b_id) for r in out.collect())
    assert got == [(1, 10), (1, 20), (2, 10), (2, 20), (2, 30)]
