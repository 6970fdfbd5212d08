"""Tests for the behavioral-analytics queries (queries_pkg/behavioral.py)."""

from __future__ import annotations

from ffi_etl_spark.queries import QUERIES


def test_funnel_monotonic_and_ordered(spark, sf_dir):
    rows = QUERIES["funnel_conversion"](spark, sf_dir).collect()
    assert [r["stage"] for r in rows] == ["view", "click", "purchase"]
    n = [r["n_users"] for r in rows]
    assert n[0] >= n[1] >= n[2] >= 0  # a funnel can only narrow
    assert n[0] > 0


def test_funnel_requires_strict_order(spark):
    """A user with purchase BEFORE their first view->click chain must
    not count as converted; one in the right order must."""
    import pyspark.sql.functions as F

    from ffi_etl_spark.queries_pkg import behavioral

    ev = spark.createDataFrame(
        [
            # user 1: view@1, click@2, purchase@3  -> full conversion
            (1, 1, "view"), (2, 1, "click"), (3, 1, "purchase"),
            # user 2: purchase@1, view@2, click@3  -> stops at click
            (4, 2, "purchase"), (5, 2, "view"), (6, 2, "click"),
            # user 3: click@1, view@2              -> stops at view
            (7, 3, "click"), (8, 3, "view"),
        ],
        "event_id long, user_id long, event_type string",
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id") * 60))

    import unittest.mock as mock

    with mock.patch.object(behavioral, "table", lambda *_a, **_k: ev):
        rows = QUERIES["funnel_conversion"](spark, "unused").collect()
    by_stage = {r["stage"]: r["n_users"] for r in rows}
    assert by_stage == {"view": 3, "click": 2, "purchase": 1}


def test_retention_cohort_week_zero_complete(spark, sf_dir):
    rows = QUERIES["retention_cohorts"](spark, sf_dir).collect()
    assert rows
    by_cohort: dict[str, dict[int, int]] = {}
    for r in rows:
        assert r["week_offset"] >= 0  # activity can't precede first touch
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_users"]
    for weeks in by_cohort.values():
        # every user is active in their own first week by definition
        assert 0 in weeks
        # week-0 count is the cohort size: no later week can exceed it
        assert all(n <= weeks[0] for n in weeks.values())


def test_scd2_spans_tile_without_gaps(spark, sf_dir):
    rows = QUERIES["scd2_compress"](spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert r["user_id"] % 11 == 0
        by_user.setdefault(r["user_id"], []).append(r)
    for spans in by_user.values():
        # exactly one open (current) span per user, and it is the last
        assert sum(s["is_current"] for s in spans) == 1
        assert spans[-1]["is_current"] == 1 and spans[-1]["valid_to"] is None
        for a, b in zip(spans, spans[1:]):
            assert a["valid_to"] == b["valid_from"]  # spans tile exactly
            assert a["event_type"] != b["event_type"]  # compression: only changes


def test_ewma_hand_checkable(spark):
    """alpha=1/2 EWMA over a single user: y1=v1, y_t=(y_{t-1}+v_t)/2 —
    crafted values give exact halves, checked literally."""
    from datetime import datetime as dt

    from pyspark.sql import Row

    from ffi_etl_spark.queries_pkg import behavioral
    import unittest.mock as mock

    rows = [
        Row(event_id=i, user_id=1, event_type="x",
            ts=dt(2024, 1, 1, 0, i), value=v)
        for i, v in enumerate([1.0, 2.0, 3.0, None], start=1)
    ]
    ev = spark.createDataFrame(rows)
    with mock.patch.object(behavioral, "table", lambda *_a, **_k: ev):
        got = {r.event_id: r.ewma for r in QUERIES["ewma_smoothing"](spark, "unused").collect()}
    # NULL-valued event 4 is excluded entirely; 1 -> 1.0, 2 -> 1.5, 3 -> 2.25
    assert got == {1: 1.0, 2: 1.5, 3: 2.25}
