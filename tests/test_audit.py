"""Tests for the temporal-audit queries (queries_pkg/audit.py)."""

from __future__ import annotations

import unittest.mock as mock

import pyspark.sql.functions as F

from ffi_etl_spark.queries import QUERIES
from ffi_etl_spark.queries_pkg import audit


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_rolling_distinct_crafted_interval_merge(spark):
    """Hand-checkable case exercising island merge (user 1's day-1 and
    day-5 intervals overlap) and interval expiry (user 2 drops out of
    the window after day 8)."""
    from datetime import datetime

    def d(day):
        return datetime(2024, 1, day)

    ev = _events(
        spark,
        [
            (1, 1, "view", d(1)),
            (2, 1, "view", d(5)),   # merges with day-1 interval (gap 4 <= 6)
            (3, 2, "view", d(2)),   # covers days 2..8 only
            (4, 3, "view", d(15)),  # isolated late island
        ],
    )
    with mock.patch.object(audit, "table", lambda *_a, **_k: ev):
        rows = {
            r["day"].isoformat(): r["rolling_users"]
            for r in QUERIES["rolling_distinct_users"](spark, "unused").collect()
        }
    # output is evaluated at active days only: 1, 2, 5, 15
    assert rows == {
        "2024-01-01": 1,  # user 1
        "2024-01-02": 2,  # users 1, 2
        "2024-01-05": 2,  # users 1, 2 (both active within [day-6, day])
        "2024-01-15": 1,  # user 3 only; users 1,2 expired
    }


def test_rolling_distinct_never_exceeds_total_users(spark, sf_dir):
    rows = QUERIES["rolling_distinct_users"](spark, sf_dir).collect()
    assert rows
    from ffi_etl_spark.catalog import table

    n_users = table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert all(0 < r["rolling_users"] <= n_users for r in rows)
    days = [r["day"] for r in rows]
    assert days == sorted(days)


def test_markov_rows_normalize(spark, sf_dir):
    rows = QUERIES["markov_transitions"](spark, sf_dir).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        assert r["n"] > 0 and 0.0 < r["p"] <= 1.0
        by_src[r["src"]] = by_src.get(r["src"], 0.0) + r["p"]
    for total in by_src.values():
        assert abs(total - 1.0) < 1e-9  # each source row sums to 1


def test_fk_audit_clean_testdata_and_broadcast_plan(spark, sf_dir):
    df = QUERIES["fk_integrity_audit"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    rows = df.collect()
    assert len(rows) == len(audit._FK_EDGES)
    # the generated testdata is referentially intact
    assert all(r["n_orphans"] == 0 and r["n_child"] > 0 for r in rows)


def test_fk_audit_counts_planted_orphan(spark, sf_dir):
    from ffi_etl_spark.catalog import table as real_table

    def patched(spark_, sf, name):
        df = real_table(spark_, sf, name)
        if name == "orders":
            bad = df.limit(1).withColumn("o_custkey", F.lit(-999).cast("long"))
            return df.unionByName(bad)
        return df

    with mock.patch.object(audit, "table", patched):
        rows = {
            r["edge"]: r["n_orphans"]
            for r in QUERIES["fk_integrity_audit"](spark, sf_dir).collect()
        }
    assert rows["orders.o_custkey->customer.c_custkey"] == 1
    assert rows["nation.n_regionkey->region.r_regionkey"] == 0


def test_dataset_diff_classifies_synthetic_revision(spark, sf_dir):
    """The diff statuses must match the synthetic v2's construction
    rules exactly: %97 deleted, %89 edited (unless deleted), %101
    inserted under shifted ids, everything else unchanged."""
    from ffi_etl_spark.catalog import table as real_table

    docs = real_table(spark, sf_dir, "documents")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    want = {
        "removed": sum(1 for i in ids if i % 97 == 0),
        "changed": sum(1 for i in ids if i % 97 != 0 and i % 89 == 0),
        "added": sum(1 for i in ids if i % 101 == 0),
    }
    want["unchanged"] = len(ids) - want["removed"] - want["changed"]
    got = {r.status: r.n_docs for r in QUERIES["dataset_diff"](spark, sf_dir).collect()}
    assert got == {k: v for k, v in want.items() if v > 0}
    added_min = min((i for i in ids if i % 101 == 0), default=None)
    if added_min is not None:
        rows = {r.status: r for r in QUERIES["dataset_diff"](spark, sf_dir).collect()}
        assert rows["added"].min_id == added_min + 1000000
