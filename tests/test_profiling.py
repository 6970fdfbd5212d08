"""Tests for the profiling/matching queries (queries_pkg/profiling.py)."""

from __future__ import annotations

from ffi_etl_spark.queries import QUERIES


def test_profile_columns_invariants(spark, sf_dir):
    rows = {r["col_name"]: r for r in QUERIES["profile_columns"](spark, sf_dir).collect()}
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    n_rows = {r["n_rows"] for r in rows.values()}
    assert len(n_rows) == 1 and n_rows.pop() > 0  # one scan, one row count
    for r in rows.values():
        assert 0 <= r["n_nulls"] <= r["n_rows"]
        assert 1 <= r["n_distinct"] <= r["n_rows"]
    # primary key: all-distinct, no nulls
    pk = rows["o_orderkey"]
    assert pk["n_nulls"] == 0 and pk["n_distinct"] == pk["n_rows"]
    # formatted doubles keep 6 decimal places; min <= max numerically
    lo, hi = rows["o_totalprice"]["min_str"], rows["o_totalprice"]["max_str"]
    assert "." in lo and len(lo.split(".")[1]) == 6
    assert float(lo) <= float(hi)


def test_profile_columns_single_scan(spark, sf_dir):
    plan = QUERIES["profile_columns"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1  # all stats from one pass


def test_zscore_normalize_stats_and_plan(spark, sf_dir):
    df = QUERIES["zscore_normalize"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # K-row stats side must broadcast
    rows = df.collect()
    assert rows, "deterministic event_id % 97 subset should be non-empty"
    ids = [r["event_id"] for r in rows]
    assert ids == sorted(ids) and all(i % 97 == 0 for i in ids)
    # z is a %.6e string since the round-4 parity hardening
    zs = [float(r["z"]) for r in rows if r["z"] is not None]
    assert zs and all(z == z and abs(z) < 50 for z in zs)  # finite, sane scale


def test_fuzzy_match_blocked_semantics(spark, sf_dir):
    rows = QUERIES["fuzzy_match_blocked"](spark, sf_dir).collect()
    assert rows, "testdata has rod/bolt and rod/ring near-matches"
    for r in rows:
        assert r["name_a"] < r["name_b"]  # canonical pair order, no dups
        assert 1 <= r["dist"] <= 3
        # blocking key: pairs share their first token
        assert r["name_a"].split(" ")[0] == r["name_b"].split(" ")[0]
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_approx_distinct_within_hll_error_band(spark):
    """HLL++ rows-only tier gets a numeric gate: per event_type, the
    sketch estimate must sit within 5% of the exact distinct count
    (default rsd is 0.05; the band is ~3 sigma at these cardinalities)."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from ffi_etl_spark.catalog import table

    sf = "/root/testdata/sf0.01"
    approx = {
        r[0]: r[1]
        for r in entry_mod.queries()["approx_distinct_users"](spark, sf).collect()
    }
    exact = {
        r[0]: r[1]
        for r in table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(0.05 * exact[k], 2), (k, est, exact[k])


def test_approx_quantiles_within_relative_error(spark):
    """Value-accuracy differential for the quantile sketch: each
    percentile_approx value (the same expression the gated query
    sketches with) must sit within a loose 1% value band of the exact
    percentiles, AND the gated query's rank-guarantee flags must all
    be 1 (the error-band oracle contract, since r4)."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from ffi_etl_spark.catalog import table

    sf = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: list(r["v"])
        for r in table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("v"))
        .collect()
    }
    exact = {
        r["event_type"]: [r["p50"], r["p90"], r["p99"]]
        for r in entry_mod.queries()["quantiles_exact"](spark, sf).collect()
    }
    assert set(approx) == set(exact)
    for k, v in approx.items():
        assert len(v) == 3
        for a, b in zip(v, exact[k]):
            denom = max(abs(b), 1.0)
            assert abs(a - b) / denom < 0.01, (k, a, b)
    gated = entry_mod.queries()["approx_quantiles"](spark, sf).collect()
    assert len(gated) == 3 * len(exact)
    assert all(r["within_band"] == 1 for r in gated)
