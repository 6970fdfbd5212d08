"""Round-4c: incremental aggregate maintenance, deterministic DP release,
Z-order locality."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ffi_etl_spark.operators.ivm import merge_grouped_partials

_HSETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


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


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=25,
    ),
    cut=st.integers(min_value=0, max_value=25),
)
@settings(**_HSETTINGS)
def test_merge_partials_property(spark, rows, cut):
    """For ANY split point of ANY row multiset, merging the two halves'
    aggregates equals aggregating the whole — the mergeability law the
    operator rests on (integer sums: exact under every split)."""
    df = spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "k string, value double"
    )
    base_rows = rows[:cut] or []
    delta_rows = rows[cut:] or []
    mk = lambda rs: spark.createDataFrame(
        [(k, float(v)) for k, v in rs], "k string, value double"
    )
    merged = merge_grouped_partials(
        _agg(mk(base_rows), ["k"]), _agg(mk(delta_rows), ["k"]), ["k"], _SPEC
    )
    direct = _agg(df, ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_merge_partials_null_keys_and_null_sums(spark):
    """The identity holds NULLs included: a NULL-keyed group on both
    sides merges into ONE group (null-safe join), and an all-NULL sum
    merges to NULL (not 0), exactly as the full recompute yields."""
    rows = [
        (None, 1.0),
        (None, 2.0),
        ("a", None),   # value NULL on the only side it appears
        ("b", None),
        ("b", None),
    ]
    df = spark.createDataFrame(rows, "k string, value double")
    cents = F.floor(F.col("value") * 100).cast("long")
    agg = lambda d: d.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("cents"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    base = spark.createDataFrame(rows[:2], "k string, value double")   # NULL key, b absent
    delta = spark.createDataFrame(rows[2:], "k string, value double")  # a, b all-NULL values

    # split the NULL-key group ACROSS the boundary too
    base2 = spark.createDataFrame([rows[0], rows[3]], "k string, value double")
    delta2 = spark.createDataFrame([rows[1], rows[2], rows[4]], "k string, value double")

    direct = sorted(map(tuple, agg(df).collect()), key=str)
    for b, d in ((base, delta), (base2, delta2)):
        merged = merge_grouped_partials(agg(b), agg(d), ["k"], _SPEC)
        assert sorted(map(tuple, merged.collect()), key=str) == direct


def test_merge_partials_rejects_unknown_rule(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, value double")
    a = _agg(df, ["k"])
    try:
        merge_grouped_partials(a, a, ["k"], {"n": "avg"})
    except ValueError as e:
        assert "avg" in str(e)
    else:
        raise AssertionError("expected ValueError for non-mergeable rule")


def test_market_basket_lift_crafted(spark, tmp_path):
    """Hand-checked lift/confidence on a 4-user basket set: A and B
    co-occur in 2 of 4 users (s_A=3, s_B=2) → lift = 2·4/(3·2) = 4/3,
    confidence(A→B) = 2/3; repeated events in one basket count ONCE."""
    from ffi_etl_spark.queries import QUERIES

    rows = [
        (1, "A"), (1, "A"), (1, "B"),  # duplicate (1, A) must collapse
        (2, "A"), (2, "B"),
        (3, "A"),
        (4, "C"),
    ]
    d = str(tmp_path / "sf")
    ev = spark.createDataFrame(
        [(i, u, et) for i, (u, et) in enumerate(rows)],
        "event_id long, user_id long, event_type string",
    ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp")) \
     .withColumn("value", F.lit(1.0)).withColumn("props", F.lit("{}"))
    ev.write.parquet(f"{d}/events.parquet")
    out = {(r.ante, r.cons): r for r in QUERIES["market_basket_lift"](spark, d).collect()}
    ab = out[("A", "B")]
    assert (ab.n_both, ab.n_ante, ab.n_cons, ab.n_users) == (2, 3, 2, 4)
    assert abs(ab.lift - 8.0 / 6.0) < 1e-12
    assert abs(ab.confidence - 2.0 / 3.0) < 1e-12
    assert ("A", "C") not in out and ("B", "C") not in out  # never co-occur


def test_rendezvous_moves_only_to_new_shard(spark, sf_dir):
    """The HRW elasticity invariant: growing 16 → 17 shards moves docs
    ONLY onto the new shard (n_moved_elsewhere == 0 on every row), and
    the moved fraction is near 1/17 (binomial band), nowhere near the
    15/16 a mod-N reshard would relocate."""
    from ffi_etl_spark.queries import QUERIES

    rows = QUERIES["rendezvous_resharding"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.n_moved_elsewhere == 0 for r in rows)
    total = sum(r.n_before for r in rows)
    moved = sum(r.n_moved for r in rows)
    frac = moved / total
    assert 0.0 < frac < 0.25  # expectation 1/17 ≈ 0.059; generous band
    assert all(r.n_stayed + r.n_moved == r.n_before for r in rows)


def test_kmv_sub_k_sets_are_exact(spark, sf_dir):
    """The KMV rule: sub-K sketches ARE the set. At sf0.001 every
    per-type user set AND every pairwise union is < K=256 distinct, so
    est_a/est_b/est_union are exact and inclusion-exclusion makes
    est_intersection equal the exact twin with zero error."""
    from ffi_etl_spark.queries import QUERIES

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    users = ev.select("event_type", "user_id").distinct()
    per_type = {
        r.event_type: r.n
        for r in users.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows = QUERIES["kmv_set_algebra"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert per_type[r.type_a] + per_type[r.type_b] < 256  # precondition
        assert float(r.est_a_s) == per_type[r.type_a]
        assert float(r.est_b_s) == per_type[r.type_b]
        union_exact = per_type[r.type_a] + per_type[r.type_b] - r.exact_intersection
        assert float(r.est_union_s) == union_exact
        assert float(r.est_intersection_s) == r.exact_intersection


def test_kmv_estimator_branch_accuracy(spark, tmp_path):
    """Above K the estimates are approximate but must TRACK the truth:
    1000 users split into X=[0,800) and Y=[400,1000) (exact ∩ = 400,
    ∪ = 1000). KMV at K=256 has σ ≈ 1/√K ≈ 6%; assert generous bands
    — this is the test that catches multiset-vs-set union-sketch bugs,
    which parity gates cannot (both engines would share them)."""
    from ffi_etl_spark.queries import QUERIES

    rows = [(u, "X") for u in range(800)] + [(u, "Y") for u in range(400, 1000)]
    d = str(tmp_path / "sf")
    ev = spark.createDataFrame(
        [(i, u, et) for i, (u, et) in enumerate(rows)],
        "event_id long, user_id long, event_type string",
    ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp")) \
     .withColumn("value", F.lit(1.0)).withColumn("props", F.lit("{}"))
    ev.write.parquet(f"{d}/events.parquet")
    r = QUERIES["kmv_set_algebra"](spark, d).collect()[0]
    assert (r.type_a, r.type_b) == ("X", "Y") and r.exact_intersection == 400
    assert abs(float(r.est_a_s) - 800) < 0.2 * 800
    assert abs(float(r.est_b_s) - 600) < 0.2 * 600
    assert abs(float(r.est_union_s) - 1000) < 0.2 * 1000
    assert abs(float(r.est_intersection_s) - 400) < 0.35 * 400


def test_zorder_buckets_bound_both_columns(spark, sf_dir):
    """The locality property the layout lever exists for: coarsening the
    Morton code to 16 buckets fixes the top TWO bits of EACH clustered
    column, so every bucket's bounding box spans at most ~1/4 of the
    global range in BOTH l_partkey and l_suppkey (±1 grid cell of
    rounding) — i.e. a predicate on either column prunes buckets."""
    from ffi_etl_spark.queries import QUERIES

    rows = QUERIES["zorder_locality"](spark, sf_dir).collect()
    assert len(rows) > 1
    glo = {
        "p": (min(r["partkey_lo"] for r in rows), max(r["partkey_hi"] for r in rows)),
        "s": (min(r["suppkey_lo"] for r in rows), max(r["suppkey_hi"] for r in rows)),
    }
    for r in rows:
        for dim, lo, hi in (
            ("p", r["partkey_lo"], r["partkey_hi"]),
            ("s", r["suppkey_lo"], r["suppkey_hi"]),
        ):
            gspan = glo[dim][1] - glo[dim][0]
            assert (hi - lo) <= gspan / 4 + max(2, gspan * 0.01)


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
