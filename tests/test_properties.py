"""Property-based checks (SURVEY.md §5 item 4).

Hypothesis generates small category/flag distributions; the invariants
must hold for ANY input, not just the fixtures:

  * non-Unknown roll-up percentages sum to ~100% per demographic;
  * valid + invalid is a disjoint cover of the non-null-flag rows;
  * union roll-up is column-order invariant;
  * MinHash Jaccard estimate is bounded by banding guarantees
    (identical docs always pair).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from ffi_etl_spark.operators.rollup import demographic_rollup
from ffi_etl_spark.operators.validity import split_valid

CATEGORIES = ["A", "B", "C", "Unknown"]

_SETTINGS = dict(
    max_examples=8,  # each example spins Spark jobs; keep the loop tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(cats=st.lists(st.sampled_from(CATEGORIES), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_rollup_percentages_sum_to_100(spark, cats):
    df = spark.createDataFrame([Row(c=c) for c in cats])
    rows = demographic_rollup(df, "c", "D").collect()
    non_unknown = [r for r in rows if r["Category"] != "Unknown"]
    if not non_unknown:
        return  # all-Unknown input: no denominator, percentages are NULL-ish
    pcts = [float(r["% of Survey Responses"].rstrip("%")) for r in non_unknown]
    assert abs(sum(pcts) - 100.0) < 0.05 * len(pcts)
    # counts are conserved
    assert sum(r["# of Survey Responses"] for r in rows) == len(cats)


@given(
    flags=st.lists(
        st.sampled_from(["Valid", "bad-1", "bad-2", None]), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_split_is_disjoint_cover(spark, flags):
    df = spark.createDataFrame(
        [Row(**{"Is_Invalid": f, "i": i}) for i, f in enumerate(flags)],
        "Is_Invalid string, i int",
    )
    valid, invalid = split_valid(df)
    v = {r.i for r in valid.collect()}
    inv = {r.i for r in invalid.collect()}
    assert v.isdisjoint(inv)
    # cover = exactly the non-null-flag rows (reference nulls fall in neither)
    expected = {i for i, f in enumerate(flags) if f is not None}
    assert v | inv == expected


@given(perm=st.permutations(["x", "y", "z"]))
@settings(**_SETTINGS)
def test_rollup_column_order_invariant(spark, perm):
    """U1 via unionByName: input column order never changes the result."""
    rows = [Row(x="1", y="2", z="3") for _ in range(4)]
    df = spark.createDataFrame(rows).select(*perm)  # only column ORDER varies
    out = demographic_rollup(df, "x", "X").collect()
    assert out[0]["Category"] == "1" and out[0]["# of Survey Responses"] == 4


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=18,
    )
)
@settings(**_SETTINGS)
def test_connected_components_invariants(spark, edges):
    """For any random graph: both endpoints of every edge share a
    component, every component id is its own minimum member, and the
    result matches a driver-side union-find ground truth."""
    from ffi_etl_spark.operators.graph import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.vertex: r.component for r in connected_components(df).collect()}

    # ground truth: union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth_groups = {}
    for v in parent:
        truth_groups.setdefault(find(v), set()).add(v)

    for a, b in edges:
        assert got[a] == got[b]
    for root, members in truth_groups.items():
        assert {got[v] for v in members} == {min(members)}


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),    # user
            st.integers(min_value=0, max_value=40),   # hour offset
            st.integers(min_value=0, max_value=59),   # minute
            st.integers(min_value=-5, max_value=5),   # value
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_resample_locf_matches_pandas(spark, obs):
    """Differential: the distributed gap-fill must equal pandas'
    per-user hourly resample().last().ffill() on arbitrary event sets."""
    from datetime import datetime, timedelta

    import pandas as pd

    from ffi_etl_spark.operators.windows import resample_locf

    base = datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            user_id=u,
            ts=base + timedelta(hours=h, minutes=m),
            event_type="x",
            value=float(v),
        )
        for i, (u, h, m, v) in enumerate(obs)
    ]
    got = {
        (r.user_id, r.hour): r.value_locf
        for r in resample_locf(spark.createDataFrame(rows)).collect()
    }

    pdf = pd.DataFrame([r.asDict() for r in rows])
    want = {}
    for u, g in pdf.groupby("user_id"):
        # latest event per hour (ties: higher event_id wins), then ffill
        g = g.sort_values(["ts", "event_id"]).set_index("ts")
        hourly = g["value"].resample("1h").last().ffill()
        for ts, v in hourly.items():
            want[(u, ts.to_pydatetime())] = v
    assert got == want


@given(
    vals=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=60),
    nr=st.integers(min_value=1, max_value=9),
)
@settings(**_SETTINGS)
def test_global_cumsum_exclusive_property(spark, vals, nr):
    """For ANY value sequence and ANY range-partition count, the
    two-phase cumsum equals the python prefix sum — the decomposition
    is exact, not approximately right."""
    from ffi_etl_spark.operators.textops import global_cumsum_exclusive

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r["id"]: r["off"]
        for r in global_cumsum_exclusive(df, "id", "v", "off", num_ranges=nr).collect()
    }
    acc, want = 0, {}
    for i, v in enumerate(vals):
        want[i] = acc
        acc += v
    assert got == want


def test_global_cumsum_partition_perturbation(spark):
    """VERDICT r06 item 1: the cumsum must be BIT-IDENTICAL under any
    shuffle-partition count, any input partition layout, and repeated
    execution of the same plan — the failure mode was a sampled
    repartitionByRange referenced twice, where two physical executions
    could disagree on bucket bounds and attach wrong offsets (same row
    count, wrong values). With deterministic cutpoints the bucket id is
    a pure function of the key, so every layout must agree exactly."""
    from ffi_etl_spark.operators.textops import global_cumsum_exclusive

    rows = [(f"doc{i:04d}", (i * 37) % 101 + 1) for i in range(500)]
    acc, want = 0, {}
    for k, v in sorted(rows):
        want[k] = acc
        acc += v

    base = spark.createDataFrame(rows, "id string, v long")
    layouts = [
        base,
        base.repartition(1),
        base.repartition(13, F.col("v")),  # order-uncorrelated layout
        base.coalesce(2),
        base.orderBy(F.col("v").desc()),
    ]
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for sp in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            for df in layouts:
                out = global_cumsum_exclusive(df, "id", "v", "off", num_ranges=8)
                got = {r["id"]: r["off"] for r in out.collect()}
                # same plan executed twice must also agree (exchange re-execution)
                got2 = {r["id"]: r["off"] for r in out.collect()}
                assert got == want and got2 == want, f"sp={sp}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def test_global_cumsum_composite_key_nulls(spark):
    """Composite (desc-surrogate, id) order keys with NULLs in the lead
    column: Spark sorts NULLS FIRST ascending, and the cutpoint
    comparator must agree — a null key belongs below every cut."""
    from ffi_etl_spark.operators.textops import global_cumsum_exclusive

    rows = [
        (None, "a", 5),
        (None, "b", 3),
        (1, "c", 7),
        (1, "d", 2),
        (2, "e", 11),
        (3, "f", 1),
    ]
    df = spark.createDataFrame(rows, "w int, id string, v long")
    got = {
        r["id"]: r["off"]
        for r in global_cumsum_exclusive(
            df, ["w", "id"], "v", "off", num_ranges=4
        ).collect()
    }
    acc, want = 0, {}
    for w, k, v in sorted(rows, key=lambda t: ((t[0] is not None, t[0] or 0), t[1])):
        want[k] = acc
        acc += v
    assert got == want


def test_triangle_enum_crafted(spark):
    from ffi_etl_spark.operators.graph import triangle_enum

    # K4 on {1,2,3,4} (4 triangles) + a pendant edge (no triangle)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = sorted(tuple(r) for r in triangle_enum(df).collect())
    assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_weighted_sample_overselects_heavy_rows(spark):
    """Efraimidis-Spirakis top-k with md5 draws: rows with 1000x weight
    must dominate the sample far beyond their 10% population share."""
    from ffi_etl_spark.queries import QUERIES  # noqa: F401  (registry import)

    df = spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"),
        F.col("id").alias("o_custkey"),
        F.when(F.col("id") < 100, F.lit(1000.0)).otherwise(F.lit(1.0)).alias("o_totalprice"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast("long")
        + F.lit(1)
    ) / F.lit(4294967296.0)
    key = F.pow(u, F.lit(1.0) / F.col("o_totalprice"))
    top = (
        df.select("o_orderkey", "o_totalprice", key.alias("_key"))
        .orderBy(F.desc("_key"), "o_orderkey")
        .limit(50)
        .collect()
    )
    heavy = sum(1 for r in top if r["o_totalprice"] == 1000.0)
    assert heavy >= 35  # 10% of the population, >=70% of the sample


def test_connected_components_logarithmic_on_path(spark):
    """Large-star/small-star contract: a path graph (worst case for
    plain label propagation, which needs O(n) rounds) converges in
    O(log n) alternating rounds, and still labels every vertex with the
    path minimum."""
    import math

    from ffi_etl_spark.operators.graph import connected_components

    n = 64
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    stats = {}
    got = {r.vertex: r.component for r in connected_components(df, stats=stats).collect()}
    assert got == {i: 0 for i in range(n)}
    # geometric contraction: far under the path's O(n) propagation count
    assert stats["rounds"] <= 2 * int(math.log2(n)) + 3, stats


def test_pagerank_matches_numpy(spark):
    """Differential: distributed PageRank == dense numpy power
    iteration (same damping, dangling redistribution, iteration count)
    on a crafted graph with a dangling node and a hub."""
    import numpy as np

    from ffi_etl_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]  # 4 -> 3, 3 -> 1 cycle; no out from... all have out except none; add dangling 5
    edges.append((3, 5))  # 5 has no out-edges -> dangling
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.vertex: r.rank for r in pagerank(df, max_iter=25, tol=0.0).collect()}

    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = {v: [b for a, b in edges if a == v] for v in verts}
    d = 0.85
    r = np.full(n, 1.0 / n)
    for _ in range(25):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[idx[v]] for v in verts if not out[v])
        nxt += d * dangling / n
        for v in verts:
            for b in out[v]:
                nxt[idx[b]] += d * r[idx[v]] / len(out[v])
        r = nxt
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in verts:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=1, max_size=25
    )
)
@settings(**_SETTINGS)
def test_skyline_equals_bruteforce_on_random_points(spark, pts):
    """For ANY point set (duplicates included), the two-phase window
    skyline equals the O(n²) dominance definition."""
    from ffi_etl_spark.operators.skyline import skyline_2d

    rows = [(i, c, g) for i, (c, g) in enumerate(pts)]
    df = spark.createDataFrame(rows, ["id", "cost", "gain"])
    got = {r.id for r in skyline_2d(df, "cost", "gain").collect()}
    expect = {
        i
        for i, c, g in rows
        if not any(
            (c2 <= c and g2 >= g) and (c2 < c or g2 > g)
            for j, c2, g2 in rows
            if j != i
        )
    }
    assert got == expect


@given(
    keys=st.lists(st.integers(0, 40), min_size=1, max_size=60),
)
@settings(**_SETTINGS)
def test_countmin_never_undercounts_random_multisets(spark, keys):
    """CMS one-sided error bound holds for ANY key multiset."""
    from collections import Counter

    from ffi_etl_spark.operators.sketches import countmin_build, countmin_estimate

    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    sketch = countmin_build(df, "k", depth=3, width=16)
    probes = df.distinct()
    est = {
        r.k: r.cms_est
        for r in countmin_estimate(sketch, probes, "k", depth=3, width=16).collect()
    }
    exact = Counter(keys)
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)


@given(n=st.integers(1, 40), k=st.integers(1, 12))
@settings(**_SETTINGS)
def test_ntile_replay_matches_spark_for_any_n_k(spark, n, k):
    """The integer NTILE replay used by histogram_equidepth matches
    Spark's ntile for ANY row count and bucket count (both remainder
    regimes: n < k and n >= k)."""
    from pyspark.sql import Window

    from ffi_etl_spark.operators.textops import global_cumsum_exclusive

    df = spark.createDataFrame(
        [(i, (i * 37) % 11) for i in range(n)], ["rid", "v"]
    )
    w = Window.orderBy("v", "rid")
    want = {
        (r.rid, r.nt)
        for r in df.select("rid", F.ntile(k).over(w).alias("nt")).collect()
    }
    ranked = global_cumsum_exclusive(
        df.withColumn("_one", F.lit(1)), ["v", "rid"], "_one", out_col="_r0"
    )
    q, m = n // k, n % k
    r = F.col("_r0") + 1
    cut = m * (q + 1)
    qs = max(q, 1)
    bucket = F.when(r <= cut, F.floor((r + q) / (q + 1))).otherwise(
        m + F.floor(((r - cut) + qs - 1) / qs)
    )
    got = {
        (x.rid, x.nt)
        for x in ranked.select("rid", bucket.cast("int").alias("nt")).collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),   # id (dups + nulls)
            st.one_of(st.none(), st.integers(0, 8)),   # fkey (orphans + nulls)
            st.integers(-20, 120),                     # score
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_check_constraints_matches_bruteforce(spark, rows):
    """Property: every rule kind's violation count equals a plain-Python
    evaluation of the same rule over the same rows."""
    from ffi_etl_spark.operators.constraints import Rule, check_constraints

    parent_keys = {1, 2, 3, 4}
    parent = spark.createDataFrame([(k,) for k in sorted(parent_keys)], "pk long")
    df = spark.createDataFrame(rows, "id long, fkey long, score long")
    rules = [
        Rule("fk", "fk", col="fkey", parent=parent, parent_key="pk"),
        Rule("id_not_null", "not_null", col="id"),
        Rule("id_unique", "unique", col="id"),
        Rule("score_range", "range", col="score", lo=0, hi=100),
        Rule("score_pos", "predicate", expr="score > 0"),
    ]
    got = {r.rule: (r.n_checked, r.n_violations) for r in
           check_constraints(df, rules).collect()}
    ids = [i for i, _, _ in rows if i is not None]
    want = {
        "fk": sum(1 for _, f, _ in rows if f is not None and f not in parent_keys),
        "id_not_null": sum(1 for i, _, _ in rows if i is None),
        "id_unique": len(ids) - len(set(ids)),
        "score_range": sum(1 for _, _, s in rows if not 0 <= s <= 100),
        "score_pos": sum(1 for _, _, s in rows if not s > 0),
    }
    assert {k: v[1] for k, v in got.items()} == want
    assert all(v[0] == len(rows) for v in got.values())


@given(
    toks=st.lists(st.integers(1, 40), min_size=1, max_size=60),
    batch=st.sampled_from([4, 8]),
)
@settings(**_SETTINGS)
def test_padding_batch_accounting_matches_simulation(spark, toks, batch):
    """Property: the windowed batch/pad arithmetic used by
    padding_efficiency equals a direct Python simulation for the
    length-sorted strategy on one shard."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tok long"
    )
    w = Window.partitionBy(F.lit(1)).orderBy("n_tok", "doc_id")
    got = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("batch", F.expr(f"(rn - 1) div {batch}"))
        .groupBy("batch")
        .agg(
            F.sum("n_tok").alias("real_t"),
            (F.max("n_tok") * F.count(F.lit(1))).alias("pad_t"),
        )
        .agg(F.sum("real_t").alias("real"), F.sum("pad_t").alias("pad"))
        .collect()[0]
    )
    order = sorted(range(len(toks)), key=lambda i: (toks[i], i))
    pad = real = 0
    for b in range(0, len(order), batch):
        chunk = [toks[i] for i in order[b : b + batch]]
        real += sum(chunk)
        pad += max(chunk) * len(chunk)
    assert (got.real, got.pad) == (real, pad)


@given(
    facts=st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 8)), min_size=0, max_size=24
    ),
    split=st.integers(0, 100),
    dim_now=st.lists(
        st.tuples(st.integers(0, 8), st.text("abc", min_size=1, max_size=3)),
        min_size=0,
        max_size=9,
        unique_by=lambda t: t[0],
    ),
)
@settings(**_SETTINGS)
def test_join_maintenance_identity_property(spark, facts, split, dim_now):
    """maintain_fact_dim_join(stored, Δ, dim_now) ≡ (facts ⋈ dim_now)
    for ANY fact split, ANY dim rewrite (updates, deletes, inserts)."""
    from ffi_etl_spark.operators.ivm import maintain_fact_dim_join

    facts = list({(fid, k) for fid, k in facts})  # unique fact keys
    old = [(f, k) for f, k in facts if f % 101 <= split]
    delta = [(f, k) for f, k in facts if f % 101 > split]
    dim_old = [(k, "v%d" % k) for k in range(9)]

    fact_schema = "fid long, k long"
    dim_schema = "k long, attr string"
    df_old = spark.createDataFrame(old, fact_schema)
    df_delta = spark.createDataFrame(delta, fact_schema)
    df_dim_old = spark.createDataFrame(dim_old, dim_schema)
    df_dim_now = spark.createDataFrame(list(dim_now), dim_schema)

    stored = df_old.join(df_dim_old, "k").select("fid", "k", "attr")
    got = sorted(
        (r["fid"], r["k"], r["attr"])
        for r in maintain_fact_dim_join(
            stored, df_delta, df_dim_now, keys=("k",)
        ).collect()
    )
    want = sorted(
        (r["fid"], r["k"], r["attr"])
        for r in df_old.unionByName(df_delta)
        .join(df_dim_now, "k")
        .select("fid", "k", "attr")
        .collect()
    )
    assert got == want


@given(
    vals=st.lists(st.integers(0, 1000), min_size=30, max_size=120),
)
@settings(**_SETTINGS)
def test_quantile_compaction_error_bound_property(spark, vals):
    """For ANY value multiset: answers from the COMPACTED summary stay
    within k(parts−1) + k·stride of the target rank."""
    from ffi_etl_spark.operators.sketches import (
        compact_quantile_summary,
        quantile_summary,
        quantile_summary_query,
    )

    k, stride, shards = 4, 2, 4
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    summ = quantile_summary(df, n_shards=shards, k=k)
    comp = compact_quantile_summary(summ, k=k, stride=stride)
    n = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    res = quantile_summary_query(comp, n, [0.5], k=k, part_cols=("part",)).collect()
    assert len(res) == 1
    r = res[0]
    true_rank = df.where(
        (F.col("value") < r["est_value"])
        | ((F.col("value") == r["est_value"]) & (F.col("event_id") <= r["est_id"]))
    ).count()
    band = k * (shards - 1) + k * stride
    assert abs(true_rank - r["target_rank"]) <= band
    spark.catalog.clearCache()


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_classification_report_invariants_property(spark, pairs):
    """For ANY (label, prediction) multiset: tp+fn == support per
    class, Σsupport == N, Σtp == Σ(correct), and 0 ≤ f1 ≤ 1."""
    from ffi_etl_spark.operators.inference import classification_report

    rows = [(i, y, p) for i, (y, p) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, label long, predicted long")
    rep = classification_report(df).collect()
    n = len(pairs)
    assert sum(r["support"] for r in rep) == n
    correct = sum(1 for y, p in pairs if y == p)
    assert sum(r["tp"] for r in rep if r["support"] > 0 or r["tp"] > 0) >= 0
    assert sum(r["tp"] for r in rep) == correct
    for r in rep:
        assert r["tp"] + r["fn"] == r["support"]
        if r["f1"] is not None:
            assert 0.0 <= r["f1"] <= 1.0


@given(
    members=st.sets(st.integers(0, 400), min_size=0, max_size=60),
    probes=st.sets(st.integers(0, 400), min_size=1, max_size=60),
)
@settings(**_SETTINGS)
def test_bloom_never_false_negative_property(spark, members, probes):
    """For ANY member/probe sets: every true member is claimed
    (zero false negatives), with the engine's md5-salted bit scheme."""
    from ffi_etl_spark.functions.hashing import md5_int32

    M, K = 1 << 10, 3

    def bit(col, j):
        return md5_int32(F.concat(F.lit(f"bf{j}_"), col.cast("string"))) % M

    mdf = spark.createDataFrame([(m,) for m in members] or [(None,)], "k long").where(
        F.col("k").isNotNull()
    )
    bits = None
    for j in range(K):
        b = mdf.select(bit(F.col("k"), j).alias("bit"))
        bits = b if bits is None else bits.unionByName(b)
    bits = bits.distinct()
    pdf = spark.createDataFrame([(p,) for p in probes], "k long")
    probed = pdf
    for j in range(K):
        probed = probed.join(
            F.broadcast(bits.withColumnRenamed("bit", f"_b{j}")),
            bit(F.col("k"), j) == F.col(f"_b{j}"),
            "left",
        )
    claimed_col = None
    for j in range(K):
        c = F.col(f"_b{j}").isNotNull()
        claimed_col = c if claimed_col is None else (claimed_col & c)
    got = {
        r["k"]: r["c"]
        for r in probed.select("k", claimed_col.alias("c")).collect()
    }
    for p in probes:
        if p in members:
            assert got[p] is True  # the Bloom guarantee


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=6),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_more_like_this_matches_bruteforce_property(spark, docs):
    """For ANY tiny corpus: the engine's integer-weight cosine ranking
    equals a brute-force Python computation with the same quantized
    weights."""
    import math
    from collections import Counter

    from ffi_etl_spark.operators.textops import more_like_this

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["id"]: r["cosine"] for r in more_like_this(df, query_id=0, k=50).collect()
    }

    # brute force with identical arithmetic
    n_docs = len(texts)
    tfs = [Counter(t.split()) for t in texts]
    dfreq = Counter()
    for tf in tfs:
        for term in tf:
            dfreq[term] += 1
    bits = 10

    def qidf(term):
        return math.floor(
            (1 << bits) * ((n_docs - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
        )

    def vec(tf):
        return {t: c * qidf(t) for t, c in tf.items()}

    q = vec(tfs[0])
    qn = sum(w * w for w in q.values())
    for i in range(1, n_docs):
        v = vec(tfs[i])
        dot = sum(v[t] * q[t] for t in v if t in q)
        if dot == 0:
            assert i not in out or out[i] == 0.0
            continue
        vn = sum(w * w for w in v.values())
        want = dot / (math.sqrt(vn) * math.sqrt(qn))
        assert i in out and abs(out[i] - want) < 1e-12
    spark.catalog.clearCache()


_PURE_SETTINGS = dict(max_examples=300, deadline=None)  # no Spark involved


@given(
    ambient=st.floats(0.0, 0.8),
    threshold=st.floats(0.1, 0.9),
    dup_sim=st.floats(0.5, 0.99),
    recall_floor=st.floats(0.5, 0.99),
)
@settings(**_PURE_SETTINGS)
def test_choose_minhash_split_invariants(ambient, threshold, dup_sim, recall_floor):
    """Structural invariants of the adaptive banding chooser: the split
    always divides the signature; whenever it moves off the default it
    must (a) satisfy the recall floor at dup_sim and (b) never be worse
    than the default on ambient collisions when the default itself is
    feasible; and raising ambient never loosens the chosen split's
    ambient collision probability."""
    from ffi_etl_spark.functions.lsh_tuning import (
        candidate_probability,
        choose_minhash_split,
        tune_bands,
    )

    num_perm, bands, rows = choose_minhash_split(
        ambient, threshold, dup_sim=dup_sim, recall_floor=recall_floor
    )
    assert bands * rows == num_perm
    assert num_perm in (12, 24, 36)

    b0, r0 = tune_bands(12, threshold, fp_weight=5)
    default = (12, b0, r0)
    # ADVICE r06 (medium): the recall contract holds on EVERY path —
    # including the low-ambient fast path — whenever any offered split
    # can meet it; only the documented infeasible fallback is exempt.
    feasible = any(
        candidate_probability(dup_sim, b, np // b) >= recall_floor
        for np in (12, 24, 36)
        for b in range(1, np + 1)
        if np % b == 0
    )
    if feasible:
        assert candidate_probability(dup_sim, bands, rows) >= recall_floor
    if (num_perm, bands, rows) != default:
        assert candidate_probability(dup_sim, bands, rows) >= recall_floor
        if candidate_probability(dup_sim, b0, r0) >= recall_floor:
            assert candidate_probability(ambient, bands, rows) <= candidate_probability(
                ambient, b0, r0
            )
    # monotone-in-ambient, but only once BOTH calls are in the search
    # branch: if this call already searched (pick != default), a
    # higher-ambient call searches too (its budget check can only be
    # harder) and minimizes the same recall-feasible set, so its pick
    # can never collide more at hi than ours does. When this call took
    # the default-budget branch instead, the default need not be
    # recall-feasible and the comparison is meaningless.
    if (num_perm, bands, rows) != default:
        hi = min(ambient + 0.1, 0.9)
        nh, bh, rh = choose_minhash_split(
            hi, threshold, dup_sim=dup_sim, recall_floor=recall_floor
        )
        assert (
            candidate_probability(hi, bh, rh)
            <= candidate_probability(hi, bands, rows) + 1e-12
        )


@given(
    appends=st.lists(
        st.lists(st.integers(min_value=0, max_value=400),
                 min_size=1, max_size=30),
        min_size=1, max_size=5,
    ),
    compact_after=st.sets(st.integers(min_value=0, max_value=4), max_size=3),
)
@settings(**_SETTINGS)
def test_stored_state_append_compact_preserves_rows(
    spark, tmp_path_factory, appends, compact_after
):
    """The shared bucketed-state stack (round 11): for ANY sequence of
    appends interleaved with per-bucket compactions, the stored rowset
    is exactly the multiset of appended rows (compaction rewrites
    files, never rows), and every write lands at most one file per
    touched bucket."""
    from collections import Counter

    from ffi_etl_spark.operators.stored_state import (
        bucket_file_counts,
        compact_buckets,
        crowded_buckets,
        write_bucketed,
    )

    tmp = tmp_path_factory.mktemp("stored_state_prop")
    path = str(tmp / "state")
    expected: list[tuple] = []
    uid = 0
    for i, batch in enumerate(appends):
        rows = [Row(id=uid + j, v=int(x), b=int(x) % 7)
                for j, x in enumerate(batch)]
        uid += len(batch)
        expected.extend((r.id, r.v, r.b) for r in rows)
        df = spark.createDataFrame(rows).repartition(4)
        write_bucketed(df, path, "b", mode="append" if i else "error")
        stored = spark.read.parquet(path)
        counts = bucket_file_counts(stored, "b")
        assert max(counts.values()) <= i + 1  # ≤1 file/bucket/write
        if i in compact_after:
            compact_buckets(spark, path, "b",
                            crowded_buckets(stored, "b", 1))
    got = sorted(
        tuple(r) for r in
        spark.read.parquet(path).select("id", "v", "b").collect()
    )
    assert got == sorted(expected)
