"""Model-evaluation operators: classification report + calibration bins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table


def _report(spark, rows):
    from ffi_etl_spark.operators.inference import classification_report

    df = spark.createDataFrame(rows, "id long, label long, predicted long")
    return {r["class"]: r for r in classification_report(df).collect()}


def test_classification_report_hand_counts(spark):
    # 3 classes; class 2 never predicted, class 3 predicted but absent
    rows = [
        (0, 0, 0), (1, 0, 0), (2, 0, 1),   # class 0: tp=2 fn=1
        (3, 1, 1), (4, 1, 0), (5, 1, 1),   # class 1: tp=2 fn=1
        (6, 2, 3),                         # class 2: tp=0, predicted as 3
    ]
    rep = _report(spark, rows)
    r0 = rep[0]
    assert (r0["tp"], r0["fp"], r0["fn"], r0["support"]) == (2, 1, 1, 3)
    assert r0["precision"] == 2 / 3 and r0["recall"] == 2 / 3
    assert r0["f1"] == 4 / 6  # 2tp/(2tp+fp+fn) = 4/6
    r1 = rep[1]
    assert (r1["tp"], r1["fp"], r1["fn"], r1["support"]) == (2, 1, 1, 3)
    # class 2: support 1, never predicted -> precision NULL, recall 0
    r2 = rep[2]
    assert (r2["tp"], r2["fp"], r2["fn"], r2["support"]) == (0, 0, 1, 1)
    assert r2["precision"] is None and r2["recall"] == 0.0
    # class 3: predicted once, zero support -> recall NULL, precision 0
    r3 = rep[3]
    assert (r3["tp"], r3["fp"], r3["fn"], r3["support"]) == (0, 1, 0, 0)
    assert r3["recall"] is None and r3["precision"] == 0.0
    # F1 defined whenever tp+fp+fn > 0
    assert r2["f1"] == 0.0 and r3["f1"] == 0.0


def test_classification_report_perfect(spark):
    rows = [(i, i % 2, i % 2) for i in range(10)]
    rep = _report(spark, rows)
    for c in (0, 1):
        assert rep[c]["precision"] == 1.0
        assert rep[c]["recall"] == 1.0
        assert rep[c]["f1"] == 1.0
        assert rep[c]["support"] == 5


def test_calibration_bins_hand_counts(spark):
    from ffi_etl_spark.operators.inference import calibration_bins

    # scores in [0,1), 4 bins of width 0.25; dyadic scores -> exact sums
    rows = [
        (0, 0.0, False), (1, 0.125, True),        # bin 0
        (2, 0.25, True), (3, 0.375, True),        # bin 1
        (4, 0.75, False),                         # bin 3
        (5, -5.0, False), (6, 9.0, True),         # clamped to bins 0 / 3
    ]
    df = spark.createDataFrame(rows, "id long, margin double, label boolean")
    out = {
        r["bin"]: r
        for r in calibration_bins(df, lo=0.0, hi=1.0, n_bins=4).collect()
    }
    assert set(out) == {0, 1, 3}
    b0 = out[0]
    assert (b0["n"], b0["n_pos"]) == (3, 1)
    assert b0["mean_score"] == (0.0 + 0.125 - 5.0) / 3
    assert b0["frac_pos"] == 1 / 3
    b1 = out[1]
    assert (b1["n"], b1["n_pos"], b1["bin_lo"]) == (2, 2, 0.25)
    assert b1["mean_score"] == (0.25 + 0.375) / 2 and b1["frac_pos"] == 1.0
    b3 = out[3]
    assert (b3["n"], b3["n_pos"], b3["bin_lo"]) == (2, 1, 0.75)


def test_calibration_bins_rejects_bad_bins(spark):
    from ffi_etl_spark.operators.inference import calibration_bins

    df = spark.createDataFrame([(0, 0.5, True)], "id long, margin double, label boolean")
    with pytest.raises(ValueError):
        calibration_bins(df, n_bins=0)


def test_nb_learns_planted_vocabulary(spark):
    from ffi_etl_spark.operators.features import nb_train_score

    rows = []
    # two classes with disjoint vocab + shared filler; 20 docs each
    for i in range(20):
        rows.append((i, f"apple banana cherry filler{i % 3} common", "fruit"))
        rows.append((100 + i, f"bolt nut wrench filler{i % 3} common", "tool"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_train_score(df)
    assert out.count() == 40
    assert out.agg({"correct": "min"}).collect()[0][0] == 1  # 100% self-fit
    spark.catalog.clearCache()


def test_nb_tie_breaks_to_larger_class(spark):
    from ffi_etl_spark.operators.features import nb_train_score

    # perfectly symmetric corpus -> identical scores for both classes
    # on every doc; the argmax must deterministically pick the
    # lexicographically LARGER class name on both engines
    rows = [
        (1, "x y", "a"), (2, "x y", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["id"]: r for r in nb_train_score(df).collect()}
    assert out[1]["predicted"] == "b" and out[2]["predicted"] == "b"
    spark.catalog.clearCache()


def test_nb_skips_null_text(spark):
    from ffi_etl_spark.operators.features import nb_train_score

    rows = [(1, "aa bb", "x"), (2, None, "x"), (3, "aa cc", "y")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["id"] for r in nb_train_score(df).collect()}
    assert got == {1, 3}
    spark.catalog.clearCache()


def test_isotonic_matches_pava_reference(spark):
    from ffi_etl_spark.operators.inference import isotonic_calibrate

    def pava(ns, ps):
        # classic sequential pool-adjacent-violators on (pos, n) bins
        pools = [[p, n] for p, n in zip(ps, ns)]
        i = 0
        while i < len(pools) - 1:
            if pools[i][0] * pools[i + 1][1] > pools[i + 1][0] * pools[i][1]:
                pools[i][0] += pools[i + 1][0]
                pools[i][1] += pools[i + 1][1]
                del pools[i + 1]
                i = max(i - 1, 0)
            else:
                i += 1
        out = []
        for p, n in pools:
            out.extend([p / n] * 1)
        # expand pools back to per-bin rates
        rates, k = [], 0
        for p, n in pools:
            # count how many original bins the pool covers by matching n
            covered, acc = 0, 0
            while acc < n:
                acc += ns[k + covered]
                covered += 1
            rates.extend([p / n] * covered)
            k += covered
        return rates

    ns = [10, 10, 10, 10, 10]
    ps = [1, 5, 3, 2, 9]  # violation in the middle -> pooling
    rows = [(i, n, p) for i, (n, p) in enumerate(zip(ns, ps))]
    df = spark.createDataFrame(rows, "bin long, n long, n_pos long")
    got = {r["bin"]: r["iso_rate"] for r in isotonic_calibrate(df).collect()}
    want = pava(ns, ps)
    assert [got[i] for i in range(5)] == want
    # monotone non-decreasing
    assert all(got[i] <= got[i + 1] for i in range(4))


def test_isotonic_identity_when_already_monotone(spark):
    from ffi_etl_spark.operators.inference import isotonic_calibrate

    rows = [(0, 10, 1), (1, 10, 4), (2, 10, 8)]
    df = spark.createDataFrame(rows, "bin long, n long, n_pos long")
    got = {r["bin"]: r["iso_rate"] for r in isotonic_calibrate(df).collect()}
    assert got == {0: 0.1, 1: 0.4, 2: 0.8}


def test_more_like_this_ranks_lexical_overlap(spark):
    from ffi_etl_spark.operators.textops import more_like_this

    rows = [
        (0, "spark join shuffle hash"),          # query
        (1, "spark join shuffle hash"),          # identical -> cosine 1
        (2, "spark join shuffle sort"),          # 3/4 overlap
        (3, "pandas numpy arrow polars"),        # disjoint -> no row
        (4, "spark spark spark spark"),          # single shared term
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = more_like_this(df, query_id=0, k=10).collect()
    ids = [r["id"] for r in out]
    assert 3 not in ids                          # zero shared terms
    assert ids[0] == 1 and abs(out[0]["cosine"] - 1.0) < 1e-12
    by_id = {r["id"]: r for r in out}
    assert by_id[2]["cosine"] > by_id[4]["cosine"]
    assert by_id[1]["n_shared"] == 4 and by_id[2]["n_shared"] == 3
    spark.catalog.clearCache()


def test_entity_resolution_golden_planted(spark):
    """Planted dirty variants resolve to one golden record; distinct
    entities survive separately; singletons pass through."""
    from ffi_etl_spark.operators.graph import connected_components

    rows = (
        [("acme corp",)] * 5
        + [("acme c0rp",)] * 2      # dist 1 from acme corp
        + [("acme körp",)] * 1      # dist 2
        + [("zenith ltd",)] * 3     # unrelated block
        + [("solo inc",)] * 1       # singleton
    )
    df = spark.createDataFrame(rows, "p_name string")
    names = (
        df.groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("blk", F.split("p_name", " ")[0])
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(F.col("a.p_name").alias("id_a"), F.col("b.p_name").alias("id_b"))
    )
    comp = connected_components(pairs).withColumnsRenamed(
        {"vertex": "p_name", "component": "entity_id"}
    )
    allc = names.join(comp, "p_name", "left").select(
        "p_name",
        F.coalesce(F.col("entity_id"), F.col("p_name")).alias("entity_id"),
        "n",
    )
    golden = (
        allc.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.sum("n").cast("long").alias("total_n"),
            F.min(
                F.struct((-F.col("n")).alias("nn"), F.col("p_name").alias("nm"))
            )
            .getField("nm")
            .alias("canonical"),
        )
    ).collect()
    by_canon = {r["canonical"]: r for r in golden}
    assert len(golden) == 3
    acme = by_canon["acme corp"]          # most frequent variant wins
    assert acme["cluster_size"] == 3 and acme["total_n"] == 8
    assert by_canon["zenith ltd"]["cluster_size"] == 1
    assert by_canon["solo inc"]["total_n"] == 1


def test_wape_and_ols_on_crafted_series(spark):
    """Crafted daily series: perfect weekly seasonality -> WAPE 0;
    exact linear growth -> OLS recovers slope/intercept exactly."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 'flat': y = 3 every day for 21 days -> seasonal-naive perfect
    for d in range(21):
        for i in range(3):
            rows.append((len(rows), base + dt.timedelta(days=d), "flat"))
    # 'lin': y = d + 1 events on day d (exact linear trend)
    for d in range(10):
        for i in range(d + 1):
            rows.append((len(rows), base + dt.timedelta(days=d), "lin"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")

    daily = df.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    f = daily.select(
        "event_type", F.date_add("d", 7).alias("d"), F.col("y").alias("fc")
    )
    wape = {
        r["event_type"]: r
        for r in daily.join(f, ["event_type", "d"])
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.abs(F.col("y") - F.col("fc"))).cast("double")
                / F.sum("y").cast("double")
            ).alias("wape"),
            F.count(F.lit(1)).alias("nd"),
        )
        .collect()
    }
    assert wape["flat"]["wape"] == 0.0 and wape["flat"]["nd"] == 14
    assert "lin" in wape and wape["lin"]["wape"] > 0  # 3 scored days (d7-d9)

    # OLS on 'lin': y = x - x0 + 1 -> slope exactly 1
    from ffi_etl_spark.queries import QUERIES  # reuse registered callable shape
    daily2 = df.filter(F.col("event_type") == "lin").groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("x")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    s = daily2.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ).collect()[0]
    den = s["n"] * s["sxx"] - s["sx"] * s["sx"]
    slope = (s["n"] * s["sxy"] - s["sx"] * s["sy"]) / den
    assert slope == 1.0


def test_wilson_interval_properties(spark, sf_dir):
    from ffi_etl_spark.queries import QUERIES

    rows = QUERIES["conversion_wilson_ci"](spark, sf_dir).collect()
    import math
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["phat"] <= r["wilson_hi"] <= 1.0
        # reference formula cross-check in plain Python
        z, n, p = 1.96, r["n"], r["phat"]
        zzn = z * z / n
        rad = z * math.sqrt((p * (1 - p) + zzn / 4.0) / n)
        assert abs(r["wilson_lo"] - (p + zzn / 2 - rad) / (1 + zzn)) < 1e-12
        assert abs(r["wilson_hi"] - (p + zzn / 2 + rad) / (1 + zzn)) < 1e-12


def test_chi2_matches_scipyless_reference(spark):
    """Crafted 2x2 table with known chi2 = N(ad-bc)^2/(r1 r2 c1 c2)."""
    rows = (
        [(i, "x", 60.0) for i in range(30)]       # x high: 30
        + [(i + 100, "x", 10.0) for i in range(10)]  # x low: 10
        + [(i + 200, "y", 60.0) for i in range(15)]  # y high: 15
        + [(i + 300, "y", 10.0) for i in range(45)]  # y low: 45
    )
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    cells = df.groupBy(
        F.col("event_type").alias("r"),
        (F.col("value") > 50.0).cast("int").alias("c"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    margins = cells.groupBy("r").agg(F.sum("o").cast("long").alias("nr"))
    cmargins = cells.groupBy("c").agg(F.sum("o").cast("long").alias("nc"))
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    num = F.col("o") * F.col("n") - F.col("nr") * F.col("nc")
    term = (
        num.cast("double") * num.cast("double")
        / (F.col("n").cast("double") * F.col("nr").cast("double") * F.col("nc").cast("double"))
    )
    got = (
        cells.join(F.broadcast(margins), "r")
        .join(F.broadcast(cmargins), "c")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(F.floor(F.lit(float(1 << 20)) * term)).alias("q"))
        .collect()[0]["q"]
    ) / float(1 << 20)
    # chi2 for a 2x2: N(ad-bc)^2 / (r1 r2 c1 c2)
    a, b, c, d = 30, 10, 15, 45
    n = a + b + c + d
    want = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert abs(got - want) < 1e-4  # 4-term quantization error ≤ 4/2^20


def test_maintain_fact_dim_join_identity(spark):
    """Maintained join == full recompute under fact appends + dim
    updates + dim deletes (inner-join fallout)."""
    from ffi_etl_spark.operators.ivm import maintain_fact_dim_join

    fact_old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "fid long, k long"
    )
    fact_delta = spark.createDataFrame([(4, 10), (5, 40)], "fid long, k long")
    dim_old = spark.createDataFrame(
        [(10, "a"), (20, "b"), (30, "c")], "k long, attr string"
    )
    # dim now: 10 updated, 30 DELETED, 40 added
    dim_now = spark.createDataFrame(
        [(10, "a2"), (20, "b"), (40, "d")], "k long, attr string"
    )
    stored = fact_old.join(dim_old, "k").select("fid", "k", "attr")
    out = maintain_fact_dim_join(stored, fact_delta, dim_now, keys=("k",))
    got = sorted((r["fid"], r["k"], r["attr"]) for r in out.collect())
    full = (
        fact_old.unionByName(fact_delta).join(dim_now, "k").select("fid", "k", "attr")
    )
    want = sorted((r["fid"], r["k"], r["attr"]) for r in full.collect())
    assert got == want
    # the deleted dim key's fact rows fell out; updated key re-decorated
    assert (3, 30, "c") not in got
    assert (1, 10, "a2") in got and (4, 10, "a2") in got


def test_mmr_prefers_diverse_over_clustered(spark):
    """Planted geometry: query at origin; a tight cluster of 3 very
    near points and one slightly-farther outlier. Plain kNN top-3 is
    the cluster; MMR's second pick must jump to the outlier."""
    from ffi_etl_spark.operators.quantize import mmr_diverse_topk

    rows = [
        (0, [0.0, 0.0]),        # query
        (1, [1.0, 0.0]),        # cluster
        (2, [1.0, 0.1]),
        (3, [0.9, 0.1]),
        (4, [0.0, 2.0]),        # outlier, farther from q but far from cluster
        (5, [50.0, 50.0]),      # far away (sets the quantization range)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = mmr_diverse_topk(df, probe_id=0, n_candidates=5, k=3).collect()
    sel = [r["id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert sel[0] in (1, 2, 3)       # rank 1 = pure relevance
    assert sel[1] == 4               # rank 2 jumps to the diverse point
    # ranks are 1..k, div_min set from rank 2 on
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    assert sorted(out, key=lambda r: r["rank"])[1]["div_min"] is not None


def test_auc_grouped_matches_per_group_global(spark):
    """Per-group AUC == global AUC computed on each group's slice."""
    from ffi_etl_spark.operators.inference import auc_exact

    rows = [
        (i, "a", float(i), i >= 5) for i in range(10)       # perfect in a
    ] + [
        (i + 100, "b", float(-i), i >= 5) for i in range(10)  # inverted in b
    ]
    df = spark.createDataFrame(rows, "id long, g string, margin double, label boolean")
    grouped = {
        r["g"]: r["auc"]
        for r in auc_exact(df, group_cols=("g",)).collect()
    }
    assert grouped == {"a": 1.0, "b": 0.0}
    for g in ("a", "b"):
        solo = auc_exact(df.filter(F.col("g") == g)).collect()[0]["auc"]
        assert solo == grouped[g]


def test_psi_flags_planted_drift(spark):
    """First half uniform low values, second half shifted high -> PSI
    far above the 0.2 drift threshold; identical halves -> PSI ~ 0."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(rows, "event_id long, ts timestamp, value double")

    def psi_of(df):
        s = float(1 << 20)
        span = df.agg(
            ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
            .cast("long")
            .alias("half_us")
        )
        tagged = df.crossJoin(F.broadcast(span)).select(
            F.least(F.lit(9), F.greatest(F.lit(0), F.floor(F.col("value") / 10.0)))
            .cast("long")
            .alias("bin"),
            (F.unix_micros(F.col("ts")) <= F.col("half_us")).cast("int").alias("is_ref"),
        )
        cells = tagged.groupBy("bin").agg(
            F.sum("is_ref").cast("long").alias("n_ref"),
            F.sum(F.lit(1) - F.col("is_ref")).cast("long").alias("n_cur"),
        )
        tot = cells.agg(
            F.sum("n_ref").cast("long").alias("tr"),
            F.sum("n_cur").cast("long").alias("tc"),
        )
        p = (F.col("n_ref").cast("double") + F.lit(0.5)) / (
            F.col("tr").cast("double") + F.lit(5.0)
        )
        q = (F.col("n_cur").cast("double") + F.lit(0.5)) / (
            F.col("tc").cast("double") + F.lit(5.0)
        )
        term_q = F.floor(F.lit(s) * (p - q) * F.log(p / q)).cast("long")
        out = (
            cells.crossJoin(F.broadcast(tot))
            .agg((F.sum(term_q).cast("double") / F.lit(s)).alias("psi"))
            .collect()[0]["psi"]
        )
        return out

    drifted = mk(
        [(i, base + dt.timedelta(hours=i), 5.0) for i in range(100)]
        + [(i + 1000, base + dt.timedelta(hours=200 + i), 95.0) for i in range(100)]
    )
    stable = mk(
        [(i, base + dt.timedelta(hours=i), float((i * 7) % 100)) for i in range(200)]
    )
    assert psi_of(drifted) > 0.2
    assert abs(psi_of(stable)) < 0.1


def test_stump_finds_planted_split(spark):
    """Perfectly separable data at value 30 -> the stump must pick
    threshold bin 30 region with accuracy 1."""
    from ffi_etl_spark.queries import QUERIES

    rows = [(i, "purchase" if i % 2 == 0 else "view", 10.0 + (i % 20)) for i in range(200)]
    # overwrite: purchases all value<=29, views all >=31
    rows = [
        (i, "purchase", float(5 + i % 25)) for i in range(100)
    ] + [
        (i + 100, "view", float(31 + i % 60)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    df.createOrReplaceTempView("_stump_ev")

    from pyspark.sql import Window
    binned = df.select(
        F.least(F.lit(99), F.greatest(F.lit(0), F.floor(F.col("value"))))
        .cast("long").alias("bin"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy("bin")
    cum = cells.select(
        "bin",
        F.sum("n").over(w).cast("long").alias("nl"),
        F.sum("pos").over(w).cast("long").alias("posl"),
    )
    tot = cells.agg(F.sum("n").cast("long").alias("nt"), F.sum("pos").cast("long").alias("pt"))
    nr = F.col("nt") - F.col("nl")
    posr = F.col("pt") - F.col("posl")
    negl = F.col("nl") - F.col("posl")
    negr = nr - posr
    gini = (
        F.col("nl").cast("double")
        - ((F.col("posl") * F.col("posl")).cast("double") + (negl * negl).cast("double"))
        / F.col("nl").cast("double")
    ) + (
        nr.cast("double")
        - ((posr * posr).cast("double") + (negr * negr).cast("double")) / nr.cast("double")
    )
    best = (
        cum.crossJoin(F.broadcast(tot))
        .where((F.col("nl") > 0) & (nr > 0))
        .select("bin", gini.alias("g"), F.col("posl"), F.col("nl"))
        .orderBy("g", "bin")
        .limit(1)
        .collect()[0]
    )
    assert 29 <= best["bin"] <= 30      # the separating boundary
    assert best["g"] == 0.0             # pure split
    assert best["posl"] == best["nl"]   # left side all positive


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """No near-dup pair may straddle splits — by construction."""
    from ffi_etl_spark.queries import QUERIES
    from ffi_etl_spark.operators.dedup import dedup_minhash_lsh

    split = QUERIES["leakage_safe_split"](spark, sf_dir)
    pairs = dedup_minhash_lsh(table(spark, sf_dir, "documents"))
    a = split.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    b = split.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    straddle = (
        pairs.join(a, "id_a").join(b, "id_b").where(F.col("sa") != F.col("sb")).count()
    )
    assert straddle == 0
    # all three splits non-empty at sf0.01
    got = {r["split"] for r in split.select("split").distinct().collect()}
    assert got == {"train", "val", "test"}
    spark.catalog.clearCache()


def test_calendar_iso_attributes_at_year_boundaries(spark):
    """The hard calendar cases: ISO week/year straddling Jan 1
    (expected values cross-checked against DuckDB's isoyear/isodow)."""
    import datetime as dt

    days = [
        (dt.date(2019, 12, 29), 2019, 52, 7),
        (dt.date(2019, 12, 30), 2020, 1, 1),
        (dt.date(2020, 12, 31), 2020, 53, 4),
        (dt.date(2021, 1, 1), 2020, 53, 5),
        (dt.date(2021, 1, 4), 2021, 1, 1),
    ]
    df = spark.createDataFrame([(d,) for d, *_ in days], "cal_date date")
    d = F.col("cal_date")
    iso_dow = (F.pmod(F.dayofweek(d) + F.lit(5), F.lit(7)) + F.lit(1)).cast("int")
    thursday = F.date_add(d, 4 - iso_dow)
    got = {
        r["cal_date"]: (r["iso_year"], r["iso_week"], r["iso_dow"])
        for r in df.select(
            "cal_date",
            F.year(thursday).cast("int").alias("iso_year"),
            F.weekofyear(d).cast("int").alias("iso_week"),
            iso_dow.alias("iso_dow"),
        ).collect()
    }
    for day, iy, iw, dw in days:
        assert got[day] == (iy, iw, dw), (day, got[day])


def test_ivm_retractions_drop_emptied_groups(spark):
    """A group whose every row is retracted must vanish from the
    maintained view, exactly as a full recompute would show."""
    from ffi_etl_spark.operators.ivm import merge_grouped_partials

    base = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "id long, k long"
    ).withColumn("v", F.col("id") * 100)
    stored = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
    )
    # delete BOTH rows of k=10, insert one row of k=30
    cdc = spark.createDataFrame(
        [(1, 10, -1), (2, 10, -1), (9, 30, 1)], "id long, k long, _sign int"
    ).withColumn("v", F.col("id") * 100)
    delta = cdc.groupBy("k").agg(
        F.sum("_sign").cast("long").alias("n"),
        F.sum(F.col("_sign") * F.col("v")).cast("long").alias("s"),
    )
    out = {
        r["k"]: (r["n"], r["s"])
        for r in merge_grouped_partials(stored, delta, ["k"], {"n": "sum", "s": "sum"})
        .where(F.col("n") > 0)
        .collect()
    }
    assert out == {20: (1, 300), 30: (1, 900)}  # k=10 vanished


def test_ks_matches_scipyless_reference(spark):
    """Crafted samples: KS D computed by direct Python CDF walk."""
    import datetime as dt
    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)
    s1 = [1.0, 2.0, 3.0, 4.0, 5.0]          # first half
    s2 = [3.5, 4.5, 5.5, 6.5]                # second half (shifted)
    rows = [(i, base + dt.timedelta(hours=i), v) for i, v in enumerate(s1)]
    rows += [
        (100 + i, base + dt.timedelta(hours=200 + i), v) for i, v in enumerate(s2)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    span = df.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("long")
        .alias("half_us")
    )
    tagged = df.crossJoin(F.broadcast(span)).select(
        "value",
        (F.unix_micros(F.col("ts")) <= F.col("half_us")).cast("int").alias("s1"),
    )
    pv = tagged.groupBy("value").agg(
        F.sum("s1").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("s1")).cast("long").alias("c2"),
    )
    w = Window.orderBy("value")
    cum = pv.select(
        F.sum("c1").over(w).alias("f1"), F.sum("c2").over(w).alias("f2")
    )
    tot = pv.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    got = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            (
                F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")))
                .cast("double")
                / (F.first("n1") * F.first("n2")).cast("double")
            ).alias("d")
        )
        .collect()[0]["d"]
    )
    # direct reference: max |F1 - F2| over all sample points
    import itertools
    pts = sorted(set(s1 + s2))
    want = max(
        abs(
            sum(v <= p for v in s1) / len(s1)
            - sum(v <= p for v in s2) / len(s2)
        )
        for p in pts
    )
    assert abs(got - want) < 1e-12


def test_interpolation_fills_gap_linearly(spark):
    """Planted series: observed hours 0 (v=10) and 4 (v=50); hours
    1-3 must interpolate to 20/30/40; no extrapolation past the ends."""
    import datetime as dt
    from ffi_etl_spark.queries import QUERIES

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base + dt.timedelta(hours=0), "x", 10.0),
        (1, base + dt.timedelta(hours=0, minutes=30), "x", 10.0),
        (2, base + dt.timedelta(hours=4), "x", 50.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "events.parquet")
        df.write.parquet(path)
        out = {
            r["h"]: r
            for r in QUERIES["resample_interpolate"](spark, tmp).collect()
        }
    h0 = min(out)
    vals = [out[h0 + i]["value_i"] for i in range(5)]
    assert vals == [10.0, 20.0, 30.0, 40.0, 50.0]
    flags = [out[h0 + i]["is_observed"] for i in range(5)]
    assert flags == [1, 0, 0, 0, 1]


def test_rolling_ols_matches_numpy_windows(spark):
    """Trailing-14d slope per day equals a per-window numpy polyfit."""
    import datetime as dt

    import numpy as np

    base = dt.datetime(2024, 3, 1)
    # quadratic-ish series: slope should vary by day
    counts = [int(5 + 0.5 * d * d) for d in range(20)]
    rows = []
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append((len(rows), base + dt.timedelta(days=d), "x"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    import os
    import tempfile

    from ffi_etl_spark.queries import QUERIES

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = {
            r["day_idx"]: r["slope_14d"]
            for r in QUERIES["rolling_ols_trend"](spark, tmp).collect()
        }
    x0 = min(out)
    xs = np.arange(x0, x0 + 20)
    for d in range(20):
        lo = max(0, d - 13)
        w_x, w_y = xs[lo : d + 1], np.array(counts[lo : d + 1], dtype=float)
        if len(w_x) < 2:
            assert out[xs[d]] is None
            continue
        want = np.polyfit(w_x.astype(float), w_y, 1)[0]
        assert abs(out[xs[d]] - want) < 1e-9, (d, out[xs[d]], want)


def test_seasonal_dow_index_planted_weekend_dip(spark):
    """Weekends at half volume -> weekend indices < 1 < weekday
    indices, and the day-weighted mean of indices is 1."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)  # a Monday
    rows = []
    for d in range(28):  # 4 exact weeks
        day = base + dt.timedelta(days=d)
        vol = 4 if day.isoweekday() >= 6 else 8
        for i in range(vol):
            rows.append((len(rows), day, "x"))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    import os
    import tempfile

    from ffi_etl_spark.queries import QUERIES

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = {
            r["iso_dow"]: r for r in QUERIES["seasonal_dow_index"](spark, tmp).collect()
        }
    mean_daily = (5 * 8 + 2 * 4) / 7
    for dow in range(1, 6):
        assert abs(out[dow]["dow_index"] - 8 / mean_daily) < 1e-12
    for dow in (6, 7):
        assert abs(out[dow]["dow_index"] - 4 / mean_daily) < 1e-12
    weighted = sum(r["n_days"] * r["dow_index"] for r in out.values()) / sum(
        r["n_days"] for r in out.values()
    )
    assert abs(weighted - 1.0) < 1e-12


def test_train_score_evaluate_e2e(spark, sf_dir):
    """The full lifecycle example — train on the even-id split, score
    the odd-id holdout, evaluate, monitor — with cross-stage
    invariants: the trained stump beats the majority class on train,
    the report's support covers the whole holdout, AUC is defined and
    better than chance on this feature, the isotonic fit is monotone,
    and the parity split shows no drift."""
    from examples.train_score_evaluate import train_score_evaluate

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    arts = train_score_evaluate(spark, events)

    stump = arts["stump"].collect()[0]
    n_train = stump["n_left"] + stump["n_right"]
    pos_train = stump["pos_left"] + stump["pos_right"]
    majority = max(pos_train, n_train - pos_train) / n_train
    assert stump["stump_acc"] >= majority - 1e-12

    tree = arts["tree"]
    assert tree["feature"] == "bin"
    assert 0.0 <= tree["left"]["value"] <= 1.0
    assert 0.0 <= tree["right"]["value"] <= 1.0

    n_holdout = events.filter(F.col("event_id") % 2 == 1).count()
    report = {r["class"]: r for r in arts["report"].collect()}
    assert set(report) <= {0, 1}
    assert sum(r["support"] for r in report.values()) == n_holdout

    auc = arts["auc"].collect()[0]
    assert auc["n_pos"] + auc["n_neg"] == n_holdout
    assert auc["auc"] is not None and 0.0 <= auc["auc"] <= 1.0

    cal = arts["calibration"].orderBy("bin").collect()
    assert sum(r["n"] for r in cal) == n_holdout
    rates = [r["iso_rate"] for r in cal]
    assert all(a <= b + 1e-12 for a, b in zip(rates, rates[1:]))
    # the isotonic fit stays inside [0, 1] and brackets the global rate
    assert all(0.0 <= r <= 1.0 for r in rates)

    drift = arts["drift"].collect()[0]
    assert drift["drift_flag"] == 0  # parity split: same distribution
    assert abs(drift["psi"]) < 0.05
