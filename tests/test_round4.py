"""Round-4 operator tests: skyline dominance, quantization invariants,
BM25 ranking, end-to-end dedup survivors."""

import __spark_entry__ as entry_mod

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_skyline_matches_bruteforce(spark):
    """Differential: the two-phase window skyline equals the O(n²)
    dominance definition, including tie semantics (equal points both
    survive; same-price-bigger-size dominates)."""
    from ffi_etl_spark.operators.skyline import skyline_2d

    rows = [
        (1, 10, 5), (2, 10, 5),   # duplicates: both non-dominated
        (3, 10, 4),               # dominated by 1/2 (same cost, smaller gain)
        (4, 9, 4),                # skyline (cheaper than 1, smaller)
        (5, 12, 6),               # skyline (best gain)
        (6, 12, 5),               # dominated by 1 (cheaper, equal gain)
        (7, 8, 1),                # skyline (cheapest)
        (8, 13, 6),               # dominated by 5
    ]
    df = spark.createDataFrame(rows, ["id", "cost", "gain"])
    got = {r.id for r in skyline_2d(df, "cost", "gain").collect()}
    data = {i: (c, g) for i, c, g in rows}
    expect = {
        i
        for i, (c, g) in data.items()
        if not any(
            (c2 <= c and g2 >= g) and (c2 < c or g2 > g)
            for j, (c2, g2) in data.items()
            if j != i
        )
    }
    assert got == expect == {1, 2, 4, 5, 7}


def test_skyline_plan_has_no_self_join(spark):
    """The scale contract: windows, never an O(n²) dominance join."""
    qs = entry_mod.queries()
    plan = qs["skyline_pareto"](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") == 2  # part scanned once (tree + details)


def test_quantize_codes_in_range_and_ordered(spark):
    from ffi_etl_spark.operators.quantize import quantize_embeddings_int8
    from ffi_etl_spark.catalog import table

    out = quantize_embeddings_int8(table(spark, SF, "embeddings")).collect()
    assert len(out) == table(spark, SF, "embeddings").count()
    for r in out:
        codes = [int(c) for c in r.codes_csv.split(",")]
        assert len(codes) == r.n_dims
        assert all(0 <= c <= 255 for c in codes)
    # each dimension's extremes hit the code boundary somewhere
    all_codes = [
        [int(c) for c in r.codes_csv.split(",")] for r in out
    ]
    n_dims = len(all_codes[0])
    for d in range(n_dims):
        col = [v[d] for v in all_codes]
        assert min(col) == 0 and max(col) == 255


def test_bm25_prefers_term_dense_docs(spark):
    """The top-ranked doc must contain at least one query term, and
    ranking is deterministic across invocations."""
    qs = entry_mod.queries()
    a = [(r.doc_id, r.score_s) for r in qs["bm25_rank"](spark, SF01).collect()]
    b = [(r.doc_id, r.score_s) for r in qs["bm25_rank"](spark, SF01).collect()]
    assert a == b and len(a) == 20
    assert all(float(s) > 0 for _, s in a)
    from ffi_etl_spark.catalog import table

    top_text = (
        table(spark, SF01, "documents")
        .filter(F.col("doc_id") == a[0][0])
        .select("text")
        .first()[0]
        .lower()
    )
    assert any(t in top_text.split() for t in ("hash", "spark", "window"))


def test_two_phase_ntile_matches_window_ntile(spark):
    """histogram_equidepth's integer ntile replay must equal Spark's
    NTILE on a count NOT divisible by the bucket count (the remainder
    path: first n%k buckets one row bigger)."""
    from pyspark.sql import Window
    from ffi_etl_spark.operators.textops import global_cumsum_exclusive

    df = spark.createDataFrame(
        [(i, float((i * 37) % 23)) for i in range(23)], ["event_id", "value"]
    )
    w = Window.orderBy("value", "event_id")
    want = {
        (r.event_id, r.nt)
        for r in df.select("event_id", F.ntile(10).over(w).alias("nt")).collect()
    }
    ranked = global_cumsum_exclusive(
        df.withColumn("_one", F.lit(1)), ["value", "event_id"], "_one", out_col="_r0"
    )
    n = 23
    q, m = n // 10, n % 10
    r = F.col("_r0") + 1
    cut = m * (q + 1)
    decile = F.when(r <= cut, F.floor((r + q) / (q + 1))).otherwise(
        m + F.floor(((r - cut) + max(q, 1) - 1) / max(q, 1))
    )
    got = {
        (x.event_id, x.nt)
        for x in ranked.select("event_id", decile.cast("int").alias("nt")).collect()
    }
    assert got == want


def test_histogram_equidepth_plan_two_phase(spark):
    """The default equi-depth path must never run a global
    single-partition window over the raw rows: rangepartitioning
    present, and every window is keyed."""
    qs = entry_mod.queries()
    plan = qs["histogram_equidepth"](spark, SF)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "rangepartitioning" in plan
    assert "ntile" not in plan.lower()


def test_dedup_survivors_break_every_pair(spark):
    """Every verified near-dup pair loses at least one endpoint, and
    survivors + dropped partition the corpus."""
    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.dedup import dedup_minhash_lsh

    qs = entry_mod.queries()
    survivors = {r.doc_id for r in qs["dedup_survivors"](spark, SF01).collect()}
    corpus = {r.doc_id for r in table(spark, SF01, "documents").select("doc_id").collect()}
    assert survivors <= corpus
    pairs = dedup_minhash_lsh(table(spark, SF01, "documents")).collect()
    assert pairs  # testdata has known near-dup templates
    for p in pairs:
        assert not (p.id_a in survivors and p.id_b in survivors), (p.id_a, p.id_b)


def test_countmin_never_undercounts_all_users(spark):
    """CMS one-sided guarantee over the FULL key set (not just the
    gated sub-20 probe): est >= exact for every user."""
    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.sketches import countmin_build, countmin_estimate

    ev = table(spark, SF01, "events")
    sketch = countmin_build(ev, "user_id")
    probes = ev.select("user_id").distinct()
    est = {r.user_id: r.cms_est for r in countmin_estimate(sketch, probes, "user_id").collect()}
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # width 256 >> 150 distinct users: most estimates should be exact
    exact_hits = sum(1 for k in exact if est[k] == exact[k])
    assert exact_hits / len(exact) > 0.5


def test_random_projection_preserves_relative_distances(spark):
    """JL sanity: the 64->8 projection keeps near pairs nearer than far
    pairs on average (rank correlation over a small sample), and the
    seeded matrix is deterministic."""
    import math

    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.quantize import achlioptas_signs, random_project

    assert achlioptas_signs(8, 2) == achlioptas_signs(8, 2)
    # i.i.d. embeddings have strongly concentrated pairwise distances,
    # the worst case for rank preservation — 16 output dims keeps the
    # JL distortion small enough for a clearly positive correlation
    emb = table(spark, SF01, "embeddings").limit(40)
    orig = {r.vec_id: list(r.embedding) for r in emb.collect()}
    proj = {
        r.vec_id: [r[f"y{j}"] for j in range(16)]
        for r in random_project(emb, in_dim=64, out_dim=16).collect()
    }

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ids = sorted(orig)[:20]
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    do = [d(orig[a], orig[b]) for a, b in pairs]
    dp = [d(proj[a], proj[b]) for a, b in pairs]
    # Spearman-ish: correlation of ranks must be clearly positive
    rank_o = {p: i for i, p in enumerate(sorted(range(len(do)), key=do.__getitem__))}
    rank_p = {p: i for i, p in enumerate(sorted(range(len(dp)), key=dp.__getitem__))}
    n = len(pairs)
    d2 = sum((rank_o[i] - rank_p[i]) ** 2 for i in range(n))
    spearman = 1 - 6 * d2 / (n * (n * n - 1))
    assert spearman > 0.3, spearman


def test_lm_anomaly_flags_improbable_transition(spark):
    """A doc splicing a one-off bigram into otherwise-repetitive text
    must score a lower min_prob than the purely repetitive doc."""
    from ffi_etl_spark.operators.textops import lm_transition_anomaly

    common = ("alpha beta " * 50).strip()
    spliced = common + " alpha zeta " + common
    df = spark.createDataFrame(
        [(1, common), (2, spliced), (3, common)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in lm_transition_anomaly(df).collect()}
    assert out[2].min_prob < out[1].min_prob
    assert out[2].n_rare >= 0 and out[1].n_bigrams > 0


def test_label_propagation_two_cliques(spark):
    """Crafted semantics lock: two triangles joined by one bridge edge
    resolve to exactly two communities split at the bridge — LP's
    density granularity vs connected_components (which would merge all
    six vertices into one)."""
    from ffi_etl_spark.operators.graph import connected_components, label_propagation

    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    comm = {r.vertex: r.community for r in label_propagation(df).collect()}
    assert len(set(comm.values())) == 2
    assert comm[1] == comm[2] == comm[3]
    assert comm[4] == comm[5] == comm[6]
    assert comm[3] != comm[4]
    # same graph, components: ONE cluster
    comp = {r.component for r in connected_components(df).collect()}
    assert comp == {1}


def test_knn_int8_recall_vs_float(spark):
    """The quantized-code kNN must agree with exact float-space kNN for
    most of the top-10 (256 levels/dim is a fine grid): recall >= 0.7
    per probe."""
    import math

    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.quantize import knn_int8_codes

    emb = table(spark, SF01, "embeddings")
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    got: dict[int, set] = {}
    for r in knn_int8_codes(emb, probe_ids=[0, 1, 2], k=10).collect():
        got.setdefault(r.pid, set()).add(r.vec_id)
    for pid in (0, 1, 2):
        p = vecs[pid]
        exact = sorted(
            (
                (sum((x - y) ** 2 for x, y in zip(p, v)), vid)
                for vid, v in vecs.items()
                if vid != pid
            )
        )[:10]
        exact_ids = {vid for _, vid in exact}
        recall = len(got[pid] & exact_ids) / 10
        assert recall >= 0.7, (pid, recall)


def test_check_oracle_canon_preserves_integers():
    """frame_hash must not let pandas upcast int columns to float in
    all-numeric frames (iterrows would): two frames differing by 1 in a
    big integer must hash differently at EVERY precision band."""
    import importlib.util
    import os

    import pandas as pd

    spec = importlib.util.spec_from_file_location(
        "check_oracle",
        os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    a = pd.DataFrame({"n": [6000123], "x": [1.5]})
    b = pd.DataFrame({"n": [6000124], "x": [1.5]})
    assert mod.frame_hash(a, "%.6g") != mod.frame_hash(b, "%.6g")
    # and ints beyond float53 stay exact
    big = 2**60
    c = pd.DataFrame({"n": [big], "x": [0.0]})
    d = pd.DataFrame({"n": [big + 1], "x": [0.0]})
    assert mod.frame_hash(c, "%.6g") != mod.frame_hash(d, "%.6g")


def test_incremental_dedup_stored_signatures_parity(spark, tmp_path):
    """The production path (precomputed minhash_signature_table) must
    return bit-identical pairs to the raw-documents path, and reject
    ambiguous/double corpus arguments."""
    import pytest

    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.dedup import (
        dedup_minhash_incremental,
        minhash_signature_table,
    )

    d = table(spark, SF01, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    raw = sorted(
        (r.id_a, r.id_b, r.jaccard_sim, r.pair_type)
        for r in dedup_minhash_incremental(corpus, batch).collect()
    )
    path = str(tmp_path / "sigs")
    minhash_signature_table(corpus).write.parquet(path)
    sigs = spark.read.parquet(path)
    via = sorted(
        (r.id_a, r.id_b, r.jaccard_sim, r.pair_type)
        for r in dedup_minhash_incremental(
            None, batch, corpus_hashed=sigs
        ).collect()
    )
    assert raw == via and raw
    with pytest.raises(ValueError, match="exactly one"):
        dedup_minhash_incremental(corpus, batch, corpus_hashed=sigs)
    with pytest.raises(ValueError, match="exactly one"):
        dedup_minhash_incremental(None, batch)


def test_containment_catches_subset_docs(spark):
    """A doc whose shingles sit inside a longer doc must surface with
    containment ~1 even though Jaccard is well below 1."""
    from ffi_etl_spark.operators.dedup import dedup_containment, dedup_minhash_lsh

    a = "the quick brown fox jumps over the lazy dog near the river bank " * 4
    b = a + "and then wanders far beyond the quiet meadow fence line today"
    c = "completely unrelated text about orbital mechanics and thrust " * 5
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], ["doc_id", "text"])
    pairs = {(r.id_a, r.id_b): r.containment for r in dedup_containment(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.95
    jac = {(r.id_a, r.id_b): r.jaccard_sim for r in dedup_minhash_lsh(df).collect()}
    assert jac.get((1, 2), 0) < 0.95  # jaccard under-scores the subset pair
