"""Unit tests: dedup tiers + similarity search on crafted corpora."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.functions.vectors import cosine
from ffi_etl_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_lsh,
    dedup_simhash,
    simhash_fingerprints,
)
from ffi_etl_spark.operators.similarity import ann_sign_lsh_pairs, knn_bruteforce


def _docs(spark, texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


BASE = "the quick brown fox jumps over the lazy dog again and again until done"


def test_dedup_exact_groups(spark):
    df = _docs(spark, [BASE, BASE, "something else entirely"])
    out = {r.canonical_id: r.n_copies for r in dedup_exact(df).collect()}
    assert out == {0: 2, 2: 1}


def test_minhash_finds_identical_and_near(spark):
    near = BASE.replace("lazy", "sleepy")
    df = _docs(spark, [BASE, BASE, near, "totally different words about spark engines"])
    pairs = {(r.id_a, r.id_b): r.jaccard_sim for r in dedup_minhash_lsh(df).collect()}
    assert pairs[(0, 1)] == 1.0               # identical docs: jaccard exactly 1
    assert all(a < b for a, b in pairs)       # canonical pair ordering
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_simhash_identical_zero_hamming(spark):
    df = _docs(spark, [BASE, BASE])
    fps = [r.simhash for r in simhash_fingerprints(df).collect()]
    assert fps[0] == fps[1]
    pairs = dedup_simhash(df).collect()
    assert len(pairs) == 1 and pairs[0].hamming == 0


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 0.0, 2.0], b=[1.0, 0.0, 2.0]), Row(a=[1.0, 0.0, 0.0], b=[0.0, 1.0, 0.0])]
    )
    out = [r.c for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert math.isclose(out[0], 1.0) and out[1] == 0.0


def test_knn_bruteforce_topk(spark):
    vecs = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in vecs])
    out = knn_bruteforce(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)] == [1, 2]
    assert all(r.query_id == 0 for r in out)


def test_ann_sign_lsh_buckets(spark):
    # same orthant -> same bucket -> candidate; opposite signs -> pruned
    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 1.0, 0.5]),
            Row(vec_id=1, embedding=[0.9, 1.1, 0.4]),
            Row(vec_id=2, embedding=[-1.0, -1.0, -0.5]),
        ]
    )
    pairs = ann_sign_lsh_pairs(df, bits=3, threshold=0.5).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]
    assert pairs[0].cosine_sim > 0.99


def test_ivf_assignment_and_topk(spark):
    from ffi_etl_spark.operators.similarity import ann_ivf_topk, assign_to_centroid, compute_centroids

    # two well-separated clusters on the first axis
    rows = [
        Row(vec_id=0, label=0, embedding=[1.0, 0.1]),
        Row(vec_id=1, label=0, embedding=[0.9, 0.2]),
        Row(vec_id=2, label=0, embedding=[1.1, 0.0]),
        Row(vec_id=3, label=1, embedding=[-1.0, 0.1]),
        Row(vec_id=4, label=1, embedding=[-0.9, -0.1]),
    ]
    df = spark.createDataFrame(rows)
    cents = compute_centroids(df, dim=2)
    assert cents.count() == 2
    assigned = {r.vec_id: r.centroid_id for r in assign_to_centroid(df, cents).collect()}
    assert assigned == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}

    out = ann_ivf_topk(df, df.filter(F.col("vec_id") == 0), dim=2, k=5).collect()
    # only same-cell neighbors: 1 and 2, never the negative cluster
    assert sorted(r.neighbor_id for r in out) == [1, 2]


def test_ann_brp_lsh_finds_close_pairs(spark):
    from ffi_etl_spark.operators.similarity import ann_brp_lsh_pairs

    rows = [
        Row(vec_id=0, embedding=[0.0, 0.0]),
        Row(vec_id=1, embedding=[0.1, 0.0]),    # dist 0.1 from 0
        Row(vec_id=2, embedding=[10.0, 10.0]),  # far from everything
    ]
    df = spark.createDataFrame(rows)
    pairs = {(r.id_a, r.id_b): r.euclid_dist for r in ann_brp_lsh_pairs(df, threshold=1.0, dim=2).collect()}
    assert (0, 1) in pairs and abs(pairs[(0, 1)] - 0.1) < 1e-9
    assert all(2 not in p for p in pairs)


def test_centroids_arrow_matches_exploded_mean(spark):
    """The applyInArrow grouped-map lane must agree with the
    explode+aggregate operator to float tolerance (summation order
    differs between numpy and Spark's avg)."""
    import math

    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.similarity import (
        compute_centroids,
        compute_centroids_arrow,
    )

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    a = {r.centroid_id: r.centroid for r in compute_centroids(emb, dim=dim).collect()}
    b = {r.centroid_id: r.centroid for r in compute_centroids_arrow(emb).collect()}
    assert set(a) == set(b) and len(a) > 1
    for cid in a:
        assert all(
            math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
            for x, y in zip(a[cid], b[cid])
        ), cid


def test_incremental_dedup_never_pairs_corpus_with_itself(spark):
    """The incremental tier's whole point: corpus-internal near-dups
    (docs 1,2 below) must NOT appear as a pair — only batch-vs-corpus
    and batch-internal pairs do, correctly typed."""
    from ffi_etl_spark.operators.dedup import dedup_minhash_incremental

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    corpus = spark.createDataFrame(
        [(1, base), (2, base + "!"), (5, "совершенно другой текст без общих шинглов")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, base + "?"), (11, base + "? "), (12, "unrelated new content entirely")],
        "doc_id long, text string",
    )
    rows = dedup_minhash_incremental(corpus, batch, threshold=0.5).collect()
    pairs = {(r.id_a, r.id_b): r.pair_type for r in rows}
    assert (1, 2) not in pairs  # corpus-internal near-dup excluded
    assert pairs.get((10, 11)) == "new_new"
    assert any(
        t == "new_old" and {a, b} & {10, 11} and {a, b} & {1, 2}
        for (a, b), t in pairs.items()
    )
    assert all({a, b} != {1, 2} for a, b in pairs)


def test_connected_components_chain_and_clique(spark):
    """A 5-vertex chain (diameter forces several propagation rounds),
    a disjoint triangle, and an isolated pair must each collapse to
    their min-id component."""
    from ffi_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain 1-2-3-4-5
         (10, 11), (11, 12), (10, 12),        # triangle
         (20, 21)],                            # pair
        "id_a long, id_b long",
    )
    got = {(r.vertex, r.component) for r in connected_components(edges).collect()}
    want = {(v, 1) for v in (1, 2, 3, 4, 5)} | {(v, 10) for v in (10, 11, 12)} | {
        (20, 20), (21, 20)}
    assert got == want


def test_connected_components_raises_on_non_convergence(spark):
    """ADVICE r02: exhausting max_iter before the star fixpoint must
    fail loudly (the final star-join would silently emit wrong labels),
    and stats must record convergence state."""
    import pytest

    from ffi_etl_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_a long, id_b long"
    )
    stats: dict = {}
    with pytest.raises(RuntimeError, match="star fixpoint"):
        connected_components(edges, max_iter=1, stats=stats)
    assert stats["converged"] is False

    stats = {}
    got = {
        (r.vertex, r.component)
        for r in connected_components(edges, stats=stats).collect()
    }
    assert stats["converged"] is True
    assert got == {(v, 1) for v in range(1, 41)}

    # boundary: stats["rounds"] includes the confirmation round, so a
    # budget of rounds-1 produces the fixpoint on its LAST iteration
    # with no spare round to re-confirm — the structural star check
    # must accept it (pre-fix this raised despite a correct answer)
    k = stats["rounds"] - 1
    assert k >= 2
    stats2: dict = {}
    got2 = {
        (r.vertex, r.component)
        for r in connected_components(edges, max_iter=k, stats=stats2).collect()
    }
    assert stats2["converged"] is True and got2 == got


def test_lsh_tuning_tracks_threshold():
    """Higher verify thresholds must push the tuner toward more rows
    per band (sharper S-curve), and the canonical threshold~ (1/b)^(1/r)
    rule must roughly hold for the chosen split."""
    from ffi_etl_spark.functions.lsh_tuning import candidate_probability, tune_bands

    b_lo, r_lo = tune_bands(24, 0.3)
    b_hi, r_hi = tune_bands(24, 0.9)
    assert r_hi > r_lo and b_lo > b_hi
    # the S-curve midpoint of the chosen split sits near the threshold
    for thr in (0.3, 0.5, 0.7, 0.9):
        b, r = tune_bands(24, thr)
        midpoint = (1 / b) ** (1 / r)
        assert abs(midpoint - thr) < 0.25
    # penalizing false positives never increases the candidate rate
    b1, r1 = tune_bands(12, 0.5)
    b2, r2 = tune_bands(12, 0.5, fp_weight=4.0)
    assert candidate_probability(0.3, b2, r2) <= candidate_probability(0.3, b1, r1)


def test_ivf_nprobe_improves_recall(spark, sf_dir):
    from ffi_etl_spark.operators.similarity import ann_ivf_topk, knn_bruteforce

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    truth = {
        (r.query_id, r.neighbor_id) for r in knn_bruteforce(emb, queries).collect()
    }

    def recall(nprobe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann_ivf_topk(emb, queries, dim=64, nprobe=nprobe).collect()
        }
        return len(got & truth) / len(truth)

    r1, r2 = recall(1), recall(2)
    assert 0 < r1 <= r2  # probing more cells can only add candidates


def test_incremental_dedup_equals_filtered_full(spark):
    """Differential on the real corpus: the incremental tier's pair set
    must equal the FULL minhash pair set filtered to pairs with at
    least one batch-side doc (band collision is pairwise, so skipping
    corpus×corpus candidates loses nothing else)."""
    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.dedup import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )
    from pyspark.sql import functions as F

    d = table(spark, "/root/testdata/sf0.001", "documents")
    full = {
        (r.id_a, r.id_b): r.jaccard_sim for r in dedup_minhash_lsh(d).collect()
    }
    expected = {
        p: j for p, j in full.items() if p[0] % 10 == 0 or p[1] % 10 == 0
    }
    inc = {
        (r.id_a, r.id_b): (r.jaccard_sim, r.pair_type)
        for r in dedup_minhash_incremental(
            d.filter(F.col("doc_id") % 10 != 0),
            d.filter(F.col("doc_id") % 10 == 0),
            # pin the split to the full-tier's default: this test is
            # about the ≥1-batch-side FILTER property, which only holds
            # pairwise when both runs band identically (the round-8
            # adaptive default would pick (24, 4) on this corpus while
            # dedup_minhash_lsh above runs its fixed (12, 3))
            num_perm=12,
            bands=3,
        ).collect()
    }
    assert {p: v[0] for p, v in inc.items()} == expected
    for (a, b), (_, t) in inc.items():
        want = "new_new" if (a % 10 == 0 and b % 10 == 0) else "new_old"
        assert t == want, (a, b, t)


def test_choose_minhash_split_branches():
    """The adaptive banding chooser (round 6, BASELINE.md §scaling):
    high ambient similarity widens the signature and sharpens the
    bands; low ambient keeps the cheap default; an unreachable recall
    floor falls back to the default instead of returning nothing."""
    from ffi_etl_spark.functions.lsh_tuning import (
        candidate_probability,
        choose_minhash_split,
    )

    # the measured testdata regime (ambient ~0.35) -> (24, 4, 6)
    assert choose_minhash_split(0.35, 0.5) == (24, 4, 6)
    # a real-corpus regime (ambient ~0) -> the default (12, 3, 4)
    assert choose_minhash_split(0.02, 0.5) == (12, 3, 4)
    # no split of a 4-slot signature reaches 0.99 recall at dup_sim=0.5
    # (best is b=4/r=1 at 0.9375) -> fall back to that width's default
    from ffi_etl_spark.functions.lsh_tuning import tune_bands

    b0, r0 = tune_bands(4, 0.5, fp_weight=5)
    assert choose_minhash_split(
        0.35, 0.5, dup_sim=0.5, recall_floor=0.99, num_perms=(4,)
    ) == (4, b0, r0)
    # ADVICE r06 (medium): a stricter-than-default recall floor must
    # bypass the low-ambient fast path — (12, 3, 4) has recall ~0.959
    # at dup_sim=0.9, so recall_floor=0.99 cannot return it even when
    # ambient ~0 keeps it under the collision budget
    n99, b99, r99 = choose_minhash_split(0.0, 0.5, recall_floor=0.99)
    assert (n99, b99, r99) != (12, 3, 4)
    assert candidate_probability(0.9, b99, r99) >= 0.99
    # the chosen high-ambient split honors the recall floor at dup_sim
    np_, b, r = choose_minhash_split(0.35, 0.5)
    assert candidate_probability(0.9, b, r) >= 0.95
    # and strictly beats the default on ambient collision probability
    assert candidate_probability(0.35, b, r) < candidate_probability(0.35, 3, 4)


def test_ambient_probe_high_vs_low(spark, sf_dir):
    """estimate_ambient_jaccard separates the 31-word-vocab driver
    corpus (ambient ~0.35) from a disjoint-vocabulary corpus
    (ambient ~0), and is deterministic across calls."""
    from ffi_etl_spark.operators.dedup import estimate_ambient_jaccard

    docs = table(spark, sf_dir, "documents")
    amb = estimate_ambient_jaccard(docs)
    assert 0.15 < amb < 0.6
    assert estimate_ambient_jaccard(docs) == amb  # seedless-hash determinism

    disjoint = spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(str(i * 7919 + j * 104729) for j in range(12)))
            for i in range(120)
        ]
    )
    assert estimate_ambient_jaccard(disjoint) < 0.1


def test_dedup_minhash_adaptive_matches_default_on_true_dups(spark, sf_dir):
    """The adaptive tier must keep the default tier's found set at the
    true-duplicate similarity (recall floor 0.95 at dup_sim=0.9) while
    honoring the verify-threshold contract on every emitted pair."""
    from ffi_etl_spark.operators.dedup import dedup_minhash_adaptive

    docs = table(spark, sf_dir, "documents")
    default_hi = {
        (r.id_a, r.id_b)
        for r in dedup_minhash_lsh(docs, fast=True).filter(
            F.col("jaccard_sim") >= 0.9
        ).collect()
    }
    adaptive = dedup_minhash_adaptive(docs).collect()
    assert all(r.jaccard_sim >= 0.5 for r in adaptive)
    adaptive_hi = {(r.id_a, r.id_b) for r in adaptive if r.jaccard_sim >= 0.9}
    # identical true-dup found set on this corpus (the sf1 measurement
    # saw the wider signature recover MORE, never fewer)
    assert adaptive_hi >= default_hi
