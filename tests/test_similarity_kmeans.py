"""Numpy step-by-step differential for the iterative spherical k-means
(operators/similarity.py::kmeans_lloyd) — the correctness gate standing
in for a DuckDB oracle, which cannot express the round-over-round
recursion."""

from __future__ import annotations

import numpy as np
import pytest

from ffi_etl_spark.operators.similarity import kmeans_cluster_profile, kmeans_lloyd


def _np_kmeans(vecs: np.ndarray, k: int, n_iter: int) -> np.ndarray:
    """Replica of kmeans_lloyd's exact contract: random-partition init
    (id % k), un-normalized mean update, cosine argmax assign with ties
    to the lowest centroid id (np.argmax keeps the first max)."""
    labels = np.arange(len(vecs)) % k
    for _ in range(n_iter):
        cents = np.stack([vecs[labels == c].mean(axis=0) for c in sorted(set(labels))])
        cids = np.array(sorted(set(labels)))
        sims = (vecs @ cents.T) / (
            np.linalg.norm(vecs, axis=1)[:, None] * np.linalg.norm(cents, axis=1)[None, :]
        )
        labels = cids[np.argmax(sims, axis=1)]
    return labels


@pytest.fixture()
def clustered_v25(spark):
    """25 vectors in 5 well-separated direction cones (no cosine ties,
    gaps ≫ float-summation noise), ids deliberately NOT aligned with
    the true clusters so the init is wrong and Lloyd must move."""
    rng = np.random.default_rng(7)
    base = np.eye(5)
    rows = []
    for i in range(25):
        true = i // 5
        v = base[true] * 3.0 + rng.normal(0, 0.15, 5)
        rows.append((i, [float(x) for x in v]))
    return rows


def test_kmeans_matches_numpy(spark, clustered_v25):
    df = spark.createDataFrame(clustered_v25, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in kmeans_lloyd(df, k=5, n_iter=3).collect()
    }
    vecs = np.array([v for _, v in clustered_v25])
    want = _np_kmeans(vecs, k=5, n_iter=3)
    assert got == {i: int(want[i]) for i in range(25)}
    # each planted cone ends up pure (never split across clusters);
    # full 5-cluster recovery is NOT asserted — random-partition init
    # can legitimately collapse clusters, and numpy above collapses
    # identically, which is exactly what the differential proves
    planted = {}
    for i, c in got.items():
        planted.setdefault(i // 5, set()).add(c)
    assert all(len(s) == 1 for s in planted.values())
    assert len({next(iter(s)) for s in planted.values()}) >= 2


def test_kmeans_profile_counts(spark, clustered_v25):
    df = spark.createDataFrame(clustered_v25, "vec_id long, embedding array<double>")
    prof = kmeans_cluster_profile(kmeans_lloyd(df, k=5, n_iter=3)).collect()
    assert sum(r["n_members"] for r in prof) == 25
    assert all(r["n_members"] > 0 for r in prof)
    assert all(r["first_member"] >= 0 for r in prof)
