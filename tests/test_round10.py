"""Round-10 locks: the stored-IVF recall dial and its limit behavior.

VERDICT r09 item 6: ``ann_ivf_query_stored``'s nprobe knob needed a
measured recall curve (tools/bench_ivf_recall.py records it at sf1 in
BASELINE.md) and a monotonicity lock — more probed cells can only add
candidates, never remove them, so recall@k must be non-decreasing in
nprobe, and at nprobe == cells the candidate set is the whole corpus,
making the probe bit-identical to ``knn_bruteforce``.
"""

import pytest
from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table


@pytest.fixture(scope="module")
def stored_index(spark, sf_dir, tmp_path_factory):
    from ffi_etl_spark.operators.similarity import (
        ivf_index_tables,
        write_ivf_assignments,
    )

    tmp = tmp_path_factory.mktemp("ivf_recall")
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    centroids, assignments = ivf_index_tables(emb, n_iter=2, quantize_bits=20)
    centroids.write.parquet(str(tmp / "c"))
    write_ivf_assignments(assignments, str(tmp / "a"))
    return (
        spark.read.parquet(str(tmp / "c")),
        spark.read.parquet(str(tmp / "a")),
        emb,
    )


def _recall(spark, ann, exact):
    hits = ann.select("query_id", "neighbor_id").join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "inner",
    ).count()
    return hits / exact.count()


def test_ivf_recall_monotone_in_nprobe_and_exact_at_full_probe(
    spark, sf_dir, stored_index
):
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        knn_bruteforce,
    )

    model, index, emb = stored_index
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    exact = knn_bruteforce(emb, queries, k=10).localCheckpoint(eager=True)
    cells = model.count()

    recalls = []
    for nprobe in (1, 2, 4, cells):
        ann = ann_ivf_query_stored(model, index, queries, k=10, nprobe=nprobe)
        recalls.append(_recall(spark, ann, exact))
    # more probed cells can only ADD candidates: non-decreasing
    assert recalls == sorted(recalls), recalls
    assert recalls[0] > 0
    # nprobe == cells probes every cell: the candidate set is the full
    # corpus and the probe IS brute force — bit-identical, not just
    # recall 1.0
    assert recalls[-1] == 1.0
    full = ann_ivf_query_stored(model, index, queries, k=10, nprobe=cells)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    a = sorted(full.collect(), key=key)
    b = sorted(exact.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
