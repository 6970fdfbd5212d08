"""Round-10 locks: the stored-IVF recall dial and its limit behavior.

VERDICT r09 item 6: ``ann_ivf_query_stored``'s nprobe knob needed a
measured recall curve (tools/bench_ivf_recall.py records it at sf1 in
BASELINE.md) and a monotonicity lock — more probed cells can only add
candidates, never remove them, so recall@k must be non-decreasing in
nprobe, and at nprobe == cells the candidate set is the whole corpus,
making the probe bit-identical to ``knn_bruteforce``.
"""

import json

import pytest
from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table


def _land_vecs(in_dir, name, rows):
    in_dir.mkdir(parents=True, exist_ok=True)
    with open(in_dir / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain_vecs(spark, in_dir, checkpoint, index_root, **kwargs):
    from ffi_etl_spark.streaming.ann_ingest import stream_ann_ingest

    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).json(str(in_dir))
    q = (
        stream_ann_ingest(stream, str(index_root), str(checkpoint), **kwargs)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


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


def test_stream_ann_ingest_bootstrap_append_replay(spark, sf_dir, tmp_path):
    """The streaming IVF maintenance sink (streaming/ann_ingest.py):
    bootstrap trains on the FIRST batch and every later batch adopts
    the stored model, so the grown index answers bit-identically to a
    one-pass assignment of all landed vectors under the bootstrap
    model (assignment is a pure function of (vector, model)); a
    replayed backlog appends nothing (stored-id anti-join); per-cell
    file counts stay bounded by the layout-aware writes + compaction;
    and a half-written index fails the batch with the remedy."""
    import shutil

    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        assign_to_centroid,
        check_ivf_layout,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    rows = [
        {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
        for r in emb.collect()
    ]
    b1 = [r for r in rows if r["vec_id"] < 150]
    b2 = [r for r in rows if 150 <= r["vec_id"] < 220]
    b3 = [r for r in rows if r["vec_id"] >= 220]

    in_dir, root = tmp_path / "in", tmp_path / "index"
    # three drains = three micro-batches (each drain sees only new files
    # thanks to the shared checkpoint)
    _land_vecs(in_dir, "b1.json", b1)
    _drain_vecs(spark, in_dir, tmp_path / "ckpt", root, quantize_bits=20)
    _land_vecs(in_dir, "b2.json", b2)
    _drain_vecs(spark, in_dir, tmp_path / "ckpt", root, quantize_bits=20)
    _land_vecs(in_dir, "b3.json", b3)
    _drain_vecs(spark, in_dir, tmp_path / "ckpt", root, quantize_bits=20,
                compact_files_per_cell=2)

    model = spark.read.parquet(str(root / "centroids"))
    stored = spark.read.parquet(str(root / "assignments"))
    assert stored.count() == 300
    check_ivf_layout(model, stored)  # appended rows carry the model id

    # parity: grown index == one-pass assignment under the SAME model
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    onepass = assign_to_centroid(
        emb, model.select("centroid_id", "centroid")
    ).withColumn("_cells", F.lit(model.count()))
    grown = ann_ivf_query_stored(model, stored, queries)
    direct = ann_ivf_query_stored(model, onepass, queries, trust_layout=True)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    g = sorted(grown.collect(), key=key)
    d = sorted(direct.collect(), key=key)
    assert [tuple(r) for r in g] == [tuple(r) for r in d]
    assert len(g) > 0

    # replay the whole backlog with a FRESH checkpoint: every id is
    # already indexed, nothing appends
    _drain_vecs(spark, in_dir, tmp_path / "ckpt2", root, quantize_bits=20)
    assert spark.read.parquet(str(root / "assignments")).count() == 300

    # half-written index refuses with the remedy
    shutil.rmtree(str(root / "assignments"))
    _land_vecs(in_dir, "b4.json", [{"vec_id": 9999,
                                    "embedding": rows[0]["embedding"]}])
    with pytest.raises(Exception, match="half-written IVF index"):
        _drain_vecs(spark, in_dir, tmp_path / "ckpt3", root, quantize_bits=20)


def test_ivf_model_id_partitioning_invariant(spark, sf_dir):
    """The model identity stamp must be a pure function of the model's
    CONTENT: in the quantized (exact-integer) tier the whole training
    pipeline is bit-deterministic, so two builds over differently-
    partitioned inputs must produce the SAME _model_id (a layout-
    dependent stamp would make check_ivf_layout false-refuse a valid
    pair after any repartition); and a genuinely different model
    (different slice) must produce a DIFFERENT one."""
    from ffi_etl_spark.operators.similarity import ivf_index_tables

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)

    def model_id(src, **kw):
        cents, _ = ivf_index_tables(src, n_iter=2, quantize_bits=20, **kw)
        return cents.select("_model_id").first()[0]

    a = model_id(emb)
    b = model_id(emb.repartition(7))
    assert a == b
    c = model_id(emb.filter(F.col("vec_id") < 250))
    assert c != a
