"""Round-12 locks (VERDICT r11 items 1-4 + ADVICE r11).

1. The int8-coded stored IVF tier (``ivf_index_tables(store_codes=
   True)`` + ``ann_ivf_query_stored_int8``): code-space shortlist +
   exact float re-rank — recall vs the float tier, bit-parity when
   the shortlist covers the probed cells, codebook identity refusals,
   codes propagation through the append path, and the PLAN contract
   (the probe scan reads the codes column only; the re-rank's float
   read is DPP-pruned).
2. The pairs audit is replay-idempotent (partitioned by batch_id,
   per-batch dynamic partition overwrite).
3. The re-split trigger's honesty guards: small/replayed batches are
   skipped (not scored), an undrifted corpus blocks the swap via the
   cross-pair confirm, and a torn re-split swap recovers at batch
   start.
4. ADVICE r11 lows: QuantizerDriftError is a dedicated type;
   ``ann_ivf_autok`` validates probe_frac before paying for training.
"""

import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table


def _build_int8(spark, sf_dir, tmp_path, n=500, store_codes=True):
    from ffi_etl_spark.operators.similarity import (
        ivf_index_tables,
        write_ivf_assignments,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < n)
    centroids, assignments = ivf_index_tables(
        emb, n_iter=2, quantize_bits=20, store_codes=store_codes
    )
    root = str(tmp_path / f"idx_{store_codes}")
    centroids.write.parquet(os.path.join(root, "centroids"))
    write_ivf_assignments(assignments, os.path.join(root, "assignments"))
    return (
        emb,
        spark.read.parquet(os.path.join(root, "centroids")),
        spark.read.parquet(os.path.join(root, "assignments")),
        root,
    )


# ---------------------------------------------------------------------------
# int8 stored tier: answers
# ---------------------------------------------------------------------------


def test_int8_rerank_full_shortlist_is_float_tier_bit_parity(
    spark, sf_dir, tmp_path
):
    """With a shortlist large enough to cover every probed-cell
    candidate, the re-ranked int8 answer must be BIT-IDENTICAL to the
    float stored tier at the same probe set — quantization may only
    ever cost shortlist membership, never change the exact re-rank's
    scores or ties."""
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        ann_ivf_query_stored_int8,
    )

    emb, sc, sa, _ = _build_int8(spark, sf_dir, tmp_path)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_sim)
        for r in ann_ivf_query_stored_int8(
            sc, sa, queries, probe_frac=0.1, rerank_factor=100
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_sim)
        for r in ann_ivf_query_stored(
            sc, sa, queries, probe_frac=0.1
        ).collect()
    }
    assert got == want and len(got) == 200


def test_int8_rerank_recall_vs_float_tier(spark, sf_dir, tmp_path):
    """At the production rerank_factor=4 the int8 tier must recover
    ≥0.9 of the float tier's top-10 within the same probed cells (the
    knn_int8 recall bar is 0.7 WITHOUT re-rank; measured here: 1.0 at
    gate scale)."""
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        ann_ivf_query_stored_int8,
    )

    emb, sc, sa, _ = _build_int8(spark, sf_dir, tmp_path)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_query_stored_int8(
            sc, sa, queries, probe_frac=0.1, rerank_factor=4
        ).collect()
    }
    want = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_query_stored(
            sc, sa, queries, probe_frac=0.1
        ).collect()
    }
    assert len(want) == 200
    assert len(got & want) / len(want) >= 0.9


def test_int8_code_space_tier_shape_and_determinism(spark, sf_dir, tmp_path):
    """rerank_factor=None returns the raw code-space ranking —
    (query_id, neighbor_id, code_d2, rank), integer distances, and the
    same rows on repeated runs (bit-deterministic kernel)."""
    from ffi_etl_spark.operators.similarity import ann_ivf_query_stored_int8

    emb, sc, sa, _ = _build_int8(spark, sf_dir, tmp_path)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    out = ann_ivf_query_stored_int8(
        sc, sa, queries, probe_frac=0.1, rerank_factor=None
    )
    assert out.columns == ["query_id", "neighbor_id", "code_d2", "rank"]
    rows1 = sorted(map(tuple, out.collect()))
    rows2 = sorted(
        map(
            tuple,
            ann_ivf_query_stored_int8(
                sc, sa, queries, probe_frac=0.1, rerank_factor=None
            ).collect(),
        )
    )
    assert rows1 == rows2 and len(rows1) == 200
    assert all(isinstance(r[2], int) and r[2] >= 0 for r in rows1)


# ---------------------------------------------------------------------------
# int8 stored tier: the plan contract
# ---------------------------------------------------------------------------


def test_int8_probe_plan_reads_codes_only_and_prunes(spark, sf_dir, tmp_path):
    """The probe scan must read (id, _codes, centroid_id) — never the
    float column — and carry the dynamic-pruning partition filter; the
    re-rank's float scan must also be DPP-pruned. This is the whole
    point of storing codes as a COLUMN of the assignments table."""
    from ffi_etl_spark.operators.similarity import ann_ivf_query_stored_int8

    emb, sc, sa, _ = _build_int8(spark, sf_dir, tmp_path)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    plan = (
        ann_ivf_query_stored_int8(
            sc, sa, queries, probe_frac=0.1, rerank_factor=4
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # classify the assignments-table scans by their output columns
    # (the Location field is length-truncated in plan strings, so path
    # matching is unreliable): only the assignments table carries
    # centroid_id as a PARTITION column alongside data columns
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "centroid_id#" in ln
    ]
    codes_scans = [ln for ln in scans if "_codes#" in ln]
    float_scans = [ln for ln in scans if "vec_norm#" in ln]
    assert codes_scans, "no codes-column scan of the assignments table"
    assert float_scans, "no float-column scan for the re-rank"
    for ln in codes_scans:
        assert "embedding#" not in ln  # the 4x read cut
        assert "dynamicpruning" in ln
    for ln in float_scans:
        assert "_codes#" not in ln  # re-rank never re-reads codes
        assert "dynamicpruning" in ln


# ---------------------------------------------------------------------------
# int8 stored tier: identity refusals + append propagation
# ---------------------------------------------------------------------------


def test_int8_layout_refuses_codeless_tables(spark, sf_dir, tmp_path):
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored_int8,
        check_ivf_codes_layout,
    )

    emb, sc, sa, _ = _build_int8(spark, sf_dir, tmp_path, store_codes=False)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    with pytest.raises(ValueError, match="store_codes"):
        check_ivf_codes_layout(sc, sa)
    with pytest.raises(ValueError, match="store_codes"):
        ann_ivf_query_stored_int8(sc, sa, queries).collect()


def test_int8_layout_refuses_codebook_mismatch(spark, sf_dir, tmp_path):
    """Codes paired with a codebook they were not produced under must
    REFUSE — a different per-dimension scale makes every code-space
    distance meaningless, silently. Forged by re-stamping the
    assignments' _codebook_id (the model ids still match, so only the
    codebook gate can catch it)."""
    from ffi_etl_spark.operators.similarity import check_ivf_codes_layout

    _, sc, sa, _ = _build_int8(spark, sf_dir, tmp_path)
    forged = sa.withColumn(
        "_codebook_id", F.col("_codebook_id") + F.lit(1)
    )
    with pytest.raises(ValueError, match="codebook_id"):
        check_ivf_codes_layout(sc, forged)


def test_int8_append_carries_codes_and_parity(spark, sf_dir, tmp_path):
    """Appending to a coded table must code the batch under the STORED
    codebook (same _codebook_id on every row) — and the grown index's
    full-shortlist answer must stay bit-identical to the float tier
    over the same grown table (assignment AND coding are pure
    functions of (vector, stored model, stored codebook))."""
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        ann_ivf_query_stored_int8,
        append_ivf_assignments,
        check_ivf_codes_layout,
        ivf_index_append,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    _, sc, sa, root = _build_int8(spark, sf_dir, tmp_path, n=300)
    batch = emb.filter(F.col("vec_id") >= 300)
    new_rows = ivf_index_append(sc, sa, batch)
    assert "_codes" in new_rows.columns
    append_ivf_assignments(new_rows, os.path.join(root, "assignments"))
    grown = spark.read.parquet(os.path.join(root, "assignments"))
    cells, _, _, book_id = check_ivf_codes_layout(sc, grown)
    assert grown.count() == 400
    assert grown.select("_codebook_id").distinct().count() == 1
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_sim)
        for r in ann_ivf_query_stored_int8(
            sc, grown, queries, nprobe=2, rerank_factor=100
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_sim)
        for r in ann_ivf_query_stored(sc, grown, queries, nprobe=2).collect()
    }
    assert got == want and len(got) == 100


def test_int8_append_refuses_codes_without_codebook(spark, sf_dir, tmp_path):
    from ffi_etl_spark.operators.similarity import ivf_index_append

    emb, sc, sa, _ = _build_int8(spark, sf_dir, tmp_path, n=300)
    batch = table(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 340)
    )
    stripped = sc.drop("_code_mn", "_code_mx", "_codebook_id")
    with pytest.raises(ValueError, match="codebook"):
        ivf_index_append(stripped, sa, batch)


# ---------------------------------------------------------------------------
# ADVICE r11 lows
# ---------------------------------------------------------------------------


def test_quantizer_drift_error_is_dedicated_type(spark, sf_dir, tmp_path):
    """The drift refusal must be dispatchable on CLASS (ADVICE r11):
    rewording the message must never flip a rebuild sink back to
    fail-the-stream."""
    from ffi_etl_spark.operators.similarity import (
        QuantizerDriftError,
        ivf_index_append,
    )

    assert issubclass(QuantizerDriftError, ValueError)
    emb, sc, sa, _ = _build_int8(spark, sf_dir, tmp_path, n=300)
    # planted drift: negate and scale the batch so it scores far from
    # every stored centroid
    batch = (
        table(spark, sf_dir, "embeddings")
        .filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 340))
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: -9.0 * x + F.lit(7.0)),
        )
    )
    with pytest.raises(QuantizerDriftError, match="quantizer drift"):
        ivf_index_append(sc, sa, batch, max_below_floor_share=0.0).collect()


def test_autok_probe_frac_validates_before_training(spark, sf_dir):
    """An out-of-range probe_frac must refuse BEFORE the quantizer
    training cost is paid (hoisted check — ADVICE r11): with an
    unresolvable corpus plan the ValueError still fires, proving no
    Spark job ran first."""
    from ffi_etl_spark.operators.similarity import ann_ivf_autok

    emb = table(spark, sf_dir, "embeddings").limit(50)
    # a frame whose evaluation would RAISE: if validation ran after
    # training, this call would die in the division job, not the check
    poisoned = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x / F.lit(0.0))
    )
    with pytest.raises(ValueError, match="probe_frac"):
        ann_ivf_autok(poisoned, poisoned, probe_frac=1.5)


# ---------------------------------------------------------------------------
# streaming: pairs audit exactly-once
# ---------------------------------------------------------------------------


def _land(in_dir, name, rows):
    in_dir.mkdir(parents=True, exist_ok=True)
    with open(in_dir / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain_docs(spark, in_dir, checkpoint, **paths):
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("doc_id long, text string")
        .json(str(in_dir))
    )
    q = (
        stream_dedup_ingest(stream, checkpoint=checkpoint, **paths)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_pairs_audit_replay_is_byte_identical(spark, tmp_path):
    """VERDICT r11 item 2: the pairs audit must be replay-idempotent
    WITHIN a checkpoint lineage. Two at-least-once windows are forged:

    * torn previous attempt — a leftover batch-1 partition (planted
      before batch 1 runs) must be OVERWRITTEN by the batch's true
      rows, not appended beside them (the pre-round-12 duplication);
    * fully-landed batch re-run — deleting the checkpoint's last
      commit marker re-delivers batch 1 with the SAME batch id; it
      anti-joins to empty, never reaches the write, and the audit is
      byte-identical after the re-run.
    """
    import hashlib

    base = "the quick brown fox jumps over the lazy dog again and again " * 8
    extra = "completely different content about astronomy and orbits " * 8
    in_dir = tmp_path / "in"
    ck = str(tmp_path / "ck1")
    paths = {
        "corpus_path": str(tmp_path / "corpus"),
        "pairs_path": str(tmp_path / "pairs"),
    }
    _land(in_dir, "b1.json", [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": extra},
        {"doc_id": 3, "text": base + "tiny suffix"},  # dies vs 1: batch-0 pairs
    ])
    _drain_docs(spark, in_dir, ck, **paths)
    pairs0 = sorted(
        map(tuple, spark.read.parquet(paths["pairs_path"]).collect())
    )
    assert pairs0, "expected audit rows from the planted near-dup"
    # the audit is partitioned per (checkpoint lineage, batch) — the
    # overwrite unit; batch ids restart under a fresh checkpoint, so
    # the app level keeps incarnations from clobbering each other
    app = hashlib.md5(ck.encode()).hexdigest()[:16]
    app_dir = os.path.join(paths["pairs_path"], f"_ingest_app={app}")
    assert os.path.isdir(os.path.join(app_dir, "batch_id=0"))

    # REAL crash window: batch 1's pairs write lands, then the corpus
    # append dies before the checkpoint commits — the exact torn state
    # an at-least-once re-delivery follows. (Forged by colliding the
    # committer's _temporary dir with a plain file; chmod is useless
    # under root.)
    time.sleep(1.1)
    _land(in_dir, "b2.json", [
        {"doc_id": 4, "text": extra + "another suffix"},   # dies vs 2
        {"doc_id": 5, "text": "fresh topic on deep sea vents " * 10},
    ])
    blocker = os.path.join(paths["corpus_path"], "_temporary")
    with open(blocker, "w") as f:
        f.write("x")
    try:
        with pytest.raises(Exception):
            _drain_docs(spark, in_dir, ck, **paths)
    finally:
        os.remove(blocker)
    torn = sorted(
        map(tuple, spark.read.parquet(paths["pairs_path"]).collect())
    )
    assert os.path.isdir(os.path.join(app_dir, "batch_id=1"))  # pairs landed
    assert {
        r.doc_id for r in spark.read.parquet(paths["corpus_path"]).collect()
    } == {1, 2}  # corpus append did NOT land

    # re-delivery of batch 1 under the SAME checkpoint (its commit was
    # never written): the reprocess overwrites its own partition — the
    # audit is byte-identical to the torn attempt, never doubled
    _drain_docs(spark, in_dir, ck, **paths)
    pairs1 = sorted(
        map(tuple, spark.read.parquet(paths["pairs_path"]).collect())
    )
    assert pairs1 == torn
    assert len(pairs1) == len(pairs0) + 1
    new_rows = [r for r in pairs1 if r not in pairs0]
    assert {(r[0], r[1]) for r in new_rows} == {(2, 4)}
    assert {
        r.doc_id for r in spark.read.parquet(paths["corpus_path"]).collect()
    } == {1, 2, 5}


# ---------------------------------------------------------------------------
# streaming: re-split trigger honesty guards
# ---------------------------------------------------------------------------


def _soup(n, start=0):
    return [
        {
            "doc_id": start + i,
            "text": " ".join(
                f"w{((start + i) * 31 + j * 7919) % 104729}" for j in range(30)
            ),
        }
        for i in range(n)
    ]


def _testdata_docs(spark, sf_dir, lo, hi, id_base):
    docs = table(spark, sf_dir, "documents").limit(hi).collect()
    return [
        {"doc_id": id_base + r["doc_id"], "text": r["text"]}
        for r in docs[lo:hi]
    ]


def test_resplit_small_batches_are_skipped_not_scored(
    spark, sf_dir, tmp_path
):
    """ADVICE r11: a check batch below resplit_min_batch_docs must be
    SKIPPED — no miss counted — even with after_misses=1 and a batch
    whose distribution genuinely disagrees. (A replayed batch
    anti-joins to ~zero rows and would otherwise deterministically
    'pick' the ambient-0 default and re-materialize the state to a
    split derived from no documents.)"""
    from ffi_etl_spark.operators.dedup import check_signature_layout
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    in_dir = tmp_path / "in"
    _land(in_dir, "b1.json", _soup(120))
    time.sleep(1.1)
    # drifted but TINY: 20 testdata docs < the 64-doc floor
    _land(in_dir, "b2.json", _testdata_docs(spark, sf_dir, 0, 20, 1000000))
    sigs_path = str(tmp_path / "sigs")
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("doc_id long, text string")
        .json(str(in_dir))
    )
    q = (
        stream_dedup_ingest(
            stream,
            str(tmp_path / "corpus"),
            str(tmp_path / "pairs"),
            str(tmp_path / "ck"),
            sigs_path=sigs_path,
            resplit_check_batches=1,
            resplit_after_misses=1,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # the soup bootstrap pins (12, 3); the tiny drifted batch must NOT
    # have re-split the state
    check_signature_layout(spark.read.parquet(sigs_path), 12, 3)


def test_resplit_confirm_blocks_undrifted_corpus(spark, sf_dir, tmp_path):
    """VERDICT r11 item 4: drifting BATCHES over a corpus that has not
    drifted must not pay the re-materialize — the cross-pair confirm
    prices the (batch ⋈ corpus) pairs future verifies actually pay,
    and on a soup-dominated corpus those stay at the old ambient. Same
    trigger settings as the round-11 swap test, 400-doc soup corpus
    instead of 60."""
    from ffi_etl_spark.operators.dedup import check_signature_layout
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    in_dir = tmp_path / "in"
    _land(in_dir, "b1.json", _soup(400))
    time.sleep(1.1)
    _land(in_dir, "b2.json", _testdata_docs(spark, sf_dir, 0, 80, 1000000))
    time.sleep(1.1)
    _land(in_dir, "b3.json", _testdata_docs(spark, sf_dir, 80, 160, 2000000))
    sigs_path = str(tmp_path / "sigs")
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("doc_id long, text string")
        .json(str(in_dir))
    )
    q = (
        stream_dedup_ingest(
            stream,
            str(tmp_path / "corpus"),
            str(tmp_path / "pairs"),
            str(tmp_path / "ck"),
            sigs_path=sigs_path,
            resplit_check_batches=1,
            resplit_after_misses=2,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # both drifted batches registered misses, the streak fired — but
    # the corpus-side confirm must have refused the swap
    check_signature_layout(spark.read.parquet(sigs_path), 12, 3)


def test_resplit_recovers_torn_swap_at_batch_start(spark, tmp_path):
    """ADVICE r11: a crash mid re-split commit leaves sigs_path
    renamed aside; the NEXT batch (not the next re-split) must roll
    the swap forward before processing — otherwise the sink sees
    corpus-without-sigs and silently heals by recompute under a
    re-probed split while the swap dirs leak."""
    from ffi_etl_spark.operators.dedup import (
        check_signature_layout,
        minhash_signature_table,
    )
    from ffi_etl_spark.operators.stored_state import NEW_SUFFIX, OLD_SUFFIX
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    in_dir = tmp_path / "in"
    _land(in_dir, "b1.json", _soup(100))
    sigs_path = str(tmp_path / "sigs")
    corpus_path = str(tmp_path / "corpus")
    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("doc_id long, text string")
        .json(str(in_dir))
    )
    q = (
        stream_dedup_ingest(
            stream,
            corpus_path,
            str(tmp_path / "pairs"),
            str(tmp_path / "ck1"),
            sigs_path=sigs_path,
            resplit_check_batches=4,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    check_signature_layout(spark.read.parquet(sigs_path), 12, 3)

    # forge the torn state a crash between commit_swap's renames
    # leaves: live table shunted aside, fully-written new side dir
    # under a DIFFERENT split (24, 4)
    corpus = spark.read.parquet(corpus_path)
    minhash_signature_table(
        corpus, "text", "doc_id", num_perm=24, bands=4
    ).write.parquet(sigs_path + NEW_SUFFIX)
    os.rename(sigs_path, sigs_path + OLD_SUFFIX)

    time.sleep(1.1)
    _land(in_dir, "b2.json", _soup(100, start=5000))
    q2 = (
        stream_dedup_ingest(
            spark.readStream.schema("doc_id long, text string").json(
                str(in_dir)
            ),
            corpus_path,
            str(tmp_path / "pairs"),
            str(tmp_path / "ck2"),
            sigs_path=sigs_path,
            resplit_check_batches=4,
        )
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    # rolled FORWARD: the new-era (24, 4) table is live, later rows
    # adopted it, the markers are gone, and the state covers the corpus
    sigs = spark.read.parquet(sigs_path)
    check_signature_layout(sigs, 24, 4)
    assert not os.path.exists(sigs_path + NEW_SUFFIX)
    assert not os.path.exists(sigs_path + OLD_SUFFIX)
    assert sigs.count() == spark.read.parquet(corpus_path).count()


# ---------------------------------------------------------------------------
# cross-ambient probe invariants + int8 trust_layout
# ---------------------------------------------------------------------------


def test_cross_ambient_invariants(spark, sf_dir):
    """The cross-pair probe's two boundary invariants: a frame crossed
    with ITSELF pairs every sampled doc with itself (estimate 1.0 at
    any quantile — identical deterministic samples on both sides), and
    two disjoint-vocabulary frames estimate 0.0. Plus the statistic's
    point: a 50/50 mixed corpus against a drifted batch reads HIGH at
    p75 while the median still reads low — the upper-tail mass is what
    prices the verify bill."""
    from ffi_etl_spark.operators.dedup import estimate_cross_ambient_jaccard

    docs = table(spark, sf_dir, "documents").limit(200).select("doc_id", "text")
    soup = spark.createDataFrame(_soup(200), "doc_id long, text string")
    assert estimate_cross_ambient_jaccard(docs, docs, "text", "doc_id") == 1.0
    assert (
        estimate_cross_ambient_jaccard(soup, docs, "text", "doc_id") == 0.0
    )
    mixed = soup.limit(100).unionByName(
        docs.limit(100).withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    batch = docs.filter(F.col("doc_id") >= 100)
    p75 = estimate_cross_ambient_jaccard(mixed, batch, "text", "doc_id")
    p50 = estimate_cross_ambient_jaccard(
        mixed, batch, "text", "doc_id", quantile=0.5
    )
    assert p75 > 0.1  # the drifted half dominates the upper tail
    assert p75 >= p50


def test_int8_trust_layout_parity(spark, sf_dir, tmp_path):
    """trust_layout=True must skip the gate jobs yet return the gated
    path's exact rows (the 1-row footer probes still resolve cells and
    the codebook off the stored tables)."""
    from ffi_etl_spark.operators.similarity import ann_ivf_query_stored_int8

    emb, sc, sa, _ = _build_int8(spark, sf_dir, tmp_path)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    gated = sorted(
        map(
            tuple,
            ann_ivf_query_stored_int8(
                sc, sa, queries, probe_frac=0.1, rerank_factor=4
            ).collect(),
        )
    )
    trusted = sorted(
        map(
            tuple,
            ann_ivf_query_stored_int8(
                sc, sa, queries, probe_frac=0.1, rerank_factor=4,
                trust_layout=True,
            ).collect(),
        )
    )
    assert gated == trusted and len(gated) == 200


# ---------------------------------------------------------------------------
# streaming ANN sink: the coded layout survives the whole lifecycle
# ---------------------------------------------------------------------------


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
    q.awaitTermination(180)


def _vec_rows(spark, sf_dir, lo, hi):
    emb = table(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    )
    return [
        {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
        for r in emb.collect()
    ]


def test_stream_ann_store_codes_survives_lifecycle(spark, sf_dir, tmp_path):
    """store_codes=True through bootstrap → append → drift REBUILD:
    the coded layout must survive every stage (before round 12 the
    rebuild would silently swap in a codeless index and every later
    int8 query would refuse), the rebuild re-fits the codebook (new
    _codebook_id — the sanctioned re-fit point, same event that
    retrains the quantizer), and the grown coded index answers the
    int8 query with the float tier's rows at full shortlist."""
    from ffi_etl_spark.operators.similarity import (
        ann_ivf_query_stored,
        ann_ivf_query_stored_int8,
        check_ivf_codes_layout,
    )

    in_dir, root = tmp_path / "in", tmp_path / "index"
    kw = dict(quantize_bits=20, store_codes=True)

    # bootstrap coded
    _land_vecs(in_dir, "b1.json", _vec_rows(spark, sf_dir, 0, 150))
    _drain_vecs(spark, in_dir, tmp_path / "ck1", root, **kw)
    model = spark.read.parquet(str(root / "centroids"))
    stored = spark.read.parquet(str(root / "assignments"))
    _, _, _, book_before = check_ivf_codes_layout(model, stored)

    # append adopts the stored codebook (no rebuild)
    time.sleep(1.1)
    _land_vecs(in_dir, "b2.json", _vec_rows(spark, sf_dir, 150, 200))
    _drain_vecs(spark, in_dir, tmp_path / "ck2", root, **kw)
    stored = spark.read.parquet(str(root / "assignments"))
    _, _, _, book_mid = check_ivf_codes_layout(
        spark.read.parquet(str(root / "centroids")), stored
    )
    assert book_mid == book_before  # adopted, not re-fit
    assert stored.count() == 200

    # planted drift (sim_floor > 1 flags everything) -> rebuild must
    # RE-MATERIALIZE THE CODED LAYOUT
    time.sleep(1.1)
    _land_vecs(in_dir, "b3.json", _vec_rows(spark, sf_dir, 200, 260))
    _drain_vecs(
        spark, in_dir, tmp_path / "ck3", root,
        max_below_floor_share=0.5, sim_floor=1.0001,
        rebuild_on_drift=True, **kw,
    )
    model = spark.read.parquet(str(root / "centroids"))
    stored = spark.read.parquet(str(root / "assignments"))
    _, _, _, book_after = check_ivf_codes_layout(model, stored)
    assert book_after != book_mid  # the rebuild re-fit the codebook
    assert stored.count() == 260
    assert stored.select("_codebook_id").distinct().count() == 1

    # the grown coded index answers: int8 at full shortlist equals the
    # float tier bit for bit
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 260)
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    got = sorted(
        map(
            tuple,
            ann_ivf_query_stored_int8(
                model, stored, queries, nprobe=2, rerank_factor=100
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ann_ivf_query_stored(model, stored, queries, nprobe=2).collect(),
        )
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# product quantization (PQ): compression trade locks
# ---------------------------------------------------------------------------


def _pq_setup(spark, sf_dir):
    from ffi_etl_spark.operators.quantize import (
        pq_train_encode,
        quantize_codes_long,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    codes = quantize_codes_long(emb).localCheckpoint(eager=True)
    codebooks, encoded = pq_train_encode(codes)
    return emb, codes, codebooks, encoded


def test_pq_recall_ladder_vs_exact_code_knn(spark, sf_dir):
    """The compression trade, locked: ADC alone recovers a meaningful
    share of exact code-space kNN's top-10 (16× less candidate
    storage, 8× less per-pair compute), and the exact-code re-rank
    ladder is monotone in the shortlist factor (measured 0.24 → 0.37
    → 0.58 → 0.76 at factors ∅/2/4/8 on the gate slice)."""
    from ffi_etl_spark.operators.quantize import (
        knn_int8_codes,
        pq_adc_rerank_topk,
        pq_adc_topk,
    )

    emb, codes, codebooks, encoded = _pq_setup(spark, sf_dir)
    probes = list(range(0, 500, 25))
    exact = {
        (r.pid, r.vec_id) for r in knn_int8_codes(emb, probes, k=10).collect()
    }
    adc = {
        (r.pid, r.vec_id)
        for r in pq_adc_topk(codebooks, encoded, codes, probes, k=10).collect()
    }
    assert len(exact) == 200
    recalls = [len(exact & adc) / len(exact)]
    for rf in (2, 4, 8):
        rr = {
            (r.pid, r.vec_id)
            for r in pq_adc_rerank_topk(
                codebooks, encoded, codes, probes, k=10, rerank_factor=rf
            ).collect()
        }
        recalls.append(len(exact & rr) / len(exact))
    assert recalls[0] >= 0.15          # ADC alone
    assert recalls[2] >= 0.5           # factor 4
    assert recalls[3] >= 0.7           # factor 8
    assert recalls == sorted(recalls)  # the ladder is monotone


def test_pq_encoding_shape_and_determinism(spark, sf_dir):
    """Every vector gets exactly m subcentroid ids, all < k_sub; the
    packed form is m comma-joined ids; repeated training is
    bit-identical (exact-integer Lloyd)."""
    from ffi_etl_spark.operators.quantize import (
        pq_pack_codes,
        pq_train_encode,
    )

    _, codes, codebooks, encoded = _pq_setup(spark, sf_dir)
    assert encoded.groupBy("vec_id").count().filter("count != 8").count() == 0
    assert encoded.filter((F.col("_cid") < 0) | (F.col("_cid") >= 16)).count() == 0
    packed = pq_pack_codes(encoded)
    row = packed.orderBy("vec_id").first()
    assert len(row["pq_csv"].split(",")) == 8
    cb2, enc2 = pq_train_encode(codes)
    assert sorted(map(tuple, codebooks.collect())) == sorted(
        map(tuple, cb2.collect())
    )
    assert sorted(map(tuple, encoded.collect())) == sorted(
        map(tuple, enc2.collect())
    )


def test_pq_rejects_indivisible_dim(spark, sf_dir):
    from ffi_etl_spark.operators.quantize import (
        pq_train_encode,
        quantize_codes_long,
    )

    emb = table(spark, sf_dir, "embeddings").limit(50)
    codes = quantize_codes_long(emb)
    with pytest.raises(ValueError, match="divisible"):
        pq_train_encode(codes, dim=64, m=7)


def test_ivfpq_cell_restriction_and_determinism(spark, sf_dir):
    """The composed tier's structural contract: every returned
    neighbor shares one of its probe's nprobe probed cells (the IVF
    half bounds the candidate set), repeated runs are bit-identical
    (both Lloyd chains are exact-integer/exact-quantized), and at
    probe_frac=1.0 with a full-corpus shortlist the answer equals
    exact code-space kNN (no cell ever prunes, the re-rank covers
    everything — the composition degrades to the exact baseline)."""
    from ffi_etl_spark.operators.quantize import (
        ann_ivfpq_topk,
        knn_int8_codes,
        pq_train_encode,
        quantize_codes_long,
    )
    from ffi_etl_spark.operators.similarity import (
        assign_top_centroids,
        ivf_index_tables,
    )

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    centroids, assignments = ivf_index_tables(emb, n_iter=2, quantize_bits=20)
    assignments = assignments.localCheckpoint(eager=True)
    codes = quantize_codes_long(emb).localCheckpoint(eager=True)
    codebooks, encoded = pq_train_encode(codes)
    probes = list(range(0, 400, 50))

    out = ann_ivfpq_topk(
        centroids, assignments, codebooks, encoded, codes, probes,
        k=10, probe_frac=0.1, rerank_factor=4,
    ).localCheckpoint(eager=True)
    rows = sorted(map(tuple, out.collect()))
    rows2 = sorted(
        map(
            tuple,
            ann_ivfpq_topk(
                centroids, assignments, codebooks, encoded, codes, probes,
                k=10, probe_frac=0.1, rerank_factor=4,
            ).collect(),
        )
    )
    assert rows == rows2 and len(rows) == 80

    # structural contract: neighbor's cell ∈ probe's probed cells
    nprobe = max(1, -(-int(centroids.select("_cells").first()[0]) // 10))
    qa = {
        (r["vec_id"], r["centroid_id"])
        for r in assign_top_centroids(
            assignments.filter(F.col("vec_id").isin(probes)).select(
                "vec_id", "embedding"
            ),
            centroids.select("centroid_id", "centroid"),
            nprobe,
        ).collect()
    }
    cell_of = {
        r["vec_id"]: r["centroid_id"]
        for r in assignments.select("vec_id", "centroid_id").collect()
    }
    for pid, vid, _d2, _rk in rows:
        assert (pid, cell_of[vid]) in qa, (pid, vid)

    # degradation to the exact baseline
    full = sorted(
        map(
            tuple,
            ann_ivfpq_topk(
                centroids, assignments, codebooks, encoded, codes, probes,
                k=10, probe_frac=1.0, rerank_factor=40,
            ).select("pid", "vec_id", "code_d2", "rk").collect(),
        )
    )
    exact = sorted(
        map(
            tuple,
            knn_int8_codes(emb, probes, k=10)
            .select("pid", "vec_id", "d2", "rk").collect(),
        )
    )
    assert full == exact
