"""Round-8 tests: adaptive split as the incremental/streaming default
(VERDICT r07 item 2), stored-layout inference, and the orphaned-state
gate (ADVICE r07 item 1).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table


def test_incremental_default_split_pinned(spark):
    """The dedup_minhash_incremental ORACLE (queries_pkg/extensions.py)
    hard-codes (24, 4) because the adaptive default deterministically
    picks that on the gated query's corpus subset (doc_id % 10 != 0) at
    every gate SF. Drift in the probe, the chooser, or the testdata
    must fail here before the oracle silently mismatches."""
    from ffi_etl_spark.operators.dedup import resolve_minhash_split

    for sf in ("0.001", "0.01", "0.1"):
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        corpus = docs.filter(F.col("doc_id") % 10 != 0)
        assert resolve_minhash_split(corpus) == (24, 4), sf


def test_signature_table_default_is_probe_pick(spark, sf_dir):
    """minhash_signature_table with no split builds the probe's pick —
    the state-materialization step is where the measured-bad fixed
    split used to get frozen into a pipeline."""
    from ffi_etl_spark.operators.dedup import (
        infer_signature_layout,
        minhash_signature_table,
        resolve_minhash_split,
    )

    docs = table(spark, sf_dir, "documents")
    want = resolve_minhash_split(docs)
    sigs = minhash_signature_table(docs, fast=True)
    assert infer_signature_layout(sigs) == want
    assert want == (24, 4)  # this corpus's pinned pick (test above)


def test_infer_signature_layout_roundtrip_and_failures(spark, sf_dir):
    """Inference adopts exactly the split the table was built with;
    pre-round-6 layouts and empty tables fail with the remedy."""
    from ffi_etl_spark.operators.dedup import (
        infer_signature_layout,
        minhash_signature_table,
    )

    docs = table(spark, sf_dir, "documents").limit(40)
    for np_, nb in ((12, 3), (24, 6), (36, 4)):
        sigs = minhash_signature_table(docs, num_perm=np_, bands=nb, fast=True)
        assert infer_signature_layout(sigs) == (np_, nb)

    good = minhash_signature_table(docs, num_perm=12, bands=3, fast=True)
    old = good.withColumn(
        "_bands", F.transform("_bands", lambda s: s["s0"].cast("string"))
    )
    with pytest.raises(ValueError, match="pre-round-6"):
        infer_signature_layout(old)
    with pytest.raises(ValueError, match="empty"):
        infer_signature_layout(good.limit(0))


def test_incremental_adopts_stored_layout_by_default(spark, sf_dir):
    """The production path: a stored signature table built with a
    NON-default split is consumed with no parameters — the tier adopts
    the pinned layout instead of erroring or (worse) silently mixing
    layouts, and returns the same pairs as an explicit run."""
    from ffi_etl_spark.operators.dedup import (
        dedup_minhash_incremental,
        minhash_signature_table,
    )

    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    stored = minhash_signature_table(corpus, num_perm=36, bands=6)
    got = {
        (r.id_a, r.id_b): r.pair_type
        for r in dedup_minhash_incremental(
            None, batch, corpus_hashed=stored
        ).collect()
    }
    want = {
        (r.id_a, r.id_b): r.pair_type
        for r in dedup_minhash_incremental(
            None, batch, corpus_hashed=stored, num_perm=36, bands=6
        ).collect()
    }
    assert got == want and len(got) > 0


def test_half_specified_split_raises(spark, sf_dir):
    from ffi_etl_spark.operators.dedup import (
        dedup_minhash_incremental,
        minhash_signature_table,
    )

    docs = table(spark, sf_dir, "documents").limit(20)
    with pytest.raises(ValueError, match="BOTH num_perm and bands"):
        minhash_signature_table(docs, num_perm=24)
    with pytest.raises(ValueError, match="BOTH num_perm and bands"):
        dedup_minhash_incremental(docs.limit(10), docs.limit(20).join(
            docs.limit(10).select("doc_id"), "doc_id", "left_anti"
        ), bands=4)


def test_stream_half_split_raises_cleanly(spark, tmp_path):
    """A half-specified split through the streaming kwargs must surface
    the BOTH-or-NEITHER remedy, not a TypeError from the layout gate."""
    import json

    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with open(in_dir / "b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "some words here " * 10}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
    q = (
        stream_dedup_ingest(
            stream,
            str(tmp_path / "corpus"),
            str(tmp_path / "pairs"),
            str(tmp_path / "ckpt"),
            num_perm=24,  # bands deliberately missing
        )
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="BOTH num_perm and bands"):
        q.awaitTermination(120)


def test_stream_probe_knobs_and_explicit_none_accepted(spark, tmp_path):
    """Review r08 regressions: (a) dup_sim/recall_floor must reach the
    split probe and must NOT be forwarded into dedup_minhash_lsh (the
    fresh-stream first batch died in TypeError); (b) an explicit
    num_perm=None/bands=None means 'adaptive default', not a pinned
    None split."""
    import json

    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    for sub, kwargs in (
        ("a", {"dup_sim": 0.9, "recall_floor": 0.99}),
        ("b", {"num_perm": None, "bands": None}),
    ):
        d = tmp_path / sub
        in_dir = d / "in"
        in_dir.mkdir(parents=True)
        with open(in_dir / "b1.json", "w") as f:
            f.write(json.dumps({"doc_id": 1, "text": base}) + "\n")
            f.write(json.dumps({"doc_id": 2, "text": base + "!"}) + "\n")
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(in_dir)
        )
        q = (
            stream_dedup_ingest(
                stream,
                str(d / "corpus"),
                str(d / "pairs"),
                str(d / "ckpt"),
                sigs_path=str(d / "sigs"),
                **kwargs,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        corpus = spark.read.parquet(str(d / "corpus"))
        assert corpus.count() == 1  # the near-dup pair collapsed


def test_batch_hashed_layout_mismatch_fails_fast(spark, sf_dir):
    """Both sides of the band join must share one parameterization —
    now enforced with the same metadata gate, not just documented."""
    from ffi_etl_spark.operators.dedup import (
        dedup_minhash_incremental,
        minhash_signature_table,
    )

    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    stored = minhash_signature_table(corpus, num_perm=24, bands=4)
    mismatched = minhash_signature_table(batch, num_perm=12, bands=3)
    with pytest.raises(ValueError, match="parameters must match"):
        dedup_minhash_incremental(
            None, batch, corpus_hashed=stored, batch_hashed=mismatched
        )


def test_stream_ingest_rejects_orphaned_signature_state(spark, tmp_path):
    """ADVICE r07 item 1: signature state without its corpus must fail
    the batch loudly — appending new rows onto the orphaned table would
    dedupe future batches against ghosts forever."""
    import json

    from ffi_etl_spark.operators.dedup import minhash_signature_table
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    sigs_path = str(tmp_path / "sigs")
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 10
    ghost = spark.createDataFrame([(1, text)], "doc_id long, text string")
    minhash_signature_table(ghost, num_perm=12, bands=3).write.parquet(sigs_path)
    # note: NO corpus parquet is written

    with open(in_dir / "b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 2, "text": "totally new words " * 20}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
    q = (
        stream_dedup_ingest(
            stream,
            str(tmp_path / "corpus"),
            str(tmp_path / "pairs"),
            str(tmp_path / "ckpt"),
            sigs_path=sigs_path,
        )
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="signature state exists"):
        q.awaitTermination(120)
    assert spark.read.parquet(sigs_path).count() == 1  # nothing appended
    assert not os.path.exists(str(tmp_path / "corpus"))


def test_stream_ingest_first_batch_probe_then_adoption(spark, tmp_path):
    """End-to-end default-split flow: the first batch probes itself and
    materializes state at that pick; the second batch ADOPTS the stored
    layout (no explicit parameters anywhere). The state stays
    single-layout throughout — every row has the same signature width."""
    import json

    from ffi_etl_spark.operators.dedup import infer_signature_layout
    from ffi_etl_spark.streaming.ingest import stream_dedup_ingest

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    corpus_path = str(tmp_path / "corpus")
    sigs_path = str(tmp_path / "sigs")

    def run_batch(fname, rows):
        with open(in_dir / fname, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(in_dir)
        )
        q = (
            stream_dedup_ingest(
                stream,
                corpus_path,
                str(tmp_path / "pairs"),
                str(tmp_path / "ckpt"),
                sigs_path=sigs_path,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    run_batch("b1.json", [{"doc_id": 1, "text": base},
                          {"doc_id": 2, "text": "совсем другой текст " * 5}])
    split_after_b1 = infer_signature_layout(spark.read.parquet(sigs_path))
    run_batch("b2.json", [{"doc_id": 3, "text": base + "!"},
                          {"doc_id": 4, "text": "entirely new unrelated words " * 4}])
    sigs = spark.read.parquet(sigs_path)
    assert infer_signature_layout(sigs) == split_after_b1
    widths = {r[0] for r in sigs.select(F.size("_sig")).distinct().collect()}
    assert widths == {split_after_b1[0]}  # single-layout state
    corpus = spark.read.parquet(corpus_path)
    ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert 3 not in ids and {1, 2, 4} <= ids  # near-dup of 1 died vs corpus


def test_chooser_contract_property_sweep():
    """Hypothesis sweep over the whole tuning surface (round 8): for ANY
    (ambient, threshold, dup_sim, recall_floor) in the meaningful
    ranges, choose_minhash_split must return a divisor split from the
    offered widths, and EITHER honor the recall floor at dup_sim or be
    exactly the documented fallback default (no offered split reaches
    the floor). Pure driver-side math — no Spark session."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ffi_etl_spark.functions.lsh_tuning import (
        candidate_probability,
        choose_minhash_split,
        tune_bands,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        ambient=st.floats(0.0, 0.8),
        threshold=st.floats(0.2, 0.9),
        dup_sim_off=st.floats(0.0, 0.3),
        recall_floor=st.floats(0.5, 0.999),
    )
    def check(ambient, threshold, dup_sim_off, recall_floor):
        dup_sim = min(0.99, threshold + dup_sim_off)
        num_perms = (12, 24, 36)
        n, b, r = choose_minhash_split(
            ambient, threshold, dup_sim=dup_sim,
            recall_floor=recall_floor, num_perms=num_perms,
        )
        assert n in num_perms and b >= 1 and n % b == 0 and r == n // b
        if candidate_probability(dup_sim, b, r) < recall_floor:
            # only legal as the documented fallback: NO offered split
            # meets the floor, and the result is the base default
            assert all(
                candidate_probability(dup_sim, bb, np_ // bb) < recall_floor
                for np_ in num_perms
                for bb in range(1, np_ + 1)
                if np_ % bb == 0
            ), (ambient, threshold, dup_sim, recall_floor, (n, b, r))
            b0, r0 = tune_bands(num_perms[0], threshold, fp_weight=5)
            assert (n, b, r) == (num_perms[0], b0, r0)

    check()
