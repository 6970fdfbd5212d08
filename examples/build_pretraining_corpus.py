"""Build a cleaned pretraining corpus from a documents parquet table.

The full LLM-data composition, end to end and lazy per stage:

  1. hygiene  — PII redaction (textops.redact_pii)
  2. quality  — rejection cascade + Gopher repetition gate
               (textops.quality_filter / repetition_filter)
  2.5 domains — blocklist boilerplate-farm domains (short-doc share)
               and cap any one domain's contribution
               (operators/domains.py — the C4/RefinedWeb axis)
  3. dedup    — exact → MinHash near-dup components, one canonical doc
               per cluster (operators/corpus.pretraining_corpus)
  4. decontam — drop docs sharing word-5-grams with a held-out eval
               split (textops.decontaminate)
  5. scrub    — remove cross-doc duplicated 8-token SPANS from the
               surviving docs, keeping one canonical occurrence
               (textops.scrub_dup_spans — the Lee et al. step row-level
               dedup can't do: boilerplate shared by otherwise-distinct
               documents)
  6. select   — DSIR importance weights against a target domain sample
               (textops.dsir_importance); keep docs the target
               distribution up-weights
  7. pack     — concat-and-chunk the survivors into 256-token context
               windows (textops.pack_sequences)

Run:

    python examples/build_pretraining_corpus.py \
        [--input /root/testdata/sf0.01/documents.parquet] \
        [--out ./corpus_out]

Prints per-stage survivor counts and writes the packed-sequence
manifest as parquet. On real data, swap the manifest join for a
semi-join back to the full document rows, and swap the whitespace
token count inside pack_sequences for your tokenizer's.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--out", default="./corpus_out")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ffi_etl_spark.operators.corpus import pretraining_corpus
    from ffi_etl_spark.operators.dedup import dedup_minhash_adaptive
    from ffi_etl_spark.operators.domains import (
        domain_blocklist_filter,
        domain_cap,
        short_doc_domains,
    )
    from ffi_etl_spark.operators.textops import (
        decontaminate,
        dsir_importance,
        pack_sequences,
        quality_filter,
        redact_pii,
        repetition_filter,
        scrub_dup_spans,
    )
    from ffi_etl_spark.session import get_session

    spark = get_session("build-corpus")
    docs = spark.read.parquet(args.input)
    n0 = docs.count()

    # 1. hygiene: scrub PII in place (narrow, scan-stage rewrite)
    clean = redact_pii(docs).select(
        "doc_id", F.col("redacted").alias("text")
    )

    # 2. quality: cascade + repetition gate
    q_ok = quality_filter(clean).filter(F.col("keep")).select("doc_id")
    r_ok = repetition_filter(clean).filter(F.col("keep")).select("doc_id")
    gated = clean.join(q_ok, "doc_id").join(r_ok, "doc_id")
    n_gated = gated.count()

    # 2.5 domain curation (round 9 — the C4/RefinedWeb axis): drop
    # boilerplate-farm domains (short-document share over the ORIGINAL
    # metadata, before redaction changed lengths), then cap any single
    # domain's contribution with the deterministic md5-rank cap
    # (domains.domain_token_cap is the token-budget variant)
    meta = docs.select("doc_id", "source", "n_chars")
    blocked = short_doc_domains(meta).select("source")
    with_domain = gated.join(meta.select("doc_id", "source"), "doc_id")
    curated = domain_cap(
        domain_blocklist_filter(with_domain, blocked), cap=20
    )
    gated = curated.select("doc_id", "text")
    n_curated = gated.count()

    # 3. dedup: exact + near-dup components -> canonical survivors
    # (the adaptive tier probes ambient similarity and re-splits the
    # LSH bands on high-ambient corpora — the production default; see
    # BASELINE.md §scaling for the measured candidate-blowup fix)
    pairs = dedup_minhash_adaptive(gated).count()
    survivors = pretraining_corpus(gated)
    n_dedup = survivors.count()

    # 4. decontamination: doc_id % 10 == 0 stands in for the eval split
    contaminated = decontaminate(gated, F.col("doc_id") % 10 == 0, n=5).select("doc_id")
    final_ids = (
        survivors.join(contaminated, "doc_id", "left_anti")
        .filter(F.col("doc_id") % 10 != 0)
    )
    final_docs = gated.join(final_ids.select("doc_id"), "doc_id")
    n_final = final_docs.count()

    # 5. span scrub: row-level dedup kept one doc per near-dup CLUSTER;
    # this removes the duplicated ≥8-token spans that survive INSIDE
    # distinct documents (shared boilerplate), keeping one canonical
    # occurrence corpus-wide
    scrubbed = scrub_dup_spans(final_docs, n=8)
    n_tok_removed = (
        scrubbed.agg(F.sum("n_removed").alias("r")).collect()[0]["r"] or 0
    )
    scrub_docs = scrubbed.select(
        "doc_id", F.col("scrubbed_text").alias("text")
    ).filter(F.trim(F.col("text")) != "")

    # 6. DSIR selection: hashed-bigram importance vs a target domain
    # sample (docs ending in 0 stand in for the curated in-domain set);
    # keep documents the target distribution up-weights (weight_q > 0 —
    # integer threshold, no float boundary)
    weights = dsir_importance(scrub_docs, F.col("doc_id") % 10 == 1)
    selected = scrub_docs.join(
        weights.filter(F.col("weight_q") > 0).select("doc_id"), "doc_id"
    )
    n_selected = selected.count()

    # 7. pack into 256-token context windows
    packed = pack_sequences(selected, chunk_tokens=256)
    packed.write.mode("overwrite").parquet(args.out)
    n_chunks = (
        spark.read.parquet(args.out).agg(F.max("chunk_end")).collect()[0][0] or 0
    ) + 1

    print(f"input docs:            {n0}")
    print(f"pass quality gates:    {n_gated}")
    print(f"after domain curation: {n_curated}")
    print(f"near-dup pairs:        {pairs}")
    print(f"dedup survivors:       {n_dedup}")
    print(f"after decontamination: {n_final}")
    print(f"span tokens scrubbed:  {n_tok_removed}")
    print(f"DSIR-selected docs:    {n_selected}")
    print(f"packed 256-tok chunks: {n_chunks}  -> {args.out}")


if __name__ == "__main__":
    main()
