"""Document-level text-analysis operators (over the `documents` table)."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ffi_etl_spark.functions.hashing import md5_int32, minhash_signature, word_ngrams
from ffi_etl_spark.functions.textstats import (
    bpe_token_count,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    ws_token_count,
)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc stats: token counts, punct/stopword ratios, quality score."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        ws_token_count(t).alias("n_tokens_ws"),
        bpe_token_count(t).alias("n_tokens_bpe"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_word_length(t), 6).alias("mean_word_len"),
        quality_score(t).alias("quality_score"),
    )


def detect_language(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID (cheap first-pass tier)."""
    return df.select(F.col(id_col), lang_id(F.col(text_col)).alias("lang_pred"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                num_perm: int = 4, ngram: int = 3) -> DataFrame:
    """Compact content fingerprint: MinHash over word n-grams, joined
    into one string key — a cheap winnowing-style doc signature usable
    as a grouping key for fuzzy clustering."""
    hashes = F.array_distinct(F.transform(word_ngrams(F.col(text_col), ngram), md5_int32))
    sig = minhash_signature(hashes, num_perm)
    return df.select(
        F.col(id_col),
        F.lower(
            F.concat_ws("-", F.transform(sig, lambda x: F.conv(x.cast("string"), 10, 16)))
        ).alias("fingerprint"),
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"
PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scrub emails / phone numbers / IPv4 addresses from a corpus
    before it becomes training data. Pure ``regexp_replace`` chain —
    narrow, JVM-side, whole-stage-codegen; a scan-stage rewrite with
    zero shuffle at any scale. Patterns are RE2-compatible (no
    backrefs / lookaround) so external engines can mirror them.

    Redaction order matters and is part of the contract: emails first
    (their local part may contain digits-and-dots an IP pattern could
    nibble), then phones, then bare IPs. Counts are taken BEFORE any
    rewrite so later patterns can't eat earlier matches."""
    t = F.col(text_col)
    redacted = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_PHONE, "<PHONE>")
    redacted = F.regexp_replace(redacted, PII_IP, "<IP>")
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE)).alias("n_phones"),
        F.regexp_count(t, F.lit(PII_IP)).alias("n_ips"),
        redacted.alias("redacted"),
    )


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    max_top_frac: float = 0.2,
) -> DataFrame:
    """Gopher-style repetition gate: a document whose single most
    frequent word ``n``-gram accounts for more than ``max_top_frac``
    of all its n-grams is template/boilerplate spam and is dropped
    from a pretraining corpus.

    Shape: explode n-grams to rows, count per (doc, gram), then reduce
    per doc — two hash aggregates, both with map-side partial
    aggregation, keyed by doc-uniform hashes (no skew). The n-gram
    multiset is NEVER collected to an array, so a pathological
    million-token doc streams through the aggregate instead of
    materializing one giant row."""
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("_gram")
    )
    per_gram = grams.groupBy(id_col, "_gram").agg(F.count(F.lit(1)).alias("_c"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("_c").alias("n_grams"), F.max("_c").alias("top_gram_n")
    )
    top_frac = F.col("top_gram_n").cast("double") / F.col("n_grams").cast("double")
    # keep-test in INTEGER arithmetic (top_n * 5 <= total for 0.2), so
    # the decision is exact and engine-portable; the double ratio is
    # display-only
    inv = int(round(1 / max_top_frac))
    return per_doc.select(
        id_col,
        "n_grams",
        "top_gram_n",
        F.round(top_frac, 6).alias("top_gram_frac"),
        (F.col("top_gram_n") * F.lit(inv) <= F.col("n_grams")).alias("keep"),
    )


def decontaminate(
    df: DataFrame,
    bench_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with a held-out eval set (the n-gram-collision
    test used for LM eval hygiene; 8-13 grams are the usual window).

    ``bench_pred`` is a Column predicate selecting the benchmark rows
    from ``df`` (eval sets are tiny by construction). The benchmark's
    distinct gram-hash set is broadcast, so the training-side check is
    a map-side semi-join in the scan stage — no shuffle of the corpus;
    the only shuffle is the per-doc overlap count on flagged docs
    (a vanishing fraction). Gram hashes are md5-derived
    (functions/hashing.py) for engine-portable parity."""
    grams = lambda frame: frame.select(  # noqa: E731
        F.col(id_col),
        F.explode(
            F.array_distinct(F.transform(word_ngrams(F.col(text_col), n), md5_int32))
        ).alias("_gh"),
    )
    bench_set = grams(df.filter(bench_pred)).select("_gh").distinct()
    train = grams(df.filter(~bench_pred))
    return (
        train.join(F.broadcast(bench_set), "_gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .orderBy(id_col)
    )


def keyword_tfidf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf — keyword
    extraction over a corpus, the ranking spine of retrieval-style
    training-data curation (topic labeling, near-topic filtering).

    idf is the rational BM25 form ``(N - df + 0.5) / (df + 0.5)``, NOT
    ``ln(N/df)``: +, -, *, / are IEEE-correctly-rounded in every
    engine, so scores are bit-identical cross-engine (differentially
    testable), while ``ln`` is a transcendental whose last ulp is
    library-specific. Monotone in 1/df exactly like log-idf, so the
    RANKING is the standard one.

    Shape: one shuffle to (doc, term) for tf, a term-keyed aggregate
    for df (vocab-sized — broadcast back; at 100 TB web-scale vocab
    outgrows the driver, so drop the hint and let AQE pick a shuffle
    join), a 1-row broadcast for N, and a per-doc window for top-k.
    Ties break on term asc, so the top-k set is deterministic."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.select(F.count(F.lit(1)).alias("n_docs"))
    tfidf = F.col("tf") * (
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", tfidf)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(id_col, "term", "tf", "df", "tfidf")
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` documents by BM25 for a fixed term query — the ranked
    retrieval that backs quality-aware corpus curation (pull the
    strongest exemplars of a topic) and RAG evaluation harnesses.

    idf uses the rational BM25 form ``(N - df + 0.5) / (df + 0.5)``
    (keyword_tfidf's idiom — no ``ln``, so every arithmetic step is
    IEEE-correctly-rounded and bit-identical cross-engine); ``avgdl``
    is computed as exact-integer-sum / exact-count, never a float
    ``avg()`` whose partition merge order leaks into the low bits. The
    per-document score sums its term scores in SORTED TERM ORDER via a
    pivot, because float addition is not commutative in the low bits.

    Shape: one (doc, term) shuffle for tf over ONLY the query terms
    (the isin filter collapses the explode before the exchange), a
    term-keyed df aggregate (|query|-row broadcast), a doc-length agg
    reusing the same doc keying, and a final top-k that runs as
    TakeOrderedAndProject. Corpus-sized data shuffles once.
    """
    # normalize to match the lowercased token stream, dedup (a repeated
    # term would emit two identical pivot columns -> ambiguous-reference
    # AnalysisException), and keep the pivot key column collision-free
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("bm25_rank: query_terms must be non-empty")
    if id_col in terms:
        raise ValueError(f"bm25_rank: query term {id_col!r} collides with id_col")
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    sat = (F.col("tf") * (F.lit(k1) + F.lit(1.0))) / (
        F.col("tf")
        + F.lit(k1) * ((F.lit(1.0) - F.lit(b)) + (F.lit(b) * F.col("dl")) / avgdl)
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn("s", idf * sat)
    )
    piv = scored.groupBy(id_col).pivot("term", terms).agg(F.first("s"))
    score = None
    for t in terms:
        c = F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
        score = c if score is None else score + c
    return (
        piv.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), id_col)
        .limit(k)
    )


def dsir_importance(
    df: DataFrame,
    target,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    buckets: int = 64,
    scale_bits: int = 20,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much more likely its hashed-n-gram bag is under a
    TARGET domain's distribution than under the raw corpus's —
    ``w(d) = Σ_b c_d[b] · llr[b]`` with
    ``llr[b] = ln((t_b+1)/(T+B)) − ln((s_b+1)/(S+B))`` (add-1-smoothed
    multinomials over ``buckets`` md5-hashed n-gram buckets; ``target``
    is a boolean Column over ``df`` marking the in-domain sample).
    High-weight documents are the ones importance RESAMPLING keeps;
    feed the weights to the deterministic samplers downstream.

    Cross-engine exactness: ``ln`` is NOT bit-identical between
    engines (Java ``Math.log`` vs libm — measured), so the per-bucket
    LLR is FIXED-POINT QUANTIZED before it touches any sum:
    ``llr_q[b] = floor(2^scale_bits · llr)`` is an exact BIGINT (the
    floor flips only if the engines' ln values straddle a 2^-20 grid
    line — odds ~1e-10 per bucket), and the document weight
    ``weight_q = Σ c_d[b]·llr_q[b]`` is then pure integer arithmetic:
    order-independent, overflow-safe (|llr_q| ≲ 2^24, corpus-scale
    gram counts fit comfortably), and hash-strict with no float
    column in the gate. ``weight`` = weight_q/2^scale_bits (a
    power-of-two division — exact) rides along for human use.

    Shape: one narrow gram explode carrying the target flag, ONE
    B-group aggregate producing both sides' bucket counts (no second
    corpus pass), a 1-row totals broadcast, a B-row llr broadcast, one
    (doc, bucket)-keyed count aggregate, one doc-keyed integer sum.
    Nothing corpus-sized shuffles more than once; B bounds every
    model-side structure."""
    from ffi_etl_spark.functions.hashing import md5_int32, word_ngrams

    grams = df.select(
        F.col(id_col),
        target.alias("_t"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("_g"),
    ).select(
        F.col(id_col),
        F.col("_t"),
        F.pmod(md5_int32(F.col("_g")), F.lit(buckets)).alias("b"),
    )
    # doc-bucket counts FIRST, then bucket stats derived from them —
    # the gram explode (the corpus-scale pass) runs exactly once;
    # aggregating stats directly from `grams` under a different key
    # would recompute the explode (no exchange reuse across grouping
    # keys). dbc feeds both the stats and the final weight join, so it
    # is pinned — it is compact by construction (≤ docs × buckets
    # rows), unlike the gram stream it summarizes; reclaimed by
    # spark.catalog.clearCache() like the dedup signature tables.
    dbc = (
        grams.groupBy(id_col, "_t", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    stats = dbc.groupBy("b").agg(
        F.sum("c").alias("s_b"),
        F.sum(F.when(F.col("_t"), F.col("c")).otherwise(F.lit(0))).alias("t_b"),
    )
    tot = stats.agg(F.sum("s_b").alias("S"), F.sum("t_b").alias("T"))
    scale = F.lit(float(1 << scale_bits))
    llr = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.floor(
                scale
                * (
                    F.log(
                        (F.col("t_b") + F.lit(1)).cast("double")
                        / (F.col("T") + F.lit(buckets))
                    )
                    - F.log(
                        (F.col("s_b") + F.lit(1)).cast("double")
                        / (F.col("S") + F.lit(buckets))
                    )
                )
            )
            .cast("long")
            .alias("llr_q"),
        )
    )
    return (
        dbc.join(F.broadcast(llr), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("llr_q")).alias("weight_q"),
        )
        .withColumn("weight", F.col("weight_q").cast("double") / scale)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke 2009) of N ranked
    lists — the standard hybrid-retrieval combiner (BM25 lexical list ×
    embedding-cosine semantic list) a RAG-ish curation pipeline runs:
    ``rrf = Σ_i 1/(rrf_k + rank_i)`` with absent-from-list-i
    contributing 0. Each input must carry (``id_col``, ``rank_col``)
    with ranks 1-based and deterministic (tie-broken) — rank ties are
    the CALLER's bug, this combiner assumes total orders.

    Cross-engine exactness: every contribution is one correctly-rounded
    division of exact integers, and the contributions sum in the FIXED
    list order given — no partition-order accumulation — so the fused
    score is bit-identical on any engine and is legal to feed the
    top-``k`` LIMIT (the rational-arithmetic rule). Ties on the fused
    score break by ``id_col``.

    Shape: the lists are top-N (tiny) by construction, so the N-way
    full-outer join and the final top-k are driver-free small-data
    stages; the expensive work (the rankings) happened upstream where
    each ranker's own scale story applies."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    out = None
    for i, r in enumerate(rankings):
        ri = r.select(F.col(id_col), F.col(rank_col).alias(f"rank_{i}"))
        out = ri if out is None else out.join(ri, id_col, "full_outer")
    score = None
    for i in range(len(rankings)):
        c = F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        score = c if score is None else score + c
    return (
        out.withColumn("rrf", score)
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k)
    )


def lm_transition_anomaly(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_threshold: float = 0.01,
) -> DataFrame:
    """Bigram-LM fluency signal (the KenLM-quality-filter shape without
    the external LM): train conditional MLE transition probabilities
    p(b|a) = c(a,b)/c(a,·) on the corpus itself, then profile each
    document by its LEAST likely transition and its count of rare
    transitions — documents whose token sequences the corpus LM finds
    improbable (boilerplate splices, shuffled text, wrong-language
    spans) surface with low min_prob / high n_rare.

    Determinism: the per-doc statistics are MIN and a threshold COUNT
    over ratios of exact integers — no float is ever summed in
    partition-dependent order, so outputs are bit-reproducible (the
    classic per-doc log-likelihood SUM would not be; that form is
    noted, not gated).

    Shape: bigrams come from a narrow arrays_zip of the token array
    against its own tail (no self-join, no window); c(a,b) and c(a,·)
    are token-keyed aggregates — vocab-sized outputs joined back with a
    broadcast hint that should be DROPPED at web-scale vocab (AQE picks
    the shuffle join); the doc profile is one doc-keyed aggregate."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    bigrams = df.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))).alias("t1"),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))).alias("t2"),
            )
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2"))
    c_ab = bigrams.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c_ab"))
    c_a = bigrams.groupBy("t1").agg(F.count(F.lit(1)).alias("c_a"))
    prob = F.col("c_ab").cast("double") / F.col("c_a")
    return (
        bigrams.join(F.broadcast(c_ab), ["t1", "t2"])
        .join(F.broadcast(c_a), "t1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.when(prob < rare_threshold, 1).otherwise(0)).alias("n_rare"),
            F.min(prob).alias("min_prob"),
        )
    )


def quality_filter(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pretraining-corpus quality gate: first-match-wins rejection
    cascade over the quality signals (the C4/Gopher-rule shape, and the
    same ordered-when-chain pattern as the reference's validity cascade,
    transform_alchemer_data.py:201-224). Entirely JVM-side expressions —
    one narrow pass, no shuffle; at 100 TB this is a scan-stage filter
    whose selectivity should be measured (text_stats) before it runs."""
    t = F.col(text_col)
    n = F.length(t)
    reason = (
        F.when(n < 100, "too_short")
        .when(n > 10000, "too_long")
        .when(punct_ratio(t) >= 0.1, "too_punctuated")
        .when(stopword_ratio(t) <= 0.05, "low_stopword_density")
        .when((mean_word_length(t) < 3) | (mean_word_length(t) > 10), "abnormal_word_length")
        .otherwise("ok")
    )
    return df.select(
        F.col(id_col),
        reason.alias("reject_reason"),
        (reason == "ok").alias("keep"),
    )


def _order_cutpoints(
    df: DataFrame, order_cols: list[str], num_ranges: int, sample_n: int = 4096
) -> list[tuple]:
    """Deterministic, seed-free range cutpoints over a composite order
    key. ``repartitionByRange`` draws its split points from a random
    sample, so two physical executions of the same logical node can
    disagree — fatal for any helper that references the ranged frame
    twice (VERDICT r06 item 1). This probe instead takes the
    ``sample_n`` rows with the SMALLEST ``xxhash64`` of the key — a
    deterministic pseudo-random subset via TakeOrderedAndProject, never
    a full sort — re-sorts that subset by the TRUE key order *in
    Spark* (so ordering semantics for nulls/NaN/timestamps are exactly
    the engine's own), and picks evenly spaced elements as cutpoints.
    The collect is ≤ ``sample_n`` key tuples — a driver-side probe of
    the same shape as ``estimate_ambient_jaccard``, justified in-line."""
    key_cols = [F.col(c) for c in order_cols]
    subset = (
        df.select(*key_cols)
        .orderBy(F.xxhash64(*key_cols), *order_cols)
        .limit(sample_n)
    )
    rows = subset.orderBy(*order_cols).collect()  # tiny deterministic probe
    if len(rows) < 2 or num_ranges <= 1:
        return []
    cuts: list[tuple] = []
    for i in range(1, num_ranges):
        idx = (i * len(rows)) // num_ranges
        cut = tuple(rows[idx])
        if idx > 0 and (not cuts or cut != cuts[-1]):
            cuts.append(cut)
    return cuts


def _key_ge_cut(order_cols: list[str], cut: tuple):
    """Lexicographic ``key >= cut`` as a pure Spark expression, with
    Spark's own null ordering (ASC NULLS FIRST: null sorts below every
    value, so ``col > null`` ≡ ``col IS NOT NULL``). Null comparisons
    that surface as SQL NULL fall to false under ``when`` — exactly the
    "key < cut" branch they belong to."""
    expr = None
    for c, v in zip(reversed(order_cols), reversed(cut)):
        col = F.col(c)
        if v is None:
            gt, eq = col.isNotNull(), col.isNull()
        else:
            gt, eq = col > F.lit(v), col == F.lit(v)
        expr = (gt | eq) if expr is None else (gt | (eq & expr))
    return expr


def global_cumsum_exclusive(
    df: DataFrame,
    order_col: str | list[str],
    val_col: str,
    out_col: str = "offset",
    num_ranges: int = 32,
) -> DataFrame:
    """Total-order EXCLUSIVE running sum of ``val_col`` by ``order_col``
    (one column or a composite list; the combination must be unique),
    computed the scalable way: a naive ``Window.orderBy`` with no
    partition key collapses the whole table onto ONE task — the classic
    100 TB cliff. Instead: assign each row a bucket id ``_pid`` that is
    a PURE FUNCTION of its key (deterministic cutpoints from
    ``_order_cutpoints``; bucket i's keys all precede bucket i+1's),
    cumsum WITHIN each bucket, and add each bucket's exclusive offset —
    a P-row aggregate joined back as a broadcast.

    Deliberately NOT ``repartitionByRange`` + ``spark_partition_id()``:
    that pairing samples split points per physical execution, and this
    frame is referenced twice (window source + bucket totals) — if AQE,
    a stage retry, or a different core layout re-executes the exchange
    rather than reusing it, the two references can see DIFFERENT bucket
    assignments and the offsets attach to the wrong rows (same row
    count, wrong values — the exact hash-only failure of
    CORRECTNESS_r06's ``dsir_budget_selection``). A computed ``_pid``
    column is identical on every execution by construction, and drops
    the range-exchange from the plan: the only wide shuffle left is the
    hash partition on ``_pid`` that the window needs anyway."""
    from pyspark.sql import Window

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    pid = F.lit(0)
    for cut in _order_cutpoints(df, order_cols, num_ranges):
        pid = pid + F.when(_key_ge_cut(order_cols, cut), 1).otherwise(0)
    bucketed = df.withColumn("_pid", pid.cast("int"))
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum(val_col).over(w_in), F.lit(0).cast("long"))
    ptot = bucketed.groupBy("_pid").agg(F.sum(val_col).alias("_ptot"))
    w_p = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = ptot.select(
        "_pid", F.coalesce(F.sum("_ptot").over(w_p), F.lit(0).cast("long")).alias("_poff")
    )
    return (
        bucketed.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, (F.col("_poff") + within).cast("long"))
        .drop("_pid", "_poff")
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 256,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style pretraining
    batcher: documents are laid end-to-end in ``id_col`` order on one
    global token axis, which is cut into fixed ``chunk_tokens`` context
    windows; a document belongs to every chunk its token span overlaps.
    Output: (doc, n_tokens, tok_start, chunk_start, chunk_end,
    n_chunks) — all integer arithmetic, so the layout is bit-exactly
    reproducible on any engine and any partitioning.

    The token axis comes from ``global_cumsum_exclusive`` (range
    partition + per-partition window + broadcast offsets), NOT a global
    single-partition window, so the layout computation scales with the
    cluster. Chunk ids are ``DIV`` integer division; whitespace token
    counts stand in for a real tokenizer (swap ``ws_token_count`` for a
    BPE count column when available)."""
    toked = df.select(
        F.col(id_col), ws_token_count(F.col(text_col)).cast("long").alias("n_tokens")
    )
    off = global_cumsum_exclusive(toked, id_col, "n_tokens", "tok_start")
    L = F.lit(chunk_tokens).cast("long")
    chunk_start = F.expr(f"tok_start DIV {chunk_tokens}")
    chunk_end = F.expr(f"(tok_start + n_tokens - 1) DIV {chunk_tokens}")
    return off.select(
        id_col,
        "n_tokens",
        "tok_start",
        chunk_start.alias("chunk_start"),
        chunk_end.alias("chunk_end"),
        (chunk_end - chunk_start + F.lit(1)).alias("n_chunks"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Per-document sliding-window chunking — the RAG/embedding-prep
    splitter (complement of ``pack_sequences``, which packs MANY docs
    onto one global axis; this cuts EACH doc into overlapping windows
    for retrieval indexing). Chunk i covers tokens
    [1 + i*stride, 1 + i*stride + chunk_tokens); the final partial
    window is kept (a short tail beats a lost tail for recall).

    Entirely narrow — tokenize, sequence the window starts, slice, one
    posexplode; no shuffle at any scale, so chunking rides the same
    scan that reads the corpus."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(tokens), F.lit(1)), F.lit(stride)
    )
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(tokens, s, chunk_tokens))
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    ).withColumn(
        "n_tokens", F.size(F.split(F.col("chunk_text"), r"\s+"))
    )


def term_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` collocations: ordered term pairs co-occurring within
    ``window`` tokens, scored by the Dice coefficient
    ``2·f(a,b) / (f(a)+f(b))`` — the phrase-mining primitive behind
    tokenizer-vocabulary candidates and stop-phrase lists. Dice (not
    PMI) on purpose: it's a single division of exact integer counts, so
    scores are bit-identical cross-engine where PMI's log is not.

    Pair generation is NARROW: per doc, a nested transform emits the
    ≤``window`` forward neighbors of each position (guarded to the
    empty array for 1-token docs — ``sequence(1, 0)`` would descend),
    then one explode feeds the (a, b) count aggregate. No join happens
    until the (vocab-sized, broadcastable) unigram counts attach to the
    surviving ``min_count``-filtered pairs; top-k is a TakeOrdered, not
    a global sort."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    pair_arr = F.when(
        n >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(F.lit(1), F.least(F.lit(window), n - i)),
                    lambda d: F.struct(
                        F.element_at(toks, i).alias("a"),
                        F.element_at(toks, (i + d).cast("int")).alias("b"),
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    pairs = df.select(F.explode(pair_arr).alias("p")).select("p.a", "p.b")
    pair_counts = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    uni = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ua = F.broadcast(uni.withColumnsRenamed({"term": "a", "n": "n_a"}))
    ub = F.broadcast(uni.withColumnsRenamed({"term": "b", "n": "n_b"}))
    dice = (F.col("n_ab") * 2).cast("double") / (
        (F.col("n_a") + F.col("n_b")).cast("double")
    )
    return (
        pair_counts.join(ua, "a")
        .join(ub, "b")
        .select("a", "b", "n_ab", "n_a", "n_b", dice.alias("dice"))
        .orderBy(F.desc("dice"), "a", "b")
        .limit(k)
    )


def dup_span_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Cross-document duplicated-span profile: for every document, how
    many of its distinct token ``n``-grams also appear in at least one
    OTHER document — the distributed analogue of exact-substring
    training-data dedup (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better"), with fixed-length token windows
    standing in for suffix-array matches.

    Per doc: ``n_grams`` (distinct n-grams), ``n_dup_grams`` (those
    shared cross-doc), ``dup_ratio`` — an exact integer ratio cast to
    double, so it is bit-identical across engines. Within-doc repeats
    are deliberately NOT counted (that is ``repetition_filter``'s job);
    a gram is "duplicated" iff its distinct-doc frequency is ≥ 2.

    Scale shape: one narrow explode (no shuffle) → distinct on
    (doc, gram-hash) → gram-keyed doc-frequency agg (map-side partial
    collapse bounds shuffle volume by distinct grams per partition) →
    co-partitioned join back on the gram hash (AQE reuses the agg's
    partitioning) → doc-keyed agg. Boilerplate-hot grams skew the
    doc-frequency COUNT only, never a collect — safe at corpus scale.
    No counterpart in the reference (its dedup surface is row-identity
    only, SURVEY.md §2.7); this is north-star extension surface.
    """
    from ffi_etl_spark.functions.hashing import md5_int60

    grams = (
        df.select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
        )
        .select(F.col(id_col), md5_int60(F.col("gram")).alias("g"))
        .distinct()
    )
    docfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("d"))
    return (
        grams.join(docfreq, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("d") >= 2, 1).otherwise(0)).alias("n_dup_grams"),
        )
        .withColumn(
            "dup_ratio",
            F.col("n_dup_grams").cast("double") / F.col("n_grams").cast("double"),
        )
    )


# position key packing for scrub_dup_spans: doc_id * 2^POS_BITS + pos.
# Bounds: pos ≤ n_tokens < 2^20 (a 1M-token doc breaks the pack — raise
# POS_BITS), doc_id < 2^43 (so the key fits a signed 64-bit long).
_SPAN_POS_BITS = 20


def scrub_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Exact-substring span REMOVAL — the scrub step after
    ``dup_span_profile``'s measurement (Lee et al. 2021: drop duplicated
    ≥n-token spans from the training corpus, keeping one canonical
    occurrence). Token n-gram occurrences are keyed by md5 hash; a gram
    duplicated across ≥2 distinct documents keeps only its canonical
    occurrence (minimum (doc_id, position)) and every other occurrence's
    n-token window is scrubbed; a document's kept tokens are re-joined
    with single spaces (whitespace-normalized, like every token op
    here). Within-doc-only repeats are NOT scrubbed — same contract as
    ``dup_span_profile`` (that is ``repetition_filter``'s signal).

    Output per document: ``n_tokens`` (before), ``n_removed`` (tokens
    scrubbed), ``scrubbed_text`` (the rebuilt document — feed it to
    packing/training downstream), and ``scrubbed_md5`` (md5 of the
    rebuilt text — the whole transform is md5/position arithmetic, so
    a DuckDB oracle replays it end-to-end and the gate is a full
    differential, not an invariant flag). Overlapping duplicated spans union their token windows, so
    scrubbing is idempotent per doc; residual cross-doc duplication
    after the scrub is pinned ≈0 by the planted-span pytest (seam-grams
    formed across removal joints are the only possible leftovers).

    Scale shape: two narrow explodes (gram starts, token positions), one
    gram-keyed aggregate (map-side combined; boilerplate-hot grams skew
    a COUNT, never a collect), one gram-keyed join back, a doc-keyed
    anti-join on covered positions, and per-doc rebuilds via the
    order-pinned collect — no driver collects, no cross product; the
    token-position anti-join co-partitions on the doc key. The
    tokenized base feeds three consumers (grams, positions, final
    join), so it is pinned MEMORY_AND_DISK like the dedup signature
    tables — one tokenization pass, reclaimed by
    ``spark.catalog.clearCache()``."""
    from ffi_etl_spark.functions.hashing import md5_int60

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).alias("n_tokens"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    occ = base.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.col("n_tokens") - F.lit(n - 1), F.lit(1))
            )
        ).alias("s"),
        F.col("_toks"),
    ).select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("s"),
        md5_int60(
            F.concat_ws(" ", F.slice(F.col("_toks"), F.col("s"), F.lit(n)))
        ).alias("g"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # occ feeds the gram-stats aggregate AND the scrub join; without
    # the pin the gram hashing pass runs twice (stats and join shuffle
    # under different keys, so no exchange reuse)
    pos_key = F.col(id_col) * F.lit(1 << _SPAN_POS_BITS) + F.col("s")
    stats = occ.groupBy("g").agg(
        F.count_distinct(id_col).alias("_ddf"),
        F.min(F.col(id_col) * F.lit(1 << _SPAN_POS_BITS) + F.col("s")).alias("_canon"),
    )
    scrub = (
        occ.join(stats, "g")
        .where((F.col("_ddf") >= 2) & (pos_key != F.col("_canon")))
        .select(F.col(id_col), F.col("s"), F.col("n_tokens"))
    )
    return _rebuild_scrubbed(base, scrub, id_col, n)


def scrub_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """WITHIN-document repeated-span scrub — the removal step for the
    signal ``repetition_filter`` measures (Gopher-style repeated
    n-gram mass), complementing ``scrub_dup_spans``' cross-document
    scrub: every n-token span that re-occurs LATER in the same
    document keeps its first occurrence and loses the repeats. A
    solid run of one token collapses to its first window remainder
    (every later window is a repeat of the first — the aggressive
    edge, documented rather than special-cased).

    Same machinery and same output schema as ``scrub_dup_spans``
    (n_tokens / n_removed / scrubbed_text / scrubbed_md5); the only
    difference is the election: canonical = min position PER (doc,
    gram), and cross-document occurrences are ignored entirely."""
    from ffi_etl_spark.functions.hashing import md5_int60

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).alias("n_tokens"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    occ = base.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.col("n_tokens") - F.lit(n - 1), F.lit(1))
            )
        ).alias("s"),
        F.col("_toks"),
    ).select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("s"),
        md5_int60(
            F.concat_ws(" ", F.slice(F.col("_toks"), F.col("s"), F.lit(n)))
        ).alias("g"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    firsts = occ.groupBy(id_col, "g").agg(F.min("s").alias("_first_s"))
    scrub = (
        occ.join(firsts, [id_col, "g"])
        .where(F.col("s") > F.col("_first_s"))
        .select(F.col(id_col), F.col("s"), F.col("n_tokens"))
    )
    return _rebuild_scrubbed(base, scrub, id_col, n)


def _rebuild_scrubbed(
    base: DataFrame, scrub: DataFrame, id_col: str, n: int
) -> DataFrame:
    """Shared scrub tail: union the condemned occurrences' n-token
    windows (clamped to the doc), anti-join the token positions, and
    rebuild each doc with the order-pinned collect. ``base`` carries
    (id, _toks, n_tokens); ``scrub`` carries (id, s, n_tokens)."""
    covered = scrub.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.col("s"), F.least(F.col("s") + F.lit(n - 1), F.col("n_tokens"))
            )
        ).alias("ti"),
    ).distinct()
    toks_pos = base.select(
        F.col(id_col), F.posexplode("_toks").alias("_p", "tok")
    ).select(F.col(id_col), (F.col("_p") + 1).alias("ti"), F.col("tok"))
    kept = toks_pos.join(covered, [id_col, "ti"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ti", "tok"))),
                lambda st: st["tok"],
            ),
        ).alias("_scrubbed")
    )
    removed = covered.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nrem"))
    scrubbed = F.coalesce(F.col("_scrubbed"), F.lit(""))
    return (
        base.join(rebuilt, id_col, "left")
        .join(removed, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.coalesce(F.col("_nrem"), F.lit(0)).cast("int").alias("n_removed"),
            scrubbed.alias("scrubbed_text"),
            F.md5(scrubbed).alias("scrubbed_md5"),
        )
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_postings: int = 1000,
) -> DataFrame:
    """Term → posting-list build (the retrieval-index spine): distinct
    (term, doc) pairs → per-term document frequency + the sorted
    posting list serialized as a comma-joined string (sorted + string
    so the result is deterministic and hash-comparable across engines).

    ``max_postings`` caps the serialized list (stopword-grade terms
    would otherwise make one output row carry the whole corpus): the
    cap keeps the agg state bounded, and ``df`` still reports the TRUE
    document frequency. At 100 TB the cap is the difference between a
    bounded ObjectHashAggregate and a driver-killing collect_set — a
    production index would also shard postings by (term, bucket);
    single narrow explode → one term-keyed shuffle either way.
    """
    pairs = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_set("doc")), 1, max_postings), ","
            ).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def source_ngram_overlap(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 3,
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    sources, the number of distinct token n-grams they share and the
    overlap coefficient |A∩B| / min(|A|,|B|) (exact integer ratio cast
    to double). The pretraining use: a high-overlap source pair means
    one of them is a re-crawl / mirror and the mixture weights double-
    count it (`decontaminate` handles the train/eval direction; this is
    train/train).

    Plan: narrow explode → distinct (source, gram-hash) — the dedup
    collapses boilerplate before anything wide — then a gram-keyed
    self-join whose per-key fan-out is bounded by the number of
    SOURCES (small), never by gram frequency, and an S²-sized agg.
    Per-source gram totals broadcast back onto the S² frame.
    """
    from ffi_etl_spark.functions.hashing import md5_int60

    sg = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
        )
        .select("source", md5_int60(F.col("gram")).alias("g"))
        .distinct()
    )
    sizes = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a = sg.withColumnsRenamed({"source": "source_a"})
    b = sg.withColumnsRenamed({"source": "source_b"})
    shared = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = F.broadcast(sizes.withColumnsRenamed({"source": "source_a", "n_grams": "n_a"}))
    sb = F.broadcast(sizes.withColumnsRenamed({"source": "source_b", "n_grams": "n_b"}))
    return (
        shared.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("overlap_coef"),
        )
    )


def token_entropy(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document unigram (whitespace-token) Shannon entropy in nats —
    the repetition/quality signal that catches keyword-stuffed or
    boilerplate docs a length/punctuation score misses (low entropy =
    few distinct tokens dominate).

    Shape: explode tokens → count per (doc, token) → fold
    ``-Σ (c/n)·ln(c/n)`` per doc. Both aggregations partial-aggregate
    map-side and key by doc id (the second reuses the first's
    partitioning modulo the dropped token column), so the work fans out
    with the corpus — the 100 TB shape, vs a per-row
    O(tokens × distinct) array fold that stalls on long documents.

    NULL / whitespace-only / empty text yields ``n_tokens=0, entropy
    0.0`` — the row is KEPT (a per-doc quality join must not lose
    docs), and empty tokens are filtered like ``inverted_index`` does
    (previously NULL text vanished via explode-of-null and empty text
    counted the empty string as one token).

    Rows-only gate by design: ``ln`` is transcendental, and last-ulp
    differences between JVM ``Math.log`` and a C libm make a bit-exact
    SQL oracle unsound; the correctness check is the Counter-based
    Python differential in tests."""
    # explode_outer: a token-less doc survives as one (_tok=NULL) row
    toks = F.explode_outer(
        F.filter(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda t: t != "",
        )
    ).alias("_tok")
    per_token = (
        df.select(F.col(id_col), toks)
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    real = F.col("_tok").isNotNull()
    return (
        per_token.groupBy(id_col)
        .agg(
            F.sum(F.when(real, F.col("_c")).otherwise(F.lit(0))).alias("_n"),
            F.sum(
                F.when(real, F.col("_c") * F.log(F.col("_c"))).otherwise(F.lit(0.0))
            ).alias("_clogc"),
        )
        # -Σ (c/n)ln(c/n) = ln(n) - (Σ c·ln c)/n  — one pass, no second join
        .select(
            F.col(id_col),
            F.col("_n").cast("long").alias("n_tokens"),
            F.when(
                F.col("_n") > 0, F.log(F.col("_n")) - F.col("_clogc") / F.col("_n")
            )
            .otherwise(F.lit(0.0))
            .alias("entropy_nats"),
        )
    )


def more_like_this(
    df: DataFrame,
    query_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 25,
    idf_bits: int = 10,
) -> DataFrame:
    """Top-``k`` most-similar documents to ``query_id`` by EXACT
    sparse tf-idf cosine — the lexical counterpart to knn_bruteforce's
    dense retrieval (and the scoring engine behind a "more like this"
    curation step: seed docs → nearest lexical neighbors).

    Exactness chain (bit-identical on any engine, no flake budget):

    * idf is the rational keyword_tfidf form ``(N−df+0.5)/(df+0.5)``
      — one correctly-rounded division — FIXED-POINT QUANTIZED with
      ``FLOOR(2^bits·idf)``: flooring a deterministic double is
      deterministic (nothing transcendental anywhere);
    * term weights ``w = tf·q_idf``, dots and squared norms are then
      exact BIGINT sums under any order;
    * ``cosine = dot / (sqrt(n_a)·sqrt(n_q))`` — sqrt IS an IEEE-754
      basic operation (correctly rounded everywhere, unlike ln/exp),
      so the three float ops produce identical doubles and the
      ORDER BY cosine LIMIT k is cross-engine stable (ties then break
      on id).

    Scale shape: the query vector (≤ vocab rows) and df table
    broadcast; the corpus is touched by one explode + one (doc, term)
    aggregate + one doc-keyed dot aggregate — all linear, no
    corpus×corpus pair generation (an all-pairs variant is
    intentionally absent: on a corpus where every term is near-
    ubiquitous every pair is a candidate, so exact all-pairs cosine
    is Ω(n²) regardless of indexing — seed-anchored retrieval is the
    shape that survives 100 TB).

    Output: (id, n_shared, dot, norm2, cosine), cosine desc.
    """
    from pyspark import StorageLevel

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.select(F.count(F.lit(1)).alias("n_docs"))
    q_idf = F.floor(
        F.lit(float(1 << idf_bits))
        * (
            (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
            / (F.col("df").cast("double") + F.lit(0.5))
        )
    ).cast("long")
    weights = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select("id", "term", (F.col("tf") * q_idf).alias("w"))
        # weights feed the query vector, the norms, and the dot join —
        # pin the corpus-scale subtree (round-5 lesson d); callers
        # compose via spark.catalog.clearCache() when done
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    qvec = weights.filter(F.col("id") == query_id).select(
        F.col("term"), F.col("w").alias("qw")
    )
    norms = weights.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("norm2")
    )
    qnorm = norms.filter(F.col("id") == query_id).select(
        F.col("norm2").alias("qnorm2")
    )
    dots = (
        weights.filter(F.col("id") != query_id)
        .join(F.broadcast(qvec), "term")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.sum(F.col("w") * F.col("qw")).cast("long").alias("dot"),
        )
    )
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("norm2").cast("double")) * F.sqrt(F.col("qnorm2").cast("double"))
    )
    return (
        dots.join(norms, "id")
        .crossJoin(F.broadcast(qnorm))
        .select("id", "n_shared", "dot", "norm2", cosine.alias("cosine"))
        .orderBy(F.desc("cosine"), "id")
        .limit(k)
    )
