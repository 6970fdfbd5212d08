"""Round-4b operator tests: token-budget mixing, padding audit,
autocorrelation differential, CCNet tier partitioning."""

import math

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _rows(spark, name, sf=SF):
    return entry_mod.queries()[name](spark, sf).collect()


def test_token_budget_min_source_keeps_everything(spark):
    """The uniform token target means the smallest source's keep rule is
    draw*min < min*2^32 — always true: it must keep every doc/token."""
    out = {r.source: r for r in _rows(spark, "token_budget_mixture")}
    assert out, "no sources"
    min_src = min(out.values(), key=lambda r: r.tok_total)
    assert min_src.docs_kept == min_src.n_docs
    assert min_src.tokens_kept == min_src.tok_total
    for r in out.values():
        assert 0 <= r.docs_kept <= r.n_docs
        assert 0 <= r.tokens_kept <= r.tok_total


def test_token_budget_flattens_token_mixture(spark):
    """Every source's kept token mass should land near the min-source
    budget (expected value = min_tok; md5 draws are uniform)."""
    out = _rows(spark, "token_budget_mixture")
    budget = min(r.tok_total for r in out)
    for r in out:
        assert r.tokens_kept < 3 * budget, (r.source, r.tokens_kept, budget)


def test_padding_sorted_never_worse_than_random(spark):
    out = {r.strategy: r for r in _rows(spark, "padding_efficiency")}
    assert set(out) == {"random", "length_sorted"}
    a, b = out["random"], out["length_sorted"]
    # both strategies batch the same corpus
    assert a.tokens_real == b.tokens_real
    assert a.n_batches == b.n_batches
    # padding is real waste, and sorting strictly reduces it on any
    # corpus with length variance inside a shard
    assert a.tokens_padded >= a.tokens_real
    assert b.tokens_padded >= b.tokens_real
    assert b.tokens_padded < a.tokens_padded


def test_daily_autocorr_matches_numpy(spark):
    """Differential: the exact-integer-sum Pearson assembly equals
    numpy's corrcoef on the same daily series."""
    import numpy as np
    from pyspark.sql import functions as F

    from ffi_etl_spark.catalog import table

    daily = (
        table(spark, SF, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("day")
        .collect()
    )
    series = {r.day: r.cnt for r in daily}
    got = {r.lag: (r.n_pairs, float(r.autocorr)) for r in _rows(spark, "daily_autocorr")}
    for lag in (1, 7):
        from datetime import timedelta

        pairs = [
            (c, series[d + timedelta(days=lag)])
            for d, c in series.items()
            if d + timedelta(days=lag) in series
        ]
        n_pairs, ac = got[lag]
        assert n_pairs == len(pairs)
        expect = float(np.corrcoef([p[0] for p in pairs], [p[1] for p in pairs])[0, 1])
        assert math.isclose(ac, expect, rel_tol=1e-5, abs_tol=1e-5), (lag, ac, expect)


def test_ccnet_tiers_partition_each_language(spark):
    """Tiers partition every language's docs and chars exactly, and the
    tertile construction puts roughly a third in each tier."""
    from pyspark.sql import functions as F

    from ffi_etl_spark.catalog import table

    totals = {
        r.lang: (r.n, r.chars)
        for r in table(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    out = _rows(spark, "ccnet_quality_tiers")
    by_lang: dict[str, dict[str, int]] = {}
    chars_by_lang: dict[str, int] = {}
    for r in out:
        assert r.tier in ("head", "middle", "tail")
        by_lang.setdefault(r.lang, {})[r.tier] = r.n_docs
        chars_by_lang[r.lang] = chars_by_lang.get(r.lang, 0) + r.chars_total
    for lang, (n, chars) in totals.items():
        assert sum(by_lang[lang].values()) == n
        assert chars_by_lang[lang] == chars
        # interpolated tertiles: no tier can exceed ~2/3 of the corpus
        # unless the score distribution is degenerate at the cutpoint
        assert max(by_lang[lang].values()) <= n


def test_vocab_coverage_accounting(spark):
    """OOV + in-vocab must account for every whitespace token in the
    corpus, and a 1000-term vocab over a 20-source synthetic corpus
    must cover the bulk of token mass."""
    from pyspark.sql import functions as F

    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.functions.textstats import ws_token_count

    out = _rows(spark, "vocab_coverage")
    total = sum(r.total_tokens for r in out)
    corpus_total = (
        table(spark, SF, "documents")
        .agg(F.sum(ws_token_count(F.col("text")).cast("long")))
        .collect()[0][0]
    )
    assert total == corpus_total
    oov = sum(r.oov_tokens for r in out)
    assert 0 <= oov < total / 2  # the top-1000 vocab covers most mass
    for r in out:
        assert 0 <= r.oov_tokens <= r.total_tokens


def test_rfm_quintiles_are_balanced_and_exact(spark):
    from pyspark.sql import functions as F

    from ffi_etl_spark.catalog import table

    out = _rows(spark, "rfm_features")
    n = len(out)
    assert n == table(spark, SF, "events").select("user_id").distinct().count()
    for col in ("r_q", "f_q", "m_q"):
        sizes = {}
        for r in out:
            sizes[r[col]] = sizes.get(r[col], 0) + 1
        assert set(sizes) == {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile contract
    # monetary matches an independent exact-decimal sum
    want = {
        r.user_id: float(r.m)
        for r in table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("m"))
        .collect()
    }
    for r in out:
        assert r.monetary == want[r.user_id]
        assert r.recency_days >= 0 and r.frequency > 0


def test_lang_confusion_is_consistent_with_lang_id(spark):
    """The confusion matrix must be exactly the (lang, lang_pred)
    contingency of the lang_id query joined back to declared tags."""
    from pyspark.sql import functions as F

    from ffi_etl_spark.catalog import table

    out = {(r.lang, r.lang_pred): r.n_docs for r in _rows(spark, "lang_confusion")}
    docs = table(spark, SF, "documents").select("doc_id", "lang")
    pred = entry_mod.queries()["lang_id"](spark, SF)
    want = {
        (r.lang, r.lang_pred): r.n
        for r in docs.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == want
    assert sum(out.values()) == docs.count()


def test_daily_autocorr_degenerate_series_is_null(spark, tmp_path):
    """A constant daily series has zero variance at every lag: the
    autocorr must be NULL (not an engine-spelled NaN string)."""
    from datetime import datetime

    d = str(tmp_path / "const_events")
    rows = [
        (day * 10 + i, datetime(2024, 1, 1 + day, 12, 0, 0), 1, "view", 1.0, "{}")
        for day in range(10)
        for i in range(3)  # exactly 3 events every day
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(d + "/events.parquet")
    out = {r.lag: r for r in entry_mod.queries()["daily_autocorr"](spark, d).collect()}
    assert out[1].n_pairs == 9 and out[7].n_pairs == 3
    assert out[1].autocorr is None and out[7].autocorr is None


def test_check_constraints_counts_planted_violations(spark):
    from ffi_etl_spark.operators.constraints import Rule, check_constraints

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    df = spark.createDataFrame(
        [
            # id, fkey, status, score, code
            (1, 1, "ok", 10, "A1"),
            (1, 2, "ok", 20, "B2"),        # dup id
            (2, None, "ok", 30, "C3"),     # null fkey: not a FK violation
            (3, 9, "bad", -5, "zz"),       # fk orphan + bad status + range + regex
            (None, 1, "ok", 200, "D4"),    # null id (not counted by unique) + range
            (4, 1, "ok", 50, "xxA1xx"),    # CONTAINS a match: full-match must flag
            (5, 2, "ok", None, "E5"),      # null score: not-null + predicate(NULL)
        ],
        "id long, fkey long, status string, score long, code string",
    )
    rules = [
        Rule("fk", "fk", col="fkey", parent=parent, parent_key="pk"),
        Rule("id_unique", "unique", col="id"),
        Rule("range_0_100", "range", col="score", lo=0, hi=100),
        # deliberately UNanchored: the regex kind's contract is full match
        Rule("regex_code", "regex", col="code", pattern="[A-Z][0-9]"),
        Rule("status_ok", "in_set", col="status", values=("ok",)),
        Rule("score_not_null", "not_null", col="score"),
        # NULL-evaluating predicate counts as a violation (explicit policy)
        Rule("positive", "predicate", expr="score > 0"),
    ]
    out = {r.rule: (r.n_checked, r.n_violations) for r in
           check_constraints(df, rules).collect()}
    assert out == {
        "fk": (7, 1),
        "id_unique": (7, 1),
        "range_0_100": (7, 2),
        "regex_code": (7, 2),
        "status_ok": (7, 1),
        "score_not_null": (7, 1),
        "positive": (7, 2),
    }


def test_constraint_audit_is_single_scan(spark):
    """The suite contract: one pass over the audited table — lineitem
    appears ONCE in the plan (orders contributes the broadcast key
    set), and no join besides the broadcast fk probes."""
    q = entry_mod.queries()["constraint_audit"](spark, SF)
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # formatted mode prints each scan node twice (tree + details):
    # 4 occurrences == 2 actual scans — lineitem once + orders keys once
    assert plan.count("Scan parquet") == 4
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_split_leakage_flags_planted_cross_split_copy(spark, tmp_path):
    """Plant a val doc that copies a train doc's text (>=8 shared
    tokens) and a val doc of unique text: exactly one leaky val doc."""
    import hashlib

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10

    train_ids = [i for i in range(200) if bucket(i) < 8]
    val_ids = [i for i in range(200) if bucket(i) == 8]
    assert len(train_ids) >= 1 and len(val_ids) >= 2
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(train_ids[0], shared, "en", "s", len(shared))]
    rows.append((val_ids[0], shared + " extra tail words here", "en", "s", 10))
    uniq = "one unique sentence that appears nowhere else in this corpus"
    rows.append((val_ids[1], uniq, "en", "s", len(uniq)))
    d = str(tmp_path / "leak")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    out = {r.split: r for r in
           entry_mod.queries()["split_leakage_audit"](spark, d).collect()}
    assert out["val"].n_docs == 2
    assert out["val"].n_leaky_docs == 1
    assert out["val"].n_shared_grams >= 3  # the 10-token overlap spans 3 8-grams


def test_corr_matrix_matches_numpy(spark):
    """Differential: the exact-integer-cents Pearson equals numpy's
    corrcoef over the same columns; diagonal-free, 6 pairs, |r|<=1."""
    import numpy as np

    from ffi_etl_spark.catalog import table

    cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    pdf = table(spark, SF, "lineitem").select(*cols).toPandas()
    want = np.corrcoef(np.round(pdf.to_numpy() * 100).T)
    idx = {c: i for i, c in enumerate(cols)}
    out = _rows(spark, "corr_matrix")
    assert len(out) == 6
    for r in out:
        got = float(r.corr)
        assert abs(got) <= 1.0
        assert math.isclose(
            got, float(want[idx[r.col_x], idx[r.col_y]]), rel_tol=1e-5, abs_tol=1e-6
        ), (r.col_x, r.col_y)


def test_mixture_curriculum_monotone_anneal(spark):
    """Keep counts shrink monotonically as alpha rises (0 -> 1/4 ->
    1/2 -> 1): each later epoch's threshold is <= the previous for
    every source, and epoch 0 keeps everything."""
    out = _rows(spark, "mixture_curriculum")
    by_source: dict[str, dict[int, tuple[int, int]]] = {}
    for r in out:
        by_source.setdefault(r.source, {})[r.epoch] = (r.n_total, r.n_kept)
    assert by_source
    for source, epochs in by_source.items():
        assert set(epochs) == {0, 1, 2, 3}
        n_total = epochs[0][0]
        assert epochs[0][1] == n_total  # alpha=0 keeps the natural mixture
        kept = [epochs[e][1] for e in range(4)]
        assert kept == sorted(kept, reverse=True), (source, kept)
    # the min source survives (near-)fully even at alpha=1
    min_source = min(by_source, key=lambda s: by_source[s][0][0])
    n, k = by_source[min_source][3]
    assert k >= n - 1  # floor() may shave one draw at threshold 2^32


def test_dedup_semantic_subset_and_exact_recall(spark):
    """Differentials for the SemDeDup tier: (1) every reported pair
    really has cosine >= 1-eps (subset of the brute-force pair set);
    (2) planted EXACT duplicate vectors are always caught (identical
    vectors share a deterministic cluster assignment)."""
    import itertools

    import numpy as np

    from ffi_etl_spark.catalog import table
    from ffi_etl_spark.operators.similarity import dedup_semantic

    base = table(spark, SF, "embeddings").limit(40).collect()
    rows = [(r.vec_id, list(r.embedding)) for r in base]
    # plant an exact duplicate pair far outside the real id range
    rows.append((100001, rows[0][1]))
    rows.append((100002, rows[0][1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in dedup_semantic(df, k=4, n_iter=2, min_sim=0.85).collect()
    }
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    def cos(x, y):
        return float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)))
    brute = {
        (i, j)
        for i, j in itertools.combinations(sorted(vecs), 2)
        if cos(vecs[i], vecs[j]) >= 0.85
    }
    assert set(got) <= brute                      # no false pairs
    assert (100001, 100002) in got                # exact dups always caught
    assert abs(got[(100001, 100002)] - 1.0) < 1e-6
    assert (rows[0][0], 100001) in got            # original pairs with its copies


def test_doc_lm_fluency_matches_python_lm(spark):
    """Differential: the Spark bigram-LM score equals a plain-Python
    LM trained on the same corpus (counts + mean log prob)."""
    from collections import Counter

    from ffi_etl_spark.catalog import table

    docs = [(r.doc_id, (r.text or "").lower().strip())
            for r in table(spark, SF, "documents").collect()]

    def bigrams(text):
        toks = [t for t in __import__("re").split(r"\s+", text)]
        if len(toks) < 2:
            return [" ".join(toks)]  # word_ngrams pads to one pseudo-gram
        return [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    cb = Counter()
    for _, t in docs:
        cb.update(bigrams(t))
    cp = Counter()
    for g, c in cb.items():
        cp[g.split(" ")[0]] += c
    got = {r.doc_id: (r.n_bigrams, float(r.avg_logp))
           for r in _rows(spark, "doc_lm_fluency")}
    assert set(got) == {i for i, _ in docs}
    for doc_id, text in docs[:100]:
        bgs = bigrams(text)
        want = sum(math.log(cb[g]) - math.log(cp[g.split(" ")[0]]) for g in bgs) / len(bgs)
        n, score = got[doc_id]
        assert n == len(bgs)
        assert math.isclose(score, want, rel_tol=1e-5, abs_tol=1e-9), (doc_id, score, want)
        assert score <= 0.0


def test_l_diversity_flags_homogeneous_group(spark, tmp_path):
    """Plant a homogeneous QI group (every order shares one priority):
    it must report l_diverse=0 while a mixed group reports 1."""
    d = str(tmp_path / "ldiv")
    cust = [(1, "n1", 10, "A"), (2, "n2", 10, "B"), (3, "n3", 20, "B")]
    spark.createDataFrame(
        [(i, n, nk, seg, "addr", "ph", 0.0, "c") for i, n, nk, seg in cust],
        "c_custkey long, c_name string, c_nationkey long, c_mktsegment string,"
        "c_address string, c_phone string, c_acctbal double, c_comment string",
    ).write.mode("overwrite").parquet(d + "/customer.parquet")
    orders = [(i, 1, "1-URGENT") for i in range(5)]           # homogeneous
    orders += [(10 + i, 2, p) for i, p in enumerate(["1-URGENT", "2-HIGH", "3-MEDIUM"])]
    orders += [(20 + i, 3, p) for i, p in enumerate(["1-URGENT", "2-HIGH"])]
    spark.createDataFrame(
        [(oid, ck, "O", 1.0, "2024-01-01", p, "clerk", 0, "c") for oid, ck, p in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
        "o_orderdate string, o_orderpriority string, o_clerk string,"
        "o_shippriority long, o_comment string",
    ).write.mode("overwrite").parquet(d + "/orders.parquet")
    out = {(r.c_mktsegment, r.c_nationkey): (r.n_sensitive, r.l_diverse)
           for r in entry_mod.queries()["l_diversity_audit"](spark, d).collect()}
    assert out[("A", 10)] == (1, 0)   # homogeneous: flagged
    assert out[("B", 10)] == (3, 1)   # diverse
    assert out[("B", 20)] == (2, 0)   # below l=3


def test_join_cardinality_probe_identity(spark):
    """The per-key product sum must equal the materialized join size,
    and max_key_pairs bounds every key's contribution."""
    r = _rows(spark, "join_cardinality_probe")[0]
    assert r.est_join_rows == r.actual_join_rows > 0
    assert 0 < r.max_key_pairs <= r.est_join_rows
    assert r.n_join_keys > 0
