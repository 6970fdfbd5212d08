"""Round-5 operator tests: exact-substring span scrub."""

from __future__ import annotations

from pyspark.sql import functions as F

from ffi_etl_spark.operators.textops import dup_span_profile, scrub_dup_spans


def _tok(s: str) -> list[str]:
    return s.strip().split()


SHARED = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens


def _planted(spark):
    rows = [
        # doc 1: canonical holder of the shared span (min doc_id)
        (1, f"one two three {SHARED} four five six seven eight nine ten eleven"),
        # doc 2: same span embedded in different context -> scrubbed here
        (2, f"red orange yellow green {SHARED} blue indigo violet pink brown black white"),
        # doc 3: within-doc-only repeat of an 8-token run -> untouched
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 mid w1 w2 w3 w4 w5 w6 w7 w8"),
        # doc 4: short doc, no overlap
        (4, "tiny little doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_removes_noncanonical_span(spark):
    df = _planted(spark)
    out = {r["doc_id"]: r for r in scrub_dup_spans(df, n=8).collect()}

    # doc 1 keeps everything (canonical occurrences live here)
    assert out[1]["n_removed"] == 0
    # doc 2 loses exactly the shared windows' token union: gram starts
    # 5..7 in doc2? no — every 8-gram fully inside the shared span is
    # duplicated; their covered union is the 10 shared tokens plus no
    # context tokens (context differs between docs)
    assert out[2]["n_removed"] == 10
    # within-doc-only repetition is not cross-doc: untouched
    assert out[3]["n_removed"] == 0
    assert out[4]["n_removed"] == 0

    # token counts are the pre-scrub sizes
    assert out[2]["n_tokens"] == len(_tok(f"red orange yellow green {SHARED} blue indigo violet pink brown black white"))


def test_scrub_rebuild_matches_manual(spark):
    import hashlib

    df = _planted(spark)
    out = {r["doc_id"]: r for r in scrub_dup_spans(df, n=8).collect()}
    doc2 = _tok(f"red orange yellow green {SHARED} blue indigo violet pink brown black white")
    shared = set(_tok(SHARED))
    kept = [t for t in doc2 if t not in shared]
    want = hashlib.md5(" ".join(kept).encode()).hexdigest()
    assert out[2]["scrubbed_md5"] == want
    # untouched docs hash to their whitespace-normalized selves
    want3 = hashlib.md5(
        "w1 w2 w3 w4 w5 w6 w7 w8 mid w1 w2 w3 w4 w5 w6 w7 w8".encode()
    ).hexdigest()
    assert out[3]["scrubbed_md5"] == want3


def test_scrub_leaves_no_residual_crossdoc_grams(spark):
    """The Lee-et-al invariant: after scrubbing, re-profiling the
    rebuilt corpus finds zero cross-doc duplicated 8-grams (seam-grams
    across removal joints are the only theoretical leftovers; none
    arise on this corpus)."""
    rows = [
        (1, f"one two three {SHARED} four five six seven eight"),
        (2, f"red orange yellow green {SHARED} blue indigo violet pink"),
        (3, f"aa bb cc dd {SHARED} ee ff gg hh ii jj"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # rebuild the scrubbed corpus (same construction as the operator's
    # internal rebuild, surfaced as text for re-profiling)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = df.select("doc_id", toks.alias("_toks"))
    out = scrub_dup_spans(df, n=8)

    # scrub kept doc1's span only; docs 2 and 3 each lose the 10 tokens
    got = {r["doc_id"]: r["n_removed"] for r in out.collect()}
    assert got == {1: 0, 2: 10, 3: 10}

    # reconstruct texts manually and re-profile
    shared = set(_tok(SHARED))
    rebuilt_rows = []
    for doc_id, text in rows:
        if doc_id == 1:
            rebuilt_rows.append((doc_id, text.strip()))
        else:
            rebuilt_rows.append(
                (doc_id, " ".join(t for t in _tok(text) if t not in shared))
            )
    rebuilt = spark.createDataFrame(rebuilt_rows, "doc_id long, text string")
    prof = dup_span_profile(rebuilt, n=8)
    assert prof.agg(F.sum("n_dup_grams")).collect()[0][0] == 0


def test_rrf_fuse_combines_lists(spark):
    from ffi_etl_spark.operators.textops import rrf_fuse

    lex = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rank int")
    sem = spark.createDataFrame([(11, 1), (13, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse([lex, sem], rrf_k=60, k=10).collect()}
    # doc 11 appears in both lists -> two contributions
    assert abs(out[11]["rrf"] - (1 / 62 + 1 / 61)) < 1e-15
    # single-list docs get one contribution, absent rank is NULL
    assert abs(out[10]["rrf"] - 1 / 61) < 1e-15
    assert out[10]["rank_1"] is None
    assert abs(out[13]["rrf"] - 1 / 62) < 1e-15
    assert out[13]["rank_0"] is None
    # both-list doc outranks every single-list doc here
    top = sorted(out.values(), key=lambda r: (-r["rrf"], r["doc_id"]))[0]
    assert top["doc_id"] == 11


def test_rrf_fuse_requires_input(spark):
    import pytest

    from ffi_etl_spark.operators.textops import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_dsir_importance_separates_domains(spark):
    """Docs made of target-only vocabulary must outweigh docs of
    source-only vocabulary; weight_q is the exact integer form of the
    float weight."""
    from ffi_etl_spark.operators.textops import dsir_importance

    tgt_text = "alpha beta gamma delta " * 10
    src_text = "omega psi chi phi " * 10
    rows = (
        [(i, tgt_text, True) for i in range(10)]
        + [(100 + i, src_text, False) for i in range(10)]
        # held-out docs, one per vocabulary
        + [(500, tgt_text, False), (501, src_text, False)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    out = {r["doc_id"]: r for r in dsir_importance(df, F.col("is_tgt")).collect()}
    # in-domain vocabulary scores above out-of-domain
    assert out[500]["weight"] > out[501]["weight"]
    assert out[500]["weight"] > 0 > out[501]["weight"]
    # fixed-point contract: weight == weight_q / 2^20 exactly
    for r in out.values():
        assert r["weight"] == r["weight_q"] / (1 << 20)


def test_woe_encode_matches_manual(spark):
    import math

    from ffi_etl_spark.operators.features import woe_encode

    rows = [("a", True)] * 8 + [("a", False)] * 2 + [("b", True)] * 2 + [("b", False)] * 8
    df = spark.createDataFrame(rows, "cat string, y boolean")
    out = {r["category"]: r for r in woe_encode(df, "cat", "y").collect()}
    G, B = 10, 10
    for cat, (g, b) in {"a": (8, 2), "b": (2, 8)}.items():
        woe = math.log(((g + 0.5) / G) / ((b + 0.5) / B))
        assert out[cat]["woe_q"] == math.floor((1 << 20) * woe)
        assert out[cat]["n_good"] == g and out[cat]["n_bad"] == b
    # the predictive category has positive WOE, the other negative,
    # and both IV contributions are positive (|separation| > 0)
    assert out["a"]["woe_q"] > 0 > out["b"]["woe_q"]
    assert out["a"]["iv_q"] > 0 and out["b"]["iv_q"] > 0


def test_woe_encode_null_label_counts_negative(spark):
    from ffi_etl_spark.operators.features import woe_encode

    df = spark.createDataFrame(
        [("a", True), ("a", None), ("b", False)], "cat string, y boolean"
    )
    out = {r["category"]: r for r in woe_encode(df, "cat", "y").collect()}
    assert (out["a"]["n_good"], out["a"]["n_bad"]) == (1, 1)
    assert (out["b"]["n_good"], out["b"]["n_bad"]) == (0, 1)


def test_scrub_repeated_spans_within_doc(spark):
    import hashlib

    from ffi_etl_spark.operators.textops import scrub_repeated_spans

    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    rows = [
        # span repeats later in the SAME doc -> second occurrence scrubbed
        (1, f"{span} mid1 mid2 {span} tail"),
        # unique content untouched
        (2, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_repeated_spans(df, n=8).collect()}
    assert out[1]["n_removed"] == 8
    kept = f"{span} mid1 mid2 tail"
    assert out[1]["scrubbed_text"] == kept
    assert out[1]["scrubbed_md5"] == hashlib.md5(kept.encode()).hexdigest()
    assert out[2]["n_removed"] == 0


def test_scrub_repeated_spans_ignores_crossdoc(spark):
    from ffi_etl_spark.operators.textops import scrub_repeated_spans

    span = "c1 c2 c3 c4 c5 c6 c7 c8"
    rows = [(1, f"a {span}"), (2, f"b {span}")]  # cross-doc only
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_removed"] for r in scrub_repeated_spans(df, n=8).collect()}
    assert out == {1: 0, 2: 0}


def _py_bpe(word_freqs: dict, n_merges: int):
    """Pure-Python replica of the BPE merge-learning contract."""
    state = {w: [*w, "</w>"] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + word_freqs[w]
                )
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        for w, syms in state.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            state[w] = out
    return merges


def test_bpe_learn_merges_matches_python(spark):
    from ffi_etl_spark.operators.tokenizer import bpe_learn_merges

    corpus = ["low low low lower lowest", "new newer newest low", "wide wider new"]
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wf = {}
    for t in corpus:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    want = _py_bpe(wf, 5)
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_learn_merges(df, n_merges=5).collect()
    ]
    assert got == want
    spark.catalog.clearCache()


def test_bpe_greedy_self_pair_run(spark):
    """aaaa: greedy left-to-right merges offsets 0 and 2."""
    from ffi_etl_spark.operators.tokenizer import bpe_learn_merges

    df = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    out = bpe_learn_merges(df, n_merges=2).collect()
    # round 1: (a, a) count = 3 adjacencies x 2 occurrences = 6
    assert (out[0]["left_sym"], out[0]["right_sym"], out[0]["pair_count"]) == ("a", "a", 6)
    # after greedy merge the word is [aa, aa, </w>]: round 2 has
    # (aa, aa) and (aa, </w>) TIED at count 2 — the lexicographic
    # tie-break picks (aa, </w>) ('<' sorts before 'a')
    assert (out[1]["left_sym"], out[1]["right_sym"], out[1]["pair_count"]) == ("aa", "</w>", 2)
    spark.catalog.clearCache()


def test_bpe_encode_matches_python(spark):
    from ffi_etl_spark.operators.tokenizer import bpe_encode, bpe_learn_merges

    corpus = ["low low lower lowest", "new newer newest low wide"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    wf = {}
    for t in corpus:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    merges = _py_bpe(wf, 4)

    def encode_word(w):
        syms = [*w, "</w>"]
        for a, b, _ in merges:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return syms

    import hashlib

    got = {
        r["doc_id"]: r
        for r in bpe_encode(
            df, bpe_learn_merges(df, n_merges=4), n_merges=4
        ).collect()
    }
    for i, t in enumerate(corpus):
        stream = [s for w in t.split() for s in encode_word(w)]
        assert got[i]["n_bpe_tokens"] == len(stream)
        assert got[i]["tokens_md5"] == hashlib.md5(" ".join(stream).encode()).hexdigest()
    spark.catalog.clearCache()


def test_bpe_encode_empty_doc(spark):
    import hashlib

    from ffi_etl_spark.operators.tokenizer import bpe_encode, bpe_learn_merges

    df = spark.createDataFrame([(0, "ab ab"), (1, "   ")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in bpe_encode(df, bpe_learn_merges(df, n_merges=2), n_merges=2).collect()}
    assert out[1]["n_bpe_tokens"] == 0
    assert out[1]["tokens_md5"] == hashlib.md5(b"").hexdigest()


def test_bpe_encode_rejects_rule_count_mismatch(spark):
    """n_merges beyond the merge table's rows previously made the
    extra unrolled rounds silent no-ops via element_at NULLs — a wrong
    tokenization with no error (ADVICE r05). The packed-rules guard
    must now raise instead."""
    import pytest as _pytest

    from ffi_etl_spark.operators.tokenizer import bpe_encode, bpe_learn_merges

    df = spark.createDataFrame([(0, "ab ab ac")], "doc_id long, text string")
    rules = bpe_learn_merges(df, n_merges=3)
    with _pytest.raises(Exception, match="rules but n_merges"):
        bpe_encode(df, rules, n_merges=5).collect()
    with _pytest.raises(Exception, match="rules but n_merges"):
        bpe_encode(df, rules.limit(2), n_merges=3).collect()
    # exact match still encodes
    assert bpe_encode(df, rules, n_merges=3).count() == 1


def test_quantile_summary_answers_within_band(spark):
    """Planted uniform data: the summary answer's TRUE rank must sit
    within k*(S-1) + k (estimate error + sample spacing) of the
    target; exact-rank arithmetic throughout."""
    from ffi_etl_spark.operators.sketches import (
        quantile_summary,
        quantile_summary_query,
    )

    n, k, shards = 5000, 16, 4
    df = spark.createDataFrame(
        [(i, float((i * 37) % n)) for i in range(n)], "event_id long, value double"
    )
    summ = quantile_summary(df, n_shards=shards, k=k)
    # summary is every k-th rank + shard maxima
    assert summ.count() <= n // k + shards + shards
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n"))
    res = quantile_summary_query(summ, total, [0.5, 0.9], k=k)
    for r in res.collect():
        true_rank = df.where(
            (F.col("value") < r["est_value"])
            | ((F.col("value") == r["est_value"]) & (F.col("event_id") <= r["est_id"]))
        ).count()
        assert abs(true_rank - r["target_rank"]) <= k * shards


def test_tree_ensemble_scoring_matches_python(spark):
    from ffi_etl_spark.operators.inference import score_ensemble

    tree = {
        "feature": "x", "threshold": 5.0,
        "left": {"value": -1.0},
        "right": {"feature": "y", "threshold": 2.0,
                  "left": {"value": 0.5}, "right": {"value": 2.0}},
    }
    tree2 = {"feature": "y", "threshold": 0.0,
             "left": {"value": 0.25}, "right": {"value": -0.25}}

    def py_score(x, y):
        t1 = -1.0 if (x is not None and x <= 5.0) else (0.5 if (y is not None and y <= 2.0) else 2.0)
        t2 = 0.25 if (y is not None and y <= 0.0) else -0.25
        return t1 + t2

    rows = [(0, 1.0, 3.0), (1, 9.0, 1.0), (2, 9.0, 9.0), (3, None, -1.0)]
    df = spark.createDataFrame(rows, "event_id long, x double, y double")
    out = {r["event_id"]: r for r in score_ensemble(df, [tree, tree2]).collect()}
    for eid, x, y in rows:
        want = py_score(x, y)
        assert out[eid]["margin"] == want
        assert out[eid]["predicted"] == int(want > 0.0)
    # NULL feature routes RIGHT: doc'd contract
    assert out[3]["margin"] == py_score(None, -1.0)


def test_tree_ensemble_requires_trees(spark):
    import pytest

    from ffi_etl_spark.operators.inference import score_ensemble

    df = spark.createDataFrame([(0, 1.0)], "event_id long, x double")
    with pytest.raises(ValueError):
        score_ensemble(df, [])


def test_auc_exact_matches_sklearnless_reference(spark):
    """Hand-checkable AUC cases: perfect ranking, random-ish ties,
    inverted ranking."""
    from ffi_etl_spark.operators.inference import auc_exact

    def run(rows):
        df = spark.createDataFrame(rows, "event_id long, margin double, label boolean")
        return auc_exact(df).collect()[0]

    # perfect separation -> AUC 1
    r = run([(i, float(i), i >= 5) for i in range(10)])
    assert r["auc"] == 1.0
    # inverted -> AUC 0
    r = run([(i, float(-i), i >= 5) for i in range(10)])
    assert r["auc"] == 0.0
    # all scores tied -> AUC exactly 0.5 (tie-averaged ranks)
    r = run([(i, 1.0, i % 2 == 0) for i in range(10)])
    assert r["auc"] == 0.5
    # mixed case vs direct pair counting: AUC = (wins + 0.5*ties)/pairs
    rows = [(0, 0.1, False), (1, 0.4, True), (2, 0.4, False), (3, 0.9, True), (4, 0.2, False)]
    r = run(rows)
    pos = [m for _, m, y in rows if y]
    neg = [m for _, m, y in rows if not y]
    want = sum(1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg) / (len(pos) * len(neg))
    assert r["auc"] == want
    # single-class input -> NULL auc (documented undefined case)
    r = run([(i, float(i), True) for i in range(4)])
    assert r["auc"] is None
