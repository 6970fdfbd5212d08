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
