"""Query registry: named (spark, sf_dir) -> DataFrame callables + DuckDB oracles.

Every operator from SURVEY.md §2 (and every extension operator) is
exposed here twice: as an idiomatic-Spark callable and as the ANSI SQL
a DuckDB oracle runs on the same parquet tables. Column names are
aliased identically on both sides (the driver hash-compares values
after sorting columns by name).

Registration idiom::

    @query("name", oracle=\"\"\"SELECT ...\"\"\")
    def _(spark, sf_dir): ...

Queries whose semantics are not SQL-expressible register with
``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} — a silent overwrite "
                "would shadow one implementation's gate with another's"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from ffi_etl_spark.queries_pkg import (  # noqa: E402,F401
    reference_surface,
    extensions,
    olap_spines,
    olap_spines2,
    breadth,
    profiling,
    behavioral,
    datamix,
    audit,
    round4,
    analytics,
    round4b,
    round4c,
    round5,
    round5b,
    round6,
)

# The driver's correctness gate grades a bounded prefix of the registry
# (exactly the first 50 registered queries). Registration order is
# therefore a grading decision; `tools/rotation.py` machine-derives the
# graded/green/never-graded sets from CORRECTNESS_r*.json and proposes
# the next prefix (VERDICT r04 item 6 — no more hand-counted TODO
# lists). Round-5 rotation = 5 continuity canaries + the 6 latest-red
# rows (the 4 rows-only reds, all upgraded to full oracles this round,
# plus the token_entropy / pagerank_centrality oracle-upgrade
# re-grades) + the 38 never-graded round-4b/4c-era registrations +
# the 1 round-5 addition = exactly 50. If all grade green, EVERY
# registered query has a green driver row across rounds and the
# coverage claim is proven, not asserted.
PRIORITY_PREFIX: tuple[str, ...] = (
    # -- canaries: green every prior round, kept for continuity --
    "survey_pipeline",
    "census_merge",
    "dedup_minhash",
    "tpch_q1",
    "pretraining_corpus",
    # -- round-5/5b additions, never driver-graded (rotation.py
    # order; VERDICT r05 item 1: clear the grading debt). The one
    # overflow query, seasonal_dow_index, heads round 7's window. --
    "hybrid_rrf_fusion",
    "dsir_importance",
    "woe_iv_encoding",
    "repetition_span_scrub",
    "bpe_learn_merges",
    "bpe_encode_corpus",
    "quantile_summary_merge",
    "tree_ensemble_score",
    "model_auc_exact",
    "model_classification_report",
    "nb_lang_train_score",
    "hll_distinct_sketch",
    "model_calibration_bins",
    "unigram_lm_segment",
    "quantile_summary_compact",
    "model_isotonic_calibration",
    "sparse_cosine_mlt",
    "entity_resolution_golden",
    "forecast_backtest_wape",
    "daily_trend_ols",
    "bloom_filter_audit",
    "conversion_wilson_ci",
    "chi2_independence",
    "incremental_join_maintenance",
    "mmr_diverse_topk",
    "cv_auc_folds",
    "feature_drift_psi",
    "train_decision_stump",
    "contrastive_negatives",
    "ppmi_associations",
    "zipf_exponent_fit",
    "unigram_em_refit",
    "leakage_safe_split",
    "multimodal_phash_sigs",
    "asof_forward_next_purchase",
    "gdpr_forget_apply",
    "calendar_dim",
    "incremental_agg_retractions",
    "ks_two_sample",
    "resample_interpolate",
    "ab_srm_check",
    "conversion_time_quantiles",
    "rolling_distinct_hll",
    "dsir_budget_selection",
    "rolling_ols_trend",
)


def _apply_priority() -> None:
    ordered = [n for n in PRIORITY_PREFIX if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for reg in (QUERIES, ORACLES):
        snap = dict(reg)
        reg.clear()
        reg.update({n: snap[n] for n in ordered if n in snap})


_apply_priority()
