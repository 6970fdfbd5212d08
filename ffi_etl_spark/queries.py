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
    fam_modeleval,
    fam_sketches,
    fam_textsel,
    fam_retrieval_events,
    round6,
    round7,
    round8,
    round9,
)

# The driver's correctness gate grades a bounded prefix of the registry
# (exactly the first 50 registered queries). Registration order is
# therefore a grading decision; `tools/rotation.py` machine-derives the
# graded/green/never-graded sets from CORRECTNESS_r*.json and proposes
# the next prefix (VERDICT r04 item 6 — no more hand-counted TODO
# lists). Round-10 rotation: the board entered the round fully green
# (254/254 graded-ever green), so the window stays FRESHNESS-ONLY —
# 5 continuity canaries + the 2 never-graded round-10 queries
# (ann_ivf_churn, the append-churn + compaction gate, and
# ann_ivf_stored_nprobe2, the stored multi-probe gate — round7.py) +
# 43 oldest-graded greens, rotation.py's proposal order.
# The round-9 families (domain curation, persisted-IVF trio) rotate
# out as freshly-graded greens; they stay registered and local-gated.
PRIORITY_PREFIX: tuple[str, ...] = (
    # -- canaries: green every prior round, kept for continuity --
    "survey_pipeline",
    "census_merge",
    "dedup_minhash",
    "tpch_q1",
    "pretraining_corpus",
    # -- never-graded: the round-10 maintenance + multi-probe gates --
    "ann_ivf_churn",
    "ann_ivf_stored_nprobe2",
    # -- freshness fill: oldest-graded greens (rotation.py order) --
    "set_ops_retention",
    "unpivot_metrics",
    "stats_moments",
    "grouped_list_agg",
    "embedding_unit_norm",
    "approx_quantiles",
    "skew_salted_join",
    "heavy_hitters_sketch",
    "quality_percentile_gate",
    "ewma_smoothing",
    "mixture_temperature",
    "training_export",
    "dedup_keep_best",
    "training_order",
    "dataset_diff",
    "bm25_rank",
    "dedup_survivors",
    "embedding_quantize_int8",
    "first_touch_attribution",
    "event_count_anomaly",
    "winsorize_scale",
    "gdpr_forget_audit",
    "train_val_test_split",
    "star_denormalize",
    "mad_outliers",
    "skyline_pareto",
    "dedup_minhash_fast",
    "dedup_simhash_fast",
    "ann_brp_lsh",
    "kmeans_clusters",
    "token_entropy",
    "pagerank_centrality",
    "countmin_frequency",
    "random_projection",
    "lm_transition_anomaly",
    "dedup_cluster_profile",
    "knn_int8_codes",
    "label_propagation_communities",
    "mode_agg",
    "percent_change_mom",
    "activity_gaps",
    "vocab_growth",
    "similarity_histogram",
)


def _apply_priority() -> None:
    ordered = [n for n in PRIORITY_PREFIX if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for reg in (QUERIES, ORACLES):
        snap = dict(reg)
        reg.clear()
        reg.update({n: snap[n] for n in ordered if n in snap})


_apply_priority()
