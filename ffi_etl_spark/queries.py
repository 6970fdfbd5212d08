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
)

# The driver's correctness gate grades a bounded prefix of the registry
# (exactly the first 50 registered queries). Registration order is
# therefore a grading decision. Rounds 1+2 banked green rows for 69
# distinct queries (the full reference surface + every family
# flagship); round 3 ROTATES the prefix per the round-2 verdict: 5
# continuity canaries, then the queries that have never earned a
# driver CORRECTNESS row, so coverage converges to "every registered
# query has a driver row". The 20 never-graded queries that don't fit
# this round's 50 lead the second tier for the round-4 rotation.
PRIORITY_PREFIX: tuple[str, ...] = (
    # -- canaries: already green r01+r02, kept for cross-round continuity --
    "survey_pipeline",
    "census_merge",
    "dedup_minhash",
    "tpch_q1",
    "pretraining_corpus",
    # -- r01 driver-red (no_oracle), since given a band oracle: re-grade --
    "approx_distinct_users",
    # -- never driver-graded (no row in r01/r02): rows-only tiers first --
    "dedup_minhash_fast",
    "dedup_simhash_fast",
    "ann_brp_lsh",
    "kmeans_clusters",
    "approx_quantiles",
    "token_entropy",
    "pagerank_centrality",
    # -- never driver-graded, full oracle checks --
    "range_join_follows",
    "cube_agg",
    "rollup_agg",
    "doc_quality_filter",
    "concurrent_sessions",
    "graph_triangles",
    "json_extract_agg",
    "token_topk",
    "stats_moments",
    "window_first_last_nth",
    "grouped_list_agg",
    "embedding_unit_norm",
    "props_map_explode",
    "window_percent_rank",
    "window_trailing_30d",
    "pii_redact",
    "repetition_filter",
    "keyword_tfidf",
    "salted_join_agg",
    "histogram_equiwidth",
    "histogram_equidepth",
    "chunk_documents",
    "term_collocations",
    "variant_extract_agg",
    "session_window_agg",
    "recursive_org_depth",
    "lateral_topk_orders",
    "zscore_normalize",
    "fuzzy_match_blocked",
    "skew_probe",
    "scd2_compress",
    "dedup_sorted_neighborhood",
    "reservoir_sample",
    "rolling_distinct_users",
    "dup_span_profile",
    "inverted_index",
    "source_ngram_overlap",
    # -- second tier: the 20 still-ungraded queries lead, so round 4's
    #    rotation is a pure prefix swap --
    "tpch_q2_min_cost",
    "tpch_q4_priority",
    "tpch_q7_volume",
    "tpch_q8_share",
    "tpch_q10_returns",
    "tpch_q11_important",
    "tpch_q12_priority",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q19_disjunct",
    "tpch_q20_promo_suppliers",
    "tpch_q21_waiting",
    "tpch_q22_idle_rich",
    "deterministic_sample",
    "weighted_sample",
    "running_total",
    "set_ops_retention",
    "unpivot_metrics",
    # -- round-3 additions, also ungraded: complete the round-4 block --
    "skew_salted_join",
    "dedup_keep_best",
    "training_order",
    "dataset_diff",
    "dedup_minhash_incremental",
    "mixture_temperature",
    "training_export",
    "heavy_hitters_sketch",
    "ewma_smoothing",
    "quality_percentile_gate",
)


def _apply_priority() -> None:
    ordered = [n for n in PRIORITY_PREFIX if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for reg in (QUERIES, ORACLES):
        snap = dict(reg)
        reg.clear()
        reg.update({n: snap[n] for n in ordered if n in snap})


_apply_priority()
