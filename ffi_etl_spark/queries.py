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
# lists). Round-9 rotation (VERDICT r08 item 2): the dsir red is CLOSED
# (all four rows green in r08 — HUGEINT theory confirmed), so the three
# bisection probes leave the prefix (they stay registered and in the
# 254-query local gate) and the window is FRESHNESS-ONLY: 5 continuity
# canaries + the 7 never-graded round-9 queries (domain curation,
# round9.py; persisted IVF index + maintenance + drift, round7.py) +
# 38 oldest-graded greens, rotation.py's proposal at HEAD.
PRIORITY_PREFIX: tuple[str, ...] = (
    # -- canaries: green every prior round, kept for continuity --
    "survey_pipeline",
    "census_merge",
    "dedup_minhash",
    "tpch_q1",
    "pretraining_corpus",
    # -- never-graded: the round-9 domain-curation family --
    "domain_cap_sample",
    "domain_blocklist_filter",
    "domain_mix_report",
    "domain_token_cap",
    # -- never-graded: the round-9 persisted IVF index + maintenance --
    "ann_ivf_stored",
    "ann_ivf_append",
    "ann_ivf_drift",
    # -- freshness fill: oldest-graded greens (rotation.py order) --
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
    "dedup_minhash_incremental",
    "tpch_q7_volume",
    "tpch_q10_returns",
    "tpch_q12_priority",
    "tpch_q14_promo",
    "tpch_q22_idle_rich",
    "tpch_q2_min_cost",
    "deterministic_sample",
    "weighted_sample",
    "tpch_q4_priority",
    "tpch_q8_share",
    "tpch_q11_important",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q19_disjunct",
    "tpch_q20_promo_suppliers",
    "tpch_q21_waiting",
    "running_total",
)


def _apply_priority() -> None:
    ordered = [n for n in PRIORITY_PREFIX if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for reg in (QUERIES, ORACLES):
        snap = dict(reg)
        reg.clear()
        reg.update({n: snap[n] for n in ordered if n in snap})


_apply_priority()
