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
    round7,
)

# The driver's correctness gate grades a bounded prefix of the registry
# (exactly the first 50 registered queries). Registration order is
# therefore a grading decision; `tools/rotation.py` machine-derives the
# graded/green/never-graded sets from CORRECTNESS_r*.json and proposes
# the next prefix (VERDICT r04 item 6 — no more hand-counted TODO
# lists). Round-7 rotation = 5 continuity canaries + the r06 red
# (dsir_budget_selection, re-graded after the global_cumsum_exclusive
# determinism fix) + the 2 r06-overflow never-graded queries + the 4
# round-7 registrations (adaptive minhash, the two raw-text source
# roundtrips, self-scaling IVF) + 38 oldest-graded greens as
# freshness fill = exactly 50. If all grade green, every registered query has a green driver
# row across rounds and the grading debt is zero entering round 8.
PRIORITY_PREFIX: tuple[str, ...] = (
    # -- canaries: green every prior round, kept for continuity --
    "survey_pipeline",
    "census_merge",
    "dedup_minhash",
    "tpch_q1",
    "pretraining_corpus",
    # -- the one r06 red (global_cumsum_exclusive determinism fix,
    # this round) re-graded first --
    "dsir_budget_selection",
    # -- last round's overflow (judge-verified green in the r06
    # session) + the round-7 registrations --
    "seasonal_dow_index",
    "stump_score_report",
    "dedup_minhash_adaptive",
    "text_lines_roundtrip",
    "documents_whole_roundtrip",
    "ann_ivf_autok",
    # -- freshness fill: oldest-graded greens (rotation.py order) --
    "tpch_q5",
    "salted_group_count",
    "upsert_merge",
    "semi_anti_join",
    "tpch_q18_top",
    "simhash_fingerprints",
    "dedup_simhash",
    "ann_embedding_pairs",
    "dedup_embedding",
    "lang_id",
    "doc_fingerprint",
    "tumbling_agg",
    "sliding_agg",
    "resample_gapfill",
    "latest_per_key",
    "multimodal_resize",
    "ann_ivf_nprobe2",
    "quantiles_exact",
    "rollup_demographic",
    "clean_text",
    "likert_scores",
    "bucket_balance",
    "validity_cascade",
    "valid_split",
    "invalid_split",
    "project_rename_prefix",
    "global_stats",
    "window_backfill_first",
    "window_rownum_order",
    "timestamp_roundtrip",
    "union_rollup_multi",
    "tpch_q3_top10",
    "catalog_tables",
    "merge_nan_outer_join",
    "csv_roundtrip",
    "json_roundtrip",
    "sql_tpch_q6",
    "dedup_exact",
)


def _apply_priority() -> None:
    ordered = [n for n in PRIORITY_PREFIX if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for reg in (QUERIES, ORACLES):
        snap = dict(reg)
        reg.clear()
        reg.update({n: snap[n] for n in ordered if n in snap})


_apply_priority()
