"""Domain-level corpus curation (VERDICT r08 item 2 — the C4/RefinedWeb
axis).

Document-level quality gates (operators/textops.py), source-level
mixtures (operators/datamix.py) and split governance already exist;
this module adds the missing axis a web-scale pretraining pipeline
curates on — the DOMAIN: per-domain document caps (no single host may
dominate the corpus), blocklist filtering (drop known-bad domains,
whether hand-listed or derived from corpus statistics), and the
domain-mixture report that tells a dataset builder what the cap/block
decisions did to the token mix. The reference pipeline has no notion of
domains (its unit is survey rows); these derive from the public
C4 (Raffel et al.) / RefinedWeb (Penedo et al.) recipes re-expressed as
Spark plans over the `documents.source` column.

100 TB posture, per operator:
  * domain_cap — declarative rank-filter over a domain-keyed window.
    Spark ≥3.5 plans `row_number ≤ k` as WindowGroupLimit: a PARTIAL
    per-task top-k runs before the shuffle, so a mega-domain (10% of
    the web behind one host) ships at most k·tasks rows, not its full
    volume, and the post-shuffle sort ranks k·tasks rows per domain.
    No collect, no skew cliff.
  * domain_blocklist_filter — broadcast LEFT ANTI join: the blocklist
    is domain-cardinality (thousands), the corpus is doc-cardinality
    (billions); the corpus side never shuffles.
  * short_doc_domains / domain_mix_report — one partial-aggregated
    groupBy to domain cardinality, then K-row windows; the wide text
    column reduces to per-row lengths in the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    rank_col: str = "domain_rank",
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, deterministically:
    rank a domain's docs by md5 of their id (a seedless uniform shuffle
    — same keep-set on every run and every engine, the property a
    reproducible dataset release needs) and keep rank ≤ cap. Appends
    ``rank_col`` so downstream audits can see how close to the cap each
    domain sat.

    The id tie-break after the md5 key is defensive: ids are unique so
    md5 collisions cannot occur on equal inputs, but a duplicated id
    (upstream bug) must still produce a deterministic rank rather than
    a partition-order-dependent one."""
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(domain_col).orderBy(key, F.col(id_col))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= cap
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    domain_col: str = "source",
) -> DataFrame:
    """Drop every document whose domain appears in ``blocklist`` (a
    1-column frame of domain values, e.g. ``short_doc_domains``'s
    output or a curated list read from a file). Broadcast anti join —
    the corpus side stays map-side."""
    bl = blocklist.select(F.col(blocklist.columns[0]).alias(domain_col)).distinct()
    return df.join(F.broadcast(bl), domain_col, "left_anti")


def short_doc_domains(
    df: DataFrame,
    domain_col: str = "source",
    len_col: str = "n_chars",
    short_chars: int = 200,
    max_short_share: float = 0.3,
) -> DataFrame:
    """Derived blocklist: domains whose share of short documents
    (< ``short_chars`` chars) exceeds ``max_short_share`` — the
    cheap-and-effective "boilerplate farm" heuristic from the C4 family
    of cleaning recipes (stat-based, no model). One partial-aggregated
    groupBy to domain cardinality; returns (domain, short_share)."""
    per = df.groupBy(F.col(domain_col)).agg(
        F.avg((F.col(len_col) < short_chars).cast("double")).alias("short_share")
    )
    return per.filter(F.col("short_share") > max_short_share)


def domain_token_cap(
    df: DataFrame,
    token_budget: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain TOKEN budget (the unit a pretraining mix is actually
    specified in, where ``domain_cap`` counts documents): walk each
    domain's docs in the same deterministic md5-of-id order and keep
    the greedy prefix whose whitespace-token total stays within
    ``token_budget``. A doc is kept iff its EXCLUSIVE running total
    plus its own tokens fits — all integer arithmetic, so the keep set
    is bit-reproducible on any engine.

    Scale shape: every doc has ≥1 token, so the kept prefix can never
    exceed ``token_budget`` DOCUMENTS — ``domain_cap(df, token_budget)``
    is therefore a LOSSLESS pre-prune, and it plans as the two-phase
    WindowGroupLimit top-k (partial before the exchange). The exact
    token cumsum then runs over ≤ budget rows per domain instead of the
    domain's full volume — the same bounded-shuffle property as the doc
    cap, for a budget rule a bare cumsum window could not bound."""
    pruned = domain_cap(df, cap=token_budget, domain_col=domain_col, id_col=id_col)
    ntok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    key = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(domain_col)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cum = pruned.withColumn("_ntok", ntok).withColumn(
        "_cum_excl", F.coalesce(F.sum("_ntok").over(w), F.lit(0)).cast("bigint")
    )
    return (
        with_cum.filter(F.col("_cum_excl") + F.col("_ntok") <= token_budget)
        .withColumn("cum_tokens", (F.col("_cum_excl") + F.col("_ntok")).cast("bigint"))
        .withColumnRenamed("_ntok", "n_tokens")
        .drop("_cum_excl")
    )


def domain_mix_report(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain mixture report: document and whitespace-token counts,
    each domain's token share, and the cumulative token share down the
    ranking — the table a dataset card publishes and a curation loop
    watches ("the top 3 domains carry 40% of tokens").

    Shares are computed as divisions of EXACT integer token counts
    (per-row and windowed sums stay integral until the final divide),
    not running float sums — deterministic to the last bit across
    engines and partitionings. The windows run over domain-cardinality
    rows (K, post-aggregation), the collect-free global-total pattern
    used throughout this engine."""
    per = df.groupBy(F.col(domain_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .cast("bigint")
        .alias("n_tokens"),
    )
    order = Window.orderBy(F.col("n_tokens").desc(), F.col(domain_col))
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        F.col(domain_col),
        "n_docs",
        "n_tokens",
        F.row_number().over(order).alias("mix_rank"),
        (F.col("n_tokens").cast("double") / F.sum("n_tokens").over(total)).alias(
            "token_share"
        ),
        F.sum("n_tokens").over(cum).cast("bigint").alias("cum_tokens"),
        (
            F.sum("n_tokens").over(cum).cast("double")
            / F.sum("n_tokens").over(total)
        ).alias("cum_token_share"),
    )
