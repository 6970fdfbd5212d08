"""Incremental view maintenance: merge pre-reduced partial aggregates.

At 100 TB the expensive thing about a daily-refreshed aggregate table
is NOT the day's delta — it's rescanning the historical base. Every
standard distributive/algebraic aggregate (count, sum, min, max, and
avg as sum/count) is MERGEABLE: yesterday's stored aggregate rows and
today's delta aggregate rows combine per group with pure per-row
arithmetic after one co-partitioned full-outer join. The base fact
table never re-enters the plan.

This module provides that merge as a generic operator. Shape:

    base  = stored aggregate table   (one row per group, already reduced)
    delta = aggregate of the new batch (same schema)
    out   = merge_grouped_partials(base, delta, keys, spec)

``spec`` maps aggregate column -> merge rule ("sum" | "min" | "max").
Counts merge under "sum" (count is a sum of 1s). avg/stddev callers
store (sum, count) / (sum, sumsq, count) and derive at read time —
the classic algebraic-aggregate decomposition.

Scale posture: both sides arrive pre-reduced, so the full-outer join
shuffles |groups| rows, not |facts| rows; with the base stored
bucketed by the group key the join is co-located and shuffle-free.
Cost is O(|delta groups| + |base groups|) regardless of base history
depth — the property that makes nightly maintenance viable when the
base is 100 TB deep.

No reference counterpart (the reference recomputes its gold rollups
from silver on every run — `/root/reference/rollup_alchemer_data.py`
re-reads the full silver table); this operator is the engine-native
upgrade path for that pattern.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_sum(b, d):
    # SUM of an all-NULL group is NULL in Spark's own partial-agg merge
    # AND in a full recompute — propagate it, don't invent a 0.
    return F.when(b.isNull() & d.isNull(), F.lit(None)).otherwise(
        F.coalesce(b, F.lit(0)) + F.coalesce(d, F.lit(0))
    )


_MERGE_FNS = {
    "sum": _merge_sum,
    "min": lambda b, d: F.least(b, d),  # least/greatest skip NULLs in Spark
    "max": lambda b, d: F.greatest(b, d),
}


def merge_grouped_partials(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    spec: Mapping[str, str],
) -> DataFrame:
    """Merge two pre-reduced aggregate tables with identical schemas.

    ``spec``: {aggregate_column: "sum" | "min" | "max"}. Groups present
    on only one side pass through; groups present on both merge per
    rule. The join is NULL-SAFE on the keys (a NULL-keyed group on both
    sides is ONE group, as GROUP BY treats it), and an all-NULL sum
    merges to NULL, not 0 — both so that the defining identity
    agg(base ∪ delta) == merge(agg(base), agg(delta)) holds verbatim,
    NULLs included.
    """
    unknown = [how for how in spec.values() if how not in _MERGE_FNS]
    if unknown:
        raise ValueError(f"unknown merge rule(s): {unknown}; use sum|min|max")
    b = base.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in spec],
    )
    d = delta.select(
        *[F.col(k).alias(f"_dk_{k}") for k in keys],
        *[F.col(c).alias(f"_d_{c}") for c in spec],
    )
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"_bk_{k}").eqNullSafe(F.col(f"_dk_{k}")) for k in keys],
    )
    merged = b.join(d, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"_bk_{k}"), F.col(f"_dk_{k}")).alias(k) for k in keys
    ]
    for c, how in spec.items():
        out_cols.append(
            _MERGE_FNS[how](F.col(f"_b_{c}"), F.col(f"_d_{c}")).alias(c)
        )
    return merged.select(*out_cols)


def maintain_fact_dim_join(
    stored: DataFrame,
    fact_delta: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Incrementally maintain a materialized fact⋈dim INNER join —
    the join-side companion to ``merge_grouped_partials``:

    * **fact appends** — the only new-fact work is ``Δfact ⋈ dim``
      (dim broadcasts; cost O(|Δ|), the fact history never rescans);
    * **dim updates** — affected stored rows are REFRESHED IN PLACE
      from the stored row's own fact columns: drop the old dim
      attributes, re-join just those rows against the current dim.
      The fact table is never consulted — the stored join IS the
      recovery source for its fact columns (the reason a maintained
      join should always persist the fact columns it joined on).

    ``dim`` is the CURRENT dimension table. Every stored row is
    re-decorated from it, which subsumes the "which keys changed"
    bookkeeping: unchanged keys re-join to identical attributes.
    When the caller KNOWS the changed-key set it can pre-split stored
    and pass only affected rows through here — same plan, less work;
    this operator keeps the correctness-first form.

    Maintenance identity (the gate): the maintained table is row-equal
    to the full recompute ``(fact_old ∪ Δfact) ⋈ dim_current``.
    Deleted dim keys fall out (inner-join semantics) on both paths.

    Scale shape: one broadcast join over the stored table + one over
    the delta — O(|stored| + |Δ|) with zero fact-table scans; with
    stored bucketed by key and a big dimension, both joins become
    co-located shuffle joins of the same shape.
    """
    dim_attr_cols = [c for c in dim.columns if c not in keys]
    fact_cols = [c for c in stored.columns if c not in dim_attr_cols]
    refreshed = stored.select(*fact_cols).join(F.broadcast(dim), list(keys))
    appended = fact_delta.join(F.broadcast(dim), list(keys))
    return refreshed.unionByName(appended.select(*refreshed.columns))
