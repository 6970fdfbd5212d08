"""Demographic roll-up — counts + percent-of-total per category.

Reference semantics (`process_demographic`, utils.py:190-223, called
from rollup_alchemer_data.py:30-41):

  * group by the demographic column, count rows;
  * denominator = total count EXCLUDING the ``Unknown`` category (null
    categories are also excluded — ``col != 'Unknown'`` is null-false);
  * every category's percent (including ``Unknown``) uses that reduced
    denominator, formatted ``"%.2f%%"``;
  * ``Total Responses`` holds that same excl-unknown denominator as a
    string — blank ``""`` for the ``Unknown`` AND null categories
    (utils.py:216: the when condition is null for null categories, so
    they fall to the blank branch);
  * per-demographic frames are unioned and projected to a fixed column
    order (rollup_alchemer_data.py:94-98).

The reference computes the denominators with two eager ``collect()``
calls per demographic (utils.py:207,211 — 12 driver round-trips per
run). Here both are window aggregates over an empty partition spec, so
the whole roll-up (all demographics) is ONE lazy plan: Catalyst fuses
the scan, the per-demographic hash-aggregations share one shuffle
boundary each, and nothing touches the driver. At 100 TB the group-by
keys are low-cardinality demographic labels, so the partial (map-side)
aggregation reduces each partition to a handful of rows before the
shuffle — the empty-partition window then runs over K rows (K =
category count), which is trivially cheap.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FINAL_COLUMNS = [
    "Demographic",
    "Category",
    "# of Survey Responses",
    "% of Survey Responses",
    "Total Responses",
]


def demographic_rollup(
    df: DataFrame,
    demographic_col: str,
    demographic_name: str,
    unknown_label: str = "Unknown",
    total_via: str = "window",
) -> DataFrame:
    """Roll up one demographic column; collect-free port of utils.py:190-223.

    ``total_via`` picks how the excl-Unknown denominator enters the plan:
      * ``"window"`` (default): empty-partition window over the K
        post-aggregation rows — cheapest when K (category count) is
        small, which holds for every reference demographic;
      * ``"broadcast"``: a 1-row aggregate cross-joined in — same
        semantics, no single-partition window, the safe choice when the
        grouping key is high-cardinality (e.g. rolling up by zip or
        doc shard at 100 TB)."""
    grouped = df.groupBy(F.col(demographic_col).alias("Category")).agg(
        F.count(F.lit(1)).alias("# of Survey Responses")
    )
    cnt = F.col("# of Survey Responses")
    if total_via == "broadcast":
        total_df = grouped.agg(
            F.sum(F.when(F.col("Category") != unknown_label, cnt)).alias("__total")
        )
        grouped = grouped.crossJoin(F.broadcast(total_df))
        total_excl_unknown = F.col("__total")
    else:
        everything = Window.partitionBy()  # single global "partition" of K category rows
        total_excl_unknown = F.sum(
            F.when(F.col("Category") != unknown_label, cnt)
        ).over(everything)
    return grouped.select(
        F.lit(demographic_name).alias("Demographic"),
        F.col("Category"),
        cnt,
        F.format_string("%.2f%%", cnt / total_excl_unknown * 100).alias(
            "% of Survey Responses"
        ),
        F.when(
            F.col("Category") != unknown_label,
            total_excl_unknown.cast("string"),
        )
        .otherwise(F.lit(""))
        .alias("Total Responses"),
    ).orderBy(F.col("Category").desc())  # reference presentation order
    # (rollup_alchemer_data.py) — kept here where it costs one K-row
    # sort; the fused multi-demographic path below drops it (guide §2.4:
    # an orderBy used only for presentation), since row order is not
    # part of any gate and merge_census/the sinks are order-robust.


def rollup_all(df: DataFrame, demographics: list[tuple[str, str]]) -> DataFrame:
    """Union of per-demographic roll-ups (rollup_alchemer_data.py:87-98).

    Fused single-pass form (optimization round 12, guide §1.2): the
    reference's shape — one scan + one hash aggregate + one
    single-partition window PER demographic, then a union — re-reads
    the input once per demographic and plans ~3 Exchanges each. All
    demographics here are label columns of the SAME rows, so one
    explode to (Demographic, Category) pairs computes every roll-up in
    ONE scan, ONE (Demographic, Category) aggregate (map-side combined
    to K rows) and ONE Demographic-partitioned window — no
    single-partition window at all, and the pass count no longer grows
    with the demographic list (3 scans → 1 at the gate; N → 1 at
    100 TB). Values are bit-identical to the per-frame union: the same
    counts reach the same `cnt / total * 100` float expression and the
    same format/blank rules.

    Falls back to the per-frame union when demographic columns have
    heterogeneous dtypes (the explode array would coerce categories the
    way unionByName does, but per-frame keeps each coercion explicit).

    The reference uses positional ``union``; all frames here share one
    builder so ``unionByName`` is both safe and order-robust.
    """
    dtypes = dict(df.dtypes)
    if len(demographics) > 1 and len({dtypes[c] for c, _ in demographics}) == 1:
        pairs = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("Demographic"),
                        F.col(col).alias("Category"),
                    )
                    for col, name in demographics
                ]
            )
        ).alias("_dc")
        grouped = (
            df.select(pairs)
            .select("_dc.Demographic", "_dc.Category")
            .groupBy("Demographic", "Category")
            .agg(F.count(F.lit(1)).alias("# of Survey Responses"))
        )
        cnt = F.col("# of Survey Responses")
        per_demo = Window.partitionBy("Demographic")
        total_excl_unknown = F.sum(
            F.when(F.col("Category") != "Unknown", cnt)
        ).over(per_demo)
        return grouped.select(
            F.col("Demographic"),
            F.col("Category"),
            cnt,
            F.format_string("%.2f%%", cnt / total_excl_unknown * 100).alias(
                "% of Survey Responses"
            ),
            F.when(
                F.col("Category") != "Unknown",
                total_excl_unknown.cast("string"),
            )
            .otherwise(F.lit(""))
            .alias("Total Responses"),
        ).select(FINAL_COLUMNS)
    frames = [demographic_rollup(df, col, name) for col, name in demographics]
    unioned = reduce(DataFrame.unionByName, frames)
    return unioned.select(FINAL_COLUMNS)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, "F.Column"]],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe two-stage aggregation: pre-aggregate on (keys, salt)
    so a hot key's rows spread over ``n_salts`` reducers, then merge the
    partials on the bare keys (COUNT merges as SUM; SUM as SUM).

    ``aggs`` maps output name -> ("count" | "sum", expression). AQE's
    skew handling covers joins; this is the equivalent lever for
    aggregations whose key histogram is pathological (e.g. a null-heavy
    demographic), at the cost of one extra (tiny) shuffle stage.
    """
    salt = (F.spark_partition_id() * 31 + F.monotonically_increasing_id() % n_salts) % n_salts
    partial_exprs = []
    final_exprs = []
    for name, (kind, expr) in aggs.items():
        if kind == "count":
            partial_exprs.append(F.count(expr).alias(f"_p_{name}"))
        elif kind == "sum":
            partial_exprs.append(F.sum(expr).alias(f"_p_{name}"))
        else:
            raise ValueError(f"salted_agg supports count/sum, got {kind}")
        final_exprs.append(F.sum(f"_p_{name}").alias(name))
    return (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )
