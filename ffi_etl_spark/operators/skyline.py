"""Pareto skyline (non-dominated set) over two criteria.

The skyline operator from the OLAP literature (Börzsönyi et al., "The
Skyline Operator", ICDE 2001): keep every row not dominated by another
row — dominated meaning another row is at-least-as-good on both
criteria and strictly better on one. Classic use here: cheapest parts
for their size class (minimize price, maximize size).

Scale design — NOT the naive O(n²) dominance self-join:

1. **Bucketed prune** (phase 1): the skyline of a union is a subset of
   the union of per-subset skylines, for ANY disjoint split of the
   rows. Rows are bucketed by a deterministic row hash (uniform over
   the reducers — unlike hashing ``spark_partition_id()``, whose P
   distinct values collide unevenly) and each bucket drops its
   locally-dominated rows with a sort + running-max window. Cost: ONE
   hash exchange of the table — the same volume as any shuffle-based
   operator, and the only full-data movement in the plan. On
   uniformly distributed criteria a bucket of m rows keeps ~O(log m)
   expected rows, so this pass deletes almost everything.
2. **Global pass** (phase 2): the surviving rows (the tiny union of
   bucket skylines) run the same sort + running-max once more in a
   single task. For 2-D skylines the running-max formulation is exact:
   sort by the minimized criterion ascending; a row is non-dominated
   iff its maximized criterion exceeds the running max of every
   strictly-better row, with the tie band (equal minimized value)
   checked against the inclusive running max.

The single-partition step in phase 2 touches only the pruned survivor
set — the same shape as the engine's two-phase global cumsum
(operators/textops.py::global_cumsum_exclusive), never the raw table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SKYLINE_BUCKETS = 256


def _prune(df: DataFrame, part_cols: list, min_col: str, max_col: str) -> DataFrame:
    """Drop rows dominated WITHIN each partition group.

    Two running maxes over the ``min_col`` ascending order:
      * strictly-cheaper frame (range ..-1): a row is dominated if its
        ``max_col`` does not beat the best seen at any strictly better
        ``min_col``;
      * inclusive frame (range ..0): ties on ``min_col`` dominate when
        one of them is strictly better on ``max_col``.
    Equal (min_col, max_col) duplicates dominate neither way — both
    survive, matching the strict-in-one dominance definition.
    """
    w = Window.partitionBy(*part_cols).orderBy(min_col)
    strictly_better = w.rangeBetween(Window.unboundedPreceding, -1)
    incl = w.rangeBetween(Window.unboundedPreceding, 0)
    # empty strictly-better frame -> NULL max -> NULL comparison; the
    # outer coalesce(NULL, False) keeps such rows, as dominance requires
    # an actual better row.
    dominated = (F.col(max_col) <= F.max(max_col).over(strictly_better)) | (
        F.col(max_col) < F.max(max_col).over(incl)
    )
    return df.withColumn("_dom", F.coalesce(dominated, F.lit(False))).filter(
        ~F.col("_dom")
    ).drop("_dom")


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Rows not dominated under (minimize ``minimize``, maximize
    ``maximize``). ``minimize`` must be integral (the tie-exact RANGE
    window frame requires it — quantize prices to cents first).

    The bucket key hashes the two criteria (deterministic per row, so
    retries re-derive the same split; uniform across SKYLINE_BUCKETS
    reducers). Correctness does not depend on the bucketing — any
    disjoint split works — only balance does.
    """
    bucket = F.pmod(
        F.xxhash64(F.col(minimize), F.col(maximize)), F.lit(SKYLINE_BUCKETS)
    )
    local = _prune(
        df.withColumn("_bkt", bucket), ["_bkt"], minimize, maximize
    ).drop("_bkt")
    # survivors are the union of bucket skylines — tiny; one global pass
    return _prune(local.withColumn("_g", F.lit(0)), ["_g"], minimize, maximize).drop(
        "_g"
    )
