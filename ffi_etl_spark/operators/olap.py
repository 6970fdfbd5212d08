"""Temporal join operators Spark lacks natively: as-of and range joins.

Neither exists as a DataFrame primitive (Spark 4), so both are built as
compositions with the scale-correct shape:

  * as-of join — the union/last-observation trick: tag right rows, sort
    (key, ts) within key partitions, carry the latest right payload
    forward with a ``last(ignorenulls)`` window, keep left rows. ONE
    shuffle on the key, no per-row subquery, no skew beyond the key
    histogram — the standard distributed as-of (vs. the naive
    inequality-join which explodes to |L|·|R| per key).
  * range join — time-bin bucketing: candidates must share a coarse
    time bucket (or be in adjacent buckets), so the join is an
    equi-join on (key, bucket) with an exact predicate filter after —
    work scales with events-per-bucket, not |L|·|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward (most-recent-prior, inclusive) as-of join.

    Every ``left`` row gains the ``right_cols`` of the latest ``right``
    row with the same ``on`` keys and ``right_ts <= left_ts`` (NULLs if
    none, or if it is older than ``tolerance_seconds``).
    """
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left.columns if c not in on],
    )
    # right rows sort BEFORE left rows at equal ts => inclusive (>=) match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        "__last", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__last",
            F.when(
                F.unix_timestamp("__ts") - F.unix_timestamp(F.col("__last.__rts"))
                <= tolerance_seconds,
                F.col("__last"),
            ),
        )
    keep = [*on, *[c for c in left.columns if c not in on]]
    return out.select(
        *[F.col(c) for c in keep],
        F.col("__last.__rts").alias(f"asof_{right_ts}"),
        *[F.col(f"__last.{c}").alias(c) for c in right_cols],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Pairs where ``0 < right_ts - left_ts <= max_gap_seconds`` and the
    ``on`` keys match. Bucketed: a qualifying pair's bucket distance is
    0 or 1 when the bin width equals the gap, so candidates come from an
    equi-join on (keys, bucket) ∪ (keys, bucket+1)."""
    bin_l = (F.unix_timestamp(F.col(left_ts)) / max_gap_seconds).cast("long")
    bin_r = (F.unix_timestamp(F.col(right_ts)) / max_gap_seconds).cast("long")
    l = left.withColumn("__bin", bin_l)
    # right lands in its own bucket AND the previous one (explode, not a
    # second join: one shuffle, both candidate classes covered)
    r = right.withColumn(
        "__bin", F.explode(F.array(bin_r, bin_r - 1))
    )
    gap = F.unix_timestamp(F.col(right_ts)) - F.unix_timestamp(F.col(left_ts))
    return (
        l.join(r, [*on, "__bin"])
        .filter((gap > 0) & (gap <= max_gap_seconds))
        .drop("__bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int,
    cond=None,
) -> DataFrame:
    """Pairs whose [start, end] intervals overlap (closed, i.e.
    l_start <= r_end AND r_start <= l_end), found WITHOUT a cross or
    theta join: both sides explode to the bins their interval covers
    and candidates equi-join on the bin. A pair overlapping across many
    shared bins would duplicate, so the join keeps only the CANONICAL
    shared bin — greatest(start-bin_l, start-bin_r), which every
    overlapping pair shares exactly once — making the output
    duplicate-free with no distinct() pass.

    ``bin_seconds`` trades explode width against join fan-in: bins much
    wider than typical intervals put many intervals per bin (bigger
    candidate sets); much narrower explodes long intervals into many
    rows. Pick ~the median interval length. Caller must pre-rename
    columns so the two sides don't collide; ``cond`` adds a residual
    predicate (e.g. different-user)."""
    lsb = (F.unix_timestamp(F.col(l_start)) / bin_seconds).cast("long")
    leb = (F.unix_timestamp(F.col(l_end)) / bin_seconds).cast("long")
    rsb = (F.unix_timestamp(F.col(r_start)) / bin_seconds).cast("long")
    reb = (F.unix_timestamp(F.col(r_end)) / bin_seconds).cast("long")
    l2 = left.withColumn("__lsb", lsb).withColumn("__bin", F.explode(F.sequence(lsb, leb)))
    r2 = right.withColumn("__rsb", rsb).withColumn("__rbin", F.explode(F.sequence(rsb, reb)))
    overlap = (F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end))
    canonical = F.col("__bin") == F.greatest(F.col("__lsb"), F.col("__rsb"))
    join_cond = (F.col("__bin") == F.col("__rbin")) & canonical & overlap
    if cond is not None:
        join_cond = join_cond & cond
    return l2.join(r2, join_cond).drop("__bin", "__rbin", "__lsb", "__rsb")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: rows of the ``skewed`` (large) side draw a
    uniform per-ROW salt in [0, n_salts); the ``other`` side is
    replicated once per salt value; the join key becomes
    (keys..., salt). A hot key's rows then fan out over ``n_salts``
    reducer tasks instead of serializing through one straggler, and
    every skewed row still meets exactly ONE replica of each matching
    row — the result multiset is identical to the plain join.

    Placement vs AQE: adaptive skew-join splitting already repairs most
    batch skew at runtime (keep it on); explicit salting is the
    deterministic lever for the cases AQE can't touch — stream-stream
    joins (no runtime re-plan), skew you know in advance (null-heavy
    keys), or engines/stages where AQE is disabled. The salt must vary
    per row, NOT per key (hashing the key would re-concentrate the hot
    key); ``rand`` is fine because the OUTPUT is salt-invariant — a
    task retry may re-draw salts, changing only row placement.

    Only inner/left are offered: replicating ``other`` makes its
    unmatched rows appear once per salt, so right/full-outer semantics
    would need a post-dedup that costs the shuffle this operator
    exists to avoid."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        "_salt", (F.rand(42) * n_salts).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [*keys, "_salt"], how).drop("_salt")


def salted_join_adaptive(
    skewed: DataFrame,
    other: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    hot_share_threshold: float = 0.2,
    probe_fraction: float = 0.01,
    how: str = "inner",
) -> DataFrame:
    """Self-tuning ``salted_join`` (VERDICT r04 item 4): salting spreads
    a hot key over ``n_salts`` reducers, but on a UNIFORM key it only
    pays ``n_salts``× dim replication for nothing — at sf0.1 the lever
    measured marginal-to-negative on balanced draws. So probe first:
    sample ``probe_fraction`` of the skewed side (seed-pinned), count
    rows per key, and salt ONLY when the hottest key's share of sampled
    rows ≥ ``hot_share_threshold``; otherwise run the plain equi-join
    and let AQE's skew splitter handle anything mild.

    The probe is one sampled aggregate + a 1-row collect (the
    skew_probe dry-run shape — at 100 TB it reads ~1% of one side,
    far below the join it sizes; a 90%-hot key is unmissable in any
    sample that holds a few hundred rows). The branch choice changes
    only the PHYSICAL plan: both branches produce the identical join
    multiset, so correctness gates hold regardless of which side of
    the threshold the data lands on. Sampling is engine-seeded, so the
    decision is reproducible within an engine; data near the threshold
    may legitimately choose differently across engines — pick the
    threshold from the key profile (``skew_probe``) when that matters.
    """
    probe = (
        skewed.sample(fraction=probe_fraction, seed=42)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n").alias("_max"), F.sum("_n").alias("_tot"))
        .collect()[0]
    )
    hot = (probe["_max"] or 0) / max(probe["_tot"] or 0, 1)
    if hot >= hot_share_threshold:
        return salted_join(skewed, other, keys, n_salts=n_salts, how=how)
    return skewed.join(other, keys, how)
