"""Data-profiling and entity-matching queries: single-scan column
profiler, per-group z-score standardization, blocked fuzzy matching.

These extend the engine's introspection surface (the reference's only
introspection is its table lister, ``SURVEY.md §2`` S6) with the
profile/quality/match operators a data platform team runs before and
after every large ingest. Every query has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.queries import query


# --- single-scan column profiler ----------------------------------------------

# (column, stringifier) — min/max are canonicalized to strings so one
# long-format schema covers every column type. Doubles go through
# printf('%.6f') on BOTH engines (C-style formatting, bit-identical for
# in-range values); timestamps through an explicit pattern so neither
# engine's default cast format leaks in.
_PROFILE_COLS = [
    ("o_orderkey", "cast"),
    ("o_custkey", "cast"),
    ("o_orderstatus", "cast"),
    ("o_totalprice", "f6"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "cast"),
]


def _duck_str(expr, kind):
    if kind == "f6":
        return f"printf('%.6f', {expr})"
    if kind == "ts":
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
    return f"CAST({expr} AS VARCHAR)"


def _profile_oracle() -> str:
    selects = []
    for col, kind in _PROFILE_COLS:
        selects.append(
            f"SELECT '{col}' AS col_name, COUNT(*) AS n_rows,"
            f" COUNT(*) - COUNT({col}) AS n_nulls,"
            f" COUNT(DISTINCT {col}) AS n_distinct,"
            f" {_duck_str(f'MIN({col})', kind)} AS min_str,"
            f" {_duck_str(f'MAX({col})', kind)} AS max_str"
            f" FROM orders"
        )
    return "\nUNION ALL ".join(selects) + "\nORDER BY col_name"


@query("profile_columns", oracle=_profile_oracle())
def _profile_columns(spark, sf_dir):
    """Whole-table column profile (rows / nulls / exact distincts /
    min / max per column) in ONE scan: every per-column statistic is an
    aggregate expression in a single ``agg``, so Spark reads the table
    once; the wide one-row result is lowered to long format with an
    array-of-structs explode (driver-free, K rows).

    Scale note: N exact ``count(distinct)`` in one agg plan through an
    Expand operator (N× the input rows into the shuffle). At 100 TB the
    production tier swaps ``countDistinct`` → ``approx_count_distinct``
    (HLL partials, no Expand) — same plan shape, sketch merge instead
    of exact dedup. Exact kept here because the oracle gate compares
    values bit-for-bit.
    """
    t = table(spark, sf_dir, "orders")
    # min/max are computed on the RAW column (so ordering semantics
    # match the oracle's MIN()-then-format, never string ordering where
    # "10" < "9") and stringified afterwards.
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, kind in _PROFILE_COLS:
        aggs += [
            F.count(col).alias(f"{col}__nn"),
            F.countDistinct(col).alias(f"{col}__nd"),
        ]
        if kind == "cast":
            aggs += [
                F.min(col).cast("string").alias(f"{col}__min"),
                F.max(col).cast("string").alias(f"{col}__max"),
            ]
        else:
            aggs += [
                _spark_fmt_minmax(col, kind, "min").alias(f"{col}__min"),
                _spark_fmt_minmax(col, kind, "max").alias(f"{col}__max"),
            ]
    wide = t.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(col).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"{col}__nn")).alias("n_nulls"),
                F.col(f"{col}__nd").alias("n_distinct"),
                F.col(f"{col}__min").alias("min_str"),
                F.col(f"{col}__max").alias("max_str"),
            )
            for col, _ in _PROFILE_COLS
        ]
    )
    return (
        wide.select(F.explode(rows).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )


def _spark_fmt_minmax(col, kind, which):
    agg = F.min(col) if which == "min" else F.max(col)
    if kind == "f6":
        return F.format_string("%.6f", agg)
    return F.date_format(agg, "yyyy-MM-dd HH:mm:ss")


# --- per-group standardization (z-score feature scaling) ----------------------

@query(
    "zscore_normalize",
    oracle="""
WITH s AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS mu,
         STDDEV_SAMP(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CASE WHEN s.sigma IS NULL OR s.sigma = 0 THEN NULL
            ELSE printf('%.6e', (e.value - s.mu) / s.sigma) END AS z
FROM events e JOIN s USING (event_type)
WHERE e.event_id % 97 = 0
ORDER BY e.event_id
""",
)
def _zscore_normalize(spark, sf_dir):
    """Per-group feature standardization (the classic ML preprocessing
    step): one hash aggregate computes per-type (mean, stddev), then a
    **broadcast** join maps the K-row stats back over the fact rows —
    no shuffle of the big side, no window over the whole table.

    The ``event_id % 97`` filter picks the checked subset by a
    *deterministic integer* predicate, so gate membership can never
    flip on float noise. Parity hardening (round 4): mu is an
    exact-decimal sum over count (a float avg()'s merge order leaks
    into the low bits — measured divergent at sf0.1), and z leaves as
    a %.6e string because sigma is Welford-accumulated on both engines
    (the stats_moments rule; the old raw-double z relied on the
    driver's unknown float canon)."""
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.col("event_id") % 97 == 0)
        .select(
            "event_id",
            "event_type",
            F.when(
                F.col("sigma").isNotNull() & (F.col("sigma") != 0),
                F.format_string("%.6e", z),
            ).alias("z"),
        )
        .orderBy("event_id")
    )


# --- blocked fuzzy matching (edit-distance entity resolution) -----------------

@query(
    "fuzzy_match_blocked",
    oracle="""
WITH names AS (
  SELECT p_name, COUNT(*) AS n, split_part(p_name, ' ', 1) AS blk
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist,
       a.n AS n_a, b.n AS n_b
FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
ORDER BY name_a, name_b
""",
)
def _fuzzy_match_blocked(spark, sf_dir):
    """Entity resolution by edit distance, made scalable by the
    canonical block-then-verify shape: (1) collapse the fact table to
    DISTINCT names + frequencies (tiny), (2) self-join only within a
    cheap blocking key (first token) so the O(n²) candidate space is
    per-block, (3) verify candidates with exact ``levenshtein`` —
    classic DP, bit-identical integers on both engines.

    At 100 TB the same plan holds: the distinct-names aggregation is
    the only pass over the corpus; blocks shuffle by key and the
    quadratic work is bounded per block (skewed blocks → re-block on a
    longer prefix, same trick as LSH band salting in
    ``operators/dedup.py``).
    """
    names = (
        table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("blk", F.split("p_name", " ")[0])
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .withColumn("dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name")))
        .where(F.col("dist") <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            "dist",
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .orderBy("name_a", "name_b")
    )


# --- join-key skew probe ------------------------------------------------------

@query(
    "skew_probe",
    oracle="""
WITH per_key AS (
  SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
), stats AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total,
         COUNT(*) AS n_keys,
         CAST(MAX(n) AS BIGINT) AS max_n
  FROM per_key
)
SELECT p.key, p.n,
       CAST(FLOOR(p.n * 1000000 / s.total) AS BIGINT) AS share_ppm,
       CAST(FLOOR(p.n * s.n_keys / s.total) AS BIGINT) AS x_mean
FROM per_key p, stats s
ORDER BY p.n DESC, p.key
LIMIT 10
""",
)
def _skew_probe(spark, sf_dir):
    """Heavy-hitter probe for a join/agg key — the diagnostic run before
    choosing a salt factor or bucketing layout: top-10 keys with exact
    counts, parts-per-million share, and multiple-of-mean (all integer
    ratios, canonicalizer-proof). Plan: one key-count aggregation (the
    same partial-agg shuffle the real join would pay), a 1-row
    broadcast stats cross-join, TakeOrderedAndProject top-k. At 100 TB
    this is the cheap dry-run that tells you whether AQE skew split
    suffices or the key needs salting (operators/rollup.salted_agg /
    salted_join)."""
    o = table(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = per_key.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").cast("long").alias("max_n"),
    )
    return (
        per_key.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "n",
            F.floor(F.col("n") * 1000000 / F.col("total")).cast("long").alias("share_ppm"),
            F.floor(F.col("n") * F.col("n_keys") / F.col("total")).cast("long").alias("x_mean"),
        )
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(10)
    )


# --- heavy hitters: sketch candidates, then exact-count candidates only -------

@query(
    "heavy_hitters_sketch",
    oracle="""
WITH keyed AS (
  SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 1 ELSE l_orderkey END AS key
  FROM lineitem
), stats AS (
  SELECT COUNT(*) AS total FROM keyed
), counts AS (
  SELECT key, COUNT(*) AS n FROM keyed GROUP BY key
)
SELECT c.key, c.n,
       CAST(FLOOR(c.n * 1000000 / s.total) AS BIGINT) AS share_ppm
FROM counts c, stats s
WHERE c.n * 4 > s.total
ORDER BY c.key
""",
)
def _heavy_hitters_sketch(spark, sf_dir):
    """Items above 25% frequency on a skewed key (90% of lineitem rows
    collapse onto key 1), found the way a 100 TB / high-cardinality key
    space requires: pass 1 is ``stat.freqItems`` — a bounded-memory
    Karp/Misra-Gries candidate sketch whose state never exceeds
    1/support counters per partition, where a full groupBy would
    materialize every distinct key; pass 2 exact-counts ONLY the
    (≤ 1/support) candidates via a broadcast semi-join. The sketch may
    over-admit (superset guarantee, partitioning-dependent) but never
    misses, so the exact filter ``n·4 > total`` makes the result
    deterministic — and the oracle can be plain exact SQL."""
    from pyspark import StorageLevel

    hot = F.when(F.col("l_orderkey") % 10 != 0, F.lit(1)).otherwise(
        F.col("l_orderkey")
    )
    # three consumers (sketch pass, candidate-count join, total agg) —
    # persist the 1-column projection so the fact scans once. The
    # returned frame is lazy, so this call cannot unpersist its own
    # cache; instead each invocation evicts the PREVIOUS one, bounding
    # a long-lived session to one cached projection (bench.py's
    # clearCache covers the last).
    li = (
        table(spark, sf_dir, "lineitem")
        .select(hot.alias("key"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev = getattr(_heavy_hitters_sketch, "_pinned", None)
    if prev is not None:
        prev.unpersist()
    _heavy_hitters_sketch._pinned = li
    cands = li.stat.freqItems(["key"], 0.25).select(
        F.explode("key_freqItems").alias("key")
    )
    stats = li.agg(F.count(F.lit(1)).alias("total"))
    return (
        li.join(F.broadcast(cands), "key")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(stats))
        .where(F.col("n") * 4 > F.col("total"))
        .select(
            "key",
            "n",
            F.floor(F.col("n") * 1000000 / F.col("total"))
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("key")
    )


# --- global-percentile quality gate -------------------------------------------

@query(
    "quality_percentile_gate",
    oracle="""
WITH cut AS (SELECT quantile_cont(n_chars, 0.25) AS p25 FROM documents)
SELECT d.source,
       COUNT(*) AS n_kept,
       MIN(d.n_chars) AS min_chars,
       MAX(d.n_chars) AS max_chars
FROM documents d, cut
WHERE d.n_chars >= cut.p25
GROUP BY d.source
ORDER BY d.source
""",
)
def _quality_percentile_gate(spark, sf_dir):
    """'Keep the top 75% by quality signal' as a relative threshold:
    the cutoff is the corpus's own exact 25th percentile (Spark
    ``percentile`` ≙ DuckDB ``quantile_cont``, interpolation parity
    established by ``quantiles_exact``), computed as a 1-row aggregate
    and broadcast back over the scan — the percentile-gate pattern
    every absolute-threshold filter (doc_quality_filter) can't express
    when the score distribution drifts between crawls. At 100 TB swap
    the exact percentile for ``approx_percentile`` (single-pass sketch)
    — the plan shape (1-row broadcast + scan-side filter) is unchanged."""
    d = table(spark, sf_dir, "documents")
    cut = d.agg(F.percentile("n_chars", 0.25).alias("p25"))
    return (
        d.crossJoin(F.broadcast(cut))
        .where(F.col("n_chars") >= F.col("p25"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )
