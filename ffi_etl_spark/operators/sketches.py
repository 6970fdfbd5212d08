"""Count-min sketch: fixed-memory frequency estimation.

The mergeable-sketch counterpart to ``stat.freqItems``
(queries_pkg/profiling.py::heavy_hitters_sketch): where freqItems finds
WHICH keys are frequent, a count-min sketch answers "how often does
key k occur" for ANY k with bounded memory — d×w counters total,
regardless of key cardinality. At 100 TB the sketch build is one
map-side-combinable aggregation whose shuffle volume is capped at
d×w×partitions partial rows (vs a full per-key groupBy materializing
every distinct key), and the finished d×w table broadcasts anywhere a
frequency estimate is needed (rate limiting, skew pre-detection,
approximate joins).

Hashes are the engine's md5 idiom (functions parity: same expression
runs on DuckDB), so the sketch — and therefore every estimate — is
bit-reproducible across engines and partitionings. Estimates carry the
classic one-sided guarantee: ``est >= true``, with overcount bounded
by (rows/w) per hash row w.h.p. — the invariant the tests and the
oracle query pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(key: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-``row``'s bucket for ``key``: md5 of a row-salted rendering,
    first 8 hex digits mod width — the deterministic_sample idiom, so
    DuckDB computes the identical bucket."""
    salted = F.concat(F.lit(f"cms{row}_"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % width
    ).cast("int")


def countmin_build(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """(row, bucket, n): the d×w counter table. One narrow explode
    (depth rows per input) into one aggregation — map-side partials
    collapse each partition to ≤ d×w rows before the exchange."""
    slots = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_bucket(F.col(key_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(slots).alias("s"))
        .groupBy(F.col("s.row").alias("row"), F.col("s.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, cms_est) for each probe key: min over the d row counters.
    The sketch is d×w rows — always broadcast; probes stay distributed,
    so estimating a billion keys is a narrow pass + broadcast join."""
    slots = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_bucket(F.col(key_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probe_slots = probes.select(F.col(key_col), F.explode(slots).alias("s")).select(
        key_col, F.col("s.row").alias("row"), F.col("s.bucket").alias("bucket")
    )
    return (
        probe_slots.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        # an empty bucket means the key never occurred: count 0
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_est"))
    )


HLL_P = 10  # 2^10 = 1024 registers
HLL_TAIL_BITS = 60 - HLL_P  # md5_int60 leaves a 50-bit tail


def hll_scale_constant() -> float:
    """``α_m · m² · 2^(tail_bits+1)`` folded to ONE double, driver-side,
    so both engines receive the identical literal and the estimate is a
    single division by the exact integer ``z_scaled``."""
    m = 1 << HLL_P
    alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m * float(1 << (HLL_TAIL_BITS + 1))


def hll_registers(
    df: DataFrame, key_col: str, group_cols: tuple[str, ...]
) -> DataFrame:
    """Per-group HyperLogLog register table — the mergeable-sketch
    counterpart to COUNT(DISTINCT): (group..., bucket, reg) with
    ``reg`` = max leading-zero rank observed in the bucket.

    Determinism: the hash is the engine's md5 idiom (``md5_int60`` —
    60 bits, cross-engine exact), bucket = hv mod m, and the rank is
    ``tail_bits + 1 − length(bin(tail))`` — pure integer/string ops
    both engines compute bit-identically (probed: Spark ``bin`` ==
    DuckDB ``bin`` digit-for-digit). Spark's own ``approx_count_
    distinct`` is the production fast path but its HLL++ registers
    are engine-private; THIS sketch is differentially testable and
    mergeable across engines.

    Scale shape: one narrow map + one (group, bucket)-keyed aggregate
    whose map-side partials cap each partition's shuffle contribution
    at m rows per group — the classic fixed-memory distinct sketch.
    Registers MERGE by MAX: union register tables from shards/days and
    re-aggregate to combine sketches without re-reading data.
    """
    from ffi_etl_spark.functions.hashing import md5_int60

    m = 1 << HLL_P
    hv = md5_int60(F.col(key_col).cast("string"))
    tail = F.shiftright(hv, HLL_P)
    rank = F.when(tail == 0, F.lit(HLL_TAIL_BITS + 1)).otherwise(
        F.lit(HLL_TAIL_BITS + 1) - F.length(F.bin(tail))
    )
    return (
        df.select(*group_cols, (hv % m).alias("bucket"), rank.alias("_r"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_r").cast("int").alias("reg"))
    )


def hll_estimate(registers: DataFrame, group_cols: tuple[str, ...]) -> DataFrame:
    """Collapse a register table to the raw HLL cardinality estimate.

    All accumulation is integer: each register contributes
    ``2^(tail_bits+1 − reg)`` (an exact BIGINT via shiftleft; empty
    registers contribute ``2^(tail_bits+1)``), so ``z_scaled`` =
    ``2^(tail_bits+1) · Σ 2^−reg`` is an exact integer under ANY
    aggregation order. The estimate is then ONE double division,
    ``C / z_scaled`` with ``C = α_m · m² · 2^(tail_bits+1)`` folded to
    a single Python literal — bit-identical on any engine.

    This is the RAW estimator (Flajolet α_m correction only): no
    small-range linear-counting or large-range correction is applied,
    but ``n_zero`` is emitted so callers can apply linear counting
    downstream (it needs ln — transcendental, so it stays out of the
    hash-gated surface per the oracle-parity rules in TODO.md).

    Output: (group..., used_registers, n_zero, z_scaled, hll_estimate).
    """
    m = 1 << HLL_P
    b1 = HLL_TAIL_BITS + 1
    c_lit = hll_scale_constant()
    term = F.expr(f"shiftleft(cast(1 as bigint), cast({b1} - reg as int))")
    z = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("used_registers"),
        F.sum(term).cast("long").alias("_zp"),
    )
    z_scaled = F.col("_zp") + (F.lit(m) - F.col("used_registers")) * F.lit(1 << b1)
    n_zero = (F.lit(m) - F.col("used_registers")).cast("long")
    # linear counting for the small-range regime (raw HLL biases high
    # when n ≲ 2.5m): m·ln(m/V), V = empty registers. ln is
    # transcendental — NOT bit-identical cross-engine — so it ships as
    # a %.6e fixed-precision STRING (the token_entropy/pagerank rule;
    # flake budget quantified in queries_pkg/audit.py). NULL when V=0
    # (regime where the raw estimate is the right answer anyway).
    lc = F.when(
        n_zero > 0,
        F.format_string(
            "%.6e", F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double"))
        ),
    )
    return z.select(
        *group_cols,
        "used_registers",
        n_zero.alias("n_zero"),
        z_scaled.cast("long").alias("z_scaled"),
        (F.lit(c_lit) / z_scaled.cast("double")).alias("hll_estimate"),
        lc.alias("lc_estimate_s"),
    )


def quantile_summary(
    df: DataFrame,
    value_col: str = "value",
    id_col: str = "event_id",
    n_shards: int = 8,
    k: int = 64,
) -> DataFrame:
    """Phase 1 of the deterministic mergeable quantile summary: shard
    the rows by md5(id) (modeling the partition-local summaries a
    100 TB job builds with ``sortWithinPartitions`` — md5 shards make
    the construction partitioning-independent here), rank each shard
    on the (value, id) total order, and keep every ``k``-th element
    plus the shard maximum. Output: (shard, value, id, shard_rank,
    shard_n) — ≤ n/k + n_shards rows, the summary a pipeline PERSISTS
    per partition/day and merges later (the IVM story for quantiles,
    beside KMV's for distincts; Spark's approx_percentile sketch is
    engine-private, THIS one is bit-reproducible on any engine).

    Everything is exact integer/identity arithmetic: ranks are
    ROW_NUMBER over a total order, no floats touch the construction.
    """
    from ffi_etl_spark.functions.hashing import md5_int32

    from pyspark.sql import Window

    shard = F.pmod(md5_int32(F.col(id_col).cast("string")), F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy(value_col, id_col)
    ranked = (
        df.select(F.col(value_col), F.col(id_col), shard.alias("shard"))
        .withColumn("shard_rank", F.row_number().over(w))
        .withColumn("shard_n", F.count(F.lit(1)).over(Window.partitionBy("shard")))
    )
    return ranked.filter(
        (F.pmod(F.col("shard_rank"), F.lit(k)) == 0)
        | (F.col("shard_rank") == F.col("shard_n"))
    ).select("shard", value_col, id_col, "shard_rank", "shard_n")


def quantile_summary_query(
    summary: DataFrame,
    total_n,
    quantiles: list[float],
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 64,
    part_cols: tuple[str, ...] = ("shard",),
) -> DataFrame:
    """Phase 2: answer quantile queries from a merged summary. Each
    summary element's global rank is ESTIMATED with pure integers:
    its exact own-shard rank plus ``k ×`` (count of OTHER shards'
    summary elements strictly below it on the (value, id) total
    order) — every foreign summary element stands for the ≤ k rows
    at-or-below it, so the estimate errs by at most k per foreign
    shard. The answer for quantile q is the element whose estimated
    rank is nearest ``ceil(q·N)`` (ties to the smaller element).

    The candidate join is summary × summary — quadratic in the
    SUMMARY (n/k rows), never the data; at 100 TB with k sized so
    summaries stay ~10⁵ rows this is a trivially small stage.
    ``total_n`` is a 1-row DataFrame with column ``n`` (exact count).
    Output: (q_label, est_value, est_id, est_rank, target_rank) — the
    answering element's id rides along so callers can compute its
    exact global rank cheaply.

    ``part_cols`` names the summary's part identity: ("shard",) for a
    one-shot build (quantile_summary), ("batch_id", "shard") for the
    streaming accumulation where every micro-batch contributes its own
    parts — the estimator only needs "same part ⇒ exact rank, foreign
    part ⇒ ≤ k error", so it works unchanged over any partition of the
    data; the error bound scales with the number of PARTS."""
    from pyspark import StorageLevel

    # the summary feeds BOTH sides of the estimate self-join; unpinned,
    # its lineage (the corpus-wide rank pass) would execute twice. In
    # production phase 1 is a stored table and this is moot; for a
    # composed plan the pin keeps the construction single-pass.
    summary = summary.persist(StorageLevel.MEMORY_AND_DISK)
    a = summary.alias("a")
    b = summary.alias("b")
    same_part = None
    for c in part_cols:
        eq = F.col(f"b.{c}") == F.col(f"a.{c}")
        same_part = eq if same_part is None else (same_part & eq)
    below = (
        a.join(
            b,
            (~same_part)
            & (
                (F.col(f"b.{value_col}") < F.col(f"a.{value_col}"))
                | (
                    (F.col(f"b.{value_col}") == F.col(f"a.{value_col}"))
                    & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
                )
            ),
            "left",
        )
        .groupBy(
            F.col(f"a.{value_col}").alias("value"),
            F.col(f"a.{id_col}").alias("id"),
            F.col("a.shard_rank").alias("own_rank"),
        )
        .agg(F.count(F.col(f"b.{id_col}")).alias("n_below"))
        .select(
            "value",
            "id",
            (F.col("own_rank") + F.lit(k) * F.col("n_below")).alias("est_rank"),
        )
    )
    # one explode over the 1-row total, NOT one union branch per
    # quantile — each branch would carry its own copy of the count
    # aggregate's subtree (q full scans of the source at scale)
    target_structs = F.array(
        *[
            F.struct(
                F.lit(f"p{int(q * 100)}").alias("q_label"),
                F.lit(float(q)).alias("q"),
            )
            for q in quantiles
        ]
    )
    targets = total_n.select(
        F.explode(target_structs).alias("_t"), F.col("n")
    ).select(
        F.col("_t.q_label").alias("q_label"),
        F.ceil(F.col("_t.q") * F.col("n")).cast("long").alias("target_rank"),
    )
    best = (
        below.crossJoin(F.broadcast(targets))
        .groupBy("q_label", "target_rank")
        .agg(
            F.min(
                F.struct(
                    F.abs(F.col("est_rank") - F.col("target_rank")).alias("d"),
                    F.col("value"),
                    F.col("id"),
                    F.col("est_rank"),
                )
            ).alias("c")
        )
    )
    return best.select(
        "q_label",
        F.col("c.value").alias("est_value"),
        F.col("c.id").alias("est_id"),
        F.col("c.est_rank").alias("est_rank"),
        "target_rank",
    )


def compact_quantile_summary(
    summary: DataFrame,
    k: int,
    stride: int,
    value_col: str = "value",
    id_col: str = "event_id",
    part_cols: tuple[str, ...] = ("shard",),
) -> DataFrame:
    """Compact a many-part quantile summary into ONE part at coarser
    spacing — the maintenance step a long-running stream needs because
    the estimator's error grows with the part count (k × parts).

    Mechanics, all exact integers: estimate each element's global rank
    with the standard own-rank + k·(foreign elements below) formula,
    order the whole summary on (est_rank, value, id), and keep every
    ``stride``-th element plus the maximum. The kept elements carry
    ``shard_rank = est_rank`` under a single part identity, so
    ``quantile_summary_query(part_cols=("part",))`` answers from the
    compacted table with NO foreign-part correction.

    Error honesty: a pre-compaction estimate errs ≤ k·(parts−1); the
    stride filter then spaces retained elements ≈ k·stride rows apart,
    so post-compaction answers err ≤ k·(parts−1) + k·stride/2 — size
    ``stride`` so that matches a fresh summary at the coarser k, and
    rebuild from raw data when even that drifts too far.

    Scale shape: summary × summary self-join (quadratic in the
    SUMMARY, never the data) + one global window over the summary-
    sized table (K rows — the post-aggregate global-window idiom, not
    a corpus window) + one narrow filter.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    summary = summary.persist(StorageLevel.MEMORY_AND_DISK)
    a, b = summary.alias("a"), summary.alias("b")
    same_part = None
    for c in part_cols:
        eq = F.col(f"b.{c}") == F.col(f"a.{c}")
        same_part = eq if same_part is None else (same_part & eq)
    est = (
        a.join(
            b,
            (~same_part)
            & (
                (F.col(f"b.{value_col}") < F.col(f"a.{value_col}"))
                | (
                    (F.col(f"b.{value_col}") == F.col(f"a.{value_col}"))
                    & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}"))
                )
            ),
            "left",
        )
        .groupBy(
            F.col(f"a.{value_col}").alias(value_col),
            F.col(f"a.{id_col}").alias(id_col),
            F.col("a.shard_rank").alias("own_rank"),
        )
        .agg(F.count(F.col(f"b.{id_col}")).alias("n_below"))
        .select(
            value_col,
            id_col,
            (F.col("own_rank") + F.lit(k) * F.col("n_below")).alias("est_rank"),
        )
    )
    w = Window.orderBy("est_rank", value_col, id_col)
    ranked = est.select(
        value_col, id_col, "est_rank", F.row_number().over(w).alias("_rn")
    )
    n_tot = ranked.agg(F.max("_rn").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n_tot))
        .filter((F.pmod(F.col("_rn"), F.lit(stride)) == 0) | (F.col("_rn") == F.col("_n")))
        .select(
            F.lit(0).alias("part"),
            F.col(value_col),
            F.col(id_col),
            F.col("est_rank").cast("long").alias("shard_rank"),
        )
    )
