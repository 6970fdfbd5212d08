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
