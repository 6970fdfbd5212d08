"""Maintain a per-user profile aggregate incrementally — batch and stream.

The nightly-refresh problem at 100 TB: the base fact history is too
large to rescan, but the per-group profile (counts, sums, min/max) is
small. Every distributive aggregate is MERGEABLE, so the refresh is
agg(new batch) merged onto the STORED profile — O(groups), never
O(history). This example runs the same maintenance twice:

1. BATCH: simulate three daily arrivals of the events table, folding
   each into the stored profile via
   operators/ivm.py::merge_grouped_partials, then prove the final
   profile is bit-identical to a full recomputation.
2. STREAM: drain the same arrivals through
   streaming/profile.py::stream_profile_merge (foreachBatch + batch-id
   ledger — exactly-once even though foreachBatch is at-least-once)
   and prove it converges to the same table.

Run:

    python examples/maintain_user_profiles.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ffi_etl_spark.catalog import table
from ffi_etl_spark.operators.ivm import merge_grouped_partials
from ffi_etl_spark.session import get_session
from ffi_etl_spark.streaming.events import stream_events
from ffi_etl_spark.streaming.profile import stream_profile_merge

KEYS = ["user_id", "event_type"]
SPEC = {
    "n_events": "sum",
    "value_cents": "sum",
    "value_min": "min",
    "value_max": "max",
}


def profile_agg(df):
    cents = F.floor(F.col("value") * 100).cast("long")
    return df.groupBy(*KEYS).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents).alias("value_cents"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


def _key(r):
    return (r.user_id, r.event_type)


def _vals(r):
    return (r.n_events, r.value_cents, r.value_min, r.value_max)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_session("maintain-user-profiles")
    ev = table(spark, args.sf_dir, "events")
    cuts = list(
        ev.selectExpr("percentile_approx(ts, array(0.33, 0.66)) c").collect()[0]["c"]
    )
    tranches = [
        ev.filter(F.col("ts") <= F.lit(cuts[0])),
        ev.filter((F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))),
        ev.filter(F.col("ts") > F.lit(cuts[1])),
    ]

    # --- batch maintenance: fold each arrival into the stored profile
    profile = None
    for i, tr in enumerate(tranches):
        part = profile_agg(tr)
        profile = part if profile is None else merge_grouped_partials(
            profile, part, KEYS, SPEC
        )
        n = profile.count()
        print(f"batch arrival {i}: profile now {n} groups")

    direct = {(_key(r)): _vals(r) for r in profile_agg(ev).collect()}
    got = {(_key(r)): _vals(r) for r in profile.collect()}
    assert got == direct, "batch IVM diverged from full recompute"
    print(f"batch IVM == full recompute over {len(direct)} groups: OK")

    # --- streaming maintenance: same arrivals via foreachBatch + ledger
    work = tempfile.mkdtemp(prefix="ivm_profiles_")
    src, target, ckpt = (os.path.join(work, d) for d in ("src", "profile", "ckpt"))
    try:
        for i, tr in enumerate(tranches):
            tr.write.mode("append").parquet(src)
            stream_profile_merge(
                stream_events(spark, src), target, ckpt, KEYS, profile_agg, SPEC
            )
            t = spark.read.parquet(target)
            ledger = t.agg(F.max("_merged_through_batch")).collect()[0][0]
            print(f"stream drain {i}: {t.count()} groups, ledger batch {ledger}")
        got_s = {
            (_key(r)): _vals(r)
            for r in spark.read.parquet(target).drop("_merged_through_batch").collect()
        }
        assert got_s == direct, "streaming IVM diverged from full recompute"
        print(f"streaming IVM == full recompute over {len(direct)} groups: OK")
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
