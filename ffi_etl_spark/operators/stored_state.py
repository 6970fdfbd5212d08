"""Shared layout stack for partition-bucketed stored state (VERDICT
r10 item 3).

Two operator families maintain long-lived parquet state partitioned by
a bucket column — the MinHash band index (``_bkt``, streaming/
ingest.py) and the IVF assignments table (``centroid_id``,
operators/similarity.py) — and by round 10 each had grown its own copy
of the same recipe: repartition-before-partitionBy on write (a raw
N-task write lands N files into EVERY touched bucket directory —
measured ~2k files/batch for the band index's first cut, and a ~3×
probe tax for the IVF build write), per-bucket incremental compaction
(read ONLY the crowded buckets, dynamic-partition-overwrite them back
as one file each), and self-describing layout constants. Two copies of
one recipe drift — the IVF side grew a content-hash identity in round
10 while the band index still pinned ``_nbkt`` only — so the recipe
lives here once and both families (and any later stateful family)
route through it.

Scale posture: every helper's cost tracks the TOUCHED buckets, never
the corpus — the write shuffles one batch, compaction reads only the
crowded partitions (partition-pruned), and the file-count discovery is
a driver-side listing the callers are expected to pay at most once per
sink lifetime (seed a counter, then maintain it from each append's own
touched-bucket set — see streaming/ann_ingest.py; a per-batch listing
of an ever-growing state tree is the object-store metadata cost ADVICE
r09/r10 flagged twice).

Cite: forward-maps the reference's write-full-refreshed-tables posture
(the overwrite table sink at utils.py:124-142) onto incrementally-
maintained partitioned state; the reference has no incremental
surface.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, path: str, part_col: str, mode: str = "error"
) -> None:
    """Write (or append) bucket-partitioned state with at most ONE
    file per touched bucket per write: ``partitionBy`` multiplies
    files by writing tasks × touched partitions, so the repartition on
    the partition column comes first. The shuffle it adds is one
    batch's rows — noise next to the per-bucket parquet-footer tax the
    file blowup would put on every later read (measured both times it
    was skipped: INGEST_r9's ~2k files/batch band index, and the ~3×
    IVF probe tax in tools/bench_ivf_stored.py)."""
    df.repartition(part_col).write.mode(mode).partitionBy(part_col).parquet(path)


def bucket_file_counts(df: DataFrame, part_col: str) -> Counter:
    """Files per bucket directory, from the frame's own planning-time
    file listing (``df.inputFiles()`` — driver-side metadata, no data
    scan; on object stores it is still a recursive listing of the
    whole tree, so callers seed a counter ONCE and maintain it from
    their appends' touched-bucket sets rather than re-listing per
    batch)."""
    pat = re.compile(rf"{re.escape(part_col)}=(\d+)/")
    counts: Counter = Counter()
    for f in df.inputFiles():
        m = pat.search(f)
        if m:
            counts[int(m.group(1))] += 1
    return counts


def crowded_buckets(
    df: DataFrame, part_col: str, files_per_bucket: int
) -> list[int]:
    """Buckets whose directory holds more than ``files_per_bucket``
    parquet files — the compaction work list."""
    return sorted(
        b
        for b, n in bucket_file_counts(df, part_col).items()
        if n > files_per_bucket
    )


def compact_buckets(
    spark, path: str, part_col: str, buckets: list[int]
) -> int:
    """Per-bucket incremental compaction: read ONLY the named buckets
    (partition-pruned), pin the rows (their source files are about to
    be replaced), and dynamic-partition-overwrite exactly those
    buckets back as one file each. Buckets not named are never read or
    rewritten, so compaction cost tracks the crowded fraction, not the
    corpus — an append-heavy bucket is rewritten once per
    ``files_per_bucket`` appends, a cold bucket never. Rewrites files
    only — never rows — so downstream results are bit-identical before
    and after (parity-gated by ``ann_ivf_churn`` and the streaming
    ingest locks). Returns the number of buckets compacted."""
    if not buckets:
        return 0
    rows = (
        spark.read.parquet(path)
        .filter(F.col(part_col).isin(buckets))
        .localCheckpoint(eager=True)
    )
    (
        rows.repartition(part_col)
        .write.partitionBy(part_col)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )
    return len(buckets)


# ---------------------------------------------------------------------------
# Atomic multi-directory swap (round 11): the aside→replace→drop commit
# protocol from streaming/profile.py, generalized to a LIST of
# directories that must replace together — the IVF index is a
# (centroids, assignments) pair, the MinHash state a (signatures,
# band-index) pair; replacing one table of a pair serves a mixed-era
# state, which the identity gates refuse rather than answer.
# ---------------------------------------------------------------------------

NEW_SUFFIX = ".__swap_new__"
OLD_SUFFIX = ".__swap_old__"


def recover_torn_swap(paths: list[str]) -> None:
    """Batch-start recovery for a torn ``commit_swap`` over *paths*.

    The protocol writes EVERY ``NEW_SUFFIX`` side dir fully before the
    first rename, so the recovery rule keys on the ``OLD_SUFFIX``
    markers: any present means the commit started with complete side
    dirs — roll FORWARD (finish the renames, drop the olds); side dirs
    without any old marker mean the crash hit mid-write — roll BACK
    (drop the partial side dirs; the live state was never touched).
    Either way the group ends coherent."""
    import os
    import shutil

    news = [p + NEW_SUFFIX for p in paths]
    olds = [p + OLD_SUFFIX for p in paths]
    if any(os.path.exists(o) for o in olds):
        for live, new in zip(paths, news):
            if os.path.exists(new):
                if os.path.exists(live):
                    old = live + OLD_SUFFIX
                    if not os.path.exists(old):
                        os.rename(live, old)
                    else:  # live and old both present: new is stale
                        shutil.rmtree(new)
                        continue
                os.rename(new, live)
        for o in olds:
            if os.path.exists(o):
                shutil.rmtree(o)
    else:
        for n in news:
            if os.path.exists(n):
                shutil.rmtree(n)


def commit_swap(paths: list[str]) -> None:
    """Atomically (crash-safely, paired with ``recover_torn_swap``)
    move every ``<path>.__swap_new__`` into place as ``<path>``: per
    path, rename live→old then new→live; drop the olds last. The
    caller must have FULLY written every side dir first — the first
    old marker is the commit point the recovery rule rolls forward
    from. Local filesystem only (os.rename atomicity); validate with
    profile._local_target before writing the side dirs."""
    import os
    import shutil

    for live in paths:
        new = live + NEW_SUFFIX
        if os.path.exists(live):
            os.rename(live, live + OLD_SUFFIX)
        os.rename(new, live)
    for live in paths:
        old = live + OLD_SUFFIX
        if os.path.exists(old):
            shutil.rmtree(old)
