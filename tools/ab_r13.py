"""Round-13 interleaved A/B harness.

Runs named plan-variant builders in ROTATION (variant order re-drawn
each round) so host/co-tenant drift — the documented 2-4x hourly swing
on this container (BASELINE.md, OPTIMIZATION_r12.md §Final bench) —
hits every variant equally. Per draw it records wall seconds AND the
Spark job count via setJobGroup/statusTracker (the load-independent
structural measure that caught the round-12 Lloyd wash).

Usage from an experiment script:

    from tools.ab_r13 import run_ab
    run_ab(spark, {"old": build_old, "new": build_new}, draws=5)

Each builder takes no args and returns a DataFrame; the timed action is
a ``count()`` on it (the bench's own action) unless ``action="noop"``.
"""

from __future__ import annotations

import sys
import time


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2.0


_CALLS = [0]  # session-unique group ids: two run_ab calls in one session
# must never share a group id, or getJobIdsForGroup mixes their jobs


def run_ab(spark, variants: dict, draws: int = 5, action: str = "count") -> dict:
    _CALLS[0] += 1
    sc = spark.sparkContext
    times: dict[str, list[float]] = {n: [] for n in variants}
    jobs: dict[str, list[int]] = {n: [] for n in variants}
    names = list(variants)
    for d in range(draws):
        # rotate the start so no variant always runs first-in-round
        order = names[d % len(names):] + names[: d % len(names)]
        for name in order:
            group = f"ab{_CALLS[0]}_{name}_{d}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = variants[name]()
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            sc.setJobGroup(None, None)
            times[name].append(dt)
            jobs[name].append(len(sc.statusTracker().getJobIdsForGroup(group)))
    out = {}
    for name in names:
        out[name] = {
            "median_sec": round(_median(times[name]), 3),
            "draws_sec": [round(t, 3) for t in times[name]],
            "jobs": jobs[name],
        }
        print(
            f"# {name}: median {out[name]['median_sec']}s "
            f"draws={out[name]['draws_sec']} jobs={jobs[name]}",
            file=sys.stderr,
        )
    return out
