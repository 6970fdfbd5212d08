"""Machine-derive the grading-rotation bookkeeping (VERDICT r04 item 6).

The driver grades only the first 50 registry entries per round, so
registration order is a grading decision. Rounds 1-4 hand-maintained the
graded/green/never-graded sets in TODO.md and the counts drifted (193 vs
192). This script derives them from the artifacts themselves:

- registry size and order from ``ffi_etl_spark.queries`` (import-time),
- per-round driver results from ``CORRECTNESS_r*.json``,
- the proposed next PRIORITY_PREFIX (canaries + never-graded +
  latest-red re-grades, capped at 50).

Usage::

    python tools/rotation.py            # human summary
    python tools/rotation.py --json     # machine form

No Spark session is started — importing the registry only registers
callables.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CANARIES = (
    "survey_pipeline",
    "census_merge",
    "dedup_minhash",
    "tpch_q1",
    "pretraining_corpus",
)
GRADING_CAP = 50


def load_rounds() -> dict[int, dict[str, dict]]:
    rounds: dict[int, dict[str, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            rounds[int(m.group(1))] = json.load(f)
    return rounds


def is_green(row: dict) -> bool:
    """Full green = rows+schema+hash all true and no err.

    Rows-only queries (no oracle) get rows_match graded with
    hash_match false/None — count those as green only if err is null
    and rows matched (the driver's weaker check).
    """
    if row.get("err"):
        return False
    if row.get("hash_match"):
        return True
    # rows-only path: driver records rows_match without a hash
    return bool(row.get("rows_match")) and row.get("hash_match") is None


def derive() -> dict:
    from ffi_etl_spark import queries as Q

    registry = list(Q.QUERIES)
    oracles = set(Q.ORACLES)
    rounds = load_rounds()

    graded: dict[str, int] = {}  # name -> latest round graded
    green_ever: set[str] = set()
    latest: dict[str, dict] = {}
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            graded[name] = rnd
            latest[name] = {**row, "round": rnd}
            if is_green(row):
                green_ever.add(name)

    never_graded = [n for n in registry if n not in graded]
    latest_red = [
        n for n in registry if n in latest and not is_green(latest[n])
    ]
    rows_only = [n for n in registry if n not in oracles]

    proposed = list(CANARIES)
    for n in latest_red + never_graded:
        if n not in proposed:
            proposed.append(n)
    # fill remaining slots with oldest-graded greens (freshness rotation)
    if len(proposed) < GRADING_CAP:
        by_age = sorted(
            (n for n in registry if n in graded and n not in proposed),
            key=lambda n: graded[n],
        )
        proposed.extend(by_age[: GRADING_CAP - len(proposed)])
    proposed = proposed[:GRADING_CAP]

    return {
        "registry_size": len(registry),
        "oracle_count": len(oracles & set(registry)),
        "rows_only": rows_only,
        "rounds_seen": sorted(rounds),
        "graded_ever": len(graded),
        "green_ever": len(green_ever),
        "never_graded": never_graded,
        "latest_red": latest_red,
        "proposed_prefix": proposed,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    d = derive()
    if args.json:
        print(json.dumps(d, indent=2))
        return
    print(f"registry: {d['registry_size']} queries, "
          f"{d['oracle_count']} full-oracle, "
          f"{len(d['rows_only'])} rows-only")
    print(f"graded ever: {d['graded_ever']}  green ever: {d['green_ever']}")
    print(f"never graded ({len(d['never_graded'])}): "
          + ", ".join(d["never_graded"]))
    print(f"latest red ({len(d['latest_red'])}): "
          + ", ".join(d["latest_red"]))
    print(f"rows-only ({len(d['rows_only'])}): " + ", ".join(d["rows_only"]))
    print(f"proposed next prefix ({len(d['proposed_prefix'])}):")
    for n in d["proposed_prefix"]:
        print(f"  {n}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        # piping into `head` closes stdout early — that is how this
        # report is normally read, not an error
        import os
        os.dup2(os.open(os.devnull, os.O_WRONLY), 1)
