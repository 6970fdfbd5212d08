"""tools/rotation.py — the grading-rotation bookkeeping derives the
right sets from CORRECTNESS artifacts (no Spark needed)."""

from __future__ import annotations

from tools.rotation import CANARIES, GRADING_CAP, derive, is_green


def test_is_green_semantics():
    assert is_green({"rows_match": True, "schema_match": True, "hash_match": True, "err": None})
    assert not is_green({"rows_match": True, "schema_match": True, "hash_match": False, "err": None})
    assert not is_green({"rows_match": True, "hash_match": True, "err": "no_oracle"})
    # rows-only: hash absent (None) but rows matched and no err
    assert is_green({"rows_match": True, "hash_match": None, "err": None})
    assert not is_green({"rows_match": False, "hash_match": None, "err": None})


def test_derive_against_real_artifacts():
    d = derive()
    # registry facts the session maintains
    assert d["registry_size"] >= 192
    assert d["oracle_count"] == d["registry_size"]  # round-5: 0 rows-only
    assert d["rows_only"] == []
    # proposed prefix: exactly the cap, canaries first, no duplicates
    p = d["proposed_prefix"]
    assert len(p) == GRADING_CAP == 50
    assert p[: len(CANARIES)] == list(CANARIES)
    assert len(set(p)) == len(p)
    # every latest-red and never-graded query that fits is in the prefix
    urgent = [n for n in d["latest_red"] + d["never_graded"] if n not in p]
    slots = GRADING_CAP - len(CANARIES)
    assert not urgent or len(d["latest_red"]) + len(d["never_graded"]) > slots


def test_check_oracle_json_report(tmp_path):
    """The --json flag writes a machine-readable per-query report
    (the GATE_LOCAL artifact contract)."""
    import json
    import os
    import subprocess
    import sys

    out = str(tmp_path / "report.json")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "check_oracle.py"),
            "/root/testdata/sf0.001",
            "tpch_q1",
            "--json",
            out,
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=repo,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rep = json.load(open(out))
    assert rep["n_queries"] == 1 and rep["n_fail"] == 0
    assert rep["results"]["tpch_q1"].startswith("pass")
