"""Every queries_pkg module must be importable DIRECTLY (round 12).

The registration modules import oracle helpers from earlier siblings at
decoration time (round12 ← round7/extensions, round5 ← round4, …). Before
queries_pkg/__init__.py imported the modules in registry order, a direct
``import ffi_etl_spark.queries_pkg.<X>`` as the FIRST touch of the
package left X partially initialized while the registry pulled in later
siblings that import from X — an order-dependent ImportError that bit
``pytest tests/test_round12.py tests/test_round9.py`` run in isolation.

Each module is imported in a FRESH interpreter (the failure only exists
on first touch), no Spark session needed.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODULES = [
    "reference_surface",
    "extensions",
    "olap_spines",
    "olap_spines2",
    "breadth",
    "profiling",
    "behavioral",
    "datamix",
    "audit",
    "round4",
    "analytics",
    "round4b",
    "round4c",
    "round5",
    "fam_modeleval",
    "fam_sketches",
    "fam_textsel",
    "fam_retrieval_events",
    "round6",
    "round7",
    "round8",
    "round9",
    "round12",
]


def test_registry_order_matches_init():
    """queries.py and queries_pkg/__init__.py must list the same modules
    in the same order — the __init__ ordering is what makes direct
    imports safe, the queries.py ordering is what the driver grades."""
    import ffi_etl_spark.queries  # noqa: F401 — ensure both executed

    src_q = open(os.path.join(REPO, "ffi_etl_spark", "queries.py")).read()
    src_i = open(
        os.path.join(REPO, "ffi_etl_spark", "queries_pkg", "__init__.py")
    ).read()
    pos_q = [src_q.index(f"\n    {m},") for m in MODULES]
    pos_i = [src_i.index(f"\n    {m},") for m in MODULES]
    assert pos_q == sorted(pos_q), "queries.py list out of MODULES order"
    assert pos_i == sorted(pos_i), "__init__.py list out of MODULES order"


def test_every_queries_pkg_module_imports_directly():
    for m in MODULES:
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                f"import ffi_etl_spark.queries_pkg.{m}; "
                "import ffi_etl_spark.queries as q; "
                "assert len(q.QUERIES) >= 264",
            ],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert proc.returncode == 0, f"direct import of {m} failed:\n{proc.stderr[-2000:]}"
