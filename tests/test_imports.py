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

Round 13 (ADVICE r12): the module list is PARSED out of queries.py with
``ast`` instead of hand-maintained — a module registered in the real
lists can no longer silently escape the direct-import lock, and the
ordering check binds to the actual import statement, not to the first
similarly-indented substring anywhere in the file.
"""

from __future__ import annotations

import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG_DIR = os.path.join(REPO, "ffi_etl_spark", "queries_pkg")


def _parsed_import_list(path: str) -> list[str]:
    """The names of the one ``from ffi_etl_spark.queries_pkg import (…)``
    statement in ``path``, in source order (ast preserves it)."""
    tree = ast.parse(open(path).read())
    lists = [
        [a.name for a in node.names]
        for node in ast.walk(tree)
        if isinstance(node, ast.ImportFrom)
        and node.module == "ffi_etl_spark.queries_pkg"
    ]
    assert len(lists) == 1, (
        f"{path}: expected exactly one 'from ffi_etl_spark.queries_pkg "
        f"import (…)' statement, found {len(lists)}"
    )
    return lists[0]


MODULES = _parsed_import_list(os.path.join(REPO, "ffi_etl_spark", "queries.py"))


def test_registry_order_matches_init():
    """queries.py and queries_pkg/__init__.py must list the same modules
    in the same order — the __init__ ordering is what makes direct
    imports safe, the queries.py ordering is what the driver grades."""
    init_list = _parsed_import_list(os.path.join(PKG_DIR, "__init__.py"))
    assert MODULES == init_list, (
        "queries.py and queries_pkg/__init__.py import lists differ "
        "(same modules, same order required)"
    )


def test_module_list_is_complete():
    """Every .py file in queries_pkg/ must appear in the registry import
    list — a new registration module that is never imported would
    silently drop its queries from the graded registry."""
    files = sorted(
        f[:-3]
        for f in os.listdir(PKG_DIR)
        if f.endswith(".py") and f != "__init__.py"
    )
    assert sorted(MODULES) == files, (
        "queries_pkg/ files and the queries.py import list diverged: "
        f"only-on-disk={sorted(set(files) - set(MODULES))}, "
        f"only-in-list={sorted(set(MODULES) - set(files))}"
    )


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
