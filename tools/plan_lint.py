"""Registry-wide physical-plan lint: machine-check the scale rules.

The per-query plan guards in tests/ assert the intended shape of a
handful of headline plans; this tool sweeps EVERY registered query's
formatted physical plan for the three anti-patterns the engine bans,
so a new query that accidentally ships one fails CI instead of waiting
for a human plan audit:

1. ``CartesianProduct`` — an unconstrained cross join that is not the
   sanctioned 1-row-broadcast scalar-subquery pattern (those lower to
   ``BroadcastNestedLoopJoin`` over a 1-row side, which is allowed).
2. ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan. The
   only Python lanes allowed are Arrow-vectorized (``ArrowEvalPython``,
   ``MapInPandas`` / ``MapInArrow``, ``FlatMapGroupsInPandas`` /
   ``FlatMapGroupsInArrow``, ``PythonMapInArrow``) plus the one
   documented UDTF parity lane.
3. A ``Window`` / ``WindowGroupLimit`` / ``Sort`` whose direct child is
   an ``Exchange SinglePartition`` with NO reduction (aggregate /
   limit / top-k) anywhere beneath it — i.e. every raw row of some
   table funnels through ONE task before a window/sort. Post-agg
   K-row global windows (the collect-free scalar-subquery idiom) have
   an aggregate below the exchange and pass.

Usage: python tools/plan_lint.py [sf_dir] [query ...]
Exit 1 if any non-allowlisted finding. The allowlist pins each
intentional exception to its SPECIFIC finding pattern with a reason —
a new finding kind in an allowlisted query still fails.

Known limitation: only the RETURNED DataFrame's plan (main tree +
subquery trees) is linted. Plans a query builder executes eagerly
while constructing its result (iterative operators' per-round jobs,
localCheckpoint materializations) are not visible here; those interior
loops are covered by their operators' own plan-guard tests instead.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query -> (finding-regex, reason). ONLY findings matching the regex
# are waived — a different finding kind appearing in an allowlisted
# query still fails. Kept deliberately small; every entry is a
# documented design decision, not a waiver of the rule.
ALLOWLIST: dict[str, tuple[str, str]] = {
    # Python UDTF lane: the documented parity twin of a native op —
    # kept as the one exercised UDTF surface (SURVEY §: Spark-4 lanes).
    "props_map_explode": (
        r"BatchEvalPython",
        "documented Python UDTF parity lane (Spark-4 surface)",
    ),
    # Skyline phase 2: the single-task sort runs over the PHASE-1
    # PRUNED survivor union (~O(buckets·log m) rows), not the raw
    # table — the prune is a window-filter the lint cannot read as a
    # reduction (operators/skyline.py docstring, verdict-reviewed).
    "skyline_pareto": (
        r"Sort .* over Exchange SinglePartition",
        "global pass over bucket-pruned survivors only (two-phase skyline)",
    ),
}


def waive(name: str, findings: list[str]) -> list[str]:
    """Findings NOT covered by the query's allowlist entry."""
    if name not in ALLOWLIST:
        return findings
    pat = re.compile(ALLOWLIST[name][0])
    return [f for f in findings if not pat.search(f)]

_REDUCERS = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|TakeOrderedAndProject"
    r"|CollectLimit|GlobalLimit|LocalLimit|AggregateInPandas"
)
# prefix admits tree art AND the '* ' whole-stage-codegen marker
# ('+- * HashAggregate (3)'); depth uses only the tree-art length so a
# starred node sits at the same depth as its unstarred sibling
_NODE_RE = re.compile(
    r"^(?P<prefix>[\s:+|-]*)(?P<star>\* )?(?P<name>[A-Za-z][\w .]*?)\s*\((?P<id>\d+)\)\s*$"
)


def parse_tree(plan: str):
    """Parse the formatted-plan tree into (id, name, depth) rows plus a
    details map id -> block text. Depth = column of the node marker."""
    lines = plan.splitlines()
    nodes = []  # (line_no, depth, name, id)
    details: dict[int, str] = {}
    in_tree = False
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("== Physical Plan ==") or ln.lstrip().startswith("Subquery:"):
            # subquery sections ('===== Subqueries =====' blocks) carry
            # their own trees — lint them too, the scalar-subquery idiom
            # is sanctioned but not exempt
            in_tree = True
            i += 1
            continue
        if in_tree:
            m = _NODE_RE.match(ln)
            if m:
                prefix = m.group("prefix")
                # depth: marker column ("+- " / ":- "); root has none
                depth = len(prefix)
                nodes.append((depth, m.group("name").strip(), int(m.group("id"))))
                i += 1
                continue
            if ln.strip() == "":
                in_tree = False
            i += 1
            continue
        dm = re.match(r"^\((\d+)\)\s+(.*)$", ln)
        if dm:
            nid = int(dm.group(1))
            block = [ln]
            i += 1
            while i < len(lines) and not re.match(r"^\(\d+\)\s", lines[i]):
                block.append(lines[i])
                i += 1
            details[nid] = "\n".join(block)
            continue
        i += 1
    return nodes, details


def _subtree(nodes, idx):
    """Indices of the subtree rooted at nodes[idx] (all following nodes
    with strictly greater depth, up to the first sibling/ancestor)."""
    d0 = nodes[idx][0]
    out = []
    for j in range(idx + 1, len(nodes)):
        if nodes[j][0] <= d0:
            break
        out.append(j)
    return out


def _direct_children(nodes, idx):
    d0 = nodes[idx][0]
    sub = _subtree(nodes, idx)
    if not sub:
        return []
    child_depth = min(nodes[j][0] for j in sub)
    return [j for j in sub if nodes[j][0] == child_depth and child_depth > d0]


def lint_plan(plan: str) -> list[str]:
    nodes, details = parse_tree(plan)
    findings = []
    for idx, (_, name, nid) in enumerate(nodes):
        if name.startswith("CartesianProduct"):
            findings.append(f"CartesianProduct at node ({nid})")
        if name.startswith("BatchEvalPython"):  # includes BatchEvalPythonUDTF
            findings.append(f"row-at-a-time Python UDF (BatchEvalPython) at node ({nid})")
        if name.split()[0] in ("Window", "WindowGroupLimit", "Sort"):
            for c in _direct_children(nodes, idx):
                cname, cid = nodes[c][1], nodes[c][2]
                if not cname.startswith("Exchange"):
                    continue
                if "SinglePartition" not in details.get(cid, ""):
                    continue
                below = _subtree(nodes, c)
                reduced = any(_REDUCERS.match(nodes[j][1]) for j in below)
                if not reduced:
                    findings.append(
                        f"{name} ({nid}) over Exchange SinglePartition ({cid}) "
                        "with no reduction beneath — raw rows funnel through one task"
                    )
    return findings


def explain_formatted(spark, df) -> str:
    # same ExplainMode idiom as tools/plan_snapshot.py / tests — one
    # private-API call shape to migrate on a Spark upgrade, not two
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from ffi_etl_spark.session import get_session

    spark = get_session("plan-lint")
    qs = entry_mod.queries()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            findings = lint_plan(explain_formatted(spark, df))
        except Exception as e:  # noqa: BLE001 — surface, don't mask
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        waived = len(findings) - len(waive(name, findings))
        if waived:
            print(f"allow {name}: {waived} finding(s) — {ALLOWLIST[name][1]}")
        remaining = waive(name, findings)
        if remaining:
            bad += 1
            for f in remaining:
                print(f"FLAG  {name}: {f}")
        spark.catalog.clearCache()
    print(f"{bad} queries flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
