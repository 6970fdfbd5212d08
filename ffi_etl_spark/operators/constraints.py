"""Declarative data-quality constraint checking (Deequ/dbt-test shape).

A constraint suite compiles to ONE aggregation over ONE scan of the
audited table: row-level rules (not-null / accepted-values / range /
regex / arbitrary predicate) become ``count_if`` columns of a single
agg; uniqueness rules become ``count - count_distinct`` terms of the
same agg; referential rules pre-join the (broadcast) parent key sets
onto the scan so their violation counts ride the same pass. At 100 TB
the whole suite costs one table scan plus K broadcast hash joins —
never one job per rule (the naive loop a 1000-executor cluster cannot
afford), and the output is K rows.

The reference swallowed malformed rows silently (SURVEY.md §2.11);
this operator is the engine's explicit form of the same concern:
declare expectations, count violations, gate the pipeline on the
result.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint. ``kind`` selects the compilation:

    - ``not_null``: ``col`` must not be NULL
    - ``in_set``: non-null ``col`` must be one of ``values``
    - ``range``: non-null ``col`` must satisfy ``lo <= col <= hi``
    - ``regex``: non-null ``col`` must FULLY match ``pattern`` (the
      pattern is anchored as ``^(?:pattern)$`` — a contains-match
      would silently under-count violations)
    - ``unique``: no two rows share a non-null ``col`` value
    - ``fk``: non-null ``col`` must exist in ``parent``'s ``parent_key``
    - ``predicate``: rows must satisfy the given boolean ``expr``
      string; a row where the expr evaluates to NULL is counted as a
      VIOLATION (an expectation the engine could not confirm fails
      loudly, mirroring the explicit isNotNull policy of the other
      kinds)
    """

    name: str
    kind: str
    col: str | None = None
    values: tuple = field(default=())
    lo: object = None
    hi: object = None
    pattern: str | None = None
    parent: DataFrame | None = None
    parent_key: str | None = None
    expr: str | None = None


def _violation(rule: Rule, probe_col: str | None) -> Column:
    c = F.col(rule.col) if rule.col else None
    if rule.kind == "not_null":
        bad = c.isNull()
    elif rule.kind == "in_set":
        bad = c.isNotNull() & ~c.isin(*rule.values)
    elif rule.kind == "range":
        bad = c.isNotNull() & ~c.between(rule.lo, rule.hi)
    elif rule.kind == "regex":
        bad = c.isNotNull() & ~c.rlike(f"^(?:{rule.pattern})$")
    elif rule.kind == "fk":
        bad = c.isNotNull() & F.col(probe_col).isNull()
    elif rule.kind == "predicate":
        bad = ~F.coalesce(F.expr(rule.expr), F.lit(False))
    else:
        raise ValueError(f"unknown rule kind: {rule.kind!r}")
    return F.count_if(bad)


_COL_KINDS = ("not_null", "in_set", "range", "regex", "unique", "fk")


def _validate_rules(rules: list[Rule]) -> None:
    """Fail fast with NAMED errors on malformed suites (ADVICE r04):
    a missing ``col`` otherwise surfaces as an AttributeError deep in
    compilation, an empty ``in_set`` values tuple as an opaque py4j
    error from ``isin()``, and two rules sharing a name silently
    collide in the aggregate alias namespace (the second rule's count
    would shadow the first's)."""
    seen: set[str] = set()
    for r in rules:
        if r.name in seen:
            raise ValueError(f"duplicate rule name {r.name!r}: alias "
                             "columns are keyed by name, so the suite "
                             "would silently report one rule twice")
        seen.add(r.name)
        if r.kind in _COL_KINDS and r.col is None:
            raise ValueError(f"{r.kind} rule {r.name!r} needs col")
        if r.kind == "in_set" and not r.values:
            raise ValueError(f"in_set rule {r.name!r} needs a non-empty "
                             "values tuple (an empty set would flag every "
                             "non-null row — say that with a predicate rule "
                             "if it is really meant)")
        if r.kind == "range" and (r.lo is None or r.hi is None):
            # between(lo, NULL) evaluates NULL and count_if would
            # silently skip it — an open-ended bound must be written as
            # a predicate rule, not left half-specified here
            raise ValueError(f"range rule {r.name!r} needs both lo and hi")
        if r.kind == "regex" and r.pattern is None:
            raise ValueError(f"regex rule {r.name!r} needs pattern")
        if r.kind == "predicate" and r.expr is None:
            raise ValueError(f"predicate rule {r.name!r} needs expr")


def check_constraints(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate a constraint suite in one pass.

    Returns one row per rule: ``rule`` (name), ``n_checked`` (table
    row count), ``n_violations``. Deterministic long-format output,
    ordered by rule name. Malformed rules (missing fields, empty
    in_set values, duplicate names) raise ValueError up front.
    """
    _validate_rules(rules)
    probe_names: dict[str, str] = {}
    scan = df
    for i, r in enumerate(rules):
        if r.kind == "fk":
            if r.parent is None or r.parent_key is None or r.col is None:
                raise ValueError(f"fk rule {r.name!r} needs col, parent, parent_key")
            probe = f"__fk_probe_{i}"
            keys = (
                r.parent.select(F.col(r.parent_key).alias(probe))
                .where(F.col(probe).isNotNull())
                .distinct()
            )
            scan = scan.join(
                F.broadcast(keys), scan[r.col] == keys[probe], "left"
            )
            probe_names[r.name] = probe

    aggs = [F.count(F.lit(1)).alias("__n_checked")]
    unique_rules = []
    for r in rules:
        if r.kind == "unique":
            # non-null duplicates: count(col) - count(distinct col)
            aggs.append(F.count(F.col(r.col)).alias(f"__cnt_{r.name}"))
            aggs.append(
                F.countDistinct(F.col(r.col)).alias(f"__dst_{r.name}")
            )
            unique_rules.append(r.name)
        else:
            aggs.append(_violation(r, probe_names.get(r.name)).alias(f"__v_{r.name}"))

    wide = scan.agg(*aggs)
    rows = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.col("__n_checked").alias("n_checked"),
            (
                (F.col(f"__cnt_{r.name}") - F.col(f"__dst_{r.name}"))
                if r.name in unique_rules
                else F.col(f"__v_{r.name}")
            ).alias("n_violations"),
        )
        for r in rules
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.rule", "r.n_checked", "r.n_violations")
        .orderBy("rule")
    )
