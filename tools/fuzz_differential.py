"""SQLancer-style differential fuzzer: seeded random queries, two engines.

Handwritten oracles only cover the queries someone thought to write.
This fuzzer generates random-but-reproducible SQL from a BIT-SAFE
grammar, runs the SAME string on Spark SQL (over the registered temp
views) and DuckDB (over the same parquet), and compares through the
exact canonicalizer the driver gate uses (tools/check_oracle.py) —
strict %.17g hashing included.

Bit-safe grammar, by the house parity rules:
- integer and string columns only (no raw DOUBLE columns, no
  timestamps — float sums are partition-order-dependent and NTZ
  formatting differs);
- aggregates: COUNT(*), COUNT(DISTINCT int), MIN/MAX of int or
  string, CAST(SUM(int) AS BIGINT) (DuckDB's HUGEINT rule);
- predicates: integer comparisons against sampled literals, string
  =/!=/IN against values actually present, AND/OR combinations, and
  IN (SELECT fk ...) semi-join subqueries on integer keys;
- GROUP BY only low-cardinality columns, or plain DISTINCT / global
  aggregates; optional HAVING on an exact COUNT(*); conditional
  aggregation as CAST(SUM(CASE int-pred THEN 1 ELSE 0) AS BIGINT);
- FK equi-joins and LEFT JOINs from a fixed key map;
- set operations (UNION/INTERSECT/EXCEPT, distinct set semantics on
  both engines) between two DISTINCT projections of one table;
- window functions (ROW_NUMBER/RANK/DENSE_RANK/LAG/cumulative SUM of
  ints) ordered by the FULL integer-column tuple: any rows still tied
  are identical on every selected and windowed column, so the output
  multiset is engine-independent even where per-row assignment isn't
  (the canon sorts rows);
- outer-join NULL edges (round-5 grammar): LEFT joins optionally carry
  an extra right-side ON predicate so unmatched (NULL-extended) rows
  actually occur even under intact FKs; RIGHT and FULL OUTER joins
  (WHERE restricted to the preserved side, or absent for FULL);
  NULL-skipping COUNT(col) beside COUNT(*); IS NULL / IS NOT NULL
  probes on the NULL-extensible side's key;
- GROUP BY ROLLUP / CUBE / GROUPING SETS (round-6 grammar): NULL
  grouping keys on the super-aggregate rows, GROUPING() flags cast to
  BIGINT on both engines, exact-integer aggregates only; HAVING
  COUNT(*) > 0 normalizes a REAL engine divergence the sweep found —
  Spark's Expand rewrite drops the ANSI grand-total row on empty
  input (see the production's QUIRK comment);
- correlated subqueries (round-6 grammar): scalar-in-SELECT /
  scalar-in-WHERE / [NOT] EXISTS over the FK key map — the
  decorrelation surface (COUNT-on-empty-group, NULL vs 0) pinned with
  exact BIGINT outputs;
- UNPIVOT (round-7 grammar): the standard wide-to-long syntax both
  engines parse, over derived non-null BIGINT measures with the name
  label selected — passthrough key + (nm, v) exactness;
- bag-semantics set operations (round-7 grammar): INTERSECT ALL /
  EXCEPT ALL / UNION ALL between two differently-predicated
  projections of one table (per-tuple multiplicity arithmetic);
- RANGE-framed windows (round-8 grammar): value-based frames over the
  date columns with INTERVAL bounds, and over integer keys with
  integer bounds — PEER-based frames are a pure function of the order
  VALUE, so the multiset is deterministic even under ties (no
  full-tuple order needed, unlike ROWS frames);
- INTERVAL arithmetic (round-8 grammar): date keys shifted by
  `+ INTERVAL n DAY|MONTH` before year/month/day extraction
  (end-of-month clamping under test) and interval-shifted TIMESTAMP
  literals in range predicates — both engines parse the bare
  `INTERVAL n UNIT` spelling (probed);
- GROUPING SETS × outer join (round-8 grammar): super-aggregates
  grouped on one preserved-side and one NULL-extended-side column, so
  data NULLs meet rollup NULLs in the same key — GROUPING() flags
  disambiguate and both engines' rewrites must agree under
  NULL-extended input; COUNT(col) rides beside COUNT(*) for the
  NULL-skipping edge;
- string functions inside group keys (round-9 grammar): substr /
  lower / upper / '||' concat as the GROUP BY expression itself —
  derived-key value agreement plus expression-grouping resolution
  (concat() deliberately avoided: DuckDB's skips NULL args, Spark's
  propagates — '||' NULL-propagates on both);
- EXISTS ∧/∨ NOT EXISTS pairs (round-9 grammar): the tpch_q4/q21
  decorrelation shape with independent child predicates, including
  the disjunctive spelling (probed on both engines);
- real HAVING over GROUPING SETS (round-9 grammar): COUNT/SUM
  comparisons and GROUPING() flags filtering super-aggregate rows;
- FILTER-clause aggregates (round-9 late grammar): the standard
  `agg FILTER (WHERE pred)` spelling beside its CASE-spelled twin
  column (the two rewrites must agree in value, cross-engine), with
  GROUP BY ALL sometimes standing in for the explicit key list and
  ORDER BY ALL for the output ordering — the SELECT-list resolution
  rules themselves under test (QUALIFY was probed and is DuckDB-only:
  Spark 4.1 fails to parse it, so it stays ungrammared — the fuzzer's
  contract is the SAME string on both engines);
- IS [NOT] DISTINCT FROM on NULL-extensible outer-join keys
  (round-9 late grammar): the null-safe comparison is not
  null-rejecting, so it keeps NULL-extended rows in play where a
  plain `=` silently reduces the join to inner — three-valued-logic
  agreement on exactly the rows WHERE usually destroys;
- windows OVER joins: the full-tuple-order argument survives a join —
  order by EVERY integer column of the joined row with explicit
  NULLS FIRST (Spark defaults NULLS FIRST ASC, DuckDB NULLS LAST:
  unstated NULL placement is exactly the cross-engine trap this
  production pins), select only the ordered columns, and tied rows
  are again identical on all selected + windowed columns.

Every engine-vs-engine mismatch under this grammar is a REAL bug in
one engine's query path (or in the harness), never float noise.

Usage: python tools/fuzz_differential.py [sf_dir] [n_cases] [seed0]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (table, int cols, low-card group cols, string cols)
TABLES = {
    "lineitem": {
        "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "groups": ["l_returnflag", "l_linestatus", "l_linenumber"],
        "strs": ["l_returnflag", "l_linestatus"],
    },
    "orders": {
        "ints": ["o_orderkey", "o_custkey"],
        "groups": ["o_orderstatus", "o_orderpriority"],
        "strs": ["o_orderstatus", "o_orderpriority"],
    },
    "customer": {
        "ints": ["c_custkey", "c_nationkey"],
        "groups": ["c_mktsegment", "c_nationkey"],
        "strs": ["c_mktsegment", "c_name"],
    },
    "part": {
        "ints": ["p_partkey", "p_size"],
        "groups": ["p_brand", "p_size"],
        "strs": ["p_brand", "p_type"],
    },
    "supplier": {
        "ints": ["s_suppkey", "s_nationkey"],
        "groups": ["s_nationkey"],
        "strs": ["s_name"],
    },
}

_STR_POOL = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"],
    "c_name": ["Customer#000000001"],
    "p_brand": ["Brand#11", "Brand#23", "Brand#34", "Brand#45", "Brand#55"],
    "p_type": ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"],
    "s_name": ["Supplier#000000001"],
}

_INT_LITS = [0, 1, 2, 3, 5, 10, 100, 1000, 5000]
_CMP = ["<", "<=", "=", ">", ">=", "!="]


def _int_pred(rng: random.Random, col: str) -> str:
    """The one integer-comparison template every production shares."""
    return f"{col} {rng.choice(_CMP)} {rng.choice(_INT_LITS)}"


# FK equi-join pairs: (left table, right table, join condition)
_JOINS = [
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("lineitem", "part", "l_partkey = p_partkey"),
    ("lineitem", "supplier", "l_suppkey = s_suppkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
]

# semi-join productions: local key column -> (other table, its key)
_SEMI = {
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "o_custkey": ("customer", "c_custkey"),
}

# correlated-subquery productions: parent table -> (parent key, child
# table, child FK) — the subquery correlates on key equality, the shape
# Spark's decorrelation and DuckDB's subquery flattening must agree on
_CORR = {
    "orders": ("o_orderkey", "lineitem", "l_orderkey"),
    "customer": ("c_custkey", "orders", "o_custkey"),
    "part": ("p_partkey", "lineitem", "l_partkey"),
    "supplier": ("s_suppkey", "lineitem", "l_suppkey"),
}


def _merged(a: dict, b: dict) -> dict:
    return {k: a[k] + b[k] for k in ("ints", "groups", "strs")}


def gen_query(rng: random.Random) -> str:
    join_how = None
    null_side = None  # the NULL-extensible side's column dict (outer joins)
    merged_ints: list[str] = []  # every int column of the joined row
    if rng.random() < 0.35:
        lt, rt, cond = rng.choice(_JOINS)
        join_how = rng.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
        extra = ""
        merged_ints = TABLES[lt]["ints"] + TABLES[rt]["ints"]
        if join_how == "JOIN":
            t = _merged(TABLES[lt], TABLES[rt])
        elif join_how == "LEFT JOIN":
            # WHERE/GROUP columns stay on the preserved (left) side: a
            # null-rejecting right-side predicate silently reduces the
            # query to an inner join. An extra right-side ON predicate
            # MANUFACTURES unmatched rows — with intact FKs the plain
            # LEFT JOIN never exercises the NULL-extension path at all.
            if rng.random() < 0.6:
                extra = f" AND {_int_pred(rng, rng.choice(TABLES[rt]['ints']))}"
            t = dict(TABLES[lt])
            null_side = TABLES[rt]
        elif join_how == "RIGHT JOIN":
            if rng.random() < 0.6:
                extra = f" AND {_int_pred(rng, rng.choice(TABLES[lt]['ints']))}"
            t = dict(TABLES[rt])
            null_side = TABLES[lt]
        else:  # FULL JOIN: any WHERE would drop one side's unmatched rows
            if rng.random() < 0.6:
                extra = f" AND {_int_pred(rng, rng.choice(TABLES[rt]['ints']))}"
            t = dict(TABLES[lt])
            null_side = TABLES[rt]
        frm = f"{lt} {join_how} {rt} ON {cond}{extra}"
    else:
        tname = rng.choice(sorted(TABLES))
        frm = tname
        t = TABLES[tname]

    preds = []
    if join_how in ("LEFT JOIN", "RIGHT JOIN") and rng.random() < 0.4:
        # NULL-edge probe on the NULL-extensible side's key: IS NULL is
        # the anti-join shape, IS NOT NULL the silent inner-join
        # reduction — both legal and engine-comparable
        preds.append(
            f"{rng.choice(null_side['ints'])} IS {rng.choice(['NULL', 'NOT NULL'])}"
        )
    if join_how in ("LEFT JOIN", "RIGHT JOIN") and rng.random() < 0.3:
        # IS [NOT] DISTINCT FROM on the NULL-extensible key (round-9
        # late grammar, probed on both engines): the null-safe
        # comparison is NOT null-rejecting, so unlike a plain `=` it
        # keeps NULL-extended rows in play — `x IS DISTINCT FROM lit`
        # is true for the unmatched rows, the exact three-valued-logic
        # edge a WHERE on an outer join usually destroys. Against a
        # preserved-side column, NULL-vs-value must compare false
        # without collapsing the join to inner.
        nk = rng.choice(null_side["ints"])
        neg = rng.choice(["", "NOT "])
        rhs = (
            str(rng.choice(_INT_LITS))
            if rng.random() < 0.6
            else rng.choice(t["ints"])
        )
        preds.append(f"{nk} IS {neg}DISTINCT FROM {rhs}")
    for _ in range(rng.randint(0, 2) if join_how != "FULL JOIN" else 0):
        # FULL JOIN takes no random WHERE: any predicate on one side's
        # columns is null-rejecting for the other side's unmatched rows
        # and would silently degrade the join — the NULL-group GROUP BY
        # below is the edge this production exists to exercise
        roll = rng.random()
        semi_keys = [c for c in t["ints"] if c in _SEMI]
        if roll < 0.15 and semi_keys:
            # IN (SELECT fk ...) semi-join on an integer key
            c = rng.choice(semi_keys)
            ot, ok_col = _SEMI[c]
            oc = rng.choice(TABLES[ot]["ints"])
            sub = f"SELECT {ok_col} FROM {ot} WHERE {_int_pred(rng, oc)}"
            neg = "NOT " if rng.random() < 0.3 else ""
            preds.append(f"{c} {neg}IN ({sub})")
        elif roll < 0.6:
            c = rng.choice(t["ints"])
            preds.append(_int_pred(rng, c))
        else:
            c = rng.choice(t["strs"])
            pool = _STR_POOL[c]
            if rng.random() < 0.5 and len(pool) > 1:
                vals = ", ".join(f"'{v}'" for v in rng.sample(pool, rng.randint(1, min(3, len(pool)))))
                preds.append(f"{c} IN ({vals})")
            else:
                op = rng.choice(["=", "!="])
                preds.append(f"{c} {op} '{rng.choice(pool)}'")
    where = ""
    if preds:
        glue = f" {rng.choice(['AND', 'OR'])} "
        where = " WHERE " + glue.join(preds)

    shape = rng.random()
    if join_how is None and shape < 0.06 and frm not in ("lineitem", "orders"):
        # round-12 grammar: INTERSECT ALL / EXCEPT ALL — BAG set
        # semantics (both probed on both engines). The `% m` key folds
        # rows onto shared tuples so multiplicities exceed 1, which is
        # exactly where ALL differs from DISTINCT: the engines'
        # bag-difference/intersection must agree on each tuple's COUNT,
        # not just its membership. Claims the date-rollup interval's
        # shadow (frm is never lineitem/orders here), which previously
        # fell through to the generic tail; selfcheck pins the arm.
        c = rng.choice(t["ints"])
        s = rng.choice(t["strs"])
        m = rng.choice([3, 5, 7])
        p1 = _int_pred(rng, rng.choice(t["ints"]))
        p2 = _int_pred(rng, rng.choice(t["ints"]))
        setop = rng.choice(["INTERSECT ALL", "EXCEPT ALL"])
        return (
            f"SELECT CAST({c} % {m} AS BIGINT) AS ia, {s} AS ib "
            f"FROM {frm} WHERE {p1} {setop} "
            f"SELECT CAST({c} % {m} AS BIGINT) AS ia, {s} AS ib "
            f"FROM {frm} WHERE {p2} ORDER BY ia, ib"
        )

    if join_how is None and 0.06 <= shape < 0.12 and frm not in (
        "lineitem", "orders"
    ):
        # round-12 grammar: FILTER (WHERE ...) composed with DISTINCT
        # aggregation (probed: both engines accept COUNT(DISTINCT x)
        # FILTER (WHERE p)). The filter can empty a group's input,
        # hitting COUNT-on-empty (= 0) and SUM-on-empty (= NULL)
        # simultaneously with the distinct-set dedup — the rewrite
        # (expand + filter vs direct) must agree on both edges.
        g = rng.choice(t["groups"])
        x = rng.choice(t["ints"])
        y = rng.choice(t["ints"])
        p1 = _int_pred(rng, rng.choice(t["ints"]))
        p2 = _int_pred(rng, rng.choice(t["ints"]))
        return (
            f"SELECT {g}, "
            f"CAST(COUNT(DISTINCT {x}) FILTER (WHERE {p1}) AS BIGINT) AS fd, "
            f"CAST(SUM({y}) FILTER (WHERE {p2}) AS BIGINT) AS fs, "
            f"CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM {frm}{where} GROUP BY {g} ORDER BY {g}"
        )

    if join_how is None and 0.21 <= shape < 0.26 and frm not in _CORR:
        # round-12 grammar: GROUP BY ALL + ORDER BY ALL (probed: both
        # engines resolve ALL to the non-aggregate select items /
        # every output column). The resolution itself is under test —
        # an engine inferring a different key set changes the result
        # shape, not a value. The keys are non-null ints/groups, so
        # ORDER BY ALL is total and an optional LIMIT stays
        # deterministic. frm is always lineitem here (_CORR covers the
        # other four tables); selfcheck pins the arm.
        g1, g2 = rng.sample(t["groups"], 2)
        x = rng.choice(t["ints"])
        lim = f" LIMIT {rng.choice([5, 10, 20])}" if rng.random() < 0.5 else ""
        return (
            f"SELECT {g1}, {g2}, CAST(SUM({x}) AS BIGINT) AS s, "
            f"CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM {frm}{where} GROUP BY ALL ORDER BY ALL{lim}"
        )

    if join_how is None and shape < 0.12 and frm in ("lineitem", "orders"):
        # date-function rollup: year/month/day extraction + date-range
        # predicates — the scalar-date surface engines disagree on
        # first (epoch rules, week numbering, trunc boundaries). The
        # testdata date columns are midnight-valued NTZ timestamps
        # (TODO.md quirk), so year()/month()/day() are exact integers
        # on both engines and TIMESTAMP literals compare cleanly.
        dcol = {"lineitem": "l_shipdate", "orders": "o_orderdate"}[frm]
        # INTERVAL arithmetic (round-8 grammar): shift the date key
        # before extraction — month arithmetic's end-of-month clamping
        # and day arithmetic across year boundaries are where the
        # engines' date kernels must agree; both parse the bare
        # `INTERVAL n UNIT` literal (probed round 8).
        key_expr = dcol
        if rng.random() < 0.5:
            n_units = rng.choice([1, 7, 30, 45, 90])
            unit = rng.choice(["DAY", "DAY", "MONTH"])
            key_expr = f"({dcol} + INTERVAL {n_units} {unit})"
        parts = [("year", f"year({key_expr})"), ("month", f"month({key_expr})")]
        if rng.random() < 0.4:
            parts.append(("day", f"day({key_expr})"))
        keys = ", ".join(f"CAST({e} AS BIGINT) AS {n}" for n, e in parts)
        grp = ", ".join(e for _, e in parts)
        okeys = ", ".join(n for n, _ in parts)
        agg_col = rng.choice(t["ints"])
        dpred = ""
        if rng.random() < 0.6:
            y = rng.choice([1993, 1994, 1995, 1996, 1997])
            op = rng.choice([">=", "<"])
            lit = f"TIMESTAMP '{y}-01-01 00:00:00'"
            if rng.random() < 0.5:
                # INTERVAL arithmetic on the literal side of the range
                # predicate (round-8 grammar)
                sign = rng.choice(["+", "-"])
                lit = f"{lit} {sign} INTERVAL {rng.choice([30, 90, 180])} DAY"
            dpred = f"{dcol} {op} {lit}"
        wparts = [x for x in ([dpred] if dpred else [])]
        if rng.random() < 0.4:
            wparts.append(_int_pred(rng, rng.choice(t["ints"])))
        w2 = (" WHERE " + " AND ".join(wparts)) if wparts else ""
        return (
            f"SELECT {keys}, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST({agg_col} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm}{w2} GROUP BY {grp} ORDER BY {okeys}"
        )

    if join_how is None and 0.12 <= shape < 0.165:
        # set operations UNDER windows (round-10 grammar, VERDICT r09
        # item 7): a window function computed over the RESULT of a set
        # operation — the analyzer must resolve the window against the
        # set-op's output schema and both engines' distinct-set
        # rewrites must feed the window the same multiset. DISTINCT
        # set semantics make the rows unique tuples, so the full-
        # column ORDER BY (NULLS FIRST pinned — the cross-engine
        # default trap) is a total order and per-row window values are
        # engine-independent, not just the multiset.
        cols = rng.sample(
            t["ints"] + t["groups"], rng.randint(1, 2)
        )
        cols = list(dict.fromkeys(cols))  # dedupe, keep order
        sel = ", ".join(cols)
        w1 = f" WHERE {_int_pred(rng, rng.choice(t['ints']))}"
        w2 = f" WHERE {_int_pred(rng, rng.choice(t['ints']))}"
        setop = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
        okey = ", ".join(f"{c} NULLS FIRST" for c in cols)
        kind = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "cumsum"])
        if kind == "cumsum":
            target = cols[0]
            expr = (
                f"SUM({target}) OVER (ORDER BY {okey} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            )
            if target not in t["ints"]:
                expr = f"COUNT(*) OVER (ORDER BY {okey} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        else:
            expr = f"{kind} OVER (ORDER BY {okey})"
        return (
            f"SELECT {sel}, CAST({expr} AS BIGINT) AS wv FROM "
            f"(SELECT DISTINCT {sel} FROM {frm}{w1} {setop} "
            f"SELECT DISTINCT {sel} FROM {frm}{w2}) u ORDER BY {sel}"
        )

    if join_how is None and 0.165 <= shape < 0.21:
        # set operations with MISMATCHED-BUT-COERCIBLE branch types
        # (round-10 grammar): the two branches produce different
        # integer widths (SMALLINT/INT/BIGINT/DECIMAL(12,0)) and the
        # engines' set-op type-widening rules must agree BEFORE the
        # distinct/bag comparison happens — a coercion difference
        # changes which tuples compare equal. The outer CAST(v AS
        # BIGINT) normalizes the RESULT dtype for the canon (DECIMAL
        # would surface as object dtype); the coercion under test is
        # inside the set op. `% m` keeps SMALLINT casts in range on
        # both engines (both raise on overflow — ANSI Spark, DuckDB).
        c1, c2 = rng.choice(t["ints"]), rng.choice(t["ints"])
        narrow = rng.choice(
            [f"CAST({c1} % 100 AS SMALLINT)", f"CAST({c1} AS INT)",
             f"CAST({c1} % 1000 AS SMALLINT)"]
        )
        wide = rng.choice(
            [f"CAST({c2} AS BIGINT)", f"CAST({c2} AS DECIMAL(12,0))"]
        )
        if rng.random() < 0.5:
            narrow, wide = wide, narrow
        w1 = f" WHERE {_int_pred(rng, rng.choice(t['ints']))}"
        w2 = f" WHERE {_int_pred(rng, rng.choice(t['ints']))}"
        setop = rng.choice(
            ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "EXCEPT ALL"]
        )
        carry = ""
        s = ""
        if rng.random() < 0.4:
            sc = rng.choice(t["strs"])
            carry = f", {sc} AS s"
            s = ", s"
        return (
            f"SELECT CAST(v AS BIGINT) AS v{s} FROM "
            f"(SELECT {narrow} AS v{carry} FROM {frm}{w1} {setop} "
            f"SELECT {wide} AS v{carry} FROM {frm}{w2}) u ORDER BY v{s}"
        )

    if join_how is None and 0.21 <= shape < 0.26 and frm in _CORR:
        # COMPOSED correlated scalar subqueries in the SELECT list
        # (round-10 grammar): two independent scalar subqueries over
        # the same child with DIFFERENT predicates — each must
        # decorrelate into its own aggregate+join, not share a rewritten
        # subtree — one exercising COUNT-on-empty-group (= 0) and one
        # SUM-on-empty-group (= NULL) wrapped in COALESCE and composed
        # into arithmetic with a parent column. A WHERE variant
        # compares the two subqueries against each other (both probed).
        pk, child, ck = _CORR[frm]
        ci = TABLES[child]["ints"]
        p1 = _int_pred(rng, rng.choice(ci))
        p2 = _int_pred(rng, rng.choice(ci))
        s1 = (
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {child} "
            f"WHERE {ck} = {pk} AND {p1})"
        )
        s2 = (
            f"COALESCE((SELECT CAST(SUM(CAST({rng.choice(ci)} AS BIGINT)) "
            f"AS BIGINT) FROM {child} WHERE {ck} = {pk} AND {p2}), 0)"
        )
        if rng.random() < 0.3:
            # WHERE variant: subquery-vs-subquery arithmetic comparison
            glue = " AND " if where else " WHERE "
            mult = rng.choice([1, 2, 3])
            return (
                f"SELECT {pk} FROM {frm}{where}{glue}"
                f"{s1} * {mult} >= {s2} ORDER BY {pk}"
            )
        return (
            f"SELECT {pk}, {s1} AS s1, "
            f"{s2} + CAST({pk} AS BIGINT) AS s2 "
            f"FROM {frm}{where} ORDER BY {pk}"
        )

    if join_how is None and 0.26 <= shape < 0.31 and frm in _CORR:
        # LATERAL correlated aggregate subquery in FROM (round-10b
        # grammar, probed both engines): the lateral derived table
        # sees the parent row's columns — a 1-row global aggregate per
        # parent row, so the decorrelation is the scalar-subquery
        # rewrite surfaced through FROM-position syntax (Spark lowers
        # to the same aggregate+outer-join; DuckDB flattens). Both the
        # comma-LATERAL and JOIN LATERAL ... ON TRUE spellings parse
        # on both engines.
        pk, child, ck = _CORR[frm]
        ci = TABLES[child]["ints"]
        inner = f"{ck} = {pk} AND {_int_pred(rng, rng.choice(ci))}"
        aggs = [
            "CAST(COUNT(*) AS BIGINT) AS n",
            f"CAST(SUM(CAST({rng.choice(ci)} AS BIGINT)) AS BIGINT) AS s",
        ]
        if rng.random() < 0.4:
            aggs.append(f"MIN({rng.choice(ci)}) AS mn")
        lat = f"(SELECT {', '.join(aggs)} FROM {child} WHERE {inner})"
        sel_lat = ", ".join(
            "l." + a.rsplit(" AS ", 1)[1] for a in aggs
        )
        if rng.random() < 0.5:
            frm2 = f"{frm}, LATERAL {lat} l"
        else:
            frm2 = f"{frm} JOIN LATERAL {lat} l ON TRUE"
        return f"SELECT {pk}, {sel_lat} FROM {frm2}{where} ORDER BY {pk}"

    if join_how is None and 0.31 <= shape < 0.35:
        # VALUES inline table as a join dimension (round-10b grammar):
        # the literal row-set's types must coerce identically on both
        # engines before the equi-join on a derived key (int mod k),
        # and the joined label rides into the group keys. A variant
        # joins through a CASE-valued ON predicate — the non-column
        # join condition both planners must evaluate, not pushdown-
        # mangle.
        c = rng.choice(t["ints"])
        k = rng.choice([2, 3, 4])
        labels = ", ".join(f"({i}, 'b{i}')" for i in range(k))
        agg_col = rng.choice(t["ints"])
        if rng.random() < 0.3:
            cpred = _int_pred(rng, rng.choice(t["ints"]))
            return (
                f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
                f"CAST(SUM(CAST({agg_col} AS BIGINT)) AS BIGINT) AS s "
                f"FROM {frm} JOIN (VALUES {labels}) AS v(a, b) "
                f"ON {c} % {k} = v.a AND "
                f"(CASE WHEN {cpred} THEN 1 ELSE 0 END) = 1"
            )
        return (
            f"SELECT v.b, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST({agg_col} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm} JOIN (VALUES {labels}) AS v(a, b) "
            f"ON {c} % {k} = v.a{where} GROUP BY v.b ORDER BY v.b"
        )

    # Rounds 10d/11b live in [0.92, 0.98), six 1% arms — the tail the
    # earlier rounds never claimed. The 10d first cut reused
    # [0.186, 0.24), which was already consumed: [0.186, 0.21) by the
    # unconditional round-10 set-op branch above, [0.21, 0.26) by the
    # _CORR-gated scalar-subquery branch for 4 of the tables — so the
    # ordered-LIMIT grammar NEVER generated and the other two generated
    # only on the _CORR-miss slivers (ADVICE r10).
    # test_fuzz_grammar_coverage locks every arm to ≥1 generating seed
    # in a fixed sweep.
    if join_how is None and 0.92 <= shape < 0.93:
        # ordered-LIMIT subquery (round-10d grammar): a deterministic
        # top-k derived table (ORDER BY a UNIQUE key, so the row set
        # is well-defined) consumed by an aggregate or joined back to
        # the fact — the Sort+Limit must stay INSIDE the subquery on
        # both engines (an engine that pushes the outer join/agg below
        # the limit changes the row set, not just the plan).
        key = t["ints"][0]
        k = rng.choice([10, 20, 50, 100])
        direction = rng.choice(["ASC", "DESC"])
        pred = ""
        if rng.random() < 0.5:
            pred = f" WHERE {_int_pred(rng, rng.choice(t['ints']))}"
        # ORDER BY the FULL int tuple: the leading key alone is not
        # unique on every table (lineitem repeats l_orderkey), and a
        # LIMIT under a non-total order is a nondeterministic row set,
        # not an engine-comparable query
        okey = ", ".join(f"{c} {direction}" for c in t["ints"])
        sub = (
            f"SELECT {key}, {rng.choice(t['ints'])} AS v FROM {frm}{pred} "
            f"ORDER BY {okey} LIMIT {k}"
        )
        if rng.random() < 0.35:
            # set op UNDER two LIMIT-ordered derived tables (round-11
            # grammar): each branch is a deterministic top-k (total
            # order over the full int tuple), and the parenthesized
            # query-term spelling forces both planners to keep each
            # Sort+Limit INSIDE its branch before the set op's
            # distinct/bag semantics apply (probed both engines).
            k2 = rng.choice([10, 20, 50])
            pred2 = ""
            if rng.random() < 0.5:
                pred2 = f" WHERE {_int_pred(rng, rng.choice(t['ints']))}"
            okey2 = ", ".join(
                f"{c} {rng.choice(['ASC', 'DESC'])}" for c in t["ints"]
            )
            sub2 = (
                f"SELECT {key}, {rng.choice(t['ints'])} AS v FROM {frm}{pred2} "
                f"ORDER BY {okey2} LIMIT {k2}"
            )
            setop = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
            return (
                f"SELECT CAST(SUM(CAST(v AS BIGINT)) AS BIGINT) AS s, "
                f"CAST(COUNT(*) AS BIGINT) AS n, MIN({key}) AS mn, "
                f"MAX({key}) AS mx FROM (({sub}) {setop} ({sub2})) t"
            )
        if rng.random() < 0.5 and key in _SEMI:
            ot, ok_col = _SEMI[key]
            return (
                f"SELECT t.{key}, CAST(COUNT(*) AS BIGINT) AS n FROM "
                f"({sub}) t JOIN {ot} ON {ok_col} = t.{key} "
                f"GROUP BY t.{key} ORDER BY t.{key}"
            )
        return (
            f"SELECT CAST(SUM(CAST(v AS BIGINT)) AS BIGINT) AS s, "
            f"CAST(COUNT(*) AS BIGINT) AS n, MIN({key}) AS mn, "
            f"MAX({key}) AS mx FROM ({sub}) t"
        )

    if join_how is None and 0.93 <= shape < 0.94:
        # multiple DISTINCT aggregates in one SELECT (round-10d
        # grammar): three COUNT(DISTINCT ...) over different columns
        # beside a plain SUM forces Spark's Expand-based
        # multi-distinct rewrite (one input row fans out per distinct
        # group) while DuckDB aggregates directly — the rewrite must
        # be value-invisible.
        gcol = rng.choice(t["groups"])
        d1, d2 = rng.sample(t["ints"], min(2, len(t["ints"])))[0], rng.choice(t["strs"])
        d3 = rng.choice(t["ints"])
        s = rng.choice(t["ints"])
        return (
            f"SELECT {gcol}, CAST(COUNT(DISTINCT {d1}) AS BIGINT) AS da, "
            f"CAST(COUNT(DISTINCT {d2}) AS BIGINT) AS db, "
            f"CAST(COUNT(DISTINCT {d3}) AS BIGINT) AS dc, "
            f"CAST(SUM(CAST({s} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm}{where} GROUP BY {gcol} ORDER BY {gcol}"
        )

    if join_how is None and 0.94 <= shape < 0.95:
        # HAVING with NO GROUP BY (round-10d grammar): legal ANSI — a
        # global aggregate filtered by its own result (one-or-zero
        # output rows); the engines must agree the grand-total row
        # exists before HAVING filters it. The comma-join spelling
        # (implicit cross join + WHERE equi-predicate) rides in the
        # other branch — the planner must recover the equi-join.
        if rng.random() < 0.5:
            thresh = rng.choice([0, 3, 10, 100])
            return (
                f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
                f"CAST(SUM(CAST({rng.choice(t['ints'])} AS BIGINT)) AS BIGINT) "
                f"AS s FROM {frm}{where} HAVING COUNT(*) > {thresh}"
            )
        lt, rt, cond = rng.choice(_JOINS)
        gc = rng.choice(TABLES[rt]["groups"] or TABLES[lt]["groups"])
        p = _int_pred(rng, rng.choice(TABLES[lt]["ints"]))
        return (
            f"SELECT {gc}, CAST(COUNT(*) AS BIGINT) AS n FROM {lt}, {rt} "
            f"WHERE {cond} AND {p} GROUP BY {gc} ORDER BY {gc}"
        )

    if join_how is None and 0.95 <= shape < 0.96:
        # computed GROUP BY keys (round-11b grammar): a CASE cascade or
        # a scalar-string-function chain (translate/lpad/repeat/substr)
        # as the grouping expression, repeated verbatim in SELECT — the
        # engines must agree the two occurrences are the same
        # expression AND evaluate the string kernels identically
        # (probed both engines). ASCII-only inputs: the string pools
        # are fixed ASCII, so no collation/Unicode edge rides in.
        acol = rng.choice(t["ints"])
        if rng.random() < 0.5:
            c = rng.choice(t["ints"])
            lo, hi = sorted(rng.sample([0, 1, 3, 5, 10, 100], 2))
            kexpr = (
                f"CASE WHEN {c} < {lo} THEN 'lo' WHEN {c} < {hi} "
                f"THEN 'mid' ELSE 'hi' END"
            )
        else:
            sc = rng.choice(t["strs"])
            inner = rng.choice(
                [f"lpad({sc}, {rng.choice([3, 5, 8])}, 'x')",
                 f"repeat({sc}, 2)",
                 f"substr({sc}, {rng.choice([1, 2, 3])}, "
                 f"{rng.choice([4, 6, 8])})"]
            )
            kexpr = rng.choice(
                [f"translate({inner}, 'AEIOU', 'aeiou')", f"upper({inner})",
                 inner]
            )
        return (
            f"SELECT {kexpr} AS kk, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST({acol} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm}{where} GROUP BY {kexpr} ORDER BY kk"
        )

    if join_how is None and 0.96 <= shape < 0.97:
        # ordinal GROUP BY / ORDER BY + HAVING on the aggregate
        # (round-11b grammar): GROUP BY 1 must resolve to the FIRST
        # select item (an expression, not just a column) and ORDER BY
        # ordinals to their positions on both engines — a resolution
        # difference regroups the whole result (probed both engines).
        c = rng.choice(t["ints"])
        m = rng.choice([2, 3, 5, 7])
        acol = rng.choice(t["ints"])
        having = ""
        if rng.random() < 0.5:
            having = f" HAVING COUNT(*) > {rng.choice([0, 2, 10])}"
        return (
            f"SELECT {c} % {m} AS m, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST({acol} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm}{where} GROUP BY 1{having} ORDER BY 1, 2, 3"
        )

    if join_how is None and 0.97 <= shape < 0.98:
        # share-of-total: a GLOBAL (empty OVER) window over a grouped
        # derived table (round-11b grammar) — the window input is the
        # aggregate's K rows, so the partitionless frame is bounded,
        # and both engines must agree the window evaluates AFTER the
        # group-by and sees every group (probed both engines). Exact
        # integers: share is reported as (n, total), never a ratio.
        gcol = rng.choice(t["groups"])
        acol = rng.choice(t["ints"])
        inner = (
            f"SELECT {gcol} AS g, COUNT(*) AS n, "
            f"SUM(CAST({acol} AS BIGINT)) AS s "
            f"FROM {frm}{where} GROUP BY {gcol}"
        )
        tgt = rng.choice(["n", "s"])
        fn = rng.choice(["SUM", "MAX", "MIN", "COUNT"])
        return (
            f"SELECT g, CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s, "
            f"CAST({fn}({tgt}) OVER () AS BIGINT) AS w "
            f"FROM ({inner}) t ORDER BY g"
        )

    if join_how is None and 0.98 <= shape < 0.9875:
        # ROLLUP / CUBE keyword spellings (round-11 grammar): the
        # existing grouping-sets arm covers only the explicit GROUPING
        # SETS list — ROLLUP(a, b) and CUBE(a, b) expand to DIFFERENT
        # set lists (prefixes vs the power set) and both expansions
        # must agree before the NULL-group rows can compare. GROUPING()
        # columns ride along so a super-aggregate NULL is
        # distinguishable from a genuine NULL group on both engines
        # (probed both engines).
        gcands = list(dict.fromkeys(t["groups"] + t["strs"]))
        gcols = rng.sample(gcands, min(2, len(gcands)))
        op = rng.choice(["ROLLUP", "CUBE"])
        sel_g = ", ".join(gcols)
        grpids = ", ".join(
            f"CAST(GROUPING({c}) AS BIGINT) AS g{i}" for i, c in enumerate(gcols)
        )
        acol = rng.choice(t["ints"])
        # HAVING COUNT(*) > 0 is UNCONDITIONAL (the grouping-sets arm's
        # rule): over an EMPTY filtered input the engines genuinely
        # diverge on the () super-aggregate — DuckDB emits the ANSI
        # grand-total row (COUNT=0), Spark emits nothing (measured,
        # seeds 2000139/2001089/2001828). The clause excludes exactly
        # that row by construction, like the NULLS FIRST pins.
        having = f" HAVING COUNT(*) > {rng.choice([0, 0, 2, 10])}"
        return (
            f"SELECT {sel_g}, {grpids}, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST({acol} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm}{where} GROUP BY {op} ({sel_g}){having} "
            f"ORDER BY {', '.join(f'{c} NULLS FIRST' for c in gcols)}, "
            f"{', '.join(f'g{i}' for i in range(len(gcols)))}"
        )

    semi_sel = [c for c in t["ints"] if c in _SEMI]
    if join_how is None and 0.99 <= shape < 0.995 and semi_sel:
        # correlated EXISTS / IN in the SELECT list (round-11 grammar):
        # the subquery result is a PROJECTED value, not a filter — the
        # engines' decorrelation must produce a per-row boolean without
        # changing the outer row set (a rewrite to a join that drops or
        # dups outer rows shifts the SUM, not just a plan). CASE folds
        # it to an exact integer for the canon (probed both engines).
        key = rng.choice(semi_sel)
        ot, ok_col = _SEMI[key]
        opred = _int_pred(rng, rng.choice(TABLES[ot]["ints"]))
        if rng.random() < 0.5:
            probe = (
                f"EXISTS (SELECT 1 FROM {ot} WHERE {ok_col} = {key} "
                f"AND {opred})"
            )
        else:
            probe = f"{key} IN (SELECT {ok_col} FROM {ot} WHERE {opred})"
        gcol = rng.choice(t["groups"])
        return (
            f"SELECT {gcol}, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CASE WHEN {probe} THEN 1 ELSE 0 END) AS BIGINT) AS ex "
            f"FROM {frm}{where} GROUP BY {gcol} ORDER BY {gcol}"
        )

    if join_how is None and 0.99 <= shape:
        # integer-kernel scalar surfaces (rounds 11c/11d; probed both
        # engines): negative-operand modulo (both engines take the
        # dividend's sign), ABS/SIGN composition, bitwise AND/OR,
        # GREATEST/LEAST + NULLIF/COALESCE chains — each as an
        # exact-integer GROUP BY key so a kernel difference regroups
        # rows, not just shifts a value — plus the 11d predicate
        # surfaces: IN-list WITH NULL (the three-valued-logic edge:
        # NOT IN over a NULL member is never true, IN falls back to
        # unknown — folded through CASE so the per-row truth value is
        # OUTPUT, not just a filter), BETWEEN with an expression
        # bound, and aggregate-expression HAVING beside a nested-CASE
        # SUM. Division is deliberately ABSENT: bare `/` then CAST
        # genuinely diverges (Spark truncates the double, DuckDB
        # rounds — measured), and `//` vs DIV don't share a spelling;
        # the house FLOOR() rule covers that surface elsewhere.
        c = rng.choice(t["ints"])
        acol = rng.choice(t["ints"])
        arm = rng.randrange(6)
        if arm == 3:
            # IN / NOT IN with a NULL member, as CASE-folded counts
            lits = ", ".join(
                str(x) for x in rng.sample(_INT_LITS, rng.randint(1, 3))
            )
            return (
                f"SELECT CAST(SUM(CASE WHEN {c} IN ({lits}, NULL) "
                f"THEN 1 ELSE 0 END) AS BIGINT) AS inn, "
                f"CAST(SUM(CASE WHEN {c} NOT IN ({lits}, NULL) "
                f"THEN 1 ELSE 0 END) AS BIGINT) AS ninn, "
                f"CAST(COUNT(*) AS BIGINT) AS n FROM {frm}{where}"
            )
        if arm == 4:
            # BETWEEN with an expression upper bound
            c2 = rng.choice(t["ints"])
            m1, m2 = rng.choice([(100, 50), (50, 25), (20, 10)])
            lo = rng.choice([0, 3, 10])
            return (
                f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
                f"CAST(SUM(CAST({acol} AS BIGINT)) AS BIGINT) AS s "
                f"FROM {frm} WHERE {c} % {m1} BETWEEN {lo} AND {c2} % {m2}"
            )
        if arm == 5:
            # nested CASE inside SUM + aggregate-expression HAVING
            gcol = rng.choice(t["groups"])
            p1 = _int_pred(rng, rng.choice(t["ints"]))
            p2 = _int_pred(rng, rng.choice(t["ints"]))
            return (
                f"SELECT {gcol}, CAST(SUM(CASE WHEN {p1} THEN "
                f"CASE WHEN {p2} THEN 2 ELSE 1 END ELSE 0 END) AS BIGINT) "
                f"AS s, CAST(COUNT(*) AS BIGINT) AS n FROM {frm}{where} "
                f"GROUP BY {gcol} HAVING SUM(CAST({acol} AS BIGINT)) "
                f"BETWEEN 0 AND 900000000 AND MIN({acol}) >= 0 "
                f"ORDER BY {gcol}"
            )
        if arm == 0:
            m = rng.choice([3, 5, 7])
            kexpr = f"(0 - {c}) % {m}"
            k2 = f"ABS({rng.choice(_INT_LITS)} - {c})"
        elif arm == 1:
            kexpr = f"{c} & {rng.choice([1, 3, 7, 15])}"
            k2 = f"{c} | {rng.choice([4, 8, 16])}"
        else:
            lit = rng.choice([5, 10, 25, 100])
            kexpr = f"GREATEST({c}, {lit})"
            k2 = f"COALESCE(NULLIF({c} % {rng.choice([3, 5])}, 0), 99)"
        return (
            f"SELECT CAST({kexpr} AS BIGINT) AS ka, "
            f"CAST({k2} AS BIGINT) AS kb, "
            f"CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST({acol} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm}{where} GROUP BY 1, 2 ORDER BY 1, 2"
        )

    if join_how is None and 0.35 <= shape < 0.385:
        # three-way set-op chain with NO parentheses (round-10c
        # grammar): ANSI gives INTERSECT higher precedence than
        # UNION/EXCEPT, and UNION/EXCEPT associate left — the
        # precedence-and-associativity resolution itself is the
        # surface under test (a precedence bug changes the result set,
        # not the parse). DISTINCT projections of one table under
        # three different predicates.
        cols = rng.sample(t["groups"], rng.randint(1, min(2, len(t["groups"]))))
        sel = ", ".join(cols)
        ws = [f" WHERE {_int_pred(rng, rng.choice(t['ints']))}" for _ in range(3)]
        op1, op2 = rng.sample(["UNION", "INTERSECT", "EXCEPT"], 2)
        return (
            f"SELECT DISTINCT {sel} FROM {frm}{ws[0]} {op1} "
            f"SELECT DISTINCT {sel} FROM {frm}{ws[1]} {op2} "
            f"SELECT DISTINCT {sel} FROM {frm}{ws[2]} ORDER BY {sel}"
        )

    if join_how is None and 0.385 <= shape < 0.41:
        # CTE defined once, consumed TWICE (round-10c grammar): both
        # engines must resolve the named subquery to the same relation
        # on both references (Spark inlines or reuses the subtree;
        # DuckDB materializes or inlines) — a self-join of a grouped
        # CTE makes any divergence a row-count change, not noise.
        key = rng.choice(t["ints"])
        n_min = rng.choice([1, 2, 3])
        return (
            f"WITH agg AS (SELECT {key}, CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM {frm}{where} GROUP BY {key}) "
            f"SELECT a.{key}, a.n, b.n AS n2 FROM agg a JOIN agg b "
            f"ON a.{key} = b.{key} WHERE a.n >= {n_min} "
            f"ORDER BY a.{key}"
        )

    if join_how is None and 0.41 <= shape < 0.43:
        # bounded RECURSIVE CTE (round-10c grammar; probed — Spark 4.1
        # supports WITH RECURSIVE): a generated integer sequence
        # joined against a small int column or aggregated — the
        # fixpoint iteration + UNION ALL accumulation semantics must
        # agree, and the join exercises the recursive relation as a
        # plain input downstream.
        n = rng.choice([5, 10, 20, 30])
        seq = (
            f"WITH RECURSIVE seq(x) AS (SELECT 1 UNION ALL "
            f"SELECT x + 1 FROM seq WHERE x < {n})"
        )
        if rng.random() < 0.5 and frm == "lineitem":
            return (
                f"{seq} SELECT seq.x, CAST(COUNT(*) AS BIGINT) AS n "
                f"FROM seq JOIN lineitem ON l_linenumber = seq.x "
                f"GROUP BY seq.x ORDER BY seq.x"
            )
        mod = rng.choice([2, 3, 7])
        return (
            f"{seq} SELECT CAST(SUM(x) AS BIGINT) AS s, "
            f"CAST(COUNT(*) AS BIGINT) AS c, "
            f"CAST(SUM(CASE WHEN x % {mod} = 0 THEN x ELSE 0 END) AS BIGINT) "
            f"AS sm FROM seq"
        )

    if join_how is None and 0.43 <= shape < 0.45:
        # NATURAL JOIN over aliased derived tables (round-10c grammar):
        # the shared-name key discovery runs on the DERIVED schemas, so
        # both engines must agree which columns participate (exactly
        # the renamed key) and that the join collapses it to one
        # output column.
        joins = [j for j in _JOINS]
        lt, rt, cond = rng.choice(joins)
        lk, rk = cond.split(" = ")
        lsel = f"SELECT {lk} AS k, {rng.choice(TABLES[lt]['ints'])} AS lv FROM {lt}"
        rsel = f"SELECT {rk} AS k, {rng.choice(TABLES[rt]['strs'])} AS rs FROM {rt}"
        return (
            f"SELECT k, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST(lv AS BIGINT)) AS BIGINT) AS s "
            f"FROM ({lsel}) a NATURAL JOIN ({rsel}) b "
            f"WHERE k < {rng.choice([100, 500, 1000])} "
            f"GROUP BY k HAVING COUNT(*) >= {rng.choice([1, 2])} ORDER BY k"
        )

    if (
        join_how in ("LEFT JOIN", "RIGHT JOIN", "FULL JOIN")
        and null_side is not None
        and 0.45 <= shape < 0.60
    ):
        # GROUPING SETS × outer join (round-8 grammar): super-aggregate
        # NULL keys MEET data NULLs from the join's NULL-extended side —
        # grouping on one preserved-side and one NULL-side column, a
        # data-NULL group key (GROUPING()=0) must never alias a rollup
        # NULL (GROUPING()=1) and both engines must agree on the
        # Expand-vs-flatten rewrite under NULL-extended input rows.
        # HAVING COUNT(*) > 0 keeps the round-6 empty-input quirk
        # normalization (a no-op on non-empty input).
        gs = [rng.choice(t["groups"]), rng.choice(null_side["groups"])]
        if gs[0] == gs[1]:
            gs = gs[:1]
        agg_col = rng.choice(t["ints"])
        kind = rng.choice(["ROLLUP", "CUBE", "GROUPING SETS"])
        if kind == "GROUPING SETS" and len(gs) == 2:
            grp = f"GROUP BY GROUPING SETS (({gs[0]}, {gs[1]}), ({gs[1]}), ())"
        else:
            kind = kind if kind != "GROUPING SETS" else "ROLLUP"
            grp = f"GROUP BY {kind}({', '.join(gs)})"
        keys = ", ".join(gs)
        flags = ", ".join(
            f"CAST(GROUPING({g}) AS BIGINT) AS grp{i}" for i, g in enumerate(gs)
        )
        return (
            f"SELECT {keys}, {flags}, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT({agg_col}) AS BIGINT) AS nc, "
            f"CAST(SUM(CAST({agg_col} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm}{where} {grp} HAVING COUNT(*) > 0 "
            f"ORDER BY {', '.join(f'{g} NULLS FIRST' for g in gs)}, "
            f"{', '.join(f'grp{i}' for i in range(len(gs)))}"
        )

    if join_how is None and 0.73 <= shape < 0.80 and frm in ("lineitem", "orders"):
        # RANGE-framed windows over the date columns (round-8 grammar):
        # value-based frames are PEER-based — each row's aggregate is a
        # pure function of its (partition, order-key value), so the
        # output multiset is engine-independent even under ties (unlike
        # ROWS frames, which need a total order). Bounds mix INTERVAL
        # literals over the date key and integer offsets over an
        # integer key; both spellings probed shared (round 8).
        dcol = {"lineitem": "l_shipdate", "orders": "o_orderdate"}[frm]
        pcol = rng.choice(t["groups"])
        agg_col = rng.choice(t["ints"])
        fn = rng.choice(["COUNT(*)", f"SUM({agg_col})", f"MIN({agg_col})", f"MAX({agg_col})"])
        if rng.random() < 0.6:
            okey, lo_n, hi_n = dcol, rng.choice([7, 30, 90]), rng.choice([7, 30])
            lo = f"INTERVAL {lo_n} DAY PRECEDING"
            hi = rng.choice(["CURRENT ROW", f"INTERVAL {hi_n} DAY FOLLOWING"])
        else:
            okey = agg_col
            lo = f"{rng.choice([10, 100, 1000])} PRECEDING"
            hi = rng.choice(["CURRENT ROW", f"{rng.choice([10, 100])} FOLLOWING"])
        over = f"OVER (PARTITION BY {pcol} ORDER BY {okey} RANGE BETWEEN {lo} AND {hi})"
        key_ints = ", ".join(t["ints"])
        sel_p = pcol if pcol not in t["ints"] else ""
        sel_cols = ", ".join(x for x in [key_ints, sel_p] if x)
        return (
            f"SELECT {sel_cols}, CAST(year({dcol}) AS BIGINT) AS y, "
            f"CAST({fn} {over} AS BIGINT) AS wv "
            f"FROM {frm}{where} ORDER BY {key_ints}"
        )

    if join_how is None and 0.80 <= shape < 0.86:
        # string functions INSIDE group keys (round-9 grammar): the
        # expression-valued grouping surface — substr / lower / upper
        # and '||' concat over the string pools. Both engines must
        # agree on the derived key VALUES (1-based substr indexing,
        # ASCII case mapping, NULL-propagating ||; concat() is avoided
        # because DuckDB's skips NULL arguments where Spark's
        # propagates) and on grouping by an expression repeated
        # verbatim across SELECT / GROUP BY.
        c = rng.choice(t["strs"])
        kind = rng.random()
        if kind < 0.35:
            key = f"substr({c}, 1, {rng.choice([1, 2, 3])})"
        elif kind < 0.6:
            key = f"{rng.choice(['lower', 'upper'])}({c})"
        elif kind < 0.8:
            c2 = rng.choice(t["strs"])
            key = f"({c} || '_' || {c2})"
        else:
            key = (
                f"substr({rng.choice(['lower', 'upper'])}({c}), 1, "
                f"{rng.choice([2, 3])})"
            )
        agg_col = rng.choice(t["ints"])
        return (
            f"SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST({agg_col} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm}{where} GROUP BY {key} ORDER BY k"
        )

    if join_how is None and 0.86 <= shape < 0.92 and frm in _CORR:
        # EXISTS ∧/∨ NOT EXISTS on the same child (round-9 grammar):
        # the gated tpch_q4/q21 decorrelation shape, fuzzed — one
        # correlated EXISTS with a child predicate and one NOT EXISTS
        # with a DIFFERENT predicate must decorrelate into independent
        # semi/anti joins, not share one rewritten subtree; the OR
        # spelling exercises Spark's disjunctive-subquery rewrite
        # (probed: both engines accept it).
        pk, child, ck = _CORR[frm]
        p1 = _int_pred(rng, rng.choice(TABLES[child]["ints"]))
        p2 = _int_pred(rng, rng.choice(TABLES[child]["ints"]))
        e1 = f"EXISTS (SELECT 1 FROM {child} WHERE {ck} = {pk} AND {p1})"
        e2 = f"NOT EXISTS (SELECT 1 FROM {child} WHERE {ck} = {pk} AND {p2})"
        both = f"{e1} {'AND' if rng.random() < 0.7 else 'OR'} {e2}"
        glue = " AND " if where else " WHERE "
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT(DISTINCT {pk}) AS BIGINT) AS nk "
            f"FROM {frm}{where}{glue}{both}"
        )

    if join_how is None and 0.45 <= shape < 0.53:
        # GROUP BY ROLLUP / CUBE / GROUPING SETS (round-6 grammar): the
        # super-aggregate rows carry NULL grouping keys — exactly where
        # engines next disagree (NULL-key representation, GROUPING()
        # typing, whether the empty set emits on empty input). The
        # GROUPING() flag is selected alongside each key so a data NULL
        # could never alias a rollup NULL (testdata has none, but the
        # disambiguation is part of the shape under test); all outputs
        # are exact ints/strings, canon sorts rows.
        #
        # QUIRK (found by this sweep, seeds 20425/20481/31107/...):
        # when the WHERE empties the input, the () grouping set emits
        # ONE grand-total row in DuckDB (ANSI: a global aggregate over
        # empty input yields one row) but ZERO rows in Spark — its
        # Expand+groupBy rewrite turns the empty-set branch into an
        # ordinary grouped aggregate over zero rows.  Spark's plain
        # `SELECT COUNT(*) FROM empty` DOES emit the row, so this is
        # Expand-rewrite-specific.  Normalized with HAVING COUNT(*) > 0
        # — drops only the divergent empty-input row (n=0 can occur in
        # no other group), a no-op on every non-empty input.
        gs = rng.sample(t["groups"], min(2, len(t["groups"])))
        agg_col = rng.choice(t["ints"])
        kind = rng.choice(["ROLLUP", "CUBE", "GROUPING SETS"])
        dup_sets = False
        if kind == "GROUPING SETS":
            # single-group tables make (({g}), ({g}), ()) — a DUPLICATE
            # grouping set, legal ANSI (both engines emit the group
            # twice; swept green since round 6)
            dup_sets = len(gs) == 1
            sets = f"(({', '.join(gs)}), ({gs[0]}), ())"
            grp = f"GROUP BY GROUPING SETS {sets}"
        else:
            grp = f"GROUP BY {kind}({', '.join(gs)})"
        keys = ", ".join(gs)
        flags = ", ".join(
            f"CAST(GROUPING({g}) AS BIGINT) AS grp{i}" for i, g in enumerate(gs)
        )
        having = "HAVING COUNT(*) > 0"
        if rng.random() < 0.5:
            # HAVING over GROUPING SETS (round-9 grammar): a REAL
            # aggregate/flag predicate filtering the super-aggregate
            # rows — beyond the empty-input normalizer above — where
            # both engines' Expand/flatten rewrites must resolve the
            # HAVING against the post-grouping row (probed: GROUPING()
            # in HAVING parses on both).
            #
            # QUIRK (found by this sweep, seed 205370): Spark 4.1.2
            # REJECTS GROUPING(col) in HAVING — "can only be used with
            # GroupingSets/Cube/Rollup" — when and only when the
            # GROUPING SETS list contains a DUPLICATE set (((g), (g),
            # ())): the duplicate-set analysis path loses the grouping
            # context for HAVING resolution, while the identical query
            # with GROUPING in SELECT only, or with unique sets, works,
            # and DuckDB accepts all four spellings. Engine analyzer
            # divergence on a legal-ANSI spelling — normalized by not
            # pairing the GROUPING() HAVING term with a duplicate set
            # list (the other HAVING terms still cover dup sets).
            terms = [
                f"COUNT(*) >= {rng.choice([2, 5, 10])}",
                f"SUM(CAST({agg_col} AS BIGINT)) > "
                f"{rng.choice([0, 100, 10000])}",
            ]
            if not dup_sets:
                terms.append(f"GROUPING({gs[0]}) = {rng.choice([0, 1])}")
            having += " AND " + rng.choice(terms)
        return (
            f"SELECT {keys}, {flags}, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST({agg_col} AS BIGINT)) AS BIGINT) AS s "
            f"FROM {frm}{where} {grp} {having} "
            f"ORDER BY {', '.join(f'{g} NULLS FIRST' for g in gs)}"
        )

    if join_how is None and 0.53 <= shape < 0.61 and frm in _CORR:
        # correlated subqueries (round-6 grammar): scalar-in-SELECT,
        # scalar-in-WHERE, and [NOT] EXISTS — the decorrelation surface
        # (Spark rewrites to an aggregate + left outer join; DuckDB
        # flattens) where empty-group NULL vs 0 and duplicate-key
        # handling genuinely differ. Correlation is FK-key equality;
        # every scalar output is an exact BIGINT (or NULL).
        pk, child, ck = _CORR[frm]
        inner_pred = ""
        if rng.random() < 0.6:
            inner_pred = f" AND {_int_pred(rng, rng.choice(TABLES[child]['ints']))}"
        sub_kind = rng.random()
        if sub_kind < 0.4:
            inner_agg = rng.choice(
                [
                    "CAST(COUNT(*) AS BIGINT)",
                    f"CAST(SUM(CAST({rng.choice(TABLES[child]['ints'])} AS BIGINT)) AS BIGINT)",
                    f"MIN({rng.choice(TABLES[child]['ints'])})",
                    f"MAX({rng.choice(TABLES[child]['ints'])})",
                ]
            )
            sub = f"SELECT {inner_agg} FROM {child} WHERE {ck} = {pk}{inner_pred}"
            return (
                f"SELECT {pk}, ({sub}) AS sub FROM {frm}{where} ORDER BY {pk}"
            )
        if sub_kind < 0.7:
            sub = (
                f"SELECT CAST(COUNT(*) AS BIGINT) FROM {child} "
                f"WHERE {ck} = {pk}{inner_pred}"
            )
            cmp_lit = rng.choice([1, 2, 3, 5])
            op = rng.choice([">=", "=", "<"])
            glue = " AND " if where else " WHERE "
            return (
                f"SELECT {pk} FROM {frm}{where}{glue}"
                f"({sub}) {op} {cmp_lit} ORDER BY {pk}"
            )
        neg = "NOT " if rng.random() < 0.4 else ""
        sub = f"SELECT 1 FROM {child} WHERE {ck} = {pk}{inner_pred}"
        glue = " AND " if where else " WHERE "
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT(DISTINCT {pk}) AS BIGINT) AS nk "
            f"FROM {frm}{where}{glue}{neg}EXISTS ({sub})"
        )

    if join_how is None and 0.61 <= shape < 0.67:
        # UNPIVOT (round-7 grammar): the standard SQL syntax both
        # engines accept — wide-to-long over derived BIGINT measure
        # columns, name labels carried in `nm`. The measures are
        # arithmetic derivations of int columns so every (nm, v) pair
        # is exact; NULL measures can't occur (base ints are non-null),
        # sidestepping the engines' (matching) NULL-row exclusion
        # default. The key column rides through as the passthrough.
        key = t["ints"][0]
        srcs = t["ints"][1:] or t["ints"]
        n_meas = rng.randint(2, 3)
        meas = []
        for i in range(n_meas):
            c = rng.choice(srcs)
            form = rng.choice(
                [f"CAST({c} AS BIGINT)", f"CAST({c} % {rng.choice([7, 13, 97])} AS BIGINT)",
                 f"CAST({c} + {rng.choice([0, 1, 100])} AS BIGINT)"]
            )
            meas.append(f"{form} AS m{i}")
        names = ", ".join(f"m{i}" for i in range(n_meas))
        inner = f"SELECT {key}, {', '.join(meas)} FROM {frm}{where}"
        return (
            f"SELECT {key}, nm, v FROM ({inner}) "
            f"UNPIVOT (v FOR nm IN ({names})) ORDER BY {key}, nm"
        )

    if join_how is None and 0.67 <= shape < 0.73:
        # set operations under BAG semantics (round-7 grammar):
        # INTERSECT ALL / EXCEPT ALL / UNION ALL between two
        # differently-predicated projections of one table — multiplicity
        # arithmetic (min / difference / sum of per-tuple counts) is
        # where engines diverge next after the DISTINCT set ops the
        # round-1 grammar already pins; outputs are exact int/string
        # tuples and the canon sorts rows, so multiset equality is the
        # whole comparison.
        cols = rng.sample(t["groups"], rng.randint(1, min(2, len(t["groups"]))))
        sel = ", ".join(cols)
        w1 = f" WHERE {_int_pred(rng, rng.choice(t['ints']))}"
        w2 = f" WHERE {_int_pred(rng, rng.choice(t['ints']))}"
        setop = rng.choice(["INTERSECT ALL", "EXCEPT ALL", "UNION ALL"])
        return (
            f"SELECT {sel} FROM {frm}{w1} {setop} "
            f"SELECT {sel} FROM {frm}{w2} ORDER BY {sel}"
        )

    # Re-slotted to [0.9875, 0.99) in round 11: this arm's original
    # open-ended `0.92 <= shape` claim was fully consumed once the
    # relocated 10d/11/11b/11c branches (which sit EARLIER in the
    # function) tiled [0.92, 1.0) — the exact silent-shadow class the
    # selfcheck exists for, and the selfcheck is what caught it.
    if join_how is None and 0.9875 <= shape < 0.99:
        # FILTER-clause aggregates + GROUP BY ALL (round-9 late
        # grammar): the standard `agg FILTER (WHERE pred)` spelling
        # both engines parse (probed), beside its CASE-spelled twin so
        # the two rewrites must agree column-for-column; GROUP BY ALL
        # (also probed on both) resolves the grouping keys from the
        # SELECT list — the resolution rule itself is the surface
        # under test. Exact BIGINT outputs throughout.
        gcols = rng.sample(t["groups"], rng.randint(1, min(2, len(t["groups"]))))
        fpred = _int_pred(rng, rng.choice(t["ints"]))
        scol = rng.choice(t["ints"])
        spred = _int_pred(rng, rng.choice(t["ints"]))
        aggs = [
            f"CAST(COUNT(*) FILTER (WHERE {fpred}) AS BIGINT) AS f0",
            f"CAST(SUM({scol}) FILTER (WHERE {spred}) AS BIGINT) AS f1",
            # the CASE twin of f1: both engines must agree the two
            # spellings are the same value, not just each self-consistent
            f"CAST(SUM(CASE WHEN {spred} THEN {scol} ELSE 0 END) AS BIGINT) AS c1",
        ]
        if rng.random() < 0.4:
            aggs.append(
                f"CAST(COUNT(DISTINCT {rng.choice(t['ints'])}) "
                f"FILTER (WHERE {_int_pred(rng, rng.choice(t['ints']))}) "
                f"AS BIGINT) AS f2"
            )
        sel = ", ".join(gcols + aggs)
        group = "ALL" if rng.random() < 0.5 else ", ".join(gcols)
        # ORDER BY ALL (probed on both engines): orders by every SELECT
        # column left to right — the resolution rule is the surface
        # under test (the canon sorts rows anyway)
        order = "ALL" if rng.random() < 0.4 else ", ".join(gcols)
        return (
            f"SELECT {sel} FROM {frm}{where} GROUP BY {group} "
            f"ORDER BY {order}"
        )

    if shape < 0.2:
        # DISTINCT projection of low-cardinality columns — sometimes
        # composed through a set operation against a second predicate
        # on the same table (INTERSECT/EXCEPT/UNION are exact set
        # semantics on int/string tuples, bit-safe)
        cols = rng.sample(t["groups"], rng.randint(1, min(2, len(t["groups"]))))
        sel = ", ".join(cols)
        base = f"SELECT DISTINCT {sel} FROM {frm}{where}"
        if " JOIN " not in frm and rng.random() < 0.35:
            c = rng.choice(t["ints"])
            where2 = f" WHERE {_int_pred(rng, c)}"
            other = f"SELECT DISTINCT {sel} FROM {frm}{where2}"
            setop = rng.choice(["INTERSECT", "EXCEPT", "UNION"])
            return f"{base} {setop} {other} ORDER BY {sel}"
        return f"{base} ORDER BY {sel}"

    if shape < 0.35:
        # window functions over the FULL integer-column order: any rows
        # still tied are identical on every selected and windowed
        # column, so the output MULTISET is engine-independent even
        # where per-row assignment isn't (the canon sorts rows). The
        # argument survives joins — order by EVERY int column of the
        # joined row — PROVIDED the NULL placement is stated: Spark
        # defaults ASC NULLS FIRST where DuckDB defaults NULLS LAST, so
        # outer-join NULL-extended rows would rank differently under a
        # bare ORDER BY. Explicit NULLS FIRST on every key closes it.
        # FULL JOIN is excluded: its window targets can be NULL on
        # either side and LAG-over-NULL-runs adds nothing the LEFT
        # production doesn't already pin.
        if join_how != "FULL JOIN":
            win_ints = merged_ints if join_how else t["ints"]
            pcol = rng.choice(t["groups"])
            okey = ", ".join(f"{c} NULLS FIRST" for c in win_ints)
            target = rng.choice(win_ints)
            over = f"OVER (PARTITION BY {pcol} ORDER BY {okey})"
            kind = rng.choice(
                ["row_number", "rank", "dense_rank", "lag", "cumsum", "rows_off"]
            )
            if kind == "cumsum":
                expr = (
                    f"CAST(SUM({target}) OVER (PARTITION BY {pcol} ORDER BY {okey} "
                    f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
                )
            elif kind == "rows_off":
                # explicit ROWS frame with BOTH offsets (round-11
                # grammar), over joins too: the frame is row-positional
                # under the full-int-tuple total order, so each row's
                # window is a well-defined slice on both engines — the
                # frame-boundary bookkeeping (n PRECEDING .. m
                # FOLLOWING, including the FOLLOWING edge at partition
                # end) is the surface under test (probed both engines).
                npre, nfol = rng.choice([(2, 1), (1, 2), (3, 0), (0, 3)])
                fn = rng.choice(["SUM", "MIN", "MAX", "COUNT"])
                expr = (
                    f"CAST({fn}({target}) OVER (PARTITION BY {pcol} "
                    f"ORDER BY {okey} ROWS BETWEEN {npre} PRECEDING "
                    f"AND {nfol} FOLLOWING) AS BIGINT)"
                )
            elif kind == "lag":
                expr = f"LAG({target}) {over}"
            else:
                expr = f"{kind.upper()}() {over}"
            # pcol may itself be an integer column (p_size, c_nationkey
            # etc.) — don't select it twice, pandas rejects duplicate
            # column labels in the canon
            sel_cols = win_ints + ([pcol] if pcol not in win_ints else [])
            keys = ", ".join(sel_cols)
            return (
                f"SELECT {keys}, {expr} AS wv FROM {frm}{where} "
                f"ORDER BY {', '.join(win_ints)}"
            )

    gcols = (
        rng.sample(t["groups"], rng.randint(1, min(2, len(t["groups"]))))
        if shape < 0.75
        else []
    )
    # aggregate inputs may come from the NULL-extensible side too: that
    # is where COUNT(col) vs COUNT(*), NULL-skipping MIN/MAX/SUM, and
    # all-NULL-group -> NULL results genuinely differ from the inner
    # case (CASE predicates stay on non-null columns: `WHEN NULL-int
    # < 5 THEN 1 ELSE 0` would hit the ELSE branch, which is fine, but
    # keeping them preserved-side keeps the production's intent exact)
    agg_ints = t["ints"] + (null_side["ints"] if null_side else [])
    agg_any = agg_ints + t["strs"] + (null_side["strs"] if null_side else [])
    aggs = []
    n_aggs = rng.randint(1, 3)
    for i in range(n_aggs):
        kind = rng.randint(0, 6)
        if kind == 5:
            # conditional aggregation: exact integer CASE inside SUM
            c = rng.choice(t["ints"])
            aggs.append(
                f"CAST(SUM(CASE WHEN {_int_pred(rng, c)} "
                f"THEN 1 ELSE 0 END) AS BIGINT) AS agg{i}"
            )
        elif kind == 6:
            # NULL-skipping COUNT(col): on an outer join's NULL side
            # this diverges from COUNT(*) — the exact edge under test
            aggs.append(f"CAST(COUNT({rng.choice(agg_ints)}) AS BIGINT) AS agg{i}")
        elif kind == 0:
            aggs.append(f"CAST(COUNT(*) AS BIGINT) AS agg{i}")
        elif kind == 1:
            aggs.append(f"CAST(COUNT(DISTINCT {rng.choice(agg_ints)}) AS BIGINT) AS agg{i}")
        elif kind == 2:
            aggs.append(f"MIN({rng.choice(agg_any)}) AS agg{i}")
        elif kind == 3:
            aggs.append(f"MAX({rng.choice(agg_any)}) AS agg{i}")
        else:
            aggs.append(f"CAST(SUM({rng.choice(agg_ints)}) AS BIGINT) AS agg{i}")
    sel = ", ".join((gcols if gcols else []) + aggs)
    group = f" GROUP BY {', '.join(gcols)}" if gcols else ""
    having = (
        f" HAVING COUNT(*) {rng.choice(['>', '>=', '<='])} {rng.choice([1, 2, 5, 10])}"
        if gcols and rng.random() < 0.3
        else ""
    )
    order = f" ORDER BY {', '.join(gcols)}" if gcols else ""
    return f"SELECT {sel} FROM {frm}{where}{group}{having}{order}"


def run_case(spark, con, sql: str):
    """Returns (ok, detail) comparing Spark vs DuckDB for one query."""
    from tools.check_oracle import driver_sort_probe, frame_hash

    spdf = spark.sql(sql).toPandas()
    odf = con.sql(sql).df()
    driver_sort_probe(spdf)
    driver_sort_probe(odf)
    if len(spdf) != len(odf):
        return False, f"rows {len(spdf)} vs {len(odf)}"
    if sorted(spdf.columns) != sorted(odf.columns):
        return False, f"cols {sorted(spdf.columns)} vs {sorted(odf.columns)}"
    if frame_hash(spdf, "%.17g") != frame_hash(odf, "%.17g"):
        return False, "strict value-hash mismatch"
    return True, f"{len(spdf)} rows"


def _is_round6_shape(sql: str) -> bool:
    """True when the query exercises the round-6 grammar (rollup/cube/
    grouping-sets or a correlated subquery) — used by the ``new`` filter
    mode so a sweep can be quoted as N cases OF the new shapes rather
    than N seeds that mostly hit the old grammar (~11% hit rate)."""
    return (
        "ROLLUP(" in sql
        or "CUBE(" in sql
        or "GROUPING SETS" in sql
        or " AS sub" in sql
        or "EXISTS (" in sql
        or "(SELECT CAST(COUNT(*) AS BIGINT) FROM" in sql
    )


def _is_round8_shape(sql: str) -> bool:
    """Round-8 grammar (``new8`` filter mode): RANGE-framed windows
    (INTERVAL or integer value bounds), INTERVAL arithmetic in date
    keys/predicates, and GROUPING()-flagged super-aggregates over an
    outer join."""
    return (
        "RANGE BETWEEN" in sql
        or "INTERVAL" in sql
        or ("GROUPING(" in sql and " JOIN " in sql)
    )


def _is_round7_shape(sql: str) -> bool:
    """Round-7 grammar: standard-syntax UNPIVOT and bag-semantics set
    operations (``new7`` filter mode). VARIANT/JSON paths stay
    ungrammared: the two engines share NO function or operator spelling
    for path extraction (Spark variant_get/get_json_object vs DuckDB
    json_extract/->>), and this fuzzer's contract is the SAME string on
    both engines — the props_map key surface is pinned by the
    handwritten props_map_explode oracle instead."""
    return "UNPIVOT" in sql or " ALL SELECT" in sql


def _is_round9b_shape(sql: str) -> bool:
    """Round-9 late grammar (``new9b`` filter mode): FILTER-clause
    aggregates beside their CASE twins, GROUP BY ALL resolution, and
    IS [NOT] DISTINCT FROM over NULL-extensible outer-join keys."""
    return (
        "FILTER (WHERE" in sql
        or "DISTINCT FROM" in sql
        or "GROUP BY ALL" in sql
        or "ORDER BY ALL" in sql
    )


def _is_round9_shape(sql: str) -> bool:
    """Round-9 grammar (``new9`` filter mode): string functions inside
    group keys, the q4/q21-style EXISTS∧NOT-EXISTS pair, and real
    HAVING predicates over GROUPING SETS rollup rows."""
    return (
        ("GROUP BY substr(" in sql or "GROUP BY lower(" in sql
         or "GROUP BY upper(" in sql or "|| '_' ||" in sql)
        or ("EXISTS (" in sql and "NOT EXISTS (" in sql)
        or ("GROUPING(" in sql and ("HAVING COUNT(*) > 0 AND" in sql))
    )


def _is_round10d_shape(sql: str) -> bool:
    """Round-10d grammar (``new10d`` filter mode): deterministic
    ordered-LIMIT derived tables, multi-DISTINCT aggregate rewrites,
    HAVING without GROUP BY, and implicit comma joins."""
    import re

    return (
        " LIMIT " in sql
        or sql.count("COUNT(DISTINCT") >= 2
        or ("HAVING COUNT(*) >" in sql and "GROUP BY" not in sql)
        # the comma-join production's exact FROM shape — a loose
        # "comma after FROM" test also matched ORDER BY ordinal lists
        # once round-11b landed
        or re.search(r"FROM \w+, \w+ WHERE", sql) is not None
    )


def _is_round10c_shape(sql: str) -> bool:
    """Round-10c grammar (``new10c`` filter mode): unparenthesized
    three-way set-op chains (precedence under test), twice-consumed
    CTEs, bounded recursive CTEs, and NATURAL JOIN over derived
    tables."""
    return (
        "WITH RECURSIVE" in sql
        or "WITH agg AS" in sql
        or "NATURAL JOIN" in sql
        or sql.count(" UNION ") + sql.count(" INTERSECT ") + sql.count(" EXCEPT ") >= 2
    )


def _is_round10b_shape(sql: str) -> bool:
    """Round-10b grammar (``new10b`` filter mode): LATERAL correlated
    aggregates in FROM, VALUES inline-table join dimensions, and
    CASE-valued join predicates."""
    return "LATERAL (" in sql or "(VALUES " in sql


def _is_round10_shape(sql: str) -> bool:
    """Round-10 grammar (``new10`` filter mode): windows over set-op
    results, set ops with mismatched-but-coercible branch types, and
    composed correlated scalar subqueries in the SELECT list."""
    return (
        (") u ORDER BY" in sql and " OVER (" in sql)
        or "CAST(v AS BIGINT) AS v" in sql
        or "COALESCE((SELECT" in sql
    )


# One detectable signature per grammar ARM (not per round): an arm
# that stops generating — a renumbered interval shadowing it, a gate
# condition that never holds — is a silent coverage loss the tallies
# would keep claiming (ADVICE r10: the first round-10d cut's
# ordered-LIMIT arm never ran because its interval was inside an
# earlier branch's). ``selfcheck`` sweeps a fixed seed range and
# requires every signature to hit at least once; it runs in pytest
# (test_fuzz_grammar_coverage) so a grammar edit that orphans an arm
# fails CI before a sweep tally can overstate itself.
GRAMMAR_ARM_SIGNATURES: dict[str, "callable"] = {
    "date_rollup": lambda q: "GROUP BY year(" in q,
    "window_over_setop": lambda q: ") u ORDER BY" in q and " OVER (" in q,
    "coercible_setop": lambda q: "CAST(v AS BIGINT) AS v" in q,
    "corr_scalar_subquery": lambda q: "COALESCE((SELECT" in q,
    "values_join_dim": lambda q: "(VALUES " in q,
    "ordered_limit_subquery": lambda q: " LIMIT " in q,
    "multi_distinct": lambda q: q.count("COUNT(DISTINCT") >= 2,
    "having_no_groupby": lambda q: "HAVING COUNT(*) >" in q
    and "GROUP BY" not in q,
    "comma_join": lambda q: __import__("re").search(
        r"FROM \w+, \w+ WHERE", q
    )
    is not None,
    "setop_chain_noparen": lambda q: q.count(" UNION ")
    + q.count(" INTERSECT ")
    + q.count(" EXCEPT ")
    >= 2,
    "cte_twice": lambda q: "WITH agg AS" in q,
    "recursive_cte": lambda q: "WITH RECURSIVE" in q,
    "natural_join": lambda q: "NATURAL JOIN" in q,
    "lateral_agg": lambda q: "LATERAL (" in q,
    "exists_pair": lambda q: "EXISTS (" in q and "NOT EXISTS (" in q,
    "grouping_sets": lambda q: "GROUPING(" in q,
    "filter_clause": lambda q: "FILTER (WHERE" in q,
    "outer_join": lambda q: "LEFT JOIN" in q or "RIGHT JOIN" in q
    or "FULL JOIN" in q,
    "distinct_from": lambda q: "DISTINCT FROM" in q,
    # round-11 arms (wave 11; each spelling probed on both engines)
    "rollup_cube": lambda q: "GROUP BY ROLLUP (" in q
    or "GROUP BY CUBE (" in q,
    "exists_in_select": lambda q: " AS ex FROM" in q,
    "window_frame_offsets": lambda q: "FOLLOWING) AS BIGINT) AS wv" in q,
    "setop_of_ordered_limits": lambda q: q.count(" LIMIT ") >= 2,
    # round-11b arms (each spelling probed on both engines)
    "computed_group_key": lambda q: " AS kk," in q,
    "int_kernel_keys": lambda q: " AS ka, " in q and " AS kb, " in q,
    # round-11d arms (probed both engines; quantified ALL/ANY subquery
    # comparisons are NOT here — Spark does not parse them)
    "in_list_with_null": lambda q: ", NULL) THEN 1 ELSE 0 END" in q,
    "between_expr_bound": lambda q: __import__("re").search(
        r"BETWEEN \d+ AND \w+ % \d+", q
    )
    is not None,
    "nested_case_having_agg": lambda q: "THEN CASE WHEN" in q
    and "HAVING SUM(" in q,
    "ordinal_group_order": lambda q: "GROUP BY 1" in q
    and "ORDER BY 1, 2, 3" in q,
    "global_window_share": lambda q: "OVER () AS BIGINT) AS w " in q,
    # round-12 arms (probed both engines; REJECTED after probing:
    # correlated scalar subqueries in ORDER BY — Spark
    # UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY; window frame EXCLUDE,
    # QUALIFY, DISTINCT ON — Spark does not parse them)
    "setop_all_bag": lambda q: " AS ia," in q or " AS ia " in q,
    "filter_distinct_agg": lambda q: " AS fd," in q,
    "group_order_all": lambda q: "GROUP BY ALL" in q,
}


def _is_round12_shape(sql: str) -> bool:
    """Round-12 grammar (``new12`` filter mode): bag-semantics
    INTERSECT ALL / EXCEPT ALL over folded keys, FILTER (WHERE ...)
    composed with DISTINCT aggregation, and GROUP BY ALL / ORDER BY
    ALL resolution."""
    return (
        " AS ia," in sql
        or " AS ia " in sql
        or " AS fd," in sql
        or "GROUP BY ALL" in sql
    )


def _is_round11b_shape(sql: str) -> bool:
    """Round-11b grammar (``new11b`` filter mode): computed GROUP BY
    keys (CASE cascades / string-function chains), ordinal
    GROUP BY/ORDER BY with HAVING, and global empty-OVER windows over
    grouped derived tables."""
    import re

    return (
        " AS kk," in sql
        or ("GROUP BY 1" in sql and "ORDER BY 1, 2, 3" in sql)
        or "OVER () AS BIGINT) AS w " in sql
        or (" AS ka, " in sql and " AS kb, " in sql)
        # round-11d predicate surfaces ride the same filter mode
        or ", NULL) THEN 1 ELSE 0 END" in sql
        or re.search(r"BETWEEN \d+ AND \w+ % \d+", sql) is not None
        or ("THEN CASE WHEN" in sql and "HAVING SUM(" in sql)
    )


def _is_round11_shape(sql: str) -> bool:
    """Round-11 grammar (``new11`` filter mode): ROLLUP/CUBE keyword
    group-bys, correlated EXISTS/IN projected in the SELECT list,
    explicit double-offset ROWS frames (over joins too), and set ops
    under LIMIT-ordered derived tables."""
    return (
        "GROUP BY ROLLUP (" in sql
        or "GROUP BY CUBE (" in sql
        or " AS ex FROM" in sql
        or "FOLLOWING) AS BIGINT) AS wv" in sql
        or sql.count(" LIMIT ") >= 2
    )


def selfcheck(n_seeds: int = 20000, seed0: int = 0) -> int:
    """Assert every grammar arm generates at least once over a fixed
    seed sweep. Returns the number of MISSING arms (0 = healthy)."""
    hits = dict.fromkeys(GRAMMAR_ARM_SIGNATURES, 0)
    for seed in range(seed0, seed0 + n_seeds):
        q = gen_query(random.Random(seed))
        for name, sig in GRAMMAR_ARM_SIGNATURES.items():
            if sig(q):
                hits[name] += 1
    missing = [k for k, v in hits.items() if v == 0]
    for name in sorted(hits):
        print(f"{'MISS' if hits[name] == 0 else 'ok  '} {name}: {hits[name]}")
    print(f"{len(missing)} arms missing over seeds {seed0}..{seed0 + n_seeds - 1}")
    return len(missing)


def main() -> int:
    # Usage: fuzz_differential.py [sf_dir] [n_cases] [seed0] [new]
    # With the optional 4th arg ``new``, seeds are consumed until
    # n_cases queries matching the round-6 grammar have been RUN;
    # non-matching seeds are skipped unexecuted.
    if len(sys.argv) > 1 and sys.argv[1] == "selfcheck":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
        return 1 if selfcheck(n) else 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_cases = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    seed0 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    mode_arg = sys.argv[4] if len(sys.argv) > 4 else ""
    only_new = mode_arg == "new"
    only_new7 = mode_arg == "new7"
    only_new8 = mode_arg == "new8"
    only_new9 = mode_arg == "new9"
    only_new9b = mode_arg == "new9b"
    only_new10 = mode_arg == "new10"
    only_new10b = mode_arg == "new10b"
    only_new10c = mode_arg == "new10c"
    only_new10d = mode_arg == "new10d"
    only_new11 = mode_arg == "new11"
    only_new11b = mode_arg == "new11b"
    only_new12 = mode_arg == "new12"

    import duckdb

    from ffi_etl_spark.catalog import load_tables
    from ffi_etl_spark.session import get_session

    spark = get_session("fuzz-differential")
    load_tables(spark, sf_dir, tuple(TABLES), register=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )

    bad = ran = 0
    seed = seed0
    while ran < n_cases:
        sql = gen_query(random.Random(seed))
        seed += 1
        if only_new and not _is_round6_shape(sql):
            continue
        if only_new7 and not _is_round7_shape(sql):
            continue
        if only_new8 and not _is_round8_shape(sql):
            continue
        if only_new9 and not _is_round9_shape(sql):
            continue
        if only_new9b and not _is_round9b_shape(sql):
            continue
        if only_new10 and not _is_round10_shape(sql):
            continue
        if only_new10b and not _is_round10b_shape(sql):
            continue
        if only_new10c and not _is_round10c_shape(sql):
            continue
        if only_new10d and not _is_round10d_shape(sql):
            continue
        if only_new11 and not _is_round11_shape(sql):
            continue
        if only_new11b and not _is_round11b_shape(sql):
            continue
        if only_new12 and not _is_round12_shape(sql):
            continue
        ran += 1
        try:
            ok, detail = run_case(spark, con, sql)
        except Exception as e:  # noqa: BLE001 — a crash on either engine is a finding
            ok, detail = False, f"{type(e).__name__}: {e}"
        status = "PASS" if ok else "FAIL"
        if not ok:
            bad += 1
            print(f"{status} seed={seed - 1}: {detail}\n      {sql}")
        else:
            print(f"{status} seed={seed - 1}: {detail}")
    mode = (
        " (round-6 shapes only)"
        if only_new
        else " (round-7 shapes only)"
        if only_new7
        else " (round-8 shapes only)"
        if only_new8
        else " (round-9 shapes only)"
        if only_new9
        else " (round-9b shapes only)"
        if only_new9b
        else " (round-10 shapes only)"
        if only_new10
        else " (round-10b shapes only)"
        if only_new10b
        else " (round-10c shapes only)"
        if only_new10c
        else " (round-10d shapes only)"
        if only_new10d
        else " (round-11 shapes only)"
        if only_new11
        else " (round-11b shapes only)"
        if only_new11b
        else " (round-12 shapes only)" if only_new12 else ""
    )
    print(f"{bad}/{n_cases} mismatches{mode}, seeds {seed0}..{seed - 1}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
