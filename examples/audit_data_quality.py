"""Run a declarative data-quality gate over the warehouse tables.

The read-side complement of examples/build_pretraining_corpus.py: a
nightly (or pre-release) audit job that evaluates a constraint suite
per table — each suite is ONE aggregation over ONE scan
(operators/constraints.py), so the whole audit costs one pass per
table no matter how many rules it carries — then gates on the result
the way a pipeline orchestrator would (non-zero violations on a
blocking rule → non-zero exit).

Run:

    python examples/audit_data_quality.py \
        [--sf-dir /root/testdata/sf0.001] [--strict]

`--strict` exits 1 when any BLOCKING rule fires. TPC-H data
legitimately trips the two advisory rules (discount_cap,
quantity_range), so the default run reports them without failing.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ffi_etl_spark.catalog import table
from ffi_etl_spark.operators.constraints import Rule, check_constraints
from ffi_etl_spark.session import get_session

# (rule, blocking?) — advisory rules report; blocking rules gate.
def _suites(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return {
        "lineitem": (
            li,
            [
                (Rule("orderkey_fk", "fk", col="l_orderkey", parent=o,
                      parent_key="o_orderkey"), True),
                (Rule("linenumber_not_null", "not_null", col="l_linenumber"), True),
                (Rule("returnflag_accepted", "in_set", col="l_returnflag",
                      values=("A", "N", "R")), True),
                (Rule("quantity_range", "range", col="l_quantity", lo=1, hi=49),
                 False),
                (Rule("discount_cap", "predicate", expr="l_discount <= 0.08"),
                 False),
            ],
        ),
        "orders": (
            o,
            [
                (Rule("orderkey_unique", "unique", col="o_orderkey"), True),
                (Rule("custkey_fk", "fk", col="o_custkey", parent=c,
                      parent_key="c_custkey"), True),
                (Rule("status_accepted", "in_set", col="o_orderstatus",
                      values=("O", "F", "P")), True),
            ],
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()

    spark = get_session("audit_data_quality")
    blocking_failures = 0
    for tbl, (df, rules) in _suites(spark, args.sf_dir).items():
        report = {
            r.rule: (r.n_checked, r.n_violations)
            for r in check_constraints(df, [r for r, _ in rules]).collect()
        }
        print(f"== {tbl} ==")
        for rule, blocking in rules:
            checked, violations = report[rule.name]
            status = "ok" if violations == 0 else (
                "FAIL" if blocking else "warn"
            )
            print(f"  {status:4s} {rule.name}: {violations}/{checked}")
            if violations and blocking:
                blocking_failures += 1
    if args.strict and blocking_failures:
        print(f"{blocking_failures} blocking rule(s) fired")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
