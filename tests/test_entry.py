"""Driver-contract smoke tests: entry(), queries()/oracle_sql() registry."""

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "Demographic"


def test_registry_consistency(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a matching query
    assert set(oracles) <= set(qs)
    # all callables, all SQL strings
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
