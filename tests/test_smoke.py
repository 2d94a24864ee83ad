"""Driver-contract smoke tests."""

from __future__ import annotations

import __spark_entry__ as entrypoint


def test_entry_returns_rows(spark):
    df = entrypoint.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_disc_price" in df.columns


def test_contract_shapes():
    qs = entrypoint.queries()
    osql = entrypoint.oracle_sql()
    assert len(qs) >= 30
    assert set(osql) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
