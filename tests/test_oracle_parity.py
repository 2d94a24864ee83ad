"""Every registry query must match its DuckDB oracle at sf0.001 —
the local replica of the driver's correctness gate.

Set ``SPARK_GRAFT_PARITY_SF_DIR`` to sweep another scale factor (the
driver gates at sf0.01; run that before shipping catalog changes)."""

from __future__ import annotations

import os

import pytest

from cryptocoininsights_data_engineer_project_spark import queries as registry

from .oracle_compare import compare, duck_connection

SF = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


ORACLE_NAMES = sorted(n for n, s in registry.REGISTRY.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    spec = registry.REGISTRY[name]
    df = spec.fn(spark, SF)
    problems = compare(df, duck, spec.oracle, name)
    assert not problems, "\n".join(problems)


def test_all_queries_have_entries():
    assert len(registry.REGISTRY) >= 25
    fns = registry.queries()
    oracles = registry.oracle_sql()
    assert set(oracles) <= set(fns)
