"""Driver-contract smoke: every queries() entry runs at sf0.001 and returns
rows with a stable schema; every oracle key exists in the registry."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF0001


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry.queries(), entry.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_entry_runs(spark):
    df = entry.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(entry.queries().keys()))
def test_query_runs_and_is_deterministic_schema(spark, name):
    fn = entry.queries()[name]
    df = fn(spark, SF0001)
    cols = df.columns
    assert cols == fn(spark, SF0001).columns
    assert df.count() >= 0
