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


def test_rewritten_pin_map_has_no_duplicate_keys():
    """Python dict literals silently last-win on duplicate keys, so a
    stale earlier-round pin for the same query is invisible at runtime
    but regresses the rewrite round if the later line is ever removed
    (ADVICE r5). Walk the source AST and require each key once."""
    import ast
    import collections
    import inspect

    tree = ast.parse(inspect.getsource(entry))
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "_REWRITTEN" for t in node.targets
        ):
            keys = [ast.literal_eval(k) for k in node.value.keys]
            dups = [k for k, c in collections.Counter(keys).items() if c > 1]
            assert not dups, f"duplicate _REWRITTEN keys: {dups}"
            assert set(keys) <= set(entry.REGISTRY), (
                f"pins for unregistered queries: {set(keys) - set(entry.REGISTRY)}"
            )
            return
    raise AssertionError("_REWRITTEN assignment not found in __spark_entry__")


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
