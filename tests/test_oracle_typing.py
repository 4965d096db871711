"""Oracle output-typing audit (VERDICT r4 item 1).

The driver's correctness gate hashes VALUES WITH THEIR TYPES: a DuckDB
oracle that returns HUGEINT / decimal128 for a column Spark produces as
int64 hash-mismatches on identical values (the r4 ``q_bucketed_join``
red row — DuckDB widens a bare ``sum()`` over an integer column to
HUGEINT, Arrow ``decimal128(38,0)``). The repo's own gate
(tools/compare_oracle.py) canonicalizes through Python ints and so
cannot catch this class.

This test closes the hole at its root: every oracle is executed in
DuckDB against the smallest fixture and its **Arrow result schema** is
rejected if any column (recursively, through lists/structs) carries a
type Spark's Arrow collection never emits — decimal, int128/uint64.
A future bare integer aggregate in any oracle fails here before it can
reach a driver round.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

from proactive_map_reduce_spark.oracles import ORACLES
from proactive_map_reduce_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TYPING_SF_DIR", "/root/testdata/sf0.001")


def _offending(dt: pa.DataType) -> str | None:
    """Name of the first non-Spark-representable leaf type, else None."""
    if pa.types.is_decimal(dt) or dt == pa.uint64():
        return str(dt)
    if pa.types.is_list(dt) or pa.types.is_large_list(dt):
        return _offending(dt.value_type)
    if pa.types.is_struct(dt):
        for f in dt:
            bad = _offending(f.type)
            if bad:
                return bad
    return None


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_schema_is_spark_representable(con, name):
    # LIMIT 0 would skip aggregate evaluation in some engines but not
    # type inference; run the real query — sf0.001 keeps this cheap —
    # so the schema is exactly what the driver's hash will see.
    tbl = con.execute(ORACLES[name]).fetch_arrow_table()
    for field in tbl.schema:
        bad = _offending(field.type)
        assert bad is None, (
            f"oracle {name!r} column {field.name!r} has DuckDB-only type "
            f"{bad} (full: {field.type}) — cast it (e.g. CAST(sum(...) AS "
            f"BIGINT)) or the driver's typed hash will diverge from Spark"
        )
