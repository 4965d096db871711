"""Registry queries must compile and run on EMPTY tables.

A 100 TB pipeline hits zero-row inputs constantly: a partition-pruned
day with no data, a filter that eliminates a source, a brand-new
tenant. Every registered query must plan, execute and return its
schema on empty tables instead of crashing in plan build, model-state
collection, sentinel construction or sink round-trips.

The full 127-query sweep lives in tools/empty_sweep.py (run per
hardening pass); this test pins the regression set — the six queries
that DID crash on empty input when the sweep was first run — plus one
representative per driver-side-state family.
"""

from __future__ import annotations

import pytest

from proactive_map_reduce_spark.sources.tables import TABLES

SF_SCHEMA_SRC = "/root/testdata/sf0.001"

# first-sweep failures (regression set) + driver-state representatives
QUERIES = [
    "q_stream_window_late",      # watermark sentinel from empty max(ts)
    "q_stream_dedup",            # same sentinel path + dup injection
    "q_stream_stream_join",      # two-sided sentinel
    "q_stream_static_enrich",    # empty bucket-file write
    "q_sink_partitioned",        # schema-on-read of an empty sink
    "q_cache_fetch_or_compute",  # zero cached stages
    "q_similarity_topk",         # empty parameterized query-vector set
    "q_similarity_ivf",          # k-means on an empty corpus
    "q_dedup_minhash_pairs",     # empty LSH bucket index
    "q_flagship",                # full chunk→map→reduce→score chain
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SCHEMA_SRC}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            str(root / f"{t}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", QUERIES)
def test_query_runs_on_empty_tables(spark, empty_sf, name):
    from proactive_map_reduce_spark.queries import REGISTRY

    out = REGISTRY[name](spark, empty_sf)
    assert out.count() == 0
    assert len(out.schema.fields) > 0
