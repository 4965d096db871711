"""Bucketed co-located join: zero shuffle exchanges, correct results.

Uses the shared session (its warehouse dir is a temp dir from conftest);
the broadcast threshold is disabled around the assertions so a shuffle
join would be visible in the plan, then restored.
"""

from __future__ import annotations

import pytest

from proactive_map_reduce_spark.plans import audit
from proactive_map_reduce_spark.sources import bucketed
from tests.conftest import SF0001


@pytest.fixture()
def no_broadcast(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield spark
    spark.conf.set(key, old)


def test_bucketed_join_has_no_exchange_and_matches_plain_join(no_broadcast):
    spark = no_broadcast
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    bucketed.write_bucketed(li, "li_b", "l_orderkey", buckets=4)
    bucketed.write_bucketed(orders, "ord_b", "o_orderkey", buckets=4)
    try:
        j = bucketed.co_located_join(spark, "li_b", "ord_b", "l_orderkey", "o_orderkey")
        assert audit.count_exchanges(j) == 0          # co-located: no shuffle
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert audit.count_exchanges(plain) >= 1      # unbucketed: shuffles
        assert j.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_compaction_reduces_files_preserves_rows(spark):
    """32 task-sized fragments compact to the planned file count with
    identical content (order-insensitive)."""
    import glob
    import tempfile

    from proactive_map_reduce_spark.sources.compaction import (
        compact,
        plan_compaction,
    )
    from tests.conftest import SF0001

    src = tempfile.mkdtemp(prefix="pmr_frag_") + "/docs"
    dst = tempfile.mkdtemp(prefix="pmr_compact_") + "/docs"
    docs = spark.read.parquet(SF0001 + "/documents.parquet")
    docs.repartition(32).write.parquet(src)
    assert len(glob.glob(src + "/part-*.parquet")) == 32

    # tiny target => plan collapses the fragments to very few files
    n_planned = plan_compaction(src, target_file_mb=1)
    out = compact(spark, src, dst, target_file_mb=1)
    n_files = len(glob.glob(dst + "/part-*.parquet"))
    assert n_files <= max(n_planned, 1) < 32
    assert out.count() == docs.count()
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert a == b


def test_q_bucketed_join_zero_exchange_smj_under_no_broadcast(no_broadcast):
    """The registry query's scale contract: with broadcast off (the 100 TB
    regime where neither side fits an executor), the join is a
    zero-exchange sort-merge over the bucket-sorted scans and the only
    hash exchange in the whole plan is the final aggregation."""
    spark = no_broadcast
    from proactive_map_reduce_spark.queries import REGISTRY

    df = REGISTRY["q_bucketed_join"](spark, SF0001)
    plan = audit.simple_plan(df)
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert audit.exchange_counts(df) == {"hash": 1, "single": 0, "roundrobin": 0}
