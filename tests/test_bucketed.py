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
