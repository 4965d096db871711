"""Incremental view maintenance == full recompute (SURVEY §2.13 analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from proactive_map_reduce_spark.plans.incremental import IncrementalAggregate


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(lo, hi)], "id long, section int, v double"
    )


def _full(df):
    return {
        r["section"]: (round(r["total"], 6), r["n"], r["lo"], r["hi"])
        for r in df.groupBy("section")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").cast("double").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }


def test_incremental_equals_full_recompute(spark):
    base = _rows(spark, 0, 500)
    delta1 = _rows(spark, 500, 600)
    delta2 = _rows(spark, 600, 610)

    inc = IncrementalAggregate(
        "section",
        {"total": ("sum", "v"), "n": ("count", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
    )
    inc.initialize(base)
    assert inc.apply_delta(delta1) == 7       # every section touched
    assert inc.apply_delta(delta2) <= 7       # small delta → few partitions

    got = {
        r["section"]: (round(r["total"], 6), r["n"], r["lo"], r["hi"])
        for r in inc.result().collect()
    }
    want = _full(base.unionByName(delta1).unionByName(delta2))
    assert got == want
    inc.release()


def test_incremental_untouched_partitions_stable(spark):
    base = _rows(spark, 0, 70)
    inc = IncrementalAggregate("section", {"total": ("sum", "v")})
    inc.initialize(base)
    before = {r["section"]: r["total"] for r in inc.result().collect()}
    # delta touches only section 0
    delta = spark.createDataFrame([(1000, 0, 5.0)], "id long, section int, v double")
    assert inc.apply_delta(delta) == 1
    after = {r["section"]: r["total"] for r in inc.result().collect()}
    assert after[0] == before[0] + 5.0
    for s in before:
        if s != 0:
            assert after[s] == before[s]
    inc.release()
