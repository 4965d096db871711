"""Tier-load A/B harness: measured fetch-vs-recompute per cache tier.

The engine analog of the reference's pipelined-load comparison
(pipeline_70b_samsum_simple.py:305-383 / pipeline_70b_samsum_compare.py),
which times KV fetch from each storage tier against full recompute for
the staged pipeline's intermediates. Here the intermediate is the staged
map output (llm_map over the chunked corpus); for each tier the harness

  1. persists the intermediate at the tier's StorageLevel and
     materializes it (the "store" that a prior stage already paid),
  2. times a downstream consumption (aggregation over every row) that
     FETCHes from the tier,
  3. times the same consumption with no cache at all (full recompute),

interleaved best-of-N so host drift cancels, and validates
CacheManager.estimated_load_time's bandwidth model against the measured
fetch times. Prints one JSON line per tier plus a summary line with the
cost-model error (model says memory:disk bandwidth is 10:1; on a local
fs with page cache the measured spread is far flatter — the number to
read is the RANK agreement and the fetch-vs-recompute margin, which is
what the placement policy actually acts on).

Usage: python tools/bench_tiers.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from proactive_map_reduce_spark.operators import chunking, mapstage
    from proactive_map_reduce_spark.plans.cache import TIERS, CacheManager, cache_key
    from proactive_map_reduce_spark.session import get_spark

    spark = get_spark("bench-tiers")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def intermediate():
        """The staged-pipeline intermediate: chunked docs through the
        black-box map stage — rebuilt fresh so each persist owns its
        lineage (a shared DataFrame would reuse shuffle files across
        tiers and fake the recompute numbers)."""
        chunks = chunking.partition_equal(chunking.split_words(docs), 4)
        return mapstage.llm_map(chunks)

    def consume(df) -> float:
        t0 = time.time()
        df.agg(
            F.count("*").alias("n"),
            F.sum(F.length("out_text")).alias("total_chars"),
        ).collect()
        return time.time() - t0

    # cold-codegen warmup — deliberately DISCARDED, never part of the
    # measured recompute baseline below
    for _ in range(2):
        consume(intermediate())

    mgr = CacheManager()
    key_of = {t: cache_key("bench_tiers", t) for t in TIERS}
    fetch: dict[str, list[float]] = {t: [] for t in TIERS}
    est_load: dict[str, float] = {}
    recompute: list[float] = []
    for rep in range(reps):
        for tier in TIERS:
            df = intermediate()
            mgr.add(key_of[tier], df, tier=tier)
            df.count()  # materialize the store
            # the model prediction under test — captured while the entry
            # is live, so estimated_load_time's size_gb/bandwidth path
            # actually runs (not just the raw TIERS constants)
            est_load[tier] = mgr.estimated_load_time(key_of[tier])
            fetch[tier].append(consume(mgr.fetch(key_of[tier])))
            mgr.evict(key_of[tier])
        recompute.append(consume(intermediate()))

    recompute_sec = min(recompute)
    rows = []
    for tier in TIERS:
        best = min(fetch[tier])
        rows.append(
            {
                "tier": tier,
                "fetch_sec": round(best, 3),
                "recompute_sec": round(recompute_sec, 3),
                "speedup_vs_recompute": round(recompute_sec / best, 2) if best > 0 else None,
                "model_rel_bandwidth": TIERS[tier][1],
                # size_gb / relative-bandwidth — unit-less model cost, tiny
                # at bench scale; keep significant digits so the per-tier
                # ordering (what decide_tier compares) stays visible
                "model_est_load_cost": float(f"{est_load[tier]:.3g}"),
            }
        )
        print(json.dumps(rows[-1]))

    # cost-model check: estimated_load_time's per-tier predictions (the
    # method decide_tier acts on) vs measured ordering — a regression in
    # the size_gb/bandwidth division would reorder or zero these
    model_rank = sorted(TIERS, key=lambda t: est_load[t])
    meas_rank = sorted(TIERS, key=lambda t: min(fetch[t]))
    mem, dsk = min(fetch["memory"]), min(fetch["disk"])
    summary = {
        "metric": "tier_load_ab",
        "model_rank": model_rank,
        "measured_rank": meas_rank,
        "rank_agreement": model_rank == meas_rank,
        "model_memory_disk_ratio": TIERS["memory"][1] / TIERS["disk"][1],
        "measured_memory_disk_ratio": round(dsk / mem, 2) if mem > 0 else None,
        "fetch_beats_recompute_all_tiers": all(
            min(fetch[t]) < recompute_sec for t in TIERS
        ),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
