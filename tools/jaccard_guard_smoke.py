"""Pair-expansion guard smoke: is the exact-Jaccard set-join traffic
bounded by signature confirmation at scale?

The exact-Jaccard confirmation of LSH candidates shuffles, for every
candidate pair, both docs' hashed-shingle sets — sum(|A|+|B|) int64s.
The signature-agreement guard (dedup.signature_agreement, n_sig_match
>= 8) pays a 16-int-per-side join first, so only confirmed near-dups
reach the set join. This smoke replicates the sf0.1 fixtures N x (reusing
scale_smoke's builder: ids offset per replica, so every replica's dup
cluster is a REAL near-dup cluster at N x volume) and accounts the exact
set-join traffic pre- and post-guard, plus candidate/confirmed counts
and the confirmed pipeline's wall time.

The bound being demonstrated: post-guard traffic == the traffic of true
near-dups only, and both counts scale linearly in replicas (each replica
contributes its own cluster) — no super-linear candidate blowup reaches
the heavy join.

Usage: python tools/jaccard_guard_smoke.py [replicas]   # default 10
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def measure(spark, sf_dir: str) -> dict:
    from proactive_map_reduce_spark.operators import chunking
    from proactive_map_reduce_spark.operators import dedup as dedup_ops
    from proactive_map_reduce_spark.queries import (
        MINHASH_BANDS,
        MINHASH_MIN_AGREEMENT,
        MINHASH_N,
        _docs,
    )

    t0 = time.time()
    combined = dedup_ops.minhash_with_sets(
        dedup_ops.shingle_rows(
            chunking.split_words(_docs(spark, sf_dir))
        ),
        MINHASH_N,
    ).persist()
    pairs = dedup_ops.lsh_candidate_pairs(combined, MINHASH_N, MINHASH_BANDS)
    agree = dedup_ops.signature_agreement(pairs, combined, MINHASH_N).persist()
    sizes = combined.select("doc_id", F.size("shingles").alias("sz"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))

    def traffic(p):
        row = (
            p.join(sa, "doc_a")
            .join(sb, "doc_b")
            .agg(
                F.count("*").alias("n_pairs"),
                F.coalesce(F.sum(F.col("sz_a") + F.col("sz_b")), F.lit(0)).alias(
                    "set_join_int64s"
                ),
            )
            .collect()[0]
        )
        return int(row["n_pairs"]), int(row["set_join_int64s"])

    n_cand, pre = traffic(agree)
    confirmed = agree.filter(F.col("n_sig_match") >= MINHASH_MIN_AGREEMENT)
    n_conf, post = traffic(confirmed)
    # the guarded pipeline end-to-end (agreement join + exact jaccard of
    # survivors), forced through a real action. Unpersist FIRST: the
    # registry query builds a structurally identical signature plan, and
    # Spark's plan-cache matching would silently serve it from the smoke's
    # live persisted blocks, excluding the dominant shingle/signature
    # build from the "end-to-end" wall time.
    agree.unpersist(blocking=True)
    combined.unpersist(blocking=True)
    spark.catalog.clearCache()
    from proactive_map_reduce_spark.queries import REGISTRY

    t1 = time.time()
    REGISTRY["q_dedup_minhash_confirmed"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    wall_confirmed = time.time() - t1
    return {
        "candidates": n_cand,
        "confirmed": n_conf,
        "set_join_mb_pre_guard": round(pre * 8 / 1e6, 2),
        "set_join_mb_post_guard": round(post * 8 / 1e6, 2),
        "wall_confirmed_pipeline_sec": round(wall_confirmed, 2),
        "wall_total_sec": round(time.time() - t0, 2),
    }


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from proactive_map_reduce_spark.session import get_spark
    from tools.scale_smoke import BASE, build

    spark = get_spark("jaccard-guard-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, replicas)
    out = {
        "metric": "jaccard_guard_smoke",
        "replicas": replicas,
        "base": measure(spark, BASE),
        "scaled": measure(spark, big),
    }
    b, s = out["base"], out["scaled"]
    out["traffic_growth_post_guard"] = (
        round(s["set_join_mb_post_guard"] / b["set_join_mb_post_guard"], 2)
        if b["set_join_mb_post_guard"]
        else None
    )
    out["confirmed_growth"] = (
        round(s["confirmed"] / b["confirmed"], 2) if b["confirmed"] else None
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
