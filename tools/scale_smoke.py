"""Scale-up smoke: do the headline plans hold at 10× data?

Synthesizes a 10× copy of the sf0.1 fixtures (ids offset per replica so
joins/dedup semantics stay non-degenerate), runs the headline queries at
1× and 10×, and prints the per-query scaling factor. Near-linear factors
(≈10× data → ≲10× time on a fixed machine) are the evidence that no plan
hides a super-linear join blowup, a driver-side funnel, or a
single-partition choke point.

Usage: python tools/scale_smoke.py [replicas]   # default 10
Writes the replicated tables to /tmp/pmr_scale_<replicas>x (reused if
present); prints one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
QUERIES = [
    "q_pricing_summary",
    "q_top_revenue",
    "q_region_revenue",
    "q_window_tumbling",
    "q_sessionize",
    "q_flagship",
    "q_tokenize",
    "q_dedup_minhash_pairs",
    "q_simhash",
    "q_similarity_topk",
]
# id column to offset per replica so replicated rows stay distinct
OFFSETS = {
    "documents": ("doc_id", 1_000_000),
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "events": ("event_id", 10_000_000),
    "embeddings": ("vec_id", 1_000_000),
}
SMALL = ["region", "nation", "customer", "supplier", "part"]


def build(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out = f"/tmp/pmr_scale_{replicas}x"
    if os.path.isdir(out) and os.path.exists(out + "/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    for t in SMALL:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t, (idc, stride) in OFFSETS.items():
        base = spark.read.parquet(f"{BASE}/{t}.parquet")
        # one narrow pass: explode a replica index instead of an N-way
        # union (constant-size plan at any replica count)
        df = base.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
        ).withColumn(idc, F.col(idc) + F.col("__r").cast("long") * stride)
        if t == "documents":
            # perturb text per replica so dedup isn't all-identical
            df = df.withColumn(
                "text", F.concat(F.col("text"), F.lit(" replica"), F.col("__r"))
            )
        df = df.drop("__r")
        # keep build partitions proportional to the replica count so the
        # written files stay executor-memory-sized at 100×
        df.repartition(max(8, replicas)).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    open(out + "/_DONE", "w").write("ok")
    return out


def run_set(spark, registry, sf_dir):
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    times, rows = {}, {}
    for name in QUERIES:
        spark.catalog.clearCache()
        # a single query failing at scale must not discard every timing
        # already collected — report the survivors plus the failure
        try:
            df = registry[name](spark, sf_dir)
            obs = Observation(f"rows_{name}")
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 2)
            rows[name] = obs.get["n"]
        except Exception as exc:  # noqa: BLE001 — survive, record
            times[name] = None
            rows[name] = f"ERROR: {str(exc).splitlines()[0][:160]}"
    return times, rows


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if len(sys.argv) > 2:  # optional comma-separated query-name override
        QUERIES[:] = sys.argv[2].split(",")
    from proactive_map_reduce_spark.queries import REGISTRY
    from proactive_map_reduce_spark.session import get_spark

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    big = build(spark, replicas)

    # warm codegen + python workers once
    for name in QUERIES:
        try:
            REGISTRY[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    t1, r1 = run_set(spark, REGISTRY, BASE)
    tn, rn = run_set(spark, REGISTRY, big)
    def _num(x):
        return isinstance(x, (int, float)) and not isinstance(x, bool)

    factors = {
        k: round(tn[k] / t1[k], 1)
        if _num(t1.get(k)) and _num(tn.get(k)) and t1[k] > 0.05
        else None
        for k in QUERIES
    }
    out_growth = {
        k: round(rn[k] / r1[k], 1)
        if _num(r1.get(k)) and _num(rn.get(k)) and r1[k]
        else None
        for k in QUERIES
    }
    print(
        json.dumps(
            {
                "replicas": replicas,
                "t_1x": t1,
                "t_Nx": tn,
                "factor": factors,
                "rows_1x": r1,
                "rows_Nx": rn,
                "output_growth": out_growth,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
