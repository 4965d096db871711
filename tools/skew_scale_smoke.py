"""Skew-at-scale smoke: do the hot-key plans hold at 10× SKEWED data?

`tools/scale_smoke.py` proves near-linear factors on UNIFORM 10×
replicas; the `--skew` value gate proves correctness under a hot key at
sf0.001. This tool measures the missing cell: WALL-CLOCK behavior when
one key owns half the table and the table grows 10×.

Fixture: sf0.1 events replicated 10× (ids offset per replica, same
narrow explode as scale_smoke), then 50% of ALL rows remapped to
user_id 0 — a ~500k-row hot key among ~1,500 cold ones. Every
user-partitioned window (sessionization, interarrival, anomaly
z-scores, per-user top-N) then has one partition ~750× the median.

What the factors mean:
- A per-user window is inherently SERIAL in its hot partition — the
  honest lower bound is linear in the hot key's rows. Factors ≈10× at
  10× data mean the plan degrades linearly (no super-linear sort/join
  blowup, no OOM) and cold keys still parallelize around the hot one.
- A factor ≫10× or an error would expose a quadratic surface (e.g. a
  range self-join inside the hot key) — the thing to find BEFORE a
  production bot account finds it.
- The documented mitigation for hot-key AGGREGATES is salting
  (q_salted_agg / q_salted_join two-phase forms); order-dependent
  windows cannot salt without changing semantics, so their contract is
  "linear in hot-key size", measured here.

Usage: python tools/skew_scale_smoke.py [replicas]   # default 10
Writes /tmp/pmr_scale_skew_<N>x (kept for reuse; pmr_scale_ prefix is
retention-exempt) and SKEW_SCALE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"

# hot-key-sensitive queries: per-user windows + the salted two-phase agg.
# r7 adds the chunked interarrival form so the hot-key-parallel template's
# value is MEASURED against its plain sibling on the same fixture, not
# just argued (identical output contract — the chunked factor should sit
# below the plain form's serial-in-hot-key bound).
QUERIES = [
    "q_sessionize",
    "q_window_tumbling",
    "q_event_interarrival",
    "q_event_interarrival_chunked",
    "q_event_anomaly",
    "q_topn_per_group",
    "q_salted_agg",
]


def build(spark, replicas: int) -> str:
    from pyspark.sql import functions as F

    out = f"/tmp/pmr_scale_skew_{replicas}x"
    if os.path.isdir(out) and os.path.exists(out + "/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings", "lineitem", "orders"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    ev = (
        ev.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
        .withColumn("event_id", F.col("event_id") + F.col("__r").cast("long") * 10_000_000)
        .drop("__r")
        # the skew: half of ALL rows land on user 0 (deterministic gate)
        .withColumn(
            "user_id",
            F.when(F.col("event_id") % 2 == 0, F.lit(0).cast("long")).otherwise(
                F.col("user_id")
            ),
        )
    )
    ev.repartition(max(8, replicas)).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    open(out + "/_DONE", "w").write("ok")
    return out


def build_1x(spark) -> str:
    """Same 50% hot-key remap at 1× — the denominator must carry the SAME
    skew so the factor isolates SCALE, not the remap itself."""
    from pyspark.sql import functions as F

    out = "/tmp/pmr_scale_skew_1x"
    if os.path.isdir(out) and os.path.exists(out + "/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "documents", "embeddings", "lineitem", "orders"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    ev = spark.read.parquet(f"{BASE}/events.parquet").withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(0).cast("long")).otherwise(
            F.col("user_id")
        ),
    )
    ev.repartition(8).write.mode("overwrite").parquet(f"{out}/events.parquet")
    open(out + "/_DONE", "w").write("ok")
    return out


def run_set(spark, registry, sf_dir):
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    times, rows = {}, {}
    for name in QUERIES:
        spark.catalog.clearCache()
        try:
            df = registry[name](spark, sf_dir)
            obs = Observation(f"rows_{name}_{os.path.basename(sf_dir)}")
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
    from proactive_map_reduce_spark.queries import REGISTRY
    from proactive_map_reduce_spark.session import get_spark

    spark = get_spark("skew-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    one = build_1x(spark)
    big = build(spark, replicas)

    for name in QUERIES:  # warm codegen + python workers
        try:
            REGISTRY[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    t1, r1 = run_set(spark, REGISTRY, one)
    tn, rn = run_set(spark, REGISTRY, big)

    def _num(x):
        return isinstance(x, (int, float)) and not isinstance(x, bool)

    factors = {
        k: round(tn[k] / t1[k], 1)
        if _num(t1.get(k)) and _num(tn.get(k)) and t1[k] > 0.05
        else None
        for k in QUERIES
    }
    summary = {
        "metric": "skew_scale_smoke",
        "replicas": replicas,
        "hot_key_share": 0.5,
        "t_skew_1x": t1,
        "t_skew_Nx": tn,
        "factor": factors,
        "rows_1x": r1,
        "rows_Nx": rn,
    }
    line = json.dumps(summary)
    print(line)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "SKEW_SCALE.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
