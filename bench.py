"""Per-round benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (computes every output
column, no collect/driver transfer). The headline set spans the engine's
pillars: relational aggregation/joins over the largest table (lineitem),
event windows, the flagship chunked map-reduce pipeline, tokenization,
minhash dedup, simhash, and similarity search.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from proactive_map_reduce_spark.queries import REGISTRY
    from proactive_map_reduce_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session (JVM/codegen) outside the measured region
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = REGISTRY[name](spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
