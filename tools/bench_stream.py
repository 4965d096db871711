"""Streaming throughput benchmark: events/sec through the watermarked
tumbling-window aggregation (the engine's streaming hot path).

Drives the sf0.1 events table (100k rows) through the real Structured
Streaming path — file source micro-batches, watermark, append-mode
window aggregation, memory sink — and reports end-to-end throughput.
Complements bench.py (batch wall-clock): a 100 TB/day pipeline cares
about sustained stream rate, not just batch latency.

Usage: python tools/bench_stream.py [sf_dir]    # one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.session import get_spark
    from proactive_map_reduce_spark.sources.tables import load_table
    from proactive_map_reduce_spark.streaming.proactive import (
        EVENT_SCHEMA,
        _run_to_memory,
        write_event_files,
    )

    spark = get_spark("bench-stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()  # JVM warmup outside the measured region

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    # stage the micro-batch input ONCE, outside the measured region —
    # with_hi reuses the max(ts) the writer already computed (no second
    # scan), and _sentinel_ts handles the empty-table case
    root, hi = write_event_files(ev, n_buckets=8, with_hi=True)
    # append-mode only emits a window once the watermark passes it, so a
    # far-future sentinel (arriving last) flushes the trailing windows —
    # without it every window within (1h window + 1h lateness) of max ts
    # is silently missing from n_windows (same device as
    # streaming.proactive.windowed_counts_with_watermark; the sentinel's
    # own window never closes, so it never appears in the count)
    from proactive_map_reduce_spark.streaming.proactive import _sentinel_ts

    spark.createDataFrame(
        [(-1, -1, "__sentinel__", _sentinel_ts(hi), 0.0)], EVENT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(root)

    def transform(s):
        return (
            s.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        )

    # warm the streaming path once (state store + codegen), then measure
    results, n_windows = [], 0
    for _ in range(2):
        t0 = time.time()
        stream = spark.readStream.schema(EVENT_SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(root)
        n_windows = _run_to_memory(stream, transform, shuffle_partitions=8).count()
        results.append(round(time.time() - t0, 3))
    best = min(results)
    print(
        json.dumps(
            {
                "metric": "stream_windowed_agg_throughput",
                "value": round(n_events / best, 1),
                "unit": "events/sec",
                "elapsed_sec": best,
                "n_events": n_events,
                "n_windows": n_windows,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
