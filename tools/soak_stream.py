"""Rate-source streaming soak: unbounded input, bounded state.

Runs the watermarked-window and stateful-accumulator shapes concurrently
from a `rate` source for N seconds (default 30) and prints one JSON line
with throughput and state-store growth. Complements tools/bench_stream.py
(file-replay throughput): this one evidences state EVICTION and keyed
state PLATEAU under an input that never ends.

Usage: python tools/soak_stream.py [duration_s] [rows_per_second]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    duration = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rate = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

    from proactive_map_reduce_spark.session import get_spark
    from proactive_map_reduce_spark.streaming.proactive import rate_source_soak

    spark = get_spark("soak-stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    out = rate_source_soak(spark, duration_s=duration, rows_per_second=rate)
    out.update({"metric": "rate_source_soak", "duration_s": duration, "unit": "rows/sec"})
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
