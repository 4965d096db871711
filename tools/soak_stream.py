"""Rate-source streaming soak: unbounded input, bounded state.

Two measurements, one artifact (SOAK_STREAM.json):

1. ``rate_source_soak`` (noop sink): the watermarked-window and
   stateful-accumulator shapes concurrently — state EVICTION and keyed
   state PLATEAU under an input that never ends, sink cost excluded.
2. ``durable_refeed_soak`` (r9 verdict item 5): the W2 v2 sequential
   re-feed chain (``streaming.proactive._refeed`` — per-key md5 chain +
   running word count) at a FIXED input rate with the durable
   ``foreachBatch``→parquet sink IN the loop. The r8 durable-sink mode
   had correctness + recovery tests but no sustained-rate evidence;
   this records rows/s, per-batch trigger latency, and state-store
   rows/bytes (numRowsTotal / memoryUsedBytes) with executor-side
   parquet commits on every micro-batch.

Complements tools/bench_stream.py (file-replay throughput) and
tools/soak_refeed.py (depth-soak value checks).

Usage: python tools/soak_stream.py [duration_s] [rows_per_second]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def durable_refeed_soak(
    spark, duration_s: int = 30, rows_per_second: int = 5000, n_keys: int = 500
) -> dict:
    """Fixed-rate soak of the refeed chain with the parquet sink in-loop.

    The rate source synthesizes staged chunk arrival: ``doc_id = value %
    n_keys`` and ``chunk_id = value div n_keys`` — values increase
    monotonically, so every doc's chunks arrive in chunk order, the same
    contract ``write_stage_files`` provides by mtime. Each micro-batch
    runs the real pipeline (llm_map → applyInPandasWithState _refeed)
    and lands under ``out_dir/batch-<id>`` with per-batch overwrite
    (the ``_run_to_parquet`` idempotence shape) — so the measured rate
    includes the durable commit, not just state maintenance.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from proactive_map_reduce_spark.operators import mapstage
    from proactive_map_reduce_spark.streaming import proactive as sp

    out_dir = tempfile.mkdtemp(prefix="pmr_soak_sink_")
    ckpt = sp._ckpt_dir()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(
            (F.col("value") % n_keys).alias("doc_id"),
            (F.col("value") / n_keys).cast("int").alias("chunk_id"),
            F.concat(
                F.lit("tok"), (F.col("value") % 97).cast("string"), F.lit(" w")
            ).alias("chunk_text"),
        )
    )
    out = mapstage.llm_map(src).groupBy("doc_id").applyInPandasWithState(
        sp._refeed,
        outputStructType=sp._REFEED_OUT,
        stateStructType="acc_words long, chain string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _write_batch(batch_df, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch-{batch_id:09d}")
        )

    seen: dict[int, dict] = {}
    q = (
        out.writeStream.foreachBatch(_write_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        t_end = time.time() + duration_s
        while time.time() < t_end:
            time.sleep(min(2.0, max(0.1, t_end - time.time())))
            # recentProgress is CAPPED (~100 updates): poll and fold
            for p in q.recentProgress:
                if p is not None:
                    seen[p["batchId"]] = p
    finally:
        prev_level = "ERROR"
        try:
            prev_level = (
                spark.sparkContext._jvm.org.apache.logging.log4j.LogManager
                .getRootLogger().getLevel().toString()
            )
        except Exception:
            pass
        spark.sparkContext.setLogLevel("FATAL")
        try:
            q.stop()
        except Exception:
            pass
        try:
            spark.sparkContext.setLogLevel(prev_level)
        except Exception:
            spark.sparkContext.setLogLevel("ERROR")
        spark.conf.set("spark.sql.shuffle.partitions", old)

    progresses = [seen[k] for k in sorted(seen)]
    rows_in = sum(p["numInputRows"] for p in progresses)
    trig_ms = [
        p["durationMs"]["triggerExecution"]
        for p in progresses
        if "triggerExecution" in p.get("durationMs", {})
    ]
    state_rows, state_bytes = [], []
    for p in progresses:
        for op in p.get("stateOperators", []):
            if op.get("operatorName") == "applyInPandasWithState":
                state_rows.append(op["numRowsTotal"])
                state_bytes.append(op["memoryUsedBytes"])
    batch_dirs = [d for d in os.listdir(out_dir) if d.startswith("batch-")]
    rows_sunk = (
        spark.read.parquet(*[os.path.join(out_dir, d) for d in batch_dirs]).count()
        if batch_dirs
        else 0
    )
    res = {
        "sink": "parquet_foreachBatch",
        "n_keys": n_keys,
        "batches": len(progresses),
        "rows_in": int(rows_in),
        "rows_per_sec": round(rows_in / duration_s, 1),
        "batch_ms_avg": round(sum(trig_ms) / len(trig_ms), 1) if trig_ms else None,
        "batch_ms_max": max(trig_ms) if trig_ms else None,
        "state_rows_max": int(max(state_rows)) if state_rows else 0,
        "state_rows_final": int(state_rows[-1]) if state_rows else 0,
        "state_bytes_max": int(max(state_bytes)) if state_bytes else 0,
        "batch_dirs_committed": len(batch_dirs),
        "rows_sunk": int(rows_sunk),
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    return res


def main() -> None:
    duration = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rate = int(sys.argv[2]) if len(sys.argv) > 2 else 20000

    from proactive_map_reduce_spark.session import get_spark
    from proactive_map_reduce_spark.streaming.proactive import rate_source_soak

    spark = get_spark("soak-stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    out = rate_source_soak(spark, duration_s=duration, rows_per_second=rate)
    out.update(
        {"metric": "rate_source_soak", "duration_s": duration, "unit": "rows/sec"}
    )
    # the durable-sink soak runs at a lower fixed rate: every batch pays
    # a real parquet commit + the Python map/state seams — the number of
    # interest is sustained rows/s WITH durability, beside the
    # sink-excluded stateful number above
    out["durable_refeed"] = durable_refeed_soak(
        spark, duration_s=duration, rows_per_second=max(rate // 4, 1000)
    )
    line = json.dumps(out)
    print(line)
    with open(os.path.join(ROOT, "SOAK_STREAM.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
