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

3. ``batched_depth_soak`` (r10 verdict items 1+4): the COMPACTED
   batched W2 runner at stage depths 48 and 96 — per-batch latency must
   stay FLAT in batch index (the r9 design's O(batches²) history
   re-scan is gone), with the per-phase (merge/emit/swap) breakdown
   recorded and values checked distributedly against the zero-seed JVM
   fold.

4. ``sparse_touch_soak`` (r11): 40 clustered ~1%-touch batches over
   200k keys of BUCKETED state — each sparse merge must cost a small
   fraction of a dense batch's (the r10 layout rewrote the whole table
   for every one), stay flat across the soak, and fold to exactly the
   zero-seed values. The ``scattered`` variants (r12 at 200k keys, r13
   at 1M) additionally pin the delta-log routing, the incremental
   compaction-sweep stall bound (worst batch wall ≤ 2× the median
   sparse merge), and value exactness across forced compactions.

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


def batched_depth_soak(
    spark, n_docs: int = 20000, depth: int = 48
) -> dict:
    """Depth soak of the COMPACTED batched W2 runner (r10 — the r9
    verdict's remaining weak item was the old runner's O(batches²)
    history re-scan). Replays a ``depth``-stage staged stream (one stage
    per micro-batch) through ``_refeed_batched_runner`` with the
    per-batch phase instrumentation on, and checks the property the
    compaction exists to deliver: per-batch latency FLAT in batch index
    (late-third avg vs early-third avg), because each batch reads and
    rewrites exactly one state row per doc regardless of how deep the
    history is. Values are checked distributedly against the zero-seed
    full-history JVM fold (the r9 reference expression), and the state
    table must hold exactly ``n_docs`` rows at the end.
    """
    import tempfile as _tf

    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.operators import chunking, mapstage
    from proactive_map_reduce_spark.streaming import proactive as sp

    # synthesized corpus: every doc has 2*depth distinct words, so C1
    # yields exactly `depth` chunks per doc and every batch touches every
    # key — the densest (worst-case) state-rewrite pattern
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(1, {2 * depth}), "
            "i -> concat('w', id % 97, '_', i)), ' ')"
        ).alias("text"),
    )
    chunks = chunking.partition_equal_arrays(docs, depth)
    root = sp.write_stage_files(chunks)
    out_dir = _tf.mkdtemp(prefix="pmr_soak_bout_")
    state_dir = _tf.mkdtemp(prefix="pmr_soak_bstate_")
    timings: list[dict] = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    t0 = time.time()
    try:
        got = sp._refeed_batched_runner(
            sp._chunk_stream(spark, root),
            out_dir=out_dir,
            state_dir=state_dir,
            timings=timings,
        )
        rows_out = got.count()
        wall = round(time.time() - t0, 1)

        # distributed value check vs the zero-seed full-history fold
        expect = (
            mapstage.llm_map(spark.read.schema(sp.CHUNK_SCHEMA).parquet(root))
            .groupBy("doc_id")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("chunk_id").alias("batch_id"),  # 1 stage/batch
                            "chunk_id",
                            "out_text",
                        )
                    )
                ).alias("xs")
            )
            .select("doc_id", F.explode(F.expr(sp._REFEED_FOLD)).alias("e"))
            .select(
                "doc_id",
                F.col("e.chunk_id").alias("chunk_id"),
                F.col("e.acc_words_before").alias("acc_words_before"),
                F.col("e.chain").alias("chain"),
            )
        )
        mismatches = (
            got.exceptAll(expect).count() + expect.exceptAll(got).count()
        )
        state_rows = sp.read_state_table(
            spark, os.path.join(state_dir, "state")
        ).count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(state_dir, ignore_errors=True)

    try:
        from flatness import thirds_flatness  # script: tools/ on path
    except ImportError:  # imported as tools.scale_probe / tools.soak_stream
        from tools.flatness import thirds_flatness

    batch_s = [
        round(t["merge_s"] + t["emit_s"] + t["swap_s"], 3) for t in timings
    ]
    flat = thirds_flatness(batch_s)
    return {
        "op": "refeed_batched",
        "n_docs": n_docs,
        "depth": depth,
        "batches": len(timings),
        "rows_out": int(rows_out),
        "rows_expected": n_docs * depth,
        "value_mismatches": int(mismatches),
        "state_rows_final": int(state_rows),
        "sec": wall,
        "rows_per_sec": round(rows_out / wall, 1) if wall else None,
        "batch_secs": batch_s,
        "phase_avg_s": {
            k: round(sum(t[k] for t in timings) / max(len(timings), 1), 3)
            for k in ("merge_s", "emit_s", "swap_s")
        },
        **flat,
    }


def sparse_touch_soak(
    spark,
    n_docs: int = 200_000,
    n_sparse: int = 40,
    window: int | None = None,
    scattered: bool = False,
) -> dict:
    """Sparse-touch soak of the bucketed state table (r11; the r10
    verdict's item 1 'done' evidence): build ``n_docs`` keys of state
    with one dense batch, then stream ``n_sparse`` micro-batches each
    touching a rotating CLUSTERED ~1% doc_id window, and close with a
    dense batch. The bucketing contract under soak: every sparse batch's
    merge opens only the touched buckets, so its cost must stay FLAT
    across the soak AND well under the dense batch's merge — where the
    r10 layout paid the full O(total keys) rewrite per batch no matter
    how few keys a batch touched. Values are fully checked against the
    zero-seed JVM fold; the final state must hold exactly ``n_docs``
    rows.

    ``scattered=True`` (r12) strides each sparse batch's keys uniformly
    across the whole key space — the shape where bucket pruning cannot
    help and the r11 layout paid near-dense rewrite. Every such batch
    must route to the DELTA-LOG path (one small appended parquet dir,
    zero bucket rewrites), latency must stay flat across the soak, and
    LSM compaction — forced to fire several times by a low
    PMR_STATE_LOG_COMPACT_FRAC — must fold the logs back without a
    value deviation."""
    import glob
    import statistics
    import tempfile as _tf

    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.operators import mapstage
    from proactive_map_reduce_spark.streaming import proactive as sp

    window = window or n_docs // 100

    def chunk_df(lo, hi, chunk, step=1):
        return spark.range(lo, hi, step).select(
            F.col("id").alias("doc_id"),
            F.lit(chunk).cast("int").alias("chunk_id"),
            F.concat(
                F.lit("w"), (F.col("id") % 97).cast("string"), F.lit(" x")
            ).alias("chunk_text"),
        )

    stages = [chunk_df(0, n_docs, 0)]
    if scattered:
        stride = n_docs // window
        for i in range(n_sparse):
            # rotating offset < stride: `window` keys spread uniformly
            # over the whole id space, disjoint across batches
            stages.append(chunk_df(i % stride, n_docs, i + 1, step=stride))
    else:
        for i in range(n_sparse):
            lo = (i * window) % n_docs
            stages.append(chunk_df(lo, min(lo + window, n_docs), i + 1))
    stages.append(chunk_df(0, n_docs, n_sparse + 1))

    live = _tf.mkdtemp(prefix="pmr_soak_sparse_")
    base_ts = time.time() - 3600
    for k, df in enumerate(stages):
        tmp = os.path.join(live, f".stage_{k}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(live, f"stage-{k:04d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (base_ts + k, base_ts + k))
        shutil.rmtree(tmp, ignore_errors=True)

    out_dir = _tf.mkdtemp(prefix="pmr_soak_sparse_out_")
    state_dir = _tf.mkdtemp(prefix="pmr_soak_sparse_state_")
    timings: list[dict] = []
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    env_saved = {}
    if scattered:
        # force LSM compaction to fire several times inside the soak:
        # each batch logs `window` rows against n_docs bucket rows, so
        # frac = 5·window/n_docs triggers roughly every 5-6 batches
        for k, v in {
            "PMR_STATE_LOG_COMPACT_MIN_LOGS": "4",
            "PMR_STATE_LOG_COMPACT_FRAC": str(5 * window / n_docs),
        }.items():
            env_saved[k] = os.environ.get(k)
            os.environ[k] = v
    t0 = time.time()
    try:
        got = sp._refeed_batched_runner(
            sp._chunk_stream(spark, live),
            out_dir=out_dir,
            state_dir=state_dir,
            timings=timings,
            n_buckets=1024,
            bucket_span=max(window // 8, 64),
        )
        rows_out = got.count()
        wall = round(time.time() - t0, 1)
        expect = (
            mapstage.llm_map(spark.read.schema(sp.CHUNK_SCHEMA).parquet(live))
            .groupBy("doc_id")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("chunk_id", "out_text"))
                ).alias("ps")
            )
            .select(
                "doc_id",
                F.expr(
                    "transform(ps, p -> struct("
                    "p.chunk_id as batch_id, p.chunk_id as chunk_id,"
                    "p.out_text as out_text))"
                ).alias("xs"),
            )
            .select("doc_id", F.explode(F.expr(sp._REFEED_FOLD)).alias("e"))
            .select(
                "doc_id",
                F.col("e.chunk_id").alias("chunk_id"),
                F.col("e.acc_words_before").alias("acc_words_before"),
                F.col("e.chain").alias("chain"),
            )
        )
        mismatches = got.exceptAll(expect).count() + expect.exceptAll(got).count()
        table = os.path.join(state_dir, "state")
        state_rows = sp.read_state_table(spark, table).count()
        logs_left = len(sp._log_dirs(table))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        for k, v in env_saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        shutil.rmtree(live, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(state_dir, ignore_errors=True)

    sparse = [t for t in timings if 1 <= t["batch_id"] <= n_sparse]
    dense_merge = timings[-1]["merge_s"] if timings else None
    merges = [t["merge_s"] for t in sparse]
    half = max(len(merges) // 2, 1)
    early = sum(merges[:half]) / half
    late = sum(merges[-half:]) / half
    med = statistics.median(merges) if merges else None
    compacts = [t["compact_s"] for t in timings if t.get("compact_s")]
    out = {
        "op": "refeed_batched_scattered" if scattered else "refeed_batched_sparse",
        "n_docs": n_docs,
        "touch_per_batch": window,
        "sparse_batches": len(sparse),
        "rows_out": int(rows_out),
        "rows_expected": 2 * n_docs + n_sparse * window,
        "value_mismatches": int(mismatches),
        "state_rows_final": int(state_rows),
        "sec": wall,
        "sparse_merge_s_median": round(med, 3) if med is not None else None,
        "sparse_merge_s_early_half": round(early, 3),
        "sparse_merge_s_late_half": round(late, 3),
        "dense_merge_s": dense_merge,
        "sparse_buckets_touched_max": max(
            (t["buckets_touched"] for t in sparse), default=0
        ),
        "n_buckets": timings[0]["n_buckets"] if timings else None,
        "latency_flat": late <= 1.5 * early,
        "sparse_under_dense": (
            med is not None
            and dense_merge is not None
            and med <= (0.5 if scattered else 0.35) * dense_merge
        ),
    }
    if scattered:
        # r13 stall bound: compaction is an incremental bucket-range
        # sweep, so the WORST sparse batch (merge + its compaction step
        # + emit + swap) must stay within ~2x the median sparse merge —
        # the r12 full fold ran 11.3 s serially inside one micro-batch
        walls = [
            t["merge_s"] + (t.get("compact_s") or 0.0) + t["emit_s"] + t["swap_s"]
            for t in sparse
        ]
        worst_wall = max(walls, default=None)
        med_wall = statistics.median(walls) if walls else None
        out.update(
            {
                "log_path_batches": sum(
                    1 for t in sparse if t.get("path") == "log"
                ),
                "all_sparse_on_log_path": all(
                    t.get("path") == "log" for t in sparse
                ),
                "compaction_steps": len(compacts),
                "compactions": len(compacts),
                "compact_s_max": max(compacts, default=None),
                "worst_batch_wall_s": (
                    round(worst_wall, 3) if worst_wall is not None else None
                ),
                "median_batch_wall_s": (
                    round(med_wall, 3) if med_wall is not None else None
                ),
                "wall_bound_2x_median": (
                    worst_wall is not None
                    and med_wall is not None
                    and worst_wall <= 2.0 * max(med_wall, 1.0)
                ),
                "log_dirs_after_final_dense": logs_left,
            }
        )
    return out


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
    # the r10 compacted batched runner at stage depths 48 and 96: flat
    # per-batch latency + per-phase breakdown (merge/emit/swap) — the
    # evidence the compaction removed the O(batches²) history re-scan
    # (and that flatness holds when the depth doubles again)
    out["durable_batched"] = batched_depth_soak(spark)
    out["durable_batched_deep"] = batched_depth_soak(
        spark, n_docs=10000, depth=96
    )
    # r11 bucketed state: 40 clustered ~1%-touch batches over 200k keys
    # must each cost a small fraction of a dense batch's merge — the r10
    # layout paid the full-table rewrite for every one of them
    out["durable_batched_sparse"] = sparse_touch_soak(spark)
    # r12 delta-log: the same soak with UNIFORMLY SCATTERED touches —
    # the shape bucket pruning can't help — must route every sparse
    # batch to the log path, stay flat, survive several forced LSM
    # compactions, and still fold to the exact reference values
    out["durable_batched_scattered"] = sparse_touch_soak(spark, scattered=True)
    # r13: the same scattered contract at the 1M-key scale the probe
    # claims (SCALE_PROBE w2_sparse measured ONE batch there; this is
    # the multi-batch flatness + compaction-cadence evidence). Fewer
    # batches — each touches 10k keys strided over the full id space.
    out["durable_batched_scattered_1m"] = sparse_touch_soak(
        spark, n_docs=1_000_000, n_sparse=12, scattered=True
    )
    # ok folds EVERY section's invariants (ADVICE r10: it used to cover
    # only the batched depth soaks and was never wired to the exit code,
    # so a regression passed return-code automation): the batched soaks'
    # flat-latency + value checks, plus the durable refeed soak having
    # actually sustained committed batches with every sunk row durable.
    dr = out["durable_refeed"]
    sc_soak = out["durable_batched_scattered"]
    sc_1m = out["durable_batched_scattered_1m"]
    out["ok"] = (
        all(
            r["latency_flat"]
            and r["value_mismatches"] == 0
            and r["rows_out"] == r["rows_expected"]
            and r["state_rows_final"] == r["n_docs"]
            for r in (out["durable_batched"], out["durable_batched_deep"])
        )
        and (dr["batches"] > 0 and dr["rows_sunk"] > 0 and dr["rows_in"] > 0)
        and all(
            s["latency_flat"]
            and s["sparse_under_dense"]
            and s["value_mismatches"] == 0
            and s["rows_out"] == s["rows_expected"]
            and s["state_rows_final"] == s["n_docs"]
            for s in (out["durable_batched_sparse"], sc_soak, sc_1m)
        )
        and all(
            s["all_sparse_on_log_path"]
            and s["compactions"] >= 1
            and s["wall_bound_2x_median"]
            for s in (sc_soak, sc_1m)
        )
    )
    line = json.dumps(out)
    print(line)
    with open(os.path.join(ROOT, "SOAK_STREAM.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
