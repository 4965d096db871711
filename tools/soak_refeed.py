"""Deep-chain soak for the W2 v2 sequential re-feed operator (round 6).

``q_stream_refeed_chain`` replays NUM_STEPS=4 stages per document; the
reference runs ``--num_steps`` 10+ (test_proactive.py:29-33) and its v2
accumulator grows with every stage. This soak drives the SAME stateful
operator (streaming/proactive._refeed) at reference-realistic depths
and pins the two properties that matter at 100 TB:

1. **State ∝ keys, not rows.** The per-doc state is a constant-size
   (acc_words BIGINT, chain CHAR(8)) tuple, so the state store must
   hold exactly n_docs rows at every depth and its bytes must NOT grow
   with stage count — a state design that accumulated per-stage rows
   would grow ×depth and OOM a long-running production chain. Measured
   from the streaming engine's own stateOperators progress metrics.

2. **Exact sequential values at depth.** Every emitted
   (acc_words_before, chain) row is compared against an independent
   driver-side fold over the batch-mapped outputs in chunk order — the
   same recursion the DuckDB recursive-CTE oracle checks at depth 4,
   re-derived here at each soak depth (rows are n_docs×depth ≈ 6k at
   the default config: driver-safe).

Usage: python tools/soak_refeed.py [--depths=4,12] [--ndocs=100,500]
                                   [--sf=/root/testdata/sf0.001]
Writes SOAK_REFEED.json (one JSON line) at the repo root.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_config(spark, sf_dir: str, n_docs: int, depth: int) -> dict:
    import uuid

    from proactive_map_reduce_spark.operators import chunking, mapstage
    from proactive_map_reduce_spark.queries._base import _docs
    from proactive_map_reduce_spark.sources.tables import ensure_parallelism
    from proactive_map_reduce_spark.streaming import proactive as sp

    docs = ensure_parallelism(_docs(spark, sf_dir)).limit(n_docs)
    chunks = chunking.partition_equal_arrays(docs, depth)

    # --- independent oracle: batch map + driver fold in chunk order ----
    mapped = (
        mapstage.llm_map(chunks)
        .select("doc_id", "chunk_id", "out_text")
        .collect()
    )
    mapped.sort(key=lambda r: (r.doc_id, r.chunk_id))
    expect: dict[tuple, tuple] = {}
    acc_state: dict[int, tuple[int, str]] = {}
    for r in mapped:
        acc, chain = acc_state.get(r.doc_id, (0, ""))
        chain = hashlib.md5((chain + (r.out_text or "")).encode()).hexdigest()[:8]
        expect[(r.doc_id, r.chunk_id)] = (acc, chain)
        toks = [w for w in (r.out_text or "").split(" ") if w]
        acc_state[r.doc_id] = (acc + len(toks), chain)

    # --- the streaming run, instrumented -------------------------------
    from pyspark.sql.streaming.state import GroupStateTimeout

    root = sp.write_stage_files(chunks)
    name = "pmr_soak_" + uuid.uuid4().hex[:8]
    ckpt = sp._ckpt_dir()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    t0 = time.time()
    try:
        stream = sp._chunk_stream(spark, root)
        out = mapstage.llm_map(stream).groupBy("doc_id").applyInPandasWithState(
            sp._refeed,
            outputStructType=sp._REFEED_OUT,
            stateStructType="acc_words long, chain string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = [json.loads(p.json) for p in q.recentProgress]
        rows = spark.table(name).collect()
        spark.catalog.dropTempView(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
    wall = round(time.time() - t0, 1)

    # --- the batched relational runner (r9 default mode) on the SAME
    # staged arrival: value-checked against the same driver fold, so the
    # depth soak pins BOTH state implementations (the per-key path above
    # additionally evidences the state-store metrics; the batched path
    # has no state store — its state is the per-batch parquet table).
    root2 = sp.write_stage_files(chunks)
    t0b = time.time()
    try:
        brows = sp._refeed_batched_runner(sp._chunk_stream(spark, root2)).collect()
    finally:
        shutil.rmtree(root2, ignore_errors=True)
    batched_sec = round(time.time() - t0b, 1)
    batched_mismatches = sum(
        1
        for r in brows
        if expect.get((r.doc_id, r.chunk_id)) != (r.acc_words_before, r.chain)
    )

    # --- value check ----------------------------------------------------
    mismatches = 0
    for r in rows:
        want = expect.get((r.doc_id, r.chunk_id))
        if want is None or (r.acc_words_before, r.chain) != want:
            mismatches += 1
    # --- state metrics: rows must equal keys; bytes tracked per batch ---
    state_rows, state_bytes = [], []
    for p in progresses:
        for op in p.get("stateOperators", []):
            if op.get("operatorName") == "applyInPandasWithState":
                state_rows.append(op["numRowsTotal"])
                state_bytes.append(op["memoryUsedBytes"])
    return {
        "n_docs": n_docs,
        "depth": depth,
        "rows_out": len(rows),
        # short documents yield fewer than `depth` chunks (C1 slices an
        # actual word list) — the contract is one output row per EXISTING
        # chunk, which is exactly what the batch-mapped set enumerates
        "rows_expected": len(mapped),
        "value_mismatches": mismatches,
        "batches": len(progresses),
        "state_rows_final": state_rows[-1] if state_rows else None,
        "state_rows_max": max(state_rows) if state_rows else None,
        "state_bytes_final": state_bytes[-1] if state_bytes else None,
        "state_bytes_max": max(state_bytes) if state_bytes else None,
        "sec": wall,
        "batched_rows_out": len(brows),
        "batched_value_mismatches": batched_mismatches,
        "batched_sec": batched_sec,
    }


def main() -> int:
    depths = [4, 12]
    ndocs = [100, 500]
    sf_dir = "/root/testdata/sf0.001"
    for a in sys.argv[1:]:
        if a.startswith("--depths="):
            depths = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--ndocs="):
            ndocs = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from proactive_map_reduce_spark.session import get_spark

    spark = get_spark("soak-refeed")
    spark.sparkContext.setLogLevel("ERROR")
    runs = []
    for n in ndocs:
        for d in depths:
            print(f"=== n_docs={n} depth={d}", flush=True)
            res = run_config(spark, sf_dir, n, d)
            print(json.dumps(res), flush=True)
            runs.append(res)
    spark.stop()

    ok = True
    for r in runs:
        ok &= r["rows_out"] == r["rows_expected"]
        ok &= r["value_mismatches"] == 0
        ok &= r["batched_rows_out"] == r["rows_expected"]
        ok &= r["batched_value_mismatches"] == 0
        # the plateau contract: state rows == key count, at EVERY depth
        ok &= r["state_rows_final"] == r["n_docs"]
        ok &= r["state_rows_max"] == r["n_docs"]
    # depth must not grow state bytes for a fixed key count (same n_docs,
    # deepest vs shallowest — allow 25% slack for store overhead noise)
    for n in ndocs:
        group = sorted((r for r in runs if r["n_docs"] == n), key=lambda r: r["depth"])
        if len(group) >= 2 and group[0]["state_bytes_max"]:
            ratio = group[-1]["state_bytes_max"] / group[0]["state_bytes_max"]
            ok &= ratio < 1.25
            group[-1]["state_bytes_ratio_vs_shallowest"] = round(ratio, 3)

    summary = {
        "metric": "soak_refeed_chain",
        "sf_dir": sf_dir,
        "runs": runs,
        "ok": bool(ok),
    }
    line = json.dumps(summary)
    print("\n" + line)
    with open(os.path.join(ROOT, "SOAK_REFEED.json"), "w") as f:
        f.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
