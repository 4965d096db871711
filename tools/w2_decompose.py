"""Decompose q_stateful_accumulate's wall at a compute-dominated scale.

The r13 verdict (Next #6): the sf1 gate measured the W2 accumulator at
49.3 s in-gate / ~31 s isolated — decompose it into its phases (stage
materialization, per-micro-batch merge / touched-probe / emit / swap /
compaction, final reduction) so the residual is attributable: Spark
job-scheduling floor per batch vs state I/O vs replay semantics.

Runs the exact q_stateful_accumulate composition (write_stage_files →
availableNow file stream → batched LSM state runner → final_accumulation
noop) against $SPARK_GRAFT_SF_DIR, with the runner's own `timings` hook
capturing per-phase seconds per micro-batch.

Usage: SPARK_GRAFT_SF_DIR=<dir> python tools/w2_decompose.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else None

    from proactive_map_reduce_spark.queries._base import _chunks
    from proactive_map_reduce_spark.session import get_spark
    from proactive_map_reduce_spark.streaming import proactive as sp

    spark = get_spark("w2-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    # driver-style production confs (the gate's regime), not the bench's
    # interactive tune — this decomposes the GATE wall.

    t0 = time.time()
    root = sp.write_stage_files(_chunks(spark, sf_dir))
    t_stage = time.time() - t0

    timings: list[dict] = []
    try:
        t1 = time.time()
        updates = sp._accumulate_batched_runner(
            sp._chunk_stream(spark, root), timings=timings
        )
        t_stream = time.time() - t1
        t2 = time.time()
        sp.final_accumulation(updates).select(
            "doc_id", "final_text", "n_chunks"
        ).write.format("noop").mode("overwrite").save()
        t_final = time.time() - t2
    finally:
        shutil.rmtree(root, ignore_errors=True)

    phases = {
        k: round(sum(float(t.get(k) or 0.0) for t in timings), 2)
        for k in ("merge_s", "touch_s", "emit_s", "swap_s", "compact_s", "rescale_s")
    }
    accounted = sum(phases.values())
    out = {
        "metric": "w2_stateful_accumulate_decomposition",
        "sf_dir": sf_dir,
        "n_batches": len(timings),
        "stage_write_s": round(t_stage, 2),
        "stream_total_s": round(t_stream, 2),
        "final_reduce_s": round(t_final, 2),
        "total_s": round(t_stage + t_stream + t_final, 2),
        "phase_totals": phases,
        "stream_unaccounted_s": round(t_stream - accounted, 2),
        "per_batch": timings,
    }
    print(json.dumps(out, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
