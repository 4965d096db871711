"""End-to-end corpus curation from the command line.

Runs the composed curation pipeline (quality gate → minhash near-dup
drop → sentence-level dedup → token-budget packing) over a documents
table and writes the packed manifest — the artifact a training run
consumes. Mirrors `q_curation_pipeline` (oracle-checked); this script is
the user entry point with knobs.

    python examples/run_curation.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/curated --min-quality 0.4 --jaccard 0.5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True, help="dir containing documents.parquet")
    ap.add_argument("--out", default=None, help="write packed manifest parquet here")
    ap.add_argument("--min-quality", type=float, default=None)
    ap.add_argument("--jaccard", type=float, default=None)
    args = ap.parse_args()

    import proactive_map_reduce_spark.queries as Q
    # rebind on queries.curation — the module whose globals
    # q_curation_pipeline actually reads. Setting the attribute on the
    # queries PACKAGE only shadows the star-imported copy there and
    # silently leaves the pipeline on its defaults.
    import proactive_map_reduce_spark.queries.curation as QC
    from proactive_map_reduce_spark.session import get_spark

    if args.min_quality is not None:
        QC.CURATION_QUALITY_MIN = args.min_quality
    if args.jaccard is not None:
        QC.CURATION_JACCARD_MIN = args.jaccard

    spark = get_spark("run-curation")
    spark.sparkContext.setLogLevel("ERROR")

    packed = Q.q_curation_pipeline(spark, args.sf_dir)
    if args.out:
        packed.write.mode("overwrite").parquet(args.out)
        packed = spark.read.parquet(args.out)
    import pyspark.sql.functions as F

    agg = packed.agg(
        F.count("*").alias("n_packs"),
        # coalesce: a gate strict enough to drop every doc yields an
        # empty manifest, whose sums are null — report zeros, not a crash
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
    ).collect()[0]
    print(
        {
            "packs": int(agg["n_packs"]),
            "docs_packed": int(agg["n_docs"]),
            "tokens": int(agg["n_tokens"]),
            "out": args.out,
        }
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
