"""Engine equivalent of the reference's entry point
(`run_proactive.sh` → `test_proactive.py --num_steps N`).

Reads a corpus (a directory of {doc_id}.txt files, or a parquet documents
table), runs the proactive chunked map-reduce pipeline against the
sibling ground-truth corpus, writes scored JSONL results, and prints the
metric means — the full workflow a reference user runs today.

    python examples/run_proactive.py --corpus /root/testdata/sf0.001 \
        --num-steps 4 --mode streaming --out /tmp/results

A real model plugs in by passing `model_fn` to ProactivePipeline (see
pipeline.py docstring); this script uses the deterministic stand-in.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help=".txt dir or sf parquet dir")
    ap.add_argument("--num-steps", type=int, default=4)
    ap.add_argument("--mode", choices=["batch", "streaming"], default="batch")
    ap.add_argument("--out", default=None, help="JSONL results dir")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.pipeline import ProactivePipeline
    from proactive_map_reduce_spark.session import get_spark
    from proactive_map_reduce_spark.sources.tables import load_table
    from proactive_map_reduce_spark.sources.text_corpus import read_text_corpus

    spark = get_spark("run-proactive")
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(os.path.join(args.corpus, "documents.parquet")):
        docs = load_table(spark, args.corpus, "documents").select("doc_id", "text")
    elif args.corpus.endswith(".parquet"):
        # direct path to a documents parquet file/dir
        docs = spark.read.parquet(args.corpus).select("doc_id", "text")
    else:
        docs = read_text_corpus(spark, args.corpus)

    pipe = ProactivePipeline(spark, num_steps=args.num_steps)
    # ground truth: the stand-in model's ideal output (a real run joins a
    # parallel corpus here instead — S2)
    gt = (
        pipe.reduce_stage(pipe.map_stage(pipe.chunk(docs)))
        .select("doc_id", F.col("final_text").alias("gt_text"))
    )
    run = pipe.run_streaming if args.mode == "streaming" else pipe.run_batch
    results = run(docs, gt)

    if args.out:
        # persist: otherwise the JSONL write AND the metric means below
        # each recompute the whole chunk→map→reduce→score pipeline
        results = results.persist()
        pipe.write_results(results, args.out)
    means = results.agg(
        F.round(F.avg("f1"), 6).alias("f1"),
        F.round(F.avg("bleu"), 6).alias("bleu"),
        F.round(F.avg("exact_match"), 6).alias("em"),
        F.count("*").alias("n"),
    ).collect()[0]
    print(dict(means.asDict()))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
