"""proactive_map_reduce_spark — a PySpark-native analytics engine.

Brand-new engine with the query/data-processing capabilities of the
reference repo `zhuohangu/proactive_map_reduce` (see SURVEY.md), built
Spark-first: DataFrame/SQL built-ins wherever possible, Arrow-batched
pandas UDFs / mapInPandas only at the declared black-box seams (the
pluggable "model" map stage, BLEU/ROUGE scoring), Structured Streaming
for the proactive/incremental mode.

Layout:
  session    — SparkSession factory tuned for scale (AQE, pushdown, Arrow)
  sources    — parquet/json/text loaders for the fixture tables
  functions  — scalar text/scoring/hash column functions (F1-F10 in SURVEY §2)
  operators  — chunking, map-stage, reduce, top-k, dedup, similarity,
               text-stats, multimodal plumbing
  plans      — composed end-to-end pipelines (flagship query, analytics)
  streaming  — Structured Streaming proactive mode (W1/W2)
  cache      — tiered result-cache manager (K1-K5)
"""

__version__ = "0.1.0"
