"""Small-file compaction for parquet datasets.

The operational fix for the classic 100 TB failure mode: a pipeline that
writes one file per task per micro-batch accumulates millions of small
files, and every downstream scan then pays listing + open overhead per
file (plus NameNode/object-store metadata pressure). Compaction rewrites
a dataset into files near a target size so scans split on row-group
boundaries instead of file boundaries.

Sizing uses the dataset's actual on-disk bytes (not row counts): the
repartition count is ceil(bytes / target), so output files land near the
target regardless of row width. The rewrite is a single narrow job when
shrinking file count (coalesce — no shuffle) and a round-robin shuffle
when growing it (repartition — needed to split skewed inputs evenly).

Reference parity: none (the reference writes result JSONL append-only —
test_proactive.py:397-398); this is engine-side operational tooling.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(path: str) -> int:
    """Total bytes of parquet part-files under `path` (local fs)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_compaction(path: str, target_file_mb: int = 128) -> int:
    """Number of output files that puts each near target_file_mb."""
    return max(1, math.ceil(dataset_bytes(path) / (target_file_mb * 1024 * 1024)))


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> DataFrame:
    """Rewrite `src_path` into `dst_path` with files near the target size.

    Returns the re-read compacted DataFrame (same rows, fewer files).
    coalesce() is used when reducing the file count — it merges input
    splits without a shuffle; repartition() only when the source has
    FEWER files than the target (splitting requires redistribution).
    """
    df = spark.read.parquet(src_path)
    n_out = plan_compaction(src_path, target_file_mb)
    n_in = df.rdd.getNumPartitions()
    out = df.coalesce(n_out) if n_out <= n_in else df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path)
