"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship chunked map-reduce query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus
the beyond-reference capabilities (inventory in COVERAGE.md);
``oracle_sql()`` gives the DuckDB-equivalent SQL for EVERY registered
query — the former rows-only ops are now hash-checked too (BLEU/ROUGE
via integer n-gram/LCS counts, IVF via deterministic fixed-point
Lloyd's, sketches via KMV + histogram bins).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from proactive_map_reduce_spark.oracles import ORACLES
from proactive_map_reduce_spark.queries import REGISTRY
from proactive_map_reduce_spark.session import apply_runtime_confs

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: chunked map (stand-in model) → ordered incremental
    reduce → ground-truth join → scoring, on /root/testdata/sf0.001."""
    apply_runtime_confs(spark)
    return REGISTRY["q_flagship"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
