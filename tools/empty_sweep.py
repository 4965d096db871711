"""Degenerate-input robustness sweep: every registered query on EMPTY
tables (default) or on tables with NULLed-out content columns (--nulls).

Empty mode: a fixture dir whose ten tables carry the exact sf0.001
schemas but zero rows — a 100 TB pipeline hits empty inputs constantly
(a partition-pruned day with no data, a filter that eliminates a
source, a new tenant).

Nulls mode: the sf0.001 rows with every CONTENT column (text, lang,
source, event_type, value, names/types/segments…) nulled on a
deterministic 20% of rows (id % 5 == 0) — dirty-data tolerance. Keys
and timestamps stay non-null (null keys/event-times are a different
contract: dropped/invalid rows, not degraded content).

Every query must compile, execute and return its schema rather than
crash in plan build, model-state collection or UDF paths.

Usage: python tools/empty_sweep.py [--nulls] [query ...]
Prints one line per query; exits non-zero on any failure.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

SF_SCHEMA_SRC = "/root/testdata/sf0.001"

# content columns nulled in --nulls mode, per table (keys/ts stay)
NULLABLE_CONTENT = {
    "documents": ["text", "lang", "source"],
    "events": ["event_type", "value"],
    "customer": ["c_mktsegment", "c_name"],
    "orders": ["o_orderpriority"],
    "part": ["p_type", "p_name"],
    "supplier": ["s_name"],
    "nation": [],
    "region": [],
    "lineitem": [],  # measures feed exact-unit sums; null measures are
    # a data-contract violation there, not degraded content
    "embeddings": [],
}


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--nulls"]
    nulls_mode = "--nulls" in sys.argv[1:]
    # reject unknown names (same rule as compare_oracle.py): a typo must
    # not produce a vacuous exit-0 "0 failures" sweep
    from proactive_map_reduce_spark.queries import REGISTRY as _REG

    unknown = {a for arg in args for a in arg.split(",") if a} - set(_REG)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 2
    only = {n for arg in args for n in arg.split(",") if n}

    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from proactive_map_reduce_spark.session import get_spark
    from proactive_map_reduce_spark.sources.tables import TABLES

    spark = get_spark("empty-sweep")
    tmp = tempfile.mkdtemp(prefix=("nulls_sf_" if nulls_mode else "empty_sf_"))
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SCHEMA_SRC}/{t}.parquet")
        if nulls_mode:
            key = df.columns[0]  # first column is the table's id/key
            gate = F.col(key).cast("bigint") % 5 == 0
            for c in NULLABLE_CONTENT.get(t, []):
                if c in df.columns:
                    df = df.withColumn(
                        c, F.when(gate, F.lit(None)).otherwise(F.col(c))
                    )
        else:
            df = df.limit(0)
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")

    qs = entry.queries()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            out = fn(spark, tmp)
            n = out.count()
            _ = out.schema  # schema must be derivable too
            print(f"PASS {name}: {n} rows")
        except Exception as exc:  # noqa: BLE001 — report, don't mask
            msg = str(exc).split("\n")[0][:200]
            failures.append((name, msg))
            print(f"FAIL {name}: {msg}")
        finally:
            spark.catalog.clearCache()  # drop per-query persisted stages
    print(f"\n{len(failures)} failures / {len(qs) if not only else len(only)} queries")
    for name, msg in failures:
        print(f"  {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
