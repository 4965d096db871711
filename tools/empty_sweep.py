"""Zero-row robustness sweep: every registered query on EMPTY tables.

Builds a fixture dir whose ten tables carry the exact sf0.001 schemas but
zero rows, then runs the full REGISTRY against it. A 100 TB pipeline hits
empty inputs constantly (a partition-pruned day with no data, a filter
that eliminates a source, a new tenant) — every query must compile,
execute and return its schema on empty input rather than crash in plan
build, model-state collection or UDF paths.

Usage: python tools/empty_sweep.py [query ...]
Prints one line per query; exits non-zero on any failure.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

SF_SCHEMA_SRC = "/root/testdata/sf0.001"


def main() -> int:
    only = {n for arg in sys.argv[1:] for n in arg.split(",") if n}

    import __spark_entry__ as entry
    from proactive_map_reduce_spark.session import get_spark
    from proactive_map_reduce_spark.sources.tables import TABLES

    spark = get_spark("empty-sweep")
    tmp = tempfile.mkdtemp(prefix="empty_sf_")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SCHEMA_SRC}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")

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
    print(f"\n{len(failures)} failures / {len(qs) if not only else len(only)} queries")
    for name, msg in failures:
        print(f"  {name}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
