"""Local mirror of the driver's correctness gate.

Runs every query in __spark_entry__.queries() against its oracle_sql() on
a given sf dir, compares row count + (name-sorted) columns + order-
insensitive values, and prints a verdict per query.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # accept space- and/or comma-separated names; reject unknown ones so a
    # typo can't produce a vacuous "0 failures"
    only = {n for arg in sys.argv[2:] for n in arg.split(",") if n}
    from proactive_map_reduce_spark.queries import REGISTRY as _REG

    unknown = only - set(_REG)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        return 2

    import duckdb

    import __spark_entry__ as entry
    from proactive_map_reduce_spark.session import get_spark
    from proactive_map_reduce_spark.sources.tables import TABLES, duck_tune

    spark = get_spark("oracle-compare")
    con = duckdb.connect()
    duck_tune(con)  # bounded pool + disk spill next to the 16g JVM (r8)
    for t in TABLES:
        # guard like bench.py: DuckDB binds views at CREATE time, so one
        # missing table parquet would abort the whole gate before any
        # query ran (queries on the missing table then FAIL individually)
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # multi-file table (the split-invariance fixture): Spark reads
            # the directory natively; DuckDB needs the part-file glob
            # (which also skips Spark's _SUCCESS marker)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(canon(r[c]) for c in scols) for r in sdf.collect()
            )
            t_spark = time.time() - t0
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        finally:
            # dedup/curation queries persist plan intermediates for
            # within-query reuse; drop them so a 127-query sweep doesn't
            # accumulate a session's worth of cached corpus derivatives
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"rows {name}: {len(srows)} rows (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        t1 = time.time()
        try:
            res = con.execute(oracles[name])
            dcols_raw = [d[0] for d in res.description]
            drows_raw = res.fetchall()
            t_duck = time.time() - t1
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
        dcols = [dcols_raw[i] for i in order]
        drows = sorted(tuple(canon(r[i]) for i in order) for r in drows_raw)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures.append(name)
            continue
        if srows != drows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  spark: {srows[bad]}")
            print(f"  duck : {drows[bad]}")
            failures.append(name)
            continue
        print(
            f"PASS {name}: {len(srows)} rows [{time.time()-t0:.1f}s"
            f" spark={t_spark:.1f} duck={t_duck:.1f}]"
        )

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
