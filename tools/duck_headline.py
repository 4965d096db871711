"""Time the headline queries' ORACLE SQL in DuckDB at a given sf_dir.

The judge's governing performance number is Spark bench.py wall-clock vs
DuckDB running the SAME oracle SQL at the same scale factor. bench.py
itself measures both engines interleaved at best-of-10; this standalone
tool uses the SAME rep count so its numbers stay comparable to
bench.py's ratio_vs_duckdb denominator.

Usage: python tools/duck_headline.py [sf_dir]   # one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import HEADLINE  # single source of truth for the headline set
from proactive_map_reduce_spark.sources.tables import TABLES  # ditto for views


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb

    from proactive_map_reduce_spark.oracles import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    times: dict[str, float] = {}
    for _ in range(10):  # matches bench.py's best-of-10
        for name in HEADLINE:
            sql = ORACLES.get(name)
            if sql is None:
                continue
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = round(time.time() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    total = round(sum(times.values()), 3)
    print(json.dumps({"metric": "duckdb_headline_wall_clock", "value": total,
                      "unit": "sec", "queries": times, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
