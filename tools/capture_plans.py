"""Capture .explain("formatted") output for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: the
bench HEADLINE set). Pre-execution AQE view — the same view
tools/plan_report.py uses for PLANS.md; shape is scale-invariant.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__.strip().splitlines()[2], file=sys.stderr)
        raise SystemExit(2)
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or HEADLINE

    from proactive_map_reduce_spark.queries import REGISTRY as _REG

    unknown = [n for n in names if n not in _REG]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        raise SystemExit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from proactive_map_reduce_spark.plans import audit
    from proactive_map_reduce_spark.queries import REGISTRY
    from proactive_map_reduce_spark.session import get_spark, tune_for_input

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, sf_dir)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name](spark, sf_dir)
        plan = audit.formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n\n")
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
