"""Core-count scaling at a compute-dominated scale (r13 verdict item 2b).

The driver's own low-core comparison runs at sf0.1, where a ~0.2-0.25 s
two-stage scheduling floor and the interactive regime's input-sized
shuffle-partition count (8 at 17 MB regardless of cores) make c8 ≈ c32
BY CONSTRUCTION — its `suspect_cpus_ignored` heuristic then fires on a
measurement blind spot, not a harness bug (the env var is honored:
session.py reads $SPARK_GRAFT_CPUS for master and partitions, and the
c8 run's stage lines show `(0 + 8) / 8`).

This probe runs the SAME bench.py at the replicated-sf1 fixture (where
compute dominates the floor) under SPARK_GRAFT_CPUS=32 and =8 and
reports per-query c8/c32 wall ratios. Parallel paths must show well
above 1 (ideally toward 4x); a genuinely serial path would stand out
at ~1. Note sf1 (~160 MB) is still the interactive regime, where
shuffle partitions = clamp(bytes // 2 MiB, 4, cores) — i.e. they track
the core count at this size, so reduce-side parallelism scales too.

Usage: python tools/scaling_sf1.py
Writes SCALING_SF1.json at the repo root; exit non-zero if either pass
fails.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))


def _run_bench(env: dict) -> dict | None:
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
    )
    line = next(
        (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
    )
    if proc.returncode != 0 or line is None:
        sys.stderr.write(proc.stderr[-4000:])
        print(f"bench failed rc={proc.returncode}")
        return None
    return json.loads(line)


def main() -> int:
    from sf1_gate import REPLICAS, build

    fixture = build()  # content-addressed; reuses the gate's fixture
    t0 = time.time()
    passes = {}
    for cpus in ("32", "8"):
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = fixture
        env["SPARK_GRAFT_CPUS"] = cpus
        env.setdefault("SPARK_GRAFT_BENCH_REPS", "4")
        passes[cpus] = _run_bench(env)
        if passes[cpus] is None:
            return 1
    q32, q8 = passes["32"]["queries"], passes["8"]["queries"]
    ratios = {
        n: round(q8[n] / q32[n], 2) for n in q32 if n in q8 and q32[n] > 0
    }
    out = {
        "metric": "sf1_core_scaling",
        "started": time.strftime("%F %T"),
        "sf_dir": fixture,
        "replicas": REPLICAS,
        "cpus_main": 32,
        "cpus_low": 8,
        "harness_sec": round(time.time() - t0, 1),
        "total_c32": passes["32"]["value"],
        "total_c8": passes["8"]["value"],
        "total_ratio_c8_over_c32": round(
            passes["8"]["value"] / passes["32"]["value"], 2
        ),
        "per_query_ratio_c8_over_c32": ratios,
        "regime_c32": passes["32"].get("regime"),
        "regime_c8": passes["8"].get("regime"),
        "bench_c32": passes["32"],
        "bench_c8": passes["8"],
        "ok": True,
    }
    print(json.dumps({k: v for k, v in out.items() if not k.startswith("bench_")}, indent=2))
    with open(os.path.join(ROOT, "SCALING_SF1.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
