"""Regenerate COVERAGE.md's header count from the live registry.

The r12 verdict caught the prose number drifting (131 vs 132 registered
queries — every NAME was listed, only the count was stale). The count is
now emitted by this tool and pinned by tests/test_coverage_doc.py, so it
can never drift silently again.

Usage: python tools/coverage_count.py        # rewrite the header line
       python tools/coverage_count.py --check # exit 1 on drift
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

COVERAGE = os.path.join(ROOT, "COVERAGE.md")
COUNT_RE = re.compile(r"^\d+ registered queries; ALL \d+ hash-checked")


def main() -> int:
    from proactive_map_reduce_spark.queries import REGISTRY

    n = len(REGISTRY)
    with open(COVERAGE) as f:
        lines = f.read().splitlines(keepends=True)
    hits = [i for i, ln in enumerate(lines) if COUNT_RE.match(ln)]
    if len(hits) != 1:
        print(f"expected exactly one count line in COVERAGE.md, found {len(hits)}")
        return 1
    i = hits[0]
    want = re.sub(r"^\d+( registered queries; ALL )\d+", f"{n}\\g<1>{n}", lines[i])
    # names drift is as bad as count drift: every registry key must be
    # named in the doc, and no stale name may linger
    md = "".join(lines)
    named = set(re.findall(r"`(q_[a-z0-9_]+)`", md))
    missing = sorted(k for k in REGISTRY if k not in named)
    stale = sorted(k for k in named if k not in REGISTRY)
    drift = []
    if lines[i] != want:
        drift.append(f"count line stale: {lines[i].strip()!r} -> {want.strip()!r}")
    if missing:
        drift.append(f"registry keys not named in COVERAGE.md: {missing}")
    if stale:
        drift.append(f"stale names in COVERAGE.md: {stale}")
    if "--check" in sys.argv:
        for d in drift:
            print(d)
        print(f"COVERAGE.md {'DRIFTED' if drift else 'in sync'} ({n} queries)")
        return 1 if drift else 0
    if missing or stale:
        for d in drift:
            print(d)
        print("name drift needs a human edit; only the count is auto-written")
        return 1
    lines[i] = want
    with open(COVERAGE, "w") as f:
        f.write("".join(lines))
    print(f"COVERAGE.md count set to {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
