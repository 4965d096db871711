"""One-command repro of everything the judge checks (VERDICT r4 item 8).

Runs, each in its own subprocess (own SparkSession, so a crash in one
phase can't poison another):

  1. the full oracle gate (tools/compare_oracle.py) at sf0.001, sf0.01
     AND sf0.1 — the sf0.1 pass is the only net that catches
     boundary-rounding drift on realistic group sizes (both r4 deep-gate
     finds were sf0.1-only),
  2. the three degenerate-input sweeps (tools/empty_sweep.py: empty
     tables, nulled content, adversarial extremes),
  3. the six VALUE gates (tools/adversarial_gate.py: the full oracle
     compare on the extreme / nulled / empty / unicode / skew fixtures
     plus the composed gauntlet — engines must AGREE, not merely
     survive),
  4. the test suite (pytest tests/ -q),
  5. the bench harness (bench.py).

Emits ONE summary JSON line at the end (and writes it to
VERIFY_ALL.json at the repo root) with per-phase results and a single
top-level "ok". Phase output streams through, so a failure is
diagnosable from the same log.

Usage: python tools/verify_all.py [--skip-bench] [--skip-tests]
       [--skip-sweeps] [--skip-adversarial]
       [--scales sf0.001,sf0.01,sf0.1]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SCALES = ["sf0.001", "sf0.01", "sf0.1"]


def _run(cmd: list[str]) -> tuple[int, str]:
    """Run a phase, streaming output while capturing it for parsing."""
    print(f"\n=== {' '.join(cmd)}", flush=True)
    proc = subprocess.Popen(
        cmd,
        cwd=ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    lines: list[str] = []
    assert proc.stdout is not None
    for line in proc.stdout:
        sys.stdout.write(line)
        lines.append(line)
    proc.wait()
    return proc.returncode, "".join(lines)


def main() -> int:
    args = sys.argv[1:]
    skip_bench = "--skip-bench" in args
    skip_tests = "--skip-tests" in args
    skip_sweeps = "--skip-sweeps" in args
    skip_adversarial = "--skip-adversarial" in args
    scales = DEFAULT_SCALES
    for a in args:
        if a.startswith("--scales"):
            scales = a.split("=", 1)[1].split(",")

    summary: dict = {"metric": "verify_all", "started": time.strftime("%F %T")}
    ok = True

    gates: dict[str, dict] = {}
    for sf in scales:
        sf_dir = f"/root/testdata/{sf}"
        t0 = time.time()
        rc, out = _run([sys.executable, "tools/compare_oracle.py", sf_dir])
        m = re.search(r"^(\d+) failures", out, re.M)
        n_pass = len(re.findall(r"^PASS ", out, re.M))
        n_rows_only = len(re.findall(r"^rows ", out, re.M))
        gates[sf] = {
            "rc": rc,
            "pass": n_pass,
            "rows_only": n_rows_only,
            "failures": int(m.group(1)) if m else -1,
            "sec": round(time.time() - t0, 1),
        }
        ok = ok and rc == 0
    summary["oracle_gate"] = gates

    if not skip_sweeps:
        sweeps: dict[str, dict] = {}
        for mode, flag in (("empty", None), ("nulls", "--nulls"), ("extreme", "--extreme")):
            t0 = time.time()
            cmd = [sys.executable, "tools/empty_sweep.py"]
            if flag:
                cmd.append(flag)
            rc, out = _run(cmd)
            m = re.search(r"^(\d+) failures / (\d+) queries", out, re.M)
            sweeps[mode] = {
                "rc": rc,
                "failures": int(m.group(1)) if m else -1,
                "queries": int(m.group(2)) if m else -1,
                "sec": round(time.time() - t0, 1),
            }
            ok = ok and rc == 0
        summary["sweeps"] = sweeps

    if not skip_adversarial:
        # the VALUE gates on the extreme and nulled fixtures
        # (tools/adversarial_gate.py) — the execution sweeps above prove
        # survival; these prove the ENGINES STILL AGREE on dirty data
        # (found the round-5 decimal-sum / NaN-quarantine / CSV-fidelity
        # class and the null-contract class)
        for key, flags in (
            ("adversarial_gate", []),
            ("nulls_gate", ["--nulls"]),
            ("empty_gate", ["--empty"]),
            ("unicode_gate", ["--unicode"]),
            ("skew_gate", ["--skew"]),
            ("gauntlet_gate", ["--gauntlet"]),
        ):
            t0 = time.time()
            rc, out = _run([sys.executable, "tools/adversarial_gate.py", *flags])
            m = re.search(r"^(\d+) failures", out, re.M)
            summary[key] = {
                "rc": rc,
                "pass": len(re.findall(r"^PASS ", out, re.M)),
                "failures": int(m.group(1)) if m else -1,
                "sec": round(time.time() - t0, 1),
            }
            ok = ok and rc == 0

    if not skip_tests:
        t0 = time.time()
        rc, out = _run([sys.executable, "-m", "pytest", "tests/", "-q"])
        m = re.search(r"(\d+) passed(?:, (\d+) skipped)?", out)
        summary["pytest"] = {
            "rc": rc,
            "passed": int(m.group(1)) if m else -1,
            "skipped": int(m.group(2)) if m and m.group(2) else 0,
            "sec": round(time.time() - t0, 1),
        }
        ok = ok and rc == 0

    if not skip_bench:
        t0 = time.time()
        rc, out = _run([sys.executable, "bench.py"])
        bench = None
        for line in reversed(out.splitlines()):
            try:
                cand = json.loads(line)
            except ValueError:
                continue
            if isinstance(cand, dict) and "metric" in cand:
                bench = cand
                break
        summary["bench"] = {
            "rc": rc,
            "sec": round(time.time() - t0, 1),
            "result": bench,
        }
        ok = ok and rc == 0 and bench is not None

    summary["ok"] = ok
    line = json.dumps(summary)
    print("\n" + line)
    with open(os.path.join(ROOT, "VERIFY_ALL.json"), "w") as f:
        f.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
