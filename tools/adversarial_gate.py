"""Adversarial VALUE gate: the extreme fixture + the full oracle compare.

The extreme execution sweep (``empty_sweep.py --extreme``) proves every
query *survives* adversarial data; this gate proves the two engines
still agree on the VALUES it produces. The distinction found real bugs
the execution sweep structurally cannot see:

  * float-sum accumulation-order divergence only surfaces when a
    1e12-magnitude value lands in a compared group (four rollup/window
    queries diverged in their last printed decimal),
  * ``count()``-driven execution prunes unreferenced projections, so an
    ANSI overflow in a displayed column passes the execution sweep and
    crashes the value gate (q_resample_ffill's exact-mean numerator),
  * byte-vs-char length semantics only split on multibyte text
    (q_multimodal_features' payload_len), and embedded newlines only
    break a CSV round-trip when the text actually contains them.

Shape: materialize the ``empty_sweep._patch_extreme`` fixture as
single-FILE parquets (DuckDB's view binding reads plain files, exactly
like the driver's sf dirs), then run ``tools/compare_oracle.py`` over
it — same comparator, same canonicalization, zero gate-specific
tolerance: on well-formed AND adversarial data the engines must agree
to the same %.6f canon.

The fixture is content-addressed on the source dir's stat signature and
cached under ``pmr_advfix_*`` (reused runs refresh the mtime liveness
beacon; ``sources/retention.py`` ages out dead fingerprints).

Usage: python tools/adversarial_gate.py [query ...]
Exit: compare_oracle's exit code (non-zero on any failure).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

SF_SRC = "/root/testdata/sf0.001"


def build_fixture() -> str:
    """Materialize (or reuse) the extreme fixture as one parquet FILE per
    table; returns the fixture dir."""
    from empty_sweep import _patch_extreme

    from proactive_map_reduce_spark.session import get_spark
    from proactive_map_reduce_spark.sources.tables import TABLES, stat_signature

    import hashlib

    tag = hashlib.sha256(stat_signature(SF_SRC).encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"pmr_advfix_{tag}")
    done = os.path.join(out, "_FIXTURE_COMPLETE")
    if os.path.exists(done):
        os.utime(out)  # liveness beacon: a reused cache never ages out
        print(f"reusing fixture {out}", flush=True)
        return out

    spark = get_spark("adversarial-gate-fixture")
    stage = tempfile.mkdtemp(prefix="pmr_advfix_stage_")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_SRC}/{t}.parquet")
        df = _patch_extreme(df, t)
        part_dir = os.path.join(stage, f"_{t}")
        df.coalesce(1).write.mode("overwrite").parquet(part_dir)
        part = glob.glob(os.path.join(part_dir, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(stage, f"{t}.parquet"))
        shutil.rmtree(part_dir)
    spark.stop()
    open(os.path.join(stage, "_FIXTURE_COMPLETE"), "w").close()
    # atomic publish: a concurrent builder loses the rename race cleanly
    try:
        os.rename(stage, out)
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)
    print(f"built fixture {out}", flush=True)
    return out


def main() -> int:
    fixture = build_fixture()
    cmd = [sys.executable, os.path.join(ROOT, "tools", "compare_oracle.py"), fixture]
    cmd += sys.argv[1:]
    return subprocess.call(cmd, cwd=ROOT)


if __name__ == "__main__":
    raise SystemExit(main())
