"""Tempdir retention sweep for the engine's ephemeral artifacts.

Several query families materialize files under the system tempdir whose
lifetime must OUTLAST the query function (the returned DataFrame reads
them lazily — sink round-trips like ``q_sink_jsonl_append`` /
``q_scan_csv_roundtrip``, the text-corpus cache, streaming stage files,
recovery checkpoints), so they cannot delete on exit. Without retention
every oracle-gate run leaks a few dozen ``pmr_*`` dirs and a multi-round
machine accumulates hundreds (observed: 72 ``pmr_part``, 55
``pmr_orc``, 54 ``pmr_corpus``, … after five rounds) — the same
unbounded-growth failure the bucketed materializations had before their
sweep (``sources/bucketed.gc_stale_materializations``), generalized.

Policy: age-based, exactly like a warehouse staging-area TTL. Anything
``pmr_*`` in the tempdir idle past ``max_age_sec`` (default 6 h) is
removed; content-addressed caches that are REUSED refresh their mtime on
reuse (the liveness beacon — bucketed and the text-corpus cache do), so
a live cache never ages out mid-round while a dead fingerprint always
does. ``pmr_scale_*`` (the 10×/100× replicated fixtures) are exempt:
they are deliberately reused across rounds and cost minutes to rebuild.

The sweep runs once per process, from ``apply_runtime_confs`` — the one
chokepoint both the engine's own sessions (``get_spark``) and
driver-owned sessions (the ``__spark_entry__.queries()`` wrapper) pass
through.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

KEEP_PREFIXES = ("pmr_scale_",)
MAX_AGE_SEC = 6 * 3600.0

_swept = False


def sweep_tmp_artifacts(
    max_age_sec: float = MAX_AGE_SEC,
    keep_prefixes: tuple[str, ...] = KEEP_PREFIXES,
    parent: str | None = None,
) -> list[str]:
    """Remove idle ``pmr_*`` tempdir artifacts; returns removed paths."""
    parent = parent or tempfile.gettempdir()
    now = time.time()
    removed: list[str] = []
    try:
        names = os.listdir(parent)
    except OSError:
        return removed
    for nm in names:
        if not nm.startswith("pmr_") or any(
            nm.startswith(k) for k in keep_prefixes
        ):
            continue
        p = os.path.join(parent, nm)
        try:
            if now - os.stat(p).st_mtime <= max_age_sec:
                continue
        except OSError:
            continue
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                os.remove(p)
            except OSError:
                continue
        removed.append(p)
    return removed


def sweep_once() -> None:
    """Process-lifetime-deduplicated sweep (the session-setup hook)."""
    global _swept
    if _swept:
        return
    _swept = True
    sweep_tmp_artifacts()
