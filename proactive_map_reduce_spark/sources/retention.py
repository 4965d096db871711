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
``pmr_*`` in the tempdir idle past ``max_age_sec`` (default 6 h,
``PMR_TMP_TTL_SEC`` overrides) is removed; "idle" means NO entry in the
artifact tree — the dir itself or anything nested — has a fresh mtime,
so a nested touch (parquet commit, beacon refresh on a sub-cache)
counts as liveness even when the parent dir mtime is stale.
Content-addressed caches that are REUSED refresh their mtime on reuse
(the liveness beacon — bucketed and the text-corpus cache do), so a
live cache never ages out mid-round while a dead fingerprint always
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
# Cross-process TTL: a separate long-lived session whose lazily-read
# artifact was CREATED >TTL ago (and never re-touched) is still exposed
# to a sweep from a newly started process — no single-machine marker can
# distinguish "abandoned" from "bound by a foreign process's lazy
# DataFrame". Sessions that need longer retention raise it here.
MAX_AGE_SEC = float(os.environ.get("PMR_TMP_TTL_SEC", 6 * 3600.0))

_swept = False


def _is_idle(path: str, now: float, max_age_sec: float) -> bool:
    """True iff the entry AND everything nested under it is idle.

    The top-level dir mtime alone is insufficient (ADVICE r5): a
    multi-file artifact touched through a subpath — a parquet commit
    inside ``<dir>/part-*``, a beacon refresh on a nested cache dir —
    leaves the parent mtime stale, so a parent-only check could sweep an
    artifact another process refreshed an hour ago. Walk and early-exit
    on the first fresh entry; on any stat/walk error assume LIVE (a
    sweep that errs deletes someone's backing files; one that errs keeps
    a few tempdirs, and transient errors resolve by the next round).

    lstat, not stat (ADVICE r6): stat FOLLOWS symlinks, so one broken
    symlink inside a dead artifact raised on every sweep and made the
    dir permanently unsweepable — the opposite of "ages out next round".
    The link's own mtime is the right liveness signal anyway. The
    remaining lstat-error class is a delete race mid-walk; treating it
    LIVE self-heals. os.walk's default onerror silently SKIPS unreadable
    subdirs (which would under-count liveness and could sweep a live
    artifact); the explicit callback marks the artifact live instead,
    honoring the stated assume-LIVE policy."""
    live = False

    def _on_walk_error(_err: OSError) -> None:
        nonlocal live
        live = True

    try:
        if now - os.lstat(path).st_mtime <= max_age_sec:
            return False
    except OSError:
        return False
    if os.path.islink(path) or not os.path.isdir(path):
        # Plain file, dangling link, OR a symlink to a directory: the
        # entry's OWN lstat mtime rules (ADVICE r7). Without the islink
        # branch, isdir/os.walk FOLLOW a top-level dir link and judge the
        # TARGET's contents — but the sweep below removes only the link,
        # so target-based liveness is the wrong question (and rmtree on a
        # symlink raises internally, leaving the path falsely reported
        # as removed).
        return True
    for root, dirs, files in os.walk(path, onerror=_on_walk_error):
        if live:
            return False
        for nm in dirs + files:
            try:
                if now - os.lstat(os.path.join(root, nm)).st_mtime <= max_age_sec:
                    return False
            except OSError:
                return False
    return not live


def sweep_tmp_artifacts(
    max_age_sec: float | None = None,
    keep_prefixes: tuple[str, ...] = KEEP_PREFIXES,
    parent: str | None = None,
) -> list[str]:
    """Remove idle ``pmr_*`` tempdir artifacts; returns removed paths."""
    if max_age_sec is None:
        max_age_sec = MAX_AGE_SEC
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
        if not _is_idle(p, now, max_age_sec):
            continue
        # islink FIRST: rmtree(symlink) raises (swallowed by
        # ignore_errors) and would leave the untouched path in `removed`;
        # os.remove deletes the link itself, never the target.
        if not os.path.islink(p) and os.path.isdir(p):
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
