"""Keyed upsert sink: maintain latest-row-per-key state from a stream.

The production pattern for serving state (feature stores, dashboards,
read replicas): each micro-batch MERGEs its rows into a keyed table,
keeping the newest row per key. Structured Streaming has no built-in
merge sink for plain files, so this implements the standard
``foreachBatch`` recipe:

    read current state → union the batch → latest-wins per key → rewrite

with a temp-dir + atomic-rename swap so a crash mid-write never leaves a
half-replaced table, and a batch-id high-water mark making re-delivered
batches idempotent (foreachBatch is at-least-once after recovery; the
rewrite must tolerate replays).

Scale notes: on a real deployment the state table is Delta/Iceberg and
this whole function collapses to ``MERGE INTO`` (log-level atomicity,
partition-pruned rewrites). The plain-parquet fallback rewrites the full
state per batch — O(|state|) per trigger — which is the honest cost of
merge-on-file-listing storage; keys partition the rewrite so it stays a
distributed job, never a driver loop.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _mark_path(state_dir: str) -> str:
    return state_dir + ".batchmark"


def _last_batch(state_dir: str, stream_id: str = "") -> int:
    """High-water batch id — scoped to one STREAM GENERATION.

    foreachBatch epoch ids belong to a checkpoint lifetime: a fresh (or
    cleaned) checkpoint restarts them at 0. A mark left by a previous
    generation must therefore NOT suppress the new generation's batches
    — comparing raw ids would silently discard genuinely new data. The
    mark records the generation it belongs to; a mismatch resets the
    water mark to -1 (re-merging any half-applied batch is safe: the
    latest-wins merge is idempotent)."""
    try:
        with open(_mark_path(state_dir)) as f:
            m = json.load(f)
        if m.get("stream", "") != stream_id:
            return -1
        return m["batch_id"]
    except Exception:
        return -1


def _stream_generation(checkpoint: str) -> str:
    """Identity of the checkpoint lifetime: Structured Streaming writes
    the query id to ``<checkpoint>/metadata`` at start — stable across
    restarts from the same checkpoint, fresh when the checkpoint is new
    or cleaned. Falls back to the checkpoint path if unreadable."""
    try:
        with open(os.path.join(checkpoint, "metadata")) as f:
            return str(json.load(f)["id"])
    except Exception:
        return checkpoint


def _stranded(state_dir: str, suffix: str) -> list[tuple[int, str]]:
    """(batch_id, path) for leftover ``<state>.{tmp,old}_<id>`` dirs, sorted."""
    base = os.path.basename(state_dir) + suffix
    parent = os.path.dirname(state_dir) or "."
    out = []
    if os.path.isdir(parent):
        for nm in os.listdir(parent):
            if nm.startswith(base):
                try:
                    out.append((int(nm[len(base):]), os.path.join(parent, nm)))
                except ValueError:
                    pass
    return sorted(out)


def _recover(state_dir: str) -> None:
    """Heal an interrupted swap before merging (the crash-safety half of
    the atomic-rename contract).

    The swap sequence is: write tmp → rename state→old → rename
    tmp→state → drop old → advance mark. A crash can strand:

    - a COMPLETED tmp (has Spark's ``_SUCCESS`` marker) with state_dir
      missing — died between the two renames. The tmp IS the post-merge
      state: promote it and advance the mark to its batch id, so the
      replayed batch is skipped as already applied. The mark keeps the
      GENERATION recorded by the pre-crash mark file — the tmp was
      written by whatever generation that mark belongs to, which is not
      necessarily the generation now running recovery. Stamping the
      CURRENT stream id here would let a tmp stranded by generation A
      suppress generation B's restarted batch ids 0..b as replays
      (silent data loss — exactly the cross-generation hole the
      stream-scoped mark exists to close). With no readable mark the
      writer generation is unknown: record a sentinel that matches no
      generation, so the high-water check resets to -1 and the promoted
      batch merely re-merges (latest-wins is idempotent, so that is
      safe; suppression is not).
    - an old dir with state_dir missing and no completed tmp — restore
      the pre-batch state; the batch replays on top of it.
    - stale tmp/old next to a live state_dir (died before the first
      rename, or before the old-cleanup) — deleted below.

    Without this, the ADVICE-flagged window (crash between the renames)
    silently rebuilt state from the lone replayed batch and lost all
    prior accumulations stranded in ``.old_<id>``.
    """
    tmps = _stranded(state_dir, ".tmp_")
    olds = _stranded(state_dir, ".old_")
    if not os.path.isdir(state_dir):
        done = [
            (b, p) for b, p in tmps if os.path.exists(os.path.join(p, "_SUCCESS"))
        ]
        if done:
            b, p = done[-1]
            os.rename(p, state_dir)
            try:
                with open(_mark_path(state_dir)) as f:
                    gen = json.load(f).get("stream", "__recovered__")
            except Exception:
                gen = "__recovered__"
            with open(_mark_path(state_dir), "w") as f:
                json.dump({"batch_id": b, "stream": gen}, f)
            tmps = [t for t in tmps if t[1] != p]
        elif olds:
            _, p = olds[-1]
            os.rename(p, state_dir)
            olds = olds[:-1]
    for _, p in tmps + olds:
        shutil.rmtree(p, ignore_errors=True)


def upsert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    stream_id: str = "",
) -> None:
    """The foreachBatch body: merge ``batch_df`` into ``state_dir``.

    Latest-wins by ``order_cols`` (descending, ties by key order is not
    needed — order_cols must be a total order per key, e.g. (ts,
    event_id)). Replayed batch ids (<= high-water mark) are skipped —
    within the same ``stream_id`` generation only (see
    :func:`_last_batch`; a new checkpoint restarts epoch ids at 0 and
    must not be suppressed by an older generation's mark).
    """
    _recover(state_dir)
    if batch_id <= _last_batch(state_dir, stream_id):
        return
    if os.path.isdir(state_dir):
        cur = spark.read.parquet(state_dir)
        allr = cur.unionByName(batch_df)
    else:
        allr = batch_df
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    latest = (
        allr.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    tmp = state_dir + f".tmp_{batch_id}"
    latest.write.mode("overwrite").parquet(tmp)
    old = state_dir + f".old_{batch_id}"
    if os.path.isdir(state_dir):
        os.rename(state_dir, old)
    os.rename(tmp, state_dir)
    shutil.rmtree(old, ignore_errors=True)
    with open(_mark_path(state_dir), "w") as f:
        json.dump({"batch_id": batch_id, "stream": stream_id}, f)


def stream_upsert(
    spark: SparkSession,
    stream_df: DataFrame,
    state_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    checkpoint: str,
) -> None:
    """Run ``stream_df`` into the keyed state table until exhausted
    (availableNow trigger — bounded replay; production drops the trigger
    for continuous operation)."""
    q = (
        stream_df.writeStream.foreachBatch(
            # generation id read lazily INSIDE the batch: the checkpoint
            # metadata file exists once the query has started
            lambda b, i: upsert_batch(
                spark, b, i, state_dir, key_cols, order_cols,
                stream_id=_stream_generation(checkpoint),
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
