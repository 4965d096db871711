"""Delta-log state layer (r12): the LSM path for SCATTERED-sparse
micro-batches, plus the r11-ADVICE guard fixes it rode in with.

The r11 bucketed layout made clustered-sparse batches O(touched
buckets), but a uniformly scattered 1%-touch batch grazes most buckets
and paid near-dense rewrite (SCALE_PROBE w2_sparse). These tests pin
the fix: such a batch appends ONE small ``_log/log-<b>`` delta (zero
bucket rewrites — proven by inode identity), reads resolve buckets ∪
logs by last-batch-wins, compaction folds logs back and is crash-safe,
and every path still emits the exact reference fold.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from proactive_map_reduce_spark.operators import chunking
from proactive_map_reduce_spark.streaming import proactive as stream_ops
from proactive_map_reduce_spark.streaming import upsert as up

from test_stream_recovery import _refeed_reference_fold


def _mk_fixture(spark, tmp_path, n_docs=12, words="a b c d e f"):
    docs = spark.createDataFrame(
        [(i, words) for i in range(n_docs)], "doc_id long, text string"
    )
    chunks = chunking.partition_equal(chunking.split_words(docs), 3)
    live = str(tmp_path / "live")
    os.makedirs(live, exist_ok=True)
    return chunks, live


def _stage_file(spark, tmp_path, live, df, name):
    tmp = str(tmp_path / ("stage_" + name))
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.copy(os.path.join(tmp, part), os.path.join(live, name))


def _runner(spark, live, tmp_path, timings=None, n_buckets=8, span=1):
    stream = (
        spark.readStream.schema(stream_ops.CHUNK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(live)
    )
    return stream_ops._refeed_batched_runner(
        stream,
        out_dir=str(tmp_path / "out"),
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        timings=timings,
        n_buckets=n_buckets,
        bucket_span=span,
    )


def _bucket_inodes(table):
    out = {}
    for d in stream_ops._bucket_dirs(table):
        out[os.path.basename(d)] = sorted(
            (f, os.stat(os.path.join(d, f)).st_ino)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
    return out


def _got(df):
    return {
        (x["doc_id"], x["chunk_id"]): (x["acc_words_before"], x["chain"])
        for x in df.collect()
    }


SCATTERED_DOCS = (0, 3, 5, 7, 9)  # span=1: five distinct span groups


def _force_bucket_path(monkeypatch):
    monkeypatch.setenv("PMR_STATE_LOG_MIN_BUCKETS", "9999")


def _allow_log_path(monkeypatch):
    monkeypatch.setenv("PMR_STATE_LOG_MIN_BUCKETS", "2")
    monkeypatch.setenv("PMR_STATE_LOG_BUCKET_FRAC", "0.25")
    monkeypatch.setenv("PMR_STATE_LOG_KEYS_PER_BUCKET", "64")


def test_scattered_batch_appends_log_and_rewrites_zero_buckets(
    spark, tmp_path, monkeypatch
):
    """A scattered-sparse batch must take the delta-log path: ONE new
    ``_log/log-<b>`` dir, EVERY bucket's parquet files the same inodes
    (no rewrite at all — stronger than the r11 touched-only bound),
    and the emitted values still equal the per-key reference fold."""
    chunks, live = _mk_fixture(spark, tmp_path)
    table = str(tmp_path / "state" / "state")

    _force_bucket_path(monkeypatch)  # batch 0 (dense) builds the buckets
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    timings: list[dict] = []
    r0 = _runner(spark, live, tmp_path, timings)
    assert r0.count() == 12
    assert timings[-1]["path"] == "bucket"
    before = _bucket_inodes(table)
    assert len(before) >= 4

    _allow_log_path(monkeypatch)
    scattered = chunks.filter(
        f"chunk_id = 1 and doc_id in {SCATTERED_DOCS}"
    )
    _stage_file(spark, tmp_path, live, scattered, "s1.parquet")
    final = _got(_runner(spark, live, tmp_path, timings))
    assert timings[-1]["path"] == "log"
    assert _bucket_inodes(table) == before  # zero bucket rewrites
    logs = stream_ops._log_dirs(table)
    assert len(logs) == 1 and os.path.basename(logs[0]) == "log-000000001"
    mark = json.load(open(up._mark_path(table)))
    assert mark["batch_id"] == 1

    fixture = chunks.filter(
        f"chunk_id = 0 or (chunk_id = 1 and doc_id in {SCATTERED_DOCS})"
    )
    assert final == _refeed_reference_fold(fixture)

    # read_state_table resolves buckets ∪ logs last-wins: one row per
    # doc, the scattered docs' rows carrying the newer batch id
    st = {
        r["doc_id"]: r["last_batch_id"]
        for r in stream_ops.read_state_table(spark, table).collect()
    }
    assert len(st) == 12
    assert all(st[d] == 1 for d in SCATTERED_DOCS)
    assert all(v == 0 for d, v in st.items() if d not in SCATTERED_DOCS)


def test_log_path_replay_converges_without_mark(spark, tmp_path, monkeypatch):
    """Crash window: the log dir renamed into place but the mark not yet
    advanced (and the stream commit missing). The replayed batch must
    pass every row through the per-row guard (old state already carries
    last_batch_id == batch), rewrite an identical log, and converge —
    same values as the uninterrupted run."""
    chunks, live = _mk_fixture(spark, tmp_path)
    table = str(tmp_path / "state" / "state")
    ckpt = str(tmp_path / "ckpt")

    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    _runner(spark, live, tmp_path).count()

    _allow_log_path(monkeypatch)
    scattered = chunks.filter(f"chunk_id = 1 and doc_id in {SCATTERED_DOCS}")
    _stage_file(spark, tmp_path, live, scattered, "s1.parquet")
    r1 = _got(_runner(spark, live, tmp_path))
    assert len(stream_ops._log_dirs(table)) == 1

    # rewind to the crash instant: batch 1's commit and mark advance
    # never happened, but its log dir did
    for nm in ("1", ".1.crc"):
        p = os.path.join(ckpt, "commits", nm)
        if os.path.exists(p):
            os.remove(p)
    with open(up._mark_path(table), "w") as f:
        json.dump({"batch_id": 0, "stream": up._stream_generation(ckpt)}, f)

    timings: list[dict] = []
    r2 = _got(_runner(spark, live, tmp_path, timings))
    assert r2 == r1
    assert timings[-1]["path"] == "log"  # replay took the same path
    assert json.load(open(up._mark_path(table)))["batch_id"] == 1
    assert len(stream_ops._log_dirs(table)) == 1


def test_log_compaction_folds_logs_into_buckets(spark, tmp_path, monkeypatch):
    """Once the log outgrows the thresholds, the next merge folds every
    log row into its home bucket and deletes the log dirs — and the
    stream's values are unchanged across the compaction."""
    chunks, live = _mk_fixture(spark, tmp_path)
    table = str(tmp_path / "state" / "state")

    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    _runner(spark, live, tmp_path).count()

    _allow_log_path(monkeypatch)
    scattered = chunks.filter(f"chunk_id = 1 and doc_id in {SCATTERED_DOCS}")
    _stage_file(spark, tmp_path, live, scattered, "s1.parquet")
    _runner(spark, live, tmp_path).count()
    assert len(stream_ops._log_dirs(table)) == 1

    # batch 2 (dense) triggers compaction first: force it with tiny
    # thresholds, and pin batch 2 itself to the bucket path
    _force_bucket_path(monkeypatch)
    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_MIN_LOGS", "1")
    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_FRAC", "0.0")
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 2"), "s2.parquet")
    timings: list[dict] = []
    final = _got(_runner(spark, live, tmp_path, timings))
    assert timings[-1]["compact_s"] is not None  # compaction ran
    assert stream_ops._log_dirs(table) == []  # logs folded + deleted
    assert not os.path.isdir(table + ".tmp_2")

    fixture = chunks.filter(
        f"chunk_id in (0, 2) or (chunk_id = 1 and doc_id in {SCATTERED_DOCS})"
    )
    assert final == _refeed_reference_fold(fixture)
    st = stream_ops.read_state_table(spark, table)
    assert st.count() == 12  # still one row per doc


def test_compaction_crash_windows_are_shadow_identical(
    spark, tmp_path, monkeypatch
):
    """Compaction crash safety: (a) dying after the bucket swaps but
    before the log deletes leaves logs whose rows are byte-identical
    shadows of the folded buckets — reads are unchanged and the next
    compaction sweeps them; (b) dying mid bucket-swap is healed by the
    rollback-only recovery with the logs intact."""
    chunks, live = _mk_fixture(spark, tmp_path)
    table = str(tmp_path / "state" / "state")

    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    _runner(spark, live, tmp_path).count()
    _allow_log_path(monkeypatch)
    scattered = chunks.filter(f"chunk_id = 1 and doc_id in {SCATTERED_DOCS}")
    _stage_file(spark, tmp_path, live, scattered, "s1.parquet")
    _runner(spark, live, tmp_path).count()
    assert len(stream_ops._log_dirs(table)) == 1
    pre = {
        (r["doc_id"],): (r["last_batch_id"], r["chain"], r["acc_words"])
        for r in stream_ops.read_state_table(spark, table).collect()
    }

    # (a) compaction that "crashes" after every swap, before any delete:
    # intercept the log-dir deletes exactly once
    import proactive_map_reduce_spark.streaming.proactive as sp_mod

    real_rmtree = shutil.rmtree
    log_root = stream_ops._log_root(table)

    def skipping_rmtree(path, *a, **kw):
        if str(path).startswith(log_root):
            return  # simulated crash: delete never lands
        return real_rmtree(path, *a, **kw)

    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_MIN_LOGS", "1")
    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_FRAC", "0.0")
    monkeypatch.setattr(sp_mod.shutil, "rmtree", skipping_rmtree)
    meta = stream_ops._table_meta(table)
    assert (
        stream_ops._compact_logs(
            spark, table, stream_ops._REFEED_STATE,
            meta["n_buckets"], meta["span"], 77,
        )
        is not None
    )
    monkeypatch.setattr(sp_mod.shutil, "rmtree", real_rmtree)
    assert len(stream_ops._log_dirs(table)) == 1  # shadowed, not deleted
    post = {
        (r["doc_id"],): (r["last_batch_id"], r["chain"], r["acc_words"])
        for r in stream_ops.read_state_table(spark, table).collect()
    }
    assert post == pre  # last-wins absorbs the shadow rows

    # (b) mid-swap crash on top: one bucket renamed away, not replaced
    some_bucket = stream_ops._bucket_dirs(table)[0]
    os.rename(some_bucket, some_bucket + ".old_78")
    stream_ops._recover_state(table)
    assert os.path.isdir(some_bucket)
    assert len(stream_ops._log_dirs(table)) == 1  # recovery keeps logs
    healed = {
        (r["doc_id"],): (r["last_batch_id"], r["chain"], r["acc_words"])
        for r in stream_ops.read_state_table(spark, table).collect()
    }
    assert healed == pre

    # a second, uninterrupted compaction sweeps the shadow logs
    assert (
        stream_ops._compact_logs(
            spark, table, stream_ops._REFEED_STATE,
            meta["n_buckets"], meta["span"], 79,
        )
        is not None
    )
    assert stream_ops._log_dirs(table) == []
    assert {
        (r["doc_id"],): (r["last_batch_id"], r["chain"], r["acc_words"])
        for r in stream_ops.read_state_table(spark, table).collect()
    } == pre


def test_init_table_stamps_initial_mark(tmp_path):
    """ADVICE r11 (medium): table ownership must be provable across ALL
    of batch 0 — _init_table stamps ``{batch_id: -1, stream: gen}`` at
    creation, and never clobbers an existing (advanced) mark."""
    t = str(tmp_path / "state")
    assert stream_ops._init_table(t, 4, 64, gen="g1") == (4, 64)
    mark = stream_ops._read_mark_raw(t)
    assert mark == {"batch_id": -1, "stream": "g1"}
    assert up._last_batch(t, "g1") == -1
    assert up._last_batch(t, "other") == -1  # generation-scoped

    with open(up._mark_path(t), "w") as f:
        json.dump({"batch_id": 5, "stream": "g1"}, f)
    stream_ops._init_table(t, 9, 99, gen="g2")  # resume: pinned params
    assert stream_ops._read_mark_raw(t)["batch_id"] == 5  # not clobbered

    with pytest.raises(ValueError, match="invalid bucketing"):
        stream_ops._init_table(str(tmp_path / "s2"), 0, 64)


def test_meta_only_table_resumes_as_empty_state(spark, tmp_path, monkeypatch):
    """ADVICE r11 (medium), end-to-end: a kill inside batch 0 after
    _meta.json landed but before ANY mark (the pre-r12 window) leaves a
    meta-only table; a same-checkpoint resume must treat it as empty
    state and replay batch 0 — not refuse with the 'fresh checkpoint'
    error that tells the user to do what they already did."""
    chunks, live = _mk_fixture(spark, tmp_path, n_docs=4)
    table = str(tmp_path / "state" / "state")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    r0 = _got(_runner(spark, live, tmp_path))

    # reconstruct the crash instant: offsets for batch 0 written, no
    # commit, table holds ONLY _meta.json, nothing emitted yet
    shutil.rmtree(os.path.join(ckpt, "commits"))
    os.remove(up._mark_path(table))
    for d in stream_ops._bucket_dirs(table):
        shutil.rmtree(d)
    for _, p in stream_ops._batch_dirs(out_dir):
        shutil.rmtree(p)
    assert stream_ops._last_committed_batch(ckpt) == -1
    assert stream_ops._last_offset_batch(ckpt) == 0

    r1 = _got(_runner(spark, live, tmp_path))  # resumes, no refusal
    assert r1 == r0

    # a NON-empty markless table is still unprovable → still refuses
    os.remove(up._mark_path(table))
    shutil.rmtree(os.path.join(ckpt, "commits"))
    for _, p in stream_ops._batch_dirs(out_dir):
        shutil.rmtree(p)
    with pytest.raises(ValueError, match="state table"):
        _runner(spark, live, tmp_path)


def test_first_batch_window_refuses_missing_early_emissions(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 (low): the first-batch-window resume replays only the
    latest offsets entry — emissions BELOW that floor must already
    exist, else the read-back would silently lose them. Missing → the
    guard refuses; intact → the resume converges."""
    chunks, live = _mk_fixture(spark, tmp_path, n_docs=4)
    table = str(tmp_path / "state" / "state")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    _force_bucket_path(monkeypatch)
    for cid in (0, 1):
        _stage_file(
            spark, tmp_path, live,
            chunks.filter(f"chunk_id = {cid}"), f"s{cid}.parquet",
        )
    r0 = _got(_runner(spark, live, tmp_path))

    # the first-batch window: both batches' marks landed, no commits
    shutil.rmtree(os.path.join(ckpt, "commits"))
    assert stream_ops._last_offset_batch(ckpt) == 1
    # intact early emissions: resume converges
    r1 = _got(_runner(spark, live, tmp_path))
    assert r1 == r0

    # missing below-floor emission: refuse loudly
    shutil.rmtree(os.path.join(ckpt, "commits"))
    shutil.rmtree(os.path.join(out_dir, "batch-000000000"))
    with pytest.raises(ValueError, match="missing batch dirs"):
        _runner(spark, live, tmp_path)


def test_bucket_names_above_five_digits_are_listed(tmp_path):
    """ADVICE r11 (low): {:05d} is a minimum width — bucket ids ≥
    100000 produce 6-digit names that listings and .old healing must
    still see."""
    t = str(tmp_path / "state")
    os.makedirs(os.path.join(t, "b123456"))
    os.makedirs(os.path.join(t, "b00001"))
    dirs = [os.path.basename(d) for d in stream_ops._bucket_dirs(t)]
    assert dirs == ["b00001", "b123456"]
    assert stream_ops._BUCKET_OLD_RE.fullmatch("b123456.old_3")
    assert os.path.basename(
        stream_ops._bucket_path(t, 123456)
    ) == "b123456"


def test_accumulator_log_path_equals_batch_reference(
    spark, tmp_path, monkeypatch
):
    """The delta-log path must hold for BOTH registered state ops: run
    the W2 accumulator (growing payload, cluster_write='auto') with a
    scattered second batch forced onto the log path — the final per-doc
    accumulation must equal the batch incremental_concat reference and
    the log row must carry the doc's complete folded payload."""
    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.operators import mapstage

    chunks, live = _mk_fixture(spark, tmp_path)
    table = str(tmp_path / "state" / "state")

    def run(timings=None):
        stream = (
            spark.readStream.schema(stream_ops.CHUNK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(live)
        )
        return stream_ops._accumulate_batched_runner(
            stream,
            out_dir=str(tmp_path / "out"),
            state_dir=str(tmp_path / "state"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            timings=timings,
            n_buckets=8,
            bucket_span=1,
        )

    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    run().count()

    _allow_log_path(monkeypatch)
    scattered = chunks.filter(f"chunk_id = 1 and doc_id in {SCATTERED_DOCS}")
    _stage_file(spark, tmp_path, live, scattered, "s1.parquet")
    timings: list[dict] = []
    out = run(timings)
    assert timings[-1]["path"] == "log"

    # final (deepest) accumulation per doc vs the batch reference
    fixture = chunks.filter(
        f"chunk_id = 0 or (chunk_id = 1 and doc_id in {SCATTERED_DOCS})"
    )
    batch_ref = {
        r["doc_id"]: r["acc"]
        for r in mapstage.llm_map(fixture)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "out_text"))
                ).getField("out_text"),
                " ",
            ).alias("acc")
        )
        .collect()
    }
    deepest = {}
    for r in out.collect():
        cur = deepest.get(r["doc_id"])
        if cur is None or r["n_chunks_seen"] > cur[0]:
            deepest[r["doc_id"]] = (r["n_chunks_seen"], r["acc_text"])
    assert {d: t for d, (_, t) in deepest.items()} == batch_ref

    # the log row carries the COMPLETE folded payload (both chunks)
    logs = stream_ops._log_dirs(table)
    assert len(logs) == 1
    log_rows = {
        r["doc_id"]: r for r in spark.read.parquet(logs[0]).collect()
    }
    assert set(log_rows) == set(SCATTERED_DOCS)
    assert all(len(r["ps"]) == 2 for r in log_rows.values())


def test_repeated_scattered_batches_fold_log_on_log(
    spark, tmp_path, monkeypatch
):
    """Two consecutive log-path batches touching the SAME docs: the
    second batch's old-state read must pick the FIRST batch's log row
    (not the stale bucket row) and fold on top of it — the log-on-log
    case the single-batch tests don't reach. Values must equal the
    reference fold over all three stages."""
    chunks, live = _mk_fixture(spark, tmp_path)
    table = str(tmp_path / "state" / "state")

    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    _runner(spark, live, tmp_path).count()

    _allow_log_path(monkeypatch)
    for cid in (1, 2):
        _stage_file(
            spark, tmp_path, live,
            chunks.filter(f"chunk_id = {cid} and doc_id in {SCATTERED_DOCS}"),
            f"s{cid}.parquet",
        )
    timings: list[dict] = []
    final = _got(_runner(spark, live, tmp_path, timings))
    assert [t["path"] for t in timings[-2:]] == ["log", "log"]
    assert len(stream_ops._log_dirs(table)) == 2

    fixture = chunks.filter(
        f"chunk_id = 0 or doc_id in {SCATTERED_DOCS}"
    )
    assert final == _refeed_reference_fold(fixture)

    # last-wins picks the batch-2 log row for the scattered docs
    st = {
        r["doc_id"]: r["last_batch_id"]
        for r in stream_ops.read_state_table(spark, table).collect()
    }
    assert all(st[d] == 2 for d in SCATTERED_DOCS)
    assert all(v == 0 for d, v in st.items() if d not in SCATTERED_DOCS)


# ---------------------------------------------------------------- r13 --


def test_incremental_sweep_bounds_each_step_and_preserves_values(
    spark, tmp_path, monkeypatch
):
    """r13: the merge-path compaction is a bounded-range SWEEP — each
    ``max_buckets`` call folds one bucket range and advances the durable
    cursor; logs are deleted only when the cursor completes the circle.
    Mid-sweep reads stay exact (folded rows are byte-identical shadows
    under last-wins), and a log appended AFTER the sweep started is
    neither folded nor deleted by it."""
    chunks, live = _mk_fixture(spark, tmp_path)
    table = str(tmp_path / "state" / "state")

    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    _runner(spark, live, tmp_path).count()
    _allow_log_path(monkeypatch)
    for cid in (1, 2):
        _stage_file(
            spark, tmp_path, live,
            chunks.filter(f"chunk_id = {cid} and doc_id in {SCATTERED_DOCS}"),
            f"s{cid}.parquet",
        )
    _runner(spark, live, tmp_path).count()
    assert len(stream_ops._log_dirs(table)) == 2
    pre = {
        (r["doc_id"],): (r["last_batch_id"], r["chain"], r["acc_words"])
        for r in stream_ops.read_state_table(spark, table).collect()
    }

    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_MIN_LOGS", "1")
    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_FRAC", "0.0")
    meta = stream_ops._table_meta(table)
    nb = meta["n_buckets"]

    # step 1 of a 3-bucket-per-call sweep: cursor advances, logs stay
    assert (
        stream_ops._compact_logs(
            spark, table, stream_ops._REFEED_STATE, nb, meta["span"], 90,
            max_buckets=3,
        )
        is not None
    )
    sweep = stream_ops._read_sweep(table)
    assert sweep == {"cursor": 3, "high": 2}
    assert len(stream_ops._log_dirs(table)) == 2
    mid = {
        (r["doc_id"],): (r["last_batch_id"], r["chain"], r["acc_words"])
        for r in stream_ops.read_state_table(spark, table).collect()
    }
    assert mid == pre  # shadows are byte-identical under last-wins

    # a NEW log lands mid-sweep (id 91 > high 2): the sweep must not
    # touch it. Reuse batch-2's log rows under the new id — content is
    # irrelevant to the deletion contract, the id is what's pinned.
    newer = stream_ops._log_path(table, 91)
    shutil.copytree(stream_ops._log_dirs(table)[-1], newer)

    # remaining steps complete the sweep and delete ONLY swept logs
    guard = 0
    while stream_ops._read_sweep(table) is not None:
        stream_ops._compact_logs(
            spark, table, stream_ops._REFEED_STATE, nb, meta["span"],
            92 + guard, max_buckets=3,
        )
        guard += 1
        assert guard <= 6
    left = stream_ops._log_dirs(table)
    assert [stream_ops._log_id(p) for p in left] == [91]
    post = {
        (r["doc_id"],): (r["last_batch_id"], r["chain"], r["acc_words"])
        for r in stream_ops.read_state_table(spark, table).collect()
    }
    # log-91 is a byte-copy of log-2's rows (last_batch_id 2): last-wins
    # resolves to the same values the pre-sweep read produced
    assert post == pre


def test_sweep_lost_cursor_refolds_idempotently(spark, tmp_path, monkeypatch):
    """A crash that loses the cursor write (step done, _compact.json
    stale) must only cost an idempotent re-fold — values unchanged."""
    chunks, live = _mk_fixture(spark, tmp_path)
    table = str(tmp_path / "state" / "state")

    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    _runner(spark, live, tmp_path).count()
    _allow_log_path(monkeypatch)
    scattered = chunks.filter(f"chunk_id = 1 and doc_id in {SCATTERED_DOCS}")
    _stage_file(spark, tmp_path, live, scattered, "s1.parquet")
    _runner(spark, live, tmp_path).count()
    pre = {
        (r["doc_id"],): (r["last_batch_id"], r["chain"], r["acc_words"])
        for r in stream_ops.read_state_table(spark, table).collect()
    }

    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_MIN_LOGS", "1")
    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_FRAC", "0.0")
    meta = stream_ops._table_meta(table)
    stream_ops._compact_logs(
        spark, table, stream_ops._REFEED_STATE, meta["n_buckets"],
        meta["span"], 95, max_buckets=3,
    )
    # simulated crash: the step landed but the cursor write was lost
    stream_ops._write_sweep(table, 0, stream_ops._read_sweep(table)["high"])
    while stream_ops._read_sweep(table) is not None:
        stream_ops._compact_logs(
            spark, table, stream_ops._REFEED_STATE, meta["n_buckets"],
            meta["span"], 96, max_buckets=3,
        )
    assert stream_ops._log_dirs(table) == []
    assert {
        (r["doc_id"],): (r["last_batch_id"], r["chain"], r["acc_words"])
        for r in stream_ops.read_state_table(spark, table).collect()
    } == pre


def test_rows_sidecar_tracks_appends_and_reseeds_on_compaction(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12: the compaction trigger must not re-count every bucket
    file per batch. The _rows.json sidecar is seeded once (first trigger
    evaluation), each log-path batch adds its probe count with zero extra
    jobs, and sweep completion reseeds both numbers."""
    chunks, live = _mk_fixture(spark, tmp_path)
    table = str(tmp_path / "state" / "state")

    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    _runner(spark, live, tmp_path).count()
    # maintained from birth: init seeds (0,0), the dense batch-0 merge
    # adds its staged rows via footer counts
    assert stream_ops._read_rows(table) == {"bucket_rows": 12, "log_rows": 0}

    _allow_log_path(monkeypatch)
    # frac high enough that compaction itself never fires
    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_MIN_LOGS", "1")
    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_FRAC", "100.0")
    for cid in (1, 2):
        _stage_file(
            spark, tmp_path, live,
            chunks.filter(f"chunk_id = {cid} and doc_id in {SCATTERED_DOCS}"),
            f"s{cid}.parquet",
        )
    _runner(spark, live, tmp_path).count()
    rows = stream_ops._read_rows(table)
    # seeded at batch 2 entry (12 bucket rows, 5 log rows from batch 1),
    # then batch 2's own append added its probe count (5 more)
    assert rows == {"bucket_rows": 12, "log_rows": 10}

    # sweep completion reseeds: logs folded+deleted -> log_rows 0
    monkeypatch.setenv("PMR_STATE_LOG_COMPACT_FRAC", "0.0")
    meta = stream_ops._table_meta(table)
    stream_ops._compact_logs(
        spark, table, stream_ops._REFEED_STATE, meta["n_buckets"],
        meta["span"], 97,
    )
    assert stream_ops._read_sweep(table) is None
    assert stream_ops._read_rows(table) == {"bucket_rows": 12, "log_rows": 0}


def test_last_wins_passes_null_key_rows_through(spark):
    """ADVICE r12: distinct null-doc_id state rows (the bucket path's
    full_outer merge accumulates one per null-key batch) must survive a
    last-wins read — collapsing them to the max-last_batch_id row would
    silently change the established bucket-path null semantics."""
    df = spark.createDataFrame(
        [(None, 1, "a"), (None, 2, "b"), (7, 1, "x"), (7, 2, "y")],
        "doc_id long, last_batch_id int, payload string",
    )
    got = sorted(
        [
            (r["doc_id"], r["last_batch_id"], r["payload"])
            for r in stream_ops._last_wins(df).collect()
        ],
        key=lambda t: (t[0] is not None, t),
    )
    assert got == [
        (None, 1, "a"), (None, 2, "b"), (7, 2, "y"),
    ]


def test_pruned_read_raises_on_logs_without_meta(spark, tmp_path):
    """ADVICE r12: logs cannot legitimately exist without _meta.json —
    a pruned read must fail loudly instead of guessing (1,1) bucket
    params and silently dropping the batch's log rows."""
    table = str(tmp_path / "state")
    os.makedirs(os.path.join(table, "_log"), exist_ok=True)
    spark.createDataFrame(
        [(1, 0, "c", 1, [])],
        stream_ops._REFEED_STATE,
    ).write.parquet(stream_ops._log_path(table, 0))
    with pytest.raises(ValueError, match="no _meta.json"):
        stream_ops._read_state(
            spark, table, stream_ops._REFEED_STATE, bucket_ids=[0]
        )


def test_init_table_resume_ignores_invalid_caller_defaults(tmp_path):
    """ADVICE r12: on resume the caller args are ignored in favor of the
    pinned meta — an invalid first-creation default (PMR_STATE_BUCKETS=0
    left in the environment) must not fail a legitimate resume."""
    table = str(tmp_path / "state")
    assert stream_ops._init_table(table, 8, 4) == (8, 4)
    assert stream_ops._init_table(table, 0, 0) == (8, 4)  # resume: pinned
    with pytest.raises(ValueError, match="invalid bucketing"):
        stream_ops._init_table(str(tmp_path / "other"), 0, 1)


def test_autoscale_grows_buckets_and_preserves_values(
    spark, tmp_path, monkeypatch
):
    """r13: with no caller-pinned layout, the runner auto-grows N
    (power-of-2, upscale-only, 4x hysteresis) when mean bucket rows
    outgrow PMR_STATE_TARGET_BUCKET_ROWS — the rewrite must preserve
    every value, pin the new N in meta, and leave no .rs_ staging."""
    chunks, live = _mk_fixture(spark, tmp_path, n_docs=80)
    table = str(tmp_path / "state" / "state")
    monkeypatch.setenv("PMR_STATE_TARGET_BUCKET_ROWS", "1")
    monkeypatch.setenv("PMR_STATE_RESCALE_MIN_ROWS", "1")
    _force_bucket_path(monkeypatch)

    def run(timings=None):
        stream = (
            spark.readStream.schema(stream_ops.CHUNK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(live)
        )
        return stream_ops._refeed_batched_runner(
            stream,
            out_dir=str(tmp_path / "out"),
            state_dir=str(tmp_path / "state"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            timings=timings,
            bucket_span=1,  # n_buckets unset -> autoscale eligible
        )

    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    timings: list[dict] = []
    run(timings).count()
    # batch 0 created the table at the default N; no state yet -> no rescale
    assert timings[0]["rescale_s"] is None
    nb0 = timings[0]["n_buckets"]

    _stage_file(
        spark, tmp_path, live,
        chunks.filter("chunk_id = 1 and doc_id < 10"), "s1.parquet",
    )
    timings2: list[dict] = []
    final = _got(run(timings2))
    # 80 rows / target 1 -> desired 64 >= 4 x 16: batch 1 rescaled first
    assert timings2[-1]["rescale_s"] is not None
    assert timings2[-1]["n_buckets"] == 64 > nb0
    assert stream_ops._table_meta(table)["n_buckets"] == 64
    parent = os.path.dirname(table)
    assert not [n for n in os.listdir(parent) if ".rs_" in n]
    fixture = chunks.filter("chunk_id = 0 or (chunk_id = 1 and doc_id < 10)")
    assert final == _refeed_reference_fold(fixture)
    assert stream_ops.read_state_table(spark, table).count() == 80


def test_pinned_layout_never_autoscales(spark, tmp_path, monkeypatch):
    """An explicit caller n_buckets is a measurement/config contract:
    even with an absurdly small target the runner must not rewrite it."""
    chunks, live = _mk_fixture(spark, tmp_path, n_docs=80)
    table = str(tmp_path / "state" / "state")
    monkeypatch.setenv("PMR_STATE_TARGET_BUCKET_ROWS", "1")
    monkeypatch.setenv("PMR_STATE_RESCALE_MIN_ROWS", "1")
    _force_bucket_path(monkeypatch)
    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    _runner(spark, live, tmp_path).count()  # n_buckets=8 pinned
    _stage_file(
        spark, tmp_path, live,
        chunks.filter("chunk_id = 1 and doc_id < 10"), "s1.parquet",
    )
    timings: list[dict] = []
    _runner(spark, live, tmp_path, timings).count()
    assert timings[-1]["rescale_s"] is None
    assert stream_ops._table_meta(table)["n_buckets"] == 8


def test_autoscale_floor_keeps_small_tables_at_default_n(
    spark, tmp_path, monkeypatch
):
    """r13 regression guard: below PMR_STATE_RESCALE_MIN_ROWS the
    un-pinned layout must NOT upscale — a 50k-row all-dense W2 table
    rescaled to N=64 measured 2x slower at sf1 (unclustered write
    fanout), and pruning buys nothing at that size."""
    chunks, live = _mk_fixture(spark, tmp_path, n_docs=80)
    table = str(tmp_path / "state" / "state")
    monkeypatch.setenv("PMR_STATE_TARGET_BUCKET_ROWS", "1")
    # default floor (262144) far above the 80-row table
    _force_bucket_path(monkeypatch)

    def run(timings=None):
        stream = (
            spark.readStream.schema(stream_ops.CHUNK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(live)
        )
        return stream_ops._refeed_batched_runner(
            stream,
            out_dir=str(tmp_path / "out"),
            state_dir=str(tmp_path / "state"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            timings=timings,
            bucket_span=1,
        )

    _stage_file(spark, tmp_path, live, chunks.filter("chunk_id = 0"), "s0.parquet")
    run().count()
    _stage_file(
        spark, tmp_path, live,
        chunks.filter("chunk_id = 1 and doc_id < 10"), "s1.parquet",
    )
    timings: list[dict] = []
    run(timings).count()
    assert timings[-1]["rescale_s"] is None
    assert stream_ops._table_meta(table)["n_buckets"] == stream_ops._DEFAULT_BUCKETS
