"""Streaming-mode tests (W1/W2 + watermark late-data semantics)."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from proactive_map_reduce_spark.operators import chunking, mapstage
from proactive_map_reduce_spark.operators import reduce as red
from proactive_map_reduce_spark.streaming import proactive as stream_ops


def _chunks(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    return chunking.partition_equal(chunking.split_words(docs), 4)


def test_stage_pipeline_equals_batch(spark):
    chunks = _chunks(spark)
    streamed = stream_ops.stage_pipeline(spark, chunks)
    batch = mapstage.llm_map(chunks)
    key = lambda r: (r["doc_id"], r["chunk_id"])
    s = {key(r): r["out_text"] for r in streamed.collect()}
    b = {key(r): r["out_text"] for r in batch.collect()}
    assert s == b and len(s) == 8


def test_stateful_accumulate_final_equals_incremental_concat(spark):
    chunks = _chunks(spark)
    updates = stream_ops.stateful_accumulate(spark, chunks)
    final = {
        r["doc_id"]: (r["final_text"], r["n_chunks"])
        for r in stream_ops.final_accumulation(updates).collect()
    }
    batch = {
        r["doc_id"]: (r["final_text"], r["n_chunks"])
        for r in red.incremental_concat(mapstage.llm_map(chunks)).collect()
    }
    assert final == batch


def test_stateful_accumulate_emits_running_updates(spark):
    """One update per (doc, micro-batch): n_chunks_seen strictly increases."""
    updates = stream_ops.stateful_accumulate(spark, _chunks(spark))
    per_doc = (
        updates.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("n_chunks_seen")).alias("seen"))
        .collect()
    )
    for r in per_doc:
        assert r["seen"] == [1, 2, 3, 4], r


def test_stateful_accumulate_mode_equivalence(spark):
    """The batched relational accumulator (default since r9 — per-BATCH
    constant) and the per-key applyInPandasWithState reference path emit
    IDENTICAL update streams: same rows, same running prefixes, same
    chunk ordering. Docs have differing chunk counts so short docs stop
    appearing in later micro-batches — the batched path's semi-join on
    the batch's keys must reproduce exactly the per-key path's
    "only keys present in the batch emit" contract."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),            # 4 stages of 2
            (2, "one two three"),              # fewer words → fewer stages
            (3, "x y z w v u t s r q p o"),    # more words
        ],
        "doc_id long, text string",
    )
    chunks = chunking.partition_equal(chunking.split_words(docs), 4)
    batched = stream_ops.stateful_accumulate(spark, chunks, mode="batched")
    state = stream_ops.stateful_accumulate(spark, chunks, mode="state")
    b = sorted(map(tuple, batched.collect()))
    s = sorted(map(tuple, state.collect()))
    assert b == s and b


def test_watermark_drops_late_event(spark):
    """An event arriving after the watermark passed its window is dropped."""
    base = datetime.datetime(2024, 1, 1, 0, 30)
    hours = [0, 0, 1, 2, 3, 4, 5, 6]
    rows = [
        (i, 1, "click", base + datetime.timedelta(hours=h), 1.0)
        for i, h in enumerate(hours)
    ]
    ev = spark.createDataFrame(rows, stream_ops.EVENT_SCHEMA)
    # In-order arrival: all rows counted.
    on_time = stream_ops.windowed_counts_with_watermark(spark, ev, "1 hour")
    total = on_time.agg(F.sum("n_events")).collect()[0][0]
    assert total == len(hours)

    # Same rows, but one event from hour 0 arrives in the LAST bucket while
    # the watermark (max_ts - 1h ≫ hour 0) has passed → dropped.
    import shutil

    root = stream_ops.write_event_files(ev, n_buckets=4)
    late = spark.createDataFrame(
        [(99, 1, "click", base, 1.0)], stream_ops.EVENT_SCHEMA
    )
    late.coalesce(1).write.mode("append").parquet(root)
    sentinel = spark.createDataFrame(
        [(-1, -1, "__sentinel__", base + datetime.timedelta(hours=40), 0.0)],
        stream_ops.EVENT_SCHEMA,
    )
    sentinel.coalesce(1).write.mode("append").parquet(root)

    def transform(s):
        return (
            s.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").cast("bigint").alias("n_events"))
        )

    stream = (
        spark.readStream.schema(stream_ops.EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    try:
        out = stream_ops._run_to_memory(stream, transform).filter(
            F.col("event_type") == "click"
        )
        assert out.agg(F.sum("n_events")).collect()[0][0] == len(hours)  # late row NOT counted
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stateful_accumulate_robust_to_reversed_arrival(spark):
    """Stages arriving in REVERSE order still produce the chunk-ordered
    accumulation — the state keeps (chunk_id, text) pairs and sorts on
    emit, so arrival interleaving can't corrupt the result."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql import types as T

    chunks = _chunks(spark)
    root = tempfile.mkdtemp(prefix="pmr_rev_")
    try:
        for cid in [3, 2, 1, 0]:  # reversed arrival
            (
                chunks.filter(F.col("chunk_id") == cid)
                .select("doc_id", "chunk_id", "chunk_text")
                .coalesce(1)
                .write.mode("append")
                .parquet(root)
            )
        state_schema = T.StructType(
            [
                T.StructField("chunk_ids", T.ArrayType(T.IntegerType())),
                T.StructField("texts", T.ArrayType(T.StringType())),
            ]
        )

        def transform(s):
            return mapstage.llm_map(s).groupBy("doc_id").applyInPandasWithState(
                stream_ops._accumulate,
                outputStructType=stream_ops._ACC_OUT,
                stateStructType=state_schema,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )

        updates = stream_ops._run_to_memory(stream_ops._chunk_stream(spark, root), transform)
        final = {
            r["doc_id"]: r["final_text"]
            for r in stream_ops.final_accumulation(updates).collect()
        }
        batch = {
            r["doc_id"]: r["final_text"]
            for r in red.incremental_concat(mapstage.llm_map(chunks)).collect()
        }
        assert final == batch
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stream_static_enrich_equals_batch_join(spark):
    from proactive_map_reduce_spark.sources.tables import load_table
    from proactive_map_reduce_spark.streaming.proactive import stream_static_enrich
    from tests.conftest import SF0001

    ev = load_table(spark, SF0001, "events")
    cust = load_table(spark, SF0001, "customer").select("c_custkey", "c_mktsegment")
    out = stream_static_enrich(spark, ev, cust)
    batch = ev.join(cust, ev.user_id == cust.c_custkey)
    assert out.count() == batch.count()
    # spot-check one enriched row against the batch join
    r = out.orderBy("event_id").first()
    b = batch.filter(batch.event_id == r["event_id"]).first()
    assert r["segment"] == b["c_mktsegment"]


def test_checkpoint_recovery_exactly_once(spark):
    """Stop a stateful stream mid-input, restart from the SAME checkpoint
    with more input, and verify nothing is reprocessed or lost — the
    state-store recovery contract a long-running 100 TB/day pipeline
    depends on.

    A running-count aggregation in update mode over file micro-batches:
    phase 1 processes bucket files 0-1, the query stops; phase 2 appends
    buckets 2-3 and restarts with the same checkpoint dir. The final
    per-user counts must equal the batch groupBy over all four buckets —
    counts would be inflated if restart re-read old files, deflated if
    offsets skipped unread data.
    """
    import tempfile as _tf

    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.sources.tables import load_table
    from proactive_map_reduce_spark.streaming.proactive import (
        EVENT_SCHEMA,
        write_event_files,
    )
    from tests.conftest import SF0001

    ev = load_table(spark, SF0001, "events")
    root = write_event_files(ev, n_buckets=4)
    import glob as _glob
    import os as _os

    files = sorted(_glob.glob(root + "/*.parquet"), key=_os.path.getmtime)
    # hold back the last half of the input until after the restart
    held = files[len(files) // 2:]
    stash = _tf.mkdtemp(prefix="pmr_held_")
    for f in held:
        _os.rename(f, stash + "/" + _os.path.basename(f))

    ckpt = _tf.mkdtemp(prefix="pmr_ckpt_rec_")
    name = "pmr_recovery_sink"

    def start():
        return (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(root)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    q.awaitTermination()
    interim = spark.table(name).collect()
    assert sum(r["n"] for r in interim) < ev.count()  # genuinely partial

    for f in _glob.glob(stash + "/*.parquet"):
        _os.rename(f, root + "/" + _os.path.basename(f))
    q2 = start()
    q2.awaitTermination()

    got = {r["user_id"]: r["n"] for r in spark.table(name).collect()}
    want = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_rate_source_soak_bounded_state(spark):
    """Unbounded-source soak (short CI variant of tools/soak_stream.py):
    state must stay bounded while input keeps flowing — window state by
    watermark eviction (≈ n_keys × live-window horizon), accumulator
    state by the distinct-key count exactly."""
    from proactive_map_reduce_spark.streaming.proactive import rate_source_soak

    n_keys = 50
    out = rate_source_soak(spark, duration_s=12, rows_per_second=5000, n_keys=n_keys)
    # both shapes processed real volume
    assert out["window"]["rows_in"] >= 20000, out
    assert out["stateful"]["rows_in"] >= 20000, out
    # watermark eviction: window state never exceeds a small multiple of
    # the live horizon (2 s watermark + in-flight windows ≪ 12 s of
    # windows had eviction not run)
    assert 0 < out["window"]["state_rows_max"] <= n_keys * 8, out
    # keyed accumulator: state == distinct keys, independent of volume
    assert out["stateful"]["state_rows_max"] == n_keys, out
    assert out["stateful"]["state_rows_final"] == n_keys, out


def test_stream_upsert_latest_per_key(spark):
    """The foreachBatch upsert sink converges to exactly the batch
    latest-row-per-key answer, across multi-batch replay, and replayed
    batch ids are idempotent."""
    import datetime
    import shutil as _sh
    import tempfile as _tf

    from proactive_map_reduce_spark.streaming import upsert as up

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, i % 5, "set", base + datetime.timedelta(minutes=i), float(i))
        for i in range(40)
    ]
    ev = spark.createDataFrame(rows, stream_ops.EVENT_SCHEMA)
    root = stream_ops.write_event_files(ev, n_buckets=4)
    state = _tf.mkdtemp(prefix="pmr_upsert_") + "/state"
    ckpt = _tf.mkdtemp(prefix="pmr_upsert_ck_")
    try:
        stream = (
            spark.readStream.schema(stream_ops.EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(root)
        )
        up.stream_upsert(
            spark, stream, state, ["user_id"], ["ts", "event_id"], ckpt
        )
        got = {
            r["user_id"]: (r["event_id"], r["value"])
            for r in spark.read.parquet(state).collect()
        }
        want = {u: (35 + u, float(35 + u)) for u in range(5)}
        assert got == want
        # idempotency: re-applying an already-seen batch id is a no-op
        extra = spark.createDataFrame(
            [(999, 0, "set", base, 999.0)], stream_ops.EVENT_SCHEMA
        )
        up.upsert_batch(spark, extra, 0, state, ["user_id"], ["ts", "event_id"])
        assert spark.read.parquet(state).filter("event_id = 999").count() == 0
        # but a NEW batch id applies
        up.upsert_batch(
            spark,
            spark.createDataFrame(
                [(1000, 0, "set", base + datetime.timedelta(days=1), 7.0)],
                stream_ops.EVENT_SCHEMA,
            ),
            10_000,
            state,
            ["user_id"],
            ["ts", "event_id"],
        )
        assert (
            spark.read.parquet(state).filter("user_id = 0").collect()[0]["event_id"]
            == 1000
        )
    finally:
        _sh.rmtree(root, ignore_errors=True)
        _sh.rmtree(ckpt, ignore_errors=True)
        _sh.rmtree(os.path.dirname(state), ignore_errors=True)


def test_refeed_chain_deep_stage_depth_values_and_state(spark):
    """The W2 v2 re-feed at reference-realistic depth (--num_steps 10+,
    test_proactive.py:29-33): 12 stages × 30 docs. Every emitted
    (acc_words_before, chain) must equal an independent driver-side fold
    over the batch-mapped outputs in chunk order — the same recursion
    the DuckDB oracle pins at depth 4, re-derived at depth 12 (the
    artifact-scale soak lives in tools/soak_refeed.py)."""
    import hashlib

    from tests.conftest import SF0001

    docs = (
        spark.read.parquet(f"{SF0001}/documents.parquet")
        .select("doc_id", "text")
        .limit(30)
    )
    chunks = chunking.partition_equal_arrays(docs, 12)
    mapped = sorted(
        mapstage.llm_map(chunks).select("doc_id", "chunk_id", "out_text").collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    expect, acc_state = {}, {}
    for r in mapped:
        acc, chain = acc_state.get(r.doc_id, (0, ""))
        chain = hashlib.md5((chain + (r.out_text or "")).encode()).hexdigest()[:8]
        expect[(r.doc_id, r.chunk_id)] = (acc, chain)
        acc_state[r.doc_id] = (
            acc + len([w for w in (r.out_text or "").split(" ") if w]),
            chain,
        )
    got = stream_ops.refeed_chain(spark, chunks).collect()
    assert len(got) == len(mapped)  # one row per existing chunk
    for r in got:
        assert (r.acc_words_before, r.chain) == expect[(r.doc_id, r.chunk_id)]


def test_stage_pipeline_sink_modes(spark, tmp_path):
    """r8: the durable foreachBatch→parquet sink is value-identical to the
    memory drain for W1, and its batch layout is per-batch directories
    (the overwrite-idempotence unit)."""
    chunks = _chunks(spark)
    mem = stream_ops.stage_pipeline(spark, chunks, sink="memory")
    out_dir = str(tmp_path / "out")
    dur = stream_ops.stage_pipeline(spark, chunks, sink="parquet", out_dir=out_dir)
    key = lambda r: (r["doc_id"], r["chunk_id"])
    m = {key(r): (r["out_text"], r["n_out_tokens"]) for r in mem.collect()}
    d = {key(r): (r["out_text"], r["n_out_tokens"]) for r in dur.collect()}
    assert m == d and len(d) == 8
    batches = [b for b in os.listdir(out_dir) if b.startswith("batch-")]
    assert len(batches) >= 2  # one per micro-batch (maxFilesPerTrigger=1)


def test_refeed_chain_sink_modes(spark, tmp_path):
    """r8: durable vs memory sink on the ORDER-SENSITIVE refeed chain —
    the strongest cheap equivalence witness (any replayed, duplicated, or
    reordered stage changes every later chain hash)."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))),
         (2, " ".join(f"v{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    chunks = chunking.partition_equal_arrays(docs, 5)
    key = lambda r: (r["doc_id"], r["chunk_id"])
    mem = {
        key(r): (r["acc_words_before"], r["chain"])
        for r in stream_ops.refeed_chain(spark, chunks).collect()
    }
    dur = {
        key(r): (r["acc_words_before"], r["chain"])
        for r in stream_ops.refeed_chain(
            spark, chunks, sink="parquet", out_dir=str(tmp_path / "out"),
            mode="state",
        ).collect()
    }
    assert mem == dur and len(dur) == 10


def test_refeed_chain_mode_equivalence(spark):
    """The batched relational refeed (default since r9 — the fold is one
    JVM higher-order expression) and the per-key applyInPandasWithState
    reference emit IDENTICAL rows on the order-sensitive chain fixture:
    any divergence in fold order, word counting, or null handling
    changes every later chain hash."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(20))),
            (2, " ".join(f"v{i}" for i in range(12))),
            (3, "solo"),  # short doc: absent from later micro-batches
        ],
        "doc_id long, text string",
    )
    chunks = chunking.partition_equal_arrays(docs, 5)
    b = sorted(
        map(tuple, stream_ops.refeed_chain(spark, chunks, mode="batched").collect())
    )
    s = sorted(
        map(tuple, stream_ops.refeed_chain(spark, chunks, mode="state").collect())
    )
    assert b == s and b


def test_refeed_batched_multi_stage_batch_folds_in_arrival_order(spark, tmp_path):
    """A micro-batch carrying SEVERAL stages of one doc (the recovery
    coalescing case) must fold in (batch_id, chunk_id) order — per-batch
    chunk order across sequential batches, exactly _refeed's contract.
    Feed a layout where file 0 = chunks {0,1} and file 1 = chunk {2} and
    compare against the driver-side sequential fold."""
    import hashlib

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z w u v")], "doc_id long, text string"
    )
    chunks = chunking.partition_equal(chunking.split_words(docs), 3)
    live = str(tmp_path / "live")
    os.makedirs(live)
    base = 1_700_000_000
    first = chunks.filter(F.col("chunk_id") <= 1)
    second = chunks.filter(F.col("chunk_id") == 2)
    for k, part in enumerate((first, second)):
        d = str(tmp_path / f"stage{k}")
        part.select("doc_id", "chunk_id", "chunk_text").coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                dst = os.path.join(live, f"stage-{k}-{f}")
                os.rename(os.path.join(d, f), dst)
                os.utime(dst, (base + k, base + k))

    stream = (
        spark.readStream.schema(stream_ops.CHUNK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(live)
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["acc_words_before"], r["chain"])
        for r in stream_ops._refeed_batched_runner(stream).collect()
    }

    mapped = sorted(
        mapstage.llm_map(chunks).select("doc_id", "chunk_id", "out_text").collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    expect, st = {}, {}
    for r in mapped:
        acc, chain = st.get(r.doc_id, (0, ""))
        chain = hashlib.md5((chain + (r.out_text or "")).encode()).hexdigest()[:8]
        expect[(r.doc_id, r.chunk_id)] = (acc, chain)
        st[r.doc_id] = (
            acc + len([w for w in (r.out_text or "").split(" ") if w]),
            chain,
        )
    assert got == expect


def test_run_to_parquet_empty_stream_returns_schema(spark, tmp_path):
    """Empty input: no committed batch dirs, but the returned DataFrame
    still carries the transform's schema (0 rows, no read error)."""
    empty = spark.createDataFrame([], "doc_id long, chunk_id int, chunk_text string")
    out = stream_ops.stage_pipeline(
        spark, empty, sink="parquet", out_dir=str(tmp_path / "out")
    )
    assert out.count() == 0
    assert set(out.columns) >= {"doc_id", "chunk_id", "out_text"}
