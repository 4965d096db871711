"""Structured-Streaming query surface (W1/W2 + stream joins/dedup/enrich)."""

from ._base import *  # noqa: F401,F403
from ._base import (  # noqa: F401
    _chunks,
    _docs,
    _events_with_pos,
    _hashlib_sha256,
    _shutil,
    _standin_embed,
    _tempfile,
    _words,
)


def q_stage_pipeline(spark, sf_dir):
    """W1: staged proactive execution — chunk stages arrive one micro-batch
    at a time through a Structured Streaming file source and run the same
    black-box map stage. Value-identical to batch q_llm_map (same oracle),
    executed by the real streaming engine (test_proactive.py:227-368).

    r14: drains through the parquet sink (``_run_to_parquet``, the
    documented production mode — executor-side writes, lazy distributed
    read-back) instead of the memory sink, whose driver funnel +
    collect/createDataFrame round-trip paid O(result rows) of
    driver-side Python serialization for the corpus-sized map output.
    Rows identical — the sink modes are pinned equal by
    tests/test_streaming.py::test_stage_pipeline_sink_modes."""
    return stream_ops.stage_pipeline(
        spark, _chunks(spark, sf_dir), sink="parquet"
    ).select("doc_id", "chunk_id", "out_text", "n_out_tokens")


def q_stateful_accumulate(spark, sf_dir):
    """W2: cross-stage accumulator over staged micro-batch arrival (the
    total_res_toks analog, test_proactive.py:327-328). The final update
    per doc equals batch incremental_concat (same oracle). Default mode
    is the batched relational foreachBatch accumulator (r9 — per-BATCH
    Python constant; the per-key applyInPandasWithState reference path
    measured 207.6 s vs 4.0 s DuckDB at sf1); both modes emit identical
    rows (tests/test_streaming.py::test_stateful_accumulate_mode_equivalence)."""
    updates = stream_ops.stateful_accumulate(spark, _chunks(spark, sf_dir))
    return stream_ops.final_accumulation(updates).select(
        "doc_id", "final_text", "n_chunks"
    )


def q_stream_window_late(spark, sf_dir):
    """Watermarked tumbling-window aggregation over the events stream
    (engine capability beyond the reference: event-time + late-data bound).
    In-order bucket arrival → equals the batch aggregation (sql-checked)."""
    ev = load_table(spark, sf_dir, "events")
    return stream_ops.windowed_counts_with_watermark(spark, ev)


def q_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream inner join (click×view per user within
    ±30 min) — both sides buffer watermark-bounded state; in-order bucket
    arrival + sentinel flush makes the streamed result equal the batch
    interval join (sql-checked)."""
    ev = load_table(spark, sf_dir, "events")
    return stream_ops.stream_stream_join(spark, ev)


def q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup under a watermark
    (dropDuplicatesWithinWatermark): events with id % 10 == 0 are
    delivered twice across micro-batches; each must be emitted exactly
    once. Key state is bounded by the watermark horizon — the form of
    distinct that works on an unbounded stream. Oracle: batch DISTINCT
    over the same duplicated input."""
    ev = load_table(spark, sf_dir, "events")
    return stream_ops.stream_dedup(spark, ev)


def q_stream_static_enrich(spark, sf_dir):
    """Stream-static enrichment: streaming events joined per micro-batch
    to the broadcast customer dimension (no state store, no watermark —
    inner equi-join output is final per batch). Streamed result equals
    the batch join; sql-checked against it."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return stream_ops.stream_static_enrich(spark, ev, cust)


def q_stream_refeed_chain(spark, sf_dir):
    """W2 v2 (test_proactive_2.py:228-233): the SEQUENTIAL re-feed loop —
    stage n's computation consumes the accumulated outputs of stages
    0..n-1 — run as keyed streaming state over staged arrival. Emits the
    accumulated-output word count each stage saw plus a rolling md5
    chain over the stage outputs (order-sensitive: any reorder, replay
    or loss changes every later value). Fully hash-checked against a
    DuckDB recursive-CTE fold — the batch-equivalent of the recursion.
    Default mode is the batched relational runner with the fold as one
    JVM higher-order expression (r9 — the per-key applyInPandasWithState
    reference path measured 196.4 s vs DuckDB 25.0 s at sf1); both modes
    emit identical rows (test_refeed_chain_mode_equivalence)."""
    return stream_ops.refeed_chain(spark, _chunks(spark, sf_dir)).select(
        "doc_id", "chunk_id", "acc_words_before", "chain"
    )
