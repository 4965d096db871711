"""Registry-wide shuffle budget: every statically-plannable query has a
pinned maximum exchange count.

The per-operator shuffle count IS the scale contract — at 100 TB each
hash exchange is the dominant cost, so a regression that sneaks an extra
shuffle into a narrow pipeline (e.g. a lost broadcast hint, a
repartition hidden in a refactor) must fail loudly here, not in a
cluster bill. Budgets are the measured counts at pin time (pre-AQE
static plan; AQE's ReusedExchange can only lower the runtime number).

Fixture-size assumption (r14, ADVICE): several low pins (e.g. the
minhash family's agreement/jaccard joins, decontamination's benchmark
side) encode that a join side BROADCASTS, which holds only while the
sf0.001 fixture estimate stays under autoBroadcastJoinThreshold. If a
fixture-size bump flips one to sort-merge, the budget here fails with
+1-2 exchanges — that failure means "a pinned broadcast became a
shuffle join", not a code regression; re-pin or hint explicitly.
"""

from __future__ import annotations

import pytest

from proactive_map_reduce_spark.plans import audit
from proactive_map_reduce_spark.queries import REGISTRY
from tests.conftest import SF0001

# query -> max hash/range exchanges in the static physical plan.
# 0 = pure narrow pipeline fused into the scan.
BUDGETS = {
    "q_any_answer_contained": 0,
    "q_asof_join": 1,
    "q_best_of_answers": 1,
    # two-sided n-gram counting (one doc_id-keyed agg per side) + the
    # clipped-overlap join — the hash-checkable relational BLEU
    "q_bleu": 2,
    "q_blocklist_filter": 0,
    "q_bm25_search": 4,
    # per-source mixing gate is scan-fused; only the report aggregates
    "q_corpus_mix": 1,
    "q_corpus_stats": 3,
    "q_cube_events": 1,
    # composed curation pipeline: the minhash near-dup path costs its
    # standalone budget (5), then anti-join on doc_id (1), sentence-key
    # window (1), per-doc kept rollup (1), lang pack window (1) with the
    # final groupBy reusing the lang partitioning, plus the gate staging
    # exchange — measured 10 at pin time. The contract: composing the
    # four curation stages must never cost more than the sum of their
    # parts (no hidden re-derivation shuffles).
    "q_curation_pipeline": 7,
    "q_decode_detok": 2,
    # 5-gram decontamination (r14 array-HOF shingles): the per-doc
    # distinct gram sets are built array-locally — the former per-side
    # shingle window exchanges are gone; what remains is the
    # countDistinct pair (expand agg + per-doc rollup). The gram join
    # itself broadcasts the benchmark side.
    "q_decontaminate": 2,
    "q_dedup_embedding": 0,
    "q_dedup_exact": 1,
    # r13 array-HOF signatures: zero shuffles to the combined
    # signature+set table; what remains is the band window and the
    # pair distinct (agreement + jaccard joins broadcast)
    "q_dedup_minhash_confirmed": 2,
    # batch-vs-catalog ingestion dedup: r13 zero-shuffle signature
    # build leaves the catalog band window, the candidate distinct, the
    # per-new-doc rollup, and the final left join — measured 4 at pin
    # time, all keyed on uniform hash/id columns
    "q_dedup_incremental": 4,
    "q_dedup_minhash_pairs": 2,
    # star-cap block window + pair-distinct; the shingle sets are the
    # r13 zero-shuffle array form (the old explode+collect_set path
    # paid two more exchanges for the same distinct sets)
    "q_dedup_ngram_jaccard": 2,
    "q_doc_fingerprint": 0,
    "q_embed_documents": 0,
    "q_embedding_centroids": 2,
    # trailing-window z-score: the user_id window is the only exchange
    "q_event_anomaly": 1,
    "q_event_interarrival": 1,
    # hot-key-parallel form: the full table crosses one (user_id, slice)
    # window exchange; the other three move per-slice / per-user PARTIAL
    # rows only (map-side aggregate under each — .explain-verified)
    "q_event_interarrival_chunked": 4,
    "q_exact_match": 0,
    "q_except_docs": 1,
    "q_filter_empty": 0,
    "q_first_line_answer": 0,
    "q_flagship": 1,
    "q_flatten_nested_times": 2,
    "q_grid_sweep": 1,
    "q_hash_key": 0,
    "q_head_cap": 0,
    "q_html_strip": 0,
    "q_hybrid_search": 4,
    "q_incremental_concat": 1,
    "q_intersect_docs": 1,
    "q_join_doc_gt": 0,
    "q_json_extract": 0,
    "q_kv_concat": 2,
    "q_lang_id": 0,
    "q_limit_head": 0,
    "q_llm_map": 0,
    "q_local_supplier_volume": 1,
    "q_mean_over_files": 2,
    "q_metrics_avg": 2,
    "q_middle_drop_truncate": 3,
    "q_minhash_signatures": 0,
    "q_multimodal_features": 0,
    "q_multimodal_frames": 0,
    "q_multimodal_resize": 0,
    "q_normalize_question": 0,
    "q_normalize_text": 0,
    "q_order_preserve": 1,
    "q_pack_sequences": 1,
    "q_partition_equal": 0,
    "q_pivot_event_types": 2,
    "q_positional_shift": 2,
    "q_prefix_scan_inputs": 1,
    # scan-fused regexp scrub, the cheapest possible shape
    "q_pii_redact": 0,
    "q_pricing_summary": 1,
    "q_project_lengths": 0,
    "q_promo_revenue": 0,
    "q_prompt_assemble": 0,
    "q_qa_pipeline": 4,
    "q_quality_score": 0,
    # dim-unrolled int8 quantization: pure narrow projection
    "q_quantize_embeddings": 0,
    "q_quality_topn_per_lang": 1,
    "q_range_join": 0,
    "q_rechunk_fixed": 1,
    "q_region_revenue": 1,
    # explode + window-lead + stacked groupBys: one exchange on doc_id
    # serves the window AND both aggregations (subset-key distributions)
    "q_repetition_signals": 1,
    # hourly grid + per-hour means share the user_id exchange; the
    # ffill window rides the join's partitioning
    "q_resample_ffill": 2,
    "q_rollup_multi": 1,
    "q_rouge": 1,
    "q_running_metric": 1,
    "q_salted_agg": 2,
    "q_salted_join": 1,
    # co-located join: neither fact side shuffles (bucketed SMJ, or a
    # broadcast at fixture scale); the agg is the only hash exchange
    "q_bucketed_join": 1,
    "q_scan_documents": 0,
    "q_scan_json_dataset": 0,
    "q_semi_anti_join": 1,
    "q_sentence_dedup": 2,
    "q_sentence_split": 0,
    "q_session_window": 1,
    "q_sessionize": 1,
    "q_set_f1": 0,
    "q_ship_priority": 1,
    "q_simhash": 0,
    "q_similarity_lsh": 1,
    "q_similarity_topk": 1,
    # KMV distinct (distinct → per-(partition,lang) min-k cut → per-lang
    # re-rank of <= k*P candidates) + histogram bins (bounds agg → bin
    # counts): the extra exchange vs round 2 buys bounded-size sort
    # groups — no task ever sorts a full per-language vocabulary
    "q_sketch_stats": 4,
    "q_speedup_model": 1,
    "q_split_ratio_schedule": 0,
    "q_stratified_sample": 0,
    "q_subset_accuracy": 0,
    "q_substring_match": 0,
    "q_tfidf_top_terms": 3,
    "q_timing_arith": 0,
    "q_token_counter_overlap": 4,
    "q_token_stats": 0,
    "q_tokenize": 0,
    "q_top_revenue": 1,
    "q_topk_importance": 1,
    "q_topn_per_group": 2,
    "q_unigram_lm_score": 3,
    "q_union_outputs": 1,
    # vocab induction (word-count agg + TakeOrdered top-V) + per-doc OOV
    # rollup; the vocabulary joins broadcast-side
    "q_vocab_oov": 2,
    "q_value_percentiles": 1,
    "q_window_sliding": 1,
    "q_window_tumbling": 1,
    "q_word_split": 0,
}


# The OTHER two shuffle kinds, pinned per class (0 where unlisted):
# SinglePartition funnels are post-aggregation tiny-data sorts/limits
# (a global top-k over an already-reduced relation) — fine at scale but
# a NEW one in a query that had none is exactly a hidden global funnel.
SINGLE_PARTITION = {
    "q_bm25_search": 1,       # global top-10 over per-doc scores
    "q_hybrid_search": 1,     # global top-5 of the fused score
    "q_promo_revenue": 1,     # single-row scalar aggregate
    "q_tfidf_top_terms": 1,   # global top-terms limit
    "q_unigram_lm_score": 1,  # corpus-total scalar aggregate
}

# RoundRobinPartitioning = ensure_parallelism's conditional repartition
# (single-split local fixtures only; a no-op at production split counts).
# Pinned so a STRAY repartition() in a refactor — the same node kind —
# still fails loudly in the query where it appears.
ROUNDROBIN = {
    # flagship family carries 2: the chunk pipeline's word side AND the
    # deliberate r13 gt-probe-side repartition (the scoring regexes run
    # in the probe tasks of the broadcast join; one split = one core)
    "q_best_of_answers": 2, "q_bleu": 3, "q_corpus_stats": 1,  # bleu: gold side used twice (grams + brevity)
    "q_curation_pipeline": 3, "q_decode_detok": 2, "q_decontaminate": 2,
    "q_dedup_incremental": 4, "q_dedup_minhash_confirmed": 5,
    "q_dedup_minhash_pairs": 3, "q_dedup_ngram_jaccard": 2,
    "q_first_line_answer": 1, "q_flagship": 2, "q_flatten_nested_times": 1,
    "q_incremental_concat": 1, "q_kv_concat": 1, "q_llm_map": 1,
    "q_mean_over_files": 2, "q_metrics_avg": 2, "q_middle_drop_truncate": 2,
    "q_minhash_signatures": 1, "q_partition_equal": 1,
    "q_positional_shift": 1, "q_prefix_scan_inputs": 1,
    "q_prompt_assemble": 1, "q_qa_pipeline": 3, "q_rechunk_fixed": 1,
    "q_rouge": 2, "q_simhash": 1, "q_sketch_stats": 1,
    "q_speedup_model": 1, "q_split_ratio_schedule": 1,
    "q_token_counter_overlap": 2, "q_tokenize": 1, "q_union_outputs": 2,
    "q_vocab_oov": 2, "q_word_split": 1,
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(spark, name):
    # budgets pin the COLD plan: persisted intermediates left by earlier
    # tests would otherwise rewrite matching subtrees to InMemoryTableScan
    # and shift the exchange count nondeterministically
    spark.catalog.clearCache()
    df = REGISTRY[name](spark, SF0001)
    got = audit.exchange_counts(df)
    assert got["hash"] <= BUDGETS[name], (
        f"{name}: {got['hash']} hash/range exchanges > budget "
        f"{BUDGETS[name]} — a shuffle crept into the plan"
    )
    assert got["single"] <= SINGLE_PARTITION.get(name, 0), (
        f"{name}: {got['single']} SinglePartition exchanges > pinned "
        f"{SINGLE_PARTITION.get(name, 0)} — a global funnel crept in"
    )
    assert got["roundrobin"] <= ROUNDROBIN.get(name, 0), (
        f"{name}: {got['roundrobin']} RoundRobin exchanges > pinned "
        f"{ROUNDROBIN.get(name, 0)} — a stray repartition() crept in"
    )
