"""Query registry: one callable per engine operator (SURVEY §2).

Each ``q_*`` takes (spark, sf_dir) and returns a DataFrame whose column
names/types match the DuckDB oracle SQL in ``oracles.py`` (the driver sorts
columns by name and hash-compares values — every computed column is aliased
identically on both sides, doubles rounded to 6 places on both sides).

Default knobs (chunk counts, lengths, budgets) are module constants so the
Spark query and its oracle share them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import portable_hash64, token_id
from .functions.scoring import bleu_udf, rouge_l_udf, set_f1, subset_accuracy
from .functions.text import (
    any_answer_contained,
    exact_match,
    first_line,
    normalize_question,
    normalize_text,
    substring_match,
)
from .operators import chunking, mapstage
from .operators import reduce as red
from .operators import topk as topk_ops
from .sources.tables import load_table

NUM_STEPS = 4          # C1 equal-partition chunk count
CHUNK_LEN = 20         # C2 fixed rechunk length (words)
TAIL_FRAC = 0.3        # C2 tail-merge threshold
DROP_BUDGET = 60       # P5 middle-drop token budget
RATIO_LOW, RATIO_INC = 0.2, 0.1   # C4 schedule
TOPK_RATIO, TOPK_LAST = 0.3, 2    # T1 selection knobs


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunking.split_words(_docs(spark, sf_dir))


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 chunks of every document (the shared pipeline intermediate).

    Built with the shuffle-free array-slice form: chunk production is a
    narrow transformation, so every consumer's first exchange is its OWN
    aggregation key, not a word shuffle."""
    from .sources.tables import ensure_parallelism

    return chunking.partition_equal_arrays(
        ensure_parallelism(_docs(spark, sf_dir)), NUM_STEPS
    )


# --- §2.1 scans / sources / sinks -------------------------------------------


def q_scan_documents(spark, sf_dir):
    """S1: project the document corpus (scan + pruned projection)."""
    return _docs(spark, sf_dir).select(
        "doc_id", "lang", "source", "n_chars", F.length("text").cast("bigint").alias("text_len")
    )


def q_join_doc_gt(spark, sf_dir):
    """S2: pair each document with its 'ground-truth' sibling (doc_id+1) —
    the parallel-corpus equi-join of test_proactive.py:371-372."""
    d = _docs(spark, sf_dir)
    src = d.select("doc_id", F.col("text").alias("src_text"), F.col("lang").alias("src_lang"))
    tgt = d.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("text").alias("gt_text"),
        F.col("lang").alias("gt_lang"),
    )
    return src.join(tgt, "doc_id", "inner")


def q_scan_json_dataset(spark, sf_dir):
    """S3: JSON field extraction from the events props payload."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


def q_corpus_split_files(spark, sf_dir):
    """S5: datasets/parse.py:3-42 — group docs into 10-doc sections, cap at
    section 200, one output partition per section."""
    d = _docs(spark, sf_dir)
    return (
        d.withColumn("section", F.floor(F.col("doc_id") / 10).cast("int"))
        .filter(F.col("section") <= 200)
        .groupBy("section")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --- §2.2 projections / filters ---------------------------------------------


def q_sentence_split(spark, sf_dir):
    """P1: deterministic sentence split (regex on terminators)."""
    return chunking.split_sentences(_docs(spark, sf_dir)).select(
        "doc_id", F.col("sent_pos").cast("int").alias("sent_pos"),
        F.length("sentence").cast("bigint").alias("sent_len"),
    )


def q_word_split(spark, sf_dir):
    """P1b: whitespace word explosion with positions (base text unit)."""
    return _words(spark, sf_dir).select(
        "doc_id", F.col("pos").cast("int").alias("pos"), "word"
    )


def q_project_lengths(spark, sf_dir):
    """P2: per-document token-count projection ([len(ids) for ids ...])."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
        "n_chars",
    )


def q_filter_empty(spark, sf_dir):
    """P3: drop documents with no content (skip-empty guard)."""
    d = _docs(spark, sf_dir)
    return d.filter(F.size(F.split("text", " ")) > 5).select("doc_id", "n_chars")


def q_limit_head(spark, sf_dir):
    """P4: deterministic head — first 20 docs by doc_id."""
    return (
        _docs(spark, sf_dir)
        .orderBy("doc_id")
        .limit(20)
        .select("doc_id", "lang", "n_chars")
    )


def q_prompt_assemble(spark, sf_dir):
    """P6: wrap chunk text in the prompt template."""
    return chunking.prompt_assemble(_chunks(spark, sf_dir)).select(
        "doc_id", "chunk_id", F.length("prompt").cast("bigint").alias("prompt_len"), "prompt"
    )


# --- §2.3 chunking ----------------------------------------------------------


def q_tokenize(spark, sf_dir):
    """C3: stand-in tokenizer — portable md5-derived token ids per word."""
    return _words(spark, sf_dir).select(
        "doc_id", F.col("pos").cast("int").alias("pos"), token_id("word").alias("token")
    )


def q_partition_equal(spark, sf_dir):
    """C1: equal partition into NUM_STEPS chunks, last takes remainder."""
    return _chunks(spark, sf_dir).select("doc_id", "chunk_id", "chunk_text", "n_words")


def q_rechunk_fixed(spark, sf_dir):
    """C2: fixed-size rechunk with tail-merge."""
    return chunking.rechunk_fixed(_words(spark, sf_dir), CHUNK_LEN, tail_frac=TAIL_FRAC).select(
        "doc_id", "chunk_id", "n_tokens", "start_pos"
    )


def q_split_ratio_schedule(spark, sf_dir):
    """C4: per-chunk linear ratio ramp min(low + i*inc, 1.0)."""
    d = _chunks(spark, sf_dir)
    return d.select(
        "doc_id",
        "chunk_id",
        F.round(
            F.least(F.lit(RATIO_LOW) + F.col("chunk_id") * F.lit(RATIO_INC), F.lit(1.0)), 6
        ).alias("ratio"),
    )


def q_middle_drop_truncate(spark, sf_dir):
    """P5: middle-drop until total tokens <= budget (order-dependent loop)."""
    chunks = chunking.rechunk_fixed(_words(spark, sf_dir), CHUNK_LEN, tail_frac=TAIL_FRAC)
    return chunking.middle_drop(chunks, DROP_BUDGET).select("doc_id", "chunk_id", "n_tokens")


def q_positional_shift(spark, sf_dir):
    """W4: per-chunk position offset = cumsum of previous chunk lengths."""
    chunks = chunking.rechunk_fixed(_words(spark, sf_dir), CHUNK_LEN, tail_frac=TAIL_FRAC)
    return chunking.positional_shift(chunks).select("doc_id", "chunk_id", "n_tokens", "shift")


# --- §2.4 map stage ---------------------------------------------------------


def q_llm_map(spark, sf_dir):
    """M1: black-box model stage over chunks (deterministic stand-in:
    reverse word order). Runs through the real mapInPandas seam."""
    return mapstage.llm_map(_chunks(spark, sf_dir)).select(
        "doc_id", "chunk_id", "out_text", "n_out_tokens"
    )


def q_first_line_answer(spark, sf_dir):
    """M2/M3: first-line answer extraction from model output."""
    mapped = mapstage.llm_map(_chunks(spark, sf_dir))
    return mapstage.decode_first_line(mapped).select(
        "doc_id", "chunk_id", F.length("answer").cast("bigint").alias("answer_len")
    )


# --- §2.5 reduce ------------------------------------------------------------


def q_incremental_concat(spark, sf_dir):
    """R1: ordered incremental concat of per-chunk outputs → final text."""
    mapped = mapstage.llm_map(_chunks(spark, sf_dir))
    return red.incremental_concat(mapped).select("doc_id", "final_text", "n_chunks")


def q_prefix_scan_inputs(spark, sf_dir):
    """R2: stage n's input = chunks 0..n (running prefix)."""
    return red.prefix_scan_inputs(_chunks(spark, sf_dir)).select(
        "doc_id", "chunk_id", F.length("stage_input").cast("bigint").alias("input_len")
    )


# --- flagship ---------------------------------------------------------------


def q_flagship(spark, sf_dir):
    """Flagship: chunked map-reduce round-trip with scoring.

    documents → words → C1 equal partition → M1 stand-in model (reverse
    words per chunk) → R1 ordered incremental concat → join ground truth
    (= whole-text reverse) → set-F1 + exact-match + subset accuracy.
    Composes S1,P1b,C1,M1,R1,S2-join,A6,A7,F3 into one plan.
    """
    docs = _docs(spark, sf_dir)
    mapped = mapstage.llm_map(_chunks(spark, sf_dir))
    final = red.incremental_concat(mapped)
    gt = docs.select(
        "doc_id",
        "lang",
        F.array_join(F.reverse(F.split("text", " ")), " ").alias("gt_text"),
    )
    joined = final.join(gt, "doc_id", "inner")
    return joined.select(
        "doc_id",
        "lang",
        "n_chunks",
        set_f1(F.split("final_text", " "), F.split("gt_text", " ")).alias("set_f1"),
        exact_match(F.col("final_text"), F.col("gt_text")).alias("em"),
        subset_accuracy(F.split("final_text", " "), F.split("gt_text", " ")).alias("subset_acc"),
    )


REGISTRY: dict[str, object] = {
    "q_scan_documents": q_scan_documents,
    "q_join_doc_gt": q_join_doc_gt,
    "q_scan_json_dataset": q_scan_json_dataset,
    "q_corpus_split_files": q_corpus_split_files,
    "q_sentence_split": q_sentence_split,
    "q_word_split": q_word_split,
    "q_project_lengths": q_project_lengths,
    "q_filter_empty": q_filter_empty,
    "q_limit_head": q_limit_head,
    "q_prompt_assemble": q_prompt_assemble,
    "q_tokenize": q_tokenize,
    "q_partition_equal": q_partition_equal,
    "q_rechunk_fixed": q_rechunk_fixed,
    "q_split_ratio_schedule": q_split_ratio_schedule,
    "q_middle_drop_truncate": q_middle_drop_truncate,
    "q_positional_shift": q_positional_shift,
    "q_llm_map": q_llm_map,
    "q_first_line_answer": q_first_line_answer,
    "q_incremental_concat": q_incremental_concat,
    "q_prefix_scan_inputs": q_prefix_scan_inputs,
    "q_flagship": q_flagship,
}


# --- §2.9 scalar text/math functions (F1-F5, F8, F10) -----------------------


def q_normalize_text(spark, sf_dir):
    """F1: lower → strip punct → drop articles → collapse whitespace."""
    return _docs(spark, sf_dir).select(
        "doc_id", normalize_text(F.col("text")).alias("norm_text")
    )


def q_normalize_question(spark, sf_dir):
    """F2: append '?' if missing, lowercase first char (first-5-words stub question)."""
    q = F.array_join(F.slice(F.split("text", " "), 1, 5), " ")
    return _docs(spark, sf_dir).select(
        "doc_id", normalize_question(q).alias("question")
    )


def q_exact_match(spark, sf_dir):
    """F3: normalized equality between neighbor documents."""
    d = _docs(spark, sf_dir)
    a = d.select("doc_id", F.col("text").alias("pred"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("gold"))
    return a.join(b, "doc_id").select(
        "doc_id", exact_match(F.col("pred"), F.col("gold")).alias("em")
    )


def q_substring_match(spark, sf_dir):
    """F4: normalized gold (first 3 words) contained in normalized pred."""
    d = _docs(spark, sf_dir)
    gold = F.array_join(F.slice(F.split("text", " "), 1, 3), " ")
    return d.select("doc_id", substring_match(F.col("text"), gold).alias("contained"))


def q_any_answer_contained(spark, sf_dir):
    """F5: any of a list of candidate answers contained in the text."""
    d = _docs(spark, sf_dir)
    ws = F.split("text", " ")
    answers = F.array(ws.getItem(0), F.lit("zzz_nonexistent_token"), F.element_at(ws, -1))
    return d.select("doc_id", any_answer_contained(F.col("text"), answers).alias("has_answer"))


def q_timing_arith(spark, sf_dir):
    """F8: decoding_speed = len(res_toks)/decode_time (test_proactive.py:332-335)."""
    d = _docs(spark, sf_dir)
    n_words = F.size(F.split("text", " "))
    decode_time = F.col("n_chars") / 100.0
    return d.select(
        "doc_id",
        F.round(decode_time, 6).alias("decode_time"),
        F.round(n_words / decode_time, 6).alias("decoding_speed"),
    )


def q_hash_key(spark, sf_dir):
    """F10: sha256(text + str(layer)) cache keys, one per (doc, layer)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("layer"), "text"
    ).select(
        "doc_id",
        F.col("layer").cast("int").alias("layer"),
        F.sha2(F.concat(F.col("text"), F.col("layer").cast("string")), 256).alias("cache_key"),
    )


# --- §2.6 aggregations (A1-A8) ----------------------------------------------


def q_metrics_avg(spark, sf_dir):
    """A1: aggregate means of the flagship per-doc metrics, by language."""
    scored = q_flagship(spark, sf_dir)
    return scored.groupBy("lang").agg(
        F.round(F.avg("set_f1"), 6).alias("avg_f1"),
        F.round(F.avg("em"), 6).alias("em_rate"),
        F.count("*").cast("bigint").alias("n_docs"),
    )


def q_best_of_answers(spark, sf_dir):
    """A2: score prediction against each gold answer, take the max
    (pipeline_70b_samsum.py:311)."""
    docs = _docs(spark, sf_dir)
    mapped = mapstage.llm_map(_chunks(spark, sf_dir))
    pred = red.incremental_concat(mapped).select("doc_id", F.col("final_text").alias("pred"))
    gt = docs.select(
        "doc_id",
        F.col("text").alias("ans_same"),
        F.array_join(F.reverse(F.split("text", " ")), " ").alias("ans_rev"),
        F.array_join(F.slice(F.split("text", " "), 1, 10), " ").alias("ans_head"),
    )
    j = pred.join(gt, "doc_id")
    p = F.split("pred", " ")
    return j.select(
        "doc_id",
        F.greatest(
            set_f1(p, F.split("ans_same", " ")),
            set_f1(p, F.split("ans_rev", " ")),
            set_f1(p, F.split("ans_head", " ")),
        ).alias("best_f1"),
    )


def q_union_outputs(spark, sf_dir):
    """§2.8: union of baseline and proactive result sets (compute_scores.py:20-24)."""
    proactive = q_flagship(spark, sf_dir).select(
        F.lit("proactive").alias("run"), "doc_id", F.col("set_f1").alias("f1")
    )
    baseline = _docs(spark, sf_dir).select(
        F.lit("baseline").alias("run"), "doc_id", F.lit(1.0).alias("f1")
    )
    return proactive.unionByName(baseline)


def q_mean_over_files(spark, sf_dir):
    """A3: np.mean over each result file (compute_scores.py:56-59)."""
    return q_union_outputs(spark, sf_dir).groupBy("run").agg(
        F.round(F.avg("f1"), 6).alias("avg_f1"),
        F.count("*").cast("bigint").alias("n_rows"),
    )


def q_flatten_nested_times(spark, sf_dir):
    """A4: flatten per-stage timing lists then aggregate (compute_scores.py:32-39).
    Per-chunk prefill time model: n_words / 4.1 tokens-per-sec."""
    chunks = _chunks(spark, sf_dir)
    nested = chunks.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("chunk_id", "n_words"))).alias("cl")
    ).select(
        "doc_id", F.transform("cl", lambda s: F.round(s["n_words"] / 4.1, 6)).alias("prefill_times")
    )
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return (
        nested.join(docs, "doc_id")
        .select("lang", F.explode("prefill_times").alias("t"))
        .groupBy("lang")
        .agg(F.round(F.avg("t"), 6).alias("avg_prefill"), F.count("*").cast("bigint").alias("n_times"))
    )


def q_token_counter_overlap(spark, sf_dir):
    """A5: multiset token-overlap F1 between neighbor docs
    (Counter & Counter, pipeline_70b_samsum.py:83-97).

    One (doc, word) count aggregation feeds BOTH sides of a full-outer
    self-join (gold = the same counts shifted to doc_id-1); totals and
    the min-count overlap all come out of the single final groupBy —
    the naive form re-exploded the corpus four times (pred/gold counts
    plus both totals). The duplicated tc subtree shares one identical
    exchange, which AQE reuses at runtime."""
    d = _docs(spark, sf_dir)
    words = chunking.split_words(d)
    tc = words.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    pred = tc.select("doc_id", "word", F.col("c").alias("c_pred"))
    gold = tc.select(
        (F.col("doc_id") - 1).alias("doc_id"), "word", F.col("c").alias("c_gold")
    )
    j = pred.join(gold, ["doc_id", "word"], "full_outer").select(
        "doc_id",
        F.coalesce("c_pred", F.lit(0)).alias("c_pred"),
        F.coalesce("c_gold", F.lit(0)).alias("c_gold"),
    )
    per_doc = (
        j.groupBy("doc_id")
        .agg(
            F.sum("c_pred").alias("n_pred"),
            F.sum("c_gold").alias("n_gold"),
            F.sum(F.least("c_pred", "c_gold")).alias("n_same"),
        )
        # inner-total semantics: only docs with both a pred and a gold side
        .filter((F.col("n_pred") > 0) & (F.col("n_gold") > 0))
    )
    j = per_doc
    prec = F.col("n_same") / F.col("n_pred")
    rec = F.col("n_same") / F.col("n_gold")
    return j.select(
        "doc_id",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(F.col("n_same") == 0, F.lit(0.0)).otherwise(2 * prec * rec / (prec + rec)), 6
        ).alias("f1"),
    )


def q_set_f1(spark, sf_dir):
    """A6: set-based F1 between neighbor docs (test_proactive.py:110-128)."""
    d = _docs(spark, sf_dir)
    a = d.select("doc_id", F.col("text").alias("pred"))
    b = d.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("gold"))
    return a.join(b, "doc_id").select(
        "doc_id", set_f1(F.split("pred", " "), F.split("gold", " ")).alias("set_f1")
    )


def q_subset_accuracy(spark, sf_dir):
    """A7: 1 iff gold token set ⊆ pred token set (test_proactive.py:130-139)."""
    d = _docs(spark, sf_dir)
    gold = F.slice(F.split("text", " "), 1, 10)
    return d.select(
        "doc_id", subset_accuracy(F.split("text", " "), gold).alias("subset_acc")
    )


def q_grid_sweep(spark, sf_dir):
    """A8: nested parameter sweep (ratios × check layers) producing one
    metrics row per cell (pipeline_70b_samsum.py:132-137)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_words")
    )
    ratios = spark.range(1).select(
        F.explode(F.array(F.lit(0.2), F.lit(0.5), F.lit(0.8))).alias("ratio")
    )
    layers = spark.range(1).select(
        F.explode(F.array(F.lit(0), F.lit(40), F.lit(79))).alias("check_layer")
    )
    grid = ratios.crossJoin(layers)
    cells = grid.crossJoin(docs)
    return cells.groupBy("ratio", "check_layer").agg(
        F.round(F.avg(F.round(F.col("ratio") * F.col("n_words"))), 6).alias("avg_selected"),
        F.count("*").cast("bigint").alias("n_docs"),
    )


# --- §2.7 top-k / ordering (T1, T2) and §2.10 windows (W3) ------------------


def _events_with_pos(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.withColumn("pos", (F.row_number().over(w) - 1).cast("int"))


def q_topk_importance(spark, sf_dir):
    """T1: per-user top-k events by score plus always the positional tail
    (modeling_llama.py:860-869 selection semantics)."""
    ev = _events_with_pos(spark, sf_dir).select("user_id", "pos", "event_id", "value")
    sel = topk_ops.topk_importance(
        ev, group_col="user_id", pos_col="pos", score_col="value",
        ratio=TOPK_RATIO, last_len=TOPK_LAST,
    )
    return sel.select("user_id", "pos", "event_id", "selected")


def q_order_preserve(spark, sf_dir):
    """T2: tokens consumed in (stage, pos) arrival order (test_order.py)."""
    ev = load_table(spark, sf_dir, "events")
    out = topk_ops.order_preserve(ev, "user_id", "ts", "event_id")
    return out.select("event_id", "user_id", "global_order")


def q_running_metric(spark, sf_dir):
    """W3: running metric per user in arrival order
    (pipeline_70b_samsum.py:312-323). Emits the cumulative sum and count
    (the mean's exact numerator/denominator) rather than the quotient:
    avg of 2-decimal values lands on exact x.5 rounding boundaries where
    Spark's sequential and DuckDB's segment-tree summation legitimately
    disagree in the last ulp; sum/count are boundary-free."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_sum"),
        F.count("*").over(w).cast("bigint").alias("running_n"),
    )


# --- analytics (A3/A4/F9 composition) ---------------------------------------


def q_speedup_model(spark, sf_dir):
    """F9: analytic pipeline-overlap speedup model (compute_scores.py:62-85).

    Per doc: baseline = ingest_all + prefill_total + decode_total;
    proactive = ingest_0 + Σ_j max(ingest_{j+1}, prefill_j + decode_j).
    Ingest/prefill/decode modeled from chunk token counts (tokens_per_sec
    = 4.1, decode = 0.5 ms/token)."""
    chunks = _chunks(spark, sf_dir)
    t = chunks.select(
        "doc_id",
        "chunk_id",
        (F.col("n_words") / 4.1).alias("ingest"),
        (F.col("n_words") * 0.8).alias("prefill"),
        (F.col("n_words") * 0.5).alias("decode"),
    )
    w_next = Window.partitionBy("doc_id").orderBy("chunk_id")
    t = t.withColumn("ingest_next", F.coalesce(F.lead("ingest").over(w_next), F.lit(0.0)))
    per_doc = t.groupBy("doc_id").agg(
        (
            F.min(F.when(F.col("chunk_id") == 0, F.col("ingest")))
            + F.sum(F.greatest(F.col("ingest_next"), F.col("prefill") + F.col("decode")))
        ).alias("e2e_proactive"),
        (F.sum("ingest") + F.sum("prefill") + F.sum("decode")).alias("e2e_baseline"),
    )
    return per_doc.select(
        "doc_id",
        F.round("e2e_baseline", 6).alias("e2e_baseline"),
        F.round("e2e_proactive", 6).alias("e2e_proactive"),
        F.round(F.col("e2e_baseline") / F.col("e2e_proactive"), 6).alias("speedup"),
    )


# --- relational substrate (§2.8/2.11 + bench headliners) --------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary over lineitem (bench headliner).

    Scale: single scan + partial-agg shuffle on a low-cardinality key;
    filter pushed to parquet; no joins."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "2001-06-30")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


def q_top_revenue(spark, sf_dir):
    """TPC-H Q3-style: top 10 orders by revenue for one market segment.

    Scale: customer dim is broadcast (no shuffle of lineitem on custkey);
    the only wide shuffle is the groupBy(o_orderkey) aggregation."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Broadcast the DIM side (segment-filtered orders⋈customer), never the
    # fact table: without the hint Spark's size estimate can pick BuildLeft
    # on lineitem's 3-column projection — fine at sf0.1, catastrophic at
    # 100 TB where lineitem is the big table. At even larger orders
    # cardinality AQE's runtime stats would fall back to shuffle join.
    j = li.join(
        F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
        li.l_orderkey == orders.o_orderkey,
    )
    return (
        j.groupBy("o_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q_region_revenue(spark, sf_dir):
    """Star-schema rollup: revenue per region via broadcast dim chain
    (lineitem ⋈ supplier ⋈ nation ⋈ region)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    dims = F.broadcast(
        sup.join(nat, sup.s_nationkey == nat.n_nationkey).join(
            reg, nat.n_regionkey == reg.r_regionkey
        ).select("s_suppkey", "r_name")
    )
    return (
        li.join(dims, li.l_suppkey == dims.s_suppkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


def q_window_tumbling(spark, sf_dir):
    """Tumbling 1-hour window aggregation over the events stream table
    (batch form; the streaming mode reuses the same expression)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            (F.unix_timestamp(F.col("w.start")) / 3600).cast("bigint").alias("hour_bucket"),
            "event_type",
            "avg_value",
            "sum_value",
            "n_events",
        )
    )


def q_sessionize(spark, sf_dir):
    """Session windows: per-user sessions split at >30 min inactivity gaps
    (engine streaming capability, batch-checkable form)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_sess = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("bigint"),
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.unix_timestamp(F.min("ts")).cast("bigint").alias("session_start"),
        F.unix_timestamp(F.max("ts")).cast("bigint").alias("session_end"),
    )


REGISTRY.update(
    {
        "q_normalize_text": q_normalize_text,
        "q_normalize_question": q_normalize_question,
        "q_exact_match": q_exact_match,
        "q_substring_match": q_substring_match,
        "q_any_answer_contained": q_any_answer_contained,
        "q_timing_arith": q_timing_arith,
        "q_hash_key": q_hash_key,
        "q_metrics_avg": q_metrics_avg,
        "q_best_of_answers": q_best_of_answers,
        "q_union_outputs": q_union_outputs,
        "q_mean_over_files": q_mean_over_files,
        "q_flatten_nested_times": q_flatten_nested_times,
        "q_token_counter_overlap": q_token_counter_overlap,
        "q_set_f1": q_set_f1,
        "q_subset_accuracy": q_subset_accuracy,
        "q_grid_sweep": q_grid_sweep,
        "q_topk_importance": q_topk_importance,
        "q_order_preserve": q_order_preserve,
        "q_running_metric": q_running_metric,
        "q_speedup_model": q_speedup_model,
        "q_pricing_summary": q_pricing_summary,
        "q_top_revenue": q_top_revenue,
        "q_region_revenue": q_region_revenue,
        "q_window_tumbling": q_window_tumbling,
        "q_sessionize": q_sessionize,
    }
)


# --- north-star: dedup / similarity / text analysis / multimodal ------------

from .operators import dedup as dedup_ops            # noqa: E402
from .operators import multimodal as mm_ops          # noqa: E402
from .operators import similarity as sim_ops         # noqa: E402
from .operators import textstats as ts_ops           # noqa: E402

MINHASH_N = 16
MINHASH_BANDS = 4
NEAR_DUP_COS = 0.4   # fixture embeddings are random (max cos ~0.48); at this
                     # threshold the operator returns a small nonzero pair set


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: group by normalized content hash, keep representative."""
    return dedup_ops.exact_dedup(_docs(spark, sf_dir)).select(
        "content_key", "rep_id", "n_dups"
    )


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (16 portable hash functions over 3-gram shingles),
    computed as a narrow array projection — zero shuffles."""
    sh = dedup_ops.shingle_rows(_words(spark, sf_dir))
    return dedup_ops.minhash_signatures(sh, MINHASH_N)


def q_dedup_minhash_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs (4 bands × 4 rows) with exact Jaccard.

    Signatures and shingle sets come from ONE combined aggregation
    (persisted): one word explosion, one shingle window, one md5 pass,
    one shuffle — the banding self-join and the candidate Jaccard both
    reuse it instead of re-deriving the corpus pipeline."""
    combined = dedup_ops.minhash_with_sets(
        dedup_ops.shingle_rows(_words(spark, sf_dir)), MINHASH_N
    ).persist()
    pairs = dedup_ops.lsh_candidate_pairs(combined, MINHASH_N, MINHASH_BANDS)
    return dedup_ops.jaccard_pairs(
        combined.select("doc_id", "shingles"), pairs
    )


MINHASH_MIN_AGREEMENT = 8  # confirmation gate: est-Jaccard >= 8/16 = 0.5


def q_dedup_minhash_confirmed(spark, sf_dir):
    """MinHash near-dup pairs with the signature-agreement guard.

    LSH candidates are CONFIRMED against the 16-component signatures
    (n_sig_match >= 8, i.e. estimated Jaccard >= 0.5) before the exact
    set join — the pair-expansion guard: after a high-dup round the
    shingle-set shuffle costs |pairs| x (|A|+|B|) hashed shingles, while
    the agreement join costs 16 ints per side, so the heavy traffic
    tracks confirmed near-dups instead of raw band candidates. Output
    carries both the estimate (n_sig_match) and the exact jaccard of the
    survivors."""
    combined = dedup_ops.minhash_with_sets(
        dedup_ops.shingle_rows(_words(spark, sf_dir)), MINHASH_N
    ).persist()
    pairs = dedup_ops.lsh_candidate_pairs(combined, MINHASH_N, MINHASH_BANDS)
    confirmed = dedup_ops.signature_agreement(pairs, combined, MINHASH_N).filter(
        F.col("n_sig_match") >= MINHASH_MIN_AGREEMENT
    )
    a = combined.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = combined.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        confirmed.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_sig_match",
            F.round(inter / (F.size("sh_a") + F.size("sh_b") - inter), 6).alias(
                "jaccard"
            ),
        )
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup within (lang, length-bucket) blocks."""
    d = _docs(spark, sf_dir)
    blocked = d.withColumn("blk_bucket", (F.col("n_chars") / 100).cast("bigint"))
    a = blocked.select(
        F.col("doc_id").alias("doc_a"), "lang", "blk_bucket"
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"), "lang", "blk_bucket"
    )
    pairs = a.join(b, ["lang", "blk_bucket"]).filter(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b"
    )
    sets = dedup_ops.shingle_sets(chunking.split_words(d))
    return dedup_ops.jaccard_pairs(sets, pairs)


def q_simhash(spark, sf_dir):
    """32-bit SimHash fingerprint per document."""
    return dedup_ops.simhash(_docs(spark, sf_dir)).select("doc_id", "simhash")


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (label-blocked)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim_ops.embedding_near_dup_pairs(emb, NEAR_DUP_COS, dim=sim_ops.EMBED_DIM)


def q_similarity_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for the first 8 query vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim_ops.brute_force_topk(emb, n_queries=8, k=5, dim=sim_ops.EMBED_DIM)


def q_similarity_lsh(spark, sf_dir):
    """Sign-bucket LSH approximate top-5 (scale path: bucket equi-join)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim_ops.lsh_topk(emb, n_queries=8, k=5, n_bits=4, dim=sim_ops.EMBED_DIM)


def q_lang_id(spark, sf_dir):
    """Marker-word language identification."""
    return ts_ops.lang_id(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "pred_lang", "marker_hits"
    )


def q_quality_score(spark, sf_dir):
    """Quality-scoring features + composite score."""
    return ts_ops.quality_features(_docs(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    """Token counting (whitespace + BPE-ish estimate)."""
    return ts_ops.token_stats(_docs(spark, sf_dir))


def q_doc_fingerprint(spark, sf_dir):
    """Content hash + winnowing-style rolling-hash extremes."""
    return ts_ops.fingerprint(_docs(spark, sf_dir))


def q_multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction through the mapInPandas seam
    (deterministic fake codec; real decode is the documented stub)."""
    payloads = mm_ops.attach_payload(_docs(spark, sf_dir))
    return mm_ops.extract_features(payloads)


REGISTRY.update(
    {
        "q_dedup_exact": q_dedup_exact,
        "q_minhash_signatures": q_minhash_signatures,
        "q_dedup_minhash_pairs": q_dedup_minhash_pairs,
        "q_dedup_minhash_confirmed": q_dedup_minhash_confirmed,
        "q_dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "q_simhash": q_simhash,
        "q_dedup_embedding": q_dedup_embedding,
        "q_similarity_topk": q_similarity_topk,
        "q_similarity_lsh": q_similarity_lsh,
        "q_lang_id": q_lang_id,
        "q_quality_score": q_quality_score,
        "q_token_stats": q_token_stats,
        "q_doc_fingerprint": q_doc_fingerprint,
        "q_multimodal_features": q_multimodal_features,
    }
)


# --- streaming mode (W1/W2), sinks, BLEU/ROUGE, detok -----------------------

import shutil as _shutil                              # noqa: E402
import tempfile as _tempfile                          # noqa: E402

from .streaming import proactive as stream_ops        # noqa: E402


def q_stage_pipeline(spark, sf_dir):
    """W1: staged proactive execution — chunk stages arrive one micro-batch
    at a time through a Structured Streaming file source and run the same
    black-box map stage. Value-identical to batch q_llm_map (same oracle),
    executed by the real streaming engine (test_proactive.py:227-368)."""
    return stream_ops.stage_pipeline(spark, _chunks(spark, sf_dir)).select(
        "doc_id", "chunk_id", "out_text", "n_out_tokens"
    )


def q_stateful_accumulate(spark, sf_dir):
    """W2: cross-stage accumulator state via applyInPandasWithState keyed
    by doc_id (the total_res_toks analog, test_proactive.py:327-328). The
    final update per doc equals batch incremental_concat (same oracle)."""
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


def q_bleu(spark, sf_dir):
    """F6: smoothed sentence BLEU of the chunk-reversed reconstruction vs
    the original text (test_proactive.py:374-376) — relational form:
    integer clipped n-gram match/total counts per order (exact,
    hash-checked against DuckDB) plus the BLEU float computed from those
    integers in closed form. Same formula as functions.scoring.bleu_score
    (pinned equal by tests/test_scoring.py)."""
    from .functions.scoring import bleu_table

    mapped = red.incremental_concat(mapstage.llm_map(_chunks(spark, sf_dir)))
    return bleu_table(mapped, _docs(spark, sf_dir))


def q_rouge(spark, sf_dir):
    """F7: ROUGE-L of the chunk-reversed reconstruction vs the original
    text (pipeline_70b_samsum.py:77-81) — hash-checkable form: the LCS
    length is an exact integer (Arrow pandas UDF; the oracle recomputes
    it via a recursive-CTE row DP), and the f-measure derives from that
    integer with IEEE-exact arithmetic identically on both engines."""
    from .functions.scoring import lcs_udf

    mapped = red.incremental_concat(mapstage.llm_map(_chunks(spark, sf_dir)))
    joined = mapped.join(_docs(spark, sf_dir).select("doc_id", "text"), "doc_id")
    staged = joined.select(
        "doc_id",
        lcs_udf(F.col("final_text"), F.col("text")).alias("lcs"),
        F.size(F.split("final_text", " ")).cast("bigint").alias("len_p"),
        F.size(F.split("text", " ")).cast("bigint").alias("len_g"),
    )
    prec = F.col("lcs") / F.col("len_p").cast("double")
    rec = F.col("lcs") / F.col("len_g").cast("double")
    return staged.select(
        "doc_id",
        "lcs",
        "len_p",
        "len_g",
        F.round(
            F.when(F.col("lcs") == 0, F.lit(0.0)).otherwise(
                2.0 * prec * rec / (prec + rec)
            ),
            6,
        ).alias("rouge_l"),
    )


def q_decode_detok(spark, sf_dir):
    """M2: token ids → text through a corpus-derived vocabulary
    (tokenizer.decode seam, pipeline_70b_samsum.py:302-303). Collisions in
    the stand-in vocab resolve to the min word, identically in the oracle.

    Scale: vocab is bounded by VOCAB_SIZE → broadcast join; the decode is
    one groupBy(doc_id) with sorted-struct reassembly."""
    words = _words(spark, sf_dir)
    vocab = words.groupBy(token_id("word").alias("tok")).agg(F.min("word").alias("word"))
    toks = words.select("doc_id", "pos", token_id("word").alias("tok"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("decoded_text")
        )
    )


def q_sink_jsonl_append(spark, sf_dir):
    """S4: JSONL append sink (test_proactive.py:397-398) — write per-doc
    metric rows as JSON lines, then read the sink back (round-trip check).

    Scale: df.write.json is a parallel executor-side sink (one file per
    partition, no driver funnel); mode('append') matches the reference's
    open(..., 'a')."""
    metrics = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.col("lang").alias("dataset"),
            F.length("text").cast("bigint").alias("output_len"),
        )
    )
    path = _tempfile.mkdtemp(prefix="pmr_jsonl_") + "/metrics"
    metrics.write.mode("append").json(path)
    back = spark.read.json(path, schema="doc_id bigint, dataset string, output_len bigint")
    return back.select("doc_id", "dataset", "output_len")


REGISTRY.update(
    {
        "q_stage_pipeline": q_stage_pipeline,
        "q_stateful_accumulate": q_stateful_accumulate,
        "q_stream_window_late": q_stream_window_late,
        "q_bleu": q_bleu,
        "q_rouge": q_rouge,
        "q_decode_detok": q_decode_detok,
        "q_sink_jsonl_append": q_sink_jsonl_append,
    }
)


# --- R3 ordered state concat + multimodal resize / frame sampling -----------


def q_kv_concat(spark, sf_dir):
    """R3: per-chunk state slices concatenated in chunk order
    (pipeline_70b_samsum.py:217-243 torch.cat along the sequence dim) —
    data-plane analog: per-doc ordered flatten of per-chunk token arrays.

    Scale: two groupBys sharing the doc_id exchange; arrays bounded by
    document length."""
    words = _words(spark, sf_dir)
    with_chunk = words.withColumn(
        "chunk_id",
        chunking.equal_partition_chunk_id(F.col("pos"), F.col("n_words_doc"), NUM_STEPS),
    ).withColumn("tok", token_id("word"))
    per_chunk = with_chunk.groupBy("doc_id", "chunk_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
        ).alias("toks")
    )
    return (
        per_chunk.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias("kv")
        )
        .select(
            "doc_id",
            F.size("kv").cast("bigint").alias("n_tokens"),
            F.aggregate("kv", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("tok_checksum"),
        )
    )


def q_multimodal_resize(spark, sf_dir):
    """Resize stage (stub codec, real mapInPandas plumbing): scale-to-width
    with integer aspect math, audio passes through 0x0."""
    payloads = mm_ops.attach_payload(_docs(spark, sf_dir))
    out = mm_ops.resize_media(payloads, target_w=512)
    return out.select(
        "doc_id", "media_type", "width", "height", "out_width", "out_height",
        F.length("out_payload").cast("bigint").alias("out_payload_len"),
    )


def q_multimodal_frames(spark, sf_dir):
    """Frame sampling: every 30th frame id of each video payload."""
    feats = mm_ops.extract_features(mm_ops.attach_payload(_docs(spark, sf_dir)))
    return mm_ops.sample_frames(feats, every=30).select(
        "doc_id", F.col("n_frames"), F.col("frame_id").cast("bigint").alias("frame_id")
    )


REGISTRY.update(
    {
        "q_kv_concat": q_kv_concat,
        "q_multimodal_resize": q_multimodal_resize,
        "q_multimodal_frames": q_multimodal_frames,
    }
)


# --- skew mitigation, rollups, text-corpus source, IVF similarity -----------

from .operators import skew as skew_ops               # noqa: E402
from .sources import text_corpus as txt_src           # noqa: E402

N_SALTS = 8


def q_salted_agg(spark, sf_dir):
    """Skew-safe two-phase aggregation: per-event_type value sum/count via
    a deterministic salt (hot keys spread across N_SALTS reducers).
    Value-identical to the plain groupBy — the oracle IS the plain SQL."""
    ev = load_table(spark, sf_dir, "events")
    out = skew_ops.salted_agg(
        ev, ["event_type"], "value", salt_source="event_id", n_salts=N_SALTS
    )
    return out.select("event_type", F.round("sum_value", 2).alias("sum_value"), "n_rows")


def q_salted_join(spark, sf_dir):
    """Skew-safe fact⋈dim join with N_SALTS-fold dim replication instead of
    broadcast: lineitem ⋈ supplier on (suppkey, salt)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    j = skew_ops.salted_join(
        li, sup, "l_suppkey", "s_suppkey", salt_source="l_orderkey", n_salts=N_SALTS
    )
    return j.groupBy("s_nationkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").cast("bigint").alias("n_items"),
    )


def q_rollup_multi(spark, sf_dir):
    """Multi-granularity rollup over events: (event_type, day) → event_type
    → grand total in one pass (hypertable-style continuous-aggregate
    shape; partial aggregation handles all levels in a single shuffle)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    return (
        ev.select(F.col("event_type"), day, F.col("value"))
        .rollup("event_type", "day")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "event_type",
            F.unix_timestamp("day").cast("bigint").alias("day_epoch"),
            "n_events",
            "sum_value",
        )
    )


def q_scan_text_corpus(spark, sf_dir):
    """S1 production path: ingest a directory of {doc_id}.txt files via
    spark.read.text(wholetext) + input_file_name parsing. The corpus is
    materialized from the documents fixture (same layout the reference
    reads), then round-tripped; values must match the parquet table."""
    import hashlib as _hashlib
    import os as _os

    d = _docs(spark, sf_dir)
    # Deterministic per-sf cache dir, populated once via write-to-staging +
    # atomic rename: a reader (this invocation's lazy scan, or a prior
    # invocation's still-unevaluated DataFrame) can never observe a
    # half-written corpus, and repeat invocations skip the write entirely.
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    root = _os.path.join(_tempfile.gettempdir(), f"pmr_corpus_{tag}")
    if not _os.path.isdir(root):
        staging = _tempfile.mkdtemp(prefix=f"pmr_corpus_{tag}_stage_")
        txt_src.write_text_corpus(d, staging)
        try:
            _os.rename(staging, root)
        except OSError:  # lost the rename race: another writer finished first
            _shutil.rmtree(staging, ignore_errors=True)
    back = txt_src.read_text_corpus(spark, root)
    return back.select(
        "doc_id",
        F.length("text").cast("bigint").alias("text_len"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
    )


def q_similarity_ivf(spark, sf_dir):
    """IVF approximate top-k (deterministic fixed-point Lloyd's coarse
    quantizer, nprobe=3 of 8 clusters). Integer distance/centroid math
    makes cluster boundaries bit-stable cross-engine → fully hash-checked
    in the driver gate; recall vs brute force is pinned by tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim_ops.ivf_topk(emb, n_queries=8, k=5, n_clusters=8, nprobe=3)


REGISTRY.update(
    {
        "q_salted_agg": q_salted_agg,
        "q_salted_join": q_salted_join,
        "q_rollup_multi": q_rollup_multi,
        "q_scan_text_corpus": q_scan_text_corpus,
        "q_similarity_ivf": q_similarity_ivf,
    }
)


# --- set operations (§2.8) and corpus statistics -----------------------------


def q_intersect_docs(spark, sf_dir):
    """§2.8: INTERSECT of two derived doc sets (short docs ∩ first-half ids)
    — surfacing Spark's native set algebra on the fixture tables."""
    d = _docs(spark, sf_dir)
    short = d.filter(F.col("n_chars") < 300).select("doc_id", "lang")
    first_half = d.filter(F.col("doc_id") < 250).select("doc_id", "lang")
    return short.intersect(first_half)


def q_except_docs(spark, sf_dir):
    """§2.8: EXCEPT — short docs NOT in the first half of the id space."""
    d = _docs(spark, sf_dir)
    short = d.filter(F.col("n_chars") < 300).select("doc_id", "lang")
    first_half = d.filter(F.col("doc_id") < 250).select("doc_id", "lang")
    return short.exceptAll(first_half)


def q_corpus_stats(spark, sf_dir):
    """Corpus statistics per language: doc count, exact distinct word
    count, total words, median doc length (continuous interpolation).

    Scale: distinct-word counting is the expensive part — one shuffle on
    (lang, word) with map-side partial dedup; at 100 TB swap in
    approx_count_distinct(HLL) for a constant-memory sketch (exact kept
    here for oracle checkability)."""
    d = _docs(spark, sf_dir)
    words = _words(spark, sf_dir).join(d.select("doc_id", "lang"), "doc_id")
    per_lang_words = words.groupBy("lang").agg(
        F.countDistinct("word").alias("n_distinct_words"),
        F.count("*").cast("bigint").alias("n_words_total"),
    )
    per_lang_docs = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("median_chars"),
    )
    return per_lang_docs.join(per_lang_words, "lang").select(
        "lang", "n_docs", "median_chars", "n_distinct_words", "n_words_total"
    )


REGISTRY.update(
    {
        "q_intersect_docs": q_intersect_docs,
        "q_except_docs": q_except_docs,
        "q_corpus_stats": q_corpus_stats,
    }
)


def q_head_cap(spark, sf_dir):
    """T3: fixed example-count cap (idx == 5 stop, pipeline_70b_samsum.py:
    325-326) — deterministic limit over the ordered events stream."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy("event_id")
        .limit(5)
        .select("event_id", "event_type", F.round("value", 6).alias("value"))
    )


REGISTRY.update({"q_head_cap": q_head_cap})


def q_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream inner join (click×view per user within
    ±30 min) — both sides buffer watermark-bounded state; in-order bucket
    arrival + sentinel flush makes the streamed result equal the batch
    interval join (sql-checked)."""
    ev = load_table(spark, sf_dir, "events")
    return stream_ops.stream_stream_join(spark, ev)


REGISTRY.update({"q_stream_stream_join": q_stream_stream_join})


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14-style promo revenue share: part dim broadcast into the
    lineitem scan, one month of shipdates (filter pushed to parquet),
    conditional aggregation — single wide shuffle of one partial-agg row
    per partition."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-03-01")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0))
            / F.sum(rev),
            6,
        ).alias("promo_share"),
        F.count("*").cast("bigint").alias("n_items"),
    )


REGISTRY.update({"q_promo_revenue": q_promo_revenue})


from .operators import asof as asof_ops                # noqa: E402


def q_asof_join(spark, sf_dir):
    """As-of join: each click matched to the user's latest view at-or-
    before it (union + ordered carry-forward — one exchange, one sort,
    linear cost; never a range cross-product). DuckDB oracles it with
    native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    j = asof_ops.asof_join(clicks, views, on="user_id")
    return j.select(
        "user_id",
        "click_id",
        F.col("r_view_id").alias("view_id"),
        (F.unix_micros("ts") - F.unix_micros("r_ts")).cast("bigint").alias("age_us"),
    )


REGISTRY.update({"q_asof_join": q_asof_join})


from .operators import rangejoin as range_ops          # noqa: E402


def q_range_join(spark, sf_dir):
    """Batch range join (click x view within ±30 min per user) via time-
    bucket expansion — the whole range condition becomes an equi-join on
    (user_id, bucket); same result set as the streaming q_stream_stream_
    join (shared oracle)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("l_id"), "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("r_id"), "ts"
    )
    j = range_ops.interval_join(clicks, views, on="user_id", within_us=30 * 60 * 1_000_000)
    return j.select(
        "user_id",
        "l_id",
        F.col("r_r_id").alias("r_id"),
        (F.unix_micros("r_ts") - F.unix_micros("ts")).cast("bigint").alias("gap_us"),
    )


REGISTRY.update({"q_range_join": q_range_join})


def q_qa_pipeline(spark, sf_dir):
    """§3.2 lifecycle (pipeline_70b_samsum.py evaluate_dataset) composed
    end-to-end: fixed rechunk (C2) → middle-drop budget truncation (P5)
    → kept-context assembly → best-of-answers set-F1 (A2+A6) against two
    gold candidates (full document, final chunk).

    Set scoring is reversal-invariant, so the black-box map stage is
    omitted here (q_flagship exercises that seam); this query is the
    truncation/scoring half of the samsum flow. One doc_id exchange
    shared by the window and both aggregations."""
    words = _words(spark, sf_dir)
    wc = words.withColumn(
        "chunk_id",
        chunking.rechunk_chunk_id(F.col("pos"), F.col("n_words_doc"), CHUNK_LEN, TAIL_FRAC),
    )
    surv = chunking.middle_drop(
        chunking.rechunk_fixed(words, CHUNK_LEN, tail_frac=TAIL_FRAC), DROP_BUDGET
    ).select("doc_id", "chunk_id", F.lit(1).alias("_keep"))
    j = wc.join(surv, ["doc_id", "chunk_id"], "left")
    mx = Window.partitionBy("doc_id")
    j = j.withColumn("_mc", F.max("chunk_id").over(mx))
    agg = j.groupBy("doc_id").agg(
        F.array_distinct(F.collect_list(F.when(F.col("_keep") == 1, F.col("word")))).alias("kept"),
        F.array_distinct(F.collect_list("word")).alias("full"),
        F.array_distinct(
            F.collect_list(F.when(F.col("chunk_id") == F.col("_mc"), F.col("word")))
        ).alias("last"),
        F.count(F.when(F.col("_keep") == 1, 1)).cast("bigint").alias("kept_tokens"),
        F.size(F.collect_set(F.when(F.col("_keep") == 1, F.col("chunk_id"))))
        .cast("bigint")
        .alias("n_chunks_kept"),
    )
    return agg.select(
        "doc_id",
        "n_chunks_kept",
        "kept_tokens",
        F.greatest(
            set_f1(F.col("kept"), F.col("full")), set_f1(F.col("kept"), F.col("last"))
        ).alias("best_f1"),
    )


REGISTRY.update({"q_qa_pipeline": q_qa_pipeline})


SKETCH_KMV_K = 1024   # KMV size: stderr ≈ 1/sqrt(k-2) ≈ 3%
SKETCH_BINS = 64      # histogram sketch resolution


def q_sketch_stats(spark, sf_dir):
    """Sketch statistics: approximate distinct words (KMV — k minimum
    hash values) and approximate doc-length quartiles (equi-width
    histogram bins) per language — constant-memory, mergeable forms of
    q_corpus_stats' exact aggregates (what actually runs at 100 TB).

    Both sketches are built on the portable md5 hash / exact integer bin
    counts, so unlike engine-native HLL and GK/t-digest summaries the
    values are bit-identical cross-engine → fully hash-checked in the
    driver gate; accuracy vs the exact aggregates stays pinned by tests.

    KMV estimator: with h uniform on [0, 2^32), E[k-th min] ≈ k/|S|·2^32
    → |S| ≈ (k-1)·2^32 / h_(k). When |S| < k the sketch holds the whole
    set and answers exactly. Quartiles report the lower bound of the bin
    where the cumulative count crosses p·n (bin width = range/64).
    """
    from .operators import sketch as sketch_ops

    d = _docs(spark, sf_dir)
    words = _words(spark, sf_dir).join(d.select("doc_id", "lang"), "doc_id")
    wh = words.select("lang", portable_hash64("word").alias("h")).distinct()
    kmv = sketch_ops.kmv_distinct(
        wh, "lang", "h", SKETCH_KMV_K, out_col="approx_distinct_words"
    )
    q = sketch_ops.histogram_quantiles(
        d, "lang", "n_chars", SKETCH_BINS, probs=[0.25, 0.50, 0.75],
        out_cols=["p25", "p50", "p75"],
    )
    return kmv.join(q, "lang")


REGISTRY.update({"q_sketch_stats": q_sketch_stats})


def q_dedup_clusters(spark, sf_dir):
    """Near-dup cluster formation: LSH candidate pairs → connected
    components → (doc_id, cluster_rep) with min-id representatives.
    Only docs that appear in some pair are emitted (singletons are their
    own representative trivially)."""
    combined = dedup_ops.minhash_with_sets(
        dedup_ops.shingle_rows(_words(spark, sf_dir)), MINHASH_N
    )
    pairs = dedup_ops.lsh_candidate_pairs(combined, MINHASH_N, MINHASH_BANDS).persist()
    return dedup_ops.connected_components(pairs)


REGISTRY.update({"q_dedup_clusters": q_dedup_clusters})


def q_session_window(spark, sf_dir):
    """Native session_window aggregation (30-min inactivity gap) — the
    built-in form of q_sessionize's hand-rolled lag/cumsum, usable
    unchanged under Structured Streaming. Oracle mirrors the gap
    semantics with window functions."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).cast("bigint").alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


REGISTRY.update({"q_session_window": q_session_window})


def q_window_sliding(spark, sf_dir):
    """Sliding 1-hour window, 30-minute slide (each event contributes to
    two windows) — completes the tumbling/sliding/session triple; the
    same expression runs under Structured Streaming."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


REGISTRY.update({"q_window_sliding": q_window_sliding})


def q_sink_partitioned(spark, sf_dir):
    """Partitioned parquet sink + pruned read-back: documents written
    partitionBy(lang), then one partition read with the filter applied
    as a PartitionFilter (directory pruning — only that partition's
    files are scanned; at 100 TB, partition layout IS the primary
    pruning lever). Values must round-trip exactly."""
    d = _docs(spark, sf_dir)
    path = _tempfile.mkdtemp(prefix="pmr_part_") + "/docs"
    d.select("doc_id", "n_chars", "lang").write.partitionBy("lang").mode(
        "overwrite"
    ).parquet(path)
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    return back.select("doc_id", "n_chars")


REGISTRY.update({"q_sink_partitioned": q_sink_partitioned})


def q_semi_anti_join(spark, sf_dir):
    """§2.11: left-semi and left-anti joins — customers with vs without
    orders, as one labeled union (both sides broadcast the orders key
    set; at scale this is a shuffle semi-join AQE can re-plan)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ord_keys = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = cust.join(
        ord_keys, cust.c_custkey == ord_keys.o_custkey, "left_semi"
    ).withColumn("has_orders", F.lit(1))
    without = cust.join(
        ord_keys, cust.c_custkey == ord_keys.o_custkey, "left_anti"
    ).withColumn("has_orders", F.lit(0))
    return (
        with_orders.unionByName(without)
        .groupBy("c_mktsegment", "has_orders")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


def q_cube_events(spark, sf_dir):
    """CUBE over (event_type, day-of-week): all four grouping levels in
    one pass (partial aggregation covers every cell)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.dayofweek("ts").cast("int").alias("dow"), "value")
        .cube("event_type", "dow")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


REGISTRY.update({"q_semi_anti_join": q_semi_anti_join, "q_cube_events": q_cube_events})


EMBED_DIM = 8


def q_embed_documents(spark, sf_dir):
    """Documents → embeddings bridge: deterministic stand-in encoder
    (hash-derived unit-less vector per doc; a real encoder swaps in as a
    mapInPandas stage exactly like M1). Emits the vector's checksum and
    first component so the full array is value-checked without float-
    array hashing ambiguity."""
    d = _docs(spark, sf_dir)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(EMBED_DIM - 1)),
        lambda i: F.round(
            (portable_hash64(F.concat(F.col("text"), i.cast("string"))) % 10000) / 10000.0, 6
        ),
    )
    return d.select(
        "doc_id",
        vec.alias("emb"),
    ).select(
        "doc_id",
        F.lit(EMBED_DIM).cast("int").alias("dim"),
        F.round(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x), 6).alias("emb_sum"),
        F.col("emb")[0].alias("emb_0"),
    )


REGISTRY.update({"q_embed_documents": q_embed_documents})


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_repetition_signals(spark, sf_dir):
    """Within-document repetition quality filters (Gopher-style): top-
    bigram fraction + duplicated-trigram fraction, computed array-locally
    per row — a pure narrow projection over the scan (zero shuffles)."""
    return ts_ops.repetition_signals(_docs(spark, sf_dir))


def q_pivot_event_types(spark, sf_dir):
    """PIVOT: per-user event counts spread into one column per event
    type. The value list is given explicitly, so the plan is a single
    conditional aggregation pass (no extra distinct scan) — the shape
    that survives 100 TB: one shuffle keyed by user_id."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    return p.select(
        "user_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
            for c in EVENT_TYPES
        ],
    )


def q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup under a watermark
    (dropDuplicatesWithinWatermark): events with id % 10 == 0 are
    delivered twice across micro-batches; each must be emitted exactly
    once. Key state is bounded by the watermark horizon — the form of
    distinct that works on an unbounded stream. Oracle: batch DISTINCT
    over the same duplicated input."""
    ev = load_table(spark, sf_dir, "events")
    return stream_ops.stream_dedup(spark, ev)


def q_scan_csv_roundtrip(spark, sf_dir):
    """CSV source/sink coverage: documents written as quoted CSV (free
    text with embedded delimiters), read back with an explicit schema —
    values must round-trip exactly. Parallel executor-side write (one
    file per partition), schema-on-read with no inference pass."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    path = _tempfile.mkdtemp(prefix="pmr_csv_") + "/docs"
    d.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema("doc_id bigint, lang string, text string").option(
        "header", True
    ).csv(path)


REGISTRY.update(
    {
        "q_repetition_signals": q_repetition_signals,
        "q_pivot_event_types": q_pivot_event_types,
        "q_stream_dedup": q_stream_dedup,
        "q_scan_csv_roundtrip": q_scan_csv_roundtrip,
    }
)


def q_ship_priority(spark, sf_dir):
    """TPC-H Q3-style shipping priority: segment-filtered customers
    broadcast into orders, orders x lineitem joined on the order key,
    one grouped aggregation, top 10 by revenue via TakeOrderedAndProject
    (no global sort).

    The join strategy is deliberately left to Catalyst/AQE: at test
    scale the date-filtered lineitem side fits the broadcast threshold
    and the plan is exchange-free; at 100 TB the same code becomes a
    sort-merge join keyed by orderkey with both date filters already
    pushed to the parquet scans."""
    cutoff = "1998-06-01"
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).join(
        li, orders.o_orderkey == li.l_orderkey
    )
    grouped = j.groupBy("o_orderkey", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    return grouped.orderBy(F.col("revenue").desc(), "o_orderkey").limit(10)


def q_topn_per_group(spark, sf_dir):
    """Per-group top-N: the 3 highest-value customers inside each market
    segment by total order spend — the standard rank-within-partition
    pattern (aggregate, then row_number over a keyed window).

    Scale: one shuffle on custkey for the aggregate, one on mktsegment
    for the window; segment cardinality is tiny but per-segment rows
    shard by the range-partitioned sort, and N bounds the output."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spend"))
    )
    j = spend.join(cust, spend.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total_spend").desc(), F.col("c_custkey")
    )
    return (
        j.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "rank", "c_custkey", "total_spend")
    )


REGISTRY.update(
    {"q_ship_priority": q_ship_priority, "q_topn_per_group": q_topn_per_group}
)


SAMPLE_RATES = {"de": 100, "en": 25, "es": 50, "fr": 75}  # percent per stratum


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling — per-language keep rates
    applied via a portable content hash gate (hash(doc_id) % 100 <
    rate), the training-data mixing primitive: reproducible across
    runs/engines, unlike rand()-based sample().

    Scale: a pure narrow filter over the scan (zero shuffles); rates
    ride in as a literal CASE, so 100 TB sampling is scan-speed. The
    same gate composes into weighted multi-corpus interleaving."""
    d = _docs(spark, sf_dir)
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lg, F.lit(r))
            for lg, r in sorted(SAMPLE_RATES.items())
        ],
        F.lit(0),
    )
    gate = portable_hash64(F.col("doc_id").cast("string"), salt="sample") % 100
    return d.filter(gate < rate).select("doc_id", "lang", "n_chars")


def q_orc_roundtrip(spark, sf_dir):
    """ORC source/sink coverage: documents written as ORC, read back —
    values must round-trip exactly (columnar format breadth beyond
    parquet/JSON/CSV/text; same parallel executor-side write path)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    path = _tempfile.mkdtemp(prefix="pmr_orc_") + "/docs"
    d.write.mode("overwrite").orc(path)
    return spark.read.schema("doc_id bigint, lang string, n_chars bigint").orc(path)


REGISTRY.update(
    {"q_stratified_sample": q_stratified_sample, "q_orc_roundtrip": q_orc_roundtrip}
)


from .operators import ranking as rank_ops             # noqa: E402

BM25_QUERY_TERMS = ["join", "hash", "stream"]          # fixed retrieval query
BLOCKLIST = ["error", "slow"]                          # curation blocklist


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 terms per document by smoothed TF-IDF (lexical corpus
    search layer). Term stats are grouped aggregates; corpus-size and
    document-frequency scalars join back via broadcast — no count-over-
    unpartitioned-window anywhere, so the plan scales: two uniform
    hash shuffles ((doc,term) then term) plus one doc_id-partitioned
    rank window."""
    return rank_ops.tfidf_top_terms(_docs(spark, sf_dir))


def q_bm25_search(spark, sf_dir):
    """BM25 top-10 documents for a fixed query-term set. The word
    explosion is filtered to the query vocabulary BEFORE the first
    shuffle — exchanged volume is proportional to query hits, not
    corpus size; dl/avgdl ride along as broadcast joins; final top-k is
    TakeOrderedAndProject (no global sort)."""
    return rank_ops.bm25_search(_docs(spark, sf_dir), BM25_QUERY_TERMS)


def q_blocklist_filter(spark, sf_dir):
    """Blocklist gate: drop documents containing any blocklisted word —
    array-local `exists`, fused into the scan, zero shuffles."""
    return ts_ops.blocklist_filter(_docs(spark, sf_dir), BLOCKLIST)


def q_sentence_dedup(spark, sf_dir):
    """C4-style within-corpus sentence dedup: a sentence survives only
    at its first corpus-order occurrence; returns per-document retention
    counts. One uniform hash-keyed shuffle for first-occurrence
    selection + one narrow per-doc rollup."""
    return dedup_ops.sentence_dedup(_docs(spark, sf_dir))


REGISTRY.update(
    {
        "q_tfidf_top_terms": q_tfidf_top_terms,
        "q_bm25_search": q_bm25_search,
        "q_blocklist_filter": q_blocklist_filter,
        "q_sentence_dedup": q_sentence_dedup,
    }
)


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-style local-supplier volume, written as SQL TEXT against
    registered temp views — exercising the spark.sql() entry path (same
    Catalyst plan space as the DataFrame API; the 6-way join reorders
    under CBO/AQE, dims broadcast, date filter pushes to the orders
    scan). The c_nationkey = s_nationkey predicate makes it a genuine
    multi-way join, not a star lookup."""
    from .sources.tables import register_views

    register_views(
        spark, sf_dir,
        ["customer", "orders", "lineitem", "supplier", "nation", "region"],
    )
    return spark.sql(
        """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        GROUP BY n_name
        """
    )


def q_unigram_lm_score(spark, sf_dir):
    """Unigram language-model surprisal per document — the SQL-checkable
    analog of a perplexity quality gate: score = -sum(tf·ln(p))/n where
    p = corpus_tf/total_tokens.

    The corpus unigram frequency is a sum window OVER the term partition
    of the (doc, term) aggregate — a re-aggregation joined back would
    re-explode the corpus (exchanges with different keys can't be
    reused). Total tokens comes from a narrow word-count scan (no
    explode), broadcast in. Net: ONE explode pass, three exchanges."""
    d = _docs(spark, sf_dir)
    tc = rank_ops.term_counts(d)
    wt = Window.partitionBy("term")
    tot = d.agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("total_tokens")
    )
    scored = (
        tc.withColumn("ctf", F.sum("tf").over(wt))
        .crossJoin(F.broadcast(tot))
        .withColumn("surprisal", -F.col("tf") * F.log(F.col("ctf") / F.col("total_tokens")))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(F.sum("surprisal") / F.sum("tf"), 6).alias("avg_surprisal"),
    )


REGISTRY.update(
    {
        "q_local_supplier_volume": q_local_supplier_volume,
        "q_unigram_lm_score": q_unigram_lm_score,
    }
)


def q_stream_static_enrich(spark, sf_dir):
    """Stream-static enrichment: streaming events joined per micro-batch
    to the broadcast customer dimension (no state store, no watermark —
    inner equi-join output is final per batch). Streamed result equals
    the batch join; sql-checked against it."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return stream_ops.stream_static_enrich(spark, ev, cust)


def q_json_extract(spark, sf_dir):
    """JSON path extraction (engine JSON-function surface beyond the
    reference's whole-object (de)serialization): serialize each document
    row to a JSON string, then pull typed fields back out with
    get_json_object — the scan-side shred pattern for semi-structured
    columns. Narrow projection, zero shuffles."""
    d = _docs(spark, sf_dir)
    js = d.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "n_chars")).alias("payload"),
    )
    return js.select(
        "doc_id",
        F.get_json_object("payload", "$.lang").alias("lang"),
        F.get_json_object("payload", "$.n_chars").cast("bigint").alias("n_chars"),
    )


REGISTRY.update(
    {
        "q_stream_static_enrich": q_stream_static_enrich,
        "q_json_extract": q_json_extract,
    }
)


HYBRID_QUERY_TEXT = "join hash stream"


def _standin_embed(text_col):
    """The deterministic stand-in encoder of q_embed_documents as a
    reusable expression (hash-derived vector, rounded per dim)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(EMBED_DIM - 1)),
        lambda i: F.round(
            (portable_hash64(F.concat(text_col, i.cast("string"))) % 10000) / 10000.0, 6
        ),
    )


def q_hybrid_search(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical candidate generation (top-20) →
    embedding-cosine rerank (top-5) against the stand-in-encoded query
    string — the two-stage search shape of production RAG/curation
    stacks (cheap wide recall, expensive narrow precision).

    Scale shape: stage 1 is the BM25 pipeline (query-vocab filter before
    any shuffle); stage 2 BROADCASTS the 20-row candidate set back into
    the documents scan, so reranking never shuffles the corpus — cost is
    one more scan-side projection over candidate rows only."""
    from .operators.similarity import cosine

    docs = _docs(spark, sf_dir)
    cand = rank_ops.bm25_search(docs, BM25_QUERY_TERMS, top_n=20)
    qv = _standin_embed(F.lit(HYBRID_QUERY_TEXT))
    scored = (
        docs.join(F.broadcast(cand), "doc_id")
        .withColumn("dv", _standin_embed(F.col("text")))
        .select(
            "doc_id",
            "bm25",
            F.round(cosine(qv, F.col("dv")), 6).alias("cos_sim"),
        )
    )
    # rank within a constant partition key: the input is the 20-row
    # broadcast candidate set, so a single-partition window is the intended
    # bound — the literal key documents that and silences the global-window
    # warning Spark would otherwise emit on every run.
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("cos_sim").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
    )


REGISTRY.update({"q_hybrid_search": q_hybrid_search})


def q_value_percentiles(spark, sf_dir):
    """Exact percentiles (median / p95) of event value per event type —
    `percentile` with linear interpolation, matching DuckDB's
    quantile_cont. Exact percentiles sort within each group post-shuffle;
    the sketch-based scale path for wide groups is q_sketch_stats
    (approx_percentile), this is the exact complement."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.count("*").cast("bigint").alias("n"),
    )


def q_event_interarrival(spark, sf_dir):
    """Per-user inter-arrival gap statistics via lag(): mean/max gap in
    MICROSECONDS (exact integers — unix_timestamp would truncate
    sub-second precision) and burst count (gaps under 60 s). One shuffle
    keyed by user_id; the window sort rides the same exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    gaps = ev.withColumn("gap_us", gap).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        # sum/count of exact int64, reported in seconds: at the µs
        # magnitude (~1e10) a 6-decimal round exceeds double precision
        # and engine round() implementations disagree at the last ulp
        F.round(F.sum("gap_us") / F.count("*") / 1e6, 6).alias("mean_gap_s"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.sum(F.when(F.col("gap_us") < 60_000_000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bursts"),
    )


REGISTRY.update(
    {
        "q_value_percentiles": q_value_percentiles,
        "q_event_interarrival": q_event_interarrival,
    }
)


INCR_SPLIT_DATE = "1998-06-01"


def q_incremental_rollup(spark, sf_dir):
    """§2.13 partial recomputation as a query surface: a per-user rollup
    initialized on the pre-split events, then maintained by merging ONLY
    the post-split delta's partial aggregates — the base is never
    rescanned (the engine analog of the reference's partial KV update,
    modeling_llama.py:860-869 / cache_utils.py:99-112). The maintained
    view must equal the full recompute, which is exactly what the oracle
    checks."""
    from .plans.incremental import IncrementalAggregate

    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("ts") < INCR_SPLIT_DATE)
    delta = ev.filter(F.col("ts") >= INCR_SPLIT_DATE)
    inc = IncrementalAggregate(
        "user_id", {"total_value": ("sum", "value"), "n_events": ("count", "value")}
    )
    inc.initialize(base)
    inc.apply_delta(delta)
    out = inc.result().select(
        "user_id",
        F.round("total_value", 6).alias("total_value"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )
    return out


REGISTRY.update({"q_incremental_rollup": q_incremental_rollup})


PACK_BUDGET = 256  # tokens per packed training sequence


def q_pack_sequences(spark, sf_dir):
    """Sequence packing for LLM training: greedily assign documents to
    fixed-token-budget packs, in deterministic (lang, doc_id) order —
    pack_id = floor(start_offset / budget) where start_offset is the
    running token count before the doc.

    Scale shape: packing runs WITHIN each lang partition (the window
    key), so no global single-partition cumulative scan exists; at
    100 TB the partition key becomes (lang, shard) and packs stay
    shard-local by construction. One exchange keyed by lang."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    packed = toks.withColumn(
        "start_off",
        F.coalesce(
            F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn("pack_id", F.floor(F.col("start_off") / PACK_BUDGET).cast("bigint"))
    return packed.groupBy("lang", "pack_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


REGISTRY.update({"q_pack_sequences": q_pack_sequences})


CURATION_QUALITY_MIN = 0.40  # keeps ~40% of fixture docs (gate must bite)
CURATION_JACCARD_MIN = 0.5   # near-dup drop threshold on exact Jaccard


def q_curation_pipeline(spark, sf_dir):
    """The end-to-end training-data curation pipeline as ONE composed
    plan — the engine's north-star user journey: scan → quality gate →
    minhash near-dup drop → sentence-level dedup → sequence packing.

    Stage composition (each reuses the operators the standalone queries
    pin, sharing one documents scan on the heavy path):
    1. GATE: quality_features in the scan projection, filter
       quality_score >= CURATION_QUALITY_MIN. Cheap narrow filter FIRST,
       so the expensive shingle explosion below only sees survivors.
    2. NEAR-DUP DROP: minhash signatures + LSH banding + exact Jaccard
       (same single-aggregation path as q_dedup_minhash_pairs) on gated
       docs; for every verified pair (jaccard >= CURATION_JACCARD_MIN)
       the larger doc_id is dropped (greedy keep-first — pairwise, not
       transitive closure: a doc is dropped iff it directly pairs with a
       smaller doc_id; the cluster minimum always survives).
    3. SENTENCE DEDUP: C4-style first-occurrence sentence retention over
       the surviving docs (same key/window as q_sentence_dedup), keeping
       per-doc KEPT-token counts — later copies of a sentence contribute
       no tokens.
    4. PACK: greedy fixed-budget packing of kept tokens per lang in
       deterministic doc_id order (same closed form as q_pack_sequences).

    Scale shape: the gate is narrow; the minhash path is the documented
    banding/bucket pipeline (no all-pairs); the anti-join's right side is
    the drop list (pairs that verified), orders of magnitude smaller than
    the corpus; sentence dedup shuffles once on the uniform sentence
    hash; packing windows within lang partitions. No stage materializes
    to the driver.
    """
    d = _docs(spark, sf_dir)
    feats = ts_ops.quality_features(d, keep_cols=("doc_id", "lang", "text"))
    # persist the gate output: it feeds the minhash path AND the
    # anti-join left side — one filtered pass over the corpus instead of
    # two re-scans (at 100 TB this is the staged intermediate a real
    # pipeline writes between gate and dedup)
    gated = (
        feats.filter(F.col("quality_score") >= CURATION_QUALITY_MIN)
        .select("doc_id", "lang", "text")
        .persist()
    )

    combined = dedup_ops.minhash_with_sets(
        dedup_ops.shingle_rows(chunking.split_words(gated)), MINHASH_N
    ).persist()
    pairs = dedup_ops.lsh_candidate_pairs(combined, MINHASH_N, MINHASH_BANDS)
    jacc = dedup_ops.jaccard_pairs(combined.select("doc_id", "shingles"), pairs)
    drop = (
        jacc.filter(F.col("jaccard") >= CURATION_JACCARD_MIN)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    surv = gated.join(drop, "doc_id", "left_anti")

    # sentence split inline (split_sentences shape + lang carried through
    # the explode, so the post-rollup pack needs no lang restore-join)
    marked = F.regexp_replace(F.col("text"), r"([.!?])\s+", "$1" + chunking._SENT_MARK)
    sents = surv.select(
        "doc_id", "lang",
        F.posexplode(F.split(marked, chunking._SENT_MARK)).alias("sent_pos", "sentence"),
    ).filter(F.length("sentence") > 0)
    keyed = sents.select(
        "doc_id", "lang", "sent_pos",
        F.size(F.split(F.col("sentence"), " ")).alias("sent_tok"),
        F.md5(normalize_text(F.col("sentence"))).alias("sent_key"),
    )
    wf = Window.partitionBy("sent_key").orderBy("doc_id", "sent_pos")
    flagged = keyed.withColumn(
        "is_first", (F.row_number().over(wf) == 1).cast("int")
    )
    kept = flagged.groupBy("doc_id", "lang").agg(
        F.sum(F.col("is_first") * F.col("sent_tok")).alias("n_tok")
    )

    wp = Window.partitionBy("lang").orderBy("doc_id")
    packed = kept.withColumn(
        "start_off",
        F.coalesce(
            F.sum("n_tok").over(wp.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn("pack_id", F.floor(F.col("start_off") / PACK_BUDGET).cast("bigint"))
    return packed.groupBy("lang", "pack_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


REGISTRY.update({"q_curation_pipeline": q_curation_pipeline})


def q_html_strip(spark, sf_dir):
    """Markup stripping (the WET-extraction stage of a web-corpus
    pipeline): documents are deterministically wrapped in synthetic
    tags, then the extractor removes markup, unescapes entities, and
    collapses whitespace. Zero-shuffle narrow projection; the wrap step
    stands in for raw crawl HTML so the strip semantics are
    value-checkable."""
    d = _docs(spark, sf_dir)
    html = F.concat(
        F.lit("<html><body><p class=\"c\">"),
        F.regexp_replace(F.col("text"), " ", "&nbsp;"),
        F.lit("</p><br/></body></html>"),
    )
    stripped = F.regexp_replace(html, "<[^>]+>", " ")
    unescaped = F.regexp_replace(stripped, "&nbsp;", " ")
    clean = F.trim(F.regexp_replace(unescaped, "\\s+", " "))
    return d.select(
        "doc_id",
        F.length(html).cast("bigint").alias("html_len"),
        F.length(clean).cast("bigint").alias("clean_len"),
        (clean == F.col("text")).cast("int").alias("roundtrip_ok"),
    )


REGISTRY.update({"q_html_strip": q_html_strip})


def q_pii_redact(spark, sf_dir):
    """PII scrubbing (the redaction stage of a web-corpus pipeline):
    deterministic synthetic PII (email / phone / IPv4 — fixtures carry
    none) is injected per doc_id residue, then the scrubber replaces
    each class with a typed placeholder and reports per-class counts.

    Zero-shuffle narrow projection — at 100 TB this is a scan-fused
    regexp pass, the cheapest possible shape. The injection stands in
    for raw crawl text exactly like q_html_strip's synthetic markup, so
    redaction semantics stay value-checkable against the oracle.
    """
    d = _docs(spark, sf_dir)
    dirty = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(" contact me at user.name@example.com now"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" call 555-123-4567 or 555-987-6543"))
        .when(F.col("doc_id") % 4 == 2, F.lit(" server at 192.168.1.77 responded"))
        .otherwise(F.lit("")),
    )
    email_re = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
    phone_re = r"\b\d{3}-\d{3}-\d{4}\b"
    ip_re = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    step1 = F.regexp_replace(dirty, email_re, "[EMAIL]")
    step2 = F.regexp_replace(step1, phone_re, "[PHONE]")
    clean = F.regexp_replace(step2, ip_re, "[IP]")
    return d.select(
        "doc_id",
        F.coalesce(F.size(F.regexp_extract_all(dirty, F.lit(email_re), F.lit(0))), F.lit(0))
        .cast("bigint").alias("n_emails"),
        F.coalesce(F.size(F.regexp_extract_all(dirty, F.lit(phone_re), F.lit(0))), F.lit(0))
        .cast("bigint").alias("n_phones"),
        F.coalesce(F.size(F.regexp_extract_all(step2, F.lit(ip_re), F.lit(0))), F.lit(0))
        .cast("bigint").alias("n_ips"),
        F.length(clean).cast("bigint").alias("clean_len"),
        (F.instr(clean, "@") == 0).cast("int").alias("no_email_left"),
    )


DECONTAM_NGRAM = 5


def q_decontaminate(spark, sf_dir):
    """Train/test decontamination (GPT-3/The-Pile style): flag every
    training document sharing any {DECONTAM_NGRAM}-gram with the held-out
    benchmark set (stand-in: docs with doc_id % 17 == 0).

    Shape: 5-gram shingles on BOTH sides via the same codegen window
    pipeline as minhash (explode → lead() grams → hash to int64), then
    an equi-join on the uniform gram hash and a per-doc rollup. At
    100 TB the benchmark side is tiny (eval suites), so the join
    broadcasts; candidate work is proportional to true collisions —
    never a cross product. Output: per contaminated train doc, how many
    distinct benchmark grams hit and with how many benchmark docs it
    collides.
    """
    d = _docs(spark, sf_dir)
    is_bench = F.col("doc_id") % 17 == 0
    grams = dedup_ops.shingle_rows(
        chunking.split_words(d), n=DECONTAM_NGRAM
    ).select("doc_id", portable_hash64("shingle").alias("g"))
    bench = grams.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), "g"
    ).distinct()
    train = grams.filter(~is_bench).distinct()
    hits = train.join(F.broadcast(bench), "g")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("g").cast("bigint").alias("n_contaminated_grams"),
        F.countDistinct("bench_id").cast("bigint").alias("n_bench_docs_hit"),
    )


REGISTRY.update({"q_pii_redact": q_pii_redact, "q_decontaminate": q_decontaminate})


def q_corpus_mix(spark, sf_dir):
    """Domain-mixture control (the "data mixing weights" primitive of
    LLM corpus assembly): each source gets a target keep-fraction
    (residue-derived here: src%3 → 100/50/25 percent), applied via the
    deterministic hash gate, with a per-source realized-vs-target
    report — the audit artifact a mixing run ships with.

    Scale: the gate is a narrow scan-fused filter (same idiom as
    q_stratified_sample, different stratum axis); the report is ONE
    groupBy(source). Changing the mixture = changing literals — no data
    movement beyond the one report aggregation.
    """
    d = _docs(spark, sf_dir)
    srcnum = F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int")
    target = (
        F.when(srcnum % 3 == 0, 100).when(srcnum % 3 == 1, 50).otherwise(25)
    )
    gate = portable_hash64(F.col("doc_id").cast("string"), salt="mix") % 100
    kept = d.select(
        "source",
        target.alias("target_pct"),
        (gate < target).cast("int").alias("keep"),
    )
    return kept.groupBy("source", "target_pct").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        F.round(F.sum("keep") / F.count("*"), 6).alias("realized_frac"),
    )


QUANT_SCALE = 127.0


def q_quantize_embeddings(spark, sf_dir):
    """Int8 embedding quantization (the storage/serving compression every
    vector index applies before ANN): per-vector symmetric scale
    s = max|x|/127, dims quantized to round(x/s), plus reconstruction
    error stats — max abs error must stay ≤ s/2 by construction.

    Narrow zero-shuffle projection: quantization is per-row arithmetic
    over the array column, entirely inside the scan stage — dim-unrolled
    (EMBED_DIM is schema-known) so the whole pass stays in whole-stage
    codegen rather than interpreted array HOFs, same as the similarity
    hot path. At 100 TB this is the prep pass that shrinks the vector
    column 4× before the IVF/LSH index build reads it.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dim = sim_ops.EMBED_DIM
    v = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", v.alias("v"))
    amax = F.greatest(*[F.abs(F.col("v")[d]) for d in range(dim)])
    staged = base.select("vec_id", "v", (amax / F.lit(QUANT_SCALE)).alias("s"))
    qd = [F.round(F.col("v")[d] / F.col("s")).cast("int") for d in range(dim)]
    errd = [
        F.abs(F.col("v")[d] - qd[d] * F.col("s")) for d in range(dim)
    ]
    return staged.select(
        "vec_id",
        F.round(F.col("s"), 6).alias("scale"),
        F.greatest(*qd).alias("q_max"),
        F.least(*qd).alias("q_min"),
        F.round(F.greatest(*errd), 6).alias("max_abs_err"),
    )


REGISTRY.update(
    {"q_corpus_mix": q_corpus_mix, "q_quantize_embeddings": q_quantize_embeddings}
)


VOCAB_TOP = 1000


def q_vocab_oov(spark, sf_dir):
    """Vocabulary induction + out-of-vocabulary rate (tokenizer prep):
    induce the top-{VOCAB_TOP} corpus vocabulary by frequency
    (deterministic tie-break: count desc, then word), then report each
    document's OOV word rate against it.

    Scale shape: pass 1 is a uniform-key word-count aggregation plus a
    top-V selection (TakeOrdered — V is small and rides to the driver
    like any model state); pass 2 re-joins the tiny vocabulary
    broadcast-side and rolls up per doc. The corpus-sized exchanges are
    the two word aggregations; the vocabulary never shuffles.
    """
    words = _words(spark, sf_dir).select("doc_id", "word")
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("word").asc())
        .limit(VOCAB_TOP)
        .select("word")
    )
    flagged = words.join(
        F.broadcast(vocab.withColumn("in_v", F.lit(1))), "word", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0)) / F.count("*"), 6
        ).alias("oov_rate"),
    )


REGISTRY.update({"q_vocab_oov": q_vocab_oov})


def q_event_anomaly(spark, sf_dir):
    """Per-user event anomaly detection: z-score of each event's value
    against the TRAILING window of its user's previous 10 events
    (monitoring/alerting shape — the trailing frame means new events
    never rewrite old scores, so the query is incrementally maintainable).

    One exchange (user_id window); anomalies = |z| > 2 with a sample-std
    denominator, rows with an undefined baseline (fewer than 2 prior
    events or zero variance) are excluded deterministically.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    scored = ev.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev("value").over(w).alias("sd"),
    ).filter(F.col("sd").isNotNull() & (F.col("sd") > 0))
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return scored.select(
        "user_id",
        "event_id",
        F.round(z, 6).alias("z"),
        (F.abs(z) > 2).cast("int").alias("is_anomaly"),
    )


REGISTRY.update({"q_event_anomaly": q_event_anomaly})


def q_similarity_ivf_sampled(spark, sf_dir):
    """IVF with the sampled-training path ON (train_fraction=0.5, the
    deterministic md5 hash gate): the 100 TB configuration, where the
    coarse quantizer trains on a corpus sample while assignment and
    probing stay full passes. Fully hash-checked — the sample, and thus
    the quantizer, is bit-reproducible cross-engine."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim_ops.ivf_topk(
        emb, n_queries=8, k=5, n_clusters=8, nprobe=3, train_fraction=0.5
    )


REGISTRY.update({"q_similarity_ivf_sampled": q_similarity_ivf_sampled})


def q_resample_ffill(spark, sf_dir):
    """Time-series resampling with forward fill: regularize each user's
    event stream onto an hourly grid (per-user min..max span), averaging
    in-hour values and carrying the last observation forward across
    gaps — the gap-fill shape of monitoring/feature pipelines.

    Shape: the grid is generated per user with sequence()+explode (no
    driver-side date loop), hourly means aggregate once, and the fill is
    a running last(ignorenulls) window — one exchange keyed by user_id
    serves the join, the window, and the grid generation's groupBy.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour"),
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        F.unix_timestamp("hour").cast("bigint").alias("hour_ts"),
        F.round(F.last("v", ignorenulls=True).over(w), 6).alias("value_ffill"),
        F.col("v").isNull().cast("int").alias("was_gap"),
    )


REGISTRY.update({"q_resample_ffill": q_resample_ffill})


def q_embedding_centroids(spark, sf_dir):
    """Per-label embedding centroids (the building block of IVF training
    and cluster-based curation): posexplode the vectors, average per
    (label, dim), reassemble in dim order. Two exchanges — (label, dim)
    partial-agg then label reassembly; vector width is a constant, so
    exchanged volume is rows x dim regardless of corpus size.

    Output is the centroid's checksum + first component (same
    float-array-hash-free convention as q_embed_documents)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("dim", "x")
    )
    per_dim = dims.groupBy("label", "dim").agg(
        F.sum(F.col("x").cast("double")).alias("sx"),
        F.count("*").alias("n"),
    )
    cent = per_dim.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct("dim", (F.col("sx") / F.col("n")).alias("m")))
        ).alias("dims"),
        F.max("n").cast("bigint").alias("n_vectors"),
    )
    mean_vec = F.transform("dims", lambda s: s["m"])
    return cent.select(
        "label",
        "n_vectors",
        F.size("dims").cast("int").alias("dim"),
        F.round(F.aggregate(mean_vec, F.lit(0.0), lambda a, x: a + x), 6).alias("centroid_sum"),
        F.round(F.element_at(mean_vec, 1), 6).alias("centroid_0"),
    )


REGISTRY.update({"q_embedding_centroids": q_embedding_centroids})


QUALITY_QUOTA = 20  # docs kept per language


def q_quality_topn_per_lang(spark, sf_dir):
    """Curation selection: keep the top-N documents per language by the
    composite quality score (the final 'what do we train on' step after
    dedup + filtering). Rank window rides the per-lang partition; ties
    break on doc_id so selection is reproducible across engines/runs."""
    feats = ts_ops.quality_features(_docs(spark, sf_dir)).join(
        _docs(spark, sf_dir).select("doc_id", "lang"), "doc_id"
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    return (
        feats.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= QUALITY_QUOTA)
        .select("lang", "rnk", "doc_id", "quality_score")
    )


REGISTRY.update({"q_quality_topn_per_lang": q_quality_topn_per_lang})


CACHE_BUDGET_FRAC = 0.3  # memory-tier budget as a fraction of total stage size


def q_cache_fetch_or_compute(spark, sf_dir):
    """K1-K5 query surface: fetch-or-compute of per-stage chunk
    intermediates through the tiered CacheManager (the Spark analog of
    kv_store/kv_loading_interface.py:28-126 add_kv/fetch_kv).

    Two passes over the NUM_STEPS stage keys: pass 1 misses every key,
    computes the stage lineage and persists it at the tier chosen by the
    size-aware policy (exact token counts as the size units; running
    total <= budget -> memory, stage fits alone -> memory_disk, else
    disk); pass 2 hits every key and reuses the persisted lineage. The
    returned rows carry the manager's RECORDED decisions (tier per key,
    hit/miss counts) plus a per-stage aggregate computed THROUGH the
    cached lineages — the oracle recomputes the same policy relationally,
    so a wrong tier choice, a double-compute, or a dropped hit all
    hash-mismatch.

    Scale: stage sizing is one tiny aggregate (NUM_STEPS rows to the
    driver — model state, like any cache directory); the cached data
    itself shards across executor block managers via persist().
    """
    from .plans.cache import CacheManager, TIERS

    mapped = mapstage.llm_map(_chunks(spark, sf_dir))
    sizes = {
        r["chunk_id"]: r["toks"]
        for r in mapped.groupBy("chunk_id")
        .agg(F.sum("n_out_tokens").alias("toks"))
        .collect()
    }
    total = sum(sizes.values())
    budget = int(CACHE_BUDGET_FRAC * total)

    mgr = CacheManager()
    stats: dict[int, dict] = {}
    cum = 0
    for _pass in range(2):
        for cid in sorted(sizes):
            key = _hashlib_sha256(f"stage:{cid}")
            rec = stats.setdefault(cid, {"key8": key[:8], "hit": 0, "miss": 0})
            if mgr.fetch(key) is None:
                rec["miss"] += 1
                cum += sizes[cid]
                tier = (
                    "memory"
                    if cum <= budget
                    else ("memory_disk" if sizes[cid] <= budget else "disk")
                )
                assert tier in TIERS
                mgr.add(key, mapped.filter(F.col("chunk_id") == cid), tier=tier)
                rec["tier"] = tier
            else:
                rec["hit"] += 1

    # data plane: aggregate THROUGH the cached lineages
    cached = [mgr.fetch(_hashlib_sha256(f"stage:{cid}")) for cid in sorted(sizes)]
    union = cached[0]
    for c in cached[1:]:
        union = union.unionByName(c)
    through_cache = union.groupBy("chunk_id").agg(
        F.sum("n_out_tokens").cast("bigint").alias("stage_tokens")
    )

    protocol = spark.createDataFrame(
        [
            (cid, s["key8"], s["tier"], s["miss"], s["hit"])
            for cid, s in sorted(stats.items())
        ],
        "chunk_id int, key8 string, tier string, n_miss bigint, n_hit bigint",
    )
    return through_cache.join(protocol, "chunk_id")


def _hashlib_sha256(s: str) -> str:
    import hashlib

    return hashlib.sha256(s.encode("utf-8")).hexdigest()


REGISTRY.update({"q_cache_fetch_or_compute": q_cache_fetch_or_compute})
