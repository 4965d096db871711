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
    """C1 chunks of every document (the shared pipeline intermediate)."""
    return chunking.partition_equal(_words(spark, sf_dir), NUM_STEPS)


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
