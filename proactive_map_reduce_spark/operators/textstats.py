"""Text analysis operators for corpus curation (north-star extras).

Language-ID (marker-word heuristic), quality scoring (length / stopword /
repetition features), token counting, and document fingerprinting — each a
pure built-in column pipeline (JVM-side, whole-stage codegen), designed to
run as a single narrow projection over the scan at 100 TB (no shuffle at
all except the optional per-language aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..functions.text import normalize_text

# marker stopwords per language (deterministic heuristic, not a model)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "les", "et", "que"],
    "de": ["der", "die", "das", "und", "ist"],
}

STOPWORDS = ["the", "a", "an", "of", "to", "and", "in", "is", "it", "for"]


def _count_in(ws: Column, vocab: list[str]) -> Column:
    return F.size(F.filter(ws, lambda w: w.isin(vocab)))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker counts.

    Deterministic tie-break: higher count wins, then language code order —
    expressed as a sorted struct array (no UDF).
    """
    ws = F.split(F.lower(F.col(text_col)), " ")
    scores = F.array(
        *[
            F.struct(
                (-_count_in(ws, markers)).alias("neg_score"), F.lit(code).alias("code")
            )
            for code, markers in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_sort(scores).getItem(0)
    return df.withColumn("pred_lang", best["code"]).withColumn(
        "marker_hits", (-best["neg_score"]).cast("bigint")
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features + composite score in [0, 1].

    Features mirror standard corpus filters: document length, mean word
    length, stopword ratio, distinct-word (repetition) ratio.
    """
    ws = F.split(F.col(text_col), " ")
    n_words = F.size(ws)
    avg_word_len = (F.length(F.col(text_col)) - (n_words - 1)) / n_words
    stop_ratio = _count_in(ws, STOPWORDS) / n_words
    distinct_ratio = F.size(F.array_distinct(ws)) / n_words
    length_score = F.least(n_words / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_score + F.lit(0.3) * stop_ratio + F.lit(0.3) * distinct_ratio
    )
    return df.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(avg_word_len, 6).alias("avg_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate
    (ceil(chars/4) — the standard bytes-per-token heuristic)."""
    ws = F.split(F.col(text_col), " ")
    return df.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        F.ceil(F.length(F.col(text_col)) / 4.0).cast("bigint").alias("n_bpe_est"),
    )


def repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition filters (Gopher-style quality signals):
    fraction of bigrams taken by the single most frequent bigram, and
    fraction of trigrams that occur more than once.

    Entirely array-local per row (no shuffle, no explode): at 100 TB this
    is a pure map over the scan. Per-row cost is O(n log n) — equal grams
    are adjacent after an array_sort, so per-gram frequencies are run
    lengths.

    Implementation note: each intermediate array (grams, sorted grams,
    run starts, run lengths) is materialized as a NAMED COLUMN in its own
    projection rather than nested as a sub-expression. Catalyst
    expressions are trees, not DAGs — a sorted-gram array referenced from
    inside a lambda would be *re-sorted per element*, turning this into
    O(n^3). Bound column references are evaluated once per row;
    CollapseProject keeps multi-referenced non-cheap aliases
    materialized, so the chain of selects stays linear.
    """
    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)

    def grams(k: int) -> Column:
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.array_join(F.slice(ws, i + 1, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def run_starts(s: str) -> Column:
        # 0-based indices where a new run of equal values begins; the
        # empty guard matters: sequence(0, -1) is a DESCENDING range in
        # Spark and would drive element_at to index 0 (an ANSI error).
        c = F.col(s)
        return F.when(
            F.size(c) > 0,
            F.filter(
                F.sequence(F.lit(0), F.size(c) - 1),
                lambda i: (i == 0) | (F.element_at(c, i + 1) != F.element_at(c, i)),
            ),
        ).otherwise(F.array().cast("array<int>"))

    def run_lengths(bounds: str) -> Column:
        # bounds = run starts ++ [m]; consecutive differences = lengths
        b = F.col(bounds)
        return F.when(
            F.size(b) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(b) - 2),
                lambda k: (
                    F.element_at(b, k + 2) - F.element_at(b, k + 1)
                ).cast("bigint"),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

    staged = (
        df.select("doc_id", grams(2).alias("g2"), grams(3).alias("g3"))
        .select(
            "doc_id",
            F.size("g2").alias("n2"),
            F.size("g3").alias("n3"),
            F.array_sort("g2").alias("s2"),
            F.array_sort("g3").alias("s3"),
        )
        .select(
            "doc_id", "n2", "n3", run_starts("s2").alias("st2"), run_starts("s3").alias("st3")
        )
        .select(
            "doc_id",
            "n2",
            "n3",
            F.concat("st2", F.array(F.col("n2").cast("int"))).alias("b2"),
            F.concat("st3", F.array(F.col("n3").cast("int"))).alias("b3"),
        )
        .select(
            "doc_id", "n2", "n3", run_lengths("b2").alias("r2"), run_lengths("b3").alias("r3")
        )
    )
    top2 = F.array_max("r2")
    # grams occurring more than once = total length of runs longer than 1
    dup3 = F.aggregate(
        F.filter("r3", lambda l: l > 1), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return staged.select(
        "doc_id",
        F.col("n2").cast("bigint").alias("n_bigrams"),
        F.col("n3").cast("bigint").alias("n_trigrams"),
        F.round(
            F.when(F.col("n2") > 0, top2 / F.col("n2")).otherwise(F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.when(F.col("n3") > 0, dup3 / F.col("n3")).otherwise(F.lit(0.0)), 6
        ).alias("dup_trigram_frac"),
    )


def blocklist_filter(
    df: DataFrame, blocklist: list[str], text_col: str = "text"
) -> DataFrame:
    """Blocklist filtering (the safety/PII gate of a curation pipeline):
    keep only documents containing NO blocklisted word.

    Array-local `exists` over the word array — a pure narrow filter
    fused into the scan (no explode, no join, zero shuffles), which is
    the 100 TB-correct shape: the alternative anti-join against an
    exploded word table would shuffle the whole corpus to remove a few
    rows. The blocklist is a literal in the plan (broadcast-free).
    """
    ws = F.split(F.col(text_col), " ")
    hit = F.exists(ws, lambda w: w.isin(blocklist))
    return df.filter(~hit).select(
        "doc_id", "lang", F.size(ws).cast("bigint").alias("n_words")
    )


def fingerprint(df: DataFrame, text_col: str = "text", gram: int = 5) -> DataFrame:
    """Document fingerprinting: full-content hash + winnowing-style minimum
    over rolling word 5-gram hashes (robust to local edits)."""
    ws = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(ws) - gram, F.lit(0))),
        lambda i: F.array_join(F.slice(ws, i + 1, gram), " "),
    )
    gram_hashes = F.transform(grams, lambda g: portable_hash64(g))
    return df.select(
        "doc_id",
        F.md5(normalize_text(F.col(text_col))).alias("content_md5"),
        F.array_min(gram_hashes).alias("winnow_min"),
        F.array_max(gram_hashes).alias("winnow_max"),
    )
