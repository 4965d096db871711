"""Scoring functions (SURVEY §2.6 A5-A7, §2.9 F6-F7).

Set/multiset scores are pure built-in array algebra (oracle-checkable);
BLEU and ROUGE-L are Arrow-batched pandas UDFs (the reference uses NLTK
``sentence_bleu`` with chencherry smoothing and Google's ``rouge_scorer`` —
both re-implemented here as small deterministic pure-Python functions, no
external deps).

Reference parallels:
- token-counter multiset F1: pipeline_70b_samsum.py:83-97 (Counter & Counter).
- set F1: test_proactive.py:110-128; subset accuracy: :130-139.
- BLEU: test_proactive.py:374-376 (smoothed sentence BLEU, max order 4).
- ROUGE-L f-measure: pipeline_70b_samsum.py:77-81.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --- built-in array algebra (SQL-checkable) ---------------------------------


def set_f1(pred_words: Column, gold_words: Column) -> Column:
    """A6: F1 over distinct word sets. 0 when either side is empty."""
    p = F.array_distinct(pred_words)
    g = F.array_distinct(gold_words)
    inter = F.size(F.array_intersect(p, g)).cast("double")
    prec = inter / F.size(p)
    rec = inter / F.size(g)
    return F.round(
        F.when((F.size(p) == 0) | (F.size(g) == 0) | (inter == 0), F.lit(0.0)).otherwise(
            2 * prec * rec / (prec + rec)
        ),
        6,
    )


def subset_accuracy(pred_words: Column, gold_words: Column) -> Column:
    """A7: 1 iff gold word set ⊆ pred word set."""
    return (F.size(F.array_except(F.array_distinct(gold_words), F.array_distinct(pred_words))) == 0).cast("int")


# --- pandas UDFs (rows-checked; property-tested in tests/) ------------------


def _ngrams(tokens: list[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu_score(pred: str, gold: str, max_order: int = 4) -> float:
    """Smoothed sentence BLEU over whitespace tokens (reference:
    nltk sentence_bleu + chencherry method7, test_proactive.py:374-376).
    Here: add-1 smoothing on orders with zero matches (method-1 style),
    deterministic and dependency-free."""
    p_toks, g_toks = pred.split() if pred else [], gold.split() if gold else []
    if not p_toks or not g_toks:
        return 0.0
    # cap order at candidate length so short identical texts score 1.0
    max_order = min(max_order, len(p_toks))
    log_sum = 0.0
    for n in range(1, max_order + 1):
        p_ng, g_ng = _ngrams(p_toks, n), _ngrams(g_toks, n)
        total = max(sum(p_ng.values()), 0)
        if total == 0:
            return 0.0
        overlap = sum(min(c, g_ng[t]) for t, c in p_ng.items())
        if overlap == 0:
            prec = 1.0 / (2 * total)  # smoothing for zero-match orders
        else:
            prec = overlap / total
        log_sum += math.log(prec)
    geo_mean = math.exp(log_sum / max_order)
    bp = 1.0 if len(p_toks) > len(g_toks) else math.exp(1 - len(g_toks) / len(p_toks))
    return bp * geo_mean


def _lcs_len(a: list[str], b: list[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def rouge_l(pred: str, gold: str) -> float:
    """ROUGE-L f-measure over whitespace tokens (pipeline_70b_samsum.py:77-81)."""
    p, g = pred.split() if pred else [], gold.split() if gold else []
    if not p or not g:
        return 0.0
    lcs = _lcs_len(p, g)
    if lcs == 0:
        return 0.0
    prec, rec = lcs / len(p), lcs / len(g)
    return 2 * prec * rec / (prec + rec)


@F.pandas_udf(T.DoubleType())
def bleu_udf(pred: pd.Series, gold: pd.Series) -> pd.Series:
    return pd.Series([round(bleu_score(p or "", g or ""), 6) for p, g in zip(pred, gold)])


@F.pandas_udf(T.DoubleType())
def rouge_l_udf(pred: pd.Series, gold: pd.Series) -> pd.Series:
    return pd.Series([round(rouge_l(p or "", g or ""), 6) for p, g in zip(pred, gold)])
