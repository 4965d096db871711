"""Top-k importance selection (SURVEY §2.7 T1/T2).

Replicates the reference's partial-recompute position selection
(modeling_llama.py:860-869): per group, score every position, keep the
top-k by score (descending, index tiebreak — torch.topk is value-then-
index) PLUS always the last `last_len` positions; k is clamped to
[0, n - last_len].

Expressed as window row_number + positional tail union — pure relational
top-k, no UDF. Scale: rank-within-group via one shuffle on the group key;
for huge groups Spark pushes partial top-k below the exchange when a limit
is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_importance(
    df: DataFrame,
    group_col: str,
    pos_col: str,
    score_col: str,
    ratio: float,
    last_len: int,
) -> DataFrame:
    """Select top-k scored positions per group plus the `last_len` tail.

    k = clamp(int(ratio * n) - 1, 0, n - last_len) per group — int() is
    TRUNCATION (modeling_llama.py:860 `max(int(q_len*top_k_ratio)-1, 0)`,
    861 `min(q_len-last_len, k)`), not round(). The rank pool EXCLUDES
    the tail (modeling_llama.py:863 scores `diff[:-last_len]`): tail rows
    sort after every candidate, so a high-scoring tail position can never
    displace a non-tail candidate from the k slots. Output adds
    `selected` ∈ {'topk','tail'}.
    """
    g = Window.partitionBy(group_col)
    n = F.count("*").over(g)
    scored = df.withColumn("_n", n)
    tail = F.col(pos_col) >= (F.col("_n") - F.lit(last_len))
    rank_w = Window.partitionBy(group_col).orderBy(
        tail.cast("int").asc(), F.col(score_col).desc(), F.col(pos_col).asc()
    )
    k = F.greatest(
        F.lit(0),
        F.least(
            F.floor(F.lit(ratio) * F.col("_n")).cast("long") - 1,
            F.col("_n") - F.lit(last_len),
        ),
    )
    scored = scored.withColumn("_k", k).withColumn("_rn", F.row_number().over(rank_w))
    topk = (F.col("_rn") <= F.col("_k")) & ~tail
    return (
        scored.filter(tail | topk)
        .withColumn("selected", F.when(tail, F.lit("tail")).otherwise(F.lit("topk")))
        .drop("_n", "_k", "_rn")
    )


def order_preserve(df: DataFrame, id_col: str, stage_col: str, pos_col: str) -> DataFrame:
    """T2: assign the global consumption order (stage, pos) per key —
    the ordering invariant of test_order.py / the decode loops."""
    w = Window.partitionBy(id_col).orderBy(stage_col, pos_col)
    return df.withColumn("global_order", F.row_number().over(w).cast("bigint"))
