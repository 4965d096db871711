"""Mergeable sketch operators: portable approximate aggregates.

Engine-native sketches (HyperLogLog, GK/t-digest) are fast but their
values depend on implementation internals, so results can't be
hash-verified across engines. These operators trade a constant factor
for PORTABILITY: md5-based KMV for distinct counts and exact integer
histogram bins for quantiles — bit-identical in any engine that can
hash and count, while keeping the constant-memory, mergeable shape that
matters at 100 TB.

Used by queries.q_sketch_stats (driver-gate hash-checked); accuracy vs
exact aggregates is pinned by tests/test_skew_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmv_distinct(
    hashed: DataFrame, group_col: str, hash_col: str, k: int,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate distinct count per group from uniform 32-bit hashes.

    KMV estimator: with h uniform on [0, 2^32), E[k-th min] ≈ k/|S|·2^32
    → |S| ≈ (k-1)·2^32 / h_(k); groups with fewer than k distinct hashes
    answer exactly.

    Two-level min-k (the actual KMV merge shape): rank hashes within
    each (physical partition, group) and keep the k smallest, so no task
    ever sorts more than one partition's values; then re-rank only the
    surviving <= k·P candidates per group. The final values are
    identical to a global per-group rank:
      - the global k-th minimum always survives the per-partition cut
        (it is at worst the k-th smallest of its own partition), and
      - the exact-count branch fires iff no partition truncated, in
        which case the candidate set IS the full distinct set.
    spark_partition_id() is only a locality label — any partitioning
    (including AQE-coalesced) yields the same answer. At cluster scale,
    extend to a tree merge with a middle level keyed on pid % fan_in.

    `hashed` must hold DISTINCT (group, hash) rows (apply .distinct()
    upstream — that shuffle is uniform-keyed and scales).
    """
    loc = hashed.withColumn("pid", F.spark_partition_id())
    local_k = loc.withColumn(
        "lrn",
        F.row_number().over(Window.partitionBy("pid", group_col).orderBy(hash_col)),
    ).filter(F.col("lrn") <= k)
    cand = local_k.withColumn(
        "rn", F.row_number().over(Window.partitionBy(group_col).orderBy(hash_col))
    )
    return cand.groupBy(group_col).agg(
        F.max("rn").alias("n_distinct"),
        F.max(F.when(F.col("rn") == k, F.col(hash_col))).alias("kth"),
    ).select(
        group_col,
        F.when(F.col("n_distinct") < k, F.col("n_distinct"))
        .otherwise(
            # greatest(kth, 1): hash value 0 CAN be the k-th minimum
            # (p ≈ k/2^32 per group, a certainty over 100 TB of groups)
            # and Spark 4 runs ANSI mode, where the bare division THROWS
            # instead of nulling — found by the property test's
            # rows=[(0, 0)], k=1 example. Clamping to 1 changes the
            # estimate only in that degenerate cell (where any answer
            # within the estimator's error is defensible); the oracle
            # mirrors the same clamp.
            F.floor(
                (k - 1) * F.lit(float(2**32)) / F.greatest(F.col("kth"), F.lit(1))
                + 0.5
            )
        )
        .cast("bigint")
        .alias(out_col),
    )


def histogram_quantiles(
    df: DataFrame, group_col: str, value_col: str, bins: int,
    probs: list[float] = (0.25, 0.50, 0.75),
    out_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate quantiles per group via equi-width integer histogram.

    Reports the lower bound of the bin where the cumulative count
    crosses p·n (bin width = range/bins). Exact integer bin counts →
    cross-engine deterministic; the per-group state is `bins` counters
    (mergeable by addition). The cumulative window runs over ≤ `bins`
    rows per group — bounded regardless of data size.

    NULL values are excluded BEFORE counting: a null can't land in any
    bin, so counting it in n would shift every quantile, and the
    resulting NULL bin row would make the cumulative window order
    engine-dependent (Spark sorts NULLS FIRST ascending, DuckDB NULLS
    LAST). A group whose values are all null has no quantiles and is
    absent from the output.
    """
    out_cols = out_cols or [f"p{int(p * 100)}" for p in probs]
    vals = df.select(group_col, value_col).filter(F.col(value_col).isNotNull())
    bounds = vals.groupBy(group_col).agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi"),
        F.count("*").alias("n"),
    )
    binned = (
        vals.join(bounds, group_col)
        .select(
            group_col, "lo", "hi", "n",
            F.floor(
                (F.col(value_col) - F.col("lo"))
                * bins
                / (F.col("hi") - F.col("lo") + 1)
            ).cast("int").alias("bin"),
        )
        .groupBy(group_col, "lo", "hi", "n", "bin")
        .agg(F.count("*").alias("c"))
    )
    cum = binned.withColumn(
        "cum", F.sum("c").over(Window.partitionBy(group_col).orderBy("bin"))
    )

    def quantile_bin(p: float):
        # lower bound of the first bin whose cumulative count reaches p·n
        hit = F.when(
            F.col("cum") - F.col("c") < F.lit(p) * F.col("n"), F.col("bin")
        )
        return F.max(hit)

    quart = cum.groupBy(group_col, "lo", "hi").agg(
        *[quantile_bin(p).alias(f"b_{c}") for p, c in zip(probs, out_cols)]
    )

    def bin_lo(b):
        # smallest value v with floor((v-lo)·bins/W) == b is lo+CEIL(b·W/bins):
        # floor() here could return a value whose own bin is b-1 (e.g. W=10,
        # bins=4, b=1 → floor gives 2, but bin(2)=0 while bin 1 starts at 3)
        return (
            F.col("lo")
            + F.ceil(F.col(b) * (F.col("hi") - F.col("lo") + 1) / bins)
        ).cast("bigint")

    return quart.select(
        group_col, *[bin_lo(f"b_{c}").alias(c) for c in out_cols]
    )
