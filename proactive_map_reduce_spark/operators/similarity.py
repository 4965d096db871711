"""Similarity search over embedding columns (north-star extras).

Brute-force cosine top-k as the correctness baseline, and a sign-bit LSH
bucketed variant as the 100 TB scale path.

Scale design:
- Brute force is O(|Q|·|C|): acceptable only because the query set is
  broadcast (small); candidates stream through one narrow stage — no
  shuffle of the corpus. Ranking shuffles only (query_id, cos) pairs.
- The LSH variant buckets vectors by the sign pattern of their leading
  dimensions (a deterministic random-hyperplane sketch with axis-aligned
  planes): candidate generation becomes an equi-join on bucket id, so the
  per-query work no longer scans the full corpus. Recall is tunable via
  the number of sign bits (fewer bits → bigger buckets → higher recall).

Floats are widened to double before any arithmetic; cosine is rounded to
6 before ranking so both engines rank identical values (ties broken by
vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64


def _as_double(col):
    # Cast, not F.transform: array-to-array Cast is a codegen expression,
    # while transform() is an interpreted higher-order function evaluated
    # per element. float->double widening is exact either way, so the
    # values (and oracle hashes) are identical.
    return col.cast("array<double>")


def cos_expr(dot, norm_prod):
    """dot/(‖a‖·‖b‖) with the zero-norm guard: a zero vector has no
    direction, so its cosine is NULL — exactly what DuckDB's x/0.0
    yields, while Spark under ANSI mode THROWS on any double division
    by zero (found by the --extreme sweep's zero-vector row; zero
    embeddings are routine in practice — padding rows, dead features).
    Null cosines sort last in top-k windows and fail ``>= threshold``
    filters identically on both engines, so every consumer's semantics
    are unchanged for non-degenerate vectors."""
    return F.when(norm_prod != 0, dot / norm_prod)


def cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x * x))
    return cos_expr(dot, na * nb)


# Test-data embedding dimensionality (embeddings.parquet, all SFs). Passed
# as a constant so query construction never fires an eager probe job —
# round 2's `_dim_of` first() probe cost one extra Spark job per plan build.
EMBED_DIM = 64

# Accumulator-chunk width for the unrolled dot/norm sums. Chunked
# accumulation (8 sums of 8, then one 8-term combine) keeps the identical
# term count inside whole-stage codegen but caps expression depth at ~15.
# The chunk association is mirrored verbatim in oracles._cos_sql so both
# engines compute bit-identical IEEE doubles.
#
# Round-4 root cause of the bench gap (supersedes the round-3 "per-action
# constants" theory): a 64-term dot over TWO DISTINCT array operands
# generates a fused doConsume past HotSpot's 8000-bytecode compile limit
# (DontCompileHugeMethods), so the stage ran as interpreted bytecode —
# term-count sweep showed a cliff between 32 and 64 mixed terms (0.12 s →
# 0.33 s) while one-operand 64-term sums (v·v, qv·qv — subexpression
# sharing halves the bytecode) stayed compiled and fast. Fixed globally by
# spark.sql.codegen.hugeMethodLimit=8000 in session._RUNTIME_CONFS: Spark
# now abandons fusion exactly where the JVM would refuse to JIT, and
# per-operator codegen (split methods under the limit) runs compiled.
# Measured interleaved at sf0.1: noop-save 0.57 s → 0.38 s. The remaining
# ~0.3 s over DuckDB's 0.09 s is the two-AQE-stage action floor (~0.22 s
# for a trivial aggregation) plus one serial single-split scan task —
# constants that vanish at real scale and with resident plans.
_CHUNK = 8


def _dim_of(emb: DataFrame, vec_col: str) -> int:
    """Probe the (fixed) vector dimensionality — one 1-row job. Kept only
    as the fallback for callers with non-test data; every registry query
    passes ``dim=EMBED_DIM`` so no probe job runs on the bench path.

    A zero-row (or null-vector) input has no dimensionality; report 0 so
    the callers' empty-input paths produce their documented well-formed
    empty results instead of a TypeError on ``None["d"]``."""
    row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    return 0 if row is None or row["d"] is None else row["d"]


def _chunked_sum(terms):
    """Left-to-right fold of ``terms`` in chunks of ``_CHUNK``: chunk sums
    first (each left-leaning), then one left-leaning combine. SQL's
    left-associative `+` over the same chunk layout parses to the exact
    same tree, so the oracle mirrors this association verbatim."""
    chunks = []
    for c0 in range(0, len(terms), _CHUNK):
        s = terms[c0]
        for t in terms[c0 + 1 : c0 + _CHUNK]:
            s = s + t
        chunks.append(s)
    out = chunks[0]
    for c in chunks[1:]:
        out = out + c
    return out


def _chunked_sum_sql(terms: list[str]) -> str:
    """The same chunk association as ``_chunked_sum``, as ONE SQL string.

    Building a 64-term expression Column-by-Column costs ~200 py4j
    round-trips ≈ 0.7 s of driver time per plan build (measured);
    F.expr() parses the whole tree in a single call. Explicit parens per
    chunk reproduce the fold order exactly, so IEEE results — and oracle
    hashes — are unchanged.
    """
    chunks = [
        "(" + " + ".join(terms[c0 : c0 + _CHUNK]) + ")"
        for c0 in range(0, len(terms), _CHUNK)
    ]
    return "(" + " + ".join(chunks) + ")"


def unrolled_dot(a, b, dim: int):
    """Σ a[d]·b[d] unrolled over a statically-known dim, chunk-accumulated
    (see ``_CHUNK``). The whole expression stays inside whole-stage
    codegen — Spark's array higher-order functions are interpreted, which
    made the HOF cosine the hot-path cost of every similarity query —
    while the shallow tree keeps Catalyst's per-plan constant cost flat.

    Pass column NAMES (str) to build the tree through one F.expr parse
    (fast path); Column args take the py4j-per-term path."""
    if dim <= 0:  # zero-row probe fallback: a well-typed degenerate sum
        return F.lit(0.0)
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_chunked_sum_sql([f"{a}[{d}] * {b}[{d}]" for d in range(dim)]))
    return _chunked_sum([a[d] * b[d] for d in range(dim)])


def unrolled_norm(a, dim: int):
    """‖a‖ with the same chunked fold order as ``unrolled_dot``."""
    if dim <= 0:
        return F.lit(0.0)
    if isinstance(a, str):
        return F.sqrt(
            F.expr(_chunked_sum_sql([f"{a}[{d}] * {a}[{d}]" for d in range(dim)]))
        )
    return F.sqrt(_chunked_sum([a[d] * a[d] for d in range(dim)]))


def brute_force_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 5, id_col: str = "vec_id",
    vec_col: str = "embedding", dim: int | None = None,
    parameterize_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for the first n query vecs.

    Norms are computed ONCE per row (not per query×corpus pair), and
    dot/norm are dim-unrolled codegen expressions built through a single
    F.expr parse — same IEEE values as the HOF form, minus the
    interpreted-eval, the |Q|× norm recomputation, and the per-term py4j
    construction cost.

    With ``parameterize_queries`` (default), the n query vectors are
    fetched at plan-build time (one pushed-filter job over |Q| rows) and
    ride into the plan as literals — exactly how a serving system
    receives query vectors as request parameters, and the same
    model-state pattern as ``ivf_topk``'s centroids. The pair stage is
    then a single narrow projection over ONE corpus scan: no broadcast
    exchange, no second scan. For large query SETS (thousands+, where
    literal plans bloat), pass False to get the broadcast-join form —
    that is the right scale shape when the query side is itself a table.
    """
    dim = _dim_of(emb, vec_col) if dim is None else dim
    base = emb.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nv", unrolled_norm("v", dim))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    if parameterize_queries:
        qrows = (
            base.filter(F.col(id_col) < n_queries)
            .select(id_col, "v", "nv")
            .collect()
        )
        if not qrows:
            # F.array() with zero args is array<null> — explode + struct
            # field access would fail analysis. An empty query set has a
            # well-defined answer: no rows, in the output schema.
            return emb.sparkSession.createDataFrame(
                [],
                "query_id bigint, neighbor_id bigint, cos_sim double, rank int",
            )
        # ONE literal in the plan (r14): the queries ride in as
        # `inline(array(named_struct('query_id', …, 'qv', array(…),
        # 'nq', …)))` — a single foldable Generate input, so (query_id,
        # qv, nq) come out as plain GENERATE ATTRIBUTES. The r13 packed
        # form (three array literals indexed by the explode position)
        # optimized small, but CollapseProject re-inlined the whole
        # |Q|×dim vector literal into EVERY one of the `dim` dot-product
        # terms (`GetArrayItem(literal, qi)` counts as cheap), blowing
        # the physical plan to ~666 KB — the per-action optimizer walk
        # and codegen setup over that tree, not the arithmetic, was the
        # cost. Struct-field extraction over a Generate attribute
        # carries no literal, so the plan stays ~15 KB with IDENTICAL
        # arithmetic (same chunked IEEE association, same doubles — the
        # literals round-trip through repr() exactly like the C4
        # schedule constants). Measured at sf0.1, interleaved same
        # session: 0.343 → 0.221 s median; rows verified identical.
        # Floats ride through repr(); non-finite components (never in a
        # real norm path, but vectors can carry garbage) spell the SQL
        # cast form instead.
        def _d(x: float) -> str:
            import math as _math

            if _math.isnan(x):
                return "CAST('NaN' AS DOUBLE)"
            if _math.isinf(x):
                return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
            return repr(float(x)) + "D"

        structs = ", ".join(
            "named_struct('query_id', {i}L, 'qv', array({vec}), 'nq', {nq})".format(
                i=int(r[id_col]),
                vec=", ".join(_d(x) for x in r["v"]),
                nq=_d(r["nv"]),
            )
            for r in qrows
        )
        scored = (
            base.select(
                id_col, "v", "nv", F.expr(f"inline(array({structs}))")
            )
            .filter(F.col(id_col) != F.col("query_id"))
            .select(
                "query_id",
                F.col(id_col).alias("neighbor_id"),
                F.round(
                    cos_expr(
                        unrolled_dot("qv", "v", dim),
                        F.col("nq") * F.col("nv"),
                    ),
                    6,
                ).alias("cos_sim"),
            )
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
        )
    queries = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cos_expr(unrolled_dot("qv", "v", dim), F.col("nq") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def sign_bucket(vec_col, n_bits: int = 8):
    """Deterministic LSH bucket: sign pattern of the first n_bits dims."""
    return F.aggregate(
        F.zip_with(
            F.slice(vec_col, 1, n_bits),
            F.sequence(F.lit(0), F.lit(n_bits - 1)),
            lambda x, i: F.when(x >= 0, F.pow(F.lit(2.0), i.cast("double"))).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    ).cast("bigint")


def lsh_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 5, n_bits: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding", dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: rank only candidates in the query's sign bucket."""
    dim = _dim_of(emb, vec_col) if dim is None else dim
    base = (
        emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
        .withColumn("bucket", sign_bucket(F.col("v"), n_bits))
        .withColumn("nv", unrolled_norm("v", dim))
    )
    queries = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qb"),
        F.col("nv").alias("nq"),
    )
    scored = (
        base.join(F.broadcast(queries), F.col("bucket") == F.col("qb"))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cos_expr(unrolled_dot("qv", "v", dim), F.col("nq") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(F.col("rank") <= k)


IVF_SCALE = 1_000_000
IVF_ITERS = 5
# Coordinate clamp: the integer L2 squares coordinate DIFFERENCES, so
# dim·(2·C)² < 2^63 bounds |xi| — C = 1.5e8 (component ±150 at the 1e-6
# grid) keeps a 64-dim distance exact with 6× headroom. Un-clamped, one
# garbage 1e30 component saturates floor() to Long.Max and the squared
# difference OVERFLOWS (ANSI throws — found by the --extreme sweep).
# Real embedding components are O(1); the clamp only touches garbage.
IVF_CLAMP = 150_000_000


def _fixed_point(vec_col) -> "F.Column":
    """clamp(floor(x·1e6 + 0.5), ±IVF_CLAMP) per dim: exact int64
    coordinates. All distance math and centroid sums below are integer →
    order-independent and bit-identical across engines (double sums
    would depend on partition reduction order). NaN components quantize
    to 0 (a junk coordinate contributes nothing to the quantizer);
    oracle mirrored in _ivf_sql."""
    return F.transform(
        vec_col,
        lambda x: F.greatest(
            F.least(
                F.floor(F.nanvl(x.cast("double"), F.lit(0.0)) * IVF_SCALE + 0.5),
                F.lit(IVF_CLAMP),
            ),
            F.lit(-IVF_CLAMP),
        ).cast("bigint"),
    )


def _int_l2(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )


def ivf_topk(
    emb: DataFrame, n_queries: int = 8, k: int = 5, n_clusters: int = 8,
    nprobe: int = 3, id_col: str = "vec_id", vec_col: str = "embedding",
    train_fraction: float = 1.0,
) -> DataFrame:
    """IVF approximate top-k: deterministic seeded Lloyd's coarse
    quantizer + probed clusters — hash-checkable cross-engine.

    The production ANN path at corpus scale:
    1. train the coarse quantizer — fixed-iteration Lloyd's over
       fixed-point (1e-6) integer coordinates: seeds are the n_clusters
       vectors ranked first by md5(vec_id), assignment is integer L2
       argmin (ties → lower cluster id), centroid update quantizes the
       exact integer dim-sums back to the grid with floor(s/n + 0.5).
       Every step is integer or a single exactly-representable double
       division, so cluster boundaries are bit-stable across engines,
       partitionings and runs — unlike pyspark.ml KMeans, whose float
       reductions are partition-order sensitive. At 100 TB the training
       input becomes a sample (`train_fraction` < 1): a deterministic
       md5(vec_id) hash gate picks the training subset, so the sample —
       and therefore the quantizer — is reproducible across runs and
       partitionings, while seeding/assignment/probing are unchanged.
       Assignment stays a full narrow pass over every vector.
    2. assign every corpus vector to its nearest centroid — narrow,
       embarrassingly parallel;
    3. per query, probe the `nprobe` nearest centroids (same integer
       metric) and rank exact cosine only inside those clusters — an
       equi-join on cluster id instead of a full scan.

    Per-iteration centroids (k×dim ints) are collected to the driver —
    the same tiny model state pyspark.ml keeps — so the lazy plan depth
    stays constant in the iteration count.
    """
    spark = emb.sparkSession
    # persists are TRAINING-scoped: Lloyd's iterations re-scan base/train
    # once per round, so caching pays during the loop; both are released
    # before the lazy result plan is built (persisting the whole corpus
    # for the caller's one or two assignment scans would be wrong at
    # scale — the narrow double/fixed-point projection recomputes cheaply).
    base = (
        emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
        .withColumn("xi", _fixed_point(F.col("v")))
        .persist()
    )
    if train_fraction < 1.0:
        # Deterministic hash-gate sample: portable_hash64 is a uniform
        # 32-bit value; keep a vector for training iff it falls below
        # fraction * 2^32. Same gate family as q_stratified_sample — no
        # RNG state, stable under re-runs, re-partitioning and engine
        # changes (single pinned definition in functions/hashing.py).
        gate = portable_hash64(F.col(id_col).cast("string"))
        train = base.filter(gate < int(train_fraction * 2**32)).persist()
    else:
        train = base
    def _unpersist_training():
        if train is not base:
            train.unpersist()
        base.unpersist()

    seeds = (
        train.withColumn("h", F.md5(F.col(id_col).cast("string")))
        .orderBy("h")
        .limit(n_clusters)
        .collect()
    )
    if not seeds:
        # degenerate sample (fraction too small for the corpus): train on
        # the full input rather than fail — releasing the orphaned
        # persisted sample first, so it doesn't outlive the call
        if train is not base:
            train.unpersist()
        train = base
        seeds = (
            train.withColumn("h", F.md5(F.col(id_col).cast("string")))
            .orderBy("h")
            .limit(n_clusters)
            .collect()
        )
    if not seeds:
        # empty corpus: a well-formed empty result in the output schema
        # (brute_force_topk's contract for the analogous degenerate case),
        # not an IndexError at dim probing
        _unpersist_training()
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, cos_sim double, rank int"
        )
    cent = [(j, list(r["xi"])) for j, r in enumerate(seeds)]

    def assign(centroids, over=None):
        # Assignment is a NARROW map: the k×dim centroid table (driver
        # model state) rides along as a one-row broadcast array column,
        # and the argmin is array-local — struct ordering gives (min
        # dist, then min cluster id), so ties break identically to the
        # oracle. No per-vector shuffle; and because the centroids are
        # DATA (not literals), every iteration reuses the same compiled
        # plan instead of paying a fresh codegen per loop step.
        cents_row = spark.createDataFrame(
            [([(list(ci), int(j)) for j, ci in centroids],)],
            "cents array<struct<ci: array<bigint>, cluster: int>>",
        )
        best = F.array_min(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    _int_l2(F.col("xi"), c["ci"]).alias("dist"),
                    c["cluster"].alias("cluster"),
                ),
            )
        )
        return (
            (base if over is None else over)
            .crossJoin(F.broadcast(cents_row))
            .withColumn("cluster", best["cluster"])
            .select(id_col, "v", "xi", "cluster")
        )

    # Centroid update: dim is known, so the exact integer dim-sums are
    # `dim` sum-aggregates in ONE groupBy (map-side partial agg, single
    # shuffle of k×dim ints — no posexplode row blowup). The grid
    # re-quantization floor(s/n + 0.5) runs on the driver over the k×dim
    # model state with the same IEEE double division both engines use.
    import math

    dim = len(cent[0][1])
    sum_aggs = [F.sum(F.col("xi")[d]).alias(f"s{d}") for d in range(dim)]
    try:
        for _ in range(IVF_ITERS):
            a = assign(cent, over=train)
            rows = a.groupBy("cluster").agg(F.count("*").alias("n"), *sum_aggs).collect()
            cent = [
                (
                    r["cluster"],
                    [int(math.floor(r[f"s{d}"] / r["n"] + 0.5)) for d in range(dim)],
                )
                for r in rows
            ]
    finally:
        # model state is final — release the training caches before the
        # result plan is built (prevents per-call storage growth across a
        # session; the plan below recomputes the narrow projection)
        _unpersist_training()

    cdf = spark.createDataFrame(cent, "cluster int, ci array<bigint>")
    assigned = assign(cent).withColumn("nv", unrolled_norm("v", dim))

    queries = assigned.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("xi").alias("qxi"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    # nprobe nearest centroids per query, same integer metric
    qc = queries.crossJoin(F.broadcast(cdf)).select(
        "query_id", "qv", "nq", "cluster", _int_l2(F.col("qxi"), F.col("ci")).alias("cdist")
    )
    wq = Window.partitionBy("query_id").orderBy("cdist", "cluster")
    probed = qc.withColumn("crank", F.row_number().over(wq)).filter(
        F.col("crank") <= nprobe
    ).select("query_id", "qv", "nq", "cluster")

    scored = (
        assigned.join(probed, "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cos_expr(unrolled_dot("qv", "v", dim), F.col("nq") * F.col("nv")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    out = scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(F.col("rank") <= k)
    return out


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding", label_col: str = "label", dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label.

    Blocking bounds the pair count (at scale: replace label with a coarse
    LSH bucket); exact cosine verifies each candidate pair.
    """
    dim = _dim_of(emb, vec_col) if dim is None else dim
    base = emb.select(
        F.col(id_col), F.col(label_col).alias("blk"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nv", unrolled_norm("v", dim))
    a = base.select(
        F.col(id_col).alias("vec_a"), F.col("blk"),
        F.col("v").alias("va"), F.col("nv").alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("vec_b"), F.col("blk"),
        F.col("v").alias("vb"), F.col("nv").alias("nb"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                cos_expr(
                    unrolled_dot(F.col("va"), F.col("vb"), dim),
                    F.col("na") * F.col("nb"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
