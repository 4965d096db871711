"""Same-session interleaved A/B harness for r14 isolated comparisons.

The host shows large BETWEEN-session load drift (r13: ±40%), so variant
comparisons run INTERLEAVED in one warmed session: A,B,A,B,... with a
noop sink per rep, reporting per-variant medians. Usage:

    python tools/ab_r14.py <case> [reps]

Cases are registered in CASES below; each returns a dict of
variant-name -> (lambda: DataFrame) builders.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def case_standin_copy(spark):
    """q_flagship with the r13 batch.copy() stand-in vs the r14 no-copy."""
    import pandas as pd

    from proactive_map_reduce_spark.operators import mapstage
    from proactive_map_reduce_spark.queries import REGISTRY

    new_model = mapstage.standin_model

    def old_model(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        texts = out["chunk_text"].tolist()
        rev, n_toks = [], []
        for t in texts:
            if isinstance(t, str):
                ws = t.split(" ")
                rev.append(" ".join(reversed(ws)))
                n_toks.append(len(ws))
            else:
                rev.append(t)
                n_toks.append(0)
        out["out_text"] = rev
        out["n_out_tokens"] = n_toks
        return out

    def build(model):
        def b():
            mapstage.standin_model = model
            try:
                return REGISTRY["q_flagship"](spark, SF_DIR)
            finally:
                mapstage.standin_model = new_model

        return b

    return {"old_copy": build(old_model), "new_nocopy": build(new_model)}


def case_llm_map_only(spark):
    """The bare mapInPandas seam (q_llm_map) old vs new stand-in."""
    import pandas as pd

    from proactive_map_reduce_spark.operators import mapstage
    from proactive_map_reduce_spark.queries import REGISTRY

    new_model = mapstage.standin_model

    def old_model(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        texts = out["chunk_text"].tolist()
        rev, n_toks = [], []
        for t in texts:
            if isinstance(t, str):
                ws = t.split(" ")
                rev.append(" ".join(reversed(ws)))
                n_toks.append(len(ws))
            else:
                rev.append(t)
                n_toks.append(0)
        out["out_text"] = rev
        out["n_out_tokens"] = n_toks
        return out

    def build(model):
        def b():
            mapstage.standin_model = model
            try:
                return REGISTRY["q_llm_map"](spark, SF_DIR)
            finally:
                mapstage.standin_model = new_model

        return b

    return {"old_copy": build(old_model), "new_nocopy": build(new_model)}


def case_arrow_batch(spark):
    """q_flagship under different arrow.maxRecordsPerBatch values."""
    from proactive_map_reduce_spark.queries import REGISTRY

    def build(n):
        def b():
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(n))
            return REGISTRY["q_flagship"](spark, SF_DIR)

        return b

    return {"batch_10000": build(10000), "batch_1000": build(1000), "batch_100000": build(100000)}


def case_tokenize(spark):
    """q_tokenize: r13 bare-attribute explode (inferred 3x split) vs r14."""
    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.functions.hashing import token_id
    from proactive_map_reduce_spark.queries import REGISTRY
    from proactive_map_reduce_spark.sources.tables import ensure_parallelism, load_table

    def old():
        d = load_table(spark, SF_DIR, "documents")
        ws = F.split(F.col("text"), " ")
        base = ensure_parallelism(d).select(
            "doc_id", ws.alias("__ws"), F.size(ws).alias("n_words_doc")
        )
        words = base.select(
            "doc_id", "n_words_doc", F.posexplode("__ws").alias("pos", "word")
        )
        return words.select(
            "doc_id", F.col("pos").cast("int").alias("pos"), token_id("word").alias("token")
        )

    return {"old_bare_attr": old, "new_barrier": lambda: REGISTRY["q_tokenize"](spark, SF_DIR)}


def case_decontaminate(spark):
    """q_decontaminate: r13 window-shingle form vs r14 array form."""
    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.functions.hashing import portable_hash64
    from proactive_map_reduce_spark.operators import chunking, dedup as dedup_ops
    from proactive_map_reduce_spark.queries import REGISTRY
    from proactive_map_reduce_spark.queries._base import DECONTAM_NGRAM
    from proactive_map_reduce_spark.sources.tables import load_table

    def old():
        d = load_table(spark, SF_DIR, "documents")
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

    return {
        "old_window": old,
        "new_arrays": lambda: REGISTRY["q_decontaminate"](spark, SF_DIR),
    }


def case_pair_scores(spark):
    """q_flagship scoring tail: unpinned intersect vs pinned __n_inter."""
    from pyspark.sql import Column, functions as F

    from proactive_map_reduce_spark.functions.numeric import round6_ratio
    from proactive_map_reduce_spark.functions.text import normalize_text
    from proactive_map_reduce_spark.operators import mapstage
    from proactive_map_reduce_spark.operators import reduce as red
    from proactive_map_reduce_spark.queries import REGISTRY
    from proactive_map_reduce_spark.queries._base import NUM_STEPS, _chunks, _docs
    from proactive_map_reduce_spark.sources.tables import ensure_parallelism

    def old():
        docs = _docs(spark, SF_DIR)
        mapped = mapstage.llm_map(_chunks(spark, SF_DIR))
        final = red.incremental_concat(mapped)
        gt = ensure_parallelism(docs).select(
            "doc_id",
            "lang",
            F.array_join(F.reverse(F.split("text", " ")), " ").alias("gt_text"),
        )
        df = final.join(gt, "doc_id", "inner")
        nf, ng, tf, tg = "__norm_pred", "__norm_gold", "__toks_pred", "__toks_gold"

        def toks(c):
            return F.when(
                F.length(c) == 0, F.array().cast("array<string>")
            ).otherwise(F.split(c, " "))

        df = (
            df.withColumn(nf, normalize_text(F.col("final_text")))
            .withColumn(ng, normalize_text(F.col("gt_text")))
            .withColumn(tf, F.array_distinct(toks(F.col(nf))))
            .withColumn(tg, F.array_distinct(toks(F.col(ng))))
        )
        p, g = F.col(tf), F.col(tg)
        either_empty = (F.size(p) == 0) | (F.size(g) == 0)
        both_empty = (F.size(p) == 0) & (F.size(g) == 0)
        inter = F.size(F.array_intersect(p, g))
        f1 = (
            F.when(either_empty, both_empty.cast("double"))
            .when(inter == 0, F.lit(0.0))
            .otherwise(round6_ratio(2 * inter, F.size(p) + F.size(g)))
        )
        sub = F.when(either_empty, both_empty.cast("int")).otherwise(
            (F.size(F.array_except(g, p)) == 0).cast("int")
        )
        out = (
            df.withColumn("set_f1", f1)
            .withColumn("em", (F.col(nf) == F.col(ng)).cast("int"))
            .withColumn("subset_acc", sub)
            .drop(nf, ng, tf, tg)
        )
        return out.select("doc_id", "lang", "n_chunks", "set_f1", "em", "subset_acc")

    return {
        "old_unpinned": old,
        "new_pinned": lambda: REGISTRY["q_flagship"](spark, SF_DIR),
    }


def case_similarity(spark):
    """q_similarity_topk: packed-literal indexing (the 8x64 literal
    re-inlined into all 64 dot terms by CollapseProject) vs an
    inline(array(named_struct(...))) generate that carries the literal
    ONCE. Same chunked IEEE association, same values."""
    from pyspark.sql import Window, functions as F

    from proactive_map_reduce_spark.operators import similarity as sim_ops
    from proactive_map_reduce_spark.queries import REGISTRY
    from proactive_map_reduce_spark.sources.tables import load_table

    def new():
        emb = load_table(spark, SF_DIR, "embeddings")
        dim, n_queries, k = sim_ops.EMBED_DIM, 8, 5
        base = emb.select(
            F.col("vec_id"), sim_ops._as_double(F.col("embedding")).alias("v")
        ).withColumn("nv", sim_ops.unrolled_norm("v", dim))
        qrows = base.filter(F.col("vec_id") < n_queries).select("vec_id", "v", "nv").collect()
        structs = ", ".join(
            "named_struct('query_id', {i}L, 'qv', array({vec}), 'nq', {nq}D)".format(
                i=int(r["vec_id"]),
                vec=", ".join(repr(float(x)) + "D" for x in r["v"]),
                nq=repr(float(r["nv"])),
            )
            for r in qrows
        )
        scored = (
            base.select("vec_id", "v", "nv", F.expr(f"inline(array({structs}))"))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(
                    sim_ops.cos_expr(
                        sim_ops.unrolled_dot("qv", "v", dim),
                        F.col("nq") * F.col("nv"),
                    ),
                    6,
                ).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
        )

    return {
        "old_packed_literal": lambda: REGISTRY["q_similarity_topk"](spark, SF_DIR),
        "new_inline_structs": new,
    }


CASES = {
    "similarity": case_similarity,
    "standin_copy": case_standin_copy,
    "llm_map_only": case_llm_map_only,
    "arrow_batch": case_arrow_batch,
    "tokenize": case_tokenize,
    "decontaminate": case_decontaminate,
    "pair_scores": case_pair_scores,
}


def main() -> None:
    case = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from proactive_map_reduce_spark.session import get_spark, tune_for_input

    spark = get_spark(f"ab-{case}")
    spark.sparkContext.setLogLevel("ERROR")
    tune_for_input(spark, SF_DIR)
    # warm JVM + python workers exactly like bench.py
    spark.range(1000).count()

    def _noop(it):
        for b in it:
            yield b

    (
        spark.range(256)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(_noop, schema="id long")
        .write.format("noop").mode("overwrite").save()
    )

    variants = CASES[case](spark)
    # one unmeasured warm pass per variant (codegen compile)
    for name, build in variants.items():
        build().write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {n: [] for n in variants}
    for r in range(reps):
        for name, build in variants.items():
            spark.catalog.clearCache()
            df = build()
            spark.sparkContext.setJobDescription(f"ab:{case}:{name}:rep{r}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
    for name, xs in samples.items():
        med = statistics.median(xs[len(xs) // 3:])
        print(f"{name:20s} med={med:.3f} all={xs}")
    spark.stop()


if __name__ == "__main__":
    main()
