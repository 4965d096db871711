"""Skew-mitigation equivalence, IVF recall, and text-corpus round-trip."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from proactive_map_reduce_spark.operators import similarity as sim
from proactive_map_reduce_spark.operators import skew
from proactive_map_reduce_spark.sources import text_corpus
from tests.conftest import SF0001


def test_salted_agg_equals_plain_groupby(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(1000)],
        "id long, k string, v double",
    )
    got = {
        r["k"]: (round(r["sum_value"], 6), r["n_rows"])
        for r in skew.salted_agg(df, ["k"], "v", salt_source="id", n_salts=4).collect()
    }
    want = {
        r["k"]: (round(r["s"], 6), r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    assert got == want


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(500)], "id long, fk int, v double"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(5)], "dk int, name string")
    salted = skew.salted_join(fact, dim, "fk", "dk", salt_source="id", n_salts=4)
    plain = fact.join(dim, fact.fk == dim.dk)
    assert salted.count() == plain.count() == 500
    g = {
        r["name"]: round(r["s"], 6)
        for r in salted.groupBy("name").agg(F.sum("v").alias("s")).collect()
    }
    p = {
        r["name"]: round(r["s"], 6)
        for r in plain.groupBy("name").agg(F.sum("v").alias("s")).collect()
    }
    assert g == p


def test_salt_is_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    a = [r[0] for r in df.select(skew.salt_column("id", 8)).collect()]
    b = [r[0] for r in df.select(skew.salt_column("id", 8)).collect()]
    assert a == b
    assert all(0 <= s < 8 for s in a)
    assert len(set(a)) > 1  # actually spreads


def test_ivf_recall_against_brute_force(spark):
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(emb, n_queries=8, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ivf_topk(emb, n_queries=8, k=5, n_clusters=8, nprobe=3).collect()
    }
    # probing 3/8 clusters of random vectors: recall well above chance
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, recall
    # every IVF hit must carry the exact cosine (subset check by pair)
    assert all(pair[0] != pair[1] for pair in ivf)


def test_ivf_sampled_training_recall(spark):
    """The 100 TB training path: the coarse quantizer trains on a
    deterministic md5-gated sample, assignment/probing stay full. Recall
    vs brute force must hold, and the sampled quantizer must be
    reproducible run-to-run (hash gate, no RNG state)."""
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(emb, n_queries=8, k=5).collect()
    }
    sampled = sim.ivf_topk(
        emb, n_queries=8, k=5, n_clusters=8, nprobe=3, train_fraction=0.5
    )
    hits1 = {(r["query_id"], r["neighbor_id"]) for r in sampled.collect()}
    recall = len(brute & hits1) / len(brute)
    assert recall >= 0.3, recall
    # reproducibility: same fraction → bit-identical result set
    hits2 = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ivf_topk(
            emb, n_queries=8, k=5, n_clusters=8, nprobe=3, train_fraction=0.5
        ).collect()
    }
    assert hits1 == hits2
    # degenerate fraction falls back to full-corpus training, not failure
    tiny = sim.ivf_topk(
        emb, n_queries=2, k=3, n_clusters=4, nprobe=2, train_fraction=1e-12
    )
    assert tiny.count() > 0


def test_text_corpus_roundtrip(spark):
    docs = spark.createDataFrame(
        [(7, "hello world"), (42, "second doc text")], "doc_id long, text string"
    )
    root = tempfile.mkdtemp(prefix="pmr_corpus_test_")
    try:
        text_corpus.write_text_corpus(docs, root)
        back = {
            r["doc_id"]: r["text"]
            for r in text_corpus.read_text_corpus(spark, root).collect()
        }
        assert back == {7: "hello world", 42: "second doc text"}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_asof_join_semantics(spark):
    from proactive_map_reduce_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 200), (2, 5, 300)], "k int, ts int, lv int"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (1, 25, "c"), (3, 1, "z")], "k int, ts int, rv string"
    )
    out = {
        r["lv"]: r["r_rv"]
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="ts").collect()
    }
    assert out[100] == "a"   # equality counts (<=)
    assert out[200] == "b"   # latest at-or-before 20
    assert out[300] is None  # no right row for key 2


def test_sketch_stats_accuracy(spark):
    """KMV distinct within 5% of exact; histogram quartiles bracket exact median."""
    from pyspark.sql import functions as F

    import proactive_map_reduce_spark.queries as Q

    sketch = {r["lang"]: r for r in Q.q_sketch_stats(spark, SF0001).collect()}
    exact = {r["lang"]: r for r in Q.q_corpus_stats(spark, SF0001).collect()}
    for lang, e in exact.items():
        s = sketch[lang]
        rel = abs(s["approx_distinct_words"] - e["n_distinct_words"]) / e["n_distinct_words"]
        assert rel < 0.05, (lang, rel)
        assert s["p25"] <= e["median_chars"] <= s["p75"]


def test_brute_force_param_equals_broadcast(spark):
    """The parameterized-literal query plan and the broadcast-join plan
    are two physical strategies for the same logical query — result sets
    must be bit-identical (same rounding, same tie-breaks)."""
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    a = {tuple(r) for r in sim.brute_force_topk(emb, dim=64).collect()}
    b = {
        tuple(r)
        for r in sim.brute_force_topk(
            emb, dim=64, parameterize_queries=False
        ).collect()
    }
    assert a == b and len(a) == 40


def test_kmv_distinct_operator_branches(spark):
    """kmv_distinct: groups under k answer EXACTLY; groups over k
    estimate within KMV's expected error (~1/sqrt(k))."""
    from proactive_map_reduce_spark.functions.hashing import portable_hash64
    from proactive_map_reduce_spark.operators import sketch as sk

    rows = [("small", f"s{i}") for i in range(10)]
    rows += [("big", f"b{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v string").repartition(8)
    hashed = df.select("g", portable_hash64("v").alias("h")).distinct()
    got = {
        r["g"]: r["approx_distinct"]
        for r in sk.kmv_distinct(hashed, "g", "h", k=64).collect()
    }
    assert got["small"] == 10  # exact branch
    assert abs(got["big"] - 5000) / 5000 < 0.25  # estimate branch


def test_histogram_quantiles_operator(spark):
    """histogram_quantiles brackets the true quartiles of a uniform
    integer column within one bin width."""
    from proactive_map_reduce_spark.operators import sketch as sk

    df = spark.createDataFrame(
        [("g", i) for i in range(1000)], "g string, v long"
    ).repartition(4)
    out = sk.histogram_quantiles(df, "g", "v", bins=64).collect()[0]
    binw = 1000 / 64 + 1  # lower-bound semantics: up to one (integer) bin below
    assert abs(out["p25"] - 250) <= binw
    assert abs(out["p50"] - 500) <= binw
    assert abs(out["p75"] - 750) <= binw


def test_topk_empty_corpus_returns_typed_empty(spark):
    """Both top-k paths must return a well-formed empty result (not crash)
    on an empty or fully-filtered embedding input."""
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    bf = sim.brute_force_topk(empty, n_queries=4, k=3, dim=4)
    assert bf.count() == 0
    assert [f.name for f in bf.schema.fields] == [
        "query_id", "neighbor_id", "cos_sim", "rank"
    ]
    ivf = sim.ivf_topk(empty, n_queries=4, k=3)
    assert ivf.count() == 0
    assert [f.name for f in ivf.schema.fields] == [
        "query_id", "neighbor_id", "cos_sim", "rank"
    ]


def test_salted_join_keeps_null_salt_source_rows(spark):
    """A NULL salt_source column must not drop fact rows: the salted join
    claims equivalence to the plain inner join (crc32(NULL) is NULL; a
    NULL salt fails the equi-condition silently)."""
    from proactive_map_reduce_spark.operators import skew

    fact = spark.createDataFrame(
        [(1, None, 10.0), (1, 5, 20.0), (2, 7, 30.0)],
        "k long, src int, v double",
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "dk long, name string")
    got = skew.salted_join(fact, dim, "k", "dk", salt_source="src").collect()
    plain = fact.join(dim, fact["k"] == dim["dk"]).collect()
    assert len(got) == len(plain) == 3


def test_brute_force_topk_empty_corpus_dim_probe(spark):
    """dim=None on a zero-row corpus: the probe reports 0 and the
    operator returns its documented well-formed empty result."""
    from proactive_map_reduce_spark.operators import similarity

    empty = spark.createDataFrame([], "vec_id long, emb array<double>")
    out = similarity.brute_force_topk(
        empty, id_col="vec_id", vec_col="emb", dim=None
    )
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "neighbor_id", "cos_sim", "rank"}


def test_quantize_zero_vector_no_divide_by_zero(spark):
    """An all-zero embedding (padding row, failed encode) has scale 0;
    quantization must yield q=0/err=0, not an ANSI DIVIDE_BY_ZERO."""
    import duckdb
    import pandas as pd

    from proactive_map_reduce_spark.oracles import ORACLES
    from proactive_map_reduce_spark.operators.similarity import EMBED_DIM
    from proactive_map_reduce_spark.queries import REGISTRY
    import os
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="qzv_")
    try:
        rows = [
            (0, 0, [0.0] * EMBED_DIM),
            (1, 1, [0.5] + [0.0] * (EMBED_DIM - 1)),
        ]
        spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        ).write.parquet(os.path.join(tmp, "embeddings.parquet"))
        got = {
            r["vec_id"]: (r["scale"], r["q_max"], r["q_min"], r["max_abs_err"])
            for r in REGISTRY["q_quantize_embeddings"](spark, tmp).collect()
        }
        assert got[0] == (0.0, 0, 0, 0.0)
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{os.path.join(tmp, 'embeddings.parquet')}/*.parquet'"
        )
        want = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(ORACLES["q_quantize_embeddings"]).fetchall()
        }
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
