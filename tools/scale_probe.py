"""Past-10× validation of the three 100 TB load-bearing scale claims
(round-9 verdict item 4).

The sf1 gate (10×) proves correctness at scale; the SHAPE claims that
make the dedup surfaces viable at 100 TB are asymptotic and deserve
direct measurement further out:

1. **Star-cap pair bound** (``dedup.capped_block_pairs``): emitted
   pairs per block of size s are exactly C(min(s,K),2) + max(0, s−K) —
   O(K²+B) total, never O(B²). The probe computes that closed form from
   the measured block-size distribution and compares it against the
   ACTUAL emitted pair count, on both the LSH band-bucket path (K=256;
   cross-band ``distinct`` makes the form an upper bound) and the
   n-gram block path (K=64; disjoint blocks make it an exact equality).
2. **LSH pair growth**, split by what drives it: on DUPLICATE-FREE
   growth (the ``distinct`` fixture variant) candidate pairs must grow
   ~linearly in docs — super-linear growth there is a plan defect. On
   near-duplicate growth (the ``neardup`` variant) pairs legitimately
   grow with the square of the real duplicate-cluster size — the claim
   under test is then the K-cap bound above, plus the recorded
   ``pairs_uncapped_form`` showing what an uncapped expansion would
   have produced.
3. **Connected-components round count**: min-label propagation with the
   pointer-doubling shortcut converges in O(log diameter) rounds;
   replication multiplies the number of components, not their diameter,
   so rounds must stay ~flat as data scales.

Fixtures: documents-only replicas of sf0.1 (id offsets; text perturbed
per the variant — see ``build_docs``), content-addressed under the
retention-exempt ``pmr_scale_`` family.

Usage: python tools/scale_probe.py [replicas ...]   # default: 30
Merges one row per replica count into SCALE_PROBE.json (the 1× baseline
row is always measured in the same run). Exits non-zero if any bound
check fails.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = "/root/testdata/sf0.1"


def build_docs(spark, replicas: int, variant: str) -> str:
    """Documents-only N× replica; two perturbation variants probing two
    different claims:

    - ``neardup`` (the sf1_gate scheme — a per-replica text SUFFIX):
      replicas of one doc remain genuine near-duplicates, so their
      minhash signatures mostly agree and LSH buckets grow ×replicas.
      Pairs here SHOULD grow ~quadratically in cluster size — that is
      the data's true duplicate structure — and the claim under test is
      the K-cap bound, not linearity.
    - ``distinct`` (every WORD salted with the replica id): every
      shingle differs across replicas, so signatures are independent
      and the bucket-size distribution keeps the 1× shape. Pairs here
      must grow ~linearly in docs — any super-linear growth would be a
      PLAN defect (a join blowup), not data structure.
    """
    import hashlib

    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.sources.tables import stat_signature

    tag = hashlib.sha256(
        (
            stat_signature(f"{BASE}/documents.parquet")
            + f"|r{replicas}|{variant}|v2"
        ).encode()
    ).hexdigest()[:12]
    out = f"/tmp/pmr_scale_probe_{replicas}x_{variant}_{tag}"
    if os.path.exists(os.path.join(out, "_DONE")):
        os.utime(out)
        return out
    df = spark.read.parquet(f"{BASE}/documents.parquet")
    df = df.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
    ).withColumn("doc_id", F.col("doc_id") + F.col("__r").cast("long") * 1_000_000)
    if variant == "neardup":
        suffix = F.concat(F.lit(" replica"), F.col("__r"))
        df = df.withColumn(
            "n_chars", F.col("n_chars") + F.length(suffix)
        ).withColumn("text", F.concat(F.col("text"), suffix))
    else:  # distinct: salt EVERY word so no cross-replica shingle survives
        df = df.withColumn(
            "text",
            F.expr(
                "array_join(transform(split(text, ' '), "
                "w -> concat('r', cast(__r as string), w)), ' ')"
            ),
        )
    df = df.drop("__r")
    os.makedirs(out, exist_ok=True)
    df.repartition(max(16, replicas)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def star_cap_closed_form(blocked, block_cols, k):
    """Σ_blocks C(min(s,K),2) + max(0, s−K), computed relationally from
    the block-size distribution (integer arithmetic — K ≤ 256 keeps
    min(s,K)² far inside int64)."""
    from pyspark.sql import functions as F

    sizes = blocked.groupBy(*block_cols).agg(F.count("*").alias("s"))
    row = sizes.select(
        F.sum(
            F.expr(f"least(s, {k}) * (least(s, {k}) - 1) DIV 2")
            + F.greatest(F.col("s") - k, F.lit(0))
        ).alias("pred"),
        F.sum(F.expr("s * (s - 1) DIV 2")).alias("uncapped"),
        F.count("*").alias("n_blocks"),
        F.max("s").alias("max_block"),
    ).collect()[0]
    return (
        int(row["pred"] or 0),
        int(row["n_blocks"]),
        int(row["max_block"] or 0),
        int(row["uncapped"] or 0),
    )


def probe(spark, sf_dir: str, with_cc: bool = True) -> dict:
    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.operators import chunking, dedup
    from proactive_map_reduce_spark.queries._base import (
        MINHASH_BANDS,
        MINHASH_N,
        NGRAM_BLOCK_CAP,
    )
    from proactive_map_reduce_spark.sources.tables import load_table

    out: dict = {}
    docs = load_table(spark, sf_dir, "documents")
    out["docs"] = docs.count()

    # --- LSH band-bucket path (K=256, 4 bands: the minhash/clusters path)
    t0 = time.time()
    sigs = dedup.minhash_signatures(
        dedup.shingle_rows(chunking.split_words(docs)), MINHASH_N
    ).persist()
    banded = dedup.band_rows(sigs, MINHASH_N, MINHASH_BANDS)
    pred, n_blocks, max_blk, uncapped = star_cap_closed_form(
        banded, ["band_id", "band_hash"], dedup.LSH_MAX_BUCKET
    )
    pairs = dedup.lsh_candidate_pairs(sigs, MINHASH_N, MINHASH_BANDS).persist()
    actual = pairs.count()
    out["lsh"] = {
        "K": dedup.LSH_MAX_BUCKET,
        "buckets": n_blocks,
        "max_bucket": max_blk,
        "pairs_closed_form_upper": pred,  # pre-distinct (cross-band dups)
        "pairs_uncapped_form": uncapped,  # what NO cap would expand to
        "pairs_actual": actual,
        "bound_holds": actual <= pred,
        "sec": round(time.time() - t0, 1),
    }

    # --- connected components over the LSH pairs (round-count claim)
    if with_cc:
        t0 = time.time()
        labels = dedup.connected_components(pairs)
        comp = labels.agg(
            F.countDistinct("cluster_rep").alias("c"), F.count("*").alias("n")
        ).collect()[0]
        out["cc"] = {
            "edges": actual,
            "nodes": int(comp["n"]),
            "components": int(comp["c"]),
            "rounds": dedup.CC_STATS["rounds"],
            "round_secs": dedup.CC_STATS["round_secs"],
            "sec": round(time.time() - t0, 1),
        }
    pairs.unpersist()
    sigs.unpersist()

    # --- n-gram block path (K=64, disjoint (lang, len-bucket) blocks):
    # the closed form is EXACT here (ids unique per block, blocks disjoint
    # → the trailing distinct is a no-op)
    t0 = time.time()
    blocked = docs.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 100).cast("bigint").alias("blk_bucket"),
    )
    pred, n_blocks, max_blk, uncapped = star_cap_closed_form(
        blocked, ["lang", "blk_bucket"], NGRAM_BLOCK_CAP
    )
    actual = dedup.capped_block_pairs(
        blocked, ["lang", "blk_bucket"], max_block=NGRAM_BLOCK_CAP
    ).count()
    out["ngram"] = {
        "K": NGRAM_BLOCK_CAP,
        "blocks": n_blocks,
        "max_block": max_blk,
        "pairs_closed_form": pred,
        "pairs_uncapped_form": uncapped,
        "pairs_actual": actual,
        "exact_match": actual == pred,
        "sec": round(time.time() - t0, 1),
    }
    return out


def probe_w2(spark, n_docs: int = 100_000, depth: int = 16) -> dict:
    """Shape probe for the two W2 batched stateful runners (r10 verdict
    item 5): at ``n_docs`` keys × ``depth`` stages, the compacted state
    design's claim is per-BATCH cost O(keys) — constant in stream depth
    — because each micro-batch reads and rewrites exactly one state row
    per doc. Bound checked: late-third per-batch seconds ≤ 1.5× the
    post-warmup early third, emission rows exactly ``n_docs × depth``,
    final state table exactly ``n_docs`` rows, and full distributed
    value equality against the batch-computed expectation (the
    zero-seed JVM fold for refeed; prefix-joins for the accumulator)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.operators import chunking, mapstage
    from proactive_map_reduce_spark.streaming import proactive as sp

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(1, {2 * depth}), "
            "i -> concat('w', id % 97, '_', i)), ' ')"
        ).alias("text"),
    )
    chunks = chunking.partition_equal_arrays(docs, depth)
    out: dict = {"n_docs": n_docs, "depth": depth}
    runners = {
        "refeed": sp._refeed_batched_runner,
        "accumulate": sp._accumulate_batched_runner,
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        for name, runner in runners.items():
            root = sp.write_stage_files(chunks)
            out_dir = tempfile.mkdtemp(prefix="pmr_probe_w2out_")
            state_dir = tempfile.mkdtemp(prefix="pmr_probe_w2state_")
            timings: list[dict] = []
            t0 = time.time()
            try:
                got = runner(
                    sp._chunk_stream(spark, root),
                    out_dir=out_dir,
                    state_dir=state_dir,
                    timings=timings,
                )
                rows_out = got.count()
                wall = round(time.time() - t0, 1)
                mapped = mapstage.llm_map(
                    spark.read.schema(sp.CHUNK_SCHEMA).parquet(root)
                )
                ps = mapped.groupBy("doc_id").agg(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "out_text"))
                    ).alias("ps")
                )
                if name == "refeed":
                    expect = (
                        ps.select(
                            "doc_id",
                            F.expr(
                                "transform(ps, p -> struct("
                                "p.chunk_id as batch_id, p.chunk_id as chunk_id,"
                                "p.out_text as out_text))"
                            ).alias("xs"),
                        )
                        .select(
                            "doc_id", F.explode(F.expr(sp._REFEED_FOLD)).alias("e")
                        )
                        .select(
                            "doc_id",
                            F.col("e.chunk_id").alias("chunk_id"),
                            F.col("e.acc_words_before").alias("acc_words_before"),
                            F.col("e.chain").alias("chain"),
                        )
                    )
                else:
                    expect = ps.select(
                        "doc_id",
                        F.explode(
                            F.expr(
                                "transform(sequence(1, size(ps)), k -> struct("
                                "cast(k as int) as n_chunks_seen,"
                                "array_join(transform(slice(ps, 1, k),"
                                " p -> p.out_text), ' ') as acc_text))"
                            )
                        ).alias("e"),
                    ).select("doc_id", "e.n_chunks_seen", "e.acc_text")
                mismatches = (
                    got.exceptAll(expect).count() + expect.exceptAll(got).count()
                )
                state_rows = sp.read_state_table(
                    spark, os.path.join(state_dir, "state")
                ).count()
            finally:
                shutil.rmtree(root, ignore_errors=True)
                shutil.rmtree(out_dir, ignore_errors=True)
                shutil.rmtree(state_dir, ignore_errors=True)
            try:
                from flatness import thirds_flatness  # script: tools/ on path
            except ImportError:  # imported as tools.scale_probe
                from tools.flatness import thirds_flatness

            batch_s = [
                round(t["merge_s"] + t["emit_s"] + t["swap_s"], 3)
                for t in timings
            ]
            flat = thirds_flatness(batch_s)
            out[name] = {
                "batches": len(timings),
                "rows_out": int(rows_out),
                "rows_expected": n_docs * depth,
                "value_mismatches": int(mismatches),
                "state_rows_final": int(state_rows),
                "sec": wall,
                "rows_per_sec": round(rows_out / wall, 1) if wall else None,
                "batch_secs": batch_s,
                **flat,
            }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return out


def probe_w2_sparse(spark, n_docs: int = 1_000_000) -> dict:
    """Sparse-touch probe for the bucketed W2 state table (r11; r10
    verdict item 4): at ``n_docs`` keys, deliver micro-batches that
    touch 1% (clustered), 10% (clustered), 1% (scattered), and 100% of
    the keys, under two state layouts:

    - ``unbucketed`` (n_buckets=1): the r10 design — every batch
      rewrites the whole state table regardless of touch;
    - ``bucketed`` (n_buckets=1024, span=1024 → ~one span per bucket):
      a batch rewrites only the buckets its keys land in.

    Bounds checked (bucketed only): the clustered-1% batch touches
    ≤3% of buckets and its merge costs ≤35% of the dense batch's (and
    ≤50% of the UNBUCKETED layout's cost for the identical batch).
    The scattered-1% batch — 10k uniformly-spread keys covering ~all
    buckets, where bucket pruning cannot help — was the r11 recorded
    worst case; since r12 it must take the DELTA-LOG path (append one
    small folded delta instead of rewriting the grazed buckets) and
    its merge must cost ≤50% of the dense batch's. Values are fully
    checked against the zero-seed JVM fold and the final state must
    hold exactly ``n_docs`` rows, both layouts.
    """
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from proactive_map_reduce_spark.operators import mapstage
    from proactive_map_reduce_spark.streaming import proactive as sp

    pct1 = n_docs // 100
    pct10 = n_docs // 10

    def chunk_df(lo, hi, step, chunk):
        return spark.range(lo, hi, step).select(
            F.col("id").alias("doc_id"),
            F.lit(chunk).cast("int").alias("chunk_id"),
            F.concat(
                F.lit("w"), (F.col("id") % 97).cast("string"), F.lit(" x")
            ).alias("chunk_text"),
        )

    # stage k arrives as micro-batch k (one single-file stage per batch,
    # mtime-ordered like write_stage_files)
    stages = [
        ("dense_build", chunk_df(0, n_docs, 1, 0)),
        ("clustered_1pct", chunk_df(0, pct1, 1, 1)),
        ("clustered_10pct", chunk_df(0, pct10, 1, 2)),
        ("scattered_1pct", chunk_df(0, n_docs, 100, 3)),
        ("dense", chunk_df(0, n_docs, 1, 4)),
    ]

    def build_live() -> str:
        live = tempfile.mkdtemp(prefix="pmr_probe_w2sparse_")
        base_ts = time.time() - 3600
        for k, (_, df) in enumerate(stages):
            tmp = os.path.join(live, f".stage_{k}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(live, f"stage-{k:04d}.parquet")
            shutil.move(part, dst)
            os.utime(dst, (base_ts + k, base_ts + k))
            shutil.rmtree(tmp, ignore_errors=True)
        return live

    # distributed expectation: the zero-seed fold over each doc's actual
    # chunk set (batch_id == chunk_id: one stage per micro-batch)
    def expectation(live: str):
        mapped = mapstage.llm_map(
            spark.read.schema(sp.CHUNK_SCHEMA).parquet(live)
        )
        return (
            mapped.groupBy("doc_id")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("chunk_id", "out_text"))
                ).alias("ps")
            )
            .select(
                "doc_id",
                F.expr(
                    "transform(ps, p -> struct("
                    "p.chunk_id as batch_id, p.chunk_id as chunk_id,"
                    "p.out_text as out_text))"
                ).alias("xs"),
            )
            .select("doc_id", F.explode(F.expr(sp._REFEED_FOLD)).alias("e"))
            .select(
                "doc_id",
                F.col("e.chunk_id").alias("chunk_id"),
                F.col("e.acc_words_before").alias("acc_words_before"),
                F.col("e.chain").alias("chain"),
            )
        )

    configs = {
        "unbucketed": {"n_buckets": 1, "bucket_span": 1024},
        "bucketed": {"n_buckets": 1024, "bucket_span": 1024},
        # r13: no caller-pinned layout — starts at the shipped default
        # N=16 (cheap dense admission) and must AUTO-RESCALE to the
        # measured-best N=1024 once the dense build lands, giving the
        # same clustered pruning / log routing as the pinned config
        "autoscale": {"n_buckets": None, "bucket_span": 1024},
    }
    out: dict = {"n_docs": n_docs, "stages": [n for n, _ in stages]}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        for cfg_name, kw in configs.items():
            live = build_live()
            out_dir = tempfile.mkdtemp(prefix="pmr_probe_w2sout_")
            state_dir = tempfile.mkdtemp(prefix="pmr_probe_w2sstate_")
            timings: list[dict] = []
            t0 = time.time()
            try:
                got = sp._refeed_batched_runner(
                    sp._chunk_stream(spark, live),
                    out_dir=out_dir,
                    state_dir=state_dir,
                    timings=timings,
                    **kw,
                )
                rows_out = got.count()
                wall = round(time.time() - t0, 1)
                mismatches = (
                    got.exceptAll(expectation(live)).count()
                    + expectation(live).exceptAll(got).count()
                )
                state_rows = sp.read_state_table(
                    spark, os.path.join(state_dir, "state")
                ).count()
            finally:
                shutil.rmtree(live, ignore_errors=True)
                shutil.rmtree(out_dir, ignore_errors=True)
                shutil.rmtree(state_dir, ignore_errors=True)
            per_stage = {
                stages[t["batch_id"]][0]: {
                    k: t.get(k)
                    for k in (
                        "merge_s", "touch_s", "emit_s", "swap_s",
                        "buckets_touched", "n_buckets", "path", "compact_s",
                        "rescale_s",
                    )
                }
                for t in timings
                if t["batch_id"] < len(stages)
            }
            out[cfg_name] = {
                "batches": len(timings),
                "rows_out": int(rows_out),
                "value_mismatches": int(mismatches),
                "state_rows_final": int(state_rows),
                "sec": wall,
                "per_stage": per_stage,
            }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    # derived ratios the bound checks (and the verdict table) read
    b, u = out["bucketed"]["per_stage"], out["unbucketed"]["per_stage"]
    out["merge_frac_clustered_1pct_vs_dense"] = round(
        b["clustered_1pct"]["merge_s"] / max(b["dense"]["merge_s"], 1e-9), 3
    )
    out["merge_bucketed_over_unbucketed_at_1pct"] = round(
        b["clustered_1pct"]["merge_s"]
        / max(u["clustered_1pct"]["merge_s"], 1e-9),
        3,
    )
    out["buckets_frac_clustered_1pct"] = round(
        b["clustered_1pct"]["buckets_touched"]
        / b["clustered_1pct"]["n_buckets"],
        4,
    )
    out["buckets_frac_scattered_1pct"] = round(
        b["scattered_1pct"]["buckets_touched"]
        / b["scattered_1pct"]["n_buckets"],
        4,
    )
    out["merge_frac_scattered_1pct_vs_dense"] = round(
        b["scattered_1pct"]["merge_s"] / max(b["dense"]["merge_s"], 1e-9), 3
    )
    a = out["autoscale"]["per_stage"]
    out["autoscale_final_n_buckets"] = a["dense"]["n_buckets"]
    out["autoscale_rescale_s"] = next(
        (s["rescale_s"] for s in a.values() if s.get("rescale_s")), None
    )
    # admission win: the dense BUILD ran at the small default N before
    # any rescale; pruning parity: post-rescale clustered 1% within the
    # pinned-1024 config's fraction-of-dense bound
    out["autoscale_build_n_buckets"] = a["dense_build"]["n_buckets"]
    out["autoscale_merge_frac_clustered_1pct_vs_dense"] = round(
        a["clustered_1pct"]["merge_s"] / max(a["dense"]["merge_s"], 1e-9), 3
    )
    out["autoscale_merge_frac_scattered_1pct_vs_dense"] = round(
        a["scattered_1pct"]["merge_s"] / max(a["dense"]["merge_s"], 1e-9), 3
    )
    return out


def main() -> int:
    replica_counts = [int(a) for a in sys.argv[1:]] or [30]

    from proactive_map_reduce_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows: dict[str, dict] = {}
    print("probing 1x baseline", flush=True)
    rows["1x"] = probe(spark, BASE)
    for n in replica_counts:
        for variant in ("neardup", "distinct"):
            print(f"building {n}x {variant} documents fixture", flush=True)
            fx = build_docs(spark, n, variant)
            print(f"probing {n}x {variant} ({fx})", flush=True)
            rows[f"{n}x_{variant}"] = probe(spark, fx)

    print("probing W2 batched stateful runners (100k keys × depth 16)", flush=True)
    w2 = probe_w2(spark)
    print("probing W2 sparse-touch bucketing (1M keys)", flush=True)
    w2s = probe_w2_sparse(spark)

    base = rows["1x"]
    checks: list[str] = []
    for cfg in ("unbucketed", "bucketed", "autoscale"):
        r = w2s[cfg]
        if r["value_mismatches"]:
            checks.append(f"w2_sparse {cfg}: {r['value_mismatches']} mismatches")
        if r["state_rows_final"] != w2s["n_docs"]:
            checks.append(
                f"w2_sparse {cfg}: state rows {r['state_rows_final']} != keys"
            )
    if w2s["buckets_frac_clustered_1pct"] > 0.03:
        checks.append(
            "w2_sparse: clustered 1% batch touched "
            f"{w2s['buckets_frac_clustered_1pct']:.1%} of buckets (>3%)"
        )
    if w2s["merge_frac_clustered_1pct_vs_dense"] > 0.35:
        checks.append(
            "w2_sparse: clustered 1% merge cost "
            f"{w2s['merge_frac_clustered_1pct_vs_dense']:.0%} of dense (>35%)"
        )
    if w2s["bucketed"]["per_stage"]["scattered_1pct"]["path"] != "log":
        checks.append(
            "w2_sparse: scattered 1% batch did not take the delta-log path"
        )
    if w2s["merge_frac_scattered_1pct_vs_dense"] > 0.5:
        checks.append(
            "w2_sparse: scattered 1% merge cost "
            f"{w2s['merge_frac_scattered_1pct_vs_dense']:.0%} of dense (>50%)"
        )
    # r13 autoscale bounds: the un-pinned layout must converge to the
    # pinned config's N, have BUILT dense at the small default N, and
    # match the pinned config's pruning/routing bounds afterwards
    if w2s["autoscale_final_n_buckets"] != 1024:
        checks.append(
            f"w2_sparse autoscale: final N {w2s['autoscale_final_n_buckets']}"
            " != 1024"
        )
    if w2s["autoscale_build_n_buckets"] >= 1024:
        checks.append(
            "w2_sparse autoscale: dense build already at large N "
            f"({w2s['autoscale_build_n_buckets']}) — no admission win"
        )
    if w2s["autoscale_merge_frac_clustered_1pct_vs_dense"] > 0.35:
        checks.append(
            "w2_sparse autoscale: clustered 1% merge cost "
            f"{w2s['autoscale_merge_frac_clustered_1pct_vs_dense']:.0%}"
            " of dense (>35%)"
        )
    if w2s["autoscale"]["per_stage"]["scattered_1pct"]["path"] != "log":
        checks.append(
            "w2_sparse autoscale: scattered 1% batch did not take the log path"
        )
    # merge_bucketed_over_unbucketed_at_1pct is RECORDED but not bounded:
    # it divides wall seconds from two different JVM sessions, and the
    # unbucketed baseline alone swung 1.9-3.5 s between otherwise
    # identical runs — the within-run fraction-of-dense bound above is
    # the noise-robust form of the same claim.
    for op in ("refeed", "accumulate"):
        r = w2[op]
        if r["rows_out"] != r["rows_expected"]:
            checks.append(f"w2 {op}: rows {r['rows_out']} != {r['rows_expected']}")
        if r["value_mismatches"]:
            checks.append(f"w2 {op}: {r['value_mismatches']} value mismatches")
        if r["state_rows_final"] != w2["n_docs"]:
            checks.append(f"w2 {op}: state rows {r['state_rows_final']} != keys")
        if not r["latency_flat"]:
            checks.append(
                f"w2 {op}: per-batch latency grew with depth "
                f"({r['batch_s_early3rd']}→{r['batch_s_late3rd']} s)"
            )
    for key, r in rows.items():
        if not r["lsh"]["bound_holds"]:
            checks.append(f"{key}: LSH pairs exceed closed-form bound")
        if not r["ngram"]["exact_match"]:
            checks.append(f"{key}: ngram pairs != closed form")
        scale = r["docs"] / base["docs"]
        if scale > 1:
            growth = r["lsh"]["pairs_actual"] / max(base["lsh"]["pairs_actual"], 1)
            r["lsh"]["growth_vs_docs"] = round(growth / scale, 2)
            g2 = r["ngram"]["pairs_actual"] / max(base["ngram"]["pairs_actual"], 1)
            r["ngram"]["growth_vs_docs"] = round(g2 / scale, 2)
            # linearity is a claim about the PLAN only on duplicate-free
            # growth: the neardup variant legitimately grows pairs with
            # the square of its (real) duplicate-cluster size, bounded
            # by the K-capped closed form checked above.
            if key.endswith("_distinct") and growth > 4 * scale:
                checks.append(
                    f"{key}: LSH pair growth {growth:.0f}× vs docs {scale:.0f}×"
                )
            if "cc" in r and "cc" in base and r["cc"]["rounds"] > base["cc"]["rounds"] + 2:
                checks.append(
                    f"{key}: CC rounds grew {base['cc']['rounds']}→{r['cc']['rounds']}"
                )
    doc = {
        "metric": "scale_probe",
        "started": time.strftime("%F %T"),
        "base": BASE,
        "rows": rows,
        "w2_batched": w2,
        "w2_sparse": w2s,
        "violations": checks,
        "ok": not checks,
    }
    line = json.dumps(doc)
    print("\n" + line)
    with open(os.path.join(ROOT, "SCALE_PROBE.json"), "w") as f:
        f.write(line + "\n")
    spark.stop()
    return 0 if not checks else 1


if __name__ == "__main__":
    raise SystemExit(main())
