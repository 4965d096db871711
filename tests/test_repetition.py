"""Repetition-signal semantics vs a pure-Python mirror, plus the
streaming-dedup exactly-once guarantee."""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF0001


def _py_signals(text: str) -> tuple[int, int, float, float]:
    ws = text.split(" ")

    def grams(k):
        return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)] if len(ws) >= k else []

    g2, g3 = grams(2), grams(3)
    top2 = max(Counter(g2).values()) / len(g2) if g2 else 0.0
    c3 = Counter(g3)
    dup3 = sum(1 for g in g3 if c3[g] > 1) / len(g3) if g3 else 0.0
    return len(g2), len(g3), round(top2, 6), round(dup3, 6)


def test_repetition_signals_match_python_mirror(spark):
    from proactive_map_reduce_spark.operators.textstats import repetition_signals

    rows = [
        (0, "a b a b a b"),          # one dominant bigram
        (1, "x y z x y z x y z w"),  # repeated trigram run
        (2, "all distinct words here no repeats at"),
        (3, "solo"),                 # no bigrams at all
        (4, "two words"),            # bigram but no trigram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    for doc_id, text in rows:
        n2, n3, top2, dup3 = _py_signals(text)
        r = got[doc_id]
        assert r["n_bigrams"] == n2
        assert r["n_trigrams"] == n3
        assert abs(r["top_bigram_frac"] - top2) < 1e-9
        assert abs(r["dup_trigram_frac"] - dup3) < 1e-9


def test_repetition_signals_on_fixture(spark):
    from proactive_map_reduce_spark.operators.textstats import repetition_signals

    docs = spark.read.parquet(SF0001 + "/documents.parquet").limit(50)
    out = repetition_signals(docs).collect()
    assert len(out) == 50
    for r in out:
        assert 0.0 <= r["top_bigram_frac"] <= 1.0
        assert 0.0 <= r["dup_trigram_frac"] <= 1.0
        # a duplicated trigram implies a duplicated bigram share at least
        # as large a fraction of positions is NOT guaranteed — but the max
        # bigram must appear at least as often as the max trigram.
        assert r["n_bigrams"] == r["n_trigrams"] + 1


def test_stream_dedup_exactly_once(spark):
    from proactive_map_reduce_spark.sources.tables import load_table
    from proactive_map_reduce_spark.streaming.proactive import stream_dedup

    ev = load_table(spark, SF0001, "events")
    out = stream_dedup(spark, ev)
    ids = [r["event_id"] for r in out.select("event_id").collect()]
    assert len(ids) == len(set(ids)) == ev.count()


def test_repetition_signals_randomized_sweep(spark):
    """200 seeded random docs over a 4-word alphabet (forcing heavy
    n-gram collisions and runs) must match the pure-Python Counter
    mirror exactly — exercises the sorted-run-length computation across
    run boundaries, singleton runs, and all-equal documents."""
    import random

    rng = random.Random(42)
    alphabet = ["a", "b", "ab", "ba"]
    rows = []
    for i in range(200):
        n = rng.randint(1, 12)
        rows.append((i, " ".join(rng.choice(alphabet) for _ in range(n))))
    rows.append((200, "a a a a a a a a"))      # one long run
    rows.append((201, " ".join(str(k) for k in range(12))))  # all distinct

    from proactive_map_reduce_spark.operators.textstats import repetition_signals

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    for doc_id, text in rows:
        n2, n3, top2, dup3 = _py_signals(text)
        r = got[doc_id]
        assert (r["n_bigrams"], r["n_trigrams"]) == (n2, n3), doc_id
        assert abs(r["top_bigram_frac"] - top2) < 1e-9, doc_id
        assert abs(r["dup_trigram_frac"] - dup3) < 1e-9, doc_id
