"""Text-normalization function tests (SURVEY §2.9 F1-F5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from proactive_map_reduce_spark.functions import text as tx
from tests.conftest import SF0001


def _eval(spark, col, *rows_schema):
    rows, schema = rows_schema
    return [r["out"] for r in spark.createDataFrame(rows, schema).select(col.alias("out")).collect()]


def test_normalize_text_reference_semantics(spark):
    """test_proactive.py:51-65: lower → strip punct → drop articles →
    collapse whitespace."""
    cases = [
        ("The  Quick, Brown Fox!", "quick brown fox"),
        ("A man and an apple.", "man and apple"),
        ("  THE THE the  ", ""),
        ("no-change", "nochange"),
    ]
    out = _eval(
        spark,
        tx.normalize_text(F.col("t")),
        [(c,) for c, _ in cases],
        "t string",
    )
    for got, (_, want) in zip(out, cases):
        assert got == want


def test_normalize_question(spark):
    cases = [
        ("What is Spark", "what is Spark?"),
        ("Already there?", "already there?"),
    ]
    out = _eval(
        spark, tx.normalize_question(F.col("t")), [(c,) for c, _ in cases], "t string"
    )
    for got, (_, want) in zip(out, cases):
        assert got == want


def test_match_predicates(spark):
    df = spark.createDataFrame(
        [("The Answer!", "answer", "the answer")], "pred string, part string, full string"
    )
    r = df.select(
        tx.exact_match(F.col("pred"), F.col("full")).alias("em"),
        tx.substring_match(F.col("pred"), F.col("part")).alias("sm"),
    ).collect()[0]
    assert r["em"] == 1 and r["sm"] == 1


def test_any_answer_contained(spark):
    df = spark.createDataFrame(
        [("the cat sat", ["dog", "CAT!"]), ("nothing here", ["dog", "bird"])],
        "t string, answers array<string>",
    )
    out = [
        r["c"]
        for r in df.select(
            tx.any_answer_contained(F.col("t"), F.col("answers")).alias("c")
        ).collect()
    ]
    assert out == [1, 0]


def test_first_line(spark):
    df = spark.createDataFrame([("\n\nfirst line\nsecond",)], "t string")
    assert df.select(tx.first_line(F.col("t")).alias("out")).collect()[0]["out"] == "first line"


def test_quantization_error_bound(spark):
    """Symmetric int8 quantization property: every reconstruction error
    is <= scale/2 (round-to-nearest), and q values fit in [-127, 127]."""
    import proactive_map_reduce_spark.queries as Q

    rows = Q.q_quantize_embeddings(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        # both sides are reported rounded to 6 decimals, so allow 1e-6
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-6


def test_decontaminate_excludes_benchmark_side(spark):
    """Contamination report lists TRAINING docs only (never the held-out
    benchmark docs themselves), and every hit count is positive."""
    import proactive_map_reduce_spark.queries as Q

    rows = Q.q_decontaminate(spark, SF0001).collect()
    for r in rows:
        assert r["doc_id"] % 17 != 0
        assert r["n_contaminated_grams"] >= 1
        assert r["n_bench_docs_hit"] >= 1


def test_pii_redact_leaves_no_pii(spark):
    """After the scrub no email survives anywhere; counts match the
    deterministic injection pattern."""
    import proactive_map_reduce_spark.queries as Q

    rows = Q.q_pii_redact(spark, SF0001).collect()
    for r in rows:
        assert r["no_email_left"] == 1
        if r["doc_id"] % 4 == 0:
            assert r["n_emails"] == 1
        elif r["doc_id"] % 4 == 1:
            assert r["n_phones"] == 2
        elif r["doc_id"] % 4 == 2:
            assert r["n_ips"] == 1


def test_decode_first_line_strips_leading_newlines(spark):
    """The operator must mirror the reference's lstrip('\n') — Spark's
    ltrim strips only spaces, so an out_text starting with '\n' (the
    reference decode shape) previously yielded '' instead of the answer."""
    from proactive_map_reduce_spark.operators import mapstage

    df = spark.createDataFrame(
        [(1, "\n\nAnswer: 42\nsecond"), (2, "plain\nrest"), (3, "  spaced\nx")],
        "doc_id long, out_text string",
    )
    got = {
        r["doc_id"]: r["answer"]
        for r in mapstage.decode_first_line(df).collect()
    }
    assert got == {1: "Answer: 42", 2: "plain", 3: "  spaced"}


def test_normalize_preserves_whitespace_word_boundaries(spark):
    """The reference's normalize_answer removes only punctuation —
    newline/tab-separated words must stay separate ('foo\nbar' ->
    'foo bar', never 'foobar'), and the whitespace class is explicit
    (never \\s: Java's includes \\x0b, RE2's does not)."""
    rows = [
        (0, "foo\nbar"),
        (1, "foo\tbar"),
        (2, "The  Cat! sat."),
        (3, "end. \x0bnext"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", tx.normalize_text("t").alias("n")).collect()
    }
    assert got[0] == "foo bar"
    assert got[1] == "foo bar"
    assert got[2] == "cat sat"
    # \x0b is outside the keep-class -> deleted (identically in DuckDB's
    # RE2 mirror, where \s would NOT have matched it)
    assert got[3] == "end next"


def test_norm_tokens_reference_tokenization(spark):
    from proactive_map_reduce_spark.functions.text import norm_tokens

    df = spark.createDataFrame(
        [(0, "The quick  Fox!"), (1, ""), (2, "a an the")],
        "doc_id long, t string",
    )
    got = {
        r["doc_id"]: r["w"]
        for r in df.select("doc_id", norm_tokens("t").alias("w")).collect()
    }
    assert got[0] == ["quick", "fox"]
    assert got[1] == []        # empty -> zero tokens (no-answer), not ['']
    assert got[2] == []        # articles-only normalizes to empty
