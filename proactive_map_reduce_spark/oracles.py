"""DuckDB oracle SQL for every sql-checkable query in ``queries.REGISTRY``.

Each string is ANSI-ish SQL runnable by DuckDB over the pre-registered
views (region nation customer supplier part orders lineitem events
documents embeddings) and must produce the same row set — same column
names, compatible types, doubles rounded to 6 — as the Spark query of the
same name. Shared fragments are built once below so the Spark constants in
``queries.py`` and these strings cannot drift independently.
"""

from __future__ import annotations

from .queries import (
    CHUNK_LEN,
    DROP_BUDGET,
    NEAR_DUP_COS,
    NUM_STEPS,
    RATIO_INC,
    RATIO_LOW,
)

# portable md5-derived 32-bit hash (see functions/hashing.py)
def _h(expr: str, salt: str = "") -> str:
    inner = f"({expr}) || '{salt}'" if salt else expr
    return f"CAST(('0x' || substr(md5({inner}), 1, 8)) AS BIGINT)"


# words of every document with 0-based positions and per-doc count
_WORDS = """
w AS (
  SELECT d.doc_id, t.i - 1 AS pos, d.ws[t.i] AS word, len(d.ws) AS n
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
       UNNEST(generate_series(1, len(d.ws))) AS t(i)
)
"""

# C1 equal-partition chunk assignment + chunk rows
_LAST = NUM_STEPS - 1
_CHUNKS = f"""
ca AS (
  SELECT doc_id, pos, word,
    CAST(CASE WHEN n // {NUM_STEPS} <= 0 THEN {_LAST}
              ELSE least(pos // (n // {NUM_STEPS}), {_LAST}) END AS INT) AS chunk_id
  FROM w
),
chunks AS (
  SELECT doc_id, chunk_id,
         string_agg(word, ' ' ORDER BY pos) AS chunk_text,
         CAST(count(*) AS BIGINT) AS n_words
  FROM ca GROUP BY doc_id, chunk_id
)
"""

# C2 fixed rechunk with tail-merge (tail < 0.3*chunk_len merges back)
_TAIL_LIMIT = 0.3 * CHUNK_LEN
_RECHUNK = f"""
ra AS (
  SELECT doc_id, pos,
    CAST(least(pos // {CHUNK_LEN},
               CASE WHEN nc > 1 AND (n - (nc - 1) * {CHUNK_LEN}) < {_TAIL_LIMIT}
                    THEN nc - 2 ELSE nc - 1 END) AS INT) AS chunk_id
  FROM (SELECT doc_id, pos, n, CAST(ceil(n / {CHUNK_LEN}.0) AS BIGINT) AS nc FROM w) rw
),
rc AS (
  SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(min(pos) AS BIGINT) AS start_pos
  FROM ra GROUP BY doc_id, chunk_id
)
"""

# M1 stand-in model output per chunk (reverse word order)
_MAPPED = """
mapped AS (
  SELECT doc_id, chunk_id,
         array_to_string(list_reverse(string_split(chunk_text, ' ')), ' ') AS out_text,
         CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_out_tokens
  FROM chunks
)
"""

# normalize_text (functions/text.py) in DuckDB form
def _norm(expr: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace(lower("
        + expr
        + "), '[^a-z0-9 ]', '', 'g'), '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g'))"
    )


ORACLES: dict[str, str] = {}

ORACLES["q_scan_documents"] = """
SELECT doc_id, lang, source, n_chars, CAST(length(text) AS BIGINT) AS text_len
FROM documents
"""

ORACLES["q_join_doc_gt"] = """
SELECT a.doc_id, a.text AS src_text, a.lang AS src_lang,
       b.text AS gt_text, b.lang AS gt_lang
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
"""

ORACLES["q_scan_json_dataset"] = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events
"""

ORACLES["q_corpus_split_files"] = """
SELECT CAST(doc_id // 10 AS INT) AS section,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE doc_id // 10 <= 200 GROUP BY 1
"""

ORACLES["q_sentence_split"] = """
SELECT doc_id, CAST(t.i - 1 AS INT) AS sent_pos,
       CAST(length(d.ss[t.i]) AS BIGINT) AS sent_len
FROM (SELECT doc_id,
             string_split(regexp_replace(text, '([.!?])\\s+', '\\1' || chr(1), 'g'), chr(1)) AS ss
      FROM documents) d,
     UNNEST(generate_series(1, len(d.ss))) AS t(i)
WHERE length(d.ss[t.i]) > 0
"""

ORACLES["q_word_split"] = f"""
WITH {_WORDS}
SELECT doc_id, CAST(pos AS INT) AS pos, word FROM w
"""

ORACLES["q_project_lengths"] = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, n_chars
FROM documents
"""

ORACLES["q_filter_empty"] = """
SELECT doc_id, n_chars FROM documents WHERE len(string_split(text, ' ')) > 5
"""

ORACLES["q_limit_head"] = """
SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id LIMIT 20
"""

ORACLES["q_prompt_assemble"] = f"""
WITH {_WORDS}, {_CHUNKS}
SELECT doc_id, chunk_id,
       CAST(length('"' || chunk_text || '"') AS BIGINT) AS prompt_len,
       '"' || chunk_text || '"' AS prompt
FROM chunks
"""

ORACLES["q_tokenize"] = f"""
WITH {_WORDS}
SELECT doc_id, CAST(pos AS INT) AS pos, {_h('word')} % 32000 AS token FROM w
"""

ORACLES["q_partition_equal"] = f"""
WITH {_WORDS}, {_CHUNKS}
SELECT doc_id, chunk_id, chunk_text, n_words FROM chunks
"""

ORACLES["q_rechunk_fixed"] = f"""
WITH {_WORDS}, {_RECHUNK}
SELECT doc_id, chunk_id, n_tokens, start_pos FROM rc
"""

ORACLES["q_split_ratio_schedule"] = f"""
WITH {_WORDS}, {_CHUNKS}
SELECT doc_id, chunk_id,
       round(least({RATIO_LOW} + chunk_id * {RATIO_INC}, 1.0), 6) AS ratio
FROM chunks
"""

ORACLES["q_middle_drop_truncate"] = f"""
WITH RECURSIVE {_WORDS}, {_RECHUNK},
base AS (
  SELECT doc_id, list(chunk_id ORDER BY chunk_id) AS ids,
         list(n_tokens ORDER BY chunk_id) AS lens
  FROM rc GROUP BY doc_id
),
s AS (
  SELECT doc_id, ids, lens FROM base
  UNION ALL
  SELECT doc_id,
         ids[1:len(ids)//2] || ids[len(ids)//2+2:],
         lens[1:len(lens)//2] || lens[len(lens)//2+2:]
  FROM s WHERE len(ids) > 0 AND list_sum(lens) > {DROP_BUDGET}
),
fin AS (
  SELECT doc_id, ids FROM s
  WHERE len(ids) = 0 OR list_sum(lens) <= {DROP_BUDGET}
)
SELECT rc.doc_id, rc.chunk_id, rc.n_tokens
FROM rc JOIN (SELECT doc_id, unnest(ids) AS chunk_id FROM fin) sv
  USING (doc_id, chunk_id)
"""

ORACLES["q_positional_shift"] = f"""
WITH {_WORDS}, {_RECHUNK}
SELECT doc_id, chunk_id, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (
         PARTITION BY doc_id ORDER BY chunk_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS shift
FROM rc
"""

ORACLES["q_llm_map"] = f"""
WITH {_WORDS}, {_CHUNKS}, {_MAPPED}
SELECT doc_id, chunk_id, out_text, n_out_tokens FROM mapped
"""

ORACLES["q_first_line_answer"] = f"""
WITH {_WORDS}, {_CHUNKS}, {_MAPPED}
SELECT doc_id, chunk_id,
       CAST(length(string_split(ltrim(out_text, chr(10)), chr(10))[1]) AS BIGINT) AS answer_len
FROM mapped
"""

ORACLES["q_incremental_concat"] = f"""
WITH {_WORDS}, {_CHUNKS}, {_MAPPED}
SELECT doc_id, string_agg(out_text, ' ' ORDER BY chunk_id) AS final_text,
       CAST(count(*) AS BIGINT) AS n_chunks
FROM mapped GROUP BY doc_id
"""

ORACLES["q_prefix_scan_inputs"] = f"""
WITH {_WORDS}, {_CHUNKS}
SELECT doc_id, chunk_id,
       CAST(length(string_agg(chunk_text, ' ') OVER (
         PARTITION BY doc_id ORDER BY chunk_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS input_len
FROM chunks
"""

def _set_f1_sql(p: str, g: str) -> str:
    """DuckDB mirror of functions.scoring.set_f1 (inputs: distinct lists)."""
    inter = f"len(list_intersect({p}, {g}))"
    prec = f"({inter} / CAST(len({p}) AS DOUBLE))"
    rec = f"({inter} / CAST(len({g}) AS DOUBLE))"
    return (
        f"CASE WHEN len({p}) = 0 OR len({g}) = 0 OR {inter} = 0 THEN 0.0 "
        f"ELSE round(2.0 * {prec} * {rec} / ({prec} + {rec}), 6) END"
    )


ORACLES["q_flagship"] = f"""
WITH {_WORDS}, {_CHUNKS}, {_MAPPED},
fin AS (
  SELECT doc_id, string_agg(out_text, ' ' ORDER BY chunk_id) AS final_text,
         CAST(count(*) AS BIGINT) AS n_chunks
  FROM mapped GROUP BY doc_id
),
gt AS (
  SELECT doc_id, lang,
         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS gt_text
  FROM documents
),
scored AS (
  SELECT f.doc_id, g.lang, f.n_chunks,
         list_distinct(string_split(f.final_text, ' ')) AS p,
         list_distinct(string_split(g.gt_text, ' ')) AS g_set,
         f.final_text, g.gt_text
  FROM fin f JOIN gt g USING (doc_id)
)
SELECT doc_id, lang, n_chunks,
       {_set_f1_sql('p', 'g_set')} AS set_f1,
       CAST({_norm('final_text')} = {_norm('gt_text')} AS INT) AS em,
       CAST(len(list_filter(g_set, x -> NOT list_contains(p, x))) = 0 AS INT) AS subset_acc
FROM scored
"""


# --- batch 2: scalar functions, aggregations, top-k, windows, relational ----

# flagship scored rows as a reusable fragment (for metric aggregates)
_FLAGSHIP_CTES = f"""
{_WORDS}, {_CHUNKS}, {_MAPPED},
fin AS (
  SELECT doc_id, string_agg(out_text, ' ' ORDER BY chunk_id) AS final_text,
         CAST(count(*) AS BIGINT) AS n_chunks
  FROM mapped GROUP BY doc_id
),
gt AS (
  SELECT doc_id, lang,
         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS gt_text
  FROM documents
),
scored AS (
  SELECT f.doc_id, g.lang, f.n_chunks,
         list_distinct(string_split(f.final_text, ' ')) AS p,
         list_distinct(string_split(g.gt_text, ' ')) AS g_set,
         f.final_text, g.gt_text
  FROM fin f JOIN gt g USING (doc_id)
),
flagship AS (
  SELECT doc_id, lang, n_chunks,
         {_set_f1_sql('p', 'g_set')} AS set_f1,
         CAST({_norm('final_text')} = {_norm('gt_text')} AS INT) AS em,
         CAST(len(list_filter(g_set, x -> NOT list_contains(p, x))) = 0 AS INT) AS subset_acc
  FROM scored
)
"""

ORACLES["q_normalize_text"] = f"""
SELECT doc_id, {_norm('text')} AS norm_text FROM documents
"""

ORACLES["q_normalize_question"] = """
WITH q0 AS (
  SELECT doc_id, array_to_string(string_split(text, ' ')[1:5], ' ') AS q FROM documents
),
q1 AS (
  SELECT doc_id, CASE WHEN q LIKE '%?' THEN q ELSE q || '?' END AS q FROM q0
)
SELECT doc_id, lower(substr(q, 1, 1)) || substr(q, 2) AS question FROM q1
"""

ORACLES["q_exact_match"] = f"""
SELECT a.doc_id, CAST({_norm('a.text')} = {_norm('b.text')} AS INT) AS em
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
"""

ORACLES["q_substring_match"] = f"""
WITH g AS (
  SELECT doc_id, text, array_to_string(string_split(text, ' ')[1:3], ' ') AS gold
  FROM documents
)
SELECT doc_id, CAST(contains({_norm('text')}, {_norm('gold')}) AS INT) AS contained FROM g
"""

ORACLES["q_any_answer_contained"] = f"""
WITH a AS (
  SELECT doc_id, text,
         [string_split(text, ' ')[1], 'zzz_nonexistent_token',
          string_split(text, ' ')[-1]] AS answers
  FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(answers, x -> contains({_norm('text')}, {_norm('x')}))) > 0 AS INT)
         AS has_answer
FROM a
"""

ORACLES["q_timing_arith"] = """
SELECT doc_id,
       round(n_chars / CAST(100.0 AS DOUBLE), 6) AS decode_time,
       round(len(string_split(text, ' ')) / (n_chars / CAST(100.0 AS DOUBLE)), 6) AS decoding_speed
FROM documents
"""

ORACLES["q_hash_key"] = """
SELECT doc_id, CAST(t.layer AS INT) AS layer,
       sha256(text || CAST(t.layer AS VARCHAR)) AS cache_key
FROM documents, UNNEST(generate_series(0, 3)) AS t(layer)
"""

ORACLES["q_metrics_avg"] = f"""
WITH {_FLAGSHIP_CTES}
SELECT lang, round(avg(set_f1), 6) AS avg_f1, round(avg(em), 6) AS em_rate,
       CAST(count(*) AS BIGINT) AS n_docs
FROM flagship GROUP BY lang
"""

_BEST_ANS = """
ans AS (
  SELECT doc_id,
         list_distinct(string_split(text, ' ')) AS a_same,
         list_distinct(list_reverse(string_split(text, ' '))) AS a_rev,
         list_distinct(string_split(text, ' ')[1:10]) AS a_head
  FROM documents
)
"""

ORACLES["q_best_of_answers"] = f"""
WITH {_WORDS}, {_CHUNKS}, {_MAPPED},
fin AS (
  SELECT doc_id, string_agg(out_text, ' ' ORDER BY chunk_id) AS final_text
  FROM mapped GROUP BY doc_id
),
{_BEST_ANS},
j AS (
  SELECT f.doc_id, list_distinct(string_split(f.final_text, ' ')) AS p,
         a.a_same, a.a_rev, a.a_head
  FROM fin f JOIN ans a USING (doc_id)
)
SELECT doc_id,
       greatest({_set_f1_sql('p', 'a_same')}, {_set_f1_sql('p', 'a_rev')},
                {_set_f1_sql('p', 'a_head')}) AS best_f1
FROM j
"""

ORACLES["q_union_outputs"] = f"""
WITH {_FLAGSHIP_CTES}
SELECT 'proactive' AS run, doc_id, set_f1 AS f1 FROM flagship
UNION ALL
SELECT 'baseline' AS run, doc_id, CAST(1.0 AS DOUBLE) AS f1 FROM documents
"""

ORACLES["q_mean_over_files"] = f"""
WITH {_FLAGSHIP_CTES},
u AS (
  SELECT 'proactive' AS run, doc_id, set_f1 AS f1 FROM flagship
  UNION ALL
  SELECT 'baseline' AS run, doc_id, CAST(1.0 AS DOUBLE) AS f1 FROM documents
)
SELECT run, round(avg(f1), 6) AS avg_f1, CAST(count(*) AS BIGINT) AS n_rows
FROM u GROUP BY run
"""

ORACLES["q_flatten_nested_times"] = f"""
WITH {_WORDS}, {_CHUNKS}
SELECT d.lang,
       round(avg(round(c.n_words / CAST(4.1 AS DOUBLE), 6)), 6) AS avg_prefill,
       CAST(count(*) AS BIGINT) AS n_times
FROM chunks c JOIN documents d USING (doc_id)
GROUP BY d.lang
"""

ORACLES["q_token_counter_overlap"] = f"""
WITH {_WORDS},
pred AS (SELECT doc_id, word, count(*) AS c_pred FROM w GROUP BY doc_id, word),
gold AS (SELECT doc_id - 1 AS doc_id, word, count(*) AS c_gold FROM w GROUP BY doc_id - 1, word),
tp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pred FROM w GROUP BY doc_id),
tg AS (SELECT doc_id - 1 AS doc_id, CAST(count(*) AS BIGINT) AS n_gold FROM w GROUP BY doc_id - 1),
ov AS (
  SELECT p.doc_id, CAST(sum(least(p.c_pred, g.c_gold)) AS BIGINT) AS n_same
  FROM pred p JOIN gold g USING (doc_id, word) GROUP BY p.doc_id
),
j AS (
  SELECT tp.doc_id, tp.n_pred, tg.n_gold, coalesce(ov.n_same, 0) AS n_same
  FROM tp JOIN tg USING (doc_id) LEFT JOIN ov USING (doc_id)
)
SELECT doc_id,
       round(n_same / CAST(n_pred AS DOUBLE), 6) AS precision,
       round(n_same / CAST(n_gold AS DOUBLE), 6) AS recall,
       round(CASE WHEN n_same = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE 2.0 * (n_same / CAST(n_pred AS DOUBLE)) * (n_same / CAST(n_gold AS DOUBLE))
                       / ((n_same / CAST(n_pred AS DOUBLE)) + (n_same / CAST(n_gold AS DOUBLE)))
             END, 6) AS f1
FROM j
"""

ORACLES["q_set_f1"] = f"""
WITH pr AS (
  SELECT a.doc_id,
         list_distinct(string_split(a.text, ' ')) AS p,
         list_distinct(string_split(b.text, ' ')) AS g_set
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
)
SELECT doc_id, {_set_f1_sql('p', 'g_set')} AS set_f1 FROM pr
"""

ORACLES["q_subset_accuracy"] = """
WITH s AS (
  SELECT doc_id,
         list_distinct(string_split(text, ' ')) AS p,
         list_distinct(string_split(text, ' ')[1:10]) AS g_set
  FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(g_set, x -> NOT list_contains(p, x))) = 0 AS INT) AS subset_acc
FROM s
"""

ORACLES["q_grid_sweep"] = """
WITH params AS (
  SELECT CAST(r.ratio AS DOUBLE) AS ratio, CAST(l.check_layer AS INT) AS check_layer
  FROM (VALUES (0.2), (0.5), (0.8)) r(ratio)
  CROSS JOIN (VALUES (0), (40), (79)) l(check_layer)
),
d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_words FROM documents)
SELECT p.ratio, p.check_layer,
       round(avg(round(p.ratio * d.n_words)), 6) AS avg_selected,
       CAST(count(*) AS BIGINT) AS n_docs
FROM params p CROSS JOIN d
GROUP BY p.ratio, p.check_layer
"""

ORACLES["q_topk_importance"] = """
WITH e AS (
  SELECT user_id, event_id, value,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS pos,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, pos ASC) AS rn,
         greatest(0, least(CAST(round(CAST(0.3 AS DOUBLE) * n) AS BIGINT) - 1, n - 2)) AS k
  FROM e
)
SELECT user_id, pos, event_id,
       CASE WHEN pos >= n - 2 THEN 'tail' ELSE 'topk' END AS selected
FROM r WHERE pos >= n - 2 OR (rn <= k AND pos < n - 2)
"""

ORACLES["q_order_preserve"] = """
SELECT event_id, user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS global_order
FROM events
"""

ORACLES["q_running_metric"] = """
SELECT event_id, user_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
FROM events
"""

ORACLES["q_speedup_model"] = f"""
WITH {_WORDS}, {_CHUNKS},
t AS (
  SELECT doc_id, chunk_id,
         n_words / CAST(4.1 AS DOUBLE) AS ingest,
         n_words * CAST(0.8 AS DOUBLE) AS prefill,
         n_words * CAST(0.5 AS DOUBLE) AS decode,
         coalesce(lead(n_words / CAST(4.1 AS DOUBLE)) OVER (
           PARTITION BY doc_id ORDER BY chunk_id), CAST(0.0 AS DOUBLE)) AS ingest_next
  FROM chunks
),
per_doc AS (
  SELECT doc_id,
         min(CASE WHEN chunk_id = 0 THEN ingest END)
           + sum(greatest(ingest_next, prefill + decode)) AS e2e_proactive,
         sum(ingest) + sum(prefill) + sum(decode) AS e2e_baseline
  FROM t GROUP BY doc_id
)
SELECT doc_id, round(e2e_baseline, 6) AS e2e_baseline,
       round(e2e_proactive, 6) AS e2e_proactive,
       round(e2e_baseline / e2e_proactive, 6) AS speedup
FROM per_doc
"""

ORACLES["q_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-30'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q_top_revenue"] = """
SELECT o.o_orderkey, o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
"""

ORACLES["q_region_revenue"] = """
SELECT r.r_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""

ORACLES["q_window_tumbling"] = """
SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS hour_bucket,
       event_type,
       round(avg(value), 6) AS avg_value,
       round(sum(value), 2) AS sum_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2
"""

ORACLES["q_sessionize"] = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
           AS gap
  FROM events
),
s AS (
  SELECT user_id, event_id, ts,
         CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end
FROM s GROUP BY user_id, session_id
"""


# --- batch 3: dedup / similarity / text analysis / multimodal ---------------

def _shingles_from(src: str) -> str:
    return f"""
sh AS (
  SELECT DISTINCT d.doc_id, array_to_string(d.ws[t.i + 1 : t.i + 3], ' ') AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM {src}) d,
       UNNEST(generate_series(0, greatest(len(d.ws) - 3, 0))) AS t(i)
)
"""


_SHINGLES = _shingles_from("documents")

from .operators.dedup import MINHASH_A, MINHASH_B, MINHASH_PRIME  # noqa: E402

# distinct hashed shingles per doc — both signatures and candidate
# Jaccard run over these (mirrors minhash_with_sets collecting h0 sets)
_HS = f"hs AS (SELECT DISTINCT doc_id, {_h('shingle')} % {MINHASH_PRIME} AS h0 FROM sh)"

_SIG = (
    "sig AS (SELECT doc_id, "
    + ", ".join(
        f"min(({MINHASH_A[j]} * h0 + {MINHASH_B[j]}) % {MINHASH_PRIME}) AS mh_{j}"
        for j in range(16)
    )
    + " FROM hs GROUP BY doc_id)"
)

_BANDED = "banded AS (" + "\nUNION ALL\n".join(
    "SELECT doc_id, {b} AS band_id, {h} AS band_hash FROM sig".format(
        b=b,
        h=_h(
            " || '|' || ".join(f"CAST(mh_{b * 4 + r} AS VARCHAR)" for r in range(4))
        ),
    )
    for b in range(4)
) + ")"

from .operators.dedup import LSH_MAX_BUCKET  # noqa: E402

# Mirrors lsh_candidate_pairs' mega-bucket cap: full i<j expansion only
# among each bucket's K smallest ids (rank ≤ K); members past K star-link
# to the bucket's min id. Buckets ≤ K behave exactly as unbounded banding.
_CAND = f"""
ranked AS (
  SELECT doc_id, band_id, band_hash,
         row_number() OVER (PARTITION BY band_id, band_hash ORDER BY doc_id) AS rk,
         min(doc_id) OVER (PARTITION BY band_id, band_hash) AS rep
  FROM banded
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
    FROM ranked l JOIN ranked r
      ON l.band_id = r.band_id AND l.band_hash = r.band_hash
     AND l.doc_id < r.doc_id
     AND l.rk <= {LSH_MAX_BUCKET} AND r.rk <= {LSH_MAX_BUCKET}
    UNION ALL
    SELECT rep AS doc_a, doc_id AS doc_b FROM ranked WHERE rk > {LSH_MAX_BUCKET}
  )
)
"""


def _jaccard_select(pairs: str, src: str = "sh", key: str = "shingle") -> str:
    return f"""
sizes AS (SELECT doc_id, count(*) AS sz FROM {src} GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM {src} a JOIN {src} b ON a.{key} = b.{key} AND a.doc_id < b.doc_id
  JOIN {pairs} c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       round(coalesce(i.n_inter, 0)
             / CAST(sa.sz + sb.sz - coalesce(i.n_inter, 0) AS DOUBLE), 6) AS jaccard
FROM {pairs} c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
"""


ORACLES["q_dedup_exact"] = f"""
SELECT sha256({_norm('text')}) AS content_key,
       min(doc_id) AS rep_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1
"""

ORACLES["q_minhash_signatures"] = f"""
WITH {_SHINGLES}, {_HS}, {_SIG}
SELECT * FROM sig
"""

ORACLES["q_dedup_minhash_pairs"] = f"""
WITH {_SHINGLES}, {_HS}, {_SIG}, {_BANDED}, {_CAND},
{_jaccard_select('cand', src='hs', key='h0')}
"""

# Signature-agreement guard: candidates confirmed at n_sig_match >= 8
# (est J >= 0.5) before the exact set join — mirrors
# queries.q_dedup_minhash_confirmed / dedup.signature_agreement.
_AGREE_TERMS = " + ".join(
    f"CASE WHEN sa.mh_{j} = sb.mh_{j} THEN 1 ELSE 0 END" for j in range(16)
)
ORACLES["q_dedup_minhash_confirmed"] = f"""
WITH {_SHINGLES}, {_HS}, {_SIG}, {_BANDED}, {_CAND},
agree AS (
  SELECT c.doc_a, c.doc_b, ({_AGREE_TERMS}) AS n_sig_match
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b
),
conf AS (SELECT * FROM agree WHERE n_sig_match >= 8),
sizes AS (SELECT doc_id, count(*) AS sz FROM hs GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM hs a JOIN hs b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
  JOIN conf c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, c.n_sig_match,
       round(coalesce(i.n_inter, 0)
             / CAST(sa.sz + sb.sz - coalesce(i.n_inter, 0) AS DOUBLE), 6) AS jaccard
FROM conf c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b
"""

ORACLES["q_dedup_ngram_jaccard"] = f"""
WITH {_SHINGLES},
blocked AS (
  SELECT doc_id, lang, n_chars // 100 AS blk_bucket FROM documents
),
bpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocked a JOIN blocked b
    ON a.lang = b.lang AND a.blk_bucket = b.blk_bucket AND a.doc_id < b.doc_id
),
{_jaccard_select('bpairs')}
"""

ORACLES["q_simhash"] = f"""
WITH {_WORDS},
wh AS (SELECT doc_id, {_h('word')} AS h FROM w),
pb AS (
  SELECT doc_id, t.b,
         sum(2 * ((h // CAST(pow(2, t.b) AS BIGINT)) % 2) - 1) AS bal
  FROM wh, UNNEST(generate_series(0, 31)) AS t(b)
  GROUP BY doc_id, t.b
)
SELECT doc_id,
       CAST(sum(CASE WHEN bal >= 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS simhash
FROM pb GROUP BY doc_id
"""

# embedding base + cosine fragments
_EMB_BASE = """
base AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
"""


# Chunked unrolled cosine — mirrors operators.similarity exactly: 8 chunk
# sums of 8 terms, combined left-to-right. SQL `+` is left-associative, so
# this string parses to the same IEEE association Spark's codegen computes
# (round-3 change: both engines moved off whole-64-term left-leaning folds
# together, keeping value hashes aligned).
_COS_DIM, _COS_CHUNK = 64, 8


def _chunked_sum_sql(term) -> str:
    chunks = []
    for c0 in range(0, _COS_DIM, _COS_CHUNK):
        chunks.append("(" + " + ".join(term(d) for d in range(c0, c0 + _COS_CHUNK)) + ")")
    return "(" + " + ".join(chunks) + ")"


def _cos_sql(a: str, b: str) -> str:
    # DuckDB lists are 1-based; Spark arrays 0-based — d+1 here ↔ a[d] there
    dot = _chunked_sum_sql(lambda d: f"{a}[{d + 1}] * {b}[{d + 1}]")
    na = f"sqrt({_chunked_sum_sql(lambda d: f'{a}[{d + 1}] * {a}[{d + 1}]')})"
    nb = f"sqrt({_chunked_sum_sql(lambda d: f'{b}[{d + 1}] * {b}[{d + 1}]')})"
    return f"({dot} / ({na} * {nb}))"


ORACLES["q_dedup_embedding"] = f"""
WITH {_EMB_BASE},
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_cos_sql('a.v', 'b.v')}, 6) AS cos_sim
  FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos_sim FROM pairs WHERE cos_sim >= {NEAR_DUP_COS}
"""

ORACLES["q_similarity_topk"] = f"""
WITH {_EMB_BASE},
q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'c.v')}, 6) AS cos_sim
  FROM base c CROSS JOIN q WHERE c.vec_id != q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
"""

ORACLES["q_similarity_lsh"] = f"""
WITH {_EMB_BASE},
bucketed AS (
  SELECT vec_id, v,
         CAST(list_sum(list_transform(generate_series(1, 4),
              i -> CASE WHEN v[i] >= 0 THEN CAST(pow(2, i - 1) AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END)) AS BIGINT) AS bucket
  FROM base
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM bucketed WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round({_cos_sql('q.qv', 'c.v')}, 6) AS cos_sim
  FROM bucketed c JOIN q ON c.bucket = q.qb WHERE c.vec_id != q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 5
"""

# Sketch stats: KMV distinct estimator + equi-width histogram quartiles —
# mirror of queries.q_sketch_stats (portable md5 hash, exact int bins).
ORACLES["q_sketch_stats"] = f"""
WITH {_WORDS},
wl AS (SELECT w.doc_id, w.word, d.lang FROM w JOIN documents d USING (doc_id)),
wh AS (SELECT DISTINCT lang, {_h('word')} AS h FROM wl),
wrn AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM wh
),
kmv AS (
  SELECT lang,
         CAST(CASE WHEN max(rn) < 1024 THEN max(rn)
                   ELSE floor(1023 * 4294967296.0
                              / max(CASE WHEN rn = 1024 THEN h END) + 0.5) END
              AS BIGINT) AS approx_distinct_words
  FROM wrn GROUP BY lang
),
bounds AS (
  SELECT lang, min(n_chars) AS lo, max(n_chars) AS hi, count(*) AS n
  FROM documents GROUP BY lang
),
binned AS (
  SELECT d.lang, b.lo, b.hi, b.n,
         CAST(floor(((d.n_chars - b.lo) * 64) / (b.hi - b.lo + 1)) AS INT) AS bin
  FROM documents d JOIN bounds b USING (lang)
),
cnt AS (
  SELECT lang, lo, hi, n, bin, count(*) AS c
  FROM binned GROUP BY lang, lo, hi, n, bin
),
cum AS (
  SELECT *, sum(c) OVER (PARTITION BY lang ORDER BY bin) AS cum FROM cnt
),
quart AS (
  SELECT lang, lo, hi,
         max(CASE WHEN cum - c < 0.25 * n THEN bin END) AS b25,
         max(CASE WHEN cum - c < 0.50 * n THEN bin END) AS b50,
         max(CASE WHEN cum - c < 0.75 * n THEN bin END) AS b75
  FROM cum GROUP BY lang, lo, hi
)
SELECT k.lang, k.approx_distinct_words,
       CAST(q.lo + floor((q.b25 * (q.hi - q.lo + 1)) / 64) AS BIGINT) AS p25,
       CAST(q.lo + floor((q.b50 * (q.hi - q.lo + 1)) / 64) AS BIGINT) AS p50,
       CAST(q.lo + floor((q.b75 * (q.hi - q.lo + 1)) / 64) AS BIGINT) AS p75
FROM kmv k JOIN quart q USING (lang)
"""


# IVF top-k: deterministic fixed-point Lloyd's, unrolled one CTE pair per
# iteration — mirror of operators/similarity.py ivf_topk (integer L2,
# md5-ranked seeds, floor(s/n + 0.5) centroid quantization).
def _ivf_sql(n_queries=8, k=5, n_clusters=8, nprobe=3, iters=5, scale=1_000_000, train_fraction=None):
    dist = (
        "list_sum(list_transform(generate_series(1, len(x.xi)), "
        "d -> (x.xi[d] - c.ci[d]) * (x.xi[d] - c.ci[d])))"
    )
    if train_fraction is None:
        gate_cte, train_src = "", "xint"
    else:
        th = int(train_fraction * 2**32)
        gate_cte = (
            ",\nxtrain AS (SELECT * FROM xint WHERE "
            f"CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) < {th})"
        )
        train_src = "xtrain"
    parts = [
        f"""
xint AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT)) AS xi,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
){gate_cte},
c0 AS (
  SELECT CAST(rn - 1 AS INT) AS cluster, xi AS ci FROM (
    SELECT xi, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) AS rn
    FROM {train_src}
  ) WHERE rn <= {n_clusters}
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
a{i} AS (
  SELECT vec_id, xi, cluster FROM (
    SELECT x.vec_id, x.xi, c.cluster,
           row_number() OVER (PARTITION BY x.vec_id ORDER BY {dist}, c.cluster) AS rn
    FROM {train_src} x, c{i - 1} c
  ) WHERE rn = 1
),
c{i} AS (
  SELECT cluster, list(CAST(floor(s / n + 0.5) AS BIGINT) ORDER BY d) AS ci FROM (
    SELECT a.cluster, t.d, sum(a.xi[t.d]) AS s, count(*) AS n
    FROM a{i} a, UNNEST(generate_series(1, len(a.xi))) t(d)
    GROUP BY a.cluster, t.d
  ) GROUP BY cluster
)"""
        )
    parts.append(
        f"""
af AS (
  SELECT vec_id, xi, cluster FROM (
    SELECT x.vec_id, x.xi, c.cluster,
           row_number() OVER (PARTITION BY x.vec_id ORDER BY {dist}, c.cluster) AS rn
    FROM xint x, c{iters} c
  ) WHERE rn = 1
),
q AS (
  SELECT a.vec_id AS query_id, a.xi AS qxi, x.v AS qv
  FROM af a JOIN xint x USING (vec_id) WHERE a.vec_id < {n_queries}
),
qp AS (
  SELECT query_id, qv, cluster FROM (
    SELECT x.query_id, x.qv, c.cluster,
           row_number() OVER (PARTITION BY x.query_id ORDER BY
             list_sum(list_transform(generate_series(1, len(x.qxi)),
               d -> (x.qxi[d] - c.ci[d]) * (x.qxi[d] - c.ci[d]))), c.cluster) AS crank
    FROM q x, c{iters} c
  ) WHERE crank <= {nprobe}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round({_cos_sql('p.qv', 'x.v')}, 6) AS cos_sim
  FROM af a JOIN qp p USING (cluster) JOIN xint x ON x.vec_id = a.vec_id
  WHERE a.vec_id != p.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
)"""
    )
    return (
        "WITH " + ",".join(parts)
        + f"\nSELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {k}"
    )


ORACLES["q_similarity_ivf"] = _ivf_sql()

# the 100 TB training path: quantizer trained on the deterministic
# md5-gated half of the corpus, assignment/probing over everything
ORACLES["q_similarity_ivf_sampled"] = _ivf_sql(train_fraction=0.5)

ORACLES["q_lang_id"] = """
WITH l AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS ws FROM documents
),
c AS (
  SELECT doc_id, lang,
    len(list_filter(ws, x -> list_contains(['der','die','das','und','ist'], x))) AS c_de,
    len(list_filter(ws, x -> list_contains(['the','a','of','and','is'], x))) AS c_en,
    len(list_filter(ws, x -> list_contains(['el','la','de','que','y'], x))) AS c_es,
    len(list_filter(ws, x -> list_contains(['le','la','les','et','que'], x))) AS c_fr
  FROM l
)
SELECT doc_id, lang,
  CASE WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
       WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
       WHEN c_es >= c_fr THEN 'es' ELSE 'fr' END AS pred_lang,
  CAST(greatest(c_de, c_en, c_es, c_fr) AS BIGINT) AS marker_hits
FROM c
"""

ORACLES["q_quality_score"] = """
WITH f AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
),
r AS (
  SELECT doc_id,
    len(ws) AS n,
    (length(text) - (len(ws) - 1)) / CAST(len(ws) AS DOUBLE) AS awl,
    len(list_filter(ws, x -> list_contains(
      ['the','a','an','of','to','and','in','is','it','for'], x)))
      / CAST(len(ws) AS DOUBLE) AS sr,
    len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE) AS dr,
    least(len(ws) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) AS ls
  FROM f
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_words,
  round(awl, 6) AS avg_word_len,
  round(sr, 6) AS stopword_ratio,
  round(dr, 6) AS distinct_ratio,
  round(CAST(0.4 AS DOUBLE) * ls + CAST(0.3 AS DOUBLE) * sr
        + CAST(0.3 AS DOUBLE) * dr, 6) AS quality_score
FROM r
"""

ORACLES["q_token_stats"] = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(ceil(length(text) / CAST(4.0 AS DOUBLE)) AS BIGINT) AS n_bpe_est
FROM documents
"""

ORACLES["q_doc_fingerprint"] = f"""
WITH g AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
),
h AS (
  SELECT doc_id, text,
         list_transform(generate_series(0, greatest(len(ws) - 5, 0)),
                        i -> {_h("array_to_string(ws[i + 1 : i + 5], ' ')")}) AS gh
  FROM g
)
SELECT doc_id, md5({_norm('text')}) AS content_md5,
       list_min(gh) AS winnow_min, list_max(gh) AS winnow_max
FROM h
"""

ORACLES["q_multimodal_features"] = f"""
WITH m AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
         {_h('text')} AS h
  FROM documents
)
SELECT doc_id, media_type,
       CAST(length(text) AS BIGINT) AS payload_len,
       md5(text) AS payload_md5,
       CAST(CASE WHEN media_type = 'audio' THEN 0 ELSE h % 1920 END AS BIGINT) AS width,
       CAST(CASE WHEN media_type = 'audio' THEN 0 ELSE (h // 1920) % 1080 END AS BIGINT) AS height,
       CAST(CASE WHEN media_type = 'video' THEN h % 300 ELSE 1 END AS BIGINT) AS n_frames
FROM m
"""


# --- streaming mode / detok / sinks -----------------------------------------

# W1 streaming stage pipeline ≡ batch map stage (same values, different
# physical execution) — strongest possible check for a streaming op.
ORACLES["q_stage_pipeline"] = ORACLES["q_llm_map"]

# W2 final accumulation ≡ batch ordered incremental concat.
ORACLES["q_stateful_accumulate"] = ORACLES["q_incremental_concat"]

# Watermarked streaming windows over in-order buckets ≡ batch aggregation.
ORACLES["q_stream_window_late"] = """
SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS hour_bucket,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""

# F6 BLEU, relational form: clipped n-gram matches / totals per order
# (exact integers) + closed-form smoothed BLEU from those integers —
# mirror of functions/scoring.py bleu_table.
_BLEU_PIV = ",\n       ".join(
    f"CAST(coalesce(max(CASE WHEN n = {n} THEN {src} END), 0) AS BIGINT) AS {src}{n}"
    for n in range(1, 5)
    for src in ("m", "t")
)
_BLEU_LOGSUM = " + ".join(
    f"(CASE WHEN least(4, t1) >= {n} THEN ln(CASE WHEN m{n} = 0 "
    f"THEN 1.0 / (2.0 * t{n}) ELSE m{n} / CAST(t{n} AS DOUBLE) END) "
    f"ELSE 0.0 END)"
    for n in range(1, 5)
)
ORACLES["q_bleu"] = f"""
WITH {_WORDS}, {_CHUNKS}, {_MAPPED},
fin AS (
  SELECT doc_id, string_agg(out_text, ' ' ORDER BY chunk_id) AS final_text
  FROM mapped GROUP BY doc_id
),
ptoks AS (SELECT doc_id, string_split(final_text, ' ') AS toks FROM fin),
gtoks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
png AS (
  SELECT doc_id, r.n, array_to_string(toks[s.i:s.i + r.n - 1], ' ') AS g
  FROM ptoks, range(1, 5) r(n),
       UNNEST(generate_series(1, len(toks) - r.n + 1)) s(i)
),
gng AS (
  SELECT doc_id, r.n, array_to_string(toks[s.i:s.i + r.n - 1], ' ') AS g
  FROM gtoks, range(1, 5) r(n),
       UNNEST(generate_series(1, len(toks) - r.n + 1)) s(i)
),
pcnt AS (SELECT doc_id, n, g, count(*) AS c FROM png GROUP BY doc_id, n, g),
gcnt AS (SELECT doc_id, n, g, count(*) AS cg FROM gng GROUP BY doc_id, n, g),
per_n AS (
  SELECT p.doc_id, p.n,
         sum(least(p.c, coalesce(q.cg, 0))) AS m, sum(p.c) AS t
  FROM pcnt p LEFT JOIN gcnt q USING (doc_id, n, g)
  GROUP BY p.doc_id, p.n
),
piv AS (
  SELECT doc_id,
       {_BLEU_PIV}
  FROM per_n GROUP BY doc_id
),
lens AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len_g
  FROM documents
)
SELECT piv.doc_id, t1 AS len_p, len_g,
       m1, t1, m2, t2, m3, t3, m4, t4,
       round(
         (CASE WHEN t1 > len_g THEN 1.0
               ELSE exp(1.0 - len_g / CAST(t1 AS DOUBLE)) END)
         * exp(({_BLEU_LOGSUM}) / least(4, t1)), 6) AS bleu
FROM piv JOIN lens USING (doc_id)
"""

# F7 ROUGE-L: recursive-CTE row DP for the LCS integer. Row i of the DP
# depends only on row i-1: dp[i][j] = max(dp[i-1][j], RM[j]) where RM is
# the running max over j of (b[j]=a[i] ? dp[i-1][j-1]+1 : 0) — the
# "use a[i] matched at some j' ≤ j" branch collapsed into one window.
ORACLES["q_rouge"] = f"""
WITH RECURSIVE {_WORDS}, {_CHUNKS}, {_MAPPED},
fin AS (
  SELECT doc_id, string_agg(out_text, ' ' ORDER BY chunk_id) AS final_text
  FROM mapped GROUP BY doc_id
),
ptoks AS (SELECT doc_id, string_split(final_text, ' ') AS toks FROM fin),
gtoks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
pw AS (SELECT doc_id, s.i AS i, toks[s.i] AS a
       FROM ptoks, UNNEST(generate_series(1, len(toks))) s(i)),
gw AS (SELECT doc_id, s.j AS j, toks[s.j] AS b
       FROM gtoks, UNNEST(generate_series(1, len(toks))) s(j)),
dp AS (
  SELECT doc_id, 0 AS i, j, b, 0 AS v FROM gw
  UNION ALL
  SELECT doc_id, i, j, b, greatest(v_keep, rm) AS v FROM (
    SELECT doc_id, i, j, b, v_keep,
           max(CASE WHEN matched THEN lagv + 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY j ROWS UNBOUNDED PRECEDING) AS rm
    FROM (
      SELECT d.doc_id, d.i + 1 AS i, d.j AS j, d.b,
             d.v AS v_keep,
             coalesce(lag(d.v) OVER (PARTITION BY d.doc_id ORDER BY d.j), 0) AS lagv,
             (d.b = p.a) AS matched
      FROM dp d JOIN pw p ON p.doc_id = d.doc_id AND p.i = d.i + 1
    ) s1
  ) s2
),
lens AS (
  SELECT p.doc_id, len(p.toks) AS lp, len(g.toks) AS lg
  FROM ptoks p JOIN gtoks g USING (doc_id)
),
lcs AS (
  SELECT l.doc_id, CAST(coalesce(max(d.v), 0) AS BIGINT) AS lcs,
         CAST(l.lp AS BIGINT) AS len_p, CAST(l.lg AS BIGINT) AS len_g
  FROM lens l LEFT JOIN dp d ON d.doc_id = l.doc_id AND d.i = l.lp
  GROUP BY l.doc_id, l.lp, l.lg
)
SELECT doc_id, lcs, len_p, len_g,
       round(CASE WHEN lcs = 0 THEN 0.0
                  ELSE 2.0 * (lcs / CAST(len_p AS DOUBLE)) * (lcs / CAST(len_g AS DOUBLE))
                       / ((lcs / CAST(len_p AS DOUBLE)) + (lcs / CAST(len_g AS DOUBLE))) END,
             6) AS rouge_l
FROM lcs
"""

# M2 vocabulary detok: one md5-derived token id per word; collisions
# resolve to min word on both sides.
ORACLES["q_decode_detok"] = f"""
WITH {_WORDS},
tok AS (SELECT doc_id, pos, {_h('word')} % 32000 AS tok FROM w),
vocab AS (SELECT {_h('word')} % 32000 AS tok, min(word) AS word FROM w GROUP BY 1)
SELECT t.doc_id, string_agg(v.word, ' ' ORDER BY t.pos) AS decoded_text
FROM tok t JOIN vocab v USING (tok)
GROUP BY t.doc_id
"""

# S4 sink round-trip: the JSONL write/read must preserve the metric rows.
ORACLES["q_sink_jsonl_append"] = """
SELECT doc_id, lang AS dataset, CAST(length(text) AS BIGINT) AS output_len
FROM documents
"""


# --- R3 / multimodal resize / frame sampling --------------------------------

ORACLES["q_kv_concat"] = f"""
WITH {_WORDS}, {_CHUNKS.replace("string_agg(word, ' ' ORDER BY pos) AS chunk_text",
                                "1 AS chunk_text")}
, toks AS (
  SELECT doc_id, pos, {_h('word')} % 32000 AS tok,
    CAST(CASE WHEN n // {NUM_STEPS} <= 0 THEN {NUM_STEPS - 1}
              ELSE least(pos // (n // {NUM_STEPS}), {NUM_STEPS - 1}) END AS INT) AS chunk_id
  FROM w
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(tok) AS BIGINT) AS tok_checksum
FROM toks GROUP BY doc_id
"""

# fake decode dims from md5(payload) — payload is utf-8 text bytes, so
# md5(payload) == md5(text); integer aspect math mirrored exactly.
_MM_META = """
m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
         CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h,
         CAST(length(text) AS BIGINT) AS payload_len
  FROM documents
)
"""

ORACLES["q_multimodal_resize"] = f"""
WITH {_MM_META},
dims AS (
  SELECT doc_id, media_type,
         CAST(CASE WHEN media_type = 'audio' THEN 0 ELSE h % 1920 END AS BIGINT) AS width,
         CAST(CASE WHEN media_type = 'audio' THEN 0 ELSE (h // 1920) % 1080 END AS BIGINT) AS height
  FROM m
)
SELECT doc_id, media_type, width, height,
       CAST(CASE WHEN width <= 0 THEN 0 ELSE least(width, 512) END AS BIGINT) AS out_width,
       CAST(CASE WHEN width <= 0 THEN 0
                 ELSE height * least(width, 512) // width END AS BIGINT) AS out_height,
       CAST(CASE WHEN width <= 0 THEN 0
                 ELSE length('resized:' || CAST(least(width, 512) AS VARCHAR) || ':'
                      || CAST(height * least(width, 512) // width AS VARCHAR)) END AS BIGINT)
         AS out_payload_len
FROM dims
"""

ORACLES["q_multimodal_frames"] = f"""
WITH {_MM_META},
vids AS (
  SELECT doc_id, CAST(h % 300 AS BIGINT) AS n_frames
  FROM m WHERE media_type = 'video' AND h % 300 > 0
)
SELECT doc_id, n_frames, CAST(t.f AS BIGINT) AS frame_id
FROM vids, UNNEST(generate_series(0, n_frames - 1, 30)) AS t(f)
"""


# --- skew mitigation / rollup / text-corpus source --------------------------

ORACLES["q_salted_agg"] = """
SELECT event_type, round(sum(value), 2) AS sum_value,
       CAST(count(*) AS BIGINT) AS n_rows
FROM events GROUP BY event_type
"""

ORACLES["q_salted_join"] = """
SELECT s.s_nationkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
"""

ORACLES["q_rollup_multi"] = """
SELECT event_type,
       CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY ROLLUP (event_type, date_trunc('day', ts))
"""

ORACLES["q_scan_text_corpus"] = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
FROM documents
"""


# --- set operations / corpus statistics --------------------------------------

ORACLES["q_intersect_docs"] = """
SELECT doc_id, lang FROM documents WHERE n_chars < 300
INTERSECT
SELECT doc_id, lang FROM documents WHERE doc_id < 250
"""

ORACLES["q_except_docs"] = """
SELECT doc_id, lang FROM documents WHERE n_chars < 300
EXCEPT ALL
SELECT doc_id, lang FROM documents WHERE doc_id < 250
"""

ORACLES["q_corpus_stats"] = f"""
WITH {_WORDS},
wl AS (
  SELECT d.lang, w.word
  FROM w JOIN documents d USING (doc_id)
),
pw AS (
  SELECT lang, CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_words,
         CAST(count(*) AS BIGINT) AS n_words_total
  FROM wl GROUP BY lang
),
pd AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         round(quantile_cont(n_chars, 0.5), 6) AS median_chars
  FROM documents GROUP BY lang
)
SELECT pd.lang, n_docs, median_chars, n_distinct_words, n_words_total
FROM pd JOIN pw USING (lang)
"""

ORACLES["q_head_cap"] = """
SELECT event_id, event_type, round(value, 6) AS value
FROM events ORDER BY event_id LIMIT 5
"""

ORACLES["q_stream_stream_join"] = """
SELECT l.user_id,
       l.event_id AS l_id,
       r.event_id AS r_id,
       CAST(epoch_us(r.ts) - epoch_us(l.ts) AS BIGINT) AS gap_us
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND l.event_type = 'click' AND r.event_type = 'view'
 AND r.ts BETWEEN l.ts - INTERVAL 30 MINUTE AND l.ts + INTERVAL 30 MINUTE
"""

ORACLES["q_promo_revenue"] = """
SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_share,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1998-01-01' AND l.l_shipdate < DATE '1998-03-01'
"""

ORACLES["q_asof_join"] = """
SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
       CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS age_us
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND v.ts <= c.ts
"""

# batch range join shares the stream-stream join's result set
ORACLES["q_range_join"] = ORACLES["q_stream_stream_join"]


ORACLES["q_qa_pipeline"] = f"""
WITH RECURSIVE {_WORDS}, {_RECHUNK},
base AS (
  SELECT doc_id, list(chunk_id ORDER BY chunk_id) AS ids,
         list(n_tokens ORDER BY chunk_id) AS lens
  FROM rc GROUP BY doc_id
),
s AS (
  SELECT doc_id, ids, lens FROM base
  UNION ALL
  SELECT doc_id,
         ids[1:len(ids)//2] || ids[len(ids)//2+2:],
         lens[1:len(lens)//2] || lens[len(lens)//2+2:]
  FROM s WHERE len(ids) > 0 AND list_sum(lens) > {DROP_BUDGET}
),
fin AS (
  SELECT doc_id, ids FROM s
  WHERE len(ids) = 0 OR list_sum(lens) <= {DROP_BUDGET}
),
kept AS (SELECT doc_id, unnest(ids) AS chunk_id FROM fin),
wc AS (
  SELECT ra.doc_id, ra.chunk_id, w.word,
         (k.chunk_id IS NOT NULL) AS keep
  FROM ra JOIN w USING (doc_id, pos)
  LEFT JOIN kept k ON k.doc_id = ra.doc_id AND k.chunk_id = ra.chunk_id
),
mx AS (SELECT doc_id, max(chunk_id) AS mc FROM ra GROUP BY doc_id),
sets AS (
  SELECT wc.doc_id,
         list_distinct(list(word) FILTER (keep)) AS kept_set,
         list_distinct(list(word)) AS full_set,
         list_distinct(list(word) FILTER (wc.chunk_id = mx.mc)) AS last_set,
         CAST(count(*) FILTER (keep) AS BIGINT) AS kept_tokens,
         CAST(count(DISTINCT wc.chunk_id) FILTER (keep) AS BIGINT) AS n_chunks_kept
  FROM wc JOIN mx USING (doc_id)
  GROUP BY wc.doc_id
)
SELECT doc_id, n_chunks_kept, kept_tokens,
       greatest({_set_f1_sql('kept_set', 'full_set')},
                {_set_f1_sql('kept_set', 'last_set')}) AS best_f1
FROM sets
"""


# Transitive closure of the LSH pair graph; representative = min
# reachable node (including self). The pair derivation is the
# q_dedup_minhash_pairs oracle minus the jaccard scoring.
_LSH_PAIRS_SQL = ORACLES["q_dedup_minhash_pairs"]
ORACLES["q_dedup_clusters"] = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_LSH_PAIRS_SQL}) base_pairs
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       least(src, min(dst)) AS cluster_rep
FROM reach GROUP BY src
"""

# native session_window ≡ gap-based sessionization: a session starts at
# any event >30 min after its predecessor; session key = min ts in group.
ORACLES["q_session_window"] = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, value
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
)
SELECT user_id,
       CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM s GROUP BY user_id, sess_id
"""

# sliding window: event at t belongs to starts {floor(t/1800)*1800,
# floor(t/1800)*1800 - 1800} (width 3600, slide 1800).
ORACLES["q_window_sliding"] = """
WITH e AS (
  SELECT event_type, value,
         (epoch_us(ts) // 1000000) AS t
  FROM events
),
x AS (
  SELECT event_type, value,
         (t // 1800) * 1800 - u.k * 1800 AS win_start_s
  FROM e, UNNEST([0, 1]) AS u(k)
)
SELECT CAST(win_start_s AS BIGINT) AS win_start_s, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM x GROUP BY 1, 2
"""

ORACLES["q_sink_partitioned"] = """
SELECT doc_id, n_chars FROM documents WHERE lang = 'en'
"""

ORACLES["q_semi_anti_join"] = """
SELECT c_mktsegment,
       CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            THEN 1 ELSE 0 END AS has_orders,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer c
GROUP BY 1, 2
"""

ORACLES["q_cube_events"] = """
SELECT event_type,
       CAST(dayofweek(ts) AS INT) + 1 AS dow,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY CUBE (event_type, CAST(dayofweek(ts) AS INT) + 1)
"""


ORACLES["q_embed_documents"] = f"""
WITH v AS (
  SELECT doc_id,
         [round(({_h("text || CAST(i AS VARCHAR)")} % 10000) / 10000.0, 6)
          FOR i IN range(0, 8)] AS emb
  FROM documents
)
SELECT doc_id, CAST(8 AS INT) AS dim,
       round(list_sum(emb), 6) AS emb_sum,
       emb[1] AS emb_0
FROM v
"""

# Gopher-style repetition signals: k-gram lists built with 1-based
# inclusive slices (ws[i+1 : i+k] = k words), mirroring Spark's
# slice(ws, i+1, k).
ORACLES["q_repetition_signals"] = """
WITH g AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
r AS (
  SELECT doc_id,
    CASE WHEN len(ws) >= 2 THEN list_transform(
      generate_series(0, len(ws) - 2),
      i -> array_to_string(ws[i + 1 : i + 2], ' '))
    ELSE CAST([] AS VARCHAR[]) END AS g2,
    CASE WHEN len(ws) >= 3 THEN list_transform(
      generate_series(0, len(ws) - 3),
      i -> array_to_string(ws[i + 1 : i + 3], ' '))
    ELSE CAST([] AS VARCHAR[]) END AS g3
  FROM g
)
SELECT doc_id,
  CAST(len(g2) AS BIGINT) AS n_bigrams,
  CAST(len(g3) AS BIGINT) AS n_trigrams,
  round(CASE WHEN len(g2) > 0 THEN
    list_max(list_transform(list_distinct(g2),
                            d -> len(list_filter(g2, x -> x = d))))
      / CAST(len(g2) AS DOUBLE)
    ELSE 0.0 END, 6) AS top_bigram_frac,
  round(CASE WHEN len(g3) > 0 THEN
    len(list_filter(g3, y -> len(list_filter(g3, x -> x = y)) > 1))
      / CAST(len(g3) AS DOUBLE)
    ELSE 0.0 END, 6) AS dup_trigram_frac
FROM r
"""

ORACLES["q_pivot_event_types"] = """
SELECT user_id,
  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
FROM events
GROUP BY user_id
"""

# Streaming watermarked dedup == batch DISTINCT over the same
# at-least-once (duplicated) delivery.
ORACLES["q_stream_dedup"] = """
WITH delivered AS (
  SELECT * FROM events
  UNION ALL
  SELECT * FROM events WHERE event_id % 10 = 0
)
SELECT DISTINCT event_id, user_id, event_type,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us, value
FROM delivered
"""

# CSV sink/source round-trip must preserve the rows exactly.
ORACLES["q_scan_csv_roundtrip"] = """
SELECT doc_id, lang, text FROM documents
"""

ORACLES["q_ship_priority"] = """
SELECT o.o_orderkey, o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-06-01'
  AND l.l_shipdate > DATE '1998-06-01'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""

ORACLES["q_stratified_sample"] = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_h("CAST(doc_id AS VARCHAR)", salt="sample")} % 100 <
      CASE lang WHEN 'de' THEN 100 WHEN 'en' THEN 25
                WHEN 'es' THEN 50 WHEN 'fr' THEN 75 ELSE 0 END
"""

ORACLES["q_orc_roundtrip"] = """
SELECT doc_id, lang, n_chars FROM documents
"""

ORACLES["q_topn_per_group"] = """
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT c.c_mktsegment,
         CAST(row_number() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY s.total_spend DESC, c.c_custkey) AS INT) AS rank,
         c.c_custkey, s.total_spend
  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
)
SELECT c_mktsegment, rank, c_custkey, total_spend
FROM ranked WHERE rank <= 3
"""


# --- retrieval ranking + curation gates ------------------------------------

ORACLES["q_tfidf_top_terms"] = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tc AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
dfs AS (SELECT term, count(*) AS df_t FROM tc GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tc.doc_id, tc.term, tc.tf, dfs.df_t,
         round(tc.tf * (ln((n.n_docs + 1) / CAST(dfs.df_t + 1 AS DOUBLE)) + 1), 6)
           AS tfidf
  FROM tc JOIN dfs USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rnk
  FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df_t AS BIGINT) AS df_t,
       tfidf, rnk
FROM ranked WHERE rnk <= 3
"""

# BM25 with k1=1.2, b=0.75 and Robertson idf; expression shapes mirror
# operators/ranking.py term-for-term so both engines compute identical
# doubles before the 6-place round.
ORACLES["q_bm25_search"] = """
WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
hits AS (
  SELECT doc_id, term, count(*) AS tf FROM w
  WHERE term IN ('join', 'hash', 'stream') GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df_t FROM hits GROUP BY term),
scored AS (
  SELECT h.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * h.tf * (1.2 + 1)
           / (h.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS contrib
  FROM hits h JOIN dfs d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
per_doc AS (
  SELECT doc_id, round(sum(contrib), 6) AS bm25,
         CAST(count(*) AS BIGINT) AS n_terms_hit
  FROM scored GROUP BY doc_id
)
SELECT doc_id, bm25, n_terms_hit FROM per_doc
ORDER BY bm25 DESC, doc_id LIMIT 10
"""

ORACLES["q_blocklist_filter"] = """
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS n_words
FROM d WHERE NOT (list_contains(ws, 'error') OR list_contains(ws, 'slow'))
"""


ORACLES["q_sentence_dedup"] = """
WITH s AS (
  SELECT doc_id, t.i - 1 AS sent_pos, d.ss[t.i] AS sentence
  FROM (SELECT doc_id,
               string_split(regexp_replace(text, '([.!?])\\s+', '\\1' || chr(1), 'g'),
                            chr(1)) AS ss
        FROM documents) d,
       UNNEST(generate_series(1, len(d.ss))) AS t(i)
  WHERE length(d.ss[t.i]) > 0
),
k AS (
  SELECT doc_id, sent_pos, md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(sentence), '[^a-z0-9 ]', '', 'g'), '\\b(a|an|the)\\b', ' ', 'g'), '\\s+', ' ', 'g'))) AS sent_key FROM s
),
f AS (
  SELECT doc_id,
         CASE WHEN row_number() OVER (
           PARTITION BY sent_key ORDER BY doc_id, sent_pos) = 1
         THEN 1 ELSE 0 END AS is_first
  FROM k
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sents,
       CAST(sum(is_first) AS BIGINT) AS n_kept,
       round(sum(is_first) / CAST(count(*) AS DOUBLE), 6) AS keep_frac
FROM f GROUP BY doc_id
"""


ORACLES["q_local_supplier_volume"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
GROUP BY n_name
"""

ORACLES["q_unigram_lm_score"] = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tc AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
ctf AS (SELECT term, sum(tf) AS ctf FROM tc GROUP BY term),
tot AS (SELECT sum(ctf) AS total_tokens FROM ctf),
s AS (
  SELECT tc.doc_id, tc.tf,
         -tc.tf * ln(ctf.ctf / CAST(tot.total_tokens AS DOUBLE)) AS surprisal
  FROM tc JOIN ctf USING (term) CROSS JOIN tot
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       round(sum(surprisal) / sum(tf), 6) AS avg_surprisal
FROM s GROUP BY doc_id
"""


# Stream-static enrichment == the batch equi-join (inner join output is
# final per micro-batch; no watermark semantics involved).
ORACLES["q_stream_static_enrich"] = """
SELECT e.event_id, e.user_id, e.event_type,
       c.c_mktsegment AS segment, round(e.value, 6) AS value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""

# JSON round-trip: serialize then path-extract == direct projection.
ORACLES["q_json_extract"] = """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM documents
"""


# Hybrid retrieval: the BM25 top-20 CTE chain reused, then stand-in
# embedding cosine rerank against the encoded literal query string.
ORACLES["q_hybrid_search"] = """
WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
hits AS (
  SELECT doc_id, term, count(*) AS tf FROM w
  WHERE term IN ('join', 'hash', 'stream') GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df_t FROM hits GROUP BY term),
scored AS (
  SELECT h.doc_id,
         ln(1 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * h.tf * (1.2 + 1)
           / (h.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS contrib
  FROM hits h JOIN dfs d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
),
cand AS (
  SELECT doc_id, round(sum(contrib), 6) AS bm25
  FROM scored GROUP BY doc_id
  ORDER BY bm25 DESC, doc_id LIMIT 20
),
vecs AS (
  SELECT c.doc_id, c.bm25,
         list_transform(generate_series(0, 7), i -> round((CAST(('0x' || substr(md5(((d.text) || CAST(i AS VARCHAR))), 1, 8)) AS BIGINT) % 10000) / 10000.0, 6)) AS dv,
         list_transform(generate_series(0, 7), i -> round((CAST(('0x' || substr(md5((('join hash stream') || CAST(i AS VARCHAR))), 1, 8)) AS BIGINT) % 10000) / 10000.0, 6)) AS qv
  FROM cand c JOIN documents d USING (doc_id)
),
reranked AS (
  SELECT doc_id, bm25, round((list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * dv[i])) / (sqrt(list_sum(list_transform(qv, x -> x * x))) * sqrt(list_sum(list_transform(dv, x -> x * x))))), 6) AS cos_sim
  FROM vecs
)
SELECT doc_id, bm25, cos_sim,
       CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS INT) AS rank
FROM reranked QUALIFY rank <= 5
"""


ORACLES["q_value_percentiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""

ORACLES["q_event_interarrival"] = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       round(sum(gap_us) / CAST(count(*) AS DOUBLE) / 1e6, 6) AS mean_gap_s,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(sum(CASE WHEN gap_us < 60000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bursts
FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
"""


# The maintained incremental view must equal the full recompute.
ORACLES["q_incremental_rollup"] = """
SELECT user_id, round(sum(value), 6) AS total_value,
       CAST(count(value) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


ORACLES["q_pack_sequences"] = """
WITH toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents
),
packed AS (
  SELECT doc_id, lang, n_tok,
         coalesce(sum(n_tok) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM toks
)
SELECT lang, CAST(floor(start_off / 256.0) AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM packed GROUP BY lang, CAST(floor(start_off / 256.0) AS BIGINT)
"""


# Composed curation pipeline: gate -> minhash drop -> sentence dedup ->
# pack. Mirrors queries.q_curation_pipeline stage by stage; the minhash
# CTEs are the q_dedup_minhash_pairs oracle re-rooted at the gated docs.
ORACLES["q_curation_pipeline"] = f"""
WITH gated AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
      round(CAST(0.4 AS DOUBLE) * least(len(string_split(text, ' '))
                / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
          + CAST(0.3 AS DOUBLE) * (len(list_filter(string_split(text, ' '),
                x -> list_contains(['the','a','an','of','to','and','in','is','it','for'], x)))
                / CAST(len(string_split(text, ' ')) AS DOUBLE))
          + CAST(0.3 AS DOUBLE) * (len(list_distinct(string_split(text, ' ')))
                / CAST(len(string_split(text, ' ')) AS DOUBLE)), 6) AS q
    FROM documents)
  WHERE q >= 0.40
),
{_shingles_from('gated')},
{_HS}, {_SIG}, {_BANDED}, {_CAND},
sizes AS (SELECT doc_id, count(*) AS sz FROM hs GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM hs a JOIN hs b ON a.h0 = b.h0 AND a.doc_id < b.doc_id
  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
  GROUP BY 1, 2
),
jacc AS (
  SELECT c.doc_a, c.doc_b,
         round(coalesce(i.n_inter, 0)
               / CAST(sa.sz + sb.sz - coalesce(i.n_inter, 0) AS DOUBLE), 6) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
),
dropped AS (SELECT DISTINCT doc_b AS doc_id FROM jacc WHERE jaccard >= 0.5),
surv AS (
  SELECT g.* FROM gated g LEFT JOIN dropped x ON g.doc_id = x.doc_id
  WHERE x.doc_id IS NULL
),
s AS (
  SELECT doc_id, lang, t.i - 1 AS sent_pos, d.ss[t.i] AS sentence
  FROM (SELECT doc_id, lang,
               string_split(regexp_replace(text, '([.!?])\\s+', '\\1' || chr(1), 'g'),
                            chr(1)) AS ss
        FROM surv) d,
       UNNEST(generate_series(1, len(d.ss))) AS t(i)
  WHERE length(d.ss[t.i]) > 0
),
k AS (
  SELECT doc_id, lang, sent_pos,
         len(string_split(sentence, ' ')) AS sent_tok,
         md5(trim(regexp_replace(regexp_replace(regexp_replace(lower(sentence),
             '[^a-z0-9 ]', '', 'g'), '\\b(a|an|the)\\b', ' ', 'g'),
             '\\s+', ' ', 'g'))) AS sent_key
  FROM s
),
f AS (
  SELECT doc_id, lang, sent_tok,
         CASE WHEN row_number() OVER (
           PARTITION BY sent_key ORDER BY doc_id, sent_pos) = 1
         THEN 1 ELSE 0 END AS is_first
  FROM k
),
kept AS (
  SELECT doc_id, lang, sum(is_first * sent_tok) AS n_tok
  FROM f GROUP BY doc_id, lang
),
packed AS (
  SELECT doc_id, lang, n_tok,
         coalesce(sum(n_tok) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM kept
)
SELECT lang, CAST(floor(start_off / 256.0) AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM packed GROUP BY lang, CAST(floor(start_off / 256.0) AS BIGINT)
"""

ORACLES["q_pii_redact"] = """
WITH dirty AS (
  SELECT doc_id, text ||
    CASE WHEN doc_id % 4 = 0 THEN ' contact me at user.name@example.com now'
         WHEN doc_id % 4 = 1 THEN ' call 555-123-4567 or 555-987-6543'
         WHEN doc_id % 4 = 2 THEN ' server at 192.168.1.77 responded'
         ELSE '' END AS t
  FROM documents
),
s AS (
  SELECT doc_id, t,
    regexp_replace(t, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                   '[EMAIL]', 'g') AS s1
  FROM dirty
),
s2 AS (
  SELECT doc_id, t,
    regexp_replace(s1, '\\b\\d{3}-\\d{3}-\\d{4}\\b', '[PHONE]', 'g') AS p
  FROM s
),
s3 AS (
  SELECT doc_id, t, p,
    regexp_replace(p, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                   '[IP]', 'g') AS clean
  FROM s2
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t,
    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(p,
    '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ips,
  CAST(length(clean) AS BIGINT) AS clean_len,
  CASE WHEN strpos(clean, '@') = 0 THEN 1 ELSE 0 END AS no_email_left
FROM s3
"""

ORACLES["q_decontaminate"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g5 AS (
  SELECT DISTINCT d.doc_id,
         {_h("array_to_string(d.ws[t.i + 1 : t.i + 5], ' ')")} AS g
  FROM w d, UNNEST(generate_series(0, greatest(len(d.ws) - 5, 0))) AS t(i)
),
bench AS (SELECT doc_id AS bench_id, g FROM g5 WHERE doc_id % 17 = 0),
train AS (SELECT doc_id, g FROM g5 WHERE doc_id % 17 <> 0)
SELECT t.doc_id,
  CAST(count(DISTINCT t.g) AS BIGINT) AS n_contaminated_grams,
  CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs_hit
FROM train t JOIN bench b ON t.g = b.g
GROUP BY t.doc_id
"""

# TRY_CAST mirrors Spark's cast-to-null: a digit-free source falls to the
# ELSE 25 branch on BOTH engines instead of raising in DuckDB's strict CAST.
ORACLES["q_corpus_mix"] = f"""
WITH k AS (
  SELECT source,
         CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 3 = 0 THEN 100
              WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 3 = 1 THEN 50
              ELSE 25 END AS target_pct,
         CASE WHEN {_h("CAST(doc_id AS VARCHAR)", salt="mix")} % 100 <
              CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 3 = 0 THEN 100
                   WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 3 = 1 THEN 50
                   ELSE 25 END
         THEN 1 ELSE 0 END AS keep
  FROM documents
)
SELECT source, target_pct,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(keep) AS BIGINT) AS n_kept,
       round(sum(keep) / CAST(count(*) AS DOUBLE), 6) AS realized_frac
FROM k GROUP BY source, target_pct
"""

ORACLES["q_quantize_embeddings"] = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
  FROM v
),
q AS (
  SELECT vec_id, s,
         list_transform(v, x -> CAST(round(x / s) AS INT)) AS qv,
         list_transform(v, x -> abs(x - round(x / s) * s)) AS errv
  FROM s
)
SELECT vec_id, round(s, 6) AS scale,
       CAST(list_max(qv) AS INT) AS q_max,
       CAST(list_min(qv) AS INT) AS q_min,
       round(list_max(errv), 6) AS max_abs_err
FROM q
"""

ORACLES["q_resample_ffill"] = """
WITH b AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS h0,
         date_trunc('hour', max(ts)) AS h1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM b
),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, round(avg(value), 6) AS v
  FROM events GROUP BY 1, 2
),
j AS (
  SELECT g.user_id, g.hour, h.v
  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
)
SELECT user_id,
       CAST(floor(epoch(hour)) AS BIGINT) AS hour_ts,
       round(last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_ffill,
       CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_gap
FROM j
"""

ORACLES["q_event_anomaly"] = """
WITH s AS (
  SELECT user_id, event_id, value,
         avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS mu,
         stddev(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS sd
  FROM events
)
SELECT user_id, event_id,
       round((value - mu) / sd, 6) AS z,
       CASE WHEN abs((value - mu) / sd) > 2 THEN 1 ELSE 0 END AS is_anomaly
FROM s WHERE sd IS NOT NULL AND sd > 0
"""

ORACLES["q_vocab_oov"] = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
f AS (SELECT word, count(*) AS c FROM w GROUP BY word),
v AS (SELECT word FROM f ORDER BY c DESC, word LIMIT 1000),
j AS (
  SELECT w.doc_id, CASE WHEN v.word IS NULL THEN 1 ELSE 0 END AS oov
  FROM w LEFT JOIN v ON w.word = v.word
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(oov) AS BIGINT) AS n_oov,
       round(sum(oov) / CAST(count(*) AS DOUBLE), 6) AS oov_rate
FROM j GROUP BY doc_id
"""

ORACLES["q_html_strip"] = """
WITH h AS (
  SELECT doc_id, text,
         '<html><body><p class="c">' || replace(text, ' ', '&nbsp;')
           || '</p><br/></body></html>' AS html
  FROM documents
),
s AS (
  SELECT doc_id, text, html,
         trim(regexp_replace(
           replace(regexp_replace(html, '<[^>]+>', ' ', 'g'), '&nbsp;', ' '),
           '\\s+', ' ', 'g')) AS clean
  FROM h
)
SELECT doc_id, CAST(length(html) AS BIGINT) AS html_len,
       CAST(length(clean) AS BIGINT) AS clean_len,
       CAST(clean = text AS INT) AS roundtrip_ok
FROM s
"""


# Centroid via per-dim mean of the unnested vectors; sum/count division
# mirrors the Spark side exactly (no avg(), same accumulation shape).
ORACLES["q_embedding_centroids"] = """
WITH d AS (
  SELECT label, t.i - 1 AS dim, CAST(e.embedding[t.i] AS DOUBLE) AS x
  FROM embeddings e, UNNEST(generate_series(1, len(e.embedding))) AS t(i)
),
pd AS (
  SELECT label, dim, sum(x) AS sx, count(*) AS n
  FROM d GROUP BY label, dim
),
cent AS (
  SELECT label, CAST(max(n) AS BIGINT) AS n_vectors,
         CAST(count(*) AS INT) AS dim,
         round(sum(sx / n), 6) AS centroid_sum,
         round(max(CASE WHEN dim = 0 THEN sx / n END), 6) AS centroid_0
  FROM pd GROUP BY label
)
SELECT label, n_vectors, dim, centroid_sum, centroid_0 FROM cent
"""


ORACLES["q_quality_topn_per_lang"] = """
WITH f AS (
  SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents
),
r AS (
  SELECT doc_id, lang,
    len(list_filter(ws, x -> list_contains(
      ['the','a','an','of','to','and','in','is','it','for'], x)))
      / CAST(len(ws) AS DOUBLE) AS sr,
    len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE) AS dr,
    least(len(ws) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) AS ls
  FROM f
),
scored AS (
  SELECT doc_id, lang,
         round(CAST(0.4 AS DOUBLE) * ls + CAST(0.3 AS DOUBLE) * sr
               + CAST(0.3 AS DOUBLE) * dr, 6) AS quality_score
  FROM r
),
ranked AS (
  SELECT lang, doc_id, quality_score,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS INT) AS rnk
  FROM scored
)
SELECT lang, rnk, doc_id, quality_score FROM ranked WHERE rnk <= 20
"""


# K1-K5 fetch-or-compute protocol: 2 passes over stage keys = 1 miss +
# 1 hit each; tier = the same exact-integer policy the query applied
# (running stage-token total vs a 0.3·total budget).
ORACLES["q_cache_fetch_or_compute"] = f"""
WITH {_WORDS}, {_CHUNKS}, {_MAPPED},
ssize AS (
  SELECT chunk_id, CAST(sum(n_out_tokens) AS BIGINT) AS stage_tokens
  FROM mapped GROUP BY chunk_id
),
tot AS (SELECT CAST(floor(0.3 * sum(stage_tokens)) AS BIGINT) AS budget FROM ssize),
pol AS (
  SELECT chunk_id, stage_tokens,
         sum(stage_tokens) OVER (ORDER BY chunk_id) AS cum, budget
  FROM ssize, tot
)
SELECT CAST(chunk_id AS INT) AS chunk_id, stage_tokens,
       substr(sha256('stage:' || chunk_id), 1, 8) AS key8,
       CASE WHEN cum <= budget THEN 'memory'
            WHEN stage_tokens <= budget THEN 'memory_disk'
            ELSE 'disk' END AS tier,
       CAST(1 AS BIGINT) AS n_miss, CAST(1 AS BIGINT) AS n_hit
FROM pol
"""
