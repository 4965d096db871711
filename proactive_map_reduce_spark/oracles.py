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
