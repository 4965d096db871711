"""Streaming-surface oracles (batch-equivalent SQL of the stream queries)."""

from ._base import *  # noqa: F401,F403
from ._base import (  # noqa: F401
    ORACLES,
    _AGREE_TERMS,
    _BANDED,
    _BEST_ANS,
    _BLEU_LOGSUM,
    _BLEU_PIV,
    _CAND,
    _CHUNKS,
    _COS_CHUNK,
    _COS_DIM,
    _EMB_BASE,
    _FLAGSHIP_CTES,
    _HS,
    _LAST,
    _MAPPED,
    _MM_META,
    _RECHUNK,
    _SHINGLES,
    _SIG,
    _TAIL_LIMIT,
    _WORDS,
    _chunked_sum_sql,
    _cos_sql,
    _h,
    _ivf_sql,
    _jaccard_select,
    _norm,
    _set_f1_sql,
    _shingles_from,
)

# Watermarked streaming windows over in-order buckets ≡ batch aggregation.
ORACLES["q_stream_window_late"] = """
SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS hour_bucket,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
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


# batch range join shares the stream-stream join's result set
ORACLES["q_range_join"] = ORACLES["q_stream_stream_join"]


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


# Stream-static enrichment == the batch equi-join (inner join output is
# final per micro-batch; no watermark semantics involved).
ORACLES["q_stream_static_enrich"] = """
SELECT e.event_id, e.user_id, e.event_type,
       c.c_mktsegment AS segment, round(e.value, 6) AS value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""
