"""Oracle SQL shared between a single qname and a suite section.

Lives in a module with NO imports from the qname registry chain, so it
is importable from any position in the import graph (query_defs4's
suite oracle composes SQL from later-wave modules; importing those
modules directly — e.g. from tests — would otherwise hit a partially
initialized module).
"""

from books2scrape_etl_spark.functions.agg import oracle_sum_exact

SESSION_GAP_S = 21_600  # 6 h: the events table is sparse (~8 ev/user/day);
# a web-style 30-min gap degenerates to one event per session here,
# while 6 h yields multi-event sessions that actually exercise the op.
# Shared by query_defs13 (sessionize_batch family) and query_defs14
# (session_paths) — lives here so either module is directly importable.

OHLC_SQL = f"""
WITH e AS (
  SELECT event_type, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(floor(epoch(ts)) AS BIGINT) * 1000000 + event_id AS k
  FROM events
)
SELECT event_type, es - es % 3600 AS bucket_es,
       arg_min(value, k) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, k) AS close,
       CAST(COUNT(*) AS BIGINT) AS volume,
       {oracle_sum_exact("value", scale=4)} AS turnover
FROM e GROUP BY 1, 2
"""
