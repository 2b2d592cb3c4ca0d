"""Event-time window queries over ``events`` (engine extensions,
SURVEY.md §2.9 / §7.1(7)) with DuckDB oracles.

Window starts are emitted as epoch-microsecond BIGINTs
(``unix_micros`` ⇄ ``epoch_us``) and float sums use exact decimal
accumulation (see ``streaming.windows.exact_value_sum``) so results are
bit-identical across engines and partition orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table
from formula_1_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


@register(
    "events_tumbling_window",
    ops="STREAM-tumbling,A1,P6",
    doc="Fixed 1h event-time windows: count + exact sum per (window, "
    "event_type). Streaming-capable (same transform runs on readStream).",
    oracle="""
SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS window_start_us,
       event_type,
       COUNT(1) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_agg(load_table(spark, sf_dir, "events"))


@register(
    "events_sliding_window",
    ops="STREAM-sliding,A1,P6",
    doc="Sliding 1h/30m windows: each event contributes to 2 windows.",
    oracle="""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w, event_type, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w,
         event_type, value
  FROM events
)
SELECT epoch_us(w) AS window_start_us,
       event_type,
       COUNT(1) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM assigned
GROUP BY 1, 2
""",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_agg(load_table(spark, sf_dir, "events"))


@register(
    "events_session_window",
    ops="STREAM-session,A1",
    doc="Gap-based (10 min) sessionization per user — F.session_window; "
    "oracle reconstructs sessions via lag + cumulative flag sum.",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '10 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT epoch_us(MIN(ts)) AS session_start_us,
       user_id,
       COUNT(1) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_window_agg(load_table(spark, sf_dir, "events"))


@register(
    "events_stream_stream_join",
    ops="EXT-stream-join,J4 (stream-stream interval join, batch form)",
    doc="Click -> purchase attribution: every same-user (click, purchase) "
    "pair with the purchase inside a 30-minute horizon. The SAME "
    "transform runs as a watermarked stream-stream interval join "
    "(tests/test_stream_join.py proves stream == batch); this entry "
    "oracle-checks the batch semantics.",
    oracle="""
SELECT p.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(c.ts) AS click_us,
       epoch_us(p.ts) AS purchase_us,
       p.value
FROM events p
JOIN events c
  ON c.event_type = 'click' AND p.event_type = 'purchase'
 AND c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts < c.ts + INTERVAL '30 minutes'
""",
)
def events_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.streaming.joins import click_purchase_attribution

    return click_purchase_attribution(load_table(spark, sf_dir, "events"))
