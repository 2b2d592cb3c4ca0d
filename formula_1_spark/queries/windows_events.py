"""Event-time window queries over ``events`` (engine extensions,
SURVEY.md §2.9 / §7.1(7)) with DuckDB oracles.

Window starts are emitted as epoch-microsecond BIGINTs
(``unix_micros`` ⇄ ``epoch_us``) and float sums use exact decimal
accumulation (see ``streaming.windows.exact_value_sum``) so results are
bit-identical across engines and partition orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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


@register(
    "events_stream_static_enrich",
    ops="EXT-stream-static-join,J1,A1 (broadcast dim into micro-batches)",
    doc="Stream-static enrichment rollup: events left-joined to the "
    "static customer dimension (user_id = c_custkey, dim BROADCAST — on "
    "the streaming path it ships into every micro-batch with no state "
    "store), aggregated to (segment, event_type). The SAME transform "
    "runs over readStream (tests/test_stream_join.py proves stream == "
    "batch); this entry oracle-checks the batch semantics.",
    oracle="""
SELECT c.c_mktsegment AS segment,
       e.event_type,
       COUNT(1) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e
LEFT JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
""",
)
def events_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.streaming.joins import segment_event_rollup

    return segment_event_rollup(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )


@register(
    "timeseries_gap_fill",
    ops="EXT-gap-fill,A5,J-left,F5 (dense-grid generation)",
    doc="Time-series gap filling: an hourly grid generated from the "
    "corpus bounds (sequence explode off a 1-row aggregate) left-joined "
    "to hourly event rollups, zero-filling silent hours and flagging "
    "them. The grid side is generated, never scanned — at 100 TB the "
    "dense axis costs O(hours), not O(events).",
    oracle="""
WITH bounds AS (
  SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
  FROM events
),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds
),
counts AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
         COUNT(1) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1
)
SELECT epoch_us(g.hour_ts) AS hour_us,
       COALESCE(c.n_events, 0) AS n_events,
       COALESCE(c.total_value, 0.0) AS total_value,
       (c.hour_ts IS NULL) AS is_gap
FROM grid g LEFT JOIN counts c ON c.hour_ts = g.hour_ts
""",
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour_ts")
    )
    counts = (
        events.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    c = counts.select(
        F.col("hour_ts").alias("c_hour_ts"), "n_events", "total_value"
    )
    return (
        grid.join(c, grid.hour_ts == c.c_hour_ts, "left")
        .select(
            F.unix_micros("hour_ts").alias("hour_us"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
            F.col("c_hour_ts").isNull().alias("is_gap"),
        )
    )


@register(
    "event_transition_matrix",
    ops="EXT-transitions,W1,A5 (lag-based sequential counting)",
    doc="Per-user event-type transition counts (Markov matrix): lag over "
    "the (ts, event_id)-ordered per-user stream pairs each event with "
    "its predecessor type; one window + one aggregation, no self-join.",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(1) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "events_locf_fill",
    ops="EXT-locf,W1,A5 (last-observation-carried-forward imputation)",
    doc="LOCF imputation over the hourly grid: silent hours inherit the "
    "last observed hour's closing value (last event by (ts-derived "
    "hour, event_id) — arg_max, deterministic) via last_value IGNORE "
    "NULLS over the grid. The window runs over O(hours) grid rows, "
    "never over events; the per-hour closing values come from one "
    "map-side-combined aggregate.",
    oracle="""
WITH bounds AS (
  SELECT CAST(date_trunc('hour', MIN(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('hour', MAX(ts)) AS TIMESTAMP) AS hi
  FROM events
),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds
),
closing AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
         arg_max(value, event_id) AS close_value
  FROM events GROUP BY 1
)
SELECT epoch_us(g.hour_ts) AS hour_us,
       (c.hour_ts IS NOT NULL) AS observed,
       LAST_VALUE(c.close_value IGNORE NULLS) OVER (
         ORDER BY g.hour_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM grid g LEFT JOIN closing c ON c.hour_ts = g.hour_ts
""",
)
def events_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "hour_ts"
        )
    )
    closing = events.groupBy(
        F.date_trunc("hour", "ts").alias("c_hour_ts")
    ).agg(F.max_by("value", "event_id").alias("close_value"))
    w = (
        Window.orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(closing, grid.hour_ts == closing.c_hour_ts, "left")
        .select(
            F.unix_micros("hour_ts").alias("hour_us"),
            F.col("c_hour_ts").isNotNull().alias("observed"),
            F.last("close_value", ignorenulls=True).over(w).alias("locf_value"),
            F.col("hour_ts"),
        )
        .drop("hour_ts")
    )


@register(
    "latest_event_per_user_type",
    ops="EXT-latest-record,W1 (dedupe-to-latest upsert view)",
    doc="The ubiquitous keep-latest dedup: one row per (user, "
    "event_type) — the most recent event by the (ts, event_id) total "
    "order (row_number over the key partition; map-side partial "
    "aggregation does NOT apply, but the shuffle carries only the key "
    "columns + payload once). This is the batch view a streaming "
    "upsert sink maintains incrementally (cdc_stream_merge_orders).",
    oracle="""
SELECT user_id, event_type, event_id AS latest_event_id,
       epoch_us(ts) AS latest_ts_us,
       value AS latest_value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type
    ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
) WHERE rk = 1
""",
)
def latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.unix_micros("ts").alias("latest_ts_us"),
            F.col("value").alias("latest_value"),
        )
    )


@register(
    "events_hour_of_day_profile",
    ops="EXT-hourly-seasonality,A1 (diurnal activity profile)",
    doc="Diurnal activity profile: events per (hour-of-day, weekday/"
    "weekend), share of the day class in ppm, and the hour's index vs "
    "the uniform 1/24 expectation — the load-shape audit behind "
    "capacity planning and anomaly baselines (events_anomaly_mad "
    "flags deviations; this is the baseline it deviates from).",
    oracle="""
WITH h AS (
  SELECT CAST(hour(ts) AS INT) AS hour_of_day,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend'
              ELSE 'weekday' END AS day_class,
         CAST(COUNT(1) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT day_class, CAST(SUM(n_events) AS BIGINT) AS t
  FROM h GROUP BY day_class
)
SELECT h.hour_of_day, h.day_class, h.n_events,
       (h.n_events * 1000000) // t.t AS share_ppm,
       (h.n_events * 24 * 1000000) // t.t AS uniform_index_ppm
FROM h JOIN tot t ON t.day_class = h.day_class
""",
)
def events_hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek: 1=Sunday..
    # 7=Saturday — shift to match.
    dow = F.dayofweek("ts") - 1
    h = events.groupBy(
        F.hour("ts").cast("int").alias("hour_of_day"),
        F.when(dow.isin(0, 6), "weekend").otherwise("weekday").alias("day_class"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tot = h.groupBy("day_class").agg(F.sum("n_events").alias("t"))
    return h.join(F.broadcast(tot), "day_class").select(
        "hour_of_day",
        "day_class",
        "n_events",
        F.expr("(n_events * 1000000) div t").alias("share_ppm"),
        F.expr("(n_events * 24 * 1000000) div t").alias("uniform_index_ppm"),
    )


@register(
    "events_purchase_attribution_outer",
    ops="EXT-stream-join-outer,J-left (outer stream-stream interval join)",
    doc="LEFT OUTER click -> purchase attribution: every purchase emits, "
    "paired with same-user clicks in the preceding 30 minutes or with "
    "NULL click columns when unattributed — the rows an attribution "
    "pipeline must not drop. The SAME transform runs as a watermarked "
    "OUTER stream-stream join (unmatched state flushes at watermark "
    "expiry; tests/test_stream_join.py proves stream == batch with a "
    "watermark-flushing sentinel); this entry oracle-checks the batch "
    "semantics.",
    oracle="""
SELECT p.user_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) AS purchase_us,
       p.value,
       c.event_id AS click_id,
       epoch_us(c.ts) AS click_us
FROM events p
LEFT JOIN events c
  ON c.event_type = 'click'
 AND c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts < c.ts + INTERVAL '30 minutes'
WHERE p.event_type = 'purchase'
""",
)
def events_purchase_attribution_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from formula_1_spark.streaming.joins import purchase_attribution_outer

    return purchase_attribution_outer(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# LTTB-style time-series downsampling (round 6)
# ---------------------------------------------------------------------------

_LTTB_BUCKETS = 32


@register(
    "events_lttb_downsample",
    ops="EXT-timeseries-downsample,W2,A1 (bucketed largest-triangle pick)",
    doc="Dashboard downsampling, LTTB-style (Steinarsson 2013, the "
    "parallel bucket-average variant: each candidate's triangle spans "
    "the NEIGHBOR BUCKET AVERAGES rather than the sequentially-chosen "
    "previous point, which removes the sequential dependency and makes "
    "the pick embarrassingly parallel): exact two-phase NTILE(32) "
    "buckets the series without a single-partition sort, floor-averaged "
    "integer bucket centroids (micros x cents) ride a 32-row lag/lead, "
    "and each bucket keeps its max |cross product| point. First/last "
    "buckets keep their endpoints, preserving the series extent.",
    oracle=f"""
WITH pts AS (
  SELECT event_id, epoch_us(ts) AS x,
         CAST(round(value * 100) AS BIGINT) AS y,
         CAST(NTILE({_LTTB_BUCKETS}) OVER (ORDER BY epoch_us(ts), event_id)
              AS INT) AS b
  FROM events
),
bstats AS (
  -- HUGEINT lift: SUM of epoch-micros overflows int64 past ~5k rows/bucket
  SELECT b, CAST(SUM(x::HUGEINT) // COUNT(1) AS BIGINT) AS ax,
         CAST(SUM(y::HUGEINT) // COUNT(1) AS BIGINT) AS ay
  FROM pts GROUP BY b
),
nbr AS (
  SELECT b,
         LAG(ax) OVER (ORDER BY b) AS px, LAG(ay) OVER (ORDER BY b) AS py,
         LEAD(ax) OVER (ORDER BY b) AS nx, LEAD(ay) OVER (ORDER BY b) AS ny
  FROM bstats
),
scored AS (
  -- HUGEINT products: micros-diff x cents-diff approaches int64 max on
  -- wide time ranges (the r6 ADVICE cross-engine-overflow flag)
  SELECT p.b, p.event_id, p.x, p.y,
         CASE WHEN n.px IS NULL OR n.nx IS NULL THEN NULL
              ELSE abs((n.px - n.nx)::HUGEINT * (p.y - n.py)
                       - (n.px - p.x)::HUGEINT * (n.ny - n.py)) END AS area2
  FROM pts p JOIN nbr n USING (b)
),
picked AS (
  SELECT b, event_id, x, y FROM (
    SELECT b, event_id, x, y,
           ROW_NUMBER() OVER (
             PARTITION BY b
             ORDER BY CASE
               WHEN b = 1 THEN x::HUGEINT               -- series FIRST point
               WHEN b = {_LTTB_BUCKETS} THEN -x::HUGEINT -- series LAST point
               ELSE -area2 END ASC, event_id ASC) AS r
    FROM scored) s WHERE r = 1
)
SELECT b AS bucket, event_id, CAST(x AS BIGINT) AS ts_us,
       CAST(y AS BIGINT) AS value_cents
FROM picked ORDER BY bucket
""",
)
def events_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import global_ntile_two_phase

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        F.unix_micros("ts").alias("x"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"),
    )
    pts = global_ntile_two_phase(
        pts, [F.asc("x"), F.asc("event_id")], _LTTB_BUCKETS, alias="b"
    )
    # decimal(38,0) lift: sum of epoch-micros overflows int64 once a
    # bucket holds ~5k rows — the 10x-probe bug pattern.
    bstats = pts.groupBy("b").agg(
        F.expr(
            "cast(sum(cast(x as decimal(38,0))) div count(1) as bigint)"
        ).alias("ax"),
        F.expr(
            "cast(sum(cast(y as decimal(38,0))) div count(1) as bigint)"
        ).alias("ay"),
    )
    w = Window.orderBy("b")  # 32 rows: bucket-grain, domain-bounded
    nbr = bstats.select(
        "b",
        F.lag("ax").over(w).alias("px"),
        F.lag("ay").over(w).alias("py"),
        F.lead("ax").over(w).alias("nx"),
        F.lead("ay").over(w).alias("ny"),
    )
    # decimal(38,0) products: micros-diff x cents-diff approaches int64
    # max on wide time ranges — DuckDB would raise on BIGINT overflow
    # while non-ANSI Spark wraps silently, a cross-engine divergence.
    dec = "decimal(38,0)"
    scored = pts.join(F.broadcast(nbr), "b").withColumn(
        "area2",
        F.when(
            F.col("px").isNull() | F.col("nx").isNull(), F.lit(None)
        ).otherwise(
            F.abs(
                (F.col("px") - F.col("nx")).cast(dec)
                * (F.col("y") - F.col("py")).cast(dec)
                - (F.col("px") - F.col("x")).cast(dec)
                * (F.col("ny") - F.col("py")).cast(dec)
            )
        ),
    )
    # b=1 keeps the series' true FIRST point (min x), b=last its true
    # LAST point (max x) — the r6 ADVICE caught these inverted.
    pick_order = (
        F.when(F.col("b") == 1, F.col("x").cast(dec))
        .when(F.col("b") == _LTTB_BUCKETS, (-F.col("x")).cast(dec))
        .otherwise(-F.col("area2"))
    )
    wpick = Window.partitionBy("b").orderBy(
        pick_order.asc(), F.asc("event_id")
    )
    return (
        scored.withColumn("r", F.row_number().over(wpick))
        .filter(F.col("r") == 1)
        .select(
            F.col("b").alias("bucket"),
            "event_id",
            F.col("x").cast("bigint").alias("ts_us"),
            F.col("y").cast("bigint").alias("value_cents"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Sliding-window rate-limit audit (round 7)
# ---------------------------------------------------------------------------

_RL_WINDOW_US = 600 * 1_000_000  # 10-minute burst window
_RL_LIMIT = 5  # events allowed per window


@register(
    "events_rate_limit_audit",
    ops="EXT-rate-limit,W1 (RANGE-frame sliding count)",
    doc="Per-user burst detection with a true event-time RANGE frame: "
    "for every event, the count of the same user's events in the "
    "strictly-preceding 10 minutes (RANGE BETWEEN 600s PRECEDING AND "
    "1us PRECEDING on epoch micros — peers at the exact same "
    "timestamp excluded identically in both engines); an event is a "
    "violation when the window already holds limit-1 or more. Rolled "
    "up per user: events, violations, the hottest window observed. "
    "The window partitions by user — state bounded per key, the "
    "streaming-compatible shape.",
    oracle=f"""
WITH x AS (
  SELECT user_id, epoch_us(ts) AS t
  FROM events
),
win AS (
  SELECT user_id,
         COUNT(1) OVER (PARTITION BY user_id ORDER BY t
                        RANGE BETWEEN {_RL_WINDOW_US} PRECEDING
                              AND 1 PRECEDING) AS prior_in_window
  FROM x
)
SELECT user_id,
       CAST(COUNT(1) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN prior_in_window >= {_RL_LIMIT - 1} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations,
       CAST(MAX(prior_in_window) + 1 AS BIGINT) AS max_window_events
FROM win
GROUP BY user_id
ORDER BY user_id
""",
)
def events_rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-_RL_WINDOW_US, -1)
    )
    win = ev.select(
        "user_id", F.count(F.lit(1)).over(w).alias("prior_in_window")
    )
    return (
        win.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.col("prior_in_window") >= _RL_LIMIT - 1, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_violations"),
            (F.max("prior_in_window") + 1)
            .cast("bigint")
            .alias("max_window_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# DAU / WAU / stickiness (round 7)
# ---------------------------------------------------------------------------


@register(
    "events_dau_wau_stickiness",
    ops="EXT-product-analytics,A1 (bounded-fanout sliding distinct)",
    doc="DAU / trailing-7-day WAU / stickiness per day WITHOUT a "
    "sliding COUNT DISTINCT window (whose state at 100 TB is a per-day "
    "user set): each distinct (user, active-day) row fans out to the "
    "<= 7 window-end days it covers, and WAU is a plain distinct count "
    "per end day — constant 7x fan-out on the user-day rollup (already "
    "tiny vs raw events), zero window state. Stickiness = DAU/WAU ppm, "
    "reported for observed days only.",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (SELECT day, CAST(COUNT(1) AS BIGINT) AS dau FROM ud GROUP BY day),
cover AS (
  SELECT DISTINCT ud.user_id, ud.day + CAST(o.o AS INTEGER) AS wday
  FROM ud, unnest(range(0, 7)) o(o)
),
wau AS (
  SELECT c.wday AS day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
  FROM cover c JOIN dau d ON d.day = c.wday
  GROUP BY c.wday
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
       CAST(d.dau * 1000000 // w.wau AS BIGINT) AS stickiness_ppm
FROM dau d JOIN wau w USING (day)
ORDER BY day
""",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda o: F.date_add(F.col("day"), o.cast("int")),
            )
        ).alias("wday"),
    ).distinct()
    wau = (
        cover.join(dau.select(F.col("day").alias("wday")), "wday")
        .groupBy("wday")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau"))
        .select(F.col("wday").alias("day"), "wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.expr("cast(dau * 1000000 div wau as bigint)").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Discrete Kaplan-Meier conversion survival (round 8)
# ---------------------------------------------------------------------------

_KM_H = 14  # reporting horizon in day buckets (0..13)
_KM_DAY_US = 86_400_000_000


@register(
    "events_conversion_survival",
    ops="EXT-survival,A1,W1 (discrete Kaplan-Meier with censoring)",
    doc="Signup->purchase conversion survival, the discrete Kaplan-"
    "Meier estimator with right-censoring: subjects are each user's "
    "FIRST signup; the event is their first purchase at or after it, "
    "day-bucketed; subjects without a purchase inside the 14-day "
    "horizon are censored at min(observation end, horizon) — the "
    "estimator censoring alone gets right and a naive conversion-rate "
    "cut gets wrong. Per bucket: at-risk count (subjects neither "
    "converted nor censored earlier — one bounded cumulative window "
    "over the 14-row bucket relation), conversions, censored, hazard "
    "ppm, and KM survival ppm. Survival = prod((n_i - d_i)) / "
    "prod(n_i) with both integer products accumulated by LEFT-FOLD in "
    "bucket order on the 14-element arrays (the vectors.cosine "
    "determinism contract), so the double math is bit-identical "
    "cross-engine. Corpus-scale work is two event scans + one "
    "user-keyed join; everything after the bucket aggregate is "
    "14-row-bounded.",
    oracle=f"""
WITH sg AS (
  SELECT user_id, MIN(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
pu AS (SELECT user_id, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase'),
conv AS (
  SELECT sg.user_id, sg.s_us, MIN(pu.p_us) AS c_us
  FROM sg LEFT JOIN pu ON pu.user_id = sg.user_id AND pu.p_us >= sg.s_us
  GROUP BY sg.user_id, sg.s_us
),
mx AS (SELECT MAX(epoch_us(ts)) AS m_us FROM events),
subj AS (
  SELECT c.user_id,
         CASE WHEN c.c_us IS NOT NULL
                   AND (c.c_us - c.s_us) // {_KM_DAY_US} < {_KM_H}
              THEN (c.c_us - c.s_us) // {_KM_DAY_US} END AS conv_b,
         CASE WHEN c.c_us IS NULL
                   OR (c.c_us - c.s_us) // {_KM_DAY_US} >= {_KM_H}
              THEN LEAST((m.m_us - c.s_us) // {_KM_DAY_US}, {_KM_H - 1})
              END AS cens_b
  FROM conv c CROSS JOIN mx m
),
grid AS (SELECT CAST(unnest(range(0, {_KM_H})) AS BIGINT) AS bucket),
bk AS (
  SELECT g.bucket,
         CAST((SELECT COUNT(1) FROM subj s WHERE s.conv_b = g.bucket) AS BIGINT) AS n_conv,
         CAST((SELECT COUNT(1) FROM subj s WHERE s.cens_b = g.bucket) AS BIGINT) AS n_censored
  FROM grid g
),
tot AS (SELECT CAST(COUNT(1) AS BIGINT) AS n FROM subj),
risk AS (
  SELECT b.bucket, b.n_conv, b.n_censored,
         CAST(t.n - COALESCE(SUM(b.n_conv + b.n_censored) OVER (
           ORDER BY b.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM bk b CROSS JOIN tot t
),
arrs AS (
  SELECT list(CASE WHEN n_risk > 0
                   THEN CAST(n_risk - n_conv AS DOUBLE) ELSE 1.0 END
              ORDER BY bucket) AS nums,
         list(CASE WHEN n_risk > 0
                   THEN CAST(n_risk AS DOUBLE) ELSE 1.0 END
              ORDER BY bucket) AS dens
  FROM risk
)
SELECT r.bucket, r.n_risk, r.n_conv, r.n_censored,
       CAST(CASE WHEN r.n_risk > 0
                 THEN r.n_conv * 1000000 // r.n_risk ELSE 0 END AS BIGINT)
         AS hazard_ppm,
       CAST(FLOOR(
         list_reduce(list_slice(a.nums, 1, r.bucket + 1), (x, y) -> x * y)
         / list_reduce(list_slice(a.dens, 1, r.bucket + 1), (x, y) -> x * y)
         * 1000000.0) AS BIGINT) AS survival_ppm
FROM risk r CROSS JOIN arrs a
ORDER BY r.bucket
""",
)
def events_conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sg = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("s_us"))
    )
    pu = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("p_us")
    )
    conv = (
        sg.join(pu, "user_id", "left")
        .filter(F.col("p_us").isNull() | (F.col("p_us") >= F.col("s_us")))
        .groupBy("user_id", "s_us")
        .agg(F.min("p_us").alias("c_us"))
    )
    # A user whose ONLY purchases precede signup still needs a subject
    # row: re-join against the signup base to restore them as censored.
    conv = sg.join(conv.select("user_id", "c_us"), "user_id", "left")
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("m_us"))
    raw_b = F.expr(f"(c_us - s_us) div {_KM_DAY_US}")
    subj = conv.join(F.broadcast(mx)).select(
        F.when(F.col("c_us").isNotNull() & (raw_b < _KM_H), raw_b).alias(
            "conv_b"
        ),
        F.when(
            F.col("c_us").isNull() | (raw_b >= _KM_H),
            F.least(
                F.expr(f"(m_us - s_us) div {_KM_DAY_US}"),
                F.lit(_KM_H - 1),
            ),
        ).alias("cens_b"),
    )
    grid = spark.range(_KM_H).select(F.col("id").cast("bigint").alias("bucket"))
    dj = subj.groupBy(F.col("conv_b").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_conv")
    )
    cj = subj.groupBy(F.col("cens_b").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_censored")
    )
    tot = subj.agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        grid.join(dj, "bucket", "left")
        .join(cj, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_conv", F.lit(0)).cast("bigint").alias("n_conv"),
            F.coalesce("n_censored", F.lit(0)).cast("bigint").alias("n_censored"),
        )
        .join(F.broadcast(tot))
        # bounded window: the relation is exactly _KM_H rows at any scale
        .withColumn(
            "n_risk",
            F.col("n")
            - F.coalesce(
                F.sum(F.col("n_conv") + F.col("n_censored")).over(w), F.lit(0)
            ),
        )
        .drop("n")
    )
    term = lambda num: F.when(  # noqa: E731
        F.col("n_risk") > 0, num.cast("double")
    ).otherwise(F.lit(1.0))
    arrs = risk.select(
        F.struct("bucket", term(F.col("n_risk") - F.col("n_conv")).alias("v")).alias("nu"),
        F.struct("bucket", term(F.col("n_risk")).alias("v")).alias("de"),
    ).agg(
        F.transform(
            F.array_sort(F.collect_list("nu")), lambda s: s["v"]
        ).alias("nums"),
        F.transform(
            F.array_sort(F.collect_list("de")), lambda s: s["v"]
        ).alias("dens"),
    )
    fold = lambda arr, j: F.aggregate(  # noqa: E731
        F.slice(arr, F.lit(1), (j + 1).cast("int")),
        F.lit(1.0),
        lambda acc, v: acc * v,
    )
    return (
        risk.join(F.broadcast(arrs))
        .select(
            "bucket",
            "n_risk",
            "n_conv",
            "n_censored",
            F.expr(
                "cast(CASE WHEN n_risk > 0 THEN (n_conv * 1000000)"
                " div n_risk ELSE 0 END as bigint)"
            ).alias("hazard_ppm"),
            F.floor(
                fold(F.col("nums"), F.col("bucket"))
                / fold(F.col("dens"), F.col("bucket"))
                * F.lit(1_000_000.0)
            )
            .cast("bigint")
            .alias("survival_ppm"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Interval sweep-line peak concurrency (round 9)
# ---------------------------------------------------------------------------

# The synthetic lineitem has no l_receiptdate, so transit time is derived
# deterministically from the row key: 1 + (l_orderkey + l_linenumber) % 14
# days — the same replayable convention both engines apply.
_TRANSIT_MOD = 14


@register(
    "supplier_peak_concurrency",
    ops="EXT-interval-sweep,A1,W1,O3 (sweep-line max-overlap)",
    doc="Peak concurrent in-transit shipments per supplier via the "
    "sweep-line decomposition: each shipment interval [ship_date, "
    "ship_date + transit) becomes a +1 delta at the start and a -1 delta "
    "at the (exclusive) end, deltas aggregate per (supplier, date), and "
    "a per-supplier date-ordered running sum gives the concurrency "
    "curve; the peak and its first date come from one more window pass "
    "over the same partitioning. Never materializes interval x interval "
    "pairs or per-day explosions — shuffle volume is O(shipments), the "
    "scale-safe shape for interval overlap analytics at 100 TB. Top 20 "
    "suppliers by peak via the two-phase global top-k (no "
    "single-partition window).",
    oracle=f"""
WITH deltas AS (
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE) AS d, 1 AS delta, 1 AS ship
  FROM lineitem
  UNION ALL
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE)
           + CAST(1 + (l_orderkey + l_linenumber) % {_TRANSIT_MOD}
                  AS INTEGER) AS d,
         -1 AS delta, 0 AS ship
  FROM lineitem
),
daily AS (
  SELECT l_suppkey, d,
         CAST(SUM(delta) AS BIGINT) AS delta,
         CAST(SUM(ship) AS BIGINT) AS ships
  FROM deltas GROUP BY 1, 2
),
curve AS (
  SELECT l_suppkey, d, ships,
         CAST(SUM(delta) OVER (PARTITION BY l_suppkey ORDER BY d
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
  FROM daily
),
peaks AS (
  SELECT l_suppkey, d, run,
         MAX(run) OVER (PARTITION BY l_suppkey) AS peak,
         SUM(ships) OVER (PARTITION BY l_suppkey) AS n_shipments
  FROM curve
),
summary AS (
  SELECT l_suppkey,
         CAST(MAX(peak) AS BIGINT) AS peak_concurrent,
         MIN(d) AS peak_first_date,
         CAST(MAX(n_shipments) AS BIGINT) AS n_shipments
  FROM peaks WHERE run = peak
  GROUP BY l_suppkey
)
SELECT l_suppkey, peak_concurrent,
       CAST(peak_first_date AS VARCHAR) AS peak_first_date, n_shipments,
       CAST(RANK() OVER (ORDER BY peak_concurrent DESC, l_suppkey ASC)
            AS BIGINT) AS rank
FROM summary
ORDER BY peak_concurrent DESC, l_suppkey ASC
LIMIT 20
""",
)
def supplier_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import two_phase_global_topk

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate"
    )
    start = li.select(
        "l_suppkey",
        F.col("l_shipdate").cast("date").alias("d"),
        F.lit(1).alias("delta"),
        F.lit(1).alias("ship"),
    )
    end = li.select(
        "l_suppkey",
        F.date_add(
            F.col("l_shipdate").cast("date"),
            (
                F.lit(1)
                + (F.col("l_orderkey") + F.col("l_linenumber"))
                % F.lit(_TRANSIT_MOD)
            ).cast("int"),
        ).alias("d"),
        F.lit(-1).alias("delta"),
        F.lit(0).alias("ship"),
    )
    daily = (
        start.unionByName(end)
        .groupBy("l_suppkey", "d")
        .agg(
            F.sum("delta").cast("bigint").alias("delta"),
            F.sum("ship").cast("bigint").alias("ships"),
        )
    )
    w_run = (
        Window.partitionBy("l_suppkey")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_supp = Window.partitionBy("l_suppkey")
    curve = daily.select(
        "l_suppkey",
        "d",
        "ships",
        F.sum("delta").over(w_run).cast("bigint").alias("run"),
    )
    peaks = curve.select(
        "l_suppkey",
        "d",
        "run",
        F.max("run").over(w_supp).alias("peak"),
        F.sum("ships").over(w_supp).alias("n_shipments"),
    )
    summary = (
        peaks.filter(F.col("run") == F.col("peak"))
        .groupBy("l_suppkey")
        .agg(
            F.max("peak").cast("bigint").alias("peak_concurrent"),
            F.min("d").alias("peak_first_date"),
            F.max("n_shipments").cast("bigint").alias("n_shipments"),
        )
    )
    return two_phase_global_topk(
        summary,
        [F.desc("peak_concurrent"), F.asc("l_suppkey")],
        k=20,
    ).select(
        "l_suppkey",
        "peak_concurrent",
        F.col("peak_first_date").cast("string").alias("peak_first_date"),
        "n_shipments",
        F.col("rank").cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Event-type sequence n-grams (round 9)
# ---------------------------------------------------------------------------


@register(
    "event_sequence_ngrams",
    ops="EXT-seq-mining,W1,A1,O3 (sequential pattern support)",
    doc="Top event-type trigrams across per-user journeys: order each "
    "user's events by (ts, event_id), form consecutive (e1, e2, e3) "
    "windows with two leads over the user partition, and report the 20 "
    "most frequent trigrams with support (count), distinct users, and "
    "integer-ppm confidence support(e1,e2,e3)/support(e1,e2 prefix). "
    "One shuffle on user_id covers the sequencing; trigram aggregation "
    "is map-side combined; the final top-20 is the two-phase global "
    "top-k. The standard sequential-pattern evidence for funnel design "
    "without a candidate-generation explosion.",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events
),
tri AS (
  SELECT e1, e2, e3,
         CAST(COUNT(1) AS BIGINT) AS support,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM seq WHERE e3 IS NOT NULL
  GROUP BY 1, 2, 3
),
pre AS (
  SELECT e1, e2, CAST(COUNT(1) AS BIGINT) AS pre_support
  FROM seq WHERE e2 IS NOT NULL
  GROUP BY 1, 2
)
SELECT t.e1, t.e2, t.e3, t.support, t.n_users,
       CAST(t.support * 1000000 // p.pre_support AS BIGINT)
         AS confidence_ppm,
       CAST(RANK() OVER (ORDER BY t.support DESC, t.e1, t.e2, t.e3)
            AS BIGINT) AS rank
FROM tri t JOIN pre p ON p.e1 = t.e1 AND p.e2 = t.e2
ORDER BY t.support DESC, t.e1, t.e2, t.e3
LIMIT 20
""",
)
def event_sequence_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import two_phase_global_topk

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    tri = (
        seq.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("support"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )
    pre = (
        seq.filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pre_support"))
    )
    scored = tri.join(pre, ["e1", "e2"]).select(
        "e1",
        "e2",
        "e3",
        "support",
        "n_users",
        F.expr("CAST(support * 1000000 div pre_support AS BIGINT)").alias(
            "confidence_ppm"
        ),
    )
    return two_phase_global_topk(
        scored,
        [F.desc("support"), F.asc("e1"), F.asc("e2"), F.asc("e3")],
        k=20,
    ).select(
        "e1", "e2", "e3", "support", "n_users", "confidence_ppm",
        F.col("rank").cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Watermark lateness audit (round 9)
# ---------------------------------------------------------------------------

# The synthetic events arrive perfectly ordered (ts is monotone in
# event_id), so real-world delivery jitter is modeled deterministically:
# each event arrives jitter = uniform[0, 20 min) after its event time,
# with the uniform drawn from the engine-shared salted-md5 1e-6 grid —
# replayable bit-for-bit in ANSI SQL. Triggers fire every 5 minutes of
# ARRIVAL time; the watermark rule is the ENGINE'S MEASURED one: the
# filter in trigger b uses the watermark committed at the start of
# trigger b-1, which was computed from data through trigger b-2 — i.e.
# max event time through trigger b-2, minus the delay (Structured
# Streaming propagates watermarks with a one-microbatch commit lag;
# tests/test_streaming.py pins this against the engine's own
# numRowsDroppedByWatermark metric).
_WM_JITTER_S = 1200
_WM_TRIGGER_S = 300
_WM_DELAYS_S = (60, 300, 900)
_WM_GRID = 1_000_000


def _wm_jitter_sql(key_sql: str) -> str:
    return (
        f"((('0x' || substr(md5('wmj' || ':' || CAST({key_sql} AS VARCHAR)),"
        f" 1, 15))::BIGINT % {_WM_GRID}) * {_WM_JITTER_S})"
    )


@register(
    "watermark_late_audit",
    ops="EXT-stream-planning,W1,A1 (watermark-delay sizing evidence)",
    doc="Batch replay of Structured Streaming watermark semantics under "
    "deterministic delivery jitter (uniform[0, 20 min) from the shared "
    "md5 grid): triggers fire every 5 minutes of arrival time, the "
    "watermark after trigger b is max(event time through b) - delay, and "
    "an event is DROPPED-LATE iff its event time is behind the watermark "
    "established by the PREVIOUS trigger — bit-for-bit the engine rule, "
    "proven against numRowsDroppedByWatermark in the streaming test. For "
    "each candidate delay (1m/5m/15m) reports dropped events, drop ppm, "
    "affected users, and the worst lateness — the withWatermark() sizing "
    "evidence. The trigger-max relation aggregates before the tiny "
    "global cummax window, so nothing corpus-sized funnels through one "
    "task.",
    oracle=f"""
WITH arr AS (
  SELECT event_id, user_id, epoch_us(ts) AS t_us,
         (epoch_us(ts) + {_wm_jitter_sql("event_id")})
           // {_WM_TRIGGER_S * 1_000_000} AS trigger_id
  FROM events
),
bmax AS (
  SELECT trigger_id, CAST(MAX(t_us) AS BIGINT) AS bmax_us
  FROM arr GROUP BY trigger_id
),
wm0 AS (
  SELECT trigger_id,
         CAST(MAX(bmax_us) OVER (ORDER BY trigger_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cummax_us
  FROM bmax
),
wm AS (
  SELECT trigger_id, cummax_us,
         CAST(LAG(cummax_us, 2) OVER (ORDER BY trigger_id) AS BIGINT)
           AS prev_cummax_us
  FROM wm0
),
delays AS (SELECT unnest([{", ".join(str(d) for d in _WM_DELAYS_S)}])
             AS delay_s),
flagged AS (
  SELECT d.delay_s, a.user_id,
         (w.prev_cummax_us - d.delay_s * 1000000) - a.t_us AS late_by_us
  FROM arr a JOIN wm w ON w.trigger_id = a.trigger_id, delays d
  WHERE w.prev_cummax_us IS NOT NULL
    AND a.t_us < w.prev_cummax_us - d.delay_s * 1000000
),
tot AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_events FROM arr)
SELECT CAST(d.delay_s AS INTEGER) AS delay_s,
       CAST(COALESCE(f.n_late, 0) AS BIGINT) AS n_late,
       CAST(COALESCE(f.n_late, 0) * 1000000 // t.n_events AS BIGINT)
         AS late_ppm,
       CAST(COALESCE(f.n_users, 0) AS BIGINT) AS users_affected,
       CAST(COALESCE(f.max_late_s, 0) AS BIGINT) AS max_lateness_s
FROM delays d
LEFT JOIN (
  SELECT delay_s, COUNT(1) AS n_late, COUNT(DISTINCT user_id) AS n_users,
         MAX(late_by_us) // 1000000 AS max_late_s
  FROM flagged GROUP BY delay_s
) f ON f.delay_s = d.delay_s, tot t
ORDER BY delay_s
""",
)
def watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return watermark_late_counts(ev, _WM_TRIGGER_S, _WM_DELAYS_S)


def wm_arrival_us(t_us, event_id):
    """Deterministic arrival time: event time + md5-grid jitter in
    [0, _WM_JITTER_S) seconds. Shared by the audit and the streaming
    equivalence test so both replay the same arrival order."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit("wmj"), event_id.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return t_us + (h % _WM_GRID) * _WM_JITTER_S


def watermark_late_counts(
    ev: DataFrame, trigger_s: int, delays_s: tuple[int, ...]
) -> DataFrame:
    """The batch replay of streaming watermark drop semantics, trigger
    cadence parametrized so the Structured Streaming equivalence test
    (tests/test_streaming.py) can drive it against the real engine's
    numRowsDroppedByWatermark metric."""
    spark = ev.sparkSession
    t_us = F.unix_micros("ts")
    arr = ev.select(
        "event_id",
        "user_id",
        t_us.alias("t_us"),
        (wm_arrival_us(t_us, F.col("event_id")) / F.lit(trigger_s * 1_000_000))
        .cast("bigint")
        .alias("trigger_id"),
    )
    bmax = arr.groupBy("trigger_id").agg(
        F.max("t_us").cast("bigint").alias("bmax_us")
    )
    w_ord = Window.orderBy("trigger_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wm = bmax.select(
        "trigger_id",
        F.max("bmax_us").over(w_ord).cast("bigint").alias("cummax_us"),
    ).select(
        "trigger_id",
        "cummax_us",
        F.lag("cummax_us", 2)
        .over(Window.orderBy("trigger_id"))
        .alias("prev_cummax_us"),
    )
    delays = spark.range(1).select(
        F.explode(F.array(*[F.lit(d) for d in delays_s])).alias("delay_s")
    )
    joined = arr.join(F.broadcast(wm), "trigger_id").join(
        F.broadcast(delays), F.lit(True)
    )
    flagged = joined.filter(
        F.col("prev_cummax_us").isNotNull()
        & (
            F.col("t_us")
            < F.col("prev_cummax_us") - F.col("delay_s") * F.lit(1_000_000)
        )
    ).select(
        "delay_s",
        "user_id",
        (
            (F.col("prev_cummax_us") - F.col("delay_s") * F.lit(1_000_000))
            - F.col("t_us")
        ).alias("late_by_us"),
    )
    tot = arr.agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    per_delay = flagged.groupBy("delay_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_late"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.expr("max(late_by_us) div 1000000").alias("max_late_s"),
    )
    return (
        delays.join(per_delay, "delay_s", "left")
        .join(F.broadcast(tot), F.lit(True))
        .select(
            F.col("delay_s").cast("int").alias("delay_s"),
            F.coalesce("n_late", F.lit(0)).cast("bigint").alias("n_late"),
            F.expr(
                "CAST(coalesce(n_late, 0) * 1000000 div n_events AS BIGINT)"
            ).alias("late_ppm"),
            F.coalesce("n_users", F.lit(0)).cast("bigint").alias("users_affected"),
            F.coalesce("max_late_s", F.lit(0))
            .cast("bigint")
            .alias("max_lateness_s"),
        )
        .orderBy("delay_s")
    )


# ---------------------------------------------------------------------------
# Dynamic-gap session windows (round 10)
# ---------------------------------------------------------------------------


@register(
    "events_dynamic_session_window",
    ops="STREAM-session-dynamic,A1 (per-row gap expression)",
    doc="DYNAMIC-gap sessionization — F.session_window with a per-row gap "
    "EXPRESSION (purchases hold the session open 30 minutes, everything "
    "else 10): each event proposes [ts, ts + gap(event)) and overlapping "
    "proposals merge, so one purchase can bridge several short-gap "
    "clicks that a fixed 10-minute gap would split. The oracle replays "
    "the merge with a strictly-preceding running MAX of interval ends "
    "(a lag-based flag is WRONG here — a long gap's reach can cover "
    "events beyond its immediate successor). Same transform runs on a "
    "readStream via the session-window state store; this entry "
    "oracle-checks the batch semantics.",
    oracle="""
WITH iv AS (
  SELECT user_id, ts, value,
         ts + CASE WHEN event_type = 'purchase' THEN INTERVAL '30 minutes'
                   ELSE INTERVAL '10 minutes' END AS fin
  FROM events
),
flagged AS (
  SELECT user_id, ts, value, fin,
         CASE WHEN MAX(fin) OVER (
                PARTITION BY user_id ORDER BY ts, fin
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR ts >= MAX(fin) OVER (
                PARTITION BY user_id ORDER BY ts, fin
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_session
  FROM iv
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, fin
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
def events_dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.streaming.windows import dynamic_session_window_agg

    return dynamic_session_window_agg(load_table(spark, sf_dir, "events"))
