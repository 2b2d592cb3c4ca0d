"""Robust statistics + time-range window frames.

* ``winsorized_order_stats`` — per-group outlier clipping at exact
  p05/p95 with before/after comparison, the standard robust-mean move
  for quality-score columns. Clipped sums are floor-quantized to cent
  bigints so the aggregate is exact under any accumulation order (a
  float SUM of clipped doubles would differ between engines' window/agg
  association orders).
* ``events_rolling_7d`` — per-user rolling 7-day RANGE frame over event
  time (micros-epoch range bounds, so the frame is a true time interval,
  not a row count). The windowed sum runs on integer cents: Spark
  recomputes moving frames per row while DuckDB uses segment trees —
  different float association orders — so only an integer frame
  aggregate is engine-portable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.operators.sampling import hash_uniform_sql
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table


@register(
    "winsorized_order_stats",
    ops="EXT-robust-stats,A5,J1 (per-group winsorization)",
    doc="Per-priority winsorization of order totals: exact 5th/95th "
    "percentiles (IEEE-exact interpolation, identical cross-engine) "
    "broadcast back, values clipped with least/greatest, and the "
    "clipped sum reported in floor-quantized CENTS (bigint — exact "
    "under any accumulation order) next to the raw decimal sum and the "
    "clip counts. The audit row a quality-score pipeline wants before "
    "trusting a mean.",
    oracle="""
WITH thr AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.05) AS p05,
         quantile_cont(o_totalprice, 0.95) AS p95
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CAST(COUNT(1) AS BIGINT) AS n_orders,
       t.p05, t.p95,
       CAST(COUNT(CASE WHEN o.o_totalprice < t.p05 THEN 1 END) AS BIGINT)
         AS n_clipped_low,
       CAST(COUNT(CASE WHEN o.o_totalprice > t.p95 THEN 1 END) AS BIGINT)
         AS n_clipped_high,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS raw_total,
       CAST(SUM(CAST(FLOOR(
           LEAST(GREATEST(o.o_totalprice, t.p05), t.p95) * 100.0)
         AS BIGINT)) AS BIGINT) AS winsorized_cents
FROM orders o JOIN thr t ON t.o_orderpriority = o.o_orderpriority
GROUP BY o.o_orderpriority, t.p05, t.p95
""",
)
def winsorized_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    thr = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p05"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    j = orders.join(F.broadcast(thr), "o_orderpriority")
    clipped = F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))
    return j.groupBy("o_orderpriority", "p05", "p95").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_totalprice") < F.col("p05"), 1)).alias(
            "n_clipped_low"
        ),
        F.count(F.when(F.col("o_totalprice") > F.col("p95"), 1)).alias(
            "n_clipped_high"
        ),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("raw_total"),
        F.sum(F.floor(clipped * F.lit(100.0)).cast("bigint")).alias(
            "winsorized_cents"
        ),
    ).select(
        "o_orderpriority",
        "n_orders",
        "p05",
        "p95",
        "n_clipped_low",
        "n_clipped_high",
        "raw_total",
        "winsorized_cents",
    )


_7D_MICROS = 7 * 24 * 3600 * 1_000_000


@register(
    "events_rolling_7d",
    ops="EXT-range-frame,W1 (time-interval window frame)",
    doc="Per-user rolling 7-day activity over event time: a RANGE frame "
    "on the micros epoch (a true time interval — rows battery elsewhere "
    "covers ROWS frames), counting events and summing value in integer "
    "cents. Integer frame aggregates are the portability contract: "
    "Spark recomputes moving frames sequentially, DuckDB aggregates "
    "them with segment trees, and only exact integers agree under both "
    "association orders.",
    oracle=f"""
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       CAST(COUNT(1) OVER w AS BIGINT) AS n_7d,
       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) OVER w AS BIGINT)
         AS sum_7d_cents
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN {_7D_MICROS} PRECEDING AND CURRENT ROW
)
""",
)
def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_7D_MICROS, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.sum(F.floor(F.col("value") * F.lit(100.0)).cast("bigint"))
        .over(w)
        .alias("sum_7d_cents"),
    )


_GAP_US = 1800 * 1_000_000  # 30-minute inactivity gap (micros epoch)


@register(
    "events_sessionize_labels",
    ops="EXT-sessionize,W1 (gap cumsum session labeling)",
    doc="Row-level batch sessionization: per user, events ordered by "
    "time get a session NUMBER via the lag-gap cumulative sum (new "
    "session when >30 min idle) — the event-level complement of "
    "F.session_window's aggregated windows. Emits each event's session "
    "number, its 1-based position in the session, and the session's "
    "event count. All integer window arithmetic on the micros epoch — "
    "exact cross-engine; ties ordered by (ts, event_id) total order.",
    oracle=f"""
WITH ordered AS (
  SELECT event_id, user_id, ts, epoch_us(ts) AS sec,
         LAG(epoch_us(ts)) OVER w AS prev_sec
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
flagged AS (
  SELECT *, CASE WHEN prev_sec IS NULL
                   OR sec - prev_sec > {_GAP_US} THEN 1 ELSE 0 END AS is_new
  FROM ordered
),
sess AS (
  SELECT event_id, user_id, ts,
         CAST(SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY sec, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_no,
         sec
  FROM flagged
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
       session_no,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY user_id, session_no ORDER BY sec, event_id) AS BIGINT)
         AS pos_in_session,
       CAST(COUNT(1) OVER (PARTITION BY user_id, session_no) AS BIGINT)
         AS session_events
FROM sess
""",
)
def events_sessionize_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    sec = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(sec, F.col("event_id"))
    flagged = events.select(
        "event_id",
        "user_id",
        "ts",
        sec.alias("sec"),
        F.when(
            F.lag(sec).over(w).isNull()
            | ((sec - F.lag(sec).over(w)) > _GAP_US),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn(
        "session_no", F.sum("is_new").over(wr).cast("bigint")
    )
    wpos = Window.partitionBy("user_id", "session_no").orderBy("sec", "event_id")
    wcnt = Window.partitionBy("user_id", "session_no")
    return sess.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "session_no",
        F.row_number().over(wpos).cast("bigint").alias("pos_in_session"),
        F.count(F.lit(1)).over(wcnt).alias("session_events"),
    )


@register(
    "events_anomaly_mad",
    ops="EXT-anomaly-mad,A1,W2 (median/MAD robust outlier hours)",
    doc="Robust rate-anomaly screen: hourly event counts, corpus median "
    "and MAD (median absolute deviation) — both exact percentile "
    "interpolations over integer counts (midpoints of ints, "
    "bit-identical cross-engine) — and each hour's MAD z-score "
    "numerator; hours with |count - median| > 5 * MAD are flagged. "
    "Aggregates run over the O(hours) rollup, never over raw events.",
    oracle="""
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
         CAST(COUNT(1) AS BIGINT) AS n
  FROM events GROUP BY 1
),
med AS (SELECT quantile_cont(n, 0.5) AS m FROM hourly),
dev AS (
  SELECT h.hour_ts, h.n, abs(h.n - m.m) AS ad FROM hourly h, med m
),
mad AS (SELECT quantile_cont(ad, 0.5) AS mad FROM dev)
SELECT epoch_us(d.hour_ts) AS hour_us, d.n,
       (SELECT m FROM med) AS median_n,
       (SELECT mad FROM mad) AS mad_n,
       d.ad AS abs_dev,
       d.ad > 5 * (SELECT mad FROM mad) AS flagged
FROM dev d
""",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = hourly.agg(F.expr("percentile(n, 0.5)").alias("m"))
    dev = hourly.crossJoin(F.broadcast(med)).select(
        "hour_ts", "n", "m", F.abs(F.col("n") - F.col("m")).alias("ad")
    )
    mad = dev.agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    return dev.crossJoin(F.broadcast(mad)).select(
        F.unix_micros("hour_ts").alias("hour_us"),
        "n",
        F.col("m").alias("median_n"),
        F.col("mad").alias("mad_n"),
        F.col("ad").alias("abs_dev"),
        (F.col("ad") > 5 * F.col("mad")).alias("flagged"),
    )


@register(
    "order_value_regression",
    ops="EXT-regression,A1 (exact-sufficient-statistics OLS)",
    doc="Distributed simple regression the scale-safe way: slope/"
    "intercept/Pearson r of l_extendedprice (whole dollars) on "
    "l_quantity from EXACT sufficient statistics — n, Σx, Σy, Σxy, "
    "Σx², Σy² accumulated as DECIMAL(38,0) integers (map-side "
    "combinable, associative, no float accumulation order anywhere) — "
    "then one identical double formula in both engines. The built-in "
    "corr/regr_* aggregates are NOT used: their streaming float "
    "updates differ across engines and partitionings; sufficient "
    "statistics are the 100 TB-portable formulation.",
    oracle="""
WITH pts AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
),
stats AS (
  SELECT CAST(COUNT(1) AS BIGINT) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
  FROM pts
)
SELECT n,
       CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
       (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         AS slope,
       (CAST(sy AS DOUBLE)
        - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          * CAST(sx AS DOUBLE)) / n AS intercept,
       (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS pearson_r
FROM stats
""",
)
def order_value_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.floor("l_extendedprice").cast("bigint").alias("y"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")
    stats = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * F.col("y")).alias("sxy"),
        F.sum(d("x") * F.col("x")).alias("sxx"),
        F.sum(d("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return stats.select(
        "n",
        F.col("sx").cast("bigint").alias("sum_x"),
        F.col("sy").cast("bigint").alias("sum_y"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("pearson_r"),
    )


_MED_FRAME = 6  # trailing frame: 6 preceding + current = 7 rows


@register(
    "events_rolling_median",
    ops="EXT-rolling-median,W1 (order-statistic window frame)",
    doc="Per-user trailing 7-row median of event value (integer cents): "
    "Spark has no percentile-over-frame, so the frame's values ride a "
    "collect_list window (<=7 elements by construction), are array_"
    "sorted, and the median falls out closed-form (middle element, or "
    "the mean of the two middles — exact halves of cents, so the "
    "double is bit-identical to DuckDB's windowed median). Windows "
    "partition per user; the frame is O(1), so state never scales "
    "with data. Rolled up per event_type: events above their own "
    "trailing median (momentum detector) + the max rolling median.",
    oracle=f"""
WITH cents AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS v
  FROM events
),
med AS (
  SELECT event_type, v,
         median(v) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {_MED_FRAME} PRECEDING AND CURRENT ROW
         ) AS roll_med
  FROM cents
)
SELECT event_type,
       CAST(COUNT(1) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN v > roll_med THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above_trailing_median,
       MAX(roll_med) AS max_rolling_median
FROM med
GROUP BY event_type
ORDER BY event_type
""",
)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_MED_FRAME, 0)
    )
    frame = F.array_sort(F.collect_list("v").over(w))
    n = F.size(frame)
    # 1-based middle positions; odd frames hit the same element twice.
    lo = F.element_at(frame, ((n + 1) / 2).cast("int"))
    hi = F.element_at(frame, (n / 2 + 1).cast("int"))
    med = events.select(
        "event_type",
        "v",
        ((lo + hi) / F.lit(2.0)).alias("roll_med"),
    )
    return (
        med.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("v") > F.col("roll_med"), 1).otherwise(0)
            ).alias("n_above_trailing_median"),
            F.max("roll_med").alias("max_rolling_median"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Split-conformal coverage audit (round 10)
# ---------------------------------------------------------------------------

_CONF_SALT = "conf"
# alpha = 0.1: the conformal quantile index is ceil(0.9 * (n_cal + 1)),
# computed in exact integers as (9 * (n_cal + 1) + 9) // 10.


@register(
    "conformal_coverage_audit",
    ops="EXT-conformal,A1,J1,W1 (split-conformal calibration)",
    doc="Split-conformal prediction audit (Vovk et al.; Angelopoulos & "
    "Bates 2023 tutorial form): orders hash-split 50/25/25 into "
    "train/calibration/test on the engine-shared salted-md5 uniform "
    "grid; the point predictor is the per-priority floor-mean of train "
    "prices in exact cents; nonconformity = |price - prediction|; qhat "
    "is the ceil(0.9(n+1))-th smallest calibration score (the "
    "finite-sample-valid conformal quantile), found scale-safely as the "
    "smallest score whose cumulative count reaches k over the "
    "(priority, distinct-score)-grain relation — never a corpus-wide "
    "sort. Reports per priority the empirical test coverage of the "
    "interval prediction +- qhat, which conformal theory guarantees "
    ">= 90% in expectation. All arithmetic exact integers.",
    oracle=f"""
WITH base AS (
  SELECT o_orderpriority AS pri,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
         {hash_uniform_sql("o_orderkey", _CONF_SALT)} AS u
  FROM orders
),
pred AS (
  SELECT pri, CAST(SUM(cents) // COUNT(1) AS BIGINT) AS pred_cents,
         CAST(COUNT(1) AS BIGINT) AS n_train
  FROM base WHERE u < 0.5 GROUP BY pri
),
cal AS (
  SELECT b.pri, ABS(b.cents - p.pred_cents) AS score
  FROM base b JOIN pred p ON p.pri = b.pri
  WHERE b.u >= 0.5 AND b.u < 0.75
),
calstat AS (
  SELECT pri, CAST(COUNT(1) AS BIGINT) AS n_cal,
         CAST((9 * (COUNT(1) + 1) + 9) // 10 AS BIGINT) AS k
  FROM cal GROUP BY pri
),
cum AS (
  SELECT pri, score,
         SUM(c) OVER (PARTITION BY pri ORDER BY score
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM (SELECT pri, score, COUNT(1) AS c FROM cal GROUP BY pri, score)
),
qhat AS (
  SELECT c.pri, CAST(MIN(c.score) AS BIGINT) AS qhat_cents
  FROM cum c JOIN calstat s ON s.pri = c.pri
  WHERE c.cum >= s.k
  GROUP BY c.pri
),
test AS (
  SELECT b.pri,
         CAST(COUNT(1) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN ABS(b.cents - p.pred_cents) <= q.qhat_cents
                       THEN 1 ELSE 0 END) AS BIGINT) AS covered
  FROM base b
  JOIN pred p ON p.pri = b.pri
  JOIN qhat q ON q.pri = b.pri
  WHERE b.u >= 0.75
  GROUP BY b.pri
)
SELECT p.pri AS o_orderpriority, p.n_train, p.pred_cents,
       s.n_cal, s.k, q.qhat_cents, t.n_test, t.covered,
       CAST(t.covered * 1000000 // t.n_test AS BIGINT) AS coverage_ppm
FROM pred p
JOIN calstat s ON s.pri = p.pri
JOIN qhat q ON q.pri = p.pri
JOIN test t ON t.pri = p.pri
ORDER BY o_orderpriority
""",
)
def conformal_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.sampling import hash_uniform
    from formula_1_spark.sources.tables import fan_out

    orders = fan_out(load_table(spark, sf_dir, "orders"))
    base = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        hash_uniform(F.col("o_orderkey"), _CONF_SALT).alias("u"),
    )
    pred = (
        base.filter(F.col("u") < 0.5)
        .groupBy("pri")
        .agg(
            F.expr("CAST(sum(cents) div count(1) AS BIGINT)").alias(
                "pred_cents"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
        )
    )
    cal = (
        base.filter((F.col("u") >= 0.5) & (F.col("u") < 0.75))
        .join(F.broadcast(pred), "pri")
        .select("pri", F.abs(F.col("cents") - F.col("pred_cents")).alias("score"))
    )
    calstat = cal.groupBy("pri").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal"),
        F.expr("CAST((9 * (count(1) + 1) + 9) div 10 AS BIGINT)").alias("k"),
    )
    # (priority, distinct-score) grain — the window walks value counts,
    # not rows, so the exchange stays bounded by the score domain.
    w = (
        Window.partitionBy("pri")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        cal.groupBy("pri", "score")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("cum", F.sum("c").over(w))
    )
    qhat = (
        cum.join(F.broadcast(calstat), "pri")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("pri")
        .agg(F.min("score").cast("bigint").alias("qhat_cents"))
    )
    test = (
        base.filter(F.col("u") >= 0.75)
        .join(F.broadcast(pred), "pri")
        .join(F.broadcast(qhat), "pri")
        .groupBy("pri")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("pred_cents"))
                    <= F.col("qhat_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("covered"),
        )
    )
    return (
        pred.join(calstat, "pri")
        .join(qhat, "pri")
        .join(test, "pri")
        .select(
            F.col("pri").alias("o_orderpriority"),
            "n_train",
            "pred_cents",
            "n_cal",
            "k",
            "qhat_cents",
            "n_test",
            "covered",
            F.expr("CAST(covered * 1000000 div n_test AS BIGINT)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("o_orderpriority")
    )
