"""Engine-native relational extras beyond the reference surface: as-of
join, range join, pivot, cube, distinct-count aggregates — each with a
DuckDB oracle (DuckDB's native ASOF JOIN verifies our union-scan as-of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.asof import asof_join_backward
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "asof_join_events",
    ops="EXT-asof-join,W1",
    doc="Backward as-of join with genuinely interleaved timestamps: each "
    "'error' event picks up the same user's most recent preceding (or "
    "simultaneous) 'click' event; union-scan implementation verified "
    "against DuckDB's native ASOF JOIN.",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts,
         arg_max(event_id, event_id) AS click_event_id,
         arg_max(value, event_id) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, ts
),
errors AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       c.click_event_id, c.click_value
FROM errors e
ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts >= c.ts
""",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Pre-reduce right-side ties on (key, ts) deterministically.
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max_by("event_id", "event_id").alias("click_event_id"),
            F.max_by("value", "event_id").alias("click_value"),
        )
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join_backward(
        errors,
        clicks.withColumnRenamed("user_id", "c_user_id").withColumnRenamed("ts", "c_ts"),
        left_key="user_id",
        right_key="c_user_id",
        left_ts="ts",
        right_ts="c_ts",
        payload_cols=["click_event_id", "click_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "click_event_id",
        "click_value",
    )


@register(
    "range_join_signup_funnel",
    ops="EXT-range-join,A1",
    doc="Equi-key range join (funnel): per signup event, count the same "
    "user's events within the following hour.",
    oracle="""
WITH signups AS (
  SELECT event_id AS signup_id, user_id, ts AS signup_ts
  FROM events WHERE event_type = 'signup'
)
SELECT s.signup_id,
       COUNT(e.event_id) AS n_follow,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS follow_value
FROM signups s
JOIN events e
  ON e.user_id = s.user_id
 AND e.ts > s.signup_ts
 AND e.ts <= s.signup_ts + INTERVAL '1 hour'
GROUP BY s.signup_id
""",
)
def range_join_signup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("signup_ts"),
    )
    joined = signups.join(
        events,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("ts") > F.col("signup_ts"))
        & (F.col("ts") <= F.col("signup_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.groupBy("signup_id").agg(
        F.count("event_id").alias("n_follow"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("follow_value"),
    )


_PIVOT_COLS = ", ".join(
    'COUNT(CASE WHEN o_orderpriority = \'{p}\' THEN 1 END) AS "{p}"'.format(p=p)
    for p in PRIORITIES
)


@register(
    "orders_priority_pivot",
    ops="EXT-pivot,A5",
    doc="Pivot: order counts per year x priority (explicit value list → "
    "deterministic columns).",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       {_PIVOT_COLS}
FROM orders
GROUP BY 1
""",
)
def orders_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, PRIORITIES)
    )


@register(
    "lineitem_cube",
    ops="EXT-cube,A5",
    doc="CUBE over (returnflag, linestatus): all grouping-set subtotals.",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(1) AS n_rows,
       SUM(l_quantity) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def lineitem_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty")
    )


@register(
    "quantity_percentiles",
    ops="EXT-percentile,A5",
    doc="Exact interpolated percentiles (p50/p90) + median per return "
    "flag — Spark percentile ≡ DuckDB quantile_cont (verified identical "
    "interpolation).",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.5) AS price_median
FROM lineitem
GROUP BY l_returnflag
""",
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("p50"),
        F.percentile("l_quantity", 0.9).alias("p90"),
        F.percentile("l_extendedprice", 0.5).alias("price_median"),
    )


@register(
    "global_topk_two_phase",
    ops="W2-scale,O3",
    doc="Scale-safe global top-20 lineitems by extendedprice: "
    "per-partition rank prune → global rank on survivors — the pattern "
    "that replaces single-partition Window.orderBy on raw data.",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice,
       CAST(RANK() OVER (
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC)
         AS INTEGER) AS rank
FROM lineitem
QUALIFY rank <= 20
""",
)
def global_topk_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import two_phase_global_topk

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return two_phase_global_topk(
        li,
        [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        k=20,
        unique_order=True,
    )


@register(
    "distinct_counts",
    ops="EXT-distinct-agg,A5",
    doc="Exact distinct-count aggregates per return flag.",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
GROUP BY l_returnflag
""",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@register(
    "funnel_staged_conversion",
    ops="EXT-funnel,A1,J1 (ordered-sequence analytic)",
    doc="Ordered conversion funnel view -> click -> purchase: per user, "
    "the first view, the first click strictly after it, and the first "
    "purchase strictly after that. Three co-partitioned aggregations on "
    "user_id (the staged decorrelation of a sequence-pattern match); "
    "only fully-converted users survive.",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(v.t_view) AS t_view, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(c.t_view) AS t_view, MIN(c.t_click) AS t_click,
         MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT user_id, epoch_us(t_view) AS view_us, epoch_us(t_click) AS click_us,
       epoch_us(t_purchase) AS purchase_us
FROM p
""",
)
def funnel_staged_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def first_after(prev: DataFrame, etype: str, out: str, carry: list[str]) -> DataFrame:
        # every stage keys on user_id: the aggregations and joins share one
        # hash partitioning, so stages 2-3 add no new shuffle of the fact
        nxt = events.filter(F.col("event_type") == etype).select(
            F.col("user_id").alias("u"), "ts"
        )
        gate = carry[-1]
        return (
            nxt.join(prev, nxt.u == prev.user_id)
            .filter(F.col("ts") > F.col(gate))
            .groupBy("user_id")
            .agg(
                *[F.min(col).alias(col) for col in carry],
                F.min("ts").alias(out),
            )
        )

    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = first_after(v, "click", "t_click", ["t_view"])
    p = first_after(c, "purchase", "t_purchase", ["t_view", "t_click"])
    return p.select(
        "user_id",
        F.unix_micros("t_view").alias("view_us"),
        F.unix_micros("t_click").alias("click_us"),
        F.unix_micros("t_purchase").alias("purchase_us"),
    )


@register(
    "cohort_retention_matrix",
    ops="EXT-cohort-retention,A1,J1,A4",
    doc="Cohort retention: customers bucketed by first-order month, "
    "counted distinct in each subsequent activity month. Both "
    "aggregations and the join key on o_custkey, so the fact shuffles "
    "once; month arithmetic is integer (year*12+month deltas), never "
    "fractional months_between.",
    oracle="""
WITH first_order AS (
  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey
)
SELECT strftime(f.cohort_month, '%Y-%m') AS cohort,
       (year(o.o_orderdate) - year(f.cohort_month)) * 12
         + (month(o.o_orderdate) - month(f.cohort_month)) AS months_since,
       COUNT(DISTINCT o.o_custkey) AS active_customers
FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
GROUP BY 1, 2
""",
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    first_order = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month")
    )
    fo = first_order.select(
        F.col("o_custkey").alias("fo_custkey"), "cohort_month"
    )
    months_since = (
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month"))
    )
    return (
        orders.join(fo, orders.o_custkey == fo.fo_custkey)
        .groupBy(
            F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
            months_since.alias("months_since"),
        )
        .agg(F.countDistinct("o_custkey").alias("active_customers"))
    )


@register(
    "lineitem_unpivot_metrics",
    ops="EXT-unpivot,P1",
    doc="UNPIVOT (melt): one month of lineitem wide metric columns "
    "(quantity, extendedprice, discount) rotated into (metric, value) "
    "rows via DataFrame.unpivot — the long-form reshape feeding "
    "metric-generic downstream aggregation; oracled as the equivalent "
    "UNION ALL.",
    oracle="""
WITH month AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-06-01'
    AND l_shipdate < TIMESTAMP '1998-07-01'
)
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
FROM month
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM month
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM month
""",
)
def lineitem_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-06-01") & (F.col("l_shipdate") < "1998-07-01")
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "referential_integrity_audit",
    ops="EXT-dq-audit,J-anti,A5 (data-quality gate)",
    doc="Data-quality audit across the lake in one result: orphaned "
    "foreign keys (anti-joins), null key counts, and primary-key "
    "duplicate counts per table — the dbt-test-style gate a pipeline "
    "runs before promoting a snapshot. Each check is a counting "
    "aggregate; the union is a constant number of small rows.",
    oracle="""
SELECT 'orders_custkey_orphans' AS check_name,
       (SELECT COUNT(1) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_violations
UNION ALL
SELECT 'lineitem_orderkey_orphans',
       (SELECT COUNT(1) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem_partkey_orphans',
       (SELECT COUNT(1) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'customer_pk_duplicates',
       (SELECT COUNT(1) FROM (
          SELECT c_custkey FROM customer
          GROUP BY c_custkey HAVING COUNT(1) > 1))
UNION ALL
SELECT 'orders_null_custkey',
       (SELECT COUNT(1) FROM orders WHERE o_custkey IS NULL)
""",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def count_df(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )

    checks = [
        count_df(
            "orders_custkey_orphans",
            orders.join(
                customer, orders.o_custkey == customer.c_custkey, "left_anti"
            ),
        ),
        count_df(
            "lineitem_orderkey_orphans",
            li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti"),
        ),
        count_df(
            "lineitem_partkey_orphans",
            li.join(part, li.l_partkey == part.p_partkey, "left_anti"),
        ),
        count_df(
            "customer_pk_duplicates",
            customer.groupBy("c_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1),
        ),
        count_df(
            "orders_null_custkey", orders.filter(F.col("o_custkey").isNull())
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "orders_seasonality_profile",
    ops="EXT-seasonality,A1,W1 (month-of-year index vs annual mean)",
    doc="Seasonality profile: order counts and exact decimal revenue per "
    "calendar month-of-year, plus each month's index vs the all-month "
    "mean in ppm (integer arithmetic; mean = total div 12 exact "
    "integer). One scan, one 12-group aggregate, scalar totals "
    "broadcast.",
    oracle="""
WITH m AS (
  SELECT CAST(month(o_orderdate) AS INT) AS month_of_year,
         CAST(COUNT(1) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_orders) AS BIGINT) AS t_orders,
         CAST(SUM(revenue_cents) AS BIGINT) AS t_rev
  FROM m
)
SELECT m.month_of_year, m.n_orders, m.revenue_cents,
       (m.n_orders * 12 * 1000000) // t.t_orders AS order_index_ppm,
       (m.revenue_cents * 12 * 1000000) // t.t_rev AS revenue_index_ppm
FROM m, tot t
""",
)
def orders_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.month("o_orderdate").cast("int").alias("month_of_year")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "revenue_cents"
        ),
    )
    tot = m.agg(
        F.sum("n_orders").alias("t_orders"), F.sum("revenue_cents").alias("t_rev")
    )
    return m.crossJoin(F.broadcast(tot)).select(
        "month_of_year",
        "n_orders",
        "revenue_cents",
        F.expr("(n_orders * 12 * 1000000) div t_orders").alias("order_index_ppm"),
        # Lift to decimal(38,0) for the x12e6 scaling: monthly revenue
        # cents overflow int64 at ~8e11 cents (hit at the 10x probe
        # scale; DuckDB computes the same expression in HUGEINT). div
        # returns BIGINT, and the quotient is ppm-sized.
        F.expr(
            "(cast(revenue_cents as decimal(38,0)) * 12 * 1000000) div t_rev"
        ).alias("revenue_index_ppm"),
    )


@register(
    "part_revenue_pareto",
    ops="EXT-pareto,W1,A1 (cumulative-share concentration curve)",
    doc="Pareto (80/20) concentration curve: parts ranked by exact "
    "integer revenue cents, cumulative share in ppm via a window cumsum "
    "over the PART-level rollup (never over lineitem), and the "
    "in_top_80pct flag marking the prefix that covers 80% of revenue. "
    "Top-100 parts emitted (the curve's head) with their cumulative "
    "shares.",
    oracle="""
WITH pr AS (
  SELECT l_partkey, CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
         AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS t FROM pr),
ranked AS (
  SELECT l_partkey, rev,
         CAST(ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey ASC) AS INT)
           AS rk,
         CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_rev
  FROM pr
)
SELECT r.l_partkey, r.rev, r.rk,
       (r.cum_rev * 1000000) // t.t AS cum_share_ppm,
       (r.cum_rev * 1000000) // t.t <= 800000 AS in_top_80pct
FROM ranked r, tot t
WHERE r.rk <= 100
ORDER BY r.rk
""",
)
def part_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.operators.windows import two_phase_global_topk

    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("bigint")).alias("rev")
    )
    tot = pr.agg(F.sum("rev").alias("t"))
    # Two-phase top-100 over the part rollup ((rev, l_partkey) is a total
    # order, so rank == row_number); the prefix property means cum_rev over
    # the 100 survivors equals cum_rev over the full relation for those
    # rows, so the cumsum window runs over <=100 rows.
    w = Window.orderBy(F.desc("rev"), F.asc("l_partkey"))
    top = two_phase_global_topk(
        pr, [F.desc("rev"), F.asc("l_partkey")], 100, alias="rk_raw",
        unique_order=True,
    )
    ranked = top.select(
        "l_partkey",
        "rev",
        F.col("rk_raw").cast("int").alias("rk"),
        F.sum("rev")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_rev"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "rev",
            "rk",
            # decimal(38,0) lift: cum_rev approaches total corpus revenue
            # cents, so cum_rev * 1e6 overflows int64 past ~9e12 cents
            # (DuckDB computes this in HUGEINT). div returns BIGINT.
            F.expr("(cast(cum_rev as decimal(38,0)) * 1000000) div t").alias(
                "cum_share_ppm"
            ),
            (
                F.expr("(cast(cum_rev as decimal(38,0)) * 1000000) div t")
                <= 800000
            ).alias("in_top_80pct"),
        )
        .orderBy("rk")
    )


@register(
    "customer_rfm_segments",
    ops="EXT-rfm,W1,A1 (recency/frequency/monetary quartile segmentation)",
    doc="Classic RFM segmentation: per customer, recency (days from "
    "last order to the corpus max date — integer), frequency (order "
    "count), monetary (exact revenue cents); each dimension cut into "
    "quartiles by ntile(4) over a (metric, custkey) total order "
    "(recency ascending = best first); segment label 'r-f-m' of "
    "quartile digits. Emits segment sizes and per-segment means on the "
    "exact integer grid. Windows run over the customer rollup.",
    oracle="""
WITH mx AS (SELECT MAX(o_orderdate) AS mx FROM orders),
cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(o_orderdate), (SELECT mx FROM mx))
              AS BIGINT) AS recency_days,
         CAST(COUNT(1) AS BIGINT) AS frequency,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey
),
tiled AS (
  SELECT o_custkey, recency_days, frequency, monetary_cents,
         CAST(NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS INT) AS r_q,
         CAST(NTILE(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS INT) AS f_q,
         CAST(NTILE(4) OVER (ORDER BY monetary_cents DESC, o_custkey ASC) AS INT) AS m_q
  FROM cust
)
SELECT r_q || '-' || f_q || '-' || m_q AS segment,
       CAST(COUNT(1) AS BIGINT) AS n_customers,
       CAST((SUM(recency_days) * 1) // COUNT(1) AS BIGINT) AS mean_recency_days,
       CAST((SUM(frequency) * 1) // COUNT(1) AS BIGINT) AS mean_frequency,
       CAST((SUM(monetary_cents) * 1) // COUNT(1) AS BIGINT) AS mean_monetary_cents
FROM tiled
GROUP BY 1
""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import global_ntile_two_phase

    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("mx"))
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "monetary_cents"
            ),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff("mx", "last_order").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    # Three exact two-phase NTILE(4) passes over the customer rollup —
    # each a parallel range shuffle, replacing three unpartitioned ntile
    # windows that would funnel every customer through one task at scale.
    # Persist the rollup so the three enumerations share one orders scan.
    cust = cust.persist()
    tiled = global_ntile_two_phase(
        cust, [F.asc("recency_days"), F.asc("o_custkey")], 4, alias="r_q"
    )
    tiled = global_ntile_two_phase(
        tiled, [F.desc("frequency"), F.asc("o_custkey")], 4, alias="f_q"
    )
    tiled = global_ntile_two_phase(
        tiled, [F.desc("monetary_cents"), F.asc("o_custkey")], 4, alias="m_q"
    )
    return tiled.groupBy(
        F.concat_ws("-", "r_q", "f_q", "m_q").alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr("sum(recency_days) div count(1)").alias("mean_recency_days"),
        F.expr("sum(frequency) div count(1)").alias("mean_frequency"),
        F.expr("sum(monetary_cents) div count(1)").alias("mean_monetary_cents"),
    )


@register(
    "orders_mom_change",
    ops="EXT-mom-change,W1,A1 (month-over-month delta via lag)",
    doc="Month-over-month revenue change: monthly exact-cents rollup, "
    "lag(1) over the month sequence, absolute delta and relative "
    "change in ppm (integer div; NULL for the first month). The lag "
    "window runs over the O(months) rollup.",
    oracle="""
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
         CAST(COUNT(1) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT strftime(month_start, '%Y-%m-%d') AS month_start,
         revenue_cents, n_orders,
         LAG(revenue_cents) OVER (ORDER BY month_start) AS prev_cents
  FROM m
)
SELECT month_start, revenue_cents, n_orders,
       revenue_cents - prev_cents AS delta_cents,
       ((revenue_cents - prev_cents) * 1000000) // prev_cents
         AS mom_change_ppm
FROM lagged
""",
)
def orders_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("ms")
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "revenue_cents"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("ms")
    lagged = m.withColumn("prev_cents", F.lag("revenue_cents").over(w))
    return lagged.select(
        F.date_format("ms", "yyyy-MM-dd").alias("month_start"),
        "revenue_cents",
        "n_orders",
        (F.col("revenue_cents") - F.col("prev_cents")).alias("delta_cents"),
        # decimal(38,0) lift before the x1e6 scaling — monthly revenue
        # cents overflow int64 past ~9e12 (DuckDB runs this in HUGEINT).
        F.expr(
            "(cast(revenue_cents - prev_cents as decimal(38,0)) * 1000000)"
            " div prev_cents"
        ).alias("mom_change_ppm"),
    )


@register(
    "customer_order_gap_stats",
    ops="EXT-order-gaps,W1,A1 (inter-purchase interval distribution)",
    doc="Inter-order gap distribution (the churn-model feature): days "
    "between consecutive orders per customer via lag over the "
    "(o_orderdate, o_orderkey) key-partitioned order, then corpus "
    "stats per gap band (integer-day buckets: <30, 30-89, 90-364, "
    "365+): gap count, exact mean days, share ppm. The lag window is "
    "key-partitioned (co-partitioned with the shuffle) — no global "
    "sort anywhere.",
    oracle="""
WITH seq AS (
  SELECT o_custkey,
         date_diff('day',
           LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap_days
  FROM orders
),
gaps AS (SELECT gap_days FROM seq WHERE gap_days IS NOT NULL),
banded AS (
  SELECT CASE WHEN gap_days < 30 THEN '<30'
              WHEN gap_days < 90 THEN '30-89'
              WHEN gap_days < 365 THEN '90-364'
              ELSE '365+' END AS gap_band,
         gap_days
  FROM gaps
),
tot AS (SELECT CAST(COUNT(1) AS BIGINT) AS t FROM banded)
SELECT b.gap_band,
       CAST(COUNT(1) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_days) AS BIGINT) // COUNT(1) AS mean_gap_days,
       (COUNT(1) * 1000000) // any_value(t.t) AS share_ppm
FROM banded b, tot t
GROUP BY b.gap_band
""",
)
def customer_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.datediff(
            "o_orderdate", F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    banded = seq.select(
        F.when(F.col("gap_days") < 30, "<30")
        .when(F.col("gap_days") < 90, "30-89")
        .when(F.col("gap_days") < 365, "90-364")
        .otherwise("365+")
        .alias("gap_band"),
        F.col("gap_days").cast("bigint").alias("gap_days"),
    )
    tot = banded.agg(F.count(F.lit(1)).alias("t"))
    return (
        banded.crossJoin(F.broadcast(tot))
        .groupBy("gap_band")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.expr("sum(gap_days) div count(1)").alias("mean_gap_days"),
            F.expr("(count(1) * 1000000) div any_value(t)").alias("share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket brand affinity (round 7)
# ---------------------------------------------------------------------------


@register(
    "basket_brand_affinity",
    ops="EXT-basket-affinity,J5,A1,O3 (association lift, integer-exact)",
    doc="Market-basket association mining at brand grain: distinct "
    "(order, brand) pairs via a broadcast part-dim join, in-order brand "
    "pair co-occurrence (the self-join keys on the ORDER, so per-order "
    "fan-out is bounded by distinct brands per order — <= 78 pairs on "
    "TPC-H's <= 13-lineitem orders, never corpus-scale), and exact "
    "integer support/confidence/lift in ppm (decimal(38,0) lift for the "
    "co x N x 1e6 numerator — int64 overflows past ~9e3 co-occurrences "
    "x 1e6 orders). Top-50 by lift.",
    oracle="""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM ob),
bc AS (SELECT b, CAST(COUNT(1) AS BIGINT) AS cb FROM ob GROUP BY b),
pairs AS (
  SELECT x.b AS brand_a, y.b AS brand_b, CAST(COUNT(1) AS BIGINT) AS co
  FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
  GROUP BY x.b, y.b
)
SELECT p.brand_a, p.brand_b, p.co AS co_orders,
       ca.cb AS orders_a, cb2.cb AS orders_b,
       CAST(p.co * 1000000 // n.n_orders AS BIGINT) AS support_ppm,
       CAST(p.co * 1000000 // ca.cb AS BIGINT) AS confidence_a_to_b_ppm,
       CAST(p.co::HUGEINT * n.n_orders * 1000000
            // (ca.cb * cb2.cb) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN bc ca ON ca.b = p.brand_a
JOIN bc cb2 ON cb2.b = p.brand_b
CROSS JOIN n
ORDER BY lift_ppm DESC, brand_a, brand_b
LIMIT 50
""",
)
def basket_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # localCheckpoint: four consumers read the distinct (order, brand)
    # relation (the order count, per-brand counts, and both sides of the
    # pair self-join) — without it each re-ran the corpus join+distinct.
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = ob.agg(F.count_distinct("o").alias("n_orders"))
    bc = ob.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
    x = ob.select("o", F.col("b").alias("brand_a"))
    y = ob.select("o", F.col("b").alias("brand_b"))
    pairs = (
        x.join(y, "o")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    )
    return (
        pairs.join(
            F.broadcast(bc.select(F.col("b").alias("brand_a"),
                                  F.col("cb").alias("orders_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(bc.select(F.col("b").alias("brand_b"),
                                  F.col("cb").alias("orders_b"))),
            "brand_b",
        )
        .join(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("co").alias("co_orders"),
            "orders_a",
            "orders_b",
            F.expr("cast(co * 1000000 div n_orders as bigint)").alias(
                "support_ppm"
            ),
            F.expr("cast(co * 1000000 div orders_a as bigint)").alias(
                "confidence_a_to_b_ppm"
            ),
            F.expr(
                "cast(cast(co as decimal(38,0)) * n_orders * 1000000"
                " div (orders_a * orders_b) as bigint)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "brand_a", "brand_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Interval stabbing via event sweep (round 7)
# ---------------------------------------------------------------------------


@register(
    "orders_open_backlog_daily",
    ops="EXT-interval-sweep,A1,W2 (event-sweep interval counting)",
    doc="Daily open-order backlog by EVENT SWEEP — the scalable "
    "formulation of interval stabbing: each order emits +1 at "
    "o_orderdate and -1 the day after its last shipment, deltas "
    "aggregate to date grain (bounded by the calendar domain, never "
    "order count), and a running sum over the date-grain rollup yields "
    "the open count per day. The naive days x open-orders range join "
    "this replaces is quadratic; the sweep is one groupBy + one "
    "domain-bounded window. Emits day, opened, closed, open_orders.",
    oracle="""
WITH ends AS (
  SELECT l_orderkey AS o, CAST(MAX(l_shipdate) AS DATE) AS end_d
  FROM lineitem GROUP BY 1
),
iv AS (
  SELECT CAST(o.o_orderdate AS DATE) AS start_d, e.end_d
  FROM orders o JOIN ends e ON e.o = o.o_orderkey
  WHERE e.end_d >= CAST(o.o_orderdate AS DATE)
),
deltas AS (
  SELECT start_d AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT end_d + 1, -1 FROM iv
),
daily AS (
  SELECT day,
         CAST(SUM(delta) AS BIGINT) AS net,
         CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS opened,
         CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS closed
  FROM deltas GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day, opened, closed,
       CAST(SUM(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS open_orders
FROM daily
ORDER BY day
""",
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ends = li.groupBy(F.col("l_orderkey").alias("o")).agg(
        F.max("l_shipdate").cast("date").alias("end_d")
    )
    iv = orders.withColumn(
        "start_d", F.col("o_orderdate").cast("date")
    ).join(ends, F.col("o_orderkey") == F.col("o")).filter(
        F.col("end_d") >= F.col("start_d")
    )
    deltas = iv.select(
        F.col("start_d").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            F.date_add("end_d", 1).alias("day"), F.lit(-1).alias("delta")
        )
    )
    daily = deltas.groupBy("day").agg(
        F.sum("delta").cast("bigint").alias("net"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("opened"),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("closed"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "opened",
            "closed",
            F.sum("net").over(w).cast("bigint").alias("open_orders"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Herfindahl concentration index (round 7)
# ---------------------------------------------------------------------------


@register(
    "segment_hhi_concentration",
    ops="EXT-concentration-hhi,A1 (exact integer market concentration)",
    doc="Herfindahl-Hirschman concentration of order revenue per market "
    "segment: per customer the integer-cents revenue, per segment "
    "HHI = sum(share^2) in ppm computed from exact decimal(38,0) "
    "sufficient statistics (sum of squared cents over squared total — "
    "no per-customer float shares anywhere), plus the top customer's "
    "share. 10000 ppm = the US-antitrust 'highly concentrated' line "
    "scaled; near 1e6/n = perfectly even. Two map-side-combined "
    "aggregates; nothing joins at customer grain.",
    oracle="""
WITH rev AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT segment,
       CAST(COUNT(1) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(MAX(cents) * 1000000 // SUM(cents) AS BIGINT)
         AS top_customer_share_ppm,
       CAST(SUM(cents::HUGEINT * cents) * 1000000
            // (SUM(cents)::HUGEINT * SUM(cents)) AS BIGINT) AS hhi_ppm
FROM rev
GROUP BY segment
ORDER BY segment
""",
)
def segment_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
            .cast("bigint")
            .alias("cents")
        )
    )
    return (
        rev.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.expr(
                "cast(max(cents) * 1000000 div sum(cents) as bigint)"
            ).alias("top_customer_share_ppm"),
            F.expr(
                "cast(sum(cast(cents as decimal(38,0)) * cents) * 1000000"
                " div (cast(sum(cents) as decimal(38,0)) * sum(cents))"
                " as bigint)"
            ).alias("hhi_ppm"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection (round 8)
# ---------------------------------------------------------------------------

_CUSUM_TOP = 25


@register(
    "orders_cusum_changepoint",
    ops="EXT-changepoint,A1,W1 (integer CUSUM level-shift detection)",
    doc="Change-point detection on the daily order-count series via the "
    "classic CUSUM statistic (Page 1954): cusum_j = sum_{i<=j} "
    "(count_i - mean), computed EXACTLY in integer micro-units "
    "(count * 1e6 - total * 1e6 div n_days accumulates bigints — no "
    "float drift for the driver hash), the day with max |cusum| is the "
    "level-shift estimate. The corpus-scale work is one date-grain "
    "count; the running sum and ranking act on the day-grain relation, "
    "bounded by the DATE DOMAIN (~2.4k days for TPC-H), never row "
    "count. Reports the top-25 |cusum| days with the argmax flagged.",
    oracle=f"""
WITH daily AS (
  SELECT o_orderdate AS d, CAST(COUNT(1) AS BIGINT) AS c
  FROM orders GROUP BY o_orderdate
),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t, CAST(COUNT(1) AS BIGINT) AS n
  FROM daily
),
dev AS (
  SELECT d.d, d.c,
         CAST(d.c * 1000000 - (t.t * 1000000) // t.n AS BIGINT) AS dev_micro
  FROM daily d CROSS JOIN tot t
),
cs AS (
  SELECT d, c, dev_micro,
         CAST(SUM(dev_micro) OVER (ORDER BY d) AS BIGINT) AS cusum_micro
  FROM dev
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY ABS(cusum_micro) DESC, d) AS r
  FROM cs
)
SELECT STRFTIME(d, '%Y-%m-%d') AS day, c AS n_orders, cusum_micro,
       CAST(CASE WHEN r = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_changepoint
FROM rk WHERE r <= {_CUSUM_TOP}
ORDER BY day
""",
)
def orders_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = daily.agg(
        F.sum("c").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    dev = daily.join(F.broadcast(tot)).select(
        "d",
        "c",
        F.expr("cast(c * 1000000 - (t * 1000000) div n as bigint)").alias(
            "dev_micro"
        ),
    )
    # Post-agg windows: the relation is date-domain-grain (~2.4k rows at
    # any corpus scale), so the global ordering is bounded.
    cs = dev.withColumn(
        "cusum_micro",
        F.sum("dev_micro").over(Window.orderBy("d")).cast("bigint"),
    )
    rk = cs.withColumn(
        "r",
        F.row_number().over(
            Window.orderBy(F.desc(F.abs(F.col("cusum_micro"))), F.asc("d"))
        ),
    )
    return (
        rk.filter(F.col("r") <= _CUSUM_TOP)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("c").alias("n_orders"),
            "cusum_micro",
            F.when(F.col("r") == 1, 1).otherwise(0).cast("bigint").alias(
                "is_changepoint"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Interval overlap join via time-bucket blocking (round 10)
# ---------------------------------------------------------------------------

_IOJ_W = 300  # bucket width (s) == max interval duration -> <= 2 buckets each


@register(
    "interval_overlap_join",
    ops="EXT-interval-join,J4,P6 (bucket-blocked interval overlap)",
    doc="Interval overlap join with NO equi key — the join class a naive "
    "plan turns into a cartesian product: every purchase event becomes "
    "the interval [ts, ts + 60 + floor(value) % 240 s) and the query "
    "finds all cross-user overlapping pairs. Scale path: each interval "
    f"is exploded to the <= 2 width-{_IOJ_W}s time buckets it touches "
    "(bucket width == the max duration, the standard interval-blocking "
    "bound), candidates pair up through an equi-join on the bucket, "
    "duplicates from pairs sharing 2 buckets collapse via distinct, and "
    "the exact half-open overlap predicate re-verifies — shuffle volume "
    "is O(intervals + true pairs), never O(n^2). The DuckDB oracle "
    "states the same join declaratively (its IEJoin handles the "
    "inequality natively). All epoch math in exact integer seconds.",
    oracle=f"""
WITH iv AS (
  SELECT event_id, user_id,
         epoch_us(ts) // 1000000 AS s,
         epoch_us(ts) // 1000000 + 60
           + CAST(FLOOR(value) AS BIGINT) % 240 AS e
  FROM events WHERE event_type = 'purchase'
)
SELECT a.event_id AS event_a, b.event_id AS event_b,
       a.user_id AS user_a, b.user_id AS user_b,
       CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT) AS overlap_s
FROM iv a JOIN iv b
  ON a.event_id < b.event_id AND a.user_id <> b.user_id
 AND a.s < b.e AND b.s < a.e
ORDER BY event_a, event_b
""",
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    iv = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.expr("unix_micros(ts) div 1000000").alias("s"),
            F.expr(
                "unix_micros(ts) div 1000000 + 60"
                " + CAST(FLOOR(value) AS BIGINT) % 240"
            ).alias("e"),
        )
    )
    bucketed = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"s div {_IOJ_W}"), F.expr(f"(e - 1) div {_IOJ_W}")
            )
        ),
    )
    a = bucketed.select(
        "bucket",
        F.col("event_id").alias("event_a"),
        F.col("user_id").alias("user_a"),
        F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
    )
    b = bucketed.select(
        "bucket",
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("user_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
    )
    return (
        a.join(
            b,
            (a["bucket"] == b["bucket"])
            & (F.col("event_a") < F.col("event_b"))
            & (F.col("user_a") != F.col("user_b"))
            & (F.col("s_a") < F.col("e_b"))
            & (F.col("s_b") < F.col("e_a")),
        )
        .select(
            "event_a",
            "event_b",
            "user_a",
            "user_b",
            (F.least("e_a", "e_b") - F.greatest("s_a", "s_b"))
            .cast("bigint")
            .alias("overlap_s"),
        )
        .distinct()
        .orderBy("event_a", "event_b")
    )
