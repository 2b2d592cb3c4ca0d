"""Window-frame breadth (SURVEY §2.5 depth the reference never used):
lag/lead, running sums with explicit frames, moving averages, ntile —
all with DuckDB oracles. Window order is made total (date + orderkey
tie-break) so frame-dependent accumulations are engine-deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table


@register(
    "window_frames_battery",
    ops="EXT-window-frames,W1",
    doc="lag/lead, running decimal sum (UNBOUNDED PRECEDING..CURRENT), "
    "3-row moving average, ntile(4) per customer order history.",
    oracle="""
SELECT o_orderkey, o_custkey,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / least(CAST(ROW_NUMBER() OVER w AS INTEGER), 3) AS moving_avg3,
       CAST(ntile(4) OVER w AS INTEGER) AS spend_quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_frames_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec_price = F.col("o_totalprice").cast("decimal(18,2)")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(dec_price).over(running).cast("double").alias("running_spend"),
        (
            F.sum(dec_price).over(last3).cast("double")
            / F.least(F.row_number().over(w), F.lit(3))
        ).alias("moving_avg3"),
        F.ntile(4).over(w).alias("spend_quartile"),
    )


@register(
    "array_functions_battery",
    ops="EXT-arrays",
    doc="Array ops over embeddings: size, slice+transform (emitted as "
    "scalar h0..h3 — the driver canonicalizer can't hash list cells), "
    "sort head, contains-positive, elementwise scale.",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       CAST(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))[1] AS DOUBLE) AS h0,
       CAST(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))[2] AS DOUBLE) AS h1,
       CAST(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))[3] AS DOUBLE) AS h2,
       CAST(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))[4] AS DOUBLE) AS h3,
       CAST(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[1]
            AS DOUBLE) AS min_val,
       len(list_filter(embedding, x -> x > 0)) > 0 AS any_positive,
       CAST(list_transform(embedding[1:2], x -> CAST(x AS DOUBLE) * 2.0)[1]
            AS DOUBLE) AS d0_doubled,
       CAST(list_transform(embedding[1:2], x -> CAST(x AS DOUBLE) * 2.0)[2]
            AS DOUBLE) AS d1_doubled
FROM embeddings
""",
)
def array_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    head4 = F.transform(F.slice(e, 1, 4), lambda x: x.cast("double"))
    doubled = F.transform(F.slice(e, 1, 2), lambda x: x.cast("double") * 2.0)
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        *[head4[i].alias(f"h{i}") for i in range(4)],
        F.array_min(F.transform(e, lambda x: x.cast("double"))).alias("min_val"),
        F.exists(e, lambda x: x > 0).alias("any_positive"),
        doubled[0].alias("d0_doubled"),
        doubled[1].alias("d1_doubled"),
    )


# ---------------------------------------------------------------------------
# Rank-function battery (round 10)
# ---------------------------------------------------------------------------


@register(
    "window_rank_functions_battery",
    ops="EXT-window-ranks,W1,A1 (rank-family breadth on a bounded grain)",
    doc="The full rank-function family — rank, dense_rank, percent_rank, "
    "cume_dist, ntile(4), row_number — exercised per return-flag over "
    "the (flag, status, ship-month) ROLLUP relation, not raw rows: the "
    "windows run on a DOMAIN-BOUNDED aggregate (flags x statuses x "
    "months), so no partition ever scales with the data. Ties are made "
    "total by (month total, status, month) so every rank is "
    "deterministic; percent_rank/cume_dist divide small exact integers, "
    "so the doubles agree bit-for-bit cross-engine.",
    oracle="""
WITH cells AS (
  SELECT l_returnflag AS flag, l_linestatus AS status,
         CAST(date_trunc('month', l_shipdate) AS DATE)::VARCHAR AS ship_month,
         CAST(SUM(l_quantity) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2, 3
)
SELECT flag, status, ship_month, qty,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       CAST(row_number() OVER w AS BIGINT) AS rn
FROM cells
WINDOW w AS (PARTITION BY flag ORDER BY qty DESC, status ASC, ship_month ASC)
ORDER BY flag, rn
""",
)
def window_rank_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias(
            "ship_month"
        ),
    ).agg(F.sum("l_quantity").cast("bigint").alias("qty"))
    w = Window.partitionBy("flag").orderBy(
        F.desc("qty"), F.asc("status"), F.asc("ship_month")
    )
    return cells.select(
        "flag",
        "status",
        "ship_month",
        "qty",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    ).orderBy("flag", "rn")


# ---------------------------------------------------------------------------
# Value-function battery with IGNORE NULLS (round 10)
# ---------------------------------------------------------------------------


@register(
    "window_value_functions_battery",
    ops="EXT-window-values,W1 (first/last/nth_value IGNORE NULLS)",
    doc="The window VALUE-function family — first_value, last_value, "
    "nth_value(2), each in RESPECT and IGNORE NULLS forms — over the "
    "domain-bounded (flag, status, ship-month) rollup with a NULL "
    "injected into every third month's qty. last_value runs on the "
    "full-partition frame (the default running frame makes last_value "
    "== current row, the classic gotcha, pinned here explicitly). "
    "Windows never scale with data; ordering is total.",
    oracle="""
WITH cells AS (
  SELECT l_returnflag AS flag, l_linestatus AS status,
         CAST(date_trunc('month', l_shipdate) AS DATE)::VARCHAR AS ship_month,
         CASE WHEN month(l_shipdate) % 3 = 0 THEN NULL
              ELSE CAST(SUM(l_quantity) AS BIGINT) END AS qty
  FROM lineitem
  GROUP BY 1, 2, date_trunc('month', l_shipdate), month(l_shipdate)
)
SELECT flag, status, ship_month, qty,
       first_value(qty) OVER w AS first_respect,
       first_value(qty IGNORE NULLS) OVER w AS first_ignore,
       last_value(qty) OVER w AS last_respect,
       last_value(qty IGNORE NULLS) OVER w AS last_ignore,
       nth_value(qty, 2) OVER w AS nth2_respect,
       nth_value(qty, 2 IGNORE NULLS) OVER w AS nth2_ignore
FROM cells
WINDOW w AS (PARTITION BY flag, status ORDER BY ship_month ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY flag, status, ship_month
""",
)
def window_value_functions_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.month("l_shipdate").alias("mo"),
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias(
            "ship_month"
        ),
    ).agg(
        F.when(
            F.col("mo") % 3 != 0, F.sum("l_quantity").cast("bigint")
        ).alias("qty")
    )
    w = (
        Window.partitionBy("flag", "status")
        .orderBy(F.asc("ship_month"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return cells.select(
        "flag",
        "status",
        "ship_month",
        "qty",
        F.first("qty", ignorenulls=False).over(w).alias("first_respect"),
        F.first("qty", ignorenulls=True).over(w).alias("first_ignore"),
        F.last("qty", ignorenulls=False).over(w).alias("last_respect"),
        F.last("qty", ignorenulls=True).over(w).alias("last_ignore"),
        F.nth_value("qty", 2, ignoreNulls=False).over(w).alias("nth2_respect"),
        F.nth_value("qty", 2, ignoreNulls=True).over(w).alias("nth2_ignore"),
    ).orderBy("flag", "status", "ship_month")
