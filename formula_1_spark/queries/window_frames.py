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
