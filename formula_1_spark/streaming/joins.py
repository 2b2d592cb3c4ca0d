"""Stream-stream interval join (Structured Streaming §2.9 extension).

The canonical streaming correlation: attribute each purchase to the
click(s) by the same user in the preceding attribution window. Written
once as a DataFrame transform that runs identically on batch DataFrames
and ``readStream`` sources — on the streaming path BOTH sides carry
watermarks and the join condition carries explicit event-time bounds,
which is exactly what lets Spark expire join state (without the time
bounds a stream-stream join would buffer both streams forever).

Scale notes: the join shuffles both streams on ``user_id``; state per key
is bounded by ``watermark + horizon``. Skewed users (bots) are the
classic hazard — upstream rate-limit or salt if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution(
    events: DataFrame,
    horizon_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """(user_id, click_id, purchase_id, click_us, purchase_us, value) —
    every (click, purchase) pair of the same user where the purchase lands
    in ``[click_ts, click_ts + horizon)``. Pass ``watermark`` on streams.
    Timestamps are emitted as epoch-micros (cross-engine-stable)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("value"),
    )
    if watermark is not None:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    horizon = F.expr(f"INTERVAL {horizon_minutes} MINUTES")
    joined = purchases.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + horizon),
    )
    return joined.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "value",
    )
