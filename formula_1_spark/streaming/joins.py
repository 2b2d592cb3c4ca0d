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


def enrich_with_customer(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static enrichment: events (stream OR batch) joined to the
    static customer dimension on ``user_id = c_custkey``.

    On the streaming path this is Structured Streaming's stream-static
    join: the static side is planned once and BROADCAST into every
    micro-batch — no state store, no watermark needed, the stream never
    shuffles for the lookup. That is exactly the 100 TB dim-enrichment
    pattern: facts flow, dims ship to the executors. Left join keeps
    events whose user has no dim row (segment NULL) — enrichment must
    never drop facts.
    """
    dim = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nationkey"),
        )
    )
    return events.join(dim, "user_id", "left")


def segment_event_rollup(events: DataFrame, customer: DataFrame) -> DataFrame:
    """(segment, event_type, n_events, total_value) — the enrichment's
    aggregate surface (what a live dashboard would maintain)."""
    return (
        enrich_with_customer(events, customer)
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


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


def purchase_attribution_outer(
    events: DataFrame,
    horizon_minutes: int = 30,
    watermark: str | None = None,
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase row pairs
    with the same-user clicks in the preceding ``horizon_minutes``, and
    purchases with NO such click still emit (click side NULL) — the
    unattributed-conversion stream an attribution pipeline must not
    drop.

    On the streaming path this exercises the OUTER stream-stream state
    machine: matched pairs emit immediately; an unmatched purchase is
    held in the state store and emitted with NULLs only once the click
    side's watermark passes ``purchase_ts + horizon`` (so correctness
    depends on both watermarks — without them the join would neither
    expire state nor ever emit NULL rows). Batch and stream agree
    exactly; tests/test_stream_join.py proves it with a watermark-
    flushing sentinel event.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
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
        "left_outer",
    )
    return joined.select(
        "user_id",
        "purchase_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "value",
        "click_id",
        F.unix_micros("click_ts").alias("click_us"),
    )
