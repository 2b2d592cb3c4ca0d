"""Event-time windowing — batch AND Structured Streaming (SURVEY.md §2.9).

The reference has no streaming surface (snapshot batches on a biweekly
trigger); the driver's ``events`` table motivates these as engine
extensions (SURVEY §7.1(7)). Each aggregation is written once as a
DataFrame transform that works identically on a batch DataFrame and a
``readStream`` DataFrame — the Structured Streaming contract. Watermarks
bound state for the streaming case.

Scale notes: windowed aggregation shuffles once on (window, keys) with
map-side partial aggregation; session windows shuffle on the session key.
State store size is bounded by ``withWatermark`` (late data beyond the
delay is dropped), which is what keeps a 100 TB/day stream's state finite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_value_sum(col: str, alias: str) -> Column:
    """Order-independent float sum: accumulate as DECIMAL(18,2) (exact,
    associative) and present as double — bit-identical across engines and
    partitionings, unlike a raw double sum."""
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: Sequence[str] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: one row per (window, keys) with count + exact sum.
    Works on batch and streaming inputs alike."""
    df = events
    if watermark is not None and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), exact_value_sum("value", "total_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: Sequence[str] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    df = events
    if watermark is not None and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), exact_value_sum("value", "total_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    keys: Sequence[str] = ("user_id",),
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions per key: a session extends while consecutive
    events arrive within ``gap``; ends after a quiet period >= gap.
    ``F.session_window`` keeps this fully stateful-streaming-capable
    (merging session state handled by Spark's session-window state store).
    """
    df = events
    if watermark is not None and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), exact_value_sum("value", "total_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            *keys,
            "n_events",
            "total_value",
        )
    )


def stream_dedup(
    stream: DataFrame, keys: Sequence[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's state only until
    the watermark passes — the streaming counterpart of the batch
    ``exact_dedup`` (duplicates arriving within the watermark window are
    suppressed; state never grows unboundedly)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_from_parquet_dir(spark, path: str, schema) -> DataFrame:
    """File-source stream over a parquet directory (micro-batch per file
    set). The batch/stream symmetry lets every aggregation above be tested
    batch-vs-stream for equivalence."""
    return spark.readStream.schema(schema).parquet(path)


def run_stream_to_memory(
    result: DataFrame, query_name: str, mode: str = "complete"
):
    """Drain a (bounded) stream into an in-memory table with the
    available-now trigger; returns the StreamingQuery (call
    ``awaitTermination`` then read ``SELECT * FROM <query_name>``)."""
    return (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def dynamic_session_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    gap_expr: str = (
        "CASE WHEN event_type = 'purchase' THEN '30 minutes'"
        " ELSE '10 minutes' END"
    ),
    keys: Sequence[str] = ("user_id",),
    watermark: str | None = None,
) -> DataFrame:
    """DYNAMIC-gap sessions: each event proposes the interval
    [ts, ts + gap(event)); overlapping proposals within a key merge into
    one session (Spark's dynamic ``session_window`` semantics — the gap
    is a per-row EXPRESSION, e.g. purchases hold a session open longer
    than clicks; Spark requires the gap column as interval STRINGS —
    CalendarIntervalType — not ANSI day-time interval literals). Same
    batch/streaming duality as the fixed-gap variant;
    the session-window state store handles interval merging when run on
    a stream."""
    df = events
    if watermark is not None and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), F.expr(gap_expr)).alias("w"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_value_sum("value", "total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            *keys,
            "n_events",
            "total_value",
        )
    )
