"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 extension — the escape hatch for semantics Spark's
built-in windows can't express).

Example operator: per-user running totals with idle-timeout finalization —
the canonical sessionized-accumulator shape. State is a single (count,
total) pair per key, updated per micro-batch; watermark-driven timeouts
flush idle users. At 100 TB/day the state store is partitioned by key
across executors and bounded by the timeout — no unbounded growth.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count BIGINT, total DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("finalized", T.BooleanType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        count, total = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": count, "total_value": total, "finalized": True}]
        )
        return
    count, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
    state.update((count, total))
    state.setTimeoutDuration(60_000)  # flush users idle for 60s
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": count, "total_value": total, "finalized": False}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user accumulator. ``events`` must be a streaming
    DataFrame with (user_id, value); emits the running (count, total)
    after every micro-batch touch and a finalized row on idle timeout."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


EXACT_STATE_SCHEMA = "count BIGINT, cents BIGINT"
EXACT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)


def _update_user_totals_exact(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Integer-cents accumulator: floor(value*100) summed as int64, so
    the running total is independent of batch split and arrival order —
    what makes the stream's final state oracle-checkable bit-for-bit."""
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    count, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        count += len(pdf)
        import numpy as np

        cents += int(np.floor(pdf["value"].to_numpy() * 100).astype("int64").sum())
    state.update((count, cents))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": count, "value_cents": cents}]
    )


def running_user_totals_exact(events: DataFrame) -> DataFrame:
    """Streaming per-user accumulator with exact integer cents. Emits
    the running (count, cents) after every micro-batch touch; counts are
    strictly increasing per user, so the final state is the max-count
    row — a deterministic reduction of the update stream."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals_exact,
            outputStructType=EXACT_OUTPUT_SCHEMA,
            stateStructType=EXACT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
