"""As-of (point-in-time) join — a custom operator Spark lacks natively
(SURVEY.md §7: "custom operators" bucket; DuckDB/kdb/Flink all ship one).

Semantics: for each left row (key, ts), attach the right row with the
largest right_ts <= ts for the same key (inclusive), NULLs when none.

Implementation is the union-and-scan pattern, which is the scalable
re-expression of a backward as-of join in pure DataFrame ops:

1. tag right rows (is_right=1) and left rows (is_right=0), union;
2. single window per key ordered by (ts, is_right DESC, tiebreak):
   ``last(payload, ignorenulls=True)`` over rows-unbounded-preceding
   carries the most recent right payload forward onto every left row;
3. keep left rows.

Cost: ONE shuffle on the key (the union sorts within partitions) — same
exchange count as a plain equi join, no range explosion, no per-key
driver loops. Skewed keys fall to AQE; at 100 TB pre-bucket both sides
on the key to eliminate the exchange entirely.

Right-side ties on (key, ts) are pre-reduced deterministically by the
caller (e.g. ``max_by``) — both engines leave tie choice undefined
otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of join.

    ``left`` keeps all its columns; each ``payload_cols`` column from
    ``right`` is attached (NULL when no right row precedes).
    """
    l_tagged = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in payload_cols) + ">"
        ).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in left.columns) + ">"
        ).alias("__left"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
    )
    # At equal ts the right row sorts FIRST (is_right DESC) so `<=`
    # (inclusive) semantics hold when last() scans up to the current row.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scanned = l_tagged.unionByName(r_tagged).withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    )
    out = scanned.filter(F.col("__is_right") == 0).select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__asof.{c}").alias(c) for c in payload_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    ts_left: str,
    lo: Column,
    hi: Column,
) -> DataFrame:
    """Equi-key range join: left ⋈ right on key equality AND
    ``lo <= ts_left < hi`` (bounds are expressions over the right row).
    Catalyst executes the equality as the join key and the range as a
    post-join filter — one shuffle, no cross product, since the key is
    selective. (A pure range join with no equi key would need interval
    bucketing — out of scope until the reference surface demands it.)"""
    return left.join(
        right,
        (F.col(key_left) == F.col(key_right))
        & (F.col(ts_left) >= lo)
        & (F.col(ts_left) < hi),
    )
