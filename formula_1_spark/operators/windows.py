"""Window / ranking operators (SURVEY.md §2.5, W1–W2; §2.6 O3).

* W1 — standings rank: ``rank()`` over ``partitionBy(season).orderBy(desc
  points, desc wins)`` (``Transform Silver Data.py:135-137``). Competition
  ranking (ties share a rank, gaps follow) — NOT dense_rank/row_number —
  matching F1 standings semantics.
* W2 — global (unpartitioned) rank over an aggregate
  (``Data Visualization.sql:86``). An unpartitioned window forces all rows
  through a single partition; fine post-aggregation (cardinality is small
  after the groupBy) but a chokepoint if misused on raw data. For the raw
  case, ``two_phase_global_topk`` keeps the heavy ordering distributed and
  only merges per-partition survivors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_standings(
    df: DataFrame,
    partition_keys: Sequence[str],
    order_cols: Sequence[Column],
    alias: str = "rank",
) -> DataFrame:
    """W1: competition rank within each partition (F1 standings shape)."""
    w = Window.partitionBy(*partition_keys).orderBy(*order_cols)
    return df.withColumn(alias, F.rank().over(w))


def global_rank(df: DataFrame, order_cols: Sequence[Column], alias: str = "rank") -> DataFrame:
    """W2: unpartitioned rank. Use only on post-aggregation cardinalities;
    the single-partition shuffle is the price of total ordering."""
    return df.withColumn(alias, F.rank().over(Window.orderBy(*order_cols)))


def two_phase_global_topk(
    df: DataFrame, order_cols: Sequence[Column], k: int, alias: str = "rank"
) -> DataFrame:
    """Scale-safe global top-k: per-partition rank → keep local top-k →
    global rank over the tiny survivor set.

    Correctness: any row in the global top-k by ``order_cols`` is within
    the top-k of its own partition (rank() counts strictly-better rows, and
    a partition holds a subset, so local rank <= global rank), so phase 1
    never discards a global winner. Ties at the boundary are preserved
    because rank() assigns equal ranks to ties and the filter is
    ``<= k`` on competition rank.

    At 100 TB this avoids funnelling the full dataset through the single
    partition an unpartitioned ``Window.orderBy`` would require.
    """
    local_w = Window.partitionBy(F.spark_partition_id()).orderBy(*order_cols)
    pruned = (
        df.withColumn("__local_rank", F.rank().over(local_w))
        .filter(F.col("__local_rank") <= k)
        .drop("__local_rank")
    )
    return (
        pruned.withColumn(alias, F.rank().over(Window.orderBy(*order_cols)))
        .filter(F.col(alias) <= k)
    )
