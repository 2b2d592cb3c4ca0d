"""Aggregation operators (SURVEY.md §2.4, A1–A6).

Re-expressions of the reference's aggregation shapes as composable
DataFrame transforms:

* A1 — pre-aggregate before a join (``Transform Silver Data.py:92``):
  manual partial aggregation that shrinks the fact side before an expensive
  join. Catalyst does NOT push aggregates through joins automatically, so
  keeping this explicit is correct engine design at 100 TB.
* A3/A4 — multi-aggregate with a conditional count
  (``Transform Silver Data.py:128-133``): ``sum(points)`` +
  ``count(when(position == 1, True))`` — the F1 "wins" idiom.
* A6 — HAVING post-filter (``Data Visualization.sql:91-92``): agg then
  filter on the aggregate column.

All of these compile to partial+final hash aggregates with map-side
combine — one shuffle on the grouping key, no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pre_aggregate(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    """A1: group ``df`` by ``keys`` computing ``aggs`` (alias -> Column).

    Used to reduce a fact table to one row per join key *before* joining,
    mirroring the reference's pitstops pre-aggregation.
    """
    return df.groupBy(*keys).agg(*[c.alias(a) for a, c in aggs.items()])


def conditional_count_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_col: str,
    sum_alias: str,
    win_cond: Column,
    win_alias: str,
) -> DataFrame:
    """A3/A4: ``sum(sum_col)`` plus ``count(when(win_cond, True))``.

    ``F.count`` ignores NULLs, so ``count(when(cond, True))`` counts only
    rows satisfying the condition — identical to the reference's wins
    computation and to ANSI ``COUNT(CASE WHEN cond THEN 1 END)``.
    """
    return df.groupBy(*keys).agg(
        F.sum(sum_col).alias(sum_alias),
        F.count(F.when(win_cond, True)).alias(win_alias),
    )


def having(df: DataFrame, predicate: Column) -> DataFrame:
    """A6: post-aggregation filter (SQL HAVING)."""
    return df.filter(predicate)
