"""Incremental aggregate maintenance: keep a grouped-aggregate table
(sums + row counts over dimension columns) consistent with a merge
target WITHOUT rescanning the base — the materialized-view delta
maintenance every warehouse layer (Delta Live Tables, dbt incremental,
Materialize) provides, expressed over this engine's snapshot tables.

Scale rationale: at 100 TB a full re-aggregation per merge is the cost
ceiling; delta maintenance reads only (a) the update rows and (b) the
base rows they replace — and (b) is file-pruned by the merge manifest,
so steady-state refresh cost tracks the churn, not the table.

Maintenance algebra (sums and counts are self-decomposable):

    new_agg = group( old_agg  ∪  +contrib(incoming)  ∪  -contrib(replaced) )

groups whose maintained row count reaches zero are dropped. Sums must be
over EXACT types (ints / decimals): maintaining a double sum by +/-
deltas accumulates float error that a recompute wouldn't have.

Non-transactional: base and aggregate repoint separately (single-writer
assumption, same as the merge lock). The aggregate snapshot is written
only after the base merge commits; a crash between the two leaves the
aggregate exactly one replayable delta behind.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def aggregate_of(base: DataFrame, dims: list[str], sum_cols: list[str]) -> DataFrame:
    """The maintained aggregate's defining query (used for bootstrap and
    as the recompute oracle in tests)."""
    return base.groupBy(*dims).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_with_agg_refresh(
    spark: SparkSession,
    base_path: str,
    agg_path: str,
    updates: DataFrame,
    key_cols: list[str],
    dims: list[str],
    sum_cols: list[str],
    delete_col: str | None = None,
) -> None:
    """MERGE ``updates`` into the base table AND delta-maintain its
    aggregate table, reading only update-key rows from the base."""
    from formula_1_spark.sources.io import (
        _write_snapshot_and_repoint,
        merge_upsert,
        read_current,
    )

    base = read_current(spark, base_path)
    ukeys = updates.select(*key_cols).dropDuplicates(key_cols).alias("_u")
    if base is not None:
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"_t.{k}").eqNullSafe(F.col(f"_u.{k}")) for k in key_cols],
        )
        replaced = base.alias("_t").join(ukeys, cond, "left_semi")
    else:
        replaced = None
    incoming = updates
    if delete_col is not None:
        incoming = incoming.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)

    def contrib(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy(*dims).agg(
            *[F.sum(F.col(c) * F.lit(sign)).alias(f"sum_{c}") for c in sum_cols],
            F.sum(F.lit(sign)).alias("n_rows"),
        )

    parts = [contrib(incoming, 1)]
    if replaced is not None:
        parts.append(contrib(replaced, -1))
    delta = reduce(DataFrame.unionByName, parts)

    cur = read_current(spark, agg_path)
    pool = delta if cur is None else cur.unionByName(delta)
    refreshed = (
        pool.groupBy(*dims)
        .agg(
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
            F.sum("n_rows").alias("n_rows"),
        )
        .filter(F.col("n_rows") > 0)
    )
    # The delta must see the PRE-merge base. Safe even though the write
    # below runs after the merge: read_current resolved the OLD snapshot
    # DIRECTORY, and snapshots are immutable (the merge writes a new dir
    # and repoints) — only a vacuum could invalidate the plan, and the
    # single-writer assumption excludes one mid-refresh.
    merge_upsert(spark, base_path, updates, key_cols, delete_col=delete_col)
    _write_snapshot_and_repoint(refreshed, agg_path)
