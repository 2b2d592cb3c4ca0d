"""global_ntile_two_phase must be bit-identical to an unpartitioned
F.ntile window for any total order — including N < n_tiles, N % n != 0,
descending orders, and multi-column keys."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from formula_1_spark.operators.windows import global_ntile_two_phase


def _compare(spark, df, order_cols, n_tiles):
    expected = df.select(
        "id", F.ntile(n_tiles).over(Window.orderBy(*order_cols)).alias("t")
    )
    actual = global_ntile_two_phase(df, order_cols, n_tiles, alias="t").select(
        "id", "t"
    )
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0


@pytest.mark.parametrize("n_rows,n_tiles", [(1000, 10), (997, 7), (3, 10), (16, 4)])
def test_matches_window_ntile(spark, n_rows, n_tiles):
    df = spark.range(0, n_rows).select(
        F.col("id"), (F.col("id") * 2654435761 % 1000003).alias("v")
    )
    _compare(spark, df, [F.asc("v"), F.asc("id")], n_tiles)


def test_descending_and_multicol(spark):
    df = spark.range(0, 500).select(
        F.col("id"),
        (F.col("id") % 13).alias("grp"),
        (F.col("id") * 48271 % 10007).alias("v"),
    )
    _compare(spark, df, [F.desc("grp"), F.asc("v"), F.asc("id")], 4)


def test_empty_input(spark):
    df = spark.range(0, 0)
    out = global_ntile_two_phase(df, [F.asc("id")], 5, alias="t")
    assert out.count() == 0
    assert "t" in out.columns


@pytest.mark.parametrize("n_parts", [1, 3, 64])
def test_ntile_partition_count_invariant(spark, n_parts):
    """The tile assignment must not depend on the range-partition count
    (n_parts > n_rows leaves empty partitions; n_parts=1 degenerates to
    a single range)."""
    df = spark.range(0, 200).select(
        F.col("id"), (F.col("id") * 7919 % 503).alias("v")
    )
    expected = df.select(
        "id", F.ntile(7).over(Window.orderBy(F.asc("v"), F.asc("id"))).alias("t")
    )
    actual = global_ntile_two_phase(
        df, [F.asc("v"), F.asc("id")], 7, alias="t", n_parts=n_parts
    ).select("id", "t")
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0


def test_enumerate_skewed_prefix_keys(spark):
    """Heavy ties on the leading sort column (90% one value) — the range
    partitioner splits the hot key across partitions; the id tiebreak
    keeps the total order exact."""
    from formula_1_spark.operators.windows import distributed_global_enumerate

    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
    )
    out = distributed_global_enumerate(df, [F.asc("k"), F.asc("id")], alias="rn")
    rows = {r["id"]: r["rn"] for r in out.collect()}
    expected = {
        r["id"]: i + 1
        for i, r in enumerate(
            sorted(df.collect(), key=lambda r: (r["k"], r["id"]))
        )
    }
    assert rows == expected


@pytest.mark.parametrize("unique_order", [False, True])
def test_topk_paths_match_window_rank(spark, unique_order):
    """Both prune paths of two_phase_global_topk must reproduce the
    unpartitioned rank() window exactly on a total order."""
    from formula_1_spark.operators.windows import two_phase_global_topk

    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") * 2654435761 % 9973).alias("v")
    )
    order = [F.desc("v"), F.asc("id")]
    expected = (
        df.withColumn("rank", F.rank().over(Window.orderBy(*order)))
        .filter(F.col("rank") <= 25)
        .select("id", "rank")
    )
    actual = two_phase_global_topk(
        df, order, 25, alias="rank", unique_order=unique_order
    ).select("id", "rank")
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0


def test_topk_rank_path_preserves_ties(spark):
    """The default (rank) path must keep every row tied at the boundary —
    including when one partition holds more than k tied rows."""
    from formula_1_spark.operators.windows import two_phase_global_topk

    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 3).alias("v")  # 3 distinct values, heavy ties
    ).repartition(2)
    out = two_phase_global_topk(df, [F.desc("v")], 5, alias="rank")
    # every v=2 row is rank 1 (~167 rows), all must survive
    assert out.count() == df.filter(F.col("v") == 2).count()
    assert out.agg(F.max("rank")).first()[0] == 1
