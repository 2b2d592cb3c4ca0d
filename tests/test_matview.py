"""Incremental aggregate maintenance: after every merge, the maintained
aggregate equals a full recompute from the base table."""

from __future__ import annotations

import time

from formula_1_spark.plans.matview import aggregate_of, merge_with_agg_refresh
from formula_1_spark.sources.io import read_current


def _agg_rows(df):
    return {tuple(r) for r in df.collect()}


def test_incremental_agg_tracks_recompute(spark, tmp_path):
    base_path = str(tmp_path / "base")
    agg_path = str(tmp_path / "agg")
    dims, sums, keys = ["dim"], ["val"], ["k"]

    def check():
        base = read_current(spark, base_path)
        assert _agg_rows(read_current(spark, agg_path)) == _agg_rows(
            aggregate_of(base, dims, sums)
        )

    # bootstrap: inserts only
    r1 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)], ["k", "dim", "val"]
    )
    merge_with_agg_refresh(spark, base_path, agg_path, r1, keys, dims, sums)
    check()

    # update (moves a row across groups), insert, no-op group
    time.sleep(1.1)
    r2 = spark.createDataFrame([(2, "b", 7), (4, "c", 1)], ["k", "dim", "val"])
    merge_with_agg_refresh(spark, base_path, agg_path, r2, keys, dims, sums)
    check()

    # delete one row, update another in place
    time.sleep(1.1)
    r3 = spark.createDataFrame(
        [(3, "b", 0, True), (1, "a", 11, False)], ["k", "dim", "val", "is_delete"]
    )
    merge_with_agg_refresh(
        spark, base_path, agg_path, r3, keys, dims, sums, delete_col="is_delete"
    )
    check()

    # delete the last row of a group -> the group disappears
    time.sleep(1.1)
    r4 = spark.createDataFrame([(4, "c", 0, True)], ["k", "dim", "val", "is_delete"])
    merge_with_agg_refresh(
        spark, base_path, agg_path, r4, keys, dims, sums, delete_col="is_delete"
    )
    check()
    got = {r.dim for r in read_current(spark, agg_path).collect()}
    assert got == {"a", "b"}
