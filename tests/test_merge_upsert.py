"""Delta-style MERGE over plain parquet: upsert, delete, atomic pointer,
time travel across merge snapshots."""

import os
import time

from formula_1_spark.sources.io import merge_upsert, read_current


def _rows(df):
    return {(r.k, r.v) for r in df.collect()}


def test_merge_insert_update_delete(spark, tmp_path):
    target = str(tmp_path / "tbl")

    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    merge_upsert(spark, target, base, ["k"])
    assert _rows(read_current(spark, target)) == {(1, "a"), (2, "b"), (3, "c")}

    time.sleep(1.1)  # distinct snapshot name (second granularity)
    upd = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, "x", True)],
        ["k", "v", "is_delete"],
    )
    merge_upsert(spark, target, upd, ["k"], delete_col="is_delete")
    # 1 untouched, 2 updated, 3 deleted, 4 inserted
    assert _rows(read_current(spark, target)) == {(1, "a"), (2, "B"), (4, "d")}

    # both snapshots on disk -> time travel to the pre-merge state
    snaps = sorted(
        d for d in os.listdir(target) if not d.startswith("_")
    )
    assert len(snaps) == 2
    old = spark.read.parquet(os.path.join(target, snaps[0]))
    assert _rows(old) == {(1, "a"), (2, "b"), (3, "c")}

    # pointer file is the only mutable piece and names the newest snapshot
    with open(os.path.join(target, "_CURRENT")) as fh:
        assert fh.read().strip() == snaps[1]


def test_merge_is_idempotent_on_rerun(spark, tmp_path):
    target = str(tmp_path / "tbl2")
    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    merge_upsert(spark, target, base, ["k"])
    time.sleep(1.1)
    upd = spark.createDataFrame([(1, "z")], ["k", "v"])
    merge_upsert(spark, target, upd, ["k"])
    time.sleep(1.1)
    merge_upsert(spark, target, upd, ["k"])  # re-run of the same merge
    assert _rows(read_current(spark, target)) == {(1, "z")}
