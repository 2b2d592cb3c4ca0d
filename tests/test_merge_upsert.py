"""Delta-style MERGE over plain parquet: upsert, delete, atomic pointer,
time travel across merge snapshots."""

import os
import time

from pyspark.sql import functions as F

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


def test_merge_schema_evolution(spark, tmp_path):
    from formula_1_spark.sources.io import merge_upsert, read_current

    target = str(tmp_path / "tgt_evolve")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    merge_upsert(spark, target, base, ["k"])
    # update adds a column and touches one key: old rows NULL-fill it
    upd = spark.createDataFrame([(2, "B", 9.5)], ["k", "v", "score"])
    merge_upsert(spark, target, upd, ["k"])
    got = {tuple(r) for r in read_current(spark, target).select("k", "v", "score").collect()}
    assert got == {(1, "a", None), (2, "B", 9.5)}


def test_merge_schema_enforcement_raises(spark, tmp_path):
    import pytest

    from formula_1_spark.sources.io import merge_upsert

    target = str(tmp_path / "tgt_enforce")
    merge_upsert(spark, target, spark.createDataFrame([(1, "a")], ["k", "v"]), ["k"])
    upd = spark.createDataFrame([(2, "b", 1.0)], ["k", "v", "extra"])
    with pytest.raises(TypeError, match="drifted"):
        merge_upsert(spark, target, upd, ["k"], evolve_schema=False)


def test_merge_numeric_widening(spark, tmp_path):
    from formula_1_spark.sources.io import merge_upsert, read_current

    target = str(tmp_path / "tgt_widen")
    merge_upsert(
        spark, target, spark.createDataFrame([(1, 10)], "k long, n int"), ["k"]
    )
    merge_upsert(
        spark, target, spark.createDataFrame([(2, 2.5)], "k long, n double"), ["k"]
    )
    cur = read_current(spark, target)
    assert dict(cur.dtypes)["n"] == "double"
    assert {tuple(r) for r in cur.collect()} == {(1, 10.0), (2, 2.5)}


def test_compact_and_vacuum(spark, tmp_path):
    import glob
    import os

    from formula_1_spark.sources.io import (
        compact_current,
        list_snapshots,
        merge_upsert,
        read_current,
        vacuum_snapshots,
    )

    target = str(tmp_path / "tgt_compact")
    df = spark.range(0, 1000).select("id", (F.col("id") % 7).alias("v"))
    merge_upsert(spark, target, df.repartition(16), ["id"])
    merge_upsert(
        spark, target, spark.createDataFrame([(5, 99)], "id long, v long"), ["id"]
    )
    before = {tuple(r) for r in read_current(spark, target).collect()}

    compact_current(spark, target)  # 1001 rows -> 1 file
    live = read_current(spark, target)
    snaps = list_snapshots(target)
    files = glob.glob(os.path.join(snaps[-1], "part-*.parquet"))
    assert len(files) == 1
    assert {tuple(r) for r in live.collect()} == before

    removed = vacuum_snapshots(target, keep_last=1)
    assert len(removed) == 2  # the two pre-compaction snapshots
    assert {tuple(r) for r in read_current(spark, target).collect()} == before


def test_concurrent_merge_raises(spark, tmp_path):
    import os

    import pytest

    from formula_1_spark.sources.io import ConcurrentMergeError, merge_upsert

    target = str(tmp_path / "tgt_lock")
    merge_upsert(spark, target, spark.createDataFrame([(1, "a")], ["k", "v"]), ["k"])
    os.makedirs(target, exist_ok=True)
    open(os.path.join(target, "_LOCK"), "w").close()  # simulate a live writer
    with pytest.raises(ConcurrentMergeError):
        merge_upsert(spark, target, spark.createDataFrame([(2, "b")], ["k", "v"]), ["k"])
    os.remove(os.path.join(target, "_LOCK"))
    merge_upsert(spark, target, spark.createDataFrame([(2, "b")], ["k", "v"]), ["k"])


def test_merge_prunes_unaffected_files(spark, tmp_path):
    from formula_1_spark.sources.io import current_snapshot_dir, read_manifest

    target = str(tmp_path / "pruned")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(100)], ["k", "v"])
    merge_upsert(spark, target, base.repartitionByRange(4, "k"), ["k"])
    snap1 = current_snapshot_dir(target)
    m1 = read_manifest(snap1)
    assert m1 is not None and len(m1["files"]) == 4

    time.sleep(1.1)
    upd = spark.createDataFrame([(7, "Z")], ["k", "v"])
    merge_upsert(spark, target, upd, ["k"])
    snap2 = current_snapshot_dir(target)
    m2 = read_manifest(snap2)

    rows = _rows(read_current(spark, target))
    assert rows == {(i, f"v{i}") for i in range(100) if i != 7} | {(7, "Z")}

    # 3 of the 4 range-partitioned files carried over by hardlink
    carried = set(m1["files"]) & set(m2["files"])
    assert len(carried) == 3
    for f in carried:
        assert os.path.samefile(os.path.join(snap1, f), os.path.join(snap2, f))


def test_pruned_delete_only_touches_overlapping_file(spark, tmp_path):
    from formula_1_spark.sources.io import current_snapshot_dir, read_manifest

    target = str(tmp_path / "pruned_del")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(40)], ["k", "v"])
    merge_upsert(spark, target, base.repartitionByRange(4, "k"), ["k"])
    snap1 = current_snapshot_dir(target)
    time.sleep(1.1)
    dels = spark.createDataFrame([(3, "x", True)], ["k", "v", "is_delete"])
    merge_upsert(spark, target, dels, ["k"], delete_col="is_delete")
    rows = _rows(read_current(spark, target))
    assert rows == {(i, f"v{i}") for i in range(40) if i != 3}
    m1, m2 = read_manifest(snap1), read_manifest(current_snapshot_dir(target))
    assert len(set(m1["files"]) & set(m2["files"])) == 3


def test_schema_evolving_merge_falls_back_to_full_rewrite(spark, tmp_path):
    from formula_1_spark.sources.io import current_snapshot_dir, read_manifest

    target = str(tmp_path / "pruned_evolve")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    merge_upsert(spark, target, base.repartition(2), ["k"])
    snap1 = current_snapshot_dir(target)
    time.sleep(1.1)
    upd = spark.createDataFrame([(1, "A", 9)], ["k", "v", "extra"])
    merge_upsert(spark, target, upd, ["k"])  # adds a column -> full path
    snap2 = current_snapshot_dir(target)
    got = {(r.k, r.v, r.extra) for r in read_current(spark, target).collect()}
    assert got == {(1, "A", 9), (2, "b", None)}
    # no file carried: evolving merges rewrite so one snapshot = one schema
    assert not (set(read_manifest(snap1)["files"]) & set(read_manifest(snap2)["files"]))


def test_over_cap_merge_still_prunes_untouched_files(spark, tmp_path, monkeypatch):
    """Past PRUNE_KEY_CAP the driver collects NO keys — the file-hit set
    comes from a distributed broadcast range join — and key-disjoint
    files still carry over by hardlink."""
    import formula_1_spark.sources.io as io_mod
    from formula_1_spark.sources.io import current_snapshot_dir, read_manifest

    monkeypatch.setattr(io_mod, "PRUNE_KEY_CAP", 10)
    target = str(tmp_path / "pruned_overcap")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(200)], ["k", "v"])
    merge_upsert(spark, target, base.repartitionByRange(4, "k"), ["k"])
    snap1 = current_snapshot_dir(target)
    m1 = read_manifest(snap1)
    assert len(m1["files"]) == 4

    time.sleep(1.1)
    # 50 distinct update keys (> patched cap), all inside the first
    # range-partitioned file's key span
    upd = spark.createDataFrame([(i, "Z") for i in range(50)], ["k", "v"])
    merge_upsert(spark, target, upd, ["k"])
    snap2 = current_snapshot_dir(target)
    m2 = read_manifest(snap2)

    rows = _rows(read_current(spark, target))
    assert rows == {(i, "Z") for i in range(50)} | {
        (i, f"v{i}") for i in range(50, 200)
    }
    carried = set(m1["files"]) & set(m2["files"])
    assert len(carried) == 3  # only the one overlapping file rewritten
    for f in carried:
        assert os.path.samefile(os.path.join(snap1, f), os.path.join(snap2, f))


def test_over_cap_merge_with_null_key_is_conservative(spark, tmp_path, monkeypatch):
    """The distributed probe also detects null update keys, so
    null-carrying files stay in the touched set past the cap."""
    import formula_1_spark.sources.io as io_mod

    monkeypatch.setattr(io_mod, "PRUNE_KEY_CAP", 5)
    target = str(tmp_path / "pruned_overcap_null")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)] + [(None, "n")], "k int, v string"
    )
    merge_upsert(spark, target, base.repartitionByRange(4, "k"), ["k"])
    time.sleep(1.1)
    upd = spark.createDataFrame(
        [(i, "Z") for i in range(10)] + [(None, "N2")], "k int, v string"
    )
    merge_upsert(spark, target, upd, ["k"])
    rows = _rows(read_current(spark, target))
    assert rows == {(i, "Z") for i in range(10)} | {
        (i, f"v{i}") for i in range(10, 40)
    } | {(None, "N2")}


def test_pruned_merge_with_null_key_is_conservative(spark, tmp_path):
    target = str(tmp_path / "pruned_null")
    base = spark.createDataFrame([(1, "a"), (None, "n")], "k int, v string")
    merge_upsert(spark, target, base.repartition(2), ["k"])
    time.sleep(1.1)
    upd = spark.createDataFrame([(None, "N2")], "k int, v string")
    merge_upsert(spark, target, upd, ["k"])
    assert _rows(read_current(spark, target)) == {(1, "a"), (None, "N2")}


def test_cluster_current_restores_pruning(spark, tmp_path):
    from formula_1_spark.sources.io import (
        cluster_current,
        current_snapshot_dir,
        read_manifest,
    )

    target = str(tmp_path / "clustered")
    # Hash-partitioned initial write -> every file spans the full key
    # range -> a point merge must touch all files.
    base = spark.createDataFrame([(i, f"v{i}") for i in range(200)], ["k", "v"])
    merge_upsert(spark, target, base.repartition(4, "k"), ["k"])
    m0 = read_manifest(current_snapshot_dir(target))
    spans = [(st["min"], st["max"]) for st in m0["files"].values()]
    assert sum(1 for lo, hi in spans if lo <= 100 <= hi) == len(spans)

    time.sleep(1.1)
    cluster_current(spark, target, n_files=4)
    m1 = read_manifest(current_snapshot_dir(target))
    spans = sorted((st["min"], st["max"]) for st in m1["files"].values())
    assert len(spans) == 4
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, f"overlapping clustered ranges {spans}"

    # point merge after clustering rewrites exactly one file
    time.sleep(1.1)
    merge_upsert(spark, target, spark.createDataFrame([(100, "X")], ["k", "v"]), ["k"])
    m2 = read_manifest(current_snapshot_dir(target))
    carried = set(m1["files"]) & set(m2["files"])
    assert len(carried) == 3
    rows = {(r.k, r.v) for r in read_current(spark, target).collect()}
    assert rows == {(i, f"v{i}") for i in range(200) if i != 100} | {(100, "X")}
