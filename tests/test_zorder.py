"""Z-order clustering: after ``zorder_current`` on two columns, parquet
footer min/max stats must prune files on BOTH dimensions — where
single-key range clustering prunes only on its one key."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from formula_1_spark.sources.io import (
    _file_stats,
    cluster_current,
    current_snapshot_dir,
    merge_upsert,
    read_current,
)
from formula_1_spark.sources.tables import load_table
from formula_1_spark.sources.zorder import zorder_current, zorder_value


def _prune_fraction(snap_dir: str, col: str, probes: list[int]) -> float:
    """Mean fraction of files a point predicate on ``col`` can skip,
    judged purely from parquet footers (what the manifest would hold)."""
    files = sorted(f for f in os.listdir(snap_dir) if f.endswith(".parquet"))
    assert files
    stats = [_file_stats(os.path.join(snap_dir, f), col) for f in files]
    assert all(s["min"] is not None for s in stats)
    fracs = []
    for p in probes:
        skipped = sum(1 for s in stats if p < s["min"] or p > s["max"])
        fracs.append(skipped / len(files))
    return sum(fracs) / len(fracs)


def _build_target(spark, sf_dir, tmp_path, name):
    target = str(tmp_path / name)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.first("l_suppkey").alias("suppkey"),
            F.first("l_partkey").alias("partkey"),
            F.sum("l_quantity").alias("qty"),
        )
    )
    merge_upsert(spark, target, li, ["l_orderkey"])
    return target


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    target = _build_target(spark, sf_dir, tmp_path, "ztarget")
    df = read_current(spark, target)
    probes_s = [r.suppkey for r in df.select("suppkey").distinct().limit(8).collect()]
    probes_p = [r.partkey for r in df.select("partkey").distinct().limit(8).collect()]

    zorder_current(spark, target, ["suppkey", "partkey"], n_files=16)
    snap = current_snapshot_dir(target)
    z_s = _prune_fraction(snap, "suppkey", probes_s)
    z_p = _prune_fraction(snap, "partkey", probes_p)

    # Values untouched by the rewrite.
    assert read_current(spark, target).count() == df.count()
    # Both dimensions prune usefully (each file is a hyper-rectangle).
    assert z_s >= 0.4, z_s
    assert z_p >= 0.4, z_p


def test_single_key_clustering_misses_second_dimension(spark, sf_dir, tmp_path):
    target = _build_target(spark, sf_dir, tmp_path, "rtarget")
    df = read_current(spark, target)
    probes_p = [r.partkey for r in df.select("partkey").distinct().limit(8).collect()]

    # Range-cluster on the MERGE key: orderkey pruning is perfect by
    # construction, but partkey stats stay ~full-range in every file.
    cluster_current(spark, target, n_files=16)
    snap = current_snapshot_dir(target)
    r_p = _prune_fraction(snap, "partkey", probes_p)
    zorder_current(spark, target, ["suppkey", "partkey"], n_files=16)
    z_p = _prune_fraction(current_snapshot_dir(target), "partkey", probes_p)
    assert z_p > r_p + 0.2, (z_p, r_p)


def test_zorder_value_locality(spark):
    """Nearby (x, y) points share z-prefixes: the interleave must place
    the quadrant bits highest (bit b of code i at position b*k+i)."""
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x bigint, y bigint"
    )
    z = df.select(
        "x", "y", zorder_value([F.col("x"), F.col("y")], bits=2).alias("z")
    )
    got = {(r.x, r.y): r.z for r in z.collect()}
    # Classic 4x4 Morton curve: all 16 values distinct, quadrants
    # contiguous (each quadrant occupies one aligned block of 4).
    assert len(set(got.values())) == 16
    for qx in (0, 1):
        for qy in (0, 1):
            quad = sorted(
                got[(x, y)]
                for x in (2 * qx, 2 * qx + 1)
                for y in (2 * qy, 2 * qy + 1)
            )
            assert quad[3] - quad[0] == 3 and quad[0] % 4 == 0, quad
