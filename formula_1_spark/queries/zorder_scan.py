"""Z-order clustering exercised end-to-end through the driver gate.

A merge-target lake over ``orders`` is z-ordered on (o_custkey,
o_orderkey); the query then plans a 2-D box scan the way a lakehouse
engine would — select the overlapping files from parquet-footer min/max
stats on BOTH dimensions, read only those, re-apply the row predicate —
and returns the surviving rows. The oracle recomputes the box from
``orders`` directly, so a file wrongly pruned (missing rows) or a
corrupted interleave (wrong rows) reds the hash. The query RAISES if the
footer stats fail to prune files on either dimension, so a green driver
row is itself the multi-dimensional data-skipping proof the pytest-only
evidence (tests/test_zorder.py) couldn't give the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish
from formula_1_spark.sources.tables import load_table

# 20% central box per dimension: IEEE-double bounds both engines compute
# identically from the integer min/max.
_LO_FRAC, _HI_FRAC = 0.40, 0.60


def _zorder_fixture(spark: SparkSession, sf_dir: str) -> str:
    from formula_1_spark.sources.io import merge_upsert
    from formula_1_spark.sources.zorder import zorder_current

    root = fixture_root("zorder_lake_v1", sf_dir, "orders")
    target = os.path.join(root, "target")
    if not os.path.isdir(root):
        scratch = building_dir(root)
        os.makedirs(scratch, exist_ok=True)
        s_target = os.path.join(scratch, "target")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        merge_upsert(
            spark, s_target, orders.repartitionByRange(4, "o_orderkey"),
            ["o_orderkey"],
        )
        zorder_current(spark, s_target, ["o_custkey", "o_orderkey"], n_files=16)
        publish(scratch, root)
    return target


@register(
    "orders_zorder_pruned_scan",
    ops="EXT-zorder,S7,P7 (multi-dim clustering + footer-stat file skipping)",
    doc="Z-order E2E: orders merge target rewritten z-ordered on "
    "(o_custkey, o_orderkey), then a central 20%-per-dimension box scan "
    "planned from parquet-footer min/max stats — only overlapping files "
    "are read, the row predicate re-applies, and the query raises unless "
    "files were skipped on BOTH dimensions individually. Oracle "
    "recomputes the box from orders, so wrong pruning or a corrupted "
    "interleave hash-mismatches.",
    oracle=f"""
WITH b AS (
  SELECT CAST(MIN(o_custkey) AS DOUBLE) AS cmin,
         CAST(MAX(o_custkey) AS DOUBLE) AS cmax,
         CAST(MIN(o_orderkey) AS DOUBLE) AS kmin,
         CAST(MAX(o_orderkey) AS DOUBLE) AS kmax
  FROM orders
)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o, b
WHERE CAST(o.o_custkey AS DOUBLE) >= b.cmin + {_LO_FRAC} * (b.cmax - b.cmin)
  AND CAST(o.o_custkey AS DOUBLE) <= b.cmin + {_HI_FRAC} * (b.cmax - b.cmin)
  AND CAST(o.o_orderkey AS DOUBLE) >= b.kmin + {_LO_FRAC} * (b.kmax - b.kmin)
  AND CAST(o.o_orderkey AS DOUBLE) <= b.kmin + {_HI_FRAC} * (b.kmax - b.kmin)
""",
)
def orders_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.io import _file_stats, current_snapshot_dir

    target = _zorder_fixture(spark, sf_dir)
    snap = current_snapshot_dir(target)
    files = sorted(f for f in os.listdir(snap) if f.endswith(".parquet"))

    # Box bounds from the dataset min/max (at 100 TB: footer metadata or
    # the manifest, never a data read; the doubles are IEEE-identical to
    # the oracle's).
    agg = load_table(spark, sf_dir, "orders").agg(
        F.min("o_custkey").alias("cmin"), F.max("o_custkey").alias("cmax"),
        F.min("o_orderkey").alias("kmin"), F.max("o_orderkey").alias("kmax"),
    ).collect()[0]
    clo = agg.cmin + _LO_FRAC * (agg.cmax - agg.cmin)
    chi = agg.cmin + _HI_FRAC * (agg.cmax - agg.cmin)
    klo = agg.kmin + _LO_FRAC * (agg.kmax - agg.kmin)
    khi = agg.kmin + _HI_FRAC * (agg.kmax - agg.kmin)

    # File-level skipping from footer stats on BOTH z-order dimensions;
    # a stat-less file is conservatively read.
    chosen, hit_c, hit_k = [], 0, 0
    for f in files:
        sc = _file_stats(os.path.join(snap, f), "o_custkey")
        sk = _file_stats(os.path.join(snap, f), "o_orderkey")
        c_over = sc["min"] is None or not (chi < sc["min"] or clo > sc["max"])
        k_over = sk["min"] is None or not (khi < sk["min"] or klo > sk["max"])
        hit_c += c_over
        hit_k += k_over
        if c_over and k_over:
            chosen.append(f)
    if not (hit_c < len(files) and hit_k < len(files) and len(chosen) < len(files)):
        raise RuntimeError(
            "z-order footer stats failed to prune: "
            f"files={len(files)} custkey_hits={hit_c} orderkey_hits={hit_k} "
            f"chosen={len(chosen)}"
        )

    ck, kk = F.col("o_custkey").cast("double"), F.col("o_orderkey").cast("double")
    return (
        spark.read.parquet(*[os.path.join(snap, f) for f in chosen])
        .filter((ck >= clo) & (ck <= chi) & (kk >= klo) & (kk <= khi))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
