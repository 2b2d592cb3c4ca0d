"""Python DataSource API tests: the paged-JSON source must round-trip
rows exactly, split pages across partitions, and keep plans clean."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from formula_1_spark.queries.custom_source import (
    _SCHEMA_DDL,
    _pages_fixture,
)
from formula_1_spark.sources.paged_api import PagedJsonApiSource
from formula_1_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def api_df(spark, sf_dir):
    spark.dataSource.register(PagedJsonApiSource)
    pages = _pages_fixture(spark, sf_dir)
    return (
        spark.read.format("paged_json_api")
        .option("path", pages)
        .option("schema_ddl", _SCHEMA_DDL)
        .option("pages_per_partition", "2")
        .load()
    )


def test_round_trips_every_row(spark, sf_dir, api_df):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    assert api_df.count() == orders.count()
    # Exact content equality both directions (types included — a DOUBLE
    # read back as string would fail the joins' null checks).
    assert api_df.exceptAll(orders).count() == 0
    assert orders.exceptAll(api_df).count() == 0


def test_pages_split_across_partitions(spark, sf_dir, api_df):
    pages = _pages_fixture(spark, sf_dir)
    n_files = len(glob.glob(os.path.join(pages, "page=*", "*.json")))
    n_parts = api_df.rdd.getNumPartitions()
    assert n_parts > 1
    assert n_parts == (n_files + 1) // 2  # pages_per_partition=2


def test_missing_path_raises(spark):
    spark.dataSource.register(PagedJsonApiSource)
    df = (
        spark.read.format("paged_json_api")
        .option("path", "/nonexistent/api")
        .option("schema_ddl", "k BIGINT")
        .load()
    )
    with pytest.raises(Exception, match="no page files|FileNotFound"):
        df.collect()


def test_projection_stays_lazy(api_df):
    # Column pruning happens Spark-side; the source still reads pages but
    # the narrow projection must not error and must keep the DDL types.
    one = api_df.select("o_orderpriority").distinct()
    vals = {r.o_orderpriority for r in one.collect()}
    assert all(isinstance(v, str) for v in vals) and len(vals) == 5


def test_lateral_matches_window_rewrite(spark, sf_dir):
    from formula_1_spark.queries.sql_modern import lateral_top_orders

    lat = lateral_top_orders(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    win = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
        )
    )
    assert lat.exceptAll(win).count() == 0
    assert win.exceptAll(lat).count() == 0


def test_recursive_rollup_terminates_and_nests(spark, sf_dir):
    from formula_1_spark.queries.sql_modern import part_hierarchy_rollup

    rows = {r.root: r for r in part_hierarchy_rollup(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}
    # Root 1's subtree strictly contains roots 2 and 3's subtrees.
    assert rows[1].subtree_size == 1 + rows[2].subtree_size + rows[3].subtree_size
    assert rows[1].depth == 1 + max(rows[2].depth, rows[3].depth)


def test_orphan_staged_page_invisible_and_swept(spark, tmp_path):
    """A task that dies after writing its staged file returns no commit
    message, so commit/abort can't clean it. The staged file must (a)
    never be visible to the reader and (b) be swept by the next
    successful commit."""
    spark.dataSource.register(PagedJsonApiSource)
    path = str(tmp_path / "api")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    df.write.format("paged_json_api").option("path", path).mode(
        "overwrite"
    ).save()

    # Simulate an orphaned staged page from a failed task.
    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    orphan = os.path.join(staging, "99-00000.json")
    with open(orphan, "w") as fh:
        fh.write('{"k": 999}\n')

    back = (
        spark.read.format("paged_json_api")
        .option("path", path)
        .option("schema_ddl", "k BIGINT")
        .load()
    )
    ks = {r["k"] for r in back.collect()}
    assert ks == set(range(10))  # the half-written page never leaks

    # The next successful commit sweeps the orphan.
    df.write.format("paged_json_api").option("path", path).mode(
        "overwrite"
    ).save()
    assert not os.path.exists(orphan)


def test_append_mode_rejected(spark, tmp_path):
    spark.dataSource.register(PagedJsonApiSource)
    path = str(tmp_path / "api")
    df = spark.range(0, 5).select(F.col("id").alias("k"))
    df.write.format("paged_json_api").option("path", path).mode(
        "overwrite"
    ).save()
    with pytest.raises(Exception, match="overwrite"):
        df.write.format("paged_json_api").option("path", path).mode(
            "append"
        ).save()
