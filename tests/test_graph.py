"""Connected-components / duplicate-cluster resolution unit tests."""

from pyspark.sql import functions as F

from formula_1_spark.operators.graph import (
    connected_components,
    dedup_cluster_assignment,
)


def test_connected_components_chain_cycle_singleton(spark):
    # Components: {1,2,3,4} (a 4-chain — needs >1 propagation round),
    # {10,11,12} (a cycle), {20} (isolated).
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20]], ["doc_id"]
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)], ["a", "b"]
    )
    got = {
        (r.node, r.cluster_id)
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20),
    }


def test_dedup_cluster_assignment_sizes_and_canonicals(spark):
    docs = spark.createDataFrame([(i,) for i in [5, 6, 7, 9]], ["doc_id"])
    pairs = spark.createDataFrame([(6, 5), (6, 7)], ["a", "b"])
    rows = {r.doc_id: r for r in dedup_cluster_assignment(docs, pairs).collect()}
    assert rows[5].cluster_id == 5 and rows[5].is_canonical
    assert rows[6].cluster_id == 5 and not rows[6].is_canonical
    assert rows[7].cluster_size == 3
    assert rows[9].cluster_size == 1 and rows[9].is_canonical
    # exactly one canonical per cluster
    canon = [r for r in rows.values() if r.is_canonical]
    assert {r.cluster_id for r in canon} == {5, 9}
