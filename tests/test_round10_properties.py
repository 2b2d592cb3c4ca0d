"""Property-based tests for the round-10 operators (hypothesis): the
distributed label propagation must match a pure-Python synchronous
reference on random weighted graphs, and the bucket-blocked interval
overlap join must match a brute-force pair scan on random intervals."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Few examples, session-scoped Spark: each example runs several jobs, so
# keep the budget tight — these are semantics proofs, not fuzz volume.
_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _lpa_reference(n_nodes, und_edges, iters):
    """Pure-Python synchronous LPA: argmax neighbor-label weight, ties to
    the smallest label, isolated nodes keep their own label."""
    lbl = {v: v for v in range(n_nodes)}
    adj = {v: [] for v in range(n_nodes)}
    for a, b, w in und_edges:
        adj[a].append((b, w))
        adj[b].append((a, w))
    for _ in range(iters):
        nxt = {}
        for v in range(n_nodes):
            scores = {lbl[v]: 0}  # self-loop at weight 0
            for u, w in adj[v]:
                scores[lbl[u]] = scores.get(lbl[u], 0) + w
            best = max(scores.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        lbl = nxt
    return lbl


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=1, max_value=9),
    ).filter(lambda e: e[0] < e[1]),
    min_size=0,
    max_size=12,
    unique_by=lambda e: (e[0], e[1]),
)


@settings(**_SETTINGS)
@given(edges=edges_strategy, iters=st.integers(min_value=1, max_value=3))
def test_label_propagation_matches_reference(spark, edges, iters):
    from formula_1_spark.operators.graph import label_propagation

    nodes = spark.range(8).withColumnRenamed("id", "node")
    sym = [(a, b, w) for a, b, w in edges] + [(b, a, w) for a, b, w in edges]
    edf = spark.createDataFrame(
        sym or [(0, 0, 0)], "src long, dst long, w long"
    )
    if not sym:
        edf = edf.filter("src <> src")  # empty edge relation, typed
    got = {
        r["node"]: r["lbl"]
        for r in label_propagation(nodes, edf, iters=iters).collect()
    }
    assert got == _lpa_reference(8, edges, iters)


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2000),  # start
        st.integers(min_value=1, max_value=300),  # duration <= bucket width
        st.integers(min_value=0, max_value=3),  # user
    ),
    min_size=0,
    max_size=25,
)


@settings(**_SETTINGS)
@given(ivs=intervals_strategy)
def test_bucket_blocked_overlap_matches_bruteforce(spark, ivs):
    """The explode-to-buckets + equi-join + re-verify pipeline (the
    interval_overlap_join shape, bucket width == max duration) finds
    EXACTLY the brute-force overlap pairs."""
    from pyspark.sql import functions as F

    rows = [
        (i, user, start, start + dur) for i, (start, dur, user) in enumerate(ivs)
    ]
    expected = {
        (a[0], b[0], min(a[3], b[3]) - max(a[2], b[2]))
        for a in rows
        for b in rows
        if a[0] < b[0] and a[1] != b[1] and a[2] < b[3] and b[2] < a[3]
    }
    if not rows:
        return
    df = spark.createDataFrame(rows, "id long, user long, s long, e long")
    bucketed = df.withColumn(
        "bucket",
        F.explode(F.sequence(F.expr("s div 300"), F.expr("(e - 1) div 300"))),
    )
    a = bucketed.select(
        "bucket",
        F.col("id").alias("ida"),
        F.col("user").alias("ua"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    b = bucketed.select(
        "bucket",
        F.col("id").alias("idb"),
        F.col("user").alias("ub"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    got = {
        (r["ida"], r["idb"], r["ov"])
        for r in (
            a.join(
                b,
                (a["bucket"] == b["bucket"])
                & (F.col("ida") < F.col("idb"))
                & (F.col("ua") != F.col("ub"))
                & (F.col("sa") < F.col("eb"))
                & (F.col("sb") < F.col("ea")),
            )
            .select(
                "ida",
                "idb",
                (F.least("ea", "eb") - F.greatest("sa", "sb")).alias("ov"),
            )
            .distinct()
            .collect()
        )
    }
    assert got == expected
