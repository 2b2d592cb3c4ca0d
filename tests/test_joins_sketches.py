"""Salted-join equivalence and sketch error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula_1_spark.operators.joins import salted_join
from formula_1_spark.sources.tables import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey")
    salted = salted_join(li, orders, "l_orderkey", n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert salted.count() == plain.count()
    p = {tuple(r) for r in plain.select(sorted(plain.columns)).collect()}
    s = {tuple(r) for r in salted.select(sorted(plain.columns)).collect()}
    assert p == s


def test_approx_distinct_error_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"))
        .collect()
    }
    for flag, n in exact.items():
        rel_err = abs(approx[flag] - n) / n
        assert rel_err < 0.05, (flag, n, approx[flag])


def test_range_join_operator(spark, sf_dir):
    from formula_1_spark.operators.asof import range_join
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    signups = events.filter("event_type = 'signup'").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    out = range_join(
        events,
        signups,
        key_left="user_id",
        key_right="s_user",
        ts_left="ts",
        lo=F.col("s_ts"),
        hi=F.col("s_ts") + F.expr("INTERVAL 1 HOUR"),
    )
    rows = out.select("event_id", "signup_id", "ts", "s_ts").collect()
    assert rows, "range join found no rows"
    for r in rows:
        delta = (r["ts"] - r["s_ts"]).total_seconds()
        assert 0 <= delta < 3600


def test_pii_scrub_positive_path(spark):
    """The driver corpus has no PII, so pin the scrub patterns on
    synthetic rows."""
    from formula_1_spark.queries.pipeline_ops import text_scrub_pii_columns

    rows = [
        (1, "contact me at jane.doe+x@example.org for details"),
        (2, "see https://example.com/a?b=1 and card 1234567890"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["scrubbed"], r["was_scrubbed"]) for r in
           df.select("doc_id", *text_scrub_pii_columns()).collect()}
    assert out[1][0] == "contact me at <EMAIL> for details" and out[1][1]
    assert out[2][0] == "see <URL> and card <NUM>" and out[2][1]
    assert out[3] == ("nothing sensitive here", False)
