"""Unit tests for the data-quality expectations engine and priority
sampling (oracle parity is covered separately by test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula_1_spark.operators.quality import (
    DROP,
    WARN,
    Expectation,
    enforce,
    expectation_stats,
)
from formula_1_spark.operators.sampling import priority_sample
from formula_1_spark.sources.tables import load_table


def _rules():
    return [
        Expectation("qty_positive", F.col("l_quantity") >= 1, DROP),
        Expectation("qty_small", F.col("l_quantity") <= 10, WARN),
        Expectation("flag_known", F.col("l_returnflag").isin("A", "N", "R"), DROP),
    ]


def test_enforce_partitions_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    clean, quarantine = enforce(li, _rules())
    n, nc, nq = li.count(), clean.count(), quarantine.count()
    assert nc + nq == n
    # Clean rows satisfy every drop rule; warn rules never drop.
    assert clean.filter(F.col("l_quantity") < 1).count() == 0
    assert clean.filter(F.col("l_quantity") > 10).count() > 0
    # Quarantine rows name at least one violated drop-rule.
    assert quarantine.filter(F.size("failed_rules") == 0).count() == 0


def test_enforce_nulls_are_violations(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0)], "id bigint, v double"
    )
    clean, quarantine = enforce(df, [Expectation("v_pos", F.col("v") > 0, DROP)])
    assert [r.id for r in clean.collect()] == [1]
    q = {r.id: list(r.failed_rules) for r in quarantine.collect()}
    assert q == {2: ["v_pos"], 3: ["v_pos"]}


def test_stats_single_pass_and_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    stats = expectation_stats(li, _rules())
    rows = {r.rule_name: r for r in stats.collect()}
    assert set(rows) == {"qty_positive", "qty_small", "flag_known"}
    n = li.count()
    bad_qty = li.filter(~(F.col("l_quantity") <= 10)).count()
    assert rows["qty_small"].n_rows == n
    assert rows["qty_small"].n_violations == bad_qty
    assert rows["qty_small"].violation_ppm == bad_qty * 1_000_000 // n
    # One aggregation pass: a single scan feeds every rule's sum.
    plan = stats._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-AQE plan too
    assert final.count("FileScan parquet") == 1


def test_warn_only_rules_drop_nothing(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    clean, quarantine = enforce(li, [Expectation("w", F.col("l_quantity") <= 1, WARN)])
    assert clean.count() == li.count()
    assert quarantine.count() == 0


def test_priority_sample_estimator(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s = priority_sample(docs, k=50, weight_col="n_chars")
    rows = s.collect()
    assert len(rows) == 50
    tau = rows[0].tau
    for r in rows:
        assert r.tau == tau
        assert r.priority >= tau  # sampled rows beat the (k+1)-th priority
        assert r.est_weight == max(float(r.n_chars), tau)
    # Horvitz-Thompson subset-sum estimate lands near the true total.
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    est = sum(r.est_weight for r in rows)
    assert 0.5 * total <= est <= 2.0 * total
    # Deterministic: a second run picks the identical sample.
    again = priority_sample(docs, k=50, weight_col="n_chars").collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)


def test_priority_sample_small_relation_all_rows(spark):
    df = spark.createDataFrame(
        [(i, 10 * (i + 1)) for i in range(5)], "doc_id bigint, w bigint"
    )
    s = priority_sample(df, k=10, weight_col="w").collect()
    assert len(s) == 5
    # Fewer rows than k: tau = 0 and the estimator is exact.
    assert all(r.tau == 0.0 and r.est_weight == float(r.w) for r in s)


def test_cogroup_reconciliation_matches_relational(spark, sf_dir):
    """The cogrouped Arrow kernel must agree with the pure-relational
    recompute on every integer column, and on line_total within float
    refold tolerance (the relational sum is not order-pinned)."""
    from formula_1_spark.operators.cogroup import order_reconciliation

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    got = order_reconciliation(orders, li, n_buckets=16)
    lt = li.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("line_total_rel"),
        F.count(F.lit(1)).alias("n_lines_rel"),
    )
    joined = got.join(lt, got.o_orderkey == lt.l_orderkey, "left").select(
        "o_orderkey",
        "n_lines",
        F.coalesce("n_lines_rel", F.lit(0)).alias("n_lines_rel"),
        "line_total",
        F.coalesce("line_total_rel", F.lit(0.0)).alias("line_total_rel"),
    )
    assert joined.filter(F.col("n_lines") != F.col("n_lines_rel")).count() == 0
    assert (
        joined.filter(
            F.abs(F.col("line_total") - F.col("line_total_rel")) > 1e-6
        ).count()
        == 0
    )
    assert got.count() == orders.count()


def test_write_parquet_audited_single_pass(spark, sf_dir, tmp_path):
    """Metrics observed during the write must equal a direct recount —
    with zero extra scans of the input."""
    from formula_1_spark.operators.quality import DROP, WARN, Expectation
    from formula_1_spark.plans.observability import write_parquet_audited

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 4)
    rules = [
        Expectation("qty_small", F.col("l_quantity") <= 10, WARN),
        Expectation("price_positive", F.col("l_extendedprice") > 0, DROP),
    ]
    out = str(tmp_path / "audited")
    # Observed metrics reject DISTINCT aggregates (single-pass contract);
    # the observability idiom for cardinality is the HLL sketch.
    metrics = write_parquet_audited(
        li,
        out,
        rules,
        extra_metrics=[
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("n_orders")
        ],
    )
    n = li.count()
    assert metrics["n_rows"] == n
    assert metrics["viol_qty_small"] == li.filter(~(F.col("l_quantity") <= 10)).count()
    assert metrics["viol_price_positive"] == 0
    exact_orders = li.select("l_orderkey").distinct().count()
    assert abs(metrics["n_orders"] - exact_orders) <= 0.05 * exact_orders
    assert spark.read.parquet(out).count() == n
