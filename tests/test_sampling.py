"""Deterministic sampling operator tests: reproducibility, rate accuracy,
fixed-N exactness."""

from pyspark.sql import functions as F

from formula_1_spark.operators.sampling import (
    fixed_n_per_stratum,
    rate_sample,
    stratified_sample,
)


def test_rate_sample_deterministic_and_calibrated(spark):
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    s1 = rate_sample(df, 0.3, salt="t")
    s2 = rate_sample(df, 0.3, salt="t")
    n1 = s1.count()
    assert n1 == s2.count()  # same rows every run
    assert abs(n1 / 20000 - 0.3) < 0.02  # within 2pp of the target rate
    # different salt -> different (but still deterministic) subset
    ids_t = {r.doc_id for r in s1.collect()}
    ids_u = {r.doc_id for r in rate_sample(df, 0.3, salt="u").collect()}
    assert ids_t != ids_u


def test_rate_sample_is_nested(spark):
    # hash < 0.1 implies hash < 0.5: lower-rate sample is a subset of the
    # higher-rate one (stable ablation ladders).
    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    small = {r.doc_id for r in rate_sample(df, 0.1, salt="n").collect()}
    big = {r.doc_id for r in rate_sample(df, 0.5, salt="n").collect()}
    assert small < big


def test_stratified_rates(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(10000)],
        ["doc_id", "grp"],
    )
    out = stratified_sample(df, F.col("grp"), {"a": 0.5, "b": 0.1}, salt="s")
    counts = {r.grp: r.c for r in out.groupBy("grp").agg(F.count("*").alias("c")).collect()}
    assert abs(counts["a"] / 5000 - 0.5) < 0.03
    assert abs(counts["b"] / 5000 - 0.1) < 0.03


def test_fixed_n_per_stratum_exact(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(300)] + [(1000, "tiny")],
        ["doc_id", "grp"],
    )
    out = fixed_n_per_stratum(df, "grp", 7)
    counts = {r.grp: r.c for r in out.groupBy("grp").agg(F.count("*").alias("c")).collect()}
    assert counts == {"s0": 7, "s1": 7, "s2": 7, "tiny": 1}
    # deterministic pick
    again = fixed_n_per_stratum(df, "grp", 7)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
