"""Static pandas-dtype parity sweep over every registered oracle.

Guards the failure class behind the CORRECTNESS_r04 hash reds: DuckDB
``SUM(BIGINT)`` returns HUGEINT, HUGEINT survives ``//``, and pandas (which
has no 128-bit int) materializes it as float64 — while Spark delivers
int64. The driver's value hash is dtype-sensitive, so bit-exact values
still red. ``DESCRIBE`` is static (no query execution), so this sweep over
all ~171 oracles runs in seconds.
"""

from __future__ import annotations

import pytest

from formula_1_spark.queries.registry import QuerySpec, load_all
from formula_1_spark.testing import duckdb_connection, oracle_dtype_mismatches

REGISTRY = load_all()
_ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duckdb_connection(sf_dir)


def _describe(duck, spec, spark, sf_dir):
    """DESCRIBE the oracle; if it reads a fixture lake the Spark side
    materializes (e.g. ``f1_gold_driver_standings``), build it on demand.

    The driver contract always runs the Spark query before its oracle, so
    missing-fixture IOExceptions are a test-ordering artifact (fresh /tmp),
    not a query bug — run the Spark side once and retry."""
    import duckdb

    try:
        return duck.execute(f"DESCRIBE ({spec.oracle})").fetchall()
    except duckdb.IOException:
        spec.fn(spark, sf_dir)
        return duck.execute(f"DESCRIBE ({spec.oracle})").fetchall()


def test_no_hugeint_or_unmapped_oracle_columns(duck, spark, sf_dir):
    """No oracle may emit HUGEINT/UHUGEINT or any type outside the mapped
    pandas families — purely DuckDB-side, catches the whole class even for
    queries whose Spark side is expensive to plan."""
    bad = {}
    for spec in _ORACLE_SPECS:
        for col, typ, *_ in _describe(duck, spec, spark, sf_dir):
            t = typ.upper()
            if "HUGEINT" in t or t not in (
                "BIGINT",
                "INTEGER",
                "SMALLINT",
                "TINYINT",
                "DOUBLE",
                "FLOAT",
                "REAL",
                "BOOLEAN",
                "VARCHAR",
                "DATE",
                "TIMESTAMP",
            ):
                bad.setdefault(spec.name, []).append(f"{col}: {typ}")
    assert not bad, f"oracles with driver-hash-unsafe column types: {bad}"


def test_guard_flags_uncast_sum_div():
    """Red fixture: an uncast SUM(x)//n oracle must trip the guard."""
    import duckdb
    from pyspark.sql.types import LongType, StructField, StructType

    con = duckdb.connect()
    spec = QuerySpec(
        name="fixture_uncast_sum_div",
        fn=lambda spark, sf: None,
        oracle="SELECT (SUM(x) * 1000000) // COUNT(1) AS share_ppm "
        "FROM (SELECT 1 AS x UNION ALL SELECT 2)",
    )
    schema = StructType([StructField("share_ppm", LongType())])
    problems = oracle_dtype_mismatches(con, spec, schema)
    assert problems and "HUGEINT" in problems[0].upper(), problems


def test_guard_flags_family_mismatch():
    """Red fixture: oracle DOUBLE vs Spark BIGINT must trip the guard."""
    import duckdb
    from pyspark.sql.types import LongType, StructField, StructType

    con = duckdb.connect()
    spec = QuerySpec(
        name="fixture_family_mismatch",
        fn=lambda spark, sf: None,
        oracle="SELECT CAST(1.5 AS DOUBLE) AS v",
    )
    schema = StructType([StructField("v", LongType())])
    problems = oracle_dtype_mismatches(con, spec, schema)
    assert problems and "family float" in problems[0], problems
