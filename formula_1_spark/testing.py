"""Local oracle-differential checker mirroring the driver's t2 gate.

Runs a registered query on Spark and its oracle SQL on DuckDB (same parquet
tables pre-registered as views), then compares row count, column names and
an order-insensitive value comparison. Used by the test suite so parity
breakage surfaces locally before the driver's per-round run.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from formula_1_spark.queries.registry import QuerySpec
from formula_1_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(rows, columns):
    """Sort columns by name (driver semantics) and canonicalize values."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v
        return v

    return sorted(
        [tuple(canon(r[i]) for i in order) for r in rows],
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )


def _values_close(a, b, rel=1e-9, abs_tol=1e-9):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=rel, abs_tol=abs_tol)
        except (TypeError, ValueError):
            return a == b
    return a == b


def check_query(spark: SparkSession, spec: QuerySpec, sf_dir: str) -> dict:
    """Return a comparison report; raises AssertionError on mismatch."""
    sdf = spec.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if spec.oracle is not None:
        # Driver-compat: the driver canonicalizes with pandas factorize,
        # which cannot hash list/dict cells — complex types must be
        # flattened (scalar columns or exploded rows) before registration.
        for f in sdf.schema.fields:
            assert f.dataType.typeName() not in ("array", "map", "struct"), (
                f"{spec.name}: column {f.name} is {f.dataType.simpleString()} — "
                "driver canonicalizer cannot hash complex types; flatten it"
            )

    if spec.oracle is None:
        assert len(spark_rows) >= 0
        return {"name": spec.name, "rows": len(spark_rows), "oracle": False}

    con = duckdb_connection(sf_dir)
    res = con.execute(spec.oracle)
    oracle_cols = [d[0] for d in res.description]
    oracle_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"{spec.name}: column mismatch spark={sorted(spark_cols)} "
        f"oracle={sorted(oracle_cols)}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{spec.name}: row count spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )

    ns = _normalize(spark_rows, spark_cols)
    no = _normalize(oracle_rows, oracle_cols)
    exact = 0
    for i, (rs, ro) in enumerate(zip(ns, no)):
        for vs, vo in zip(rs, ro):
            assert _values_close(vs, vo), (
                f"{spec.name}: value mismatch at sorted-row {i}: {rs} != {ro}"
            )
        if rs == ro:
            exact += 1
    return {
        "name": spec.name,
        "rows": len(spark_rows),
        "oracle": True,
        "exact_rows": exact,
        "close_only_rows": len(ns) - exact,
    }
