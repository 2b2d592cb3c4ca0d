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


# Driver-compat dtype families. The driver's value hash is pandas-dtype
# sensitive (CORRECTNESS_r04: DuckDB SUM(BIGINT) -> HUGEINT propagated
# through `//` lands in pandas as float64 while Spark delivers int64 —
# hash_match fails on bit-exact values). These tables map each engine's
# logical type to the pandas dtype it materializes so a static check can
# catch any family mismatch before the driver does.
#
# Family granularity is calibrated to OBSERVED driver behavior, not raw
# pandas dtypes: int-width mismatches (Spark int32 vs oracle BIGINT) and
# Spark decimal vs oracle DOUBLE have both been driver hash-GREEN
# (nation_trade_triangles, top_terms_per_source in r04), so the hash is
# value-based within those families; the proven red class is integer-valued
# columns arriving as FLOAT on one side only (5 vs 5.0).
_DUCK_TO_FAMILY = {
    "BIGINT": "int",
    "INTEGER": "int",
    "SMALLINT": "int",
    "TINYINT": "int",
    "DOUBLE": "float",
    "FLOAT": "float",
    "REAL": "float",
    "DECIMAL": "decimal",
    "BOOLEAN": "bool",
    "VARCHAR": "str",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
}
_SPARK_TO_FAMILY = {
    "long": "int",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "float",
    "float": "float",
    "decimal": "decimal",
    "boolean": "bool",
    "string": "str",
    "date": "date",
    "timestamp": "timestamp",
}
# Cross-family pairs the driver hash has demonstrably accepted: Spark
# decimal(38,x) columns hashed green against both DOUBLE and BIGINT
# oracle columns (top_terms_per_source, r04).
_COMPATIBLE_FAMILIES = {
    ("decimal", "float"),
    ("float", "decimal"),
    ("decimal", "int"),
    ("int", "decimal"),
}


def oracle_dtype_mismatches(con, spec: QuerySpec, spark_schema) -> list[str]:
    """Static pandas-dtype parity between an oracle and its Spark query.

    DESCRIBEs the oracle in DuckDB (no execution) and compares each output
    column's pandas-dtype family against the Spark schema's. HUGEINT /
    UHUGEINT always fail: pandas has no 128-bit int, so they arrive as
    float64 and break the driver's dtype-sensitive hash even on equal
    values. Returns a list of human-readable problems (empty == clean).
    """
    problems: list[str] = []
    duck = {
        d[0]: d[1] for d in con.execute(f"DESCRIBE ({spec.oracle})").fetchall()
    }
    spark_types = {f.name: f.dataType.typeName() for f in spark_schema.fields}
    for col, typ in duck.items():
        t = typ.upper()
        if "HUGEINT" in t:
            problems.append(
                f"{col}: oracle type {typ} lands as float64 in pandas — "
                "CAST(... AS BIGINT) the oracle expression"
            )
            continue
        fam_o = _DUCK_TO_FAMILY.get(t.split("(")[0])
        fam_s = _SPARK_TO_FAMILY.get(spark_types.get(col, ""))
        if fam_o is None:
            problems.append(f"{col}: unmapped DuckDB type {typ}")
        elif col not in spark_types:
            problems.append(f"{col}: oracle-only column (not in Spark schema)")
        elif fam_s is None:
            problems.append(f"{col}: unmapped Spark type {spark_types[col]}")
        elif fam_o != fam_s and (fam_o, fam_s) not in _COMPATIBLE_FAMILIES:
            problems.append(
                f"{col}: oracle {typ} (family {fam_o}) vs Spark "
                f"{spark_types[col]} (family {fam_s})"
            )
    return problems


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
    dtype_problems = oracle_dtype_mismatches(con, spec, sdf.schema)
    assert not dtype_problems, (
        f"{spec.name}: pandas-dtype mismatch vs oracle (driver hash is "
        f"dtype-sensitive): {dtype_problems}"
    )
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
