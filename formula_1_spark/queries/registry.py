"""Central query registry backing the driver contract.

Every implemented operator from SURVEY.md §2 (and every extension) is
exposed as a named query: a ``(spark, sf_dir) -> DataFrame`` callable plus,
where SQL-expressible, an equivalent ANSI SQL string the DuckDB oracle runs
on the same parquet tables. ``__spark_entry__.py`` re-exports this registry.

Determinism rules every query follows (so the driver's order-insensitive
value-hash comparison is stable across engines):

* alias every computed column identically in Spark and SQL;
* rank/order on exactly-representable values (integral doubles, ints) or
  rounded aggregates — never on raw float sums whose last ulp differs by
  accumulation order;
* cast oracle-side types to Spark's result types (DuckDB ``sum(int)`` is
  HUGEINT, ``rank()``/``year()`` are BIGINT; Spark uses BIGINT/INT);
* emit timestamps as formatted strings to dodge timezone/representation
  drift.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    ops: str = ""  # SURVEY.md §2 operator ids covered
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, ops: str = "", doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, ops=ops, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registration side effects run."""
    import formula_1_spark.queries.parity  # noqa: F401

    for mod in (
        "formula_1_spark.queries.windows_events",
        "formula_1_spark.queries.dedup",
        "formula_1_spark.queries.similarity",
        "formula_1_spark.queries.text_analysis",
        "formula_1_spark.queries.multimodal",
        "formula_1_spark.queries.analytics_extras",
        "formula_1_spark.queries.sketches",
        "formula_1_spark.queries.catalog_f1",
        "formula_1_spark.queries.tpch_classic",
        "formula_1_spark.queries.tpch_extended",
        "formula_1_spark.queries.tpch_supply",
        "formula_1_spark.queries.join_types",
        "formula_1_spark.queries.functions_breadth",
        "formula_1_spark.queries.window_frames",
        "formula_1_spark.queries.pipeline_ops",
        "formula_1_spark.queries.sampling_stats",
        "formula_1_spark.queries.decontam",
        "formula_1_spark.queries.cdc_stream",
        "formula_1_spark.queries.quality_ops",
        "formula_1_spark.queries.sql_modern",
        "formula_1_spark.queries.custom_source",
    ):
        try:
            __import__(mod)
        except ImportError:
            pass  # module not built yet (incremental rounds)
    return REGISTRY
