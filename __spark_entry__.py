"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`formula_1_spark.queries.registry` — every implemented
operator from SURVEY.md §2 (plus extensions) is registered there with a
``(spark, sf_dir) -> DataFrame`` callable and, where SQL-expressible, a
matching DuckDB oracle SQL string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Robust to being imported from any cwd: the package lives next to this
# file.
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from formula_1_spark.queries.registry import load_all  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the driver-standings shape — broadcast
    dim joins + conditional-count aggregation + per-season competition rank
    (Transform Silver Data.py:92-139 re-expressed on the star schema)."""
    registry = load_all()
    return registry["driver_standings"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted entries (oracle=None)
    get the driver's weaker rows-only check."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
