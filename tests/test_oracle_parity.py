"""Oracle-differential tests: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 correctness gate (row count + column names +
order-insensitive values) at sf0.001 so breakage surfaces locally first.
"""

from __future__ import annotations

import pytest

from formula_1_spark.queries.registry import load_all
from formula_1_spark.testing import check_query

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    report = check_query(spark, REGISTRY[name], sf_dir)
    assert report["rows"] >= 0
    if report.get("oracle"):
        # exact_rows == rows means bit-identical values (strongest signal
        # the driver's value-hash will match too).
        assert report["close_only_rows"] == 0, report
