"""Schema evolution across bronze snapshots (engine hardening beyond the
reference, which silently assumes every snapshot has identical shape).

Real ingest feeds drift: endpoints add fields, pages omit empty arrays,
types widen. Two primitives:

* :func:`union_evolving` — union DataFrames whose schemas drifted
  (missing columns become NULLs, new columns are kept) via
  ``unionByName(allowMissingColumns=True)`` after reconciling castable
  type widenings.
* :func:`conform_to_spec` — project any drifted silver frame onto its
  declarative :class:`~formula_1_spark.plans.schema_spec.DatasetSpec`
  output schema: missing expected columns are added as typed NULLs,
  unexpected extras dropped — downstream marts never see drift.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WIDENINGS = {
    ("int", "bigint"): "bigint",
    ("bigint", "int"): "bigint",
    ("int", "double"): "double",
    ("double", "int"): "double",
    ("bigint", "double"): "double",
    ("double", "bigint"): "double",
    ("float", "double"): "double",
    ("double", "float"): "double",
}


def _widen(frames: list[DataFrame]) -> list[DataFrame]:
    """Cast drifted numeric columns to their common widened type."""
    target: dict[str, str] = {}
    for df in frames:
        for name, dtype in df.dtypes:
            prev = target.get(name)
            if prev is None or prev == dtype:
                target[name] = dtype
            else:
                widened = _WIDENINGS.get((prev, dtype))
                if widened is None:
                    raise TypeError(
                        f"column {name}: incompatible drift {prev} vs {dtype}"
                    )
                target[name] = widened
    out = []
    for df in frames:
        casts = [
            F.col(n).cast(target[n]).alias(n) if dict(df.dtypes)[n] != target[n] else F.col(n)
            for n in df.columns
        ]
        out.append(df.select(*casts))
    return out


def union_evolving(frames: list[DataFrame]) -> DataFrame:
    """Union snapshots with drifted schemas: NULL-fill missing columns,
    keep the union of columns, widen castable numeric drift."""
    if not frames:
        raise ValueError("union_evolving: no frames")
    widened = _widen(frames)
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), widened
    )


def conform_to_spec(df: DataFrame, expected: dict[str, str]) -> DataFrame:
    """Project onto the expected {column: type} schema: add typed-NULL
    columns for anything missing, cast mismatches, drop extras. The
    output schema is exactly ``expected`` in iteration order."""
    have = dict(df.dtypes)
    cols = []
    for name, dtype in expected.items():
        if name in have:
            c = F.col(name).cast(dtype) if have[name] != dtype else F.col(name)
        else:
            c = F.lit(None).cast(dtype)
        cols.append(c.alias(name))
    return df.select(*cols)
