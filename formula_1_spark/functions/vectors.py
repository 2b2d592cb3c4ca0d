"""Vector math over ``array<float>`` embedding columns — pure Spark
expressions (``zip_with`` + ``aggregate`` left-folds), no UDFs.

Determinism contract: elements are cast float→double (exact), products and
sums run in double in array order (left fold), so results are
bit-identical to the DuckDB oracle's ``list_reduce(list_transform(...))``
over the same data — and invariant to Spark partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------------------
# Flat-column vector kernels (the pair-comparison hot path)
# ---------------------------------------------------------------------------
#
# Higher-order functions (``aggregate``/``zip_with``) are evaluated
# interpreted, per element, outside whole-stage codegen — fine once per row,
# ~10x too slow once per candidate PAIR. For pairwise scoring the engine
# flattens each vector side into ``dims`` scalar double columns in a
# one-time projection (per ROW, not per pair), then scores pairs with a
# flat multiply-add chain that codegens. The chain adds left-to-right in
# element order — the same fold order as :func:`dot` and the DuckDB
# oracle's ``list_reduce`` (0.0 + x == x) — so results stay bit-identical.


def flatten_vec(
    prefix: str, vec_name: str, dims: int, denom: str | None = None
) -> list[str]:
    """``dims`` SQL select-expressions ``{prefix}0..{prefix}{dims-1}``
    (for ``df.selectExpr``) extracting scalar doubles from the array
    column named ``vec_name`` (optionally elementwise-divided by the
    plain column named ``denom``, e.g. a precomputed norm for
    unit-normalization). Run ONCE per row before a pair join. ``denom``
    must name a materialized column, not an embedded HOF fold — see the
    CollapseProject caveat in the module doc.

    Strings, not Columns: a Column-object formulation costs ~4·dims py4j
    round trips per call site (~0.5-1 s of driver time at dims=64,
    multiplied across every pair-verify/assignment call), while
    ``selectExpr(*strings)`` ships the whole projection in ONE call and
    parses it JVM-side. The parsed tree — CAST(element_at(v, i) AS
    DOUBLE) [/ denom] — is expression-identical to the old
    ``F.element_at(v, i).cast('double') [/ F.col(denom)]``."""
    out = []
    for d in range(dims):
        e = f"CAST(element_at({vec_name}, {d + 1}) AS DOUBLE)"
        if denom is not None:
            e = f"({e} / {denom})"
        out.append(f"{e} AS {prefix}{d}")
    return out


def flat_dot(prefix_a: str, prefix_b: str, dims: int) -> Column:
    """Left-to-right dot product over two flattened sides — bit-identical
    to ``dot`` on the original arrays (the SQL parser's ``+`` chain is
    left-associative, matching the Column fold). Built from ONE parsed
    string: the Column-chain formulation costs ~4·dims py4j round trips
    per call."""
    return F.expr(
        " + ".join(f"({prefix_a}{d} * {prefix_b}{d})" for d in range(dims))
    )
