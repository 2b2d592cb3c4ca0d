"""Deterministic sampling operators (training-data pipeline extensions).

Sampling for dataset curation must be REPRODUCIBLE — a re-run over the
same corpus must pick the same rows (splits stay stable across pipeline
restarts, ablations stay comparable). So none of these use ``rand()``:
each row's inclusion is decided by a salted md5 hash of its key, mapped
to a uniform [0, 1) grid.

The hash family is the engine-shared one (see operators/dedup.md5_long):
``('0x' || substr(md5(salt || ':' || key), 1, 15))::BIGINT`` in ANSI SQL,
``conv(substring(md5(...), 1, 15), 16, 10)`` in Spark — so every sampling
decision is oracle-checkable bit-for-bit.

100 TB design: all three operators are single-pass, shuffle-free scans
(the fixed-N variant adds one shuffle on the stratum key for its window
rank — bounded by stratum cardinality, and the rank prunes map-side via
WindowGroupLimit in Spark 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 1e6 grid: coarse enough that the int → double division is exact
# (values are k/1e6 with k < 2^20 — exactly representable), fine enough
# for per-mille rate control.
GRID = 1_000_000


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform [0, 1) value for a row key: first 60 bits of
    the salted md5, reduced to a 1e-6 grid. Identical in ANSI SQL."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return (h % GRID) / F.lit(float(GRID))


def hash_uniform_sql(key_sql: str, salt: str) -> str:
    """The DuckDB-side twin of :func:`hash_uniform`."""
    return (
        f"(('0x' || substr(md5('{salt}' || ':' || CAST({key_sql} AS VARCHAR)), "
        f"1, 15))::BIGINT % {GRID}) / {float(GRID)}"
    )


def rate_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep each row iff its hash-uniform value < ``rate``. Single-pass,
    shuffle-free, reproducible."""
    return df.filter(hash_uniform(F.col(key_col), salt) < rate)


def stratified_sample(
    df: DataFrame,
    stratum: Column,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum rate sampling (e.g. rebalance languages in a corpus):
    each stratum value gets its own keep-rate; unknown strata get
    ``default_rate``."""
    rate: Column = F.lit(default_rate)
    for value, r in rates.items():
        rate = F.when(stratum == value, F.lit(r)).otherwise(rate)
    return df.filter(hash_uniform(F.col(key_col), salt) < rate)


def fixed_n_per_stratum(
    df: DataFrame,
    stratum_col: str,
    n: int,
    key_col: str = "doc_id",
    salt: str = "resv",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum — the distributed,
    deterministic analog of per-group reservoir sampling: rank rows by
    their hash-uniform value (key tiebreak) inside each stratum and keep
    the first ``n``. One shuffle on the stratum key; Spark's
    WindowGroupLimit prunes to n rows per partition map-side before the
    shuffle."""
    u = hash_uniform(F.col(key_col), salt)
    w = Window.partitionBy(stratum_col).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("u", u)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
    )
