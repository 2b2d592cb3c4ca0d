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


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "prio",
) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield–Lund–Thorup): each row gets priority q = w / u with u a
    deterministic hash-uniform in (0, 1]; the sample is the top-k by
    priority, and tau (the (k+1)-th priority) yields the Horvitz-Thompson
    subset-sum estimator ``est_weight = max(w, tau)`` whose sum is an
    unbiased estimate of the total weight.

    ``weight_col`` MUST be an integral column: the bigint cast is what
    makes q = w * GRID / (h % GRID + 1) ONE IEEE division of two exact
    integers — bit-identical in Spark and ANSI SQL, which makes the
    sampled set, tau, and the estimates oracle-checkable with no float
    drift. A fractional weight (e.g. a quality score in [0, 1]) would
    silently truncate to 0 and degenerate the sample, so non-integral
    weight types raise; pre-scale such weights to integers (e.g.
    ``(score * 1e6).cast("bigint")``) — the sampling distribution is
    scale-invariant. Ties are impossible-by-construction to matter:
    ordering is
    (q DESC, key ASC), a total order.

    Scale: top-(k+1) runs two-phase (per-partition rank prune → tiny
    global merge) — no global sort of the raw data. One pass, one
    bounded shuffle.
    """
    from formula_1_spark.operators.windows import two_phase_global_topk

    wtype = dict(df.dtypes).get(weight_col, "")
    if wtype not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"priority_sample: weight_col '{weight_col}' must be integral "
            f"(got {wtype or 'missing'}); pre-scale fractional weights, "
            'e.g. (score * 1e6).cast("bigint")'
        )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    q = (F.col(weight_col).cast("bigint") * GRID) / (h % GRID + 1)
    ranked = two_phase_global_topk(
        df.withColumn("priority", q),
        [F.col("priority").desc(), F.col(key_col).asc()],
        k + 1,
        alias="rk",
        unique_order=True,  # key_col is unique -> total order
    )
    # tau = the (k+1)-th priority (or 0 when the relation has <= k rows:
    # then every row is sampled and est_weight = w exactly).
    tau = F.min(F.when(F.col("rk") == k + 1, F.col("priority"))).over(
        Window.partitionBy()
    )
    return (
        ranked.withColumn("tau", F.coalesce(tau, F.lit(0.0)))
        .filter(F.col("rk") <= k)
        .withColumn(
            "est_weight",
            F.greatest(F.col(weight_col).cast("double"), F.col("tau")),
        )
    )


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
