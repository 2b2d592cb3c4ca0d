"""Multi-dimensional Z-order clustering for the parquet-native lake
(Delta ``OPTIMIZE ZORDER BY (a, b)`` — the multi-column complement of
``io.cluster_current``'s single-key range clustering).

Why: range-clustering on one key gives perfect file pruning on THAT key
and none on any other. Interleaving the bits of several columns' codes
into one sort key makes every file a small hyper-rectangle in the
combined space, so parquet footer min/max stats prune usefully on EVERY
z-ordered column — the property a 100 TB table needs when queries filter
on more than one dimension.

Scale design:

* Column codes come from equal-width bucketing (``width_bucket`` against
  the column's global min/max — one tiny aggregate, two scalars to the
  driver), NOT from rank/ntile: a global rank needs a total sort through
  one partition, while width_bucket is a per-row expression. Equal-width
  is skew-sensitive in code SPACE but pruning only needs locality, not
  balance — and the final ``repartitionByRange`` on the z-value
  re-balances rows regardless.
* The interleave is a pure Column expression (32 shift/mask terms for
  two 16-bit codes) — whole-stage codegen, no UDF.
* The rewrite is snapshot + atomic ``_CURRENT`` repoint like every other
  OPTIMIZE here: readers never block, time travel keeps the old layout.

Tradeoff (same as Delta's): z-ordering on secondary columns interleaves
the MERGE key's ranges across files, so merge-time pruning on the key
degrades. Choose per table: point-merge-heavy → ``cluster_current`` on
the key; multi-dimensional scan-heavy → z-order on the filter columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.sources.io import (
    current_snapshot_dir,
    read_current,
    read_manifest,
    _write_snapshot_and_repoint,
)


def _codes(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    """Equal-width integer codes in [0, 2^bits) for each column, from one
    global min/max aggregate (two scalars per column to the driver)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    n = 1 << bits
    out = []
    for c in cols:
        lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
        if lo is None or hi is None or lo == hi:
            out.append(F.lit(0).cast("bigint"))
            continue
        # width_bucket -> [1, n] inside the range; clamp + null -> 0.
        code = F.width_bucket(F.col(c).cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n)) - 1
        out.append(
            F.coalesce(F.least(F.greatest(code, F.lit(0)), F.lit(n - 1)), F.lit(0)).cast(
                "bigint"
            )
        )
    return out


def zorder_value(codes: list[Column], bits: int) -> Column:
    """Bit-interleave k same-width codes into one BIGINT sort key: bit b
    of code i lands at position ``b * k + i`` — pure shift/mask
    expression, stays in codegen.

    ``bits * k`` must fit the 63 non-sign bits of a BIGINT: position 63
    would flip the sign (those rows sort FIRST, breaking locality) and
    Java shifts are mod 64, so 5+ columns at the 16-bit default would
    silently wrap and corrupt the interleave. Callers with many columns
    should shrink bits (``63 // len(cols)``)."""
    k = len(codes)
    if bits * k > 63:
        raise ValueError(
            f"zorder_value: {k} columns x {bits} bits = {bits * k} bit "
            "positions exceeds the 63 usable bits of a BIGINT sort key; "
            f"use bits <= {63 // k}"
        )
    z = F.lit(0).cast("bigint")
    for i, code in enumerate(codes):
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(code, b).bitwiseAND(F.lit(1)), b * k + i
            ).cast("bigint")
    return z


def zorder_current(
    spark: SparkSession,
    target_path: str,
    cols: list[str],
    n_files: int | None = None,
    target_rows_per_file: int = 1_000_000,
    bits: int = 16,
) -> None:
    """Rewrite the live snapshot z-ordered on ``cols``: rows sorted by
    the interleaved code, range-partitioned into right-sized files, new
    snapshot, atomic repoint. Footer min/max on every z-ordered column
    then prunes multi-dimensionally."""
    current = read_current(spark, target_path)
    if current is None:
        raise ValueError(f"no live snapshot at {target_path}")
    # Keep the interleave inside a BIGINT's 63 usable bits at any column
    # count (4 cols at the 16-bit default would place a bit at the sign).
    bits = min(bits, 63 // max(1, len(cols)))
    snap_dir = current_snapshot_dir(target_path)
    manifest = read_manifest(snap_dir) if snap_dir else None
    if n_files is None:
        n = current.count()
        n_files = max(1, -(-n // target_rows_per_file))
    z = zorder_value(_codes(current, cols, bits), bits).alias("__z")
    clustered = (
        current.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    _write_snapshot_and_repoint(
        clustered,
        target_path,
        key_cols=manifest["key_cols"] if manifest else None,
    )
