"""Window / ranking operators (SURVEY.md §2.5, W1–W2; §2.6 O3).

* W1 — standings rank: ``rank()`` over ``partitionBy(season).orderBy(desc
  points, desc wins)`` (``Transform Silver Data.py:135-137``). Competition
  ranking (ties share a rank, gaps follow) — NOT dense_rank/row_number —
  matching F1 standings semantics.
* W2 — global (unpartitioned) rank over an aggregate
  (``Data Visualization.sql:86``). An unpartitioned window forces all rows
  through a single partition; fine post-aggregation (cardinality is small
  after the groupBy) but a chokepoint if misused on raw data. For the raw
  case, ``two_phase_global_topk`` keeps the heavy ordering distributed and
  only merges per-partition survivors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_standings(
    df: DataFrame,
    partition_keys: Sequence[str],
    order_cols: Sequence[Column],
    alias: str = "rank",
) -> DataFrame:
    """W1: competition rank within each partition (F1 standings shape)."""
    w = Window.partitionBy(*partition_keys).orderBy(*order_cols)
    return df.withColumn(alias, F.rank().over(w))


def global_rank(df: DataFrame, order_cols: Sequence[Column], alias: str = "rank") -> DataFrame:
    """W2: unpartitioned rank. Use only on post-aggregation cardinalities;
    the single-partition shuffle is the price of total ordering."""
    return df.withColumn(alias, F.rank().over(Window.orderBy(*order_cols)))


def _assert_sort_under_id_projection(df: DataFrame) -> None:
    """Loud guard for the mid-as-rank invariant.

    ``monotonically_increasing_id`` equals a per-partition record number
    only because Catalyst keeps the LOCAL Sort beneath the nondeterministic
    id Project (``EliminateSorts`` skips nondeterministic projects in
    Spark today). A future optimizer change could silently reorder or
    eliminate that sort and corrupt every rank/NTILE/top-k built on it —
    so assert, per call, that the optimized plan still has a non-global
    Sort below the id projection. Driver-side string inspection only; no
    job runs.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    max_rows = plan.maxRows()
    if max_rows.isDefined() and int(max_rows.get()) <= 1:
        # Sorting a provably <=1-row relation is a no-op; EliminateSorts
        # legitimately drops it and any id assignment is trivially ordered.
        return
    lines = plan.toString().splitlines()
    proj_idx = next(
        (i for i, ln in enumerate(lines) if "monotonically_increasing_id" in ln),
        None,
    )
    assert proj_idx is not None, (
        "mid-as-rank guard: id projection missing from optimized plan"
    )
    assert any(
        ln.lstrip(" +-:").startswith("Sort ") and "false" in ln
        for ln in lines[proj_idx + 1 :]
    ), (
        "mid-as-rank guard: local Sort no longer survives beneath the "
        "monotonically_increasing_id projection — the optimizer "
        "eliminated or reordered it; ranks derived from __mid would be "
        f"silently wrong. Plan:\n" + "\n".join(lines)
    )


def _default_range_parts(df: DataFrame) -> int:
    """Range-exchange width for the two-phase operators: the shuffle conf,
    capped at the INPUT's own partition count. Data that fits N upstream
    partitions fits N range partitions of the same size; on a vanilla
    200-shuffle-partition session a small scan would otherwise pay
    3 × 200-task stages plus a 200-block localCheckpoint (measured 5.4 s
    → 1.0 s for token_budget_selection at sf0.1). At cluster scale the
    input is thousands of scan splits and the conf term is what caps it —
    the sizing contract in session.py still applies.

    The input width comes from the METADATA-ONLY probe in
    ``sources/tables.py`` (file-index listing + FilePartition-split
    replay) — the old ``df.rdd.getNumPartitions()`` here forced a full
    plan-to-RDD conversion per two-phase call, the exact per-query driver
    cost that probe exists to eliminate.
    """
    from formula_1_spark.sources.tables import probe_partitions

    conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return max(1, min(int(conf or 32), probe_partitions(df)))


def _ranged_enumerate(
    df: DataFrame,
    order_cols: Sequence[Column],
    alias: str,
    n_parts: int | None,
) -> tuple[DataFrame, int]:
    """Shared two-phase core: range-partition + local sort on the order
    key, then turn ``monotonically_increasing_id`` (consecutive per
    partition, assigned in post-sort row order) into the global 1-based
    rank by adding one broadcast per-partition constant
    ``offset - min_id + 1``. ONE full shuffle total (the range exchange);
    a ``Window.partitionBy(pid)`` formulation would re-shuffle the whole
    relation a second time just to run row_number. Only #partitions
    (pid, count, min_id) triples travel to the driver; data rows never
    converge on one task. Returns ``(enumerated_df, total_row_count)`` —
    the count is a free by-product of the offset pass.
    """
    if n_parts is None:
        n_parts = _default_range_parts(df)
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .select(
            "*",
            F.spark_partition_id().alias("__pid"),
            F.monotonically_increasing_id().alias("__mid"),
        )
    )
    _assert_sort_under_id_projection(parts)
    # localCheckpoint (not persist): the two consumers (stats pass + rank
    # join) must see IDENTICAL nondeterministic ids. A plain persist would
    # silently recompute different ids if blocks were evicted or an
    # executor died; a local checkpoint truncates lineage so loss fails
    # loudly instead of corrupting ranks — and its blocks are freed by the
    # ContextCleaner once callers drop the DataFrame, where the old
    # persist leaked a pinned relation per call in long-lived sessions.
    parts = parts.localCheckpoint(eager=False)
    stats = {
        r["__pid"]: (r["n"], r["mn"])
        for r in parts.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"), F.min("__mid").alias("mn"))
        .collect()
    }
    adjust, acc = [], 0
    for pid in sorted(stats):
        n, mn = stats[pid]
        adjust.append((pid, acc - mn + 1))  # rank = __mid + adjust[pid]
        acc += n
    if adjust:
        # Broadcast-join a tiny (pid, adjust) relation instead of a
        # create_map of 2*n_parts literals: with shuffle.partitions in the
        # thousands the literal map bloats the expression tree and every
        # codegen'd stage that embeds it; a broadcast hash join stays O(1)
        # in plan size and the build side is n_parts rows.
        adj_df = df.sparkSession.createDataFrame(
            adjust, "__pid int, __adj bigint"
        )
        enumerated = (
            parts.join(F.broadcast(adj_df), "__pid")
            .withColumn(alias, (F.col("__mid") + F.col("__adj")).cast("bigint"))
            .drop("__pid", "__mid", "__adj")
        )
    else:  # empty input: no pids observed
        enumerated = parts.withColumn(alias, F.lit(0).cast("bigint")).drop(
            "__pid", "__mid"
        )
    return enumerated, acc


def distributed_global_enumerate(
    df: DataFrame,
    order_cols: Sequence[Column],
    alias: str = "rank",
    n_parts: int | None = None,
) -> DataFrame:
    """Scale-safe FULL global 1-based enumeration by a total order — the
    distributed alternative to ``Window.orderBy`` row_number when every
    row needs its rank (epoch shuffling, stable sharding), not just the
    top-k.

    The order key must be a TOTAL order (unique per row) — with ties the
    rank of tied rows would depend on which side of a range boundary they
    sampled to. Input is persisted for the two passes (count + rank) so
    both jobs see identical range boundaries; at 100 TB prefer a
    checkpointed or already-materialized input.
    """
    return _ranged_enumerate(df, order_cols, alias, n_parts)[0]


def global_ntile_two_phase(
    df: DataFrame,
    order_cols: Sequence[Column],
    n_tiles: int,
    alias: str = "tile",
    n_parts: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_cols)`` without the
    single-partition global sort an unpartitioned window forces.

    Two-phase: distributed global enumeration (range shuffle + local
    row_number + broadcast prefix-sum offsets), then the closed-form SQL
    NTILE bucket function of (rank, N): with ``base = N div n`` and
    ``rem = N mod n``, the first ``rem`` tiles hold ``base+1`` rows and
    the rest ``base`` — bit-identical to ``F.ntile``/DuckDB ``NTILE`` for
    any TOTAL order (unique key; with ties the assignment would be
    engine-dependent in the window form too). N arrives for free from the
    offset pass — no extra count job. At 100 TB both shuffles stay fully
    parallel; nothing converges on one task.
    """
    ranked, total = _ranged_enumerate(df, order_cols, "__rn", n_parts)
    base, rem = divmod(total, n_tiles) if total > 0 else (0, 0)
    if base == 0:
        # Fewer rows than tiles (or empty): NTILE gives row i tile i.
        tile = F.col("__rn").cast("int")
    else:
        boundary = rem * (base + 1)
        tile = (
            F.when(
                F.col("__rn") <= F.lit(boundary),
                F.expr(f"(__rn - 1) div {base + 1}"),
            ).otherwise(F.lit(rem) + F.expr(f"(__rn - {boundary} - 1) div {base}"))
            + F.lit(1)
        ).cast("int")
    return ranked.withColumn(alias, tile).drop("__rn")


def two_phase_global_topk(
    df: DataFrame,
    order_cols: Sequence[Column],
    k: int,
    alias: str = "rank",
    unique_order: bool = False,
) -> DataFrame:
    """Scale-safe global top-k: per-partition prune to the local top-k →
    global rank over the tiny survivor set.

    Correctness: any row in the global top-k by ``order_cols`` is within
    the top-k of its own partition (a partition holds a subset, so local
    rank <= global rank), so phase 1 never discards a global winner. Ties
    at the boundary are preserved because rank() assigns equal ranks to
    ties and the filter is ``<= k`` on competition rank.

    ``unique_order=True`` (caller asserts ``order_cols`` is a TOTAL
    order, e.g. ends in a unique key): the local prune needs NO shuffle
    at all — local sort + ``monotonically_increasing_id`` (lower 33 bits
    = record number within the partition, assigned in post-sort row
    order) gives the per-partition row_number, which equals rank when
    there are no ties. The default rank() path must instead hash-shuffle
    by partition id because a window's required clustering can't be
    proven from ``spark_partition_id``; keep it for tie-bearing orders.

    At 100 TB either path avoids funnelling the full dataset through the
    single partition an unpartitioned ``Window.orderBy`` would require;
    the unique_order path additionally runs shuffle-free before the tiny
    survivor merge.
    """
    if unique_order:
        pruned = (
            df.sortWithinPartitions(*order_cols)
            .withColumn("__mid", F.monotonically_increasing_id())
            .filter(F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)) < k)
            .drop("__mid")
        )
        _assert_sort_under_id_projection(pruned)
    else:
        local_w = Window.partitionBy(F.spark_partition_id()).orderBy(*order_cols)
        pruned = (
            df.withColumn("__local_rank", F.rank().over(local_w))
            .filter(F.col("__local_rank") <= k)
            .drop("__local_rank")
        )
    return (
        pruned.withColumn(alias, F.rank().over(Window.orderBy(*order_cols)))
        .filter(F.col(alias) <= k)
    )


def _assert_local_sort_survives(df: DataFrame) -> None:
    """Loud guard for the running-sum order invariant.

    ``global_ordered_cumsum`` materializes a range-partitioned locally-
    sorted relation via localCheckpoint and then streams it through
    ``mapInPandas`` (which preserves partition row order) carrying a
    running total. The checkpoint seals whatever the optimizer produced
    — so assert, BEFORE checkpointing, that a non-global Sort survives
    in the optimized plan. If a future EliminateSorts change drops it,
    this fails loudly instead of silently mis-accumulating.
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    max_rows = plan.maxRows()
    if max_rows.isDefined() and int(max_rows.get()) <= 1:
        return
    lines = plan.toString().splitlines()
    assert any(
        ln.lstrip(" +-:").startswith("Sort ") and "false" in ln
        for ln in lines
    ), (
        "cumsum guard: local Sort missing from the optimized plan about "
        "to be checkpointed — the running total would accumulate in "
        "unsorted order. Plan:\n" + "\n".join(lines)
    )


def global_ordered_cumsum(
    df: DataFrame,
    order_cols: Sequence[Column],
    value_col: str,
    alias: str = "cum",
    n_parts: int | None = None,
    total_alias: str | None = None,
) -> DataFrame:
    """Exact ``SUM(value) OVER (ORDER BY order_cols ROWS BETWEEN UNBOUNDED
    PRECEDING AND CURRENT ROW)`` without the single-partition global
    window an unpartitioned frame forces.

    ``order_cols`` must be a TOTAL order (unique per row) and
    ``value_col`` integral (the running total is carried as int64 —
    integer addition is associative, so the result is independent of
    batch boundaries).

    Two-phase, mirroring ``_ranged_enumerate``: ONE range shuffle +
    local sort (checkpointed so both consumers see identical partition
    boundaries), then (a) a stats pass collects only #partitions
    ``(pid, sum)`` pairs and prefix-sums them on the driver, and (b) an
    Arrow ``mapInPandas`` pass computes the within-partition running sum
    — a total carried across record batches; mapInPandas preserves row
    order within a partition — plus a broadcast join that adds each
    partition's prefix. The pid-window alternative
    (``Window.partitionBy(spark_partition_id())``) would re-shuffle the
    FULL relation a second time, because range partitioning can't be
    proven to satisfy the window's required hash clustering; here only
    the tiny (pid, offset) relation moves after the range exchange.

    ``total_alias``: the driver-side prefix-sum loop's final accumulator
    IS the corpus-wide grand total of ``value_col`` — when set, it is
    attached as a constant bigint column for free, so callers that need
    ``SUM(value) OVER ()`` (e.g. budget thresholds) never re-scan the
    input with a second aggregate. It costs nothing: the stats pass has
    already collected the per-partition sums.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    if n_parts is None:
        n_parts = _default_range_parts(df)
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .select("*", F.spark_partition_id().alias("__pid"))
    )
    _assert_local_sort_survives(parts)
    # localCheckpoint: the stats pass and the cumsum pass must see
    # IDENTICAL range boundaries (range partitioning samples), and the
    # checkpoint seals the sorted blocks so no later optimization can
    # touch the ordering mapInPandas depends on.
    parts = parts.localCheckpoint(eager=False)
    sums = {
        r["__pid"]: r["s"]
        for r in parts.groupBy("__pid")
        .agg(F.sum(F.col(value_col).cast("bigint")).alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += int(sums[pid] or 0)

    out_schema = StructType(
        list(parts.schema.fields) + [StructField("__local_cum", LongType())]
    )

    def _running(batches):
        total = 0
        for pdf in batches:
            c = pdf[value_col].astype("int64").cumsum() + total
            if len(c):
                total = int(c.iloc[-1])
            pdf["__local_cum"] = c.astype("int64")
            yield pdf

    local = parts.mapInPandas(_running, schema=out_schema)
    if not offsets:
        out = local.withColumn(alias, F.col("__local_cum")).drop(
            "__pid", "__local_cum"
        )
    else:
        off_df = df.sparkSession.createDataFrame(
            offsets, "__pid int, __off bigint"
        )
        out = (
            local.join(F.broadcast(off_df), "__pid")
            .withColumn(
                alias, (F.col("__local_cum") + F.col("__off")).cast("bigint")
            )
            .drop("__pid", "__local_cum", "__off")
        )
    if total_alias is not None:
        out = out.withColumn(total_alias, F.lit(acc).cast("bigint"))
    return out
