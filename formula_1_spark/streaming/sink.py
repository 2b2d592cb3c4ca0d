"""Streaming medallion sink: land a stream into partitioned parquet via
``foreachBatch`` (the streaming upgrade of the reference's
snapshot-overwrite bronze, SURVEY §1.1).

``foreachBatch`` gives each micro-batch a plain batch DataFrame, so the
whole batch toolchain (specs, dedup, windowing) applies unchanged;
append-mode parquet with partition columns keeps downstream scans
partition-prunable. Checkpointing makes delivery exactly-once per batch
(batch id fencing) — the durable-lake answer at 100 TB/day.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_to_parquet_lake(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
):
    """Start an append stream into a parquet lake dir. ``transform`` is
    applied per micro-batch (batch semantics). Returns StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        writer = out.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def with_event_date(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Standard partition column derivation (event date) for lake layout."""
    return df.withColumn("event_date", F.to_date(F.col(ts_col)))


def stream_merge_into(
    stream: DataFrame,
    target_path: str,
    checkpoint: str,
    key_cols: list[str],
    seq_col: str | None = None,
    delete_col: str | None = None,
):
    """Streaming CDC upsert: MERGE each micro-batch into a snapshot-
    pointer merge target (the ``foreachBatch`` + ``MERGE INTO`` pattern
    Delta pipelines use for silver upserts, expressed over this engine's
    parquet-native :func:`~formula_1_spark.sources.io.merge_upsert`).

    * ``seq_col``: CDC ordering column — when a micro-batch carries
      several changes for one key, only the max-``seq_col`` row merges
      (give each key a unique sequence per batch; ties break arbitrarily).
    * ``delete_col``: boolean tombstone column, forwarded to the merge.
    * Exactly-once: the checkpoint fences batch replay at the source, and
      a replayed merge of the same batch is idempotent (same keys, same
      values — verified by the merge tests), so crash-recovery converges
      to the same table state.
    * Scale: each micro-batch merge is file-pruned by the target's
      manifest, so steady-state CDC cost tracks the touched key range,
      not the table size.

    Returns the StreamingQuery.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from formula_1_spark.sources.io import merge_upsert

        upd = batch_df
        if seq_col is not None:
            from pyspark.sql.window import Window

            w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
            upd = (
                upd.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", seq_col)
            )
        if not upd.isEmpty():
            merge_upsert(
                batch_df.sparkSession, target_path, upd, key_cols,
                delete_col=delete_col,
            )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
