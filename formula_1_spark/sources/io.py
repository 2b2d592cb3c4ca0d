"""Lake IO: snapshot directories, parquet sinks, catalog helpers.

Reference equivalents: S4 (newest-snapshot scan via max modification time,
``Clean Bronze Data.py:31-35`` / ``Transform Silver Data.py:30-35``,
skipping the ``db/`` folder), S7 (overwrite parquet sink,
``Clean Bronze Data.py:280``), S8 (``saveAsTable`` + ``CREATE DATABASE``,
``Transform Silver Data.py:44-45,71-87``).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


def snapshot_name(ts: datetime | None = None) -> str:
    """Snapshot directory name ``yyyyMMdd_HHmmss`` (reference
    ``Data Factory/pipeline/00 - Master.json:199``)."""
    ts = ts or datetime.now(timezone.utc)
    return ts.strftime("%Y%m%d_%H%M%S")


def latest_snapshot(root: str, skip: tuple[str, ...] = ("db",)) -> str:
    """Resolve the newest snapshot dir under ``root`` by modification time
    (ties broken by name, newest-last, so re-runs are deterministic)."""
    candidates = [
        e
        for e in os.scandir(root)
        if e.is_dir() and e.name not in skip
    ]
    if not candidates:
        raise FileNotFoundError(f"no snapshot directories under {root}")
    best = max(candidates, key=lambda e: (e.stat().st_mtime, e.name))
    return best.path


def list_snapshots(root: str, skip: tuple[str, ...] = ("db",)) -> list[str]:
    """All snapshot dirs oldest→newest (mtime, then name). The poor man's
    time travel over the reference's snapshot-overwrite layout: pair with
    :func:`snapshot_at` to query any historical ingest state."""
    entries = [e for e in os.scandir(root) if e.is_dir() and e.name not in skip]
    return [e.path for e in sorted(entries, key=lambda e: (e.stat().st_mtime, e.name))]


def snapshot_at(root: str, version: int, skip: tuple[str, ...] = ("db",)) -> str:
    """Snapshot path by version index: 0 = oldest, -1 = newest (Delta-style
    ``versionAsOf`` over plain snapshot directories)."""
    snaps = list_snapshots(root, skip)
    if not snaps:
        raise FileNotFoundError(f"no snapshot directories under {root}")
    return snaps[version]


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S7: overwrite parquet sink. ``partition_by`` enables partition
    pruning downstream — the scale-out upgrade over the reference's flat
    directories (pass e.g. ``['year']`` for the race tables)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table for shuffle-free co-located joins: two
    tables bucketed identically on their join key hash-partition on disk,
    so a join between them needs NO exchange (SortMergeJoin reads
    co-located buckets directly). This is the at-rest answer to repeated
    100 TB fact-fact joins — pay the shuffle once at write time."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def ensure_database(spark: SparkSession, name: str, location: str | None = None) -> None:
    """S8: ``CREATE DATABASE IF NOT EXISTS`` (optionally with LOCATION)."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}{loc}")


def save_as_table(df: DataFrame, table: str, fmt: str = "parquet") -> None:
    """S8: managed-table overwrite sink."""
    df.write.mode("overwrite").format(fmt).saveAsTable(table)
