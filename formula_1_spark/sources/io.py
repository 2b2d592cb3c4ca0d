"""Lake IO: snapshot directories, parquet sinks, catalog helpers.

Reference equivalents: S4 (newest-snapshot scan via max modification time,
``Clean Bronze Data.py:31-35`` / ``Transform Silver Data.py:30-35``,
skipping the ``db/`` folder), S7 (overwrite parquet sink,
``Clean Bronze Data.py:280``), S8 (``saveAsTable`` + ``CREATE DATABASE``,
``Transform Silver Data.py:44-45,71-87``).
"""

from __future__ import annotations

import json
import os
import shutil
from bisect import bisect_left
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"
# Above this many distinct update keys, prune on the [min, max] range
# instead of the exact key set (the collect must stay scalar-ish).
PRUNE_KEY_CAP = 100_000


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


# ---------------------------------------------------------------------------
# File-level data skipping: per-snapshot manifest of parquet-footer stats
# ---------------------------------------------------------------------------


def _file_stats(path: str, key_col: str) -> dict:
    """Min/max/null presence for ``key_col`` straight from the parquet
    footer (no data read). ``min is None`` marks the file unprunable —
    missing stats, missing column, or a key type the manifest doesn't
    range-compare (only int/str keys prune)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    out = {"rows": md.num_rows, "min": None, "max": None, "nulls": True}
    if key_col not in names:
        return out
    j = names.index(key_col)
    mins: list = []
    maxs: list = []
    nulls = False
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(j).statistics
        if st is None or not st.has_min_max:
            return out
        if not isinstance(st.min, (int, str)) or isinstance(st.min, bool):
            return out
        mins.append(st.min)
        maxs.append(st.max)
        if st.null_count is None or st.null_count > 0:
            nulls = True
    if mins:
        out.update(min=min(mins), max=max(maxs), nulls=nulls)
    else:  # zero row groups = empty file: prunable, matches nothing
        out.update(nulls=False)
    return out


def write_manifest(snapshot_dir: str, key_cols: list[str]) -> dict:
    """Write ``_MANIFEST.json`` for a snapshot: per-file footer stats on
    the leading merge key (the underscore prefix keeps Spark's parquet
    reader from picking it up as data)."""
    files = sorted(f for f in os.listdir(snapshot_dir) if f.endswith(".parquet"))
    manifest = {
        "key_cols": list(key_cols),
        "files": {
            f: _file_stats(os.path.join(snapshot_dir, f), key_cols[0])
            for f in files
        },
    }
    tmp = os.path.join(snapshot_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(snapshot_dir, MANIFEST))
    return manifest


def read_manifest(snapshot_dir: str) -> dict | None:
    path = os.path.join(snapshot_dir, MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _update_key_profile(updates: DataFrame, key_col: str):
    """(sorted exact keys | None, over_cap, has_null) for the update
    side's leading merge key. Collects at most ``PRUNE_KEY_CAP`` scalars;
    past the cap the caller switches to the DISTRIBUTED file-hit probe
    (:func:`_touched_files_distributed`) instead of collecting anything.
    Data rows are never collected."""
    rows = (
        updates.select(F.col(key_col).alias("k"))
        .distinct()
        .limit(PRUNE_KEY_CAP + 1)
        .collect()
    )
    vals = [r.k for r in rows]
    has_null = any(v is None for v in vals)
    vals = [v for v in vals if v is not None]
    if not all(isinstance(v, (int, str)) and not isinstance(v, bool) for v in vals):
        return None, False, True  # unprunable key type: touch everything
    if len(rows) > PRUNE_KEY_CAP:
        return None, True, True
    return sorted(vals), False, has_null


def _touched_files_distributed(
    spark: SparkSession, manifest: dict, updates: DataFrame, key_col: str
) -> tuple[set, bool]:
    """(hit file names, update side has a null key) for an OVER-CAP
    update side, computed distributedly: the manifest's (file, min, max)
    ranges — O(#files), a few KB — broadcast-join against the update
    keys, and only the hit file names come back to the driver. One
    column-pruned pass over updates; the map-side partial
    ``collect_set`` caps every partition's output at #files rows.

    Exact where the classic driver-side bloom filter is approximate: a
    bloom still needs the same full pass to build, can only answer
    point-membership (so range-stats probing degenerates to testing every
    key in a file's [min, max] span), and its false positives rewrite
    files a 100 TB merge should have skipped. The broadcast range join is
    the same shuffle shape with none of those losses."""
    ranges = [
        (f, st["min"], st["max"])
        for f, st in manifest["files"].items()
        if st["min"] is not None
    ]
    profile = updates.select(F.col(key_col).alias("k"))
    if not ranges:
        row = profile.agg(F.max(F.col("k").isNull()).alias("hasnull")).collect()[0]
        return set(), bool(row.hasnull)
    rdf = spark.createDataFrame(ranges, ["fname", "lo", "hi"])
    row = (
        profile.join(
            F.broadcast(rdf),
            (F.col("k") >= F.col("lo")) & (F.col("k") <= F.col("hi")),
            "left",
        )
        .agg(
            F.collect_set("fname").alias("fs"),
            F.max(F.col("k").isNull()).alias("hasnull"),
        )
        .collect()[0]
    )
    return set(row.fs), bool(row.hasnull)


def _split_files(
    manifest: dict,
    keys: list | None,
    upd_has_null: bool,
    hits: set | None = None,
) -> tuple[list[str], list[str]]:
    """Partition a snapshot's files into (touched, untouched) against the
    update key profile — either a collected sorted-key list or a
    distributed hit set. Conservative: any doubt → touched."""
    touched, untouched = [], []
    for fname, st in manifest["files"].items():
        if st["min"] is None:
            touched.append(fname)
            continue
        if upd_has_null and st["nulls"]:
            touched.append(fname)
            continue
        try:
            if keys is not None:
                i = bisect_left(keys, st["min"])
                hit = i < len(keys) and keys[i] <= st["max"]
            else:
                hit = hits is not None and fname in hits
        except TypeError:  # update key type vs stats type mismatch
            hit = True
        (touched if hit else untouched).append(fname)
    return touched, untouched


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


class ConcurrentMergeError(RuntimeError):
    """A second writer attempted to merge into a locked target."""


class _merge_lock:
    """Exclusive-create lockfile guarding a merge target — the plain-FS
    stand-in for Delta's optimistic concurrency (two writers racing the
    ``_CURRENT`` repoint would silently drop one merge). Delta retries the
    loser; this engine surfaces the conflict for the orchestrator."""

    def __init__(self, target_path: str):
        self.path = os.path.join(target_path, "_LOCK")

    def __enter__(self):
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ConcurrentMergeError(
                f"merge target is locked by another writer: {self.path}"
            ) from None
        with os.fdopen(fd, "w") as fh:
            fh.write(f"pid={os.getpid()}\n")
        return self

    def __exit__(self, *exc):
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass
        return False


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    evolve_schema: bool = True,
) -> None:
    """Delta-style MERGE over a plain-parquet target: rows in ``updates``
    replace target rows with the same key, new keys insert, and (when
    ``delete_col`` names a boolean column) flagged rows delete.

    The reference gets this from Delta Lake's ``MERGE INTO``; that
    package isn't available here, so the engine provides the same
    semantic as copy-on-write over a snapshot directory:

    1. anti-join the current target against the update keys (survivors),
    2. union the non-deleted update rows,
    3. write a NEW snapshot directory and atomically repoint ``_CURRENT``.

    Readers resolve ``target_path/_CURRENT`` (one small text file) to the
    live snapshot — a reader never observes a half-written merge, and old
    snapshots remain for time travel (``list_snapshots``/``snapshot_at``).
    At 100 TB the rewrite cost is bounded by partition pruning: callers
    partition the target so a merge touches only the affected partitions
    (copy-on-write Delta does exactly this under the hood).

    Delta-parity hardening:

    * **Schema evolution** (``evolve_schema=True``, Delta's
      ``mergeSchema``): updates may add columns (NULL-filled on old rows)
      or widen numeric types; survivors keep columns the update lacks.
      With ``evolve_schema=False`` a drifted update raises (schema
      ENFORCEMENT, Delta's default).
    * **Concurrent-writer protection**: an exclusive ``_LOCK`` file makes
      a racing second merge fail loudly instead of silently dropping one
      writer's rows (see :class:`ConcurrentMergeError`).
    * Small-file hygiene lives in :func:`compact_current` /
      :func:`vacuum_snapshots`.
    * **File-level data skipping**: every merge snapshot carries a
      ``_MANIFEST.json`` of parquet-footer min/max stats on the leading
      key. The next merge rewrites ONLY the files whose key range
      overlaps the update keys; untouched files are hardlinked into the
      new snapshot unchanged (Delta/Iceberg copy-on-write file pruning —
      a 100-key merge into a 100 TB table rewrites a few files, not the
      table). Schema-evolving merges fall back to a full rewrite so a
      snapshot directory never mixes schemas.
    """
    from formula_1_spark.plans.evolution import union_evolving

    with _merge_lock(target_path):
        current = read_current(spark, target_path)
        upd_cols = [c for c in updates.columns if c != delete_col]
        if current is not None and sorted(current.columns) == sorted(upd_cols):
            snap_dir = current_snapshot_dir(target_path)
            manifest = read_manifest(snap_dir) if snap_dir else None
            if manifest is not None and manifest["key_cols"] == list(key_cols):
                _merge_pruned(
                    spark, target_path, snap_dir, manifest, updates,
                    key_cols, delete_col,
                )
                return
        if current is not None:
            # Null-safe key match (Delta MERGE `ON t.k <=> u.k`): an
            # equi-join would let NULL-key target rows survive forever
            # AND re-insert the matching update rows — duplicating every
            # merge. eqNullSafe treats NULL keys as equal.
            from functools import reduce

            u = updates.select(*key_cols).dropDuplicates(key_cols).alias("_u")
            cond = reduce(
                lambda a, b: a & b,
                [
                    F.col(f"_t.{k}").eqNullSafe(F.col(f"_u.{k}"))
                    for k in key_cols
                ],
            )
            survivors = current.alias("_t").join(u, cond, "left_anti")
        else:
            survivors = None
        incoming = updates
        if delete_col is not None:
            incoming = incoming.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
        incoming = incoming.select(*upd_cols)
        if survivors is None:
            merged = incoming
        elif evolve_schema:
            merged = union_evolving([survivors, incoming])
        else:
            if sorted(survivors.columns) != sorted(incoming.columns):
                raise TypeError(
                    "merge_upsert: update schema drifted from target "
                    f"(target={sorted(survivors.columns)}, "
                    f"update={sorted(incoming.columns)}); pass "
                    "evolve_schema=True to evolve"
                )
            merged = survivors.select(*upd_cols).union(incoming)

        _write_snapshot_and_repoint(merged, target_path, key_cols=key_cols)


def _merge_pruned(
    spark: SparkSession,
    target_path: str,
    snap_dir: str,
    manifest: dict,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None,
) -> None:
    """Copy-on-write merge that rewrites only key-overlapping files (see
    :func:`merge_upsert`). Caller holds the merge lock and has verified
    schema + manifest compatibility."""
    from functools import reduce

    upd_cols = [c for c in updates.columns if c != delete_col]
    keys, over_cap, has_null = _update_key_profile(updates, key_cols[0])
    if over_cap:
        hits, has_null = _touched_files_distributed(
            spark, manifest, updates, key_cols[0]
        )
        touched, untouched = _split_files(manifest, None, has_null, hits=hits)
    else:
        touched, untouched = _split_files(manifest, keys, has_null)

    incoming = updates
    if delete_col is not None:
        incoming = incoming.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    incoming = incoming.select(*upd_cols)

    if touched:
        tdf = spark.read.parquet(*[os.path.join(snap_dir, f) for f in touched])
        u = updates.select(*key_cols).dropDuplicates(key_cols).alias("_u")
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"_t.{k}").eqNullSafe(F.col(f"_u.{k}")) for k in key_cols],
        )
        survivors = tdf.alias("_t").join(u, cond, "left_anti").select(*upd_cols)
        merged = survivors.union(incoming)
    else:
        merged = incoming

    out = _new_snapshot_dir(target_path)
    merged.write.mode("overwrite").parquet(out)
    for f in untouched:
        dst = os.path.join(out, f)
        if os.path.exists(dst):  # part-name collision (practically never)
            dst = os.path.join(out, "linked-" + f)
        _link_or_copy(os.path.join(snap_dir, f), dst)
    write_manifest(out, key_cols)
    _repoint(target_path, os.path.basename(out))


def _new_snapshot_dir(target_path: str) -> str:
    # Merge snapshots need sub-second uniqueness (bronze ingest snapshots
    # keep the reference's second-resolution name; merges can land
    # back-to-back): suffix until the directory name is fresh.
    snap = snapshot_name()
    seq = 0
    while os.path.exists(os.path.join(target_path, snap)):
        seq += 1
        snap = f"{snapshot_name()}_{seq:02d}"
    return os.path.join(target_path, snap)


def _repoint(target_path: str, snap: str) -> None:
    pointer_tmp = os.path.join(target_path, "_CURRENT.tmp")
    with open(pointer_tmp, "w") as fh:
        fh.write(snap)
    os.replace(pointer_tmp, os.path.join(target_path, "_CURRENT"))


def _write_snapshot_and_repoint(
    df: DataFrame, target_path: str, key_cols: list[str] | None = None
) -> str:
    out = _new_snapshot_dir(target_path)
    df.write.mode("overwrite").parquet(out)
    if key_cols:
        write_manifest(out, key_cols)
    _repoint(target_path, os.path.basename(out))
    return os.path.basename(out)


def compact_current(
    spark: SparkSession,
    target_path: str,
    target_rows_per_file: int = 1_000_000,
) -> None:
    """Rewrite the live snapshot with right-sized files (Delta OPTIMIZE):
    every merge snapshot inherits the shuffle's file count, so a
    frequently-merged target accumulates small files that tax the scan's
    split planning at scale. Values are untouched — only file layout.
    The rewrite is itself a new snapshot + atomic repoint, so readers
    never block."""
    current = read_current(spark, target_path)
    if current is None:
        return
    snap_dir = current_snapshot_dir(target_path)
    manifest = read_manifest(snap_dir) if snap_dir else None
    n = current.count()
    files = max(1, -(-n // target_rows_per_file))
    _write_snapshot_and_repoint(
        current.repartition(files),
        target_path,
        key_cols=manifest["key_cols"] if manifest else None,
    )


def cluster_current(
    spark: SparkSession,
    target_path: str,
    n_files: int | None = None,
    target_rows_per_file: int = 1_000_000,
) -> None:
    """Rewrite the live snapshot range-clustered on the merge key (Delta
    ``OPTIMIZE ZORDER BY (key)`` for the single-key case): files get
    DISJOINT key ranges, so the manifest's min/max stats prune maximally
    — after clustering, a point merge rewrites exactly one file. Run it
    like compaction: periodically, after merge churn has interleaved key
    ranges across files. Values untouched; atomic repoint as always."""
    manifest_dir = current_snapshot_dir(target_path)
    manifest = read_manifest(manifest_dir) if manifest_dir else None
    if manifest is None:
        raise ValueError(
            f"cluster_current needs a manifest (merge key) at {target_path}"
        )
    current = read_current(spark, target_path)
    key = manifest["key_cols"][0]
    if n_files is None:
        n = current.count()
        n_files = max(1, -(-n // target_rows_per_file))
    clustered = current.repartitionByRange(n_files, F.col(key)).sortWithinPartitions(key)
    _write_snapshot_and_repoint(clustered, target_path, key_cols=manifest["key_cols"])


def vacuum_snapshots(target_path: str, keep_last: int = 2) -> list[str]:
    """Delete all but the newest ``keep_last`` snapshot directories
    (Delta VACUUM), never the one ``_CURRENT`` points at. Returns removed
    paths. Bounds time-travel retention the same way Delta's retention
    window does."""
    import shutil

    pointer = os.path.join(target_path, "_CURRENT")
    live = None
    if os.path.exists(pointer):
        with open(pointer) as fh:
            live = fh.read().strip()
    snaps = list_snapshots(target_path)
    keep = set(snaps[-keep_last:]) if keep_last > 0 else set()
    if live is not None:
        keep.add(os.path.join(target_path, live))
    removed = []
    for s in snaps:
        if s not in keep:
            shutil.rmtree(s)
            removed.append(s)
    return removed


def current_snapshot_dir(target_path: str) -> str | None:
    """Path of the live snapshot directory (via ``_CURRENT``), or None."""
    pointer = os.path.join(target_path, "_CURRENT")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        return os.path.join(target_path, fh.read().strip())


def read_current(spark: SparkSession, target_path: str) -> DataFrame | None:
    """Resolve a merge target's live snapshot via its ``_CURRENT``
    pointer; None when the target doesn't exist yet."""
    snap_dir = current_snapshot_dir(target_path)
    if snap_dir is None:
        return None
    return spark.read.parquet(snap_dir)
