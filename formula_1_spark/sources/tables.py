"""Parquet table sources over the driver testdata star schema.

Reference equivalents: S6 (parquet source, ``Transform Silver
Data.py:47-49,54-65``) and the temp-view registration that backs the SQL
half (``Transform Silver Data.py:79-87``). Scans stay lazy; Catalyst gets
column pruning + predicate pushdown into the parquet reader for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily scan one parquet table from a scale-factor directory.

    Handles parquet TIMESTAMP(NANOS) columns (e.g. ``events.ts``), which
    Spark's reader rejects by default: retries with
    ``spark.sql.legacy.parquet.nanosAsLong`` and converts the nano-epoch
    long back to a proper TimestampType (micros — the generator only has
    microsecond precision, so the truncation is lossless).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        df = spark.read.parquet(path)
    except Exception as e:  # AnalysisException: PARQUET_TYPE_ILLEGAL
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    # Once nanosAsLong is on (session-wide), every later read lands ts as a
    # nano-epoch BIGINT — normalize back to TimestampType on either path.
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # Integer DIV — a double division here rounds at 1e15-magnitude
            # epoch-nanos and shifts some timestamps by 1 us.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            # Generator writes naive timestamp[us]; Spark infers
            # TIMESTAMP_NTZ, which part of the timestamp function surface
            # (unix_micros, ...) rejects. The session timezone is pinned
            # UTC, so casting to TIMESTAMP preserves the wall-clock value
            # and matches the DuckDB oracle's naive semantics exactly.
            # Date-like columns (o_orderdate, l_shipdate, ...) stay NTZ:
            # they are only compared against literals — which NTZ handles —
            # and an uncast column keeps parquet predicate pushdown.
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the scan under-parallelizes.

    Small single-file tables (sf0.1 ``documents``/``embeddings`` are one
    parquet file) arrive as ONE partition, serializing all downstream
    per-row expression work (shingling, hashing, normalization) onto a
    single core. At 100 TB the same tables are thousands of splits and the
    repartition is a no-op by the guard below — this never adds a shuffle
    to an already-parallel scan.

    The guard is METADATA-ONLY: it reads the plan's leaf file listing
    (``df.inputFiles()`` — served from the already-built file index, no
    plan-to-RDD conversion) and replays Spark's FilePartition split math
    on the file sizes. The old ``df.rdd.getNumPartitions()`` probe forced
    a full plan conversion per call — cheap locally, an avoidable
    per-query driver cost at cluster scale.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if probe_partitions(df) >= target:
        return df
    return df.repartition(target)


def probe_partitions(df: DataFrame) -> int:
    """Estimate a plan's scan partition count from METADATA ONLY.

    Reads the plan's leaf file listing (``df.inputFiles()`` — served from
    the already-built file index, no plan-to-RDD conversion) and replays
    Spark's FilePartition split math on the file sizes. Spark bin-packs
    small files into shared FilePartitions, so a raw ``len(files)``
    shortcut over-counts (many tiny files can collapse into far fewer scan
    partitions); always replay the packing. Spark sizes splits from
    spark.sql.files.minPartitionNum (default: leaf-node default
    parallelism == defaultParallelism locally) — NOT from any caller
    target — so that is what the replay uses. Non-file-backed plans
    (in-memory relation, stream) fall back to the exact-but-costly
    ``df.rdd.getNumPartitions()`` probe rather than guessing — rare here;
    every registry caller wraps a parquet scan.
    """
    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        return df.rdd.getNumPartitions()
    packing_parallelism = int(
        _conf_bytes(spark, "spark.sql.files.minPartitionNum", 0)
        or spark.sparkContext.defaultParallelism
    )
    return _estimated_scan_partitions(spark, files, packing_parallelism)


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """Parse a Spark byte-size conf (``128m``, ``1gb``, ``512kb``, bare
    int). Two-letter suffixes must match before single letters — ``128mb``
    ends in ``b`` too. Unparseable values fall back to the default rather
    than crashing every scan-sizing call."""
    raw = spark.conf.get(key, None)
    if raw is None:
        return default
    raw = str(raw).strip().lower()
    try:
        for suffix, mult in (
            ("kb", 1 << 10),
            ("mb", 1 << 20),
            ("gb", 1 << 30),
            ("tb", 1 << 40),
            ("k", 1 << 10),
            ("m", 1 << 20),
            ("g", 1 << 30),
            ("t", 1 << 40),
            ("b", 1),
        ):
            if raw.endswith(suffix):
                return int(float(raw[: -len(suffix)]) * mult)
        return int(raw)
    except ValueError:
        return default


def _estimated_scan_partitions(
    spark: SparkSession, files: list[str], parallelism: int
) -> int:
    """Replay Spark's FilePartition packing from file metadata only.

    maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    (totalBytes + nFiles * openCost) / parallelism)); each file is cut
    into splits of at most maxSplitBytes (parquet is splittable), then
    splits are greedily packed descending-by-size into partitions of at
    most maxSplitBytes, each split costing its length + openCost — the
    same math as ``FilePartition.getFilePartitions``. Files whose size
    can't be stat'd locally (remote FS) are assumed to be exactly one
    zero-byte split — the conservative direction: underestimating
    partitions can only trigger a redundant repartition, never leave a
    scan serialized.
    """
    max_partition_bytes = _conf_bytes(
        spark, "spark.sql.files.maxPartitionBytes", 128 << 20
    )
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    sizes: list[int] = []
    for uri in files:
        local = uri[7:] if uri.startswith("file://") else uri
        try:
            sizes.append(os.stat(local).st_size)
        except OSError:
            sizes.append(0)  # unknown size => 1 zero-byte split below
    total = sum(s + open_cost for s in sizes)
    bytes_per_core = total // max(parallelism, 1)
    max_split = min(max_partition_bytes, max(open_cost, bytes_per_core))
    splits: list[int] = []
    for s in sizes:
        while s > max_split:
            splits.append(max_split)
            s -= max_split
        splits.append(s)
    splits.sort(reverse=True)
    partitions, current = 0, None
    for length in splits:
        if current is None or current + length > max_split:
            partitions += 1
            current = 0
        current += length + open_cost
    return partitions


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None, register: bool = True
) -> dict[str, DataFrame]:
    """Load tables (lazy scans) and optionally register them as temp views
    so both DataFrame and ``spark.sql`` query forms bind to the same data.
    """
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


# Base-table row counts, memoized per (resolved path, mtime, size) so a
# regenerated testdata directory invalidates naturally. Row counts come
# straight from parquet footers (pyarrow metadata read) — no Spark job, no
# data scan. Several operators size themselves from N (quantized IDF,
# corpus-scaled LSH banding, AQE skew thresholds); before this memo each
# such query paid an eager ``df.count()`` action per invocation — a full
# file-listing + footer sweep that at 100 TB is millions of driver RPCs
# repeated per query. Now it is one footer sweep per table per process.
_ROW_COUNT_MEMO: dict[tuple, int] = {}


def table_row_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count of a base table from parquet footer metadata."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        key = (os.path.abspath(path), int(st.st_mtime_ns), st.st_size)
    except OSError:
        # No local stat (remote filesystem path): there is no cheap
        # invalidation signal, so do NOT memoize — a stale cached N would
        # silently mis-size IDF quantization / LSH banding / AQE
        # thresholds after the remote table is regenerated.
        return _parquet_num_rows(spark, path)
    if key not in _ROW_COUNT_MEMO:
        _ROW_COUNT_MEMO[key] = _parquet_num_rows(spark, path)
    return _ROW_COUNT_MEMO[key]


def _parquet_num_rows(spark: SparkSession, path: str) -> int:
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.read_metadata(os.path.join(root, f)).num_rows
            return total
        return pq.read_metadata(path).num_rows
    except Exception:
        # Remote filesystems pyarrow can't reach locally: fall back to a
        # Spark metadata-only count (still footer-driven for parquet).
        return spark.read.parquet(path).count()
