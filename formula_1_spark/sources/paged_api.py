"""Custom Python DataSource (Spark 4 DataSource API): a paged-JSON "API"
read as a first-class, partition-parallel Spark source.

The reference ingests its upstream REST API with a sequential page loop
(S1 — the ADF Until-loop in `Data Factory/pipeline/01 - Stage Full
Datasets.json:146-330` crawls `?limit=&offset=` pages one HTTP call at a
time, then drops files for Spark to scan; the engine's driver-side
`sources/ingest.py` mirrors that). This source moves
the crawl INTO the scan: `partitions()` enumerates page units and each
Spark task fetches + parses its own pages, so a 1000-executor cluster
crawls 1000-wide and the rows land directly in the DataFrame — no
intermediate landing files, no driver bottleneck.

Locally the "API" is a directory of JSONL page files (exactly what the
reference's crawler persists); swapping `_read_page` for an HTTP GET
with retry/backoff is the production path and changes nothing about the
planning. The reader yields plain tuples; for wide rows the same API
accepts pyarrow RecordBatches (Arrow-batched transfer) — unnecessary for
this narrow schema.

Usage::

    spark.dataSource.register(PagedJsonApiSource)
    df = (spark.read.format("paged_json_api")
          .option("path", pages_dir)
          .option("schema_ddl", "k BIGINT, v STRING")
          .option("pages_per_partition", "2")
          .load())
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _PageChunk(InputPartition):
    """One task's worth of page files (picklable)."""

    def __init__(self, files: list[str]):
        self.files = files


class PagedJsonApiSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_json_api"

    def schema(self) -> str:
        # DDL string; the engine parses it to the StructType handed to
        # the reader. An API with a discovery endpoint would fetch one
        # page here and infer instead.
        return self.options["schema_ddl"]

    def reader(self, schema) -> DataSourceReader:
        return _PagedJsonApiReader(schema, self.options)

    def writer(self, schema, overwrite: bool):
        if not overwrite:
            # Append would have to renumber after the existing max page
            # index and could still leave a stale old/new page mix; the
            # sink's contract is whole-dataset page publication, so
            # reject append outright rather than clobber silently.
            raise ValueError(
                "paged_json_api sink supports mode('overwrite') only"
            )
        return _PagedJsonApiWriter(schema, self.options, overwrite)


class _PagedJsonApiReader(DataSourceReader):
    def __init__(self, schema, options):
        self._schema = schema
        self._path = options["path"]
        self._per_part = int(options.get("pages_per_partition", "1"))

    def _page_files(self) -> list[str]:
        # Pages live as <path>/page=*/<part>.json (Spark layout) or flat
        # <path>/*.json; sorted for deterministic partition assignment.
        nested = glob.glob(os.path.join(self._path, "page=*", "*.json"))
        flat = glob.glob(os.path.join(self._path, "*.json"))
        return sorted(nested or flat)

    def partitions(self) -> list[InputPartition]:
        files = self._page_files()
        if not files:
            raise FileNotFoundError(f"no page files under {self._path}")
        return [
            _PageChunk(files[i : i + self._per_part])
            for i in range(0, len(files), self._per_part)
        ]

    def read(self, partition: _PageChunk):
        # Arrow fast path: parse each page into ONE RecordBatch and hand
        # it to the JVM wholesale (the DataSource API accepts pyarrow
        # batches) — an order of magnitude less per-row Python/pickle
        # overhead than tuple-at-a-time yield. The schema conversion is
        # probed ONCE up front (on an empty batch) so ANY conversion
        # failure — missing pyarrow, a field type to_arrow_schema or
        # RecordBatch can't represent — selects the tuple path before
        # the first row is yielded; the per-file loop is single-path and
        # can never emit a page twice.
        arrow_schema = None
        try:
            import pyarrow as pa

            from pyspark.sql.pandas.types import to_arrow_schema

            arrow_schema = to_arrow_schema(self._schema)
            pa.RecordBatch.from_pylist([], schema=arrow_schema)
        except Exception:
            arrow_schema = None
        if arrow_schema is not None:
            for path in partition.files:
                records = list(self._read_page(path))
                yield pa.RecordBatch.from_pylist(records, schema=arrow_schema)
        else:
            names = [f.name for f in self._schema.fields]
            for path in partition.files:
                for rec in self._read_page(path):
                    yield tuple(rec.get(n) for n in names)

    @staticmethod
    def _read_page(path: str):
        """One page fetch: local JSONL file stand-in for an HTTP GET."""
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    yield json.loads(line)


# ---------------------------------------------------------------------------
# Writer side: the same "API" as a first-class Spark SINK (Spark 4
# DataSourceWriter) with a two-phase commit — each task stages its page
# under a temp name and returns a commit message; the driver's commit()
# renames every staged page into place, abort() deletes them. A failed
# task can therefore never leave a half-published page visible to the
# reader above.
# ---------------------------------------------------------------------------


class _PageCommit(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


class _PagedJsonApiWriter(DataSourceWriter):
    def __init__(self, schema, options, overwrite: bool):
        self._names = [f.name for f in schema.fields]
        self._path = options["path"]
        self._overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        # Stage under <path>/_staging/ — OUTSIDE the reader's flat
        # '<path>/*.json' glob, so a task that dies after writing its
        # staged file (its commit message never reaches the driver, so
        # commit/abort can't clean it) still can never publish a
        # half-written page to the reader.
        staging = os.path.join(self._path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"{pid}-{os.getpid()}.json")
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self._names, row))) + "\n")
                n += 1
        return _PageCommit(staged, n)

    def commit(self, messages):
        if self._overwrite:
            for old in glob.glob(os.path.join(self._path, "page-*.json")):
                os.remove(old)
        for i, m in enumerate(sorted(
            (m for m in messages if m is not None), key=lambda m: m.staged
        )):
            os.replace(m.staged, os.path.join(self._path, f"page-{i:05d}.json"))
        self._sweep_staging()

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        self._sweep_staging()

    def _sweep_staging(self):
        """Drop orphaned staged files (task retried/died after staging but
        before its commit message was collected) and the staging dir."""
        staging = os.path.join(self._path, "_staging")
        for leftover in glob.glob(os.path.join(staging, "*.json")):
            try:
                os.remove(leftover)
            except OSError:
                pass
        try:
            os.rmdir(staging)
        except OSError:
            pass
