"""Schema-enforced CSV source with PERMISSIVE corrupt-record quarantine.

Source-format breadth beyond parquet/JSON: messy delimited feeds are the
other thing every real lake ingests. The fixture is a deterministic
function of the ``orders`` table — rows with ``o_orderkey % 7 == 3`` are
written MALFORMED (price field ``N/A``) — so the DuckDB
oracle never parses CSV at all: it recomputes the expected valid/corrupt
split and aggregates straight from ``orders``, proving Spark's CSV
reader + explicit schema + ``columnNameOfCorruptRecord`` capture
semantics against an independent definition.

Scale notes: the CSV scan is splittable (no multiline), schema is
explicit (no inference pass over 100 TB), and the quarantine split is
one pass — ``count_if`` over the corrupt marker, no second read.
Cache layout follows ``sources/fixtures.py`` (fingerprinted, atomic
publish), so a driver testdata regeneration can never serve stale pages.

Reference scope note: the reference ingests via REST-JSON only
(SURVEY.md §2.1); CSV is extension surface.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish

_N_FILES = 8  # parallel splits even before splittable-scan chunking


def _csv_fixture(spark: SparkSession, sf_dir: str) -> str:
    root = fixture_root("csv_feed_fixture_v1", sf_dir, "orders")
    if os.path.isdir(root):
        return root
    scratch = building_dir(root)
    os.makedirs(scratch, exist_ok=True)
    # Distributed fixture build: the mangled lines are rendered and
    # written by executors (``df.write.text``) — the orders table is
    # never collect()ed to the driver, so this scales with the table.
    # Malformed rows get a non-numeric price ('N/A'): an unparseable
    # typed field is what trips PERMISSIVE corrupt capture; a short row
    # would merely null-pad. No field needs CSV quoting (ints, a
    # comma-free enum, a numeric string).
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    price = (
        F.when(F.col("o_orderkey") % 7 == 3, F.lit("N/A"))
        .otherwise(F.col("o_totalprice").cast("string"))
    )
    lines = orders.select(
        F.concat_ws(
            ",",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderpriority"),
            price,
        ).alias("value")
    )
    spark_dir = os.path.join(scratch, "_spark_text")
    lines.repartition(_N_FILES).write.mode("overwrite").text(spark_dir)
    # Driver-side pass: rename each part file into place and prepend the
    # header every file needs under header=true multi-file reads. Streamed
    # copy — O(1) memory regardless of table size.
    header = "o_orderkey,o_custkey,o_orderpriority,o_totalprice\n"
    parts = sorted(
        p
        for p in os.listdir(spark_dir)
        if p.startswith("part-") and not p.endswith(".crc")
    )
    for i, p in enumerate(parts):
        with open(os.path.join(scratch, f"part-{i:02d}.csv"), "w", newline="") as out:
            out.write(header)
            with open(os.path.join(spark_dir, p)) as src:
                shutil.copyfileobj(src, out)
    shutil.rmtree(spark_dir)
    publish(scratch, root)
    return root


_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderpriority", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


@register(
    "csv_quarantine_source",
    ops="EXT-csv-source,S6-analog,P7,A5 (PERMISSIVE corrupt capture)",
    doc="Schema-enforced CSV ingest with PERMISSIVE quarantine: the "
    "fixture feed deterministically mangles orders with key%7==3 "
    "(price 'N/A', dropped column), Spark reads with an explicit schema "
    "and columnNameOfCorruptRecord, and the per-priority rollup counts "
    "valid vs quarantined rows in ONE pass. Rows whose price fails the "
    "double parse carry the raw line in the corrupt column and roll up "
    "under the '_quarantined' bucket; the oracle recomputes the same split "
    "directly from orders without touching CSV — Spark's parser "
    "semantics are checked against an independent definition, not "
    "against another CSV parser.",
    oracle="""
SELECT CASE WHEN o_orderkey % 7 = 3 THEN '_quarantined'
            ELSE o_orderpriority END AS priority_bucket,
       CAST(COUNT(1) AS BIGINT) AS n_rows,
       CAST(COUNT(CASE WHEN o_orderkey % 7 = 3 THEN 1 END) AS BIGINT)
         AS n_corrupt,
       CAST(SUM(CASE WHEN o_orderkey % 7 <> 3
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS valid_total
FROM orders
GROUP BY 1
""",
)
def csv_quarantine_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _csv_fixture(spark, sf_dir)
    raw = (
        spark.read.schema(_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(root)
    )
    bucket = F.when(
        F.col("_corrupt").isNotNull(), F.lit("_quarantined")
    ).otherwise(F.col("o_orderpriority"))
    return (
        raw.groupBy(bucket.alias("priority_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("_corrupt").isNotNull(), 1)).alias("n_corrupt"),
            F.sum(
                F.when(
                    F.col("_corrupt").isNull(),
                    F.col("o_totalprice").cast("decimal(18,2)"),
                )
            )
            .cast("double")
            .alias("valid_total"),
        )
    )
