"""Arbitrary stateful streaming through the driver gate.

``stateful_user_totals_stream`` runs a REAL ``applyInPandasWithState``
stream once per fixture build: events re-served as a multi-batch file
stream (maxFilesPerTrigger=2 over 8 files, so per-user state must
survive and accumulate across micro-batches), drained with the
available-now trigger into an update-mode memory sink, reduced to each
user's final state (counts are strictly increasing per user, so the
max-count row IS the final state), and persisted. The registered query
reads that result; the oracle computes the same totals from the events
table directly — a state-loss, double-count, or cross-batch ordering
bug reds the driver row.

The accumulator sums integer cents (``floor(value*100)``), not floats:
integer addition is associative, so the final state is independent of
how the file source batches rows — which is exactly what makes a
STREAMING result oracle-checkable bit-for-bit against batch SQL.

Reference scope note: the reference has no streaming surface
(SURVEY.md §2.9 lists streaming as an engine extension);
``applyInPandasWithState`` is the Spark escape hatch for stateful
semantics the built-in windows can't express.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import building_dir, fixture_root, publish
from formula_1_spark.sources.tables import load_table
from formula_1_spark.streaming.stateful import running_user_totals_exact


def _stateful_totals_fixture(spark: SparkSession, sf_dir: str) -> str:
    root = fixture_root("stateful_totals_v1", sf_dir, "events")
    result = os.path.join(root, "result")
    if os.path.isdir(result):
        return result
    scratch = building_dir(root)
    os.makedirs(scratch, exist_ok=True)
    src = os.path.join(scratch, "src")
    events = load_table(spark, sf_dir, "events").select("user_id", "value")
    events.repartition(8).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("user_id BIGINT, value DOUBLE")
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    name = f"stateful_totals_{os.getpid()}"
    q = (
        running_user_totals_exact(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        # Undrained stream => partial state. Publishing it would poison
        # the fixture forever (the isdir guard serves it on every later
        # call); stop and fail instead.
        q.stop()
        raise RuntimeError(
            "availableNow stream did not drain within 300s; "
            "refusing to publish a partial-state fixture"
        )
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("value_cents", "n_events").alias("value_cents"),
        )
    )
    final.write.mode("overwrite").parquet(os.path.join(scratch, "result"))
    publish(scratch, root)
    return result


@register(
    "stateful_user_totals_stream",
    ops="STREAM-stateful,UDF-pandas (applyInPandasWithState E2E)",
    doc="applyInPandasWithState E2E through the gate: per-user (count, "
    "integer-cents) state accumulated across 4 forced micro-batches of "
    "a file stream, update-mode emissions reduced to the final state "
    "per user. Oracle recomputes the totals from events in batch SQL — "
    "the streaming state machine must agree with batch bit-for-bit.",
    oracle="""
SELECT user_id,
       CAST(COUNT(1) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY user_id
""",
)
def stateful_user_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    result = _stateful_totals_fixture(spark, sf_dir)
    return spark.read.parquet(result)
