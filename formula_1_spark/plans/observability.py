"""Pipeline observability: audit metrics collected DURING a job via
``df.observe`` — the engine-native way to know what a write actually did
without paying a second scan to count it.

At 100 TB the difference is structural: a post-write recount re-reads
the output (hours); an Observation rides the write job's existing pass,
aggregating metrics executor-side with map-side partials and shipping
one tiny struct to the driver. This is how production pipelines emit
row counts, null rates, and expectation violations per batch.

Composes with ``operators/quality``: the same Expectation predicates
become observed violation counters, so a lakehouse write can enforce
drop-rules (filter) AND report warn-rule drift (observe) in one pass.

Reference scope note: the reference has no job-metric surface (its
notebooks write blind); extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from formula_1_spark.operators.quality import Expectation, _violated


def expectation_metrics(expectations: list[Expectation]) -> list[Column]:
    """Observed columns for a rule set: total rows + one violation count
    per rule (aliased ``viol_<rule>``)."""
    return [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(_violated(e).cast("bigint")).alias(f"viol_{e.name}")
        for e in expectations
    ]


def write_parquet_audited(
    df: DataFrame,
    path: str,
    expectations: list[Expectation] | None = None,
    extra_metrics: list[Column] | None = None,
) -> dict:
    """Write ``df`` as parquet and return the audit metrics gathered
    during that same write job (no second scan): row count, per-rule
    violation counts, plus any caller-supplied aggregate columns.

    Observed metrics must be single-pass aggregates — Spark rejects
    DISTINCT expressions here; use ``approx_count_distinct`` (HLL) for
    observed cardinalities, exactly as a 100 TB pipeline would.
    """
    metrics = expectation_metrics(expectations or [])
    if extra_metrics:
        metrics = metrics + list(extra_metrics)
    obs = Observation()
    df.observe(obs, *metrics).write.mode("overwrite").parquet(path)
    return dict(obs.get)
