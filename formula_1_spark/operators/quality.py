"""Data-quality expectations (declarative row-level constraints).

The lakehouse pattern (Delta Live Tables-style) re-expressed as plain
DataFrame algebra: a pipeline declares named boolean expectations over a
relation; the engine splits rows into a clean stream and a quarantine
stream and reports per-rule violation statistics — all without a Python
UDF and without scanning the data once per rule.

Reference scope note: the reference repo (uwe-uffuchs/formula-1) has no
data-quality layer (bad rows flow straight into silver — SURVEY.md §2.12
quirks); this is part of the pipeline-extension surface the engine adds.

100 TB design:

* ``expectation_stats`` is ONE aggregation pass: every rule becomes a
  conditional-sum column in a single ``agg`` (map-side partial sums, no
  shuffle of data rows — the shuffle carries one partial row per task).
  The per-rule long format comes from unpivoting the 1-row aggregate,
  never from per-rule scans.
* ``enforce`` produces both streams off one scan; each output is a plain
  ``filter`` over the conjunction of drop-rules, so Catalyst pushes the
  predicates into the parquet reader for the clean stream.
* Violation rates are emitted on an exact integer ppm grid (BIGINT
  ``DIV``), never as a float ratio — cross-engine hash-stable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DROP = "drop"  # violating rows are quarantined
WARN = "warn"  # violating rows pass through; violations only counted


@dataclass(frozen=True)
class Expectation:
    """A named row-level constraint. ``predicate`` is True for GOOD rows."""

    name: str
    predicate: Column
    action: str = DROP


def _violated(e: Expectation) -> Column:
    # NULL predicate results count as violations (SQL three-valued logic
    # would silently pass them through a bare NOT filter).
    return ~F.coalesce(e.predicate, F.lit(False))


def expectation_stats(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """(rule_name, action, n_rows, n_violations, violation_ppm) — one row
    per rule, computed in a single aggregation pass over ``df``."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(_violated(e).cast("bigint")).alias(f"__v{i}")
        for i, e in enumerate(expectations)
    ]
    one = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("rule_name"),
                F.lit(e.action).alias("action"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v{i}").alias("n_violations"),
                # Exact integer ppm (BIGINT floor-div) — hash-stable.
                F.expr(f"(__v{i} * 1000000) DIV __n").alias("violation_ppm"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return one.select(F.explode(per_rule).alias("r")).select("r.*")


def enforce(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, quarantine) on the DROP-action rules.

    Clean = every drop-rule passes (warn rules never drop). Quarantine
    rows carry a ``failed_rules`` array naming each violated drop-rule.
    Both outputs are single filters over the same scan — no row is
    evaluated against the rule set more than once per output.
    """
    drops = [e for e in expectations if e.action == DROP]
    if not drops:
        return df, df.limit(0).withColumn(
            "failed_rules", F.array().cast("array<string>")
        )
    good = F.coalesce(drops[0].predicate, F.lit(False))
    for e in drops[1:]:
        good = good & F.coalesce(e.predicate, F.lit(False))
    failed = F.filter(
        F.array(
            *[F.when(_violated(e), F.lit(e.name)).otherwise(F.lit(None)) for e in drops]
        ),
        lambda x: x.isNotNull(),
    )
    clean = df.filter(good)
    quarantine = df.filter(~good).withColumn("failed_rules", failed)
    return clean, quarantine
