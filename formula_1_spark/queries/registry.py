"""Central query registry backing the driver contract.

Every implemented operator from SURVEY.md §2 (and every extension) is
exposed as a named query: a ``(spark, sf_dir) -> DataFrame`` callable plus,
where SQL-expressible, an equivalent ANSI SQL string the DuckDB oracle runs
on the same parquet tables. ``__spark_entry__.py`` re-exports this registry.

Determinism rules every query follows (so the driver's order-insensitive
value-hash comparison is stable across engines):

* alias every computed column identically in Spark and SQL;
* rank/order on exactly-representable values (integral doubles, ints) or
  rounded aggregates — never on raw float sums whose last ulp differs by
  accumulation order;
* cast oracle-side types to Spark's result types (DuckDB ``sum(int)`` is
  HUGEINT, ``rank()``/``year()`` are BIGINT; Spark uses BIGINT/INT);
* emit timestamps as formatted strings to dodge timezone/representation
  drift.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    ops: str = ""  # SURVEY.md §2 operator ids covered
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, ops: str = "", doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, ops=ops, doc=doc)
        return fn

    return deco


# The correctness driver snapshots the FIRST 50 registry entries in
# iteration order each round. Round 6 pins the full 50-slot window
# explicitly: the 32 round-5 additions — the only queries that have never
# had a driver CORRECTNESS row (they registered behind the round-5 window
# per the growth protocol; all are locally bit-exact via
# tests/test_oracle_parity.py) — come first. After this round, cumulative
# driver coverage is 203/203 on the pre-round-6 registry. The remaining 18
# slots re-check the STALEST greens (last green in r02) as a regression
# watch. New round-6+ queries register BEHIND this pinned window. Names
# absent from REGISTRY are skipped; registered names absent from this list
# keep registration order after it.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked (all 32 round-5 additions) ---
    "ivf_incremental_assign",
    "dedup_incremental_compaction",
    "dedup_cluster_canonical_quality",
    "cluster_aware_split",
    "pmi_collocations_topk",
    "bloom_decontam_audit",
    "rrf_rank_fusion",
    "events_rolling_median",
    "ngram_lm_surprisal",
    "url_dedup_canonical",
    "segment_dedup_retention",
    "token_budget_selection",
    "kanonymity_audit",
    "source_ablation_impact",
    "scd2_customer_priority",
    "stream_dedup_watermark",
    "code_switch_audit",
    "split_ngram_coverage",
    "boilerplate_phrase_filter",
    "source_quality_calibration",
    "winnow_fingerprint_dedup",
    "tokenizer_fertility_audit",
    "zipf_rank_doubling",
    "oov_rate_audit",
    "event_attribution_first_last",
    "ldiversity_audit",
    "proportional_allocation_plan",
    "small_cell_suppression",
    "vocab_coverage_curve",
    "kappa_lang_agreement",
    "orders_priority_chisq_drift",
    "user_contribution_bounds",
    # --- regression re-checks: stalest driver greens (last green r02) ---
    "events_stream_static_enrich",
    "timeseries_gap_fill",
    "event_transition_matrix",
    "embedding_quantization",
    "dedup_semantic_clusters",
    "dedup_incremental_minhash",
    "source_quality_rollup",
    "filter_cascade_audit",
    "media_frame_sample_plan",
    "media_resize_plan",
    "asof_join_events",
    "range_join_signup_funnel",
    "orders_priority_pivot",
    "lineitem_cube",
    "quantity_percentiles",
    "global_topk_two_phase",
    "distinct_counts",
    "funnel_staged_conversion",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registration side effects run."""
    import formula_1_spark.queries.parity  # noqa: F401

    for mod in (
        "formula_1_spark.queries.windows_events",
        "formula_1_spark.queries.dedup",
        "formula_1_spark.queries.similarity",
        "formula_1_spark.queries.text_analysis",
        "formula_1_spark.queries.multimodal",
        "formula_1_spark.queries.analytics_extras",
        "formula_1_spark.queries.sketches",
        "formula_1_spark.queries.catalog_f1",
        "formula_1_spark.queries.tpch_classic",
        "formula_1_spark.queries.tpch_extended",
        "formula_1_spark.queries.tpch_supply",
        "formula_1_spark.queries.join_types",
        "formula_1_spark.queries.functions_breadth",
        "formula_1_spark.queries.window_frames",
        "formula_1_spark.queries.pipeline_ops",
        "formula_1_spark.queries.sampling_stats",
        "formula_1_spark.queries.decontam",
        "formula_1_spark.queries.cdc_stream",
        "formula_1_spark.queries.quality_ops",
        "formula_1_spark.queries.sql_modern",
        "formula_1_spark.queries.custom_source",
        "formula_1_spark.queries.zorder_scan",
        "formula_1_spark.queries.scale_ops",
        "formula_1_spark.queries.lexical",
        "formula_1_spark.queries.graph_rank",
        "formula_1_spark.queries.mixture",
        "formula_1_spark.queries.map_ops",
        "formula_1_spark.queries.csv_source",
        "formula_1_spark.queries.robust_stats",
        "formula_1_spark.queries.embedding_analytics",
        "formula_1_spark.queries.importance",
        "formula_1_spark.queries.format_roundtrip",
        "formula_1_spark.queries.lake_maintenance",
        "formula_1_spark.queries.stateful_stream",
        "formula_1_spark.queries.lm_score",
        "formula_1_spark.queries.url_ops",
        "formula_1_spark.queries.curation",
        "formula_1_spark.queries.history",
        "formula_1_spark.queries.corpus_audit",
        "formula_1_spark.queries.corpus_fingerprint",
        "formula_1_spark.queries.privacy_alloc",
        "formula_1_spark.queries.audit_metrics",
        "formula_1_spark.queries.span_extents",
    ):
        try:
            __import__(mod)
        except ImportError:
            pass  # module not built yet (incremental rounds)

    # Reorder in place (callers hold references to REGISTRY itself) so the
    # driver's first-50 snapshot lands on _DRIVER_PRIORITY.
    ordered = {n: REGISTRY[n] for n in _DRIVER_PRIORITY if n in REGISTRY}
    for name, spec in list(REGISTRY.items()):
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
