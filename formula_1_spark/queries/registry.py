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
# iteration order each round. Rotate driver attention by listing the
# queries that most need a fresh driver row first: round 4 front-loads the
# 50 hardest of the 55 round-3 additions that have never had a driver row
# (CORRECTNESS_r01-r03 union), hardest-first per VERDICT.md r3 item 1; the
# 5 simplest aggregate profiles are deferred to round 5 and listed next so
# the round-5 rotation is a 5-line edit. Names absent from REGISTRY are
# skipped; registered names absent from this list keep their registration
# order after it.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked (rounds 1-3): the round-4 window ---
    "dedup_containment",
    "minhash_recall_audit",
    "dsir_importance_select",
    "similarity_ann_pq",
    "stateful_user_totals_stream",
    "embedding_decontamination",
    "media_perceptual_buckets",
    "knn_label_noise",
    "hard_negative_mining",
    "label_centroid_cohesion",
    "aqe_skew_split_join",
    "runtime_bloom_pruned_join",
    "nation_trade_pagerank",
    "nation_trade_triangles",
    "bm25_corpus_search",
    "tfidf_lexical_topk",
    "sample_temperature_mixture",
    "grouped_kfold_split",
    "events_sessionize_labels",
    "paged_api_sink_roundtrip",
    "orders_compaction_roundtrip",
    "schema_evolution_scan",
    "csv_quarantine_source",
    "orc_roundtrip_summary",
    "jsonl_roundtrip_events",
    "user_erasure_audit",
    "events_locf_fill",
    "events_rolling_7d",
    "customer_yoy_full_outer",
    "split_leakage_audit",
    "temporal_split_audit",
    "latest_event_per_user_type",
    "winsorized_order_stats",
    "key_skew_profile",
    "map_functions_battery",
    "embedding_dim_stats",
    "benford_price_audit",
    "events_anomaly_mad",
    "lang_id_confusion_matrix",
    "order_value_regression",
    "countmin_error_audit",
    "token_length_deciles",
    "bpe_pair_merge_stats",
    "top_terms_per_source",
    "quality_vs_duplication",
    "source_mix_drift",
    "vocab_growth_heaps",
    "orders_seasonality_profile",
    "part_revenue_pareto",
    "customer_rfm_segments",
    # --- never driver-checked, deferred to the round-5 window ---
    "embedding_cosine_histogram",
    "shingle_df_profile",
    "events_hour_of_day_profile",
    "customer_order_gap_stats",
    "orders_mom_change",
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
