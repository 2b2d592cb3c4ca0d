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
# queries that most need a fresh driver row first: round 3 front-loads the
# 42 never-driver-checked queries, the new round-3 registrations, then the
# 15 queries whose last driver row predates the round-2 testdata
# regeneration. Names absent from REGISTRY are skipped; registered names
# absent from this list keep their registration order after it.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked (r1+r2) ---
    "heavy_hitters_topk",
    "tpch_q12_late_shipment_priority",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_relationship",
    "tpch_q20_promotion_supplier",
    "customers_semi_anti",
    "skew_salted_join",
    "lineitem_rollup",
    "events_from_json_typed",
    "string_functions_battery",
    "date_arithmetic_battery",
    "window_frames_battery",
    "array_functions_battery",
    "doc_chunking",
    "text_scrub_pii",
    "dataset_hash_split",
    "training_data_funnel",
    "sample_stratified_by_lang",
    "sample_fixed_per_source",
    "corpus_ngram_stats",
    "sequence_packing",
    "corpus_mixture_plan",
    "doc_rarity_filter",
    "benchmark_decontamination",
    "repetition_profile",
    "cdc_stream_merge_orders",
    "matview_incremental_orders",
    "orders_time_travel_diff",
    "data_quality_expectations",
    "sample_weighted_priority",
    "orders_grouping_sets",
    "part_hierarchy_rollup",
    "lateral_top_orders",
    "cogroup_order_reconciliation",
    "events_variant_extract",
    "paged_api_source_ingest",
    # --- new this round ---
    "dedup_embedding_cosine_scaled",
    "orders_zorder_pruned_scan",
    "training_epoch_shuffle",
    "bucketed_colocated_join",
    "entity_resolution_fuzzy",
    "quality_quantile_filter",
    "crossdoc_ngram_spans",
    "nation_trade_shortest_path",
    # --- new round-3 additions past the 50-row snapshot window: next in
    # line for a driver row in round 4, oracle-verified locally meanwhile
    "tfidf_lexical_topk",
    "bm25_corpus_search",
    "nation_trade_pagerank",
    "sample_temperature_mixture",
    "runtime_bloom_pruned_join",
    "similarity_ann_pq",
    "map_functions_battery",
    "csv_quarantine_source",
    "customer_yoy_full_outer",
    "aqe_skew_split_join",
    "split_leakage_audit",
    "winsorized_order_stats",
    "events_rolling_7d",
    "label_centroid_cohesion",
    "hard_negative_mining",
    "events_sessionize_labels",
    "dsir_importance_select",
    "key_skew_profile",
    "dedup_containment",
    "knn_label_noise",
    "media_perceptual_buckets",
    "nation_trade_triangles",
    "orc_roundtrip_summary",
    "jsonl_roundtrip_events",
    "grouped_kfold_split",
    "embedding_dim_stats",
    "token_length_deciles",
    "bpe_pair_merge_stats",
    "temporal_split_audit",
    "orders_compaction_roundtrip",
    "embedding_decontamination",
    "stateful_user_totals_stream",
    "user_erasure_audit",
    "events_locf_fill",
    "benford_price_audit",
    "schema_evolution_scan",
    "events_anomaly_mad",
    "lang_id_confusion_matrix",
    "order_value_regression",
    "minhash_recall_audit",
    "top_terms_per_source",
    "quality_vs_duplication",
    "paged_api_sink_roundtrip",
    "orders_seasonality_profile",
    "part_revenue_pareto",
    "customer_rfm_segments",
    "latest_event_per_user_type",
    "orders_mom_change",
    "countmin_error_audit",
    "embedding_cosine_histogram",
    "source_mix_drift",
    "shingle_df_profile",
    "events_hour_of_day_profile",
    "customer_order_gap_stats",
    "vocab_growth_heaps",
    # --- driver row stale (last checked on pre-regeneration r1 testdata) ---
    "ctas_priority_summary",
    "f1_gold_driver_standings",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q4_priority_exists",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q13_order_histogram",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q22_global_sales_opportunity",
    "customers_left_join_orders",
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
