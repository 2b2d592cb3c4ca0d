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
# iteration order each round. Round 8 pins the 25 round-7 additions first —
# the only queries without a driver CORRECTNESS row (registered behind the
# round-7 window per the growth protocol; all locally bit-exact via
# tests/test_oracle_parity.py). A green r08 closes cumulative driver
# coverage at 249/249 for the pre-round-8 registry. The remaining 25 slots
# re-check the STALEST greens: 25 of the 27 remaining r03-cohort names
# (last green in CORRECTNESS_r03; the 2 that did not fit are named in the
# ROUND-9 TODO below). New
# round-8+ queries register BEHIND this pinned window. Names absent from
# REGISTRY are skipped; registered names absent from this list keep
# registration order after it.
#
# ROUND-9 ROTATION TODO: pin the 14 round-8 additions first
# (ivf_nprobe_recall_curve, exactsubstr_dup50_profile,
# exactsubstr_excision50, suffix_lrs_pow2, exactsubstr_threshold_curve,
# exactsubstr_decontam50, kmv_source_overlap, similarity_ann_ivfpq,
# neyman_allocation_plan, part_copurchase_clustering,
# events_conversion_survival, orders_cusum_changepoint,
# label_centroid_similarity, greedy_gram_cover — registered behind
# this window per the
# growth protocol), then the 2 r03-cohort stale greens that did not fit this window
# (orders_zorder_pruned_scan, quality_quantile_filter), then the stalest
# r04 greens (see CORRECTNESS_r04.json).
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked (all 25 round-7 additions) ---
    "line_dedup_hot_lines",
    "line_dedup_excision",
    "line_source_reuse_matrix",
    "cdc_chunk_dedup",
    "quality_threshold_sweep",
    "lsh_band_occupancy",
    "ivf_cell_balance",
    "embedding_power_iteration",
    "similarity_ann_multiprobe",
    "basket_brand_affinity",
    "line_dedup_incremental",
    "dedup_cross_source_rate",
    "embedding_norm_outliers",
    "kcenter_greedy_seeding",
    "bpe_merge_rounds",
    "orders_open_backlog_daily",
    "events_rate_limit_audit",
    "multiprobe_recall_gain",
    "source_token_tv_drift",
    "hot_line_position_profile",
    "corpus_novelty_curve",
    "events_dau_wau_stickiness",
    "pq_recall_audit",
    "trade_kcore_membership",
    "segment_hhi_concentration",
    # --- regression re-checks: stalest driver greens (rest of the r03
    # cohort, last green in CORRECTNESS_r03; 25 of 27 fit) ---
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
    "skew_salted_join",
    "string_functions_battery",
    "window_frames_battery",
    "text_scrub_pii",
    "training_data_funnel",
    "training_epoch_shuffle",
    "sample_stratified_by_lang",
    "sample_fixed_per_source",
    "sequence_packing",
    "repetition_profile",
    "orders_time_travel_diff",
    "sample_weighted_priority",
    "orders_grouping_sets",
    "part_hierarchy_rollup",
    "paged_api_source_ingest",
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
        "formula_1_spark.queries.line_dedup",
        "formula_1_spark.queries.suffix_doubling",
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
