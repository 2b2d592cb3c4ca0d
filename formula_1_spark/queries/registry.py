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
# iteration order each round. Round 7 pins the full 50-slot window
# explicitly: the 21 round-6 additions — the only queries that have never
# had a driver CORRECTNESS row (they registered behind the round-6 window
# per the growth protocol; all are locally bit-exact via
# tests/test_oracle_parity.py) — come first. A green r07 makes cumulative
# driver coverage 224/224 on the pre-round-7 registry. The remaining 29
# slots re-check the STALEST greens (6 last green in r02, 23 last green in
# r03) as a regression watch. New round-7+ queries register BEHIND this
# pinned window. Names absent from REGISTRY are skipped; registered names
# absent from this list keep registration order after it.
#
# ROUND-8 ROTATION TODO: the 25 round-7 additions have never been in a
# driver window — pin them first next round: line_dedup_hot_lines,
# line_dedup_excision, line_source_reuse_matrix, cdc_chunk_dedup,
# quality_threshold_sweep, lsh_band_occupancy, ivf_cell_balance,
# embedding_power_iteration, similarity_ann_multiprobe,
# basket_brand_affinity, line_dedup_incremental, dedup_cross_source_rate,
# embedding_norm_outliers, kcenter_greedy_seeding, bpe_merge_rounds,
# orders_open_backlog_daily, events_rate_limit_audit,
# multiprobe_recall_gain, source_token_tv_drift, hot_line_position_profile,
# corpus_novelty_curve, events_dau_wau_stickiness, pq_recall_audit,
# trade_kcore_membership, segment_hhi_concentration (25 total). The
# remaining 25 slots: stalest greens (the
# rest of the r03 cohort — see CORRECTNESS_r03.json).
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked (all 21 round-6 additions) ---
    "dedup_span_extents",
    "doc_dup_span_coverage",
    "decontam_span_overlap",
    "span_excision_plan",
    "shard_packing_plan",
    "ann_recall_audit",
    "trade_reach_recursive_sql",
    "gopher_quality_gate",
    "class_balance_reweighting",
    "media_phash_near_dup",
    "pq_distortion_audit",
    "bitext_margin_mining",
    "orders_pipe_syntax_report",
    "surprisal_quality_correlation",
    "dedup_threshold_sweep",
    "segment_collated_rollup",
    "events_purchase_attribution_outer",
    "events_lttb_downsample",
    "dedup_cluster_density",
    "embedding_corr_pairs",
    "dedup_pipeline_funnel",
    # --- regression re-checks: stalest driver greens (last green r02) ---
    "approx_distinct_sketch",
    "approx_quantile_sketch",
    "cohort_retention_matrix",
    "hll_mergeable_rollup",
    "lineitem_unpivot_metrics",
    "referential_integrity_audit",
    # --- regression re-checks: next-stalest (last green r03) ---
    "array_functions_battery",
    "benchmark_decontamination",
    "bucketed_colocated_join",
    "cdc_stream_merge_orders",
    "cogroup_order_reconciliation",
    "corpus_mixture_plan",
    "corpus_ngram_stats",
    "crossdoc_ngram_spans",
    "customers_semi_anti",
    "data_quality_expectations",
    "dataset_hash_split",
    "date_arithmetic_battery",
    "dedup_embedding_cosine_scaled",
    "doc_chunking",
    "doc_rarity_filter",
    "entity_resolution_fuzzy",
    "events_from_json_typed",
    "events_variant_extract",
    "heavy_hitters_topk",
    "lateral_top_orders",
    "lineitem_rollup",
    "matview_incremental_orders",
    "nation_trade_shortest_path",
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
