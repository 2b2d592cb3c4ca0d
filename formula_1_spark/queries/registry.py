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
# iteration order each round. Round 11 pins the 26 round-10 additions
# first — the only queries never driver-checked (registered behind the
# round-10 window per the growth protocol; all judge-verified green in
# VERDICT r10's full oracle-parity pytest run and locally bit-exact vs
# DuckDB at sf0.001 AND sf0.01). A green r11 closes cumulative driver
# coverage: every pre-r11 registered query driver-certified at least once.
# The remaining 24 slots re-check the STALEST greens: the r05 cohort (last
# driver green CORRECTNESS_r05) in r05 order starting at
# tpch_q10_returned_items — the first 18 of that cohort were re-checked in
# r10; this window takes the next 24, leaving 8 (dedup_embedding_cosine
# through media_feature_extract in r05 order) for the round-12 window.
# New round-11+ queries register BEHIND this pinned window. Names absent
# from REGISTRY are skipped; registered names absent from this list keep
# registration order after it.
#
# ROUND-12 ROTATION TODO: pin the round-11 additions first (registered
# behind this window, driver-never-checked; all locally bit-exact vs
# DuckDB at sf0.001 AND sf0.01): similarity_ann_store_probe,
# similarity_ann_store_append_probe, ann_store_cell_drift,
# ann_store_split_plan, doc_repetition_excision, ann_store_staleness_audit,
# ann_nndescent_graph, nndescent_recall_audit, ann_graph_beam_search,
# preference_bradley_terry, annotator_agreement_kappa,
# poisson_bootstrap_ci, dp_noisy_counts, dp_partition_selection,
# ranking_metrics_battery, bm25_index_store_probe,
# bm25_index_store_append_probe
# (extend with any later round-11 registrations). Then the 8 remaining
# r05-stale greens:
# dedup_embedding_cosine, similarity_topk_bruteforce, similarity_ann_lsh,
# similarity_ann_ivf, text_quality_profile, text_lang_report,
# text_bpe_tokens, media_feature_extract. Fill the rest with the stalest
# r06 cohort in r06 order (see CORRECTNESS_r06.json, starting at
# ivf_incremental_assign).
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked (all 26 round-10 additions; judge-green
    # r10 via the full oracle-parity suite) ---
    "label_propagation_communities",
    "doremi_domain_reweight",
    "tcloseness_audit",
    "kmeans_lloyd_iteration",
    "random_projection_jl_audit",
    "interval_overlap_join",
    "conformal_coverage_audit",
    "pass_at_k_estimator",
    "xml_roundtrip_customers",
    "ks_drift_test",
    "null_semantics_battery",
    "window_rank_functions_battery",
    "media_byte_histogram",
    "events_dynamic_session_window",
    "try_functions_battery",
    "anti_join_null_semantics",
    "rendezvous_shard_assignment",
    "window_value_functions_battery",
    "dedup_signature_store_probe",
    "quality_classifier_hashed_ngram",
    "listagg_ordered_battery",
    "parquet_agg_pushdown_scan",
    "dedup_signature_store_append_probe",
    "char_trigram_gini_diversity",
    "cube_grouping_battery",
    "rollup_distinct_count_battery",
    # --- stalest r05-cohort greens (last green CORRECTNESS_r05; next 24
    # in r05 order after the 18 re-checked in r10 — the remaining 8 are
    # queued for round 12) ---
    "tpch_q10_returned_items",
    "tpch_q13_order_histogram",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q22_global_sales_opportunity",
    "customers_left_join_orders",
    "race_results_denorm",
    "driver_standings",
    "constructor_standings",
    "adjusted_points_report",
    "dominant_customers_topk",
    "events_json_extract",
    "scalar_functions",
    "filter_scan_project",
    "customer_retention_setops",
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_stream_stream_join",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
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
        "formula_1_spark.queries.dedup_tuning",
        "formula_1_spark.queries.footer_stats",
        "formula_1_spark.queries.signature_store",
        "formula_1_spark.queries.ann_store",
        "formula_1_spark.queries.graph_ann",
        "formula_1_spark.queries.preference",
        "formula_1_spark.queries.ranking_eval",
        "formula_1_spark.queries.lexical_store",
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
