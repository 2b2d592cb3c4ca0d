"""Plan-quality guards: every registered query's physical plan must stay
on the fast path — no row-at-a-time Python UDFs, no cartesian products,
Python only in the declared mapInPandas surfaces, broadcast joins for dim
lookups. Guards against regressions that correctness tests can't see."""

from __future__ import annotations

import pytest

from formula_1_spark.queries.registry import load_all

REGISTRY = load_all()

# Queries allowed to run Python kernels (Arrow-batched mapInPandas /
# cogrouped applyInPandas only).
PANDAS_OK = {
    "media_feature_extract",
    "cogroup_order_reconciliation",
    "media_perceptual_buckets",  # same declared feature kernel as extract
}
# Broadcast nested-loop is the intended strategy for the brute-force
# similarity baseline, the IVF centroid assignment (tiny broadcast
# side against the corpus), and the 1-row scalar-subquery broadcast in
# the Q22 shape. The as-of join needs no exemption: its union-scan plan
# has zero joins.
BNLJ_OK = {
    "similarity_topk_bruteforce",
    "similarity_ann_ivf",
    "dedup_semantic_clusters",  # same k-means centroid broadcast as IVF
    "tpch_q22_global_sales_opportunity",
    "tpch_q11_important_stock",  # 1-row scalar-threshold broadcast
    "embedding_quantization",  # 1-row per-dim stats broadcast
    "heavy_hitters_topk",  # 1-row totals x 1-row flags scalar broadcast
    "bm25_corpus_search",  # 1-row corpus total-length broadcast
    "sample_temperature_mixture",  # 1-row min-count broadcast
    "similarity_ann_pq",  # same tiny-codebook broadcast assigns as IVF
    "hard_negative_mining",  # probe-broadcast anti-label corpus scan
    "knn_label_noise",  # probe-broadcast non-equi (self-excluding) scan
    "dsir_importance_select",  # 1-row token-totals broadcast
    "key_skew_profile",  # 1-row global-stats broadcast
    "grouped_kfold_split",  # 1-row fold-totals broadcast
    "temporal_split_audit",  # 1-row time-bounds broadcast
    "embedding_decontamination",  # eval-probe broadcast corpus scan
    "benford_price_audit",  # 1-row digit-total broadcast
    "events_anomaly_mad",  # 1-row median/MAD scalar broadcasts
    "top_terms_per_source",  # 1-row corpus-size broadcast
    "orders_seasonality_profile",  # 1-row totals broadcast
    "part_revenue_pareto",  # 1-row revenue-total broadcast
    "customer_rfm_segments",  # 1-row corpus-max-date broadcast
    "embedding_cosine_histogram",  # hash-sampled pair set, sample broadcast
    "shingle_df_profile",  # 1-row postings-total broadcast
    "customer_order_gap_stats",  # 1-row gap-total broadcast
}


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_slow_path_in_plan(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in PANDAS_OK:
        assert (
            "MapInPandas" not in plan
            and "ArrowEvalPython" not in plan
            and "InPandas" not in plan  # cogroup/grouped-map variants
        ), f"{name}: unexpected Python stage"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unplanned nested-loop join"
        )


@pytest.mark.parametrize(
    "name",
    ["race_results_denorm", "driver_standings", "constructor_standings",
     "tpch_q5_local_supplier_volume"],
)
def test_dim_joins_are_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name}: dim join not broadcast"
    assert "SortMergeJoin" not in plan, f"{name}: unexpected sort-merge join"


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_scan_project")
    assert "PushedFilters: [" in plan
    assert "LessThan(l_shipdate" in plan or "GreaterThan(l_discount" in plan, plan
