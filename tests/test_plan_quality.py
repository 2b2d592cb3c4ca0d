"""Plan-quality guards: every registered query's physical plan must stay
on the fast path — no row-at-a-time Python UDFs, no cartesian products,
Python only in the declared mapInPandas surfaces, broadcast joins for dim
lookups. Guards against regressions that correctness tests can't see."""

from __future__ import annotations

import re

import pytest

from formula_1_spark.queries.registry import load_all

REGISTRY = load_all()

# Queries allowed to run Python kernels (Arrow-batched mapInPandas /
# cogrouped applyInPandas only).
PANDAS_OK = {
    "media_feature_extract",
    "cogroup_order_reconciliation",
    "media_perceptual_buckets",  # same declared feature kernel as extract
    "token_budget_selection",  # global_ordered_cumsum Arrow running-total
    "shard_packing_plan",  # same global_ordered_cumsum Arrow pass
    "curriculum_phase_assignment",  # same global_ordered_cumsum Arrow pass
    "parquet_rowgroup_skipping_audit",  # declared footer-harvest kernel:
    #   pyarrow footer reads over a FILE-PATH relation (O(KB)/footer)
    "media_audio_energy_vad",  # declared Arrow frame-energy kernel (the
    #   sanctioned multimodal mapInPandas surface)
    "media_byte_histogram",  # declared mapInArrow record-batch kernel
    #   (zero-copy Arrow surface; pre-aggregated inside the kernel)
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
    "dedup_semantic_clusters_scaled",  # same centroid broadcast, scaled k
    "semdedup_prune_report",  # same k-means centroid broadcast as IVF
    "tpch_q22_global_sales_opportunity",
    "tpch_q11_important_stock",  # 1-row scalar-threshold broadcast
    "embedding_quantization",  # 1-row per-dim stats broadcast
    "heavy_hitters_topk",  # 1-row totals x 1-row flags scalar broadcast
    "bm25_corpus_search",  # 1-row corpus total-length broadcast
    "rrf_rank_fusion",  # same 1-row total-length broadcast via bm25_scores
    "sample_temperature_mixture",  # 1-row min-count broadcast
    "unimax_budget_allocation",  # 1-row budget + capped-stats broadcasts
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
    "ngram_lm_surprisal",  # 1-row vocab-size broadcast
    "ivf_incremental_assign",  # k-row centroid broadcast (IVF assign)
    "ivf_nprobe_recall_curve",  # same k-row centroid broadcast (IVF assign)
    "token_budget_selection",  # 1-row corpus-token-total broadcast
    "pmi_collocations_topk",  # 1-row corpus-token-total broadcast
    "source_ablation_impact",  # 1-row corpus-scalars broadcast
    "boilerplate_phrase_filter",  # 1-row doc-total + phrase-count broadcast
    "winnow_fingerprint_dedup",  # 1-row shared-fingerprint-count broadcast
    "proportional_allocation_plan",  # 1-row corpus-total + extras broadcast
    "vocab_coverage_curve",  # 8-row cutoff relation (rk <= v) + 1-row total
    "orders_priority_chisq_drift",  # 1-row corpus-total broadcast
    "ann_recall_audit",  # same k-means centroid + query-probe broadcasts
    #   as similarity_ann_ivf / similarity_topk_bruteforce (its inputs)
    "ranking_metrics_battery",  # same inputs as ann_recall_audit (brute
    #   ground truth BNLJ + centroid broadcast), plus integer metric math
    "bm25_index_store_probe",  # 1-row corpus-scalars (total_len) broadcast
    "bm25_index_store_append_probe",  # same 1-row merged-scalars broadcast
    "class_balance_reweighting",  # 1-row totals broadcast x2 (bounded)
    "bitext_margin_mining",  # probe-broadcast B-side scan (decontam shape)
    "surprisal_quality_correlation",  # same 1-row vocab-size broadcast
    #   as ngram_lm_surprisal (shares doc_surprisal)
    "dedup_threshold_sweep",  # 6-row threshold-grid theta broadcast
    "quality_threshold_sweep",  # 1-row totals broadcast over an 11-row grid
    "ivf_cell_balance",  # same k-means centroid broadcast as IVF + 1-row tot
    "embedding_power_iteration",  # 1-row vector + 1-row norm broadcasts x3
    "basket_brand_affinity",  # 1-row order-total broadcast
    "dedup_cross_source_rate",  # 1-row pair-total broadcast
    "annotator_agreement_kappa",  # 1-row kappa-summary broadcast
    "preference_bradley_terry",  # 1-row fold-total broadcast per MM round
    "ann_nndescent_graph",  # 1-row corpus-count broadcast (init arithmetic)
    "nndescent_recall_audit",  # same 1-row count + panel-probe broadcast
    "ann_graph_beam_search",  # entry-node frontier constant-folds (node=0),
    #   stripping the equi key: each BNLJ side is the <=10-query panel or
    #   the entry node's <=k graph edges — bounded by construction
    "embedding_norm_outliers",  # 1-row median/MAD scalar broadcasts
    "kcenter_greedy_seeding",  # 1-row seed-vector broadcasts x3
    "bpe_merge_rounds",  # 1-row top-pair + 1-row vocab broadcasts x3
    "source_token_tv_drift",  # 1-row corpus-total + Q-total broadcasts
    "trade_kcore_membership",  # 1-row median + convergence-flag broadcasts
    "kmv_source_overlap",  # source-pair grid (non-equi a<b) x <=64-row
    #   KMV sketches — both sides bounded by the SOURCE domain, never data
    "similarity_ann_ivfpq",  # same k-row coarse-centroid broadcast as IVF
    "similarity_ann_store_probe",  # same coarse-centroid broadcast, on-disk index
    "similarity_ann_store_append_probe",  # same broadcast, grown on-disk index
    "ann_store_cell_drift",  # 1-row occupancy-target broadcast
    "neyman_allocation_plan",  # 1-row weight-total + extras broadcasts
    #   (same shape as proportional_allocation_plan)
    "events_conversion_survival",  # 1-row max-ts / subject-total / KM-array
    #   broadcasts onto the 14-row bucket grid
    "orders_cusum_changepoint",  # 1-row mean/total broadcast onto the
    #   date-domain-bounded daily relation
    "label_centroid_similarity",  # 10-row centroid pair grid (non-equi
    #   a<b) — bounded by the LABEL domain, never data
    "lsh_band_planning",  # <=20-bin similarity histogram x 5-row (b,r)
    #   config grid — both sides bounded by constants, never data
    "simhash_hamming_roc",  # 8-row Hamming-threshold grid broadcast
    "watermark_late_audit",  # 3-row delay grid + 1-row total broadcast
    "matryoshka_truncation_audit",  # 4-probe panel x 3-row dim grid
    #   broadcast (declared brute-force baseline shape)
    "context_truncation_waste",  # 3-row limit grid + 1-row totals broadcast
    "ipf_raking_weights",  # 1-row marginal-targets broadcast onto the
    #   domain-bounded lang x source cell matrix
    "kmeanspp_parallel_init",  # 1-row seed / total / candidate-array
    #   broadcasts per oversampling round — all candidate-grain
    "doremi_domain_reweight",  # 1-row corpus-baseline broadcast onto the
    #   source-grain aggregate (bounded at #sources rows)
    "tcloseness_audit",  # priority-domain cross join (<= 5 rows) + 1-row
    #   corpus-totals broadcast onto the bounded QI-group grid
    "ks_drift_test",  # bin-domain cross join (100-char length bins,
    #   domain-bounded) + 1-row corpus-total broadcast
    "rendezvous_shard_assignment",  # 1-row doc-total broadcast onto the
    #   shard-grain aggregate
}


# Queries allowed a scan→single-partition-exchange path: relations whose
# cardinality is bounded by the DOMAIN, not the data scale.
SINGLE_PARTITION_OK = {
    "nation_trade_pagerank",  # nation graph: <=25 nodes by TPC-H schema
    # largest-remainder rank over the persisted stratum aggregate: the
    # InMemoryTableScan feeding the window's SinglePartition exchange is
    # the post-agg (lang, source) relation — bounded by the domain, but
    # the checker can't see through the cache boundary to the Aggregate
    "proportional_allocation_plan",
    # same shape: the persisted per-source stats aggregate feeds the
    # largest-remainder window through a cache boundary
    "neyman_allocation_plan",
    # HITS rescale windows: the nation scan (<=25 rows by TPC-H schema)
    # reaches each per-iteration global-window exchange through the
    # node-grain left join — same domain bound as nation_trade_pagerank
    "trade_hits_hubs_authorities",
    # final rank over the player-panel strengths: the checkpointed MM
    # relation feeding the SinglePartition exchange is bounded at
    # #players (nations) rows at any comparison-stream scale, but the
    # checker can't see through the LogicalRDD checkpoint boundary
    "preference_bradley_terry",
}


def _single_partition_violations(plan: str) -> list[str]:
    """Scans that feed an ``Exchange SinglePartition`` with no row-bounding
    operator (aggregate / limit / top-k / broadcast build) in between — an
    unbounded relation funnelled through one task, the global-sort
    scale-killer an unpartitioned ``Window.orderBy`` induces. Post-agg
    global windows and scalar aggregates stay legal: their single-partition
    input is already bounded by an upstream Aggregate/Limit."""
    lines = plan.splitlines()
    node_re = re.compile(
        r"^(?P<pre>[ :+\-]*)(?:\* )?(?P<name>[A-Za-z][\w .]*?) \((?P<id>\d+)\)\s*$"
    )
    nodes = []
    for ln in lines:
        if not ln.strip():
            break  # end of the formatted tree section
        m = node_re.match(ln)
        if m:
            nodes.append(
                (len(m.group("pre")), m.group("name").strip(), int(m.group("id")))
            )
    sp_ids, cur = set(), None
    hdr_re = re.compile(r"^\((\d+)\) ")
    for ln in lines:
        m = hdr_re.match(ln)
        if m:
            cur = int(m.group(1))
        elif cur is not None and "Arguments:" in ln and "SinglePartition" in ln:
            sp_ids.add(cur)
    bounding = ("Aggregate", "Limit", "TakeOrdered", "BroadcastExchange", "Subquery")
    out: list[str] = []
    stack: list[tuple[int, str, int]] = []
    for depth, name, nid in nodes:
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if "Scan" in name:
            for _, n, i in reversed(stack):
                if any(b in n for b in bounding):
                    break  # bounded before reaching any SP exchange
                if "Exchange" in n and i in sp_ids:
                    out.append(f"{name} ({nid}) -> single-partition Exchange ({i})")
                    break
        stack.append((depth, name, nid))
    return out


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
            and "MapInArrow" not in plan  # record-batch kernels
        ), f"{name}: unexpected Python stage"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unplanned nested-loop join"
        )
    if name not in SINGLE_PARTITION_OK:
        violations = _single_partition_violations(plan)
        assert not violations, (
            f"{name}: unbounded relation through a single-partition "
            f"exchange (use two_phase/global_ntile_two_phase operators): "
            f"{violations}"
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


# Reviewed unpartitioned Window.orderBy sites in query modules — each
# over a relation bounded by something other than the data scale. New
# sites must either use the two-phase operators or be reviewed onto this
# list with the bounding argument.
UNPARTITIONED_WINDOW_OK = {
    "graph_rank.py": "nation graph: <=25 nodes by schema",
    "ann_store.py": (
        "hot-cell rank over the <= n_cells per-cell occupancy aggregate"
    ),
    "analytics_extras.py": (
        "pareto cumsum over the <=100 two-phase survivors; "
        "month-over-month lag over month-grain rows"
    ),
    "windows_events.py": (
        "lag over the hour-grain rollup (~1e5 rows/decade); "
        "LTTB lag/lead over the 32-row bucket-centroid relation"
    ),
    "text_analysis.py": "cumulative window over the 10 NTILE batch rows",
    "privacy_alloc.py": (
        "largest-remainder rank over the stratum aggregate "
        "(bounded at langs x sources rows at any corpus scale)"
    ),
    "mixture.py": (
        "unimax waterfill rank/cumsum over the per-language aggregate "
        "(bounded at #langs rows at any corpus scale)"
    ),
    "preference.py": (
        "Bradley-Terry final rank over the player-panel strengths "
        "(bounded at #players rows at any comparison-stream scale)"
    ),
}


def test_no_new_unpartitioned_windows_in_queries():
    """Source-level guard complementing the plan-level SinglePartition
    check (which can't tell a scale-grain aggregate from a small one):
    every `Window.orderBy(` occurrence in formula_1_spark/queries must be
    in the reviewed allowlist above."""
    import os

    qdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "formula_1_spark",
        "queries",
    )
    offenders = []
    for fname in sorted(os.listdir(qdir)):
        if not fname.endswith(".py"):
            continue
        src = open(os.path.join(qdir, fname)).read()
        hits = [
            i + 1
            for i, ln in enumerate(src.splitlines())
            if "Window.orderBy" in ln and not ln.lstrip().startswith("#")
            and '"' not in ln.split("Window.orderBy")[0]  # not inside a docstring line
        ]
        if hits and fname not in UNPARTITIONED_WINDOW_OK:
            offenders.append(f"{fname}:{hits}")
    assert not offenders, (
        "unreviewed unpartitioned Window.orderBy (use two_phase_global_topk"
        f" / global_ntile_two_phase or review onto the allowlist): {offenders}"
    )


def test_aqe_skew_join_splits(spark):
    """AQE must mark the synthetic hot-key join 'skew=true' in the
    finalized adaptive plan. Lives here (not in the registered query body)
    so the driver gate executes the query exactly once; this test pays the
    one extra execution under the lowered skew thresholds."""
    from formula_1_spark.queries.scale_ops import skew_join_frame, skew_split_confs

    sf_dir = "/root/testdata/sf0.001"
    confs = skew_split_confs(spark, sf_dir)
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        out = skew_join_frame(spark, sf_dir)
        # AQE finalizes the plan during execution — run THIS Dataset's own
        # QueryExecution, then inspect the executed plan.
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not mark the skewed join (no 'skew=true'):\n" + plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
