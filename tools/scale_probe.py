"""10x scale probe: replicate the sf0.1 fact tables 10 times (consistent
key offsets — orders/lineitem share the orderkey offset so joins stay
valid, dims untouched) into /tmp/sfx1, then time a representative query
slate warm at both scales.

Evidence for the scale-up story in PERF.md: if a plan hides quadratic
work or a driver-side bottleneck, 10x data shows it immediately;
shuffle/scan-bound plans land well under 10x wall.

Usage: python tools/scale_probe.py [--build] [--only name1,name2,...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from formula_1_spark.queries.registry import load_all
from formula_1_spark.session import get_spark
from formula_1_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"
# Override for curve checks (e.g. REPLICAS=30 DST=/tmp/sfx3 for the 30x
# point): SPARK_GRAFT_PROBE_DST / SPARK_GRAFT_PROBE_REPLICAS.
DST = os.environ.get("SPARK_GRAFT_PROBE_DST", "/tmp/sfx1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_PROBE_REPLICAS", "10"))

SLATE = [
    "tpch_q1_pricing_summary", "tpch_q9_product_profit",
    "tpch_q13_order_histogram", "tpch_q18_large_orders",
    "tpch_q21_waiting_supplier", "tpch_q2_min_cost_supplier",
    "events_tumbling_window", "asof_join_events",
    "funnel_staged_conversion", "cohort_retention_matrix",
    "skew_salted_join", "lineitem_unpivot_metrics",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_clusters", "dedup_incremental_minhash",
    "similarity_topk_bruteforce", "similarity_ann_lsh",
    "dedup_embedding_cosine", "embedding_quantization",
    # round-2 additions: Arrow cogroup, weighted sampling, one-pass
    # expectations, decorrelated LATERAL, recursive closure, stream-static
    # broadcast enrichment, custom Python source ingest
    "cogroup_order_reconciliation", "sample_weighted_priority",
    "data_quality_expectations", "lateral_top_orders",
    "part_hierarchy_rollup", "events_stream_static_enrich",
    "paged_api_source_ingest",
    # round-3 additions: lexical retrieval, exact-integer PageRank,
    # temperature mixture, runtime bloom join, PQ-ADC ANN, map HOFs,
    # plus the scale-technique queries promoted to the gate this round
    "tfidf_lexical_topk", "bm25_corpus_search",
    "nation_trade_pagerank", "sample_temperature_mixture",
    "runtime_bloom_pruned_join", "similarity_ann_pq",
    "map_functions_battery",
    "dedup_embedding_cosine_scaled", "entity_resolution_fuzzy",
    "crossdoc_ngram_spans", "nation_trade_shortest_path",
    "training_epoch_shuffle", "bucketed_colocated_join",
    "aqe_skew_split_join", "customer_yoy_full_outer",
    "split_leakage_audit", "winsorized_order_stats", "events_rolling_7d",
    # round-3b additions: embedding analytics, importance selection,
    # containment dedup, perceptual buckets, triangles, format round-trips,
    # group-kfold, text profiling
    "label_centroid_cohesion", "hard_negative_mining",
    "events_sessionize_labels", "dsir_importance_select",
    "key_skew_profile", "dedup_containment", "knn_label_noise",
    "media_perceptual_buckets", "nation_trade_triangles",
    "orc_roundtrip_summary", "jsonl_roundtrip_events",
    "grouped_kfold_split", "embedding_dim_stats",
    "token_length_deciles", "bpe_pair_merge_stats",
    # round-3c additions: governance/maintenance lakes, stateful stream,
    # semantic decontam, robust stats
    "temporal_split_audit", "orders_compaction_roundtrip",
    "embedding_decontamination", "stateful_user_totals_stream",
    "user_erasure_audit", "events_locf_fill", "benford_price_audit",
    "schema_evolution_scan", "events_anomaly_mad",
    "lang_id_confusion_matrix", "order_value_regression",
    "minhash_recall_audit", "top_terms_per_source",
    "quality_vs_duplication", "paged_api_sink_roundtrip",
    "orders_seasonality_profile", "part_revenue_pareto",
    "customer_rfm_segments",
    # round-3c remainder (VERDICT r3 item 4): sketches, histograms,
    # drift/diurnal/gap profiles, Heaps growth, keep-latest dedup, MoM
    "countmin_error_audit", "embedding_cosine_histogram",
    "source_mix_drift", "shingle_df_profile",
    "events_hour_of_day_profile", "customer_order_gap_stats",
    "vocab_growth_heaps", "latest_event_per_user_type",
    "orders_mom_change",
    # round-5 additions: bigram-LM quality scoring, URL-grain dedup,
    # cross-snapshot compaction manifest
    "ngram_lm_surprisal", "url_dedup_canonical",
    "dedup_incremental_compaction", "ivf_incremental_assign",
    "dedup_cluster_canonical_quality",
    # round-5 curation/history slate: segment-grain dedup application,
    # budgeted selection on the two-phase cumsum, QID audit, SCD2 build,
    # PMI collocations, streaming watermark dedup
    "segment_dedup_retention", "token_budget_selection",
    "kanonymity_audit", "scd2_customer_priority",
    "pmi_collocations_topk", "stream_dedup_watermark",
    "cluster_aware_split", "source_ablation_impact",
    "events_rolling_median",
    "code_switch_audit", "split_ngram_coverage",
    "boilerplate_phrase_filter", "source_quality_calibration",
    "winnow_fingerprint_dedup", "tokenizer_fertility_audit",
    "zipf_rank_doubling", "oov_rate_audit",
    "event_attribution_first_last",
    "ldiversity_audit", "proportional_allocation_plan",
    "small_cell_suppression",
    "vocab_coverage_curve", "kappa_lang_agreement",
    "rrf_rank_fusion", "bloom_decontam_audit",
    "orders_priority_chisq_drift", "user_contribution_bounds",
    # round-6 additions: substring-span dedup family, ANN/PQ audits,
    # bitext mining, recursive/pipe SQL, quality gate, shard packing
    "dedup_span_extents", "doc_dup_span_coverage", "decontam_span_overlap",
    "span_excision_plan", "ann_recall_audit", "pq_distortion_audit",
    "bitext_margin_mining", "trade_reach_recursive_sql",
    "gopher_quality_gate", "class_balance_reweighting",
    "shard_packing_plan", "media_phash_near_dup",
    "orders_pipe_syntax_report", "surprisal_quality_correlation",
    "dedup_threshold_sweep",
]


def build(spark) -> None:
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )

    # embeddings scale 10x with a deterministic per-replica sign pattern
    # (norm-preserving, so cosine structure within a replica is intact
    # while replicas decorrelate instead of stacking exact duplicates).
    import hashlib

    emb = load_table(spark, SRC, "embeddings")
    eoff = int(emb.agg(F.max("vec_id")).collect()[0][0]) + 1
    big_e = emb
    for i in range(1, REPLICAS):
        signs = ", ".join(
            str(1 if hashlib.md5(f"{i}:{d}".encode()).digest()[0] % 2 else -1)
            for d in range(64)
        )
        flipped = F.expr(
            f"zip_with(embedding, array({signs}), (v, s) -> v * s)"
        )
        big_e = big_e.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * eoff))
            .withColumn("embedding", flipped)
        )
    big_e.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    # documents scale 10x with every token suffixed by the replica index:
    # replicas share NO shingles, so the near-dup pair structure repeats
    # per replica (10x docs -> 10x buckets of unchanged size) instead of
    # exploding cross-replica — the honest dedup scale-up.
    docs = load_table(spark, SRC, "documents")
    doff = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    big_d = docs
    for i in range(1, REPLICAS):
        big_d = big_d.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * doff))
            .withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1_{i}")
            )
        )
    big_d.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    def replicate(df, key: str):
        off = int(df.agg(F.max(key)).collect()[0][0]) + 1
        out = df
        for i in range(1, REPLICAS):
            out = out.unionByName(df.withColumn(key, F.col(key) + F.lit(i * off)))
        return out

    orders = load_table(spark, SRC, "orders")
    # orders and lineitem must share the orderkey offset space
    off = int(orders.agg(F.max("o_orderkey")).collect()[0][0]) + 1
    big_o = orders
    big_l = load_table(spark, SRC, "lineitem")
    li = big_l
    for i in range(1, REPLICAS):
        big_o = big_o.unionByName(
            orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * off))
        )
        big_l = big_l.unionByName(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * off))
        )
    big_o.write.mode("overwrite").parquet(f"{DST}/orders.parquet")
    big_l.write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
    replicate(load_table(spark, SRC, "events"), "event_id").write.mode(
        "overwrite"
    ).parquet(f"{DST}/events.parquet")


def main() -> None:
    spark = get_spark(app_name="scale_probe")
    reg = load_all()
    if "--build" in sys.argv or not os.path.isdir(DST):
        build(spark)
    slate = SLATE
    if "--all" in sys.argv:
        slate = list(reg)  # full registry sweep
    elif "--only" in sys.argv:
        idx = sys.argv.index("--only")
        if idx + 1 >= len(sys.argv):
            raise SystemExit("usage: scale_probe.py --only name1,name2,...")
        wanted = sys.argv[idx + 1].split(",")
        unknown = [n for n in wanted if n not in reg]
        if unknown:
            raise SystemExit(f"--only: unknown queries {unknown}")
        slate = wanted
    # Pre-build the paged-API fixtures at both scales so the timed runs
    # measure the SOURCE read, not the one-time fixture serialization.
    from formula_1_spark.queries.custom_source import _pages_fixture
    from formula_1_spark.queries.format_roundtrip import (
        _jsonl_fixture,
        _orc_fixture,
        _xml_fixture,
    )

    from formula_1_spark.queries.lake_maintenance import (
        compacted_orders_lake,
        erased_events_lake,
        evolved_orders_lake,
    )
    from formula_1_spark.queries.stateful_stream import _stateful_totals_fixture

    for d in (SRC, DST):
        _pages_fixture(spark, d)
        _orc_fixture(spark, d)
        _jsonl_fixture(spark, d)
        _xml_fixture(spark, d)
        compacted_orders_lake(spark, d)
        erased_events_lake(spark, d)
        evolved_orders_lake(spark, d)
        _stateful_totals_fixture(spark, d)
    for n in slate:  # warmup: JIT + code cache
        reg[n].fn(spark, SRC).write.format("noop").mode("overwrite").save()
    for sf in [SRC, DST]:
        print(f"== {sf}")
        for n in slate:
            t0 = time.perf_counter()
            reg[n].fn(spark, sf).write.format("noop").mode("overwrite").save()
            print(f"  {n}: {time.perf_counter() - t0:.2f}s")

    # the production banding for embedding near-dup: bits sized to the
    # corpus so bucket occupancy stays flat (the fixed test-scale banding
    # above goes quadratic — that regression IS the probe's catch)
    from formula_1_spark.operators.similarity import (
        cosine_near_dup_pairs,
        scaled_banding,
    )
    from formula_1_spark.sources.tables import fan_out

    emb = fan_out(load_table(spark, DST, "embeddings"))
    planes, bands = scaled_banding(emb.count())
    t0 = time.perf_counter()
    cosine_near_dup_pairs(emb, threshold=0.45, n_planes=planes, n_bands=bands).write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"  dedup_embedding_cosine[scaled {planes}p/{bands}b]: "
          f"{time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
