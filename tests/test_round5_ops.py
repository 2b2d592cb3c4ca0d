"""Round-5 operator tests: global_ordered_cumsum adversarial checks and
semantic invariants for the curation / history / PMI queries (their
value-level parity is covered by test_oracle_parity's registry sweep)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from formula_1_spark.operators.windows import global_ordered_cumsum
from formula_1_spark.queries.registry import load_all

REGISTRY = load_all()


def test_cumsum_matches_window_oracle(spark):
    df = spark.range(0, 5000).select(
        "id",
        (F.col("id") * 37 % 101).alias("k"),
        ((F.col("id") * 13) % 50 + 1).alias("v"),
    )
    got = global_ordered_cumsum(
        df, [F.desc("k"), F.asc("id")], "v", "cum", n_parts=13
    )
    exp = df.withColumn(
        "cum",
        F.sum("v").over(
            Window.orderBy(F.desc("k"), F.asc("id")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    g = {r["id"]: r["cum"] for r in got.collect()}
    e = {r["id"]: r["cum"] for r in exp.collect()}
    assert g == e


def test_cumsum_single_and_empty(spark):
    one = spark.range(7, 8).select("id", F.lit(5).alias("v"))
    assert global_ordered_cumsum(one, [F.asc("id")], "v", "cum").collect()[
        0
    ]["cum"] == 5
    empty = spark.range(0).select("id", F.lit(1).alias("v"))
    assert global_ordered_cumsum(empty, [F.asc("id")], "v", "cum").count() == 0


def test_cumsum_more_partitions_than_rows(spark):
    df = spark.range(0, 3).select("id", (F.col("id") + 1).alias("v"))
    got = {
        r["id"]: r["cum"]
        for r in global_ordered_cumsum(
            df, [F.asc("id")], "v", "cum", n_parts=16
        ).collect()
    }
    assert got == {0: 1, 1: 3, 2: 6}


def test_segment_dedup_retention_invariants(spark, sf_dir):
    rows = REGISTRY["segment_dedup_retention"].fn(spark, sf_dir).collect()
    assert rows
    total_kept = sum(r["segs_kept"] for r in rows)
    total_segs = sum(r["segs_total"] for r in rows)
    # kept == corpus-wide distinct segments (first occurrence each).
    from formula_1_spark.queries.curation import _doc_segments
    from formula_1_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_distinct = _doc_segments(docs).select("seg_text").distinct().count()
    assert total_kept == n_distinct
    for r in rows:
        assert 0 <= r["segs_kept"] <= r["segs_total"]
        assert r["docs_intact"] + r["docs_emptied"] <= r["docs_total"]
        assert r["retained_ppm"] == r["segs_kept"] * 1000000 // r["segs_total"]
    assert total_kept < total_segs  # the corpus does contain duplicates


def test_token_budget_selection_respects_budget(spark, sf_dir):
    rows = REGISTRY["token_budget_selection"].fn(spark, sf_dir).collect()
    tokens_total = sum(r["tokens_total"] for r in rows)
    tokens_kept = sum(r["tokens_kept"] for r in rows)
    budget = tokens_total * 30 // 100
    assert 0 < tokens_kept <= budget
    # Greedy tightness: the next-ranked doc would overflow the budget, so
    # the kept total must be within max-doc-tokens of it.
    from formula_1_spark.sources.tables import load_table

    max_doc = (
        load_table(spark, sf_dir, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert budget - tokens_kept < max_doc


def test_scd2_intervals_partition_time(spark, sf_dir):
    rows = REGISTRY["scd2_customer_priority"].fn(spark, sf_dir).collect()
    assert rows
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["custkey"], []).append(r)
    for cust, ivs in by_cust.items():
        ivs.sort(key=lambda r: r["version"])
        # versions contiguous from 1; adjacent intervals chain exactly;
        # exactly one open/current interval per customer.
        assert [r["version"] for r in ivs] == list(range(1, len(ivs) + 1))
        for a, b in zip(ivs, ivs[1:]):
            assert a["effective_to"] == b["effective_from"]
            assert a["is_current"] == 0
        assert ivs[-1]["is_current"] == 1
        assert ivs[-1]["effective_to"] == "9999-12-31 00:00:00"
        # consecutive intervals represent actual changes
        for a, b in zip(ivs, ivs[1:]):
            assert a["priority"] != b["priority"]


def test_pmi_support_and_ordering(spark, sf_dir):
    rows = REGISTRY["pmi_collocations_topk"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    keys = [(-r["pmi_ppm"], r["w1"], r["w2"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r["c12"] >= 20
        assert r["c1"] >= r["c12"] and r["c2"] >= r["c12"]


def test_kanonymity_accounts_every_customer(spark, sf_dir):
    from formula_1_spark.sources.tables import load_table

    rows = REGISTRY["kanonymity_audit"].fn(spark, sf_dir).collect()
    n_customers = load_table(spark, sf_dir, "customer").count()
    assert sum(r["n_customers"] for r in rows) == n_customers
    for r in rows:
        assert r["singleton_groups"] <= r["n_groups"]
        assert r["customers_at_risk"] <= r["n_customers"]
        assert 1 <= r["min_k"] <= r["max_k"]


def test_cluster_aware_split_is_leak_free(spark, sf_dir):
    from formula_1_spark.queries.dedup import _shared_cluster_assignment

    rows = REGISTRY["cluster_aware_split"].fn(spark, sf_dir).collect()
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # every clustered doc's whole cluster lands in ONE split: re-derive
    # the per-doc split and check max==min per cluster.
    assignment = _shared_cluster_assignment(spark, sf_dir)
    b = (
        F.conv(
            F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    spans = (
        assignment.withColumn("b", b)
        .groupBy("cluster_id")
        .agg((F.max("b") != F.min("b")).alias("spans"))
        .filter("spans")
        .count()
    )
    assert spans == 0
    from formula_1_spark.sources.tables import load_table

    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, sf_dir, "documents"
    ).count()


def test_source_ablation_accounts_all_tokens(spark, sf_dir):
    rows = REGISTRY["source_ablation_impact"].fn(spark, sf_dir).collect()
    from formula_1_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_all = (
        docs.select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r["n_tokens"] for r in rows) == n_all
    v_all = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .distinct()
        .count()
    )
    # exclusive types are disjoint across sources: their union is bounded
    # by (and here, since every type lives somewhere, <=) the vocabulary.
    assert sum(r["exclusive_types"] for r in rows) <= v_all
    for r in rows:
        assert 0 <= r["token_share_ppm"] <= 1_000_000
        assert r["ttr_without_ppm"] > 0


def test_rolling_median_matches_pandas(spark, sf_dir):
    """Independent recomputation: pandas rolling(7, min_periods=1).median
    per user over the same ordered cents."""
    from formula_1_spark.sources.tables import load_table

    events = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            "ts",
            "event_id",
            F.floor(F.col("value") * 100).cast("bigint").alias("v"),
        )
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    events["roll_med"] = (
        events.groupby("user_id")["v"]
        .rolling(7, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    above = (
        (events["v"] > events["roll_med"]).groupby(events["event_type"]).sum()
    )
    got = {
        r["event_type"]: r["n_above_trailing_median"]
        for r in REGISTRY["events_rolling_median"].fn(spark, sf_dir).collect()
    }
    assert got == {k: int(v) for k, v in above.items()}


def test_code_switch_audit_bounds(spark, sf_dir):
    rows = REGISTRY["code_switch_audit"].fn(spark, sf_dir).collect()
    from formula_1_spark.sources.tables import load_table

    assert sum(r["docs_total"] for r in rows) == load_table(
        spark, sf_dir, "documents"
    ).count()
    for r in rows:
        assert 0 <= r["code_switched_docs"] <= r["docs_total"]
        assert 0 <= r["max_langs_present"] <= 3


def test_split_ngram_coverage_shape(spark, sf_dir):
    rows = REGISTRY["split_ngram_coverage"].fn(spark, sf_dir).collect()
    assert {r["split"] for r in rows} == {"val", "test"}
    for r in rows:
        assert 0 < r["covered_grams"] <= r["n_grams"]
        assert r["coverage_ppm"] == r["covered_grams"] * 1000000 // r["n_grams"]


def test_boilerplate_filter_df_threshold(spark, sf_dir):
    rows = REGISTRY["boilerplate_phrase_filter"].fn(spark, sf_dir).collect()
    n_phrases = {r["corpus_boiler_phrases"] for r in rows}
    assert len(n_phrases) == 1  # corpus-level constant on every row
    # independently recount boilerplate bigrams
    from formula_1_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = docs.count()
    toks = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)) - 1),
        lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
    )
    df_counts = (
        docs.select("doc_id", F.explode(bigrams).alias("g"))
        .distinct()
        .groupBy("g")
        .count()
    )
    expected = df_counts.filter(F.col("count") * 100 > 30 * d).count()
    assert n_phrases == {expected}


def test_source_quality_calibration_buckets(spark, sf_dir):
    rows = REGISTRY["source_quality_calibration"].fn(spark, sf_dir).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, bs in by_source.items():
        bs.sort(key=lambda r: r["quartile"])
        assert [b["quartile"] for b in bs] == list(
            range(1, len(bs) + 1)
        )
        # score ranges are disjoint and ordered across buckets
        for a, b in zip(bs, bs[1:]):
            assert a["max_q"] < b["min_q"]


def test_winnow_fingerprint_invariants(spark, sf_dir):
    rows = REGISTRY["winnow_fingerprint_dedup"].fn(spark, sf_dir).collect()
    from formula_1_spark.sources.tables import load_table

    assert sum(r["docs_total"] for r in rows) == load_table(
        spark, sf_dir, "documents"
    ).count()
    shared = {r["shared_fps"] for r in rows}
    assert len(shared) == 1  # corpus-level constant on every row
    for r in rows:
        assert r["docs_fingerprinted"] <= r["docs_total"]
        assert r["dup_candidate_docs"] <= r["docs_fingerprinted"]
        assert r["total_fps"] >= r["docs_fingerprinted"]


def test_tokenizer_fertility_recompute_one_group(spark, sf_dir):
    import re

    import duckdb

    from formula_1_spark.queries.text_analysis import BPE_PATTERN

    rows = REGISTRY["tokenizer_fertility_audit"].fn(spark, sf_dir).collect()
    r0 = rows[0]
    docs = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE lang = '{r0['lang']}' AND source = '{r0['source']}'"
    ).fetchall()
    pat = re.compile(BPE_PATTERN)
    words = sum(len(re.split(r"\s+", t.strip())) for (t,) in docs)
    segs = sum(len(pat.findall(t)) for (t,) in docs)
    byts = sum(len(t.encode("utf-8")) for (t,) in docs)
    assert r0["docs"] == len(docs)
    assert r0["words"] == words
    assert r0["bpe_segments"] == segs
    assert r0["utf8_bytes"] == byts
    assert r0["fertility_ppm"] == segs * 1_000_000 // words


def test_zipf_doubling_monotone(spark, sf_dir):
    rows = REGISTRY["zipf_rank_doubling"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["rank"] in {1, 2, 4, 8, 16, 32, 64, 128}
        # frequency is non-increasing in rank
        assert r["freq"] >= r["freq_at_double"]
        assert r["doubling_ratio_ppm"] >= 1_000_000


def test_oov_rate_token_totals(spark, sf_dir):
    import duckdb

    rows = REGISTRY["oov_rate_audit"].fn(spark, sf_dir).collect()
    (total,) = duckdb.sql(
        "SELECT COUNT(1) FROM (SELECT unnest(string_split(text, ' ')) "
        f"FROM read_parquet('{sf_dir}/documents.parquet'))"
    ).fetchone()
    assert sum(r["tokens_total"] for r in rows) == total
    for r in rows:
        assert 0 <= r["oov_tokens"] <= r["tokens_total"]
        assert r["oov_ppm"] == r["oov_tokens"] * 1_000_000 // r["tokens_total"]


def test_event_attribution_matches_pandas(spark, sf_dir):
    import duckdb

    pdf = duckdb.sql(
        "SELECT user_id, event_type, ts, event_id, "
        "CAST(round(value * 100) AS BIGINT) AS cents "
        f"FROM read_parquet('{sf_dir}/events.parquet') "
        "ORDER BY user_id, ts, event_id"
    ).df()
    expected: dict[tuple, list] = {}
    for _, g in pdf.groupby("user_id", sort=False):
        first = g.iloc[0]["event_type"]
        last_np = None
        for _, e in g.iterrows():
            if e["event_type"] == "purchase":
                key = (first, last_np or "none")
                agg = expected.setdefault(key, [0, 0])
                agg[0] += 1
                agg[1] += int(e["cents"])
            if e["event_type"] != "purchase":
                last_np = e["event_type"]
    got = {
        (r["first_touch"], r["last_touch"]): [r["purchases"], r["revenue_cents"]]
        for r in REGISTRY["event_attribution_first_last"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expected


def test_ldiversity_bounds(spark, sf_dir):
    import duckdb

    rows = REGISTRY["ldiversity_audit"].fn(spark, sf_dir).collect()
    (n_orders,) = duckdb.sql(
        f"SELECT COUNT(1) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()
    assert sum(r["qid_groups"] for r in rows) > 0
    assert sum(r["orders_at_risk"] for r in rows) <= n_orders
    for r in rows:
        assert r["singleton_groups"] <= r["failing_groups"] <= r["qid_groups"]
        assert 1 <= r["min_l"] <= r["max_l"] <= 5  # 5 order priorities


def test_proportional_allocation_sums_to_budget(spark, sf_dir):
    rows = REGISTRY["proportional_allocation_plan"].fn(spark, sf_dir).collect()
    assert sum(r["allocated"] for r in rows) == 1000
    base = sum(r["quota_base"] for r in rows)
    assert sum(r["got_extra"] for r in rows) == 1000 - base
    for r in rows:
        assert r["allocated"] - r["quota_base"] in (0, 1)
    # Hamilton: extras go to the largest remainders, so no stratum left
    # without an extra may out-remainder one that got an extra.
    with_extra = [r for r in rows if r["got_extra"] == 1]
    without = [r for r in rows if r["got_extra"] == 0]
    if with_extra and without:
        assert max(r["remainder"] for r in without) <= min(
            r["remainder"] for r in with_extra
        )


def test_small_cell_suppression_partition(spark, sf_dir):
    import duckdb

    rows = REGISTRY["small_cell_suppression"].fn(spark, sf_dir).collect()
    (n_orders,) = duckdb.sql(
        f"SELECT COUNT(1) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()
    assert (
        sum(r["suppressed_orders"] + r["published_orders"] for r in rows)
        == n_orders
    )
    for r in rows:
        assert r["suppressed_cells"] <= r["cells"]


def test_vocab_coverage_curve_monotone(spark, sf_dir):
    import duckdb

    rows = REGISTRY["vocab_coverage_curve"].fn(spark, sf_dir).collect()
    assert [r["vocab_size"] for r in rows] == [
        64, 128, 256, 512, 1024, 2048, 4096, 8192,
    ]
    (total,) = duckdb.sql(
        "SELECT SUM(len(string_split(text, ' '))) "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()
    for a, b in zip(rows, rows[1:]):
        # coverage can only grow with vocabulary size
        assert a["covered_tokens"] <= b["covered_tokens"]
        assert a["terms_in_vocab"] <= b["terms_in_vocab"]
    for r in rows:
        assert r["terms_in_vocab"] <= r["vocab_size"]
        assert 0 < r["covered_tokens"] <= total
        assert r["coverage_ppm"] == r["covered_tokens"] * 1_000_000 // total


def test_kappa_lang_agreement_identities(spark, sf_dir):
    rows = REGISTRY["kappa_lang_agreement"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["po_ppm"] <= 1_000_000
        assert 0 < r["pe_ppm"] <= 1_000_000
        assert r["po_ppm"] * r["n_docs"] // 1_000_000 <= r["agree"] + 1
        if r["pe_ppm"] >= 1_000_000:
            assert r["kappa_ppm"] == 1_000_000
        else:
            # both engines truncate integer division toward zero
            num = (r["po_ppm"] - r["pe_ppm"]) * 1_000_000
            den = 1_000_000 - r["pe_ppm"]
            q = abs(num) // den
            assert r["kappa_ppm"] == (q if num >= 0 else -q)


def test_chisq_drift_null_distribution(spark, sf_dir):
    rows = REGISTRY["orders_priority_chisq_drift"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["chisq_index_ppm"] >= 0
        assert 0 <= r["max_delta_ppm"] < 1_000_000
        # the index bounds the largest single-cell contribution
        assert (
            r["chisq_index_ppm"]
            >= r["max_delta_ppm"] ** 2 // 1_000_000 - 5
        )


def test_user_contribution_bounds_partition(spark, sf_dir):
    import duckdb

    rows = REGISTRY["user_contribution_bounds"].fn(spark, sf_dir).collect()
    (n_orders,) = duckdb.sql(
        f"SELECT COUNT(1) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()
    assert sum(r["orders_total"] for r in rows) == n_orders
    for r in rows:
        assert 1 <= r["l1_sensitivity"] <= r["orders_total"]
        assert r["contributors"] * r["l1_sensitivity"] >= r["orders_total"]
        assert r["dominated"] == (
            r["l1_sensitivity"] * 2 > r["orders_total"]
        )
        assert (
            r["dominance_ppm"]
            == r["l1_sensitivity"] * 1_000_000 // r["orders_total"]
        )


def test_rrf_fusion_identities(spark, sf_dir):
    rows = REGISTRY["rrf_rank_fusion"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    # fused rank is a 1..n permutation in rrf_ppm-descending order
    assert [r["fused_rank"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert (a["rrf_ppm"], -a["doc_id"]) >= (b["rrf_ppm"], -b["doc_id"])
    for r in rows:
        expect = 0
        if r["bm25_rank"] > 0:
            expect += 1_000_000 // (60 + r["bm25_rank"])
        if r["tfidf_rank"] > 0:
            expect += 1_000_000 // (60 + r["tfidf_rank"])
        assert r["rrf_ppm"] == expect
        # present in at least one list
        assert r["bm25_rank"] > 0 or r["tfidf_rank"] > 0


def test_bloom_decontam_no_false_negatives(spark, sf_dir):
    rows = REGISTRY["bloom_decontam_audit"].fn(spark, sf_dir).collect()
    assert [r["bucket"] for r in rows] == list(range(8))
    for r in rows:
        # Bloom filters admit false positives, NEVER false negatives
        assert r["false_neg"] == 0
        assert r["bloom_hits"] == r["true_hits"] + r["false_pos"]
        assert r["true_hits"] <= r["grams_probed"]
        neg = r["grams_probed"] - r["true_hits"]
        expect = 0 if neg == 0 else r["false_pos"] * 1_000_000 // neg
        assert r["fpr_ppm"] == expect
