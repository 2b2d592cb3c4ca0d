"""Round-9 regression tests: scan-sizing conf parsing, FilePartition
packing replay, shared-relation memo eviction, and the cumsum grand-total
plumbing (the token_budget_selection single-scan fix)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from formula_1_spark.sources.tables import (
    _conf_bytes,
    _estimated_scan_partitions,
)


class _FakeConf:
    def __init__(self, values):
        self._values = values

    def get(self, key, default=None):
        return self._values.get(key, default)


class _FakeSpark:
    def __init__(self, values):
        self.conf = _FakeConf(values)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("128m", 128 << 20),
        ("128mb", 128 << 20),  # two-letter suffix must not parse as 'b'
        ("1gb", 1 << 30),
        ("512kb", 512 << 10),
        ("1tb", 1 << 40),
        ("4194304", 4194304),
        ("4194304b", 4194304),
        ("  2G ", 2 << 30),
    ],
)
def test_conf_bytes_suffixes(raw, expected):
    spark = _FakeSpark({"k": raw})
    assert _conf_bytes(spark, "k", -1) == expected


def test_conf_bytes_fallbacks():
    assert _conf_bytes(_FakeSpark({}), "missing", 99) == 99
    # Unparseable values fall back instead of crashing every fan_out call.
    assert _conf_bytes(_FakeSpark({"k": "not-a-size"}), "k", 77) == 77


def test_scan_partition_packing_binpacks_small_files(tmp_path):
    # 16 tiny files must NOT count as 16 partitions: Spark bin-packs them.
    # Here maxSplit = totalBytes/parallelism = ~8MiB and each file costs
    # size + openCost (4MiB) against the bin, so exactly 2 pack per
    # partition — 8 partitions, where the old len(files) shortcut said 16.
    files = []
    for i in range(16):
        p = tmp_path / f"f{i}.parquet"
        p.write_bytes(b"x" * 1024)
        files.append(str(p))
    spark = _FakeSpark({})
    assert _estimated_scan_partitions(spark, files, parallelism=8) == 8


def test_scan_partition_packing_splits_large_file(tmp_path):
    # One 16 MiB file with maxPartitionBytes=1m: ~16 splits, each filling
    # a partition on its own (split + openCost > maxSplit).
    p = tmp_path / "big.parquet"
    p.write_bytes(b"x" * (16 << 20))
    spark = _FakeSpark(
        {
            "spark.sql.files.maxPartitionBytes": "1mb",
            "spark.sql.files.openCostInBytes": "0",
        }
    )
    assert _estimated_scan_partitions(spark, [str(p)], parallelism=4) == 16


def test_memo_caches_keep_one_entry_per_path(spark, sf_dir):
    from formula_1_spark.queries import span_extents
    from formula_1_spark.queries.dedup import _SHARED, _shared_relations

    app_id = spark.sparkContext.applicationId

    # Shared dedup relations: seed a fake superseded entry for the same
    # path (same app, older mtime) plus a dead-app entry — both must be
    # evicted on the next build; the live key stays.
    _shared_relations(spark, sf_dir)
    live = [k for k in _SHARED if k[0] == app_id]
    assert len(live) == 1
    path = live[0][1]
    fake_df = spark.range(1)
    _SHARED[(app_id, path, 0, 0)] = {"tok": fake_df}
    _SHARED[("dead-app", path, 0, 0)] = {"tok": fake_df}
    _SHARED.pop(live[0])
    _shared_relations(spark, sf_dir)
    assert (app_id, path, 0, 0) not in _SHARED
    assert ("dead-app", path, 0, 0) not in _SHARED
    assert sum(1 for k in _SHARED if k[1] == path) == 1

    # Postings memo: same contract.
    span_extents._bucketed_postings(spark, sf_dir)
    live = [k for k in span_extents._POSTINGS if k[0] == app_id]
    assert len(live) == 1
    path = live[0][1]
    span_extents._POSTINGS[(app_id, path, 0, 0)] = spark.range(1)
    span_extents._POSTINGS.pop(live[0])
    span_extents._bucketed_postings(spark, sf_dir)
    assert (app_id, path, 0, 0) not in span_extents._POSTINGS
    assert sum(1 for k in span_extents._POSTINGS if k[1] == path) == 1


def test_cumsum_total_alias_matches_sum(spark):
    from formula_1_spark.operators.windows import global_ordered_cumsum

    df = spark.range(1, 101).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = global_ordered_cumsum(
        df, [F.asc("k")], "v", "cum", total_alias="total"
    )
    rows = out.orderBy("k").collect()
    expected_total = sum(i % 7 for i in range(1, 101))
    assert all(r["total"] == expected_total for r in rows)
    assert rows[-1]["cum"] == expected_total
    running = 0
    for r in rows:
        running += r["v"]
        assert r["cum"] == running


def test_cumsum_range_parts_capped_at_input(spark):
    # An 8-partition input on a 200-shuffle-partition session must not
    # produce a 200-partition range exchange.
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        from formula_1_spark.operators.windows import global_ordered_cumsum

        df = spark.range(0, 1000, numPartitions=8).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        )
        out = global_ordered_cumsum(df, [F.asc("k")], "v", "cum")
        assert out.rdd.getNumPartitions() <= 8
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def test_semdedup_prune_keeps_centroid_extrema(spark, sf_dir):
    """SemDeDup invariants: pruned <= pairs per cell (each pair prunes at
    most one NEW doc), kept + pruned == vectors, and ppm math exact."""
    from formula_1_spark.queries.dedup import semdedup_prune_report

    rows = semdedup_prune_report(spark, sf_dir).collect()
    assert rows, "no cells"
    for r in rows:
        assert r["kept_docs"] + r["pruned_docs"] == r["n_vectors"]
        assert r["pruned_docs"] <= r["dup_pairs"] or r["dup_pairs"] == 0
        assert r["pruned_ppm"] == r["pruned_docs"] * 1_000_000 // r["n_vectors"]


def test_unimax_waterfill_invariants(spark, sf_dir):
    """UniMax: allocations never exceed capacity, capped langs form the
    ascending-capacity prefix, total allocation <= budget, uncapped langs
    share equally."""
    from formula_1_spark.queries.mixture import unimax_budget_allocation

    rows = sorted(
        unimax_budget_allocation(spark, sf_dir).collect(),
        key=lambda r: (r["capacity"], r["lang"]),
    )
    assert rows
    budget = sum(r["n_tokens"] for r in rows)
    assert all(r["allocated"] <= r["capacity"] for r in rows)
    assert sum(r["allocated"] for r in rows) <= budget
    flags = [r["capped"] for r in rows]
    assert flags == sorted(flags, reverse=True), "capped must be a prefix"
    uncapped = {r["allocated"] for r in rows if not r["capped"]}
    assert len(uncapped) <= 1, "uncapped langs share equally"


def test_lsh_band_planning_scurve_monotone(spark, sf_dir):
    """More bands (same 128 perms) = looser: expected candidates rise and
    expected missed dups fall monotonically with the band count."""
    from formula_1_spark.queries.dedup_tuning import lsh_band_planning

    rows = sorted(lsh_band_planning(spark, sf_dir).collect(),
                  key=lambda r: r["bands"])
    assert len(rows) == 5
    cands = [r["exp_candidates_micro"] for r in rows]
    missed = [r["exp_missed_dup_micro"] for r in rows]
    assert cands == sorted(cands), "candidates must rise with bands"
    assert missed == sorted(missed, reverse=True), "misses fall with bands"
    for r in rows:
        assert r["bands"] * r["rows_per_band"] == 128
        assert 0 <= r["exp_candidates_micro"] <= r["pairs_scored"] * 1_000_000


def test_simhash_roc_confusion_consistency(spark, sf_dir):
    """TP+FN and FP+TN are threshold-invariant (same population), recall
    is monotone nondecreasing in the Hamming threshold."""
    from formula_1_spark.queries.dedup_tuning import simhash_hamming_roc

    rows = sorted(simhash_hamming_roc(spark, sf_dir).collect(),
                  key=lambda r: r["max_hamming"])
    assert rows
    pos = {r["tp"] + r["fn"] for r in rows}
    neg = {r["fp"] + r["tn"] for r in rows}
    assert len(pos) == 1 and len(neg) == 1
    recalls = [r["recall_ppm"] for r in rows]
    assert recalls == sorted(recalls)


def test_soft_dedup_bounded_by_hard_and_raw(spark, sf_dir):
    """Soft-effective token mass sits between hard-dedup kept mass and the
    raw total for every source (1/c weighting can only shrink, and never
    below keep-one-per-cluster)."""
    from formula_1_spark.queries.dedup_tuning import soft_dedup_weights

    rows = soft_dedup_weights(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["soft_tokens_micro"] <= r["tokens_total"] * 1_000_000
        # floor-division slack: each doc loses < 1 micro-token to flooring
        assert (r["soft_tokens_micro"]
                >= r["hard_kept_tokens"] * 1_000_000 - r["n_docs"])


def test_hits_scores_bounded_and_ranked(spark, sf_dir):
    """HITS: scores nonnegative and on the (2x-slack) scale grid; both
    rank columns start at 1."""
    from formula_1_spark.operators.graph import HITS_SCALE
    from formula_1_spark.queries.graph_rank import trade_hits_hubs_authorities

    rows = trade_hits_hubs_authorities(spark, sf_dir).collect()
    assert rows
    assert min(r["hub_rank"] for r in rows) == 1
    assert min(r["auth_rank"] for r in rows) == 1
    for r in rows:
        assert 0 <= r["hub_q"] <= 2 * HITS_SCALE
        assert 0 <= r["auth_q"] <= 2 * HITS_SCALE


def test_peak_concurrency_invariants(spark, sf_dir):
    """Sweep-line peaks: every supplier peak >= 1, and the peak never
    exceeds its shipment count (intervals can at most all overlap)."""
    from formula_1_spark.queries.windows_events import supplier_peak_concurrency

    rows = supplier_peak_concurrency(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["peak_concurrent"] <= r["n_shipments"]


def test_watermark_lateness_monotone_in_delay(spark, sf_dir):
    """A longer watermark delay can only accept MORE events."""
    from formula_1_spark.queries.windows_events import watermark_late_audit

    rows = sorted(watermark_late_audit(spark, sf_dir).collect(),
                  key=lambda r: r["delay_s"])
    lates = [r["n_late"] for r in rows]
    assert lates == sorted(lates, reverse=True)


def test_curriculum_phases_partition_and_order(spark, sf_dir):
    """Phases partition the corpus token mass, and the global quality
    floor of phase 1 is >= the global quality ceiling of phase 3."""
    from formula_1_spark.queries.curation import curriculum_phase_assignment

    rows = curriculum_phase_assignment(spark, sf_dir).collect()
    assert {r["phase"] for r in rows} == {1, 2, 3}
    p1_min = min(r["min_quality_ppm"] for r in rows if r["phase"] == 1)
    p3_max = max(r["max_quality_ppm"] for r in rows if r["phase"] == 3)
    assert p1_min >= p3_max


def test_source_diversity_effective_bounds(spark, sf_dir):
    """1 <= effective sources <= n_sources (Simpson inverse bounds)."""
    from formula_1_spark.queries.corpus_audit import source_diversity_index

    rows = source_diversity_index(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # ppm flooring makes the inverse slightly optimistic; 1% slack
        assert 990 <= r["effective_sources_milli"] <= r["n_sources"] * 1010


def test_rowgroup_audit_accounts_for_all_rows(spark):
    """The harvested footer stats must cover every fixture row, and the
    central-box predicate must leave at least one non-skippable group."""
    from formula_1_spark.queries.footer_stats import (
        _N_ROWS,
        parquet_rowgroup_skipping_audit,
    )

    rows = parquet_rowgroup_skipping_audit(spark, "unused").collect()
    assert sum(r["n_rows"] for r in rows) == _N_ROWS
    assert sum(r["rows_skippable"] for r in rows) < _N_ROWS
    for r in rows:
        assert 0 <= r["skip_ppm"] <= 1_000_000


def test_sequence_ngram_confidence_bounded(spark, sf_dir):
    """Trigram confidence is a fraction of its prefix support."""
    from formula_1_spark.queries.windows_events import event_sequence_ngrams

    rows = event_sequence_ngrams(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["confidence_ppm"] <= 1_000_000
        assert r["n_users"] <= r["support"]


def test_matryoshka_overlap_sane(spark, sf_dir):
    """Full-dim row recovers itself (overlap == k on dims=64), truncated
    overlaps never exceed it."""
    from formula_1_spark.queries.embedding_analytics import (
        _MRL_K,
        _MRL_PROBES,
        matryoshka_truncation_audit,
    )

    rows = {r["dims"]: r for r in
            matryoshka_truncation_audit(spark, sf_dir).collect()}
    full = rows[64]
    assert full["overlap_total"] == _MRL_PROBES * _MRL_K
    assert full["mean_overlap_milli"] == 1000
    for d, r in rows.items():
        assert r["overlap_total"] <= full["overlap_total"]


def test_audio_energy_frame_accounting(spark, sf_dir):
    """Kernel vs closed form: n_frames == ceil(n_chars / 128) for the
    top-ranked media, and activity ppm is exact."""
    from formula_1_spark.queries.multimodal import media_audio_energy_vad
    from formula_1_spark.sources.tables import load_table

    rows = media_audio_energy_vad(spark, sf_dir).collect()
    assert rows
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in rows:
        n_chars = docs[r["media_id"]]
        assert r["n_frames"] == (n_chars + 127) // 128
        assert r["active_ppm"] == r["active_frames"] * 1_000_000 // r["n_frames"]
        assert r["media_id"] % 3 == 1  # audio slice of the media adapter


def test_kmeanspp_weights_partition_corpus(spark, sf_dir):
    """Candidate weights sum to the corpus size (every vector assigned
    exactly once); round 0 is the single min-id seed; no candidate
    repeats across rounds."""
    from formula_1_spark.queries.embedding_analytics import (
        kmeanspp_parallel_init,
    )
    from formula_1_spark.sources.tables import table_row_count

    rows = kmeanspp_parallel_init(spark, sf_dir).collect()
    n = table_row_count(spark, sf_dir, "embeddings")
    assert sum(r["weight"] for r in rows) == n
    assert [r["cand_id"] for r in rows if r["round_added"] == 0] == [
        min(r["cand_id"] for r in rows)
    ]
    ids = [r["cand_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_truncation_waste_monotone(spark, sf_dir):
    """Larger context limits lose strictly no more tokens or docs."""
    from formula_1_spark.queries.curation import context_truncation_waste

    rows = sorted(context_truncation_waste(spark, sf_dir).collect(),
                  key=lambda r: r["ctx_limit"])
    lost = [r["tokens_lost"] for r in rows]
    docs = [r["docs_truncated"] for r in rows]
    assert lost == sorted(lost, reverse=True)
    assert docs == sorted(docs, reverse=True)


def test_checksum_reconcile_localizes_mutations(spark, sf_dir):
    """Every surfaced bucket contains a planted mutation or deletion, and
    every planted key's bucket is surfaced — no false hits, no misses."""
    from formula_1_spark.queries.lake_maintenance import (
        _CK_BUCKET,
        _CK_DEL,
        _CK_MUT,
        orders_checksum_reconcile,
    )
    from formula_1_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    keys = [
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderkey") % _CK_MUT == 0)
            | (F.col("o_orderkey") % _CK_DEL == 0)
        )
        .select("o_orderkey")
        .collect()
    ]
    expected = {k // _CK_BUCKET for k in keys}
    got = {r["bucket"] for r in
           orders_checksum_reconcile(spark, sf_dir).collect()}
    assert got == expected


def test_ipf_raking_converges_toward_marginals(spark, sf_dir):
    """After three rounds the column marginals are exact (last scale was
    by source) and the row marginals are within floor-division slack of
    the uniform target."""
    from collections import defaultdict

    from formula_1_spark.queries.mixture import _IPF_GRID, ipf_raking_weights

    rows = ipf_raking_weights(spark, sf_dir).collect()
    assert rows
    by_lang, by_src = defaultdict(int), defaultdict(int)
    for r in rows:
        assert r["rake_pp10m"] >= 0
        by_lang[r["lang"]] += r["rake_pp10m"]
        by_src[r["source"]] += r["rake_pp10m"]
    t_col = _IPF_GRID // len(by_src)
    for s, tot in by_src.items():
        # every cell loses < 1 unit to flooring
        assert t_col - len(by_lang) <= tot <= t_col, (s, tot, t_col)
    t_row = _IPF_GRID // len(by_lang)
    for lang, tot in by_lang.items():
        assert abs(tot - t_row) <= t_row * 0.15, (lang, tot, t_row)


def test_join_cardinality_estimate_within_sampling_error(spark, sf_dir):
    """The 1/16-key estimate lands within a loose sampling bound of the
    exact join size, and sign/abs err math is self-consistent."""
    from formula_1_spark.queries.sketches import (
        join_cardinality_estimate_audit,
    )

    rows = join_cardinality_estimate_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["keys_sampled"] <= r["n_keys"]
        assert r["exact_join_rows"] > 0
        # hash-sampling at 1/16 over hundreds of keys: generous 5x bound
        assert r["estimated_join_rows"] <= r["exact_join_rows"] * 5
        expect_sign = (
            1 if r["estimated_join_rows"] >= r["exact_join_rows"] else -1
        )
        assert (r["err_ppm"] >= 0) == (expect_sign == 1)
