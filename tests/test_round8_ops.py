"""Round-8 golden tests: suffix-doubling ExactSubstr invariants and the
IVF n_probe recall-curve monotonicity (more probes can only widen the
candidate set, so candidates and recall are non-decreasing in n_probe)."""

from __future__ import annotations

from formula_1_spark.queries.registry import load_all

REGISTRY = load_all()

_POW2 = {0, 1, 2, 4, 8, 16, 32, 64}


def test_ivf_nprobe_curve_monotone(spark, sf_dir):
    rows = REGISTRY["ivf_nprobe_recall_curve"].fn(spark, sf_dir).collect()
    assert len(rows) == 40, "4 sweep points x 10 queries"
    by_q: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.recall_ppm <= 1_000_000
        assert r.hits_top10 <= 10
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.n_probe)
        assert [r.n_probe for r in rs] == [1, 2, 4, 8]
        for a, b in zip(rs, rs[1:]):
            # a larger probe budget is a superset of candidates
            assert b.n_candidates >= a.n_candidates, q
            assert b.hits_top10 >= a.hits_top10, q


def test_ivf_nprobe_full_sweep_matches_registered_audit(spark, sf_dir):
    """n_probe=2 on the curve must agree with ann_recall_audit's 'ivf'
    rows — both are the same 8-cell/2-iteration quantizer at n_probe=2,
    computed by different code paths."""
    curve = {
        r.query_id: r.hits_top10
        for r in REGISTRY["ivf_nprobe_recall_curve"].fn(spark, sf_dir).collect()
        if r.n_probe == 2
    }
    audit = {
        r.query_id: r.hits_top10
        for r in REGISTRY["ann_recall_audit"].fn(spark, sf_dir).collect()
        if r.method == "ivf"
    }
    assert curve == audit


def test_exactsubstr_profile_bounds(spark, sf_dir):
    rows = REGISTRY["exactsubstr_dup50_profile"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.dup_positions >= r.cross_doc_positions >= 0
        assert r.dup_groups >= 1
        # each duplicated group contributes >= 1 position to some source
        assert r.dup_positions >= 1


def test_exactsubstr_excision_coverage_floor(spark, sf_dir):
    """Every hit doc flags at least one full 50-token interval, so merged
    coverage is >= 50 tokens per hit doc; ppm stays in range."""
    rows = REGISTRY["exactsubstr_excision50"].fn(spark, sf_dir).collect()
    assert rows
    assert any(r.docs_hit > 0 for r in rows), "no excisions found at all"
    for r in rows:
        assert r.tokens_removed >= 50 * r.docs_hit
        assert 0 <= r.removed_ppm <= 1_000_000


def test_lrs_values_on_pow2_grid(spark, sf_dir):
    rows = REGISTRY["suffix_lrs_pow2"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.lrs_pow2 in _POW2 for r in rows)
    # the corpus repeats tokens constantly; SOME doc repeats a token
    assert any(r.lrs_pow2 >= 1 for r in rows)


def test_lrs_never_exceeds_half_doc_length(spark, sf_dir):
    """A repeated substring of length L needs two (possibly overlapping)
    occurrences, so L <= len - 1; on the pow2 grid lrs <= 2^floor(log2(
    len - 1))."""
    from pyspark.sql import functions as F

    from formula_1_spark.functions.text import token_count
    from formula_1_spark.sources.tables import load_table

    lens = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", token_count("text").alias("n"))
        .collect()
    }
    for r in REGISTRY["suffix_lrs_pow2"].fn(spark, sf_dir).collect():
        assert r.lrs_pow2 <= max(lens[r.doc_id] - 1, 0)


def test_threshold_curve_monotone_in_k(spark, sf_dir):
    """A duplicated K-window's prefix is a duplicated shorter window, so
    every curve metric is non-increasing as K grows."""
    rows = sorted(
        REGISTRY["exactsubstr_threshold_curve"].fn(spark, sf_dir).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [16, 24, 32, 50, 64]
    for a, b in zip(rows, rows[1:]):
        assert b.dup_positions <= a.dup_positions
        assert b.cross_doc_positions <= a.cross_doc_positions


def test_decontam50_train_side_only(spark, sf_dir):
    from formula_1_spark.queries.decontam import split_bucket
    from formula_1_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = REGISTRY["exactsubstr_decontam50"].fn(spark, sf_dir).collect()
    train_ids = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn("b", split_bucket("doc_id"))
        .filter(F.col("b") <= 7)
        .collect()
    }
    for r in rows:
        assert r.train_id in train_ids, "flagged doc must be train-split"
        assert r.contam_positions >= 1 and r.eval_docs_hit >= 1


def test_kmv_overlap_estimator_sanity(spark, sf_dir):
    """KMV soundness: a shared sketch value IS a real shared gram, so
    est > 0 implies exact > 0; and disjoint vocabularies estimate 0."""
    rows = REGISTRY["kmv_source_overlap"].fn(spark, sf_dir).collect()
    n_src = len({r.source_a for r in rows} | {r.source_b for r in rows})
    assert len(rows) == n_src * (n_src - 1) // 2, "full pair grid"
    for r in rows:
        assert 0 <= r.est_jaccard_ppm <= 1_000_000
        assert 0 <= r.exact_jaccard_ppm <= 1_000_000
        if r.exact_jaccard_ppm == 0:
            assert r.est_jaccard_ppm == 0, (r.source_a, r.source_b)
        if r.est_jaccard_ppm > 0:
            assert r.exact_jaccard_ppm > 0, (r.source_a, r.source_b)
        assert r.abs_err_ppm == abs(r.est_jaccard_ppm - r.exact_jaccard_ppm)


def test_ivfpq_result_shape(spark, sf_dir):
    """IVFPQ returns all 10 queries with dense ranks from 1 (candidate
    pool permitting). The VALUE-level guarantee (coarse training, cell
    probing, ADC, re-rank all bit-exact) is carried by the DuckDB oracle
    in tests/test_oracle_parity.py; this golden only pins the shape."""
    rows = REGISTRY["similarity_ann_ivfpq"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 10
    for q, rs in by_q.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(ranks) + 1)), q


def test_neyman_allocations_sum_to_budget(spark, sf_dir):
    rows = REGISTRY["neyman_allocation_plan"].fn(spark, sf_dir).collect()
    assert sum(r.allocated for r in rows) == 500
    for r in rows:
        assert r.allocated >= 0
        if r.sigma_ppm == 0:
            assert r.allocated <= 1, "zero-variance stratum only via remainder"


def test_clustering_coefficient_bounds(spark, sf_dir):
    rows = REGISTRY["part_copurchase_clustering"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.degree >= 2
        assert 0 <= r.cc_ppm <= 1_000_000
        # T is bounded by the wedge count at the node
        assert r.triangles <= r.degree * (r.degree - 1) // 2


def test_km_survival_invariants(spark, sf_dir):
    """KM survival is non-increasing, starts <= 1e6, and the risk-set
    accounting balances: n_risk[j+1] = n_risk[j] - conv[j] - censored[j]."""
    rows = sorted(
        REGISTRY["events_conversion_survival"].fn(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == list(range(14))
    assert rows[0].n_risk > 0
    for a, b in zip(rows, rows[1:]):
        assert b.n_risk == a.n_risk - a.n_conv - a.n_censored
        assert b.survival_ppm <= a.survival_ppm
    for r in rows:
        assert 0 <= r.survival_ppm <= 1_000_000
        assert 0 <= r.hazard_ppm <= 1_000_000


def test_cusum_changepoint_shape(spark, sf_dir):
    rows = REGISTRY["orders_cusum_changepoint"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    assert sum(r.is_changepoint for r in rows) == 1
    flagged = max(rows, key=lambda r: abs(r.cusum_micro))
    assert flagged.is_changepoint == 1, "argmax |cusum| must carry the flag"


def test_centroid_similarity_matrix_shape(spark, sf_dir):
    rows = REGISTRY["label_centroid_similarity"].fn(spark, sf_dir).collect()
    labels = {r.label_a for r in rows} | {r.label_b for r in rows}
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    for r in rows:
        assert r.label_a < r.label_b
        assert -1_000_000 <= r.centroid_cos_q <= 1_000_000
        assert r.n_a > 0 and r.n_b > 0


def test_greedy_cover_submodular_gains(spark, sf_dir):
    """Marginal gains are non-increasing (submodularity) and the covered
    total is exactly the cumulative sum of gains (picks never overlap
    their own prior coverage)."""
    rows = sorted(
        REGISTRY["greedy_gram_cover"].fn(spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [1, 2, 3, 4]
    assert len({r.doc_id for r in rows}) == 4, "picks must be distinct docs"
    for a, b in zip(rows, rows[1:]):
        assert b.gain <= a.gain, "greedy gains must be non-increasing"
    cum = 0
    for r in rows:
        cum += r.gain
        assert r.covered_total == cum
