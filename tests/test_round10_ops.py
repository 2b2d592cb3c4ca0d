"""Round-10 semantic tests: invariants of the new operators beyond the
oracle-parity gate — LPA partition/community structure, DoReMi weight
monotonicity, t-closeness EMD bounds, Lloyd-step accounting, JL
distortion centering, interval-overlap legality, conformal coverage."""

from __future__ import annotations

import pytest

from formula_1_spark.queries.registry import load_all

REGISTRY = load_all()


def test_lpa_operator_validates_iters(spark):
    from formula_1_spark.operators.graph import hits_quantized, label_propagation

    nodes = spark.range(3).withColumnRenamed("id", "node")
    edges = spark.createDataFrame([(0, 1, 2)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="iters"):
        label_propagation(nodes, edges, iters=0)
    with pytest.raises(ValueError, match="iters"):
        hits_quantized(nodes, edges, iters=0, weight_col="w")


def test_lpa_operator_two_cliques(spark):
    """Two triangles joined by one weak edge must resolve to two
    communities labeled by each clique's min node."""
    from formula_1_spark.operators.graph import label_propagation

    und = [(0, 1, 5), (1, 2, 5), (0, 2, 5), (3, 4, 5), (4, 5, 5), (3, 5, 5),
           (2, 3, 1)]
    edges = spark.createDataFrame(
        [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und],
        "src long, dst long, w long",
    )
    nodes = spark.range(6).withColumnRenamed("id", "node")
    got = {
        r["node"]: r["lbl"]
        for r in label_propagation(nodes, edges, iters=3).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_lpa_communities_partition_nations(spark, sf_dir):
    rows = REGISTRY["label_propagation_communities"].fn(spark, sf_dir).collect()
    nodes = [r["node"] for r in rows]
    assert sorted(nodes) == sorted(set(nodes))  # each nation exactly once
    # community labels are member node ids; sizes account for all nodes
    by_comm: dict[int, list] = {}
    for r in rows:
        by_comm.setdefault(r["community"], []).append(r)
    assert sum(len(v) for v in by_comm.values()) == len(rows)
    for comm, members in by_comm.items():
        assert all(m["comm_size"] == len(members) for m in members)


def test_doremi_weight_monotone_in_excess(spark, sf_dir):
    rows = REGISTRY["doremi_domain_reweight"].fn(spark, sf_dir).collect()
    assert rows, "no domains"
    total = sum(r["w_final_ppm"] for r in rows)
    # floor losses only: the simplex sum stays within a few ppm per domain
    assert 1_000_000 - 3 * len(rows) <= total <= 1_000_000 + len(rows)
    ordered = sorted(rows, key=lambda r: r["excess_ppm"])
    for lo, hi in zip(ordered, ordered[1:]):
        if hi["excess_ppm"] > lo["excess_ppm"]:
            assert hi["w_final_ppm"] >= lo["w_final_ppm"]


def test_tcloseness_emd_bounds(spark, sf_dir):
    rows = REGISTRY["tcloseness_audit"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["emd_ppm"] <= 1_000_000
        assert r["t_violation"] == (r["emd_ppm"] > 150_000)
    from formula_1_spark.sources.tables import load_table

    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders


def test_kmeans_lloyd_accounting(spark, sf_dir):
    from formula_1_spark.sources.tables import load_table

    rows = REGISTRY["kmeans_lloyd_iteration"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = [r["vec_id"] for r in emb.orderBy("vec_id").limit(8).collect()]
    assert sorted(r["cluster_id"] for r in rows) == sorted(seeds)
    assert sum(r["n_members"] for r in rows) == emb.count()
    assert all(r["inertia"] >= 0 and r["shift_sq"] >= 0 for r in rows)


def test_jl_distortion_centered(spark, sf_dir):
    rows = REGISTRY["random_projection_jl_audit"].fn(spark, sf_dir).collect()
    assert rows
    mean = sum(r["distortion_ppm"] for r in rows) / len(rows)
    # 16-dim +-1 sketch: unbiased estimator of the squared distance, so
    # the mean distortion sits near 1e6 (loose band for sampling noise)
    assert 600_000 <= mean <= 1_500_000
    assert all(r["orig_sq"] > 0 and r["est_sq"] >= 0 for r in rows)


def test_interval_overlap_pairs_legal(spark):
    # sf0.001 has no overlapping purchase intervals; use sf0.01 where the
    # event stream is dense enough to produce pairs worth asserting on.
    rows = (
        REGISTRY["interval_overlap_join"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert rows, "expected overlapping purchase intervals at sf0.01"
    seen = set()
    for r in rows:
        assert r["event_a"] < r["event_b"]
        assert r["user_a"] != r["user_b"]
        # duration is 60 + value % 240 in [60, 300); strict overlap
        assert 1 <= r["overlap_s"] < 300
        key = (r["event_a"], r["event_b"])
        assert key not in seen, "bucket dedupe failed"
        seen.add(key)


def test_conformal_coverage_guarantee(spark, sf_dir):
    rows = REGISTRY["conformal_coverage_audit"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # split-conformal guarantees >= 90% coverage in expectation; the
        # finite-sample band at sf0.001 calibration sizes is wide, so
        # assert a loose floor plus the exact quantile-index arithmetic.
        assert r["coverage_ppm"] >= 800_000, r
        assert r["k"] == (9 * (r["n_cal"] + 1) + 9) // 10
        assert r["qhat_cents"] >= 0
        assert r["covered"] <= r["n_test"]


def test_pass_at_k_bounds_and_exactness(spark, sf_dir):
    from math import comb

    rows = REGISTRY["pass_at_k_estimator"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n"] >= 5 and 0 <= r["c"] <= r["n"]
        assert 0 <= r["pass_at_k_ppm"] <= 1_000_000
        if r["c"] == 0:
            assert r["pass_at_k_ppm"] == 0
        if r["n"] - r["c"] < 5:
            assert r["pass_at_k_ppm"] == 1_000_000
        # the per-factor fold deviates from the exact rational by < k ppm
        exact = 1_000_000 * (1 - comb(r["n"] - r["c"], 5) / comb(r["n"], 5))
        assert abs(r["pass_at_k_ppm"] - exact) < 6, r


def test_ks_drift_statistic_bounds(spark, sf_dir):
    rows = REGISTRY["ks_drift_test"].fn(spark, sf_dir).collect()
    assert rows
    total = rows[0]["m"] + rows[0]["n_comp"]
    for r in rows:
        assert 0 <= r["ks_ppm"] <= 1_000_000
        assert r["m"] + r["n_comp"] == total  # complement accounting
        # the decision replays c(0.05)^2 in exact integers
        lhs = r["ks_ppm"] ** 2 * r["m"] * r["n_comp"]
        rhs = 1_844_164 * 10**12 * (r["m"] + r["n_comp"])
        assert r["drift_at_05"] == (lhs > rhs)


def test_byte_histogram_accounts_for_all_bytes(spark, sf_dir):
    from formula_1_spark.sources.tables import load_table

    rows = REGISTRY["media_byte_histogram"].fn(spark, sf_dir).collect()
    assert rows
    total_bytes = sum(r["n"] for r in rows)
    expected = (
        load_table(spark, sf_dir, "documents")
        .selectExpr("sum(octet_length(encode(text, 'UTF-8')))")
        .first()[0]
    )
    assert total_bytes == expected  # every payload byte lands in a bin
    for r in rows:
        assert 0 <= r["nibble"] <= 15 and r["n"] > 0
    by_type = {}
    for r in rows:
        by_type.setdefault(r["media_type"], 0)
        by_type[r["media_type"]] += r["share_ppm"]
    for t, s in by_type.items():
        assert 1_000_000 - 16 <= s <= 1_000_000, (t, s)  # floor losses only


def test_not_in_null_trap(spark, sf_dir):
    rows = REGISTRY["anti_join_null_semantics"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the key list always contains a NULL (1-in-97 orders at every sf)
        assert r["not_in_null_trap"] and r["n_not_in"] == 0
        assert 0 < r["n_not_exists"] <= r["n_customers"]


def test_rendezvous_balance_and_rebalance(spark, sf_dir):
    rows = REGISTRY["rendezvous_shard_assignment"].fn(spark, sf_dir).collect()
    assert sorted(r["shard"] for r in rows) == list(range(8))
    total = sum(r["n_docs"] for r in rows)
    moved = sum(r["moved_on_expand"] for r in rows)
    # HRW guarantee: adding shard 9 moves ~1/9 of docs (loose band)
    assert 0.04 * total <= moved <= 0.22 * total, (moved, total)
    for r in rows:
        # occupancy within 2x of uniform on the 500-doc fixture
        assert 60_000 <= r["share_ppm"] <= 260_000, r


def test_signature_store_matches_inline_cross_pairs(spark, sf_dir):
    """The on-disk store path must reproduce the inline asymmetric
    band-join exactly: same duplicate batch docs, same best matches."""
    from pyspark.sql import functions as F

    from formula_1_spark.operators.dedup import minhash_lsh_cross_pairs
    from formula_1_spark.queries.dedup import _shared_relations
    from formula_1_spark.queries.signature_store import (
        _FROZEN_LT,
        _FROZEN_MOD,
        dedup_signature_store_probe,
    )

    got = {
        r["new_doc_id"]: (r["n_base_matches"], r["best_base_id"])
        for r in dedup_signature_store_probe(spark, sf_dir).collect()
    }
    inline = minhash_lsh_cross_pairs(
        _shared_relations(spark, sf_dir)["sh"],
        base_pred=F.col("doc_id") % _FROZEN_MOD < _FROZEN_LT,
        threshold=0.5,
    ).collect()
    # inline pairs are (doc_id_1=base, doc_id_2=new)
    from collections import defaultdict

    by_new = defaultdict(list)
    for r in inline:
        by_new[r["doc_id_2"]].append((r["jaccard"], r["doc_id_1"]))
    assert set(got) == set(by_new)
    for new_id, matches in by_new.items():
        n, best = got[new_id]
        assert n == len(matches)
        best_j = max(j for j, _ in matches)
        assert best == min(b for j, b in matches if j == best_j)


def test_signature_store_sides_disjoint(spark, sf_dir):
    """Every reported pair crosses the frozen/batch boundary."""
    from formula_1_spark.queries.signature_store import (
        _FROZEN_LT,
        _FROZEN_MOD,
        dedup_signature_store_probe,
    )

    for r in dedup_signature_store_probe(spark, sf_dir).collect():
        assert r["new_doc_id"] % _FROZEN_MOD >= _FROZEN_LT
        assert r["best_base_id"] % _FROZEN_MOD < _FROZEN_LT
        assert 500000 <= r["best_jaccard_ppm"] <= 1000000
        assert r["n_base_matches"] >= 1


def test_quality_classifier_decision_and_gram_accounting(spark, sf_dir):
    """label == sign(score_sum); n_grams == 2*len(tokens)-1 for docs with
    >= 2 tokens (all unigrams + all bigrams, occurrences not distinct)."""
    from pyspark.sql import functions as F

    from formula_1_spark.queries.quality_ops import (
        quality_classifier_hashed_ngram,
    )
    from formula_1_spark.sources.tables import load_table

    res = quality_classifier_hashed_ngram(spark, sf_dir)
    rows = res.collect()
    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    for r in rows:
        assert r["label"] == ("keep" if r["score_sum"] > 0 else "drop")
        # mean margin bounded by the weight range
        assert -1000_000000 <= r["mean_w_ppm"] * 1 <= 1000 * 1000000
    tok_n = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .collect()
    }
    for r in rows:
        n = tok_n[r["doc_id"]]
        expect = n + max(n - 1, 0)
        assert r["n_grams"] == expect


def test_agg_pushdown_restores_session_confs(spark, sf_dir):
    """The pushdown query flips the session to the V2 parquet path; a
    leaked conf would silently re-plan every later query."""
    conf = spark.conf
    def snap():
        out = {}
        for k in ("spark.sql.sources.useV1SourceList",
                  "spark.sql.parquet.aggregatePushdown"):
            try:
                out[k] = conf.get(k)
            except Exception:
                out[k] = None
        return out
    before = snap()
    res = REGISTRY["parquet_agg_pushdown_scan"].fn(spark, sf_dir).collect()
    assert snap() == before
    assert [r["tbl"] for r in res] == ["lineitem", "orders"]
    assert all(r["n_rows"] > 0 and r["min_key"] <= r["max_key"] for r in res)


def test_listagg_sample_and_ordering(spark, sf_dir):
    from formula_1_spark.queries.functions_breadth import _LISTAGG_SAMPLE_MOD

    rows = REGISTRY["listagg_ordered_battery"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        statuses = r["statuses"].split(",")
        assert statuses == sorted(statuses)
        if r["sampled_keys"] is not None:
            keys = [int(k) for k in r["sampled_keys"].split("|")]
            assert keys == sorted(keys)
            assert all(k % _LISTAGG_SAMPLE_MOD == 0 for k in keys)
        months = r["months_by_volume"].split(",")
        assert 1 <= len(months) <= 12 and len(set(months)) == len(months)


def test_signature_store_append_grows_store_exactly_by_admissions(spark, sf_dir):
    """The grown store must contain exactly base + admitted-batch1 docs,
    and every batch2 disposition must point at a store doc."""
    from pyspark.sql import functions as F

    from formula_1_spark.queries.signature_store import (
        _B1,
        _B2,
        _FROZEN_MOD,
        _grown_store_fixture,
        _store_fixture,
        _store_hits,
        dedup_signature_store_append_probe,
    )
    from formula_1_spark.queries.dedup import _shared_relations
    import os

    base = _store_fixture(spark, sf_dir)
    grown = _grown_store_fixture(spark, sf_dir)
    base_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(base, "shingles"))
        .select("doc_id").collect()
    }
    grown_ids = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(grown, "shingles"))
        .select("doc_id").collect()
    }
    b1_sh = _shared_relations(spark, sf_dir)["sh"].filter(
        F.col("doc_id") % _FROZEN_MOD == _B1
    )
    caught = {
        r["b"] for r in _store_hits(base, spark, b1_sh).select("b").collect()
    }
    b1_ids = {r["doc_id"] for r in b1_sh.select("doc_id").collect()}
    assert grown_ids == base_ids | (b1_ids - caught)
    # band rows and shingle rows stay 1:1 with docs (appends added no dups)
    n_band_docs = (
        spark.read.parquet(os.path.join(grown, "bands"))
        .select("doc_id").distinct().count()
    )
    assert n_band_docs == len(grown_ids)
    for r in dedup_signature_store_append_probe(spark, sf_dir).collect():
        assert r["new_doc_id"] % _FROZEN_MOD == _B2
        assert r["best_store_id"] in grown_ids
        assert (r["best_cohort"] == "batch1") == (
            r["best_store_id"] % _FROZEN_MOD == _B1
        )
