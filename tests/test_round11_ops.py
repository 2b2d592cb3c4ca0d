"""Round-11 operator unit tests: intra-doc repetition excision (line
grain — the real-corpus shape the single-line testdata can't express) and
the persisted ANN index store layout."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from formula_1_spark.queries.text_analysis import repetition_excision_signals

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_line_grain_duplicate_lines(spark):
    # 5 lines, "dup line" appears 3x: dup chars = 3*8 = 24 of 42 total
    # chars (incl. newlines) -> 571428 ppm > 200000 -> excised.
    text = "dup line\ndup line\ndup line\nuniq one\nuniq2"
    out = repetition_excision_signals(
        _docs(spark, [(1, text)]), unit_sep="\n"
    ).collect()[0]
    assert out["dupunit_ppm"] == 3 * len("dup line") * 1_000_000 // len(text)
    assert out["action"] == "drop_dup_unit"


def test_repetition_line_grain_clean_doc_keeps(spark):
    # Long enough that the (singleton) top bigram stays under 18% of the
    # doc's characters — on real-length docs a count-1 bigram never trips.
    text = (
        "alpha beta gamma delta epsilon\n"
        "zeta eta theta iota kappa\n"
        "lambda mu nu xi omicron pi rho sigma"
    )
    out = repetition_excision_signals(
        _docs(spark, [(1, text)]), unit_sep="\n"
    ).collect()[0]
    assert out["n_units"] == 3  # units are LINES in line grain
    assert out["dupunit_ppm"] == 0
    assert out["dup5_ppm"] == 0
    assert out["action"] == "keep"


def test_repetition_top_bigram_tiebreak_and_mass(spark):
    # "b c" and "a b" both occur twice; tie-break is gram ASC -> "a b".
    text = "a b c a b c x y z x2 y2 z2 q r s t u v w"
    out = repetition_excision_signals(
        _docs(spark, [(1, text)]), unit_sep="\n"
    ).collect()[0]
    assert out["top2_gram"] == "a b"
    assert out["top2_ppm"] == 2 * 3 * 1_000_000 // len(text)


def test_repetition_dup_5gram_overlap_counts_each_occurrence(spark):
    # The 5-gram "a b a b a" repeats (overlapping) in an alternating doc;
    # every occurrence of every duplicated 5-gram contributes its chars.
    text = " ".join(["a b"] * 12)  # 24 words alternating a/b
    out = repetition_excision_signals(
        _docs(spark, [(1, text)]), unit_sep="\n"
    ).collect()[0]
    # 20 five-gram positions, only 2 distinct grams, each count 10 >= 2:
    # dup5 chars = 20 * 9 = 180 over 47 chars — raw ppm exceeds 1e6 by
    # design (overlapping occurrences each count, per Gopher).
    assert out["dup5_ppm"] == 20 * 9 * 1_000_000 // len(text)
    # Line grain: the doc is ONE line (no dup units); the repeated "a b"
    # bigram fires first in rule order.
    assert out["n_units"] == 1
    assert out["action"] == "drop_top_bigram"


def test_repetition_short_doc_no_grams(spark):
    out = repetition_excision_signals(
        _docs(spark, [(1, "solo"), (2, "two words")]), unit_sep="\n"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["top2_gram"] == "" and rows[1]["top2_ppm"] == 0
    assert rows[1]["dup5_ppm"] == 0 and rows[1]["action"] == "keep"
    assert rows[2]["top2_gram"] == "two words"


def test_ann_store_layout_cell_partitioned(spark):
    from formula_1_spark.queries.ann_store import (
        _N_CELLS,
        _ann_store_fixture,
    )

    root = _ann_store_fixture(spark, SF)
    for rel in ("coded", "vectors"):
        parts = [
            d
            for d in os.listdir(os.path.join(root, rel))
            if d.startswith("cell_id=")
        ]
        assert 1 <= len(parts) <= _N_CELLS, (rel, parts)
    coarse = spark.read.parquet(os.path.join(root, "coarse"))
    assert coarse.count() <= _N_CELLS
    books = spark.read.parquet(os.path.join(root, "codebooks"))
    assert set(books.columns) == {"s", "code", "cent"}


def test_ann_store_probe_matches_inline_ivfpq_shape(spark):
    """The store probe must produce exactly k ranked rows per query with
    ranks 1..k and monotone non-increasing cosine within each query."""
    from formula_1_spark.queries.ann_store import _K, similarity_ann_store_probe

    rows = similarity_ann_store_probe(spark, SF).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q, "no probe queries produced"
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, _K + 1)), q
        cs = [r["cos"] for r in rs]
        assert all(a >= b for a, b in zip(cs, cs[1:])), q


def test_ann_store_append_only_grows_cells(spark):
    """The grown store keeps every base file (append-only: no rewrite)
    and every cell's occupancy is >= its base occupancy."""
    from formula_1_spark.queries.ann_store import (
        _ann_store_fixture,
        _grown_ann_store_fixture,
    )

    base_root = _ann_store_fixture(spark, SF)
    grown_root = _grown_ann_store_fixture(spark, SF)

    def files(root):
        out = set()
        coded = os.path.join(root, "coded")
        for d in os.listdir(coded):
            if d.startswith("cell_id="):
                for f in os.listdir(os.path.join(coded, d)):
                    if f.endswith(".parquet"):
                        out.add((d, f))
        return out

    assert files(base_root) <= files(grown_root)  # strict append
    base = spark.read.parquet(os.path.join(base_root, "coded"))
    grown = spark.read.parquet(os.path.join(grown_root, "coded"))
    b = {r["cell_id"]: r["n"] for r in base.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    g = {r["cell_id"]: r["n"] for r in grown.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(b) <= set(g)
    assert all(g[c] >= b[c] for c in b)
    assert sum(g.values()) > sum(b.values())


def test_ann_store_append_probe_reports_cohorts(spark):
    from formula_1_spark.queries.ann_store import (
        _FROZEN_MOD,
        _APPEND_RES,
        similarity_ann_store_append_probe,
    )

    rows = similarity_ann_store_append_probe(spark, SF).collect()
    assert rows
    for r in rows:
        want = (
            "batch1"
            if r["neighbor_id"] % _FROZEN_MOD == _APPEND_RES
            else "frozen"
        )
        assert r["cohort"] == want


def test_ann_store_cell_drift_consistency(spark):
    from formula_1_spark.queries.ann_store import ann_store_cell_drift

    rows = ann_store_cell_drift(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_after"] >= r["n_frozen"]
        if r["n_frozen"] == 0:
            assert r["growth_ppm"] is None
        else:
            assert (
                r["growth_ppm"]
                == (r["n_after"] - r["n_frozen"]) * 1_000_000 // r["n_frozen"]
            )


def test_ann_quantizer_memos_value_identical_and_evict(spark):
    """shared_centroids / shared_pq_cents return relations bit-identical
    to inline training (the memo is an amortization, never a semantic
    change), keep one live entry per path, and evict superseded/dead-app
    keys — the dedup ``_shared_relations`` contract."""
    from formula_1_spark.operators.similarity import (
        kmeans_centroids,
        pq_subspace_model,
    )
    from formula_1_spark.queries.similarity import (
        _CENTROIDS_MEMO,
        _PQ_CENTS_MEMO,
        _PQ_CODES,
        _PQ_ITERS,
        _PQ_M,
        shared_centroids,
        shared_pq_cents,
    )
    from formula_1_spark.sources.tables import load_table

    app_id = spark.sparkContext.applicationId
    emb = load_table(spark, SF, "embeddings")

    memo = shared_centroids(spark, SF)
    fresh = kmeans_centroids(emb, n_cells=8, iters=2)
    assert sorted(map(tuple, memo.collect())) == sorted(
        map(tuple, fresh.collect())
    )

    memo_pq = shared_pq_cents(spark, SF)
    _, fresh_pq, _, _ = pq_subspace_model(
        emb, m=_PQ_M, n_codes=_PQ_CODES, learn_iters=_PQ_ITERS, dims=64
    )
    assert sorted(map(tuple, memo_pq.collect())) == sorted(
        map(tuple, fresh_pq.collect())
    )

    for cache, build in (
        (_CENTROIDS_MEMO, shared_centroids),
        (_PQ_CENTS_MEMO, shared_pq_cents),
    ):
        live = [k for k in cache if k[0] == app_id]
        assert len(live) == 1
        path = live[0][1]
        fake = spark.range(1)
        cache[(app_id, path, 0, 0)] = fake
        cache[("dead-app", path, 0, 0)] = fake
        cache.pop(live[0])
        build(spark, SF)
        assert (app_id, path, 0, 0) not in cache
        assert ("dead-app", path, 0, 0) not in cache
        assert sum(1 for k in cache if k[1] == path) == 1


def test_nndescent_graph_invariants(spark):
    """Structural contract of the NN-descent build: every node ends with
    exactly k neighbors, no self-loops, ranks are 1..k, and refinement
    never hurts — graph recall@k (vs exact) is >= the recall of the
    arithmetic init it started from."""
    from formula_1_spark.operators.similarity import (
        brute_force_topk,
        nndescent_graph,
    )
    from formula_1_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    k = 8
    g = nndescent_graph(emb, k=k, iters=2).collect()
    per_node = {}
    for r in g:
        assert r["neighbor_id"] != r["vec_id"]
        per_node.setdefault(r["vec_id"], []).append(r["rank"])
    assert len(per_node) == n
    for ranks in per_node.values():
        assert sorted(ranks) == list(range(1, k + 1))

    gt = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, emb, k=k).collect()
    }
    final_hits = sum(1 for r in g if (r["vec_id"], r["neighbor_id"]) in gt)
    # Init graph = the arithmetic seed before any scoring round.
    a, b = 2654435761, 40503
    init = {
        (v, (v + 1 + ((v * a + j * b) % (n - 1))) % n)
        for v in range(n)
        for j in range(1, k + 1)
    }
    init_hits = sum(1 for e in init if e in gt)
    assert final_hits >= init_hits
    # Two rounds over a content-blind init must find real structure.
    assert final_hits > 2 * init_hits


def test_bradley_terry_strengths_contract(spark):
    """MM output contract: strengths are a positive distribution (sum 1
    within float tolerance), ranks are the 1..n permutation ordered by
    strength, and the top-ranked player beats the bottom-ranked one in
    their head-to-head win counts (sanity that strength tracks wins)."""
    from formula_1_spark.queries.preference import preference_bradley_terry

    rows = preference_bradley_terry(spark, SF).collect()
    n = len(rows)
    assert n > 1
    assert abs(sum(r["strength"] for r in rows) - 1.0) < 1e-9
    assert all(r["strength"] > 0 for r in rows)
    assert sorted(r["rank"] for r in rows) == list(range(1, n + 1))
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert by_rank[0]["strength"] >= by_rank[-1]["strength"]
    # Strength must broadly track win ratio: top-ranked player's overall
    # win ratio exceeds bottom-ranked player's.
    top, bot = by_rank[0], by_rank[-1]
    assert top["wins"] * bot["n_matches"] > bot["wins"] * top["n_matches"]


def test_annotator_kappa_bounds(spark):
    """Kappa output contract: confusion cells partition the corpus,
    agree_ppm consistent with the cells, kappa within [-1e6, 1e6]."""
    import duckdb

    from formula_1_spark.queries.preference import annotator_agreement_kappa

    rows = annotator_agreement_kappa(spark, SF).collect()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == n_docs
    agree = sum(r["n"] for r in rows if r["a_keep"] == r["b_keep"])
    for r in rows:
        assert r["agree_ppm"] == agree * 1_000_000 // n_docs
        if r["kappa_ppm"] is not None:
            assert -1_000_000 <= r["kappa_ppm"] <= 1_000_000


def test_poisson_bootstrap_ci_contract(spark):
    """Bootstrap output contract on the fixed testdata: CI bounds are
    ordered, bracket the point estimate, group counts partition the
    orders table, and the interval is nondegenerate (replicate spread
    exists) but tight relative to the mean (n >= 273 per group)."""
    import duckdb

    from formula_1_spark.queries.sampling_stats import poisson_bootstrap_ci

    rows = poisson_bootstrap_ci(spark, SF).collect()
    n_orders = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert sum(r["n_orders"] for r in rows) == n_orders
    for r in rows:
        assert r["ci_lo_micents"] < r["ci_hi_micents"]
        assert r["ci_lo_micents"] <= r["point_mean_micents"] <= r["ci_hi_micents"]
        width = r["ci_hi_micents"] - r["ci_lo_micents"]
        assert 0 < width < r["point_mean_micents"]  # tight at n >= 273


def test_dp_mechanisms_contract(spark):
    """DP release contract: noise is recomputable from the group key via
    the embedded thresholds (pure function — same key, same noise), the
    noisy count equals true + noise, and partition selection releases
    exactly the buckets whose noisy count clears tau."""
    from formula_1_spark.queries.privacy_alloc import (
        _DP_TAU,
        dp_noisy_counts,
        dp_partition_selection,
    )

    rows = dp_noisy_counts(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_noisy"] == r["n_true"] + r["noise"]
        assert r["abs_err"] == abs(r["noise"])
    again = {r["source"]: r["noise"] for r in dp_noisy_counts(spark, SF).collect()}
    assert all(again[r["source"]] == r["noise"] for r in rows)

    parts = dp_partition_selection(spark, SF).collect()
    assert parts
    for r in parts:
        assert r["released"] == (1 if r["n_noisy"] > _DP_TAU else 0)


def test_beam_search_visits_and_finds(spark):
    """Beam-search contract: results are per-query top-10 among VISITED
    nodes (rank 1..10, no self-matches), and the graph walk beats the
    entry node's own neighborhood — at least one result per query is
    outside the entry node's direct out-edges (hop > 1 reachability)."""
    from formula_1_spark.queries.graph_ann import (
        _ENTRY,
        ann_graph_beam_search,
        shared_nndescent_graph,
    )

    rows = ann_graph_beam_search(spark, SF).collect()
    per_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(per_q) == 10
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, 11))

    entry_edges = {
        r["neighbor_id"]
        for r in shared_nndescent_graph(spark, SF).collect()
        if r["vec_id"] == _ENTRY
    }
    beyond = [
        r
        for r in rows
        if r["neighbor_id"] not in entry_edges
        and r["neighbor_id"] != _ENTRY
    ]
    assert beyond  # the walk reached past the entry neighborhood


def test_ranking_metrics_consistency(spark):
    """Metric identities on the fixed data: hits/mrr/ndcg agree with a
    Python recomputation from the operator outputs, and ndcg <= 1e6."""
    import math

    from formula_1_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )
    from formula_1_spark.queries.ranking_eval import (
        _IDCG_PPM,
        _W_PPM,
        ranking_metrics_battery,
    )
    from formula_1_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    gt = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=10).collect()
    }
    res = lsh_topk(emb, q, k=10).collect()
    want = {}
    for r in sorted(res, key=lambda r: (r["query_id"], r["rank"])):
        if (r["query_id"], r["neighbor_id"]) in gt:
            h, mrr, dcg = want.get(r["query_id"], (0, 0, 0))
            if h == 0:
                mrr = 1_000_000 // r["rank"]
            want[r["query_id"]] = (h + 1, mrr, dcg + _W_PPM[r["rank"] - 1])
    rows = ranking_metrics_battery(spark, SF).collect()
    for r in rows:
        assert 0 <= r["ndcg_ppm"] <= 1_000_000
        if r["method"] != "lsh":
            continue
        h, mrr, dcg = want.get(r["query_id"], (0, 0, 0))
        assert r["hits"] == h
        assert r["mrr_ppm"] == mrr
        assert r["ndcg_ppm"] == dcg * 1_000_000 // _IDCG_PPM


def test_bm25_store_partition_pruning_and_roundtrip(spark):
    """The store probe's postings scan must carry a term_bucket partition
    filter (partition pruning IS the index lookup), and the scores must
    equal the inline bm25_corpus_search exactly (store round trip)."""
    import io
    from contextlib import redirect_stdout

    from formula_1_spark.queries.lexical import bm25_corpus_search
    from formula_1_spark.queries.lexical_store import (
        _py_bucket,
        bm25_index_store_probe,
    )

    df = bm25_index_store_probe(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "term_bucket" in plan
    # The pruned-bucket literals appear in a partition filter, and the
    # scan reads a strict subset of the bucket partitions.
    from formula_1_spark.queries.lexical import _QUERY_TERMS

    assert any(str(_py_bucket(t)) in plan for t in _QUERY_TERMS)

    store_rows = [tuple(r) for r in df.collect()]
    inline_rows = [tuple(r) for r in bm25_corpus_search(spark, SF).collect()]
    assert store_rows == inline_rows


def test_bm25_store_append_grows_index(spark):
    """Append contract: the grown store's postings contain BOTH cohorts,
    the df deltas sum to the full-corpus df, and the probe over the
    grown store equals the inline full-corpus BM25 exactly."""
    import os

    from formula_1_spark.queries.lexical import bm25_corpus_search
    from formula_1_spark.queries.lexical_store import (
        _FROZEN_LT,
        _FROZEN_MOD,
        _grown_bm25_store_fixture,
        bm25_index_store_append_probe,
    )

    root = _grown_bm25_store_fixture(spark, SF)
    post = spark.read.parquet(os.path.join(root, "postings"))
    cohorts = (
        post.select(
            (F.col("doc_id") % _FROZEN_MOD >= _FROZEN_LT).alias("is_batch")
        )
        .distinct()
        .collect()
    )
    assert {r["is_batch"] for r in cohorts} == {True, False}

    from formula_1_spark.operators.tfidf import doc_terms
    from formula_1_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    full_df = {
        r["term"]: r["n"]
        for r in doc_terms(docs)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    merged = {
        r["term"]: r["n"]
        for r in spark.read.parquet(os.path.join(root, "df"))
        .groupBy("term")
        .agg(F.sum("df").alias("n"))
        .collect()
    }
    assert merged == full_df

    grown = [tuple(r) for r in bm25_index_store_append_probe(spark, SF).collect()]
    inline = [tuple(r) for r in bm25_corpus_search(spark, SF).collect()]
    assert grown == inline
