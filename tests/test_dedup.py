"""Dedup operator semantics on handcrafted documents: known duplicate
pairs must be found, unrelated docs must not pair."""

from __future__ import annotations

import pytest

from formula_1_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)
NEAR = BASE.replace("warm", "cold")  # one-token edit → high jaccard
OTHER = (
    "completely different content about spark query engines and columnar "
    "storage formats with vectorized execution and cost based optimizers"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # byte-exact duplicate of 1
        (3, "  " + BASE.upper() + "  "),  # normalizes to same fingerprint
        (4, NEAR),  # near-duplicate of 1
        (5, OTHER),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_normalized(docs):
    out = {r["canonical_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    # 1,2,3 collapse (lowercase + trim + whitespace-collapse); 4,5 unique.
    assert out == {1: 3, 4: 1, 5: 1}


def _pairs(df):
    return {(r["doc_id_1"], r["doc_id_2"]) for r in df.collect()}


def test_ngram_jaccard_finds_near_dup(docs):
    got = _pairs(ngram_jaccard_pairs(docs, threshold=0.5))
    assert (1, 2) in got  # identical
    assert (1, 4) in got and (2, 4) in got  # near-dup
    assert all(5 not in p for p in got)  # unrelated never pairs
    jac = {
        (r["doc_id_1"], r["doc_id_2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert jac[(1, 2)] == 1.0
    assert 0.5 < jac[(1, 4)] < 1.0


def test_minhash_lsh_agrees_with_exact_on_high_sim(docs):
    got = _pairs(minhash_lsh_pairs(docs, threshold=0.5))
    # LSH must recover the identical pair and the one-edit near-dup
    # (jaccard ~0.88 → recall ~1 at b=8, r=4).
    assert (1, 2) in got and (1, 4) in got
    assert all(5 not in p for p in got)


def test_simhash_identical_token_multisets(docs, spark):
    shuffled = " ".join(reversed(BASE.split()))
    d2 = spark.createDataFrame(
        [(1, BASE), (2, shuffled), (3, OTHER)], ["doc_id", "text"]
    )
    got = {
        (r["doc_id_1"], r["doc_id_2"]): r["hamming"]
        for r in simhash_pairs(d2).collect()
    }
    # Same token multiset → identical simhash → hamming 0.
    assert got.get((1, 2)) == 0
    assert (1, 3) not in got and (2, 3) not in got


def test_embedding_lsh_recall_on_planted_near_dups(spark):
    """The banded-LSH near-dup operator at its DESIGN point: planted
    perturbed-copy pairs (cos ~0.99) must be recovered with recall ~1,
    and every reported pair must clear the exact-cosine threshold
    (precision 1 by construction — candidates are re-verified)."""
    import random

    from formula_1_spark.operators.similarity import cosine_near_dup_pairs

    rnd = random.Random(7)
    rows = []
    for i in range(50):
        v = [rnd.gauss(0.0, 1.0) for _ in range(64)]
        w = [x + rnd.gauss(0.0, 0.05) for x in v]  # cos >= ~0.98
        rows.append((i * 2, [float(x) for x in v]))
        rows.append((i * 2 + 1, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        (r.vec_id_1, r.vec_id_2)
        for r in cosine_near_dup_pairs(emb, threshold=0.9).collect()
    }
    planted = {(i * 2, i * 2 + 1) for i in range(50)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.95, f"planted near-dup recall {recall}"
    # random gaussian pairs sit near cos 0 — none should clear 0.9
    assert got <= planted or len(got - planted) <= 1


def test_semantic_dedup_recall_on_planted_near_dups(spark):
    """SemDeDup k-means bucketing at its design point: a perturbed copy
    (cos ~0.99) lands in the same cell as its source with near-certainty
    (the cells are Voronoi regions; near-identical vectors share one), so
    planted pairs are recovered within-cell and verified exactly."""
    import random

    from formula_1_spark.operators.similarity import semantic_dedup_pairs

    rnd = random.Random(11)
    rows = []
    for i in range(50):
        v = [rnd.gauss(0.0, 1.0) for _ in range(64)]
        w = [x + rnd.gauss(0.0, 0.05) for x in v]
        rows.append((i * 2, [float(x) for x in v]))
        rows.append((i * 2 + 1, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        (r.vec_id_1, r.vec_id_2)
        for r in semantic_dedup_pairs(emb, n_cells=8, iters=2, threshold=0.9).collect()
    }
    planted = {(i * 2, i * 2 + 1) for i in range(50)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.95, f"planted near-dup recall {recall}"
    assert got <= planted or len(got - planted) <= 1


def test_embedding_lsh_scaled_banding_keeps_recall(spark):
    """The corpus-scaled banding (more bits per band as the corpus grows)
    must keep planted near-dup recall: cos ~0.99 pairs differ on almost
    no hyperplane signs, so they collide in some band at any width. Only
    near-random pairs lose candidacy — that is the point of widening."""
    import random

    from formula_1_spark.operators.similarity import (
        cosine_near_dup_pairs,
        scaled_banding,
    )

    rnd = random.Random(7)
    rows = []
    for i in range(50):
        v = [rnd.gauss(0.0, 1.0) for _ in range(64)]
        w = [x + rnd.gauss(0.0, 0.05) for x in v]
        rows.append((i * 2, [float(x) for x in v]))
        rows.append((i * 2 + 1, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    n_planes, n_bands = scaled_banding(100_000)  # far wider than needed
    got = {
        (r.vec_id_1, r.vec_id_2)
        for r in cosine_near_dup_pairs(
            emb, threshold=0.9, n_planes=n_planes, n_bands=n_bands
        ).collect()
    }
    planted = {(i * 2, i * 2 + 1) for i in range(50)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, f"planted recall under scaled banding: {recall}"
