"""Similarity-search quality (LSH recall vs brute force) and multimodal
plumbing semantics (stub gating, batch shapes, metadata passthrough)."""

from __future__ import annotations

import pytest

from formula_1_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    documents_as_media,
    extract_features,
    fake_feature_vector,
)
from formula_1_spark.operators.similarity import brute_force_topk, lsh_topk
from formula_1_spark.sources.tables import load_table


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, k=5)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # Random 64-dim vectors are a worst case for LSH (all cosines ~0);
    # still expect meaningfully-above-chance recall from 4x4-bit bands.
    assert recall >= 0.25, f"LSH recall {recall:.2f} below floor"
    # precision of what it does return: every approx neighbor must carry
    # the exact cosine (re-rank is exact) — spot-check one row.
    row = approx.orderBy("query_id", "rank").first()
    assert row["cos"] <= 1.0 and row["rank"] >= 1


def test_multimodal_real_path_is_stubbed(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        extract_features(media, fake=False)
    with pytest.raises(NotImplementedError):
        decode_media(media, fake=False)


def test_fake_feature_kernel_deterministic():
    v1 = fake_feature_vector(b"payload")
    v2 = fake_feature_vector(b"payload")
    assert v1 == v2 and len(v1) == FEATURE_DIM
    assert all(0.0 <= x < 1.0 for x in v1)
    assert fake_feature_vector(b"other") != v1


def test_decode_media_fake_batch_shape(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    out = decode_media(media, fake=True)
    assert out.columns == ["media_id", "decoded_width", "decoded_height", "n_frames"]
    rows = out.limit(5).collect()
    assert len(rows) == 5
    # 25 fps: n_frames = duration_ms // 40 = n_chars (by construction).
    durations = {r["media_id"]: r["meta_duration_ms"] for r in media.collect()}
    for r in out.collect():
        assert r["n_frames"] == durations[r["media_id"]] // 40


def test_ivf_learned_centroids_beat_static_on_clustered_data(spark):
    """On data WITH cluster structure, 2 k-means iterations must beat the
    static first-n quantizer: the first 8 vectors all come from clusters
    0-1, so the static quantizer collapses 8 true clusters into 2 cells
    and probing 2 cells misses most true neighbors; learned centroids
    spread to the real clusters. (On structureless uniform data the two
    quantizers tie — this pins the case k-means exists for.)"""
    import random

    from pyspark.sql import functions as F

    from formula_1_spark.operators.similarity import brute_force_topk, ivf_topk

    rnd = random.Random(13)
    centers = [[rnd.gauss(0.0, 1.0) for _ in range(64)] for _ in range(8)]
    rows = []
    # vec_ids 0..7 deliberately drawn from clusters 0 and 1 only.
    for i in range(400):
        c = centers[i % 2] if i < 8 else centers[i % 8]
        rows.append((i, [float(x + rnd.gauss(0.0, 0.15)) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") < 10)

    truth = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries).collect()
    }

    def recall(iters: int) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, queries, learn_iters=iters).collect()
        }
        return len(got & truth) / len(truth)

    r_static, r_learned = recall(0), recall(2)
    assert r_learned > r_static + 0.1, (r_static, r_learned)
    assert r_learned >= 0.9, r_learned
