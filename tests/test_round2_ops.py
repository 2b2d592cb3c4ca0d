"""Property tests for the round-2 operator additions, beyond the
oracle-differential checks: structural invariants the value-hash compare
can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula_1_spark.operators.dedup import minhash_lsh_cross_pairs, tokenized, shingles_from_tokens
from formula_1_spark.queries.registry import load_all
from formula_1_spark.sources.tables import load_table

REGISTRY = load_all()


def test_cross_pairs_never_pair_within_a_side(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_from_tokens(tokenized(docs), n=3)
    pairs = minhash_lsh_cross_pairs(
        sh, base_pred=F.col("doc_id") % 2 == 0, threshold=0.5
    ).collect()
    assert pairs, "expected at least one cross-corpus near-dup at sf0.001"
    for r in pairs:
        assert r.doc_id_1 % 2 == 0, "left side must come from the base corpus"
        assert r.doc_id_2 % 2 == 1, "right side must come from the incoming batch"
        assert r.jaccard >= 0.5


def test_cross_pairs_subset_of_full_lsh(spark, sf_dir):
    """Every cross pair is also found by the symmetric LSH dedup (same
    signatures, same buckets) — incrementality only removes pairs."""
    from formula_1_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_from_tokens(tokenized(docs), n=3).persist()
    full = {
        (min(r.doc_id_1, r.doc_id_2), max(r.doc_id_1, r.doc_id_2))
        for r in minhash_lsh_pairs(None, sh=sh).collect()
    }
    cross = {
        (min(r.doc_id_1, r.doc_id_2), max(r.doc_id_1, r.doc_id_2))
        for r in minhash_lsh_cross_pairs(
            sh, base_pred=F.col("doc_id") % 2 == 0
        ).collect()
    }
    sh.unpersist()
    assert cross <= full
    # and it is exactly the odd/even slice of the full pair set
    assert cross == {p for p in full if (p[0] + p[1]) % 2 == 1}


def test_quantization_reconstruction_is_tight(spark, sf_dir):
    rows = REGISTRY["embedding_quantization"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 8-bit affine code over a ~1.0-wide range: worst-case step error
        # is range/255/2 per dim; cosine must stay essentially 1.
        assert r.cos_rec > 0.999, (r.vec_id, r.cos_rec)
        assert 0.0 <= r.max_abs_err < 0.01, (r.vec_id, r.max_abs_err)


def test_funnel_stages_strictly_ordered(spark, sf_dir):
    rows = REGISTRY["funnel_staged_conversion"].fn(spark, sf_dir).collect()
    assert rows, "expected converted users at sf0.001"
    for r in rows:
        assert r.view_us < r.click_us < r.purchase_us


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must be value-neutral: compare against the unsalted plan."""
    li = load_table(spark, sf_dir, "lineitem")
    flag_dim = spark.createDataFrame(
        [("A", "accepted"), ("N", "open"), ("R", "returned")],
        ["l_returnflag", "flag_label"],
    )
    plain = (
        li.join(flag_dim, "l_returnflag")
        .groupBy("flag_label")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .collect()
    )
    salted = {
        r.flag_label: r.n_lines
        for r in REGISTRY["skew_salted_join"].fn(spark, sf_dir).collect()
    }
    assert {r.flag_label: r.n_lines for r in plain} == salted
