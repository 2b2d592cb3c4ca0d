"""Property tests for the round-3b operator additions: structural
invariants the oracle value-hash compare can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula_1_spark.operators.dedup import (
    containment_pairs_from_shingles,
    shingles_from_tokens,
    tokenized,
)
from formula_1_spark.queries.registry import load_all

REGISTRY = load_all()


def test_containment_detects_embedded_quote(spark):
    """A short doc embedded verbatim in a long one: containment = 1.0
    even though Jaccard is far below any near-dup threshold — the
    asymmetric case the operator exists for."""
    quote = "alpha beta gamma delta epsilon zeta"
    long_doc = (
        "zero one two three four five six seven eight nine ten eleven "
        + quote
        + " twelve thirteen fourteen fifteen sixteen seventeen eighteen "
        "nineteen twenty twentyone twentytwo twentythree twentyfour"
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "unrelated words only here now")],
        "doc_id long, text string",
    )
    sh = shingles_from_tokens(tokenized(docs), n=3).persist()
    rows = containment_pairs_from_shingles(sh, threshold=0.9, max_df=50).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_id_1, r.doc_id_2) == (1, 2)
    assert r.containment == 1.0, "full quote must be fully contained"
    assert r.jaccard < 0.5, "Jaccard must under-score the asymmetric pair"


def test_containment_symmetric_matches_jaccard_bound(spark, sf_dir):
    """On the driver corpus: containment >= jaccard for every reported
    pair (set algebra: |A∩B|/min >= |A∩B|/|A∪B|)."""
    from formula_1_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_from_tokens(tokenized(docs), n=3).persist()
    for r in containment_pairs_from_shingles(sh, threshold=0.8).collect():
        assert r.containment >= r.jaccard - 1e-12


def test_dsir_selects_target_language(spark, sf_dir):
    """The DSIR-shaped selector must ENRICH for the target distribution:
    the en share of the top-50 beats the corpus-wide en share. (The
    synthetic corpus shares much cross-language vocabulary, so the
    contrast is real but not a hard separator — enrichment, not
    classification, is the operator's contract.)"""
    from formula_1_spark.sources.tables import load_table

    out = REGISTRY["dsir_importance_select"].fn(spark, sf_dir).collect()
    assert len(out) == 50
    n_en = sum(1 for r in out if r.lang == "en")
    by_lang = dict(
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .collect()
    )
    corpus_share = by_lang.get("en", 0) / sum(by_lang.values())
    assert n_en / 50 > corpus_share, (
        f"no enrichment: top-50 en share {n_en / 50:.2f} "
        f"<= corpus {corpus_share:.2f}"
    )


def test_grouped_kfold_is_leakage_free(spark, sf_dir):
    """Every user's events land in exactly one fold: re-derive the fold
    per event and count distinct folds per user."""
    from formula_1_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit("gkf5"), F.col("user_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 5
    )
    bad = (
        events.select("user_id", fold.alias("fold"))
        .groupBy("user_id")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert bad == 0


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """Oriented two-join triangle enumeration equals the brute-force
    count from the same undirected edge set."""
    rows = REGISTRY["nation_trade_triangles"].fn(spark, sf_dir)
    tri = {(r.nation_a, r.nation_b, r.nation_c) for r in rows.collect()}
    # brute force on the collected edge set (25-node graph)
    from formula_1_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = {
        (min(r.c_nationkey, r.s_nationkey), max(r.c_nationkey, r.s_nationkey))
        for r in (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .filter(F.col("c_nationkey") != F.col("s_nationkey"))
            .select("c_nationkey", "s_nationkey")
            .distinct()
            .collect()
        )
    }
    nodes = sorted({n for e in edges for n in e})
    brute = {
        (a, b, c)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
        for c in nodes
        if b < c
        and (a, b) in edges
        and (b, c) in edges
        and (a, c) in edges
    }
    assert tri == brute


def test_perceptual_buckets_partition_media(spark, sf_dir):
    """Bucket members are disjoint and each bucket has >1 member with
    the canonical id equal to the min member."""
    out = REGISTRY["media_perceptual_buckets"].fn(spark, sf_dir).collect()
    seen: set[int] = set()
    for r in out:
        ids = [int(x) for x in r.member_ids.split(",")]
        assert r.n_items == len(ids) > 1
        assert r.canonical_id == min(ids)
        assert ids == sorted(ids)
        # a media item belongs to exactly one (type, phash) bucket
        assert not seen.intersection(ids)
        seen.update(ids)


def test_compaction_shrinks_file_count(spark, sf_dir):
    """The compacted lake's live snapshot has far fewer data files than
    the 64-way fragmented initial snapshot, and at least one historical
    snapshot (the fragmented one) remains for time travel."""
    import os

    from formula_1_spark.queries.lake_maintenance import (
        FRAGMENT_FILES,
        compacted_orders_lake,
    )
    from formula_1_spark.sources.io import current_snapshot_dir, list_snapshots

    lake = compacted_orders_lake(spark, sf_dir)
    cur = current_snapshot_dir(lake)
    n_files = sum(
        1
        for f in os.listdir(cur)
        if f.endswith(".parquet") and f.startswith("part-")
    )
    assert 1 <= n_files < FRAGMENT_FILES / 4
    assert len(list_snapshots(lake)) >= 2


def test_erasure_lake_contains_no_erased_user(spark, sf_dir):
    """Directly scan the post-erasure lake: zero rows from the erased
    hash bucket survive, and no non-erased row was dropped."""
    from formula_1_spark.queries.lake_maintenance import (
        _erase_bucket,
        erased_events_lake,
    )
    from formula_1_spark.sources.io import read_current
    from formula_1_spark.sources.tables import load_table

    lake = erased_events_lake(spark, sf_dir)
    cur = read_current(spark, lake)
    assert cur.filter(_erase_bucket() == 0).count() == 0
    expected = (
        load_table(spark, sf_dir, "events").filter(_erase_bucket() != 0).count()
    )
    assert cur.count() == expected


def test_locf_carries_last_observed_value(spark, sf_dir):
    """Unobserved hours inherit exactly the previous non-null value; the
    first observed hour onward locf is never NULL."""
    out = (
        REGISTRY["events_locf_fill"].fn(spark, sf_dir)
        .orderBy("hour_us")
        .collect()
    )
    last = None
    seen_first = False
    for r in out:
        if r.observed:
            seen_first = True
            last = r.locf_value
            assert r.locf_value is not None
        else:
            assert r.locf_value == last
        if seen_first:
            assert r.locf_value is not None


def test_regression_matches_numpy(spark, sf_dir):
    """The exact-sufficient-statistics OLS agrees with numpy's polyfit
    on the same (x, y) points to float tolerance."""
    import numpy as np

    from formula_1_spark.sources.tables import load_table

    row = REGISTRY["order_value_regression"].fn(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    ).toPandas()
    x = li["l_quantity"].astype("int64").to_numpy()
    y = np.floor(li["l_extendedprice"].to_numpy()).astype("int64")
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row.slope - slope) < 1e-6 * max(1.0, abs(slope))
    assert abs(row.intercept - intercept) < 1e-6 * max(1.0, abs(intercept))
    r = np.corrcoef(x, y)[0, 1]
    assert abs(row.pearson_r - r) < 1e-9


def test_lsh_recall_high_band_is_complete(spark, sf_dir):
    """Banded MinHash must find essentially every >=0.9-Jaccard pair
    (8 bands x 4 rows: p(miss) = (1 - j^4)^8 < 0.9% at j=0.9)."""
    rows = {r.jband: r for r in REGISTRY["minhash_recall_audit"].fn(spark, sf_dir).collect()}
    hi = rows.get("0.9-1.0")
    if hi is not None and hi.n_true_pairs > 0:
        assert hi.recall_ppm >= 900_000
