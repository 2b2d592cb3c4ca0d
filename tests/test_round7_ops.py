"""Round-7 golden tests: line-grain dedup invariants, funnel
monotonicity (the r6 ADVICE fix), and LTTB endpoint semantics (the r6
ADVICE medium fix — first/last buckets must keep the series' true
extent points, which the oracle could not catch because it carried the
same inversion)."""

from __future__ import annotations

from pyspark.sql import functions as F

from formula_1_spark.queries.registry import load_all

REGISTRY = load_all()


def test_line_excision_accounting_invariants(spark, sf_dir):
    rows = REGISTRY["line_dedup_excision"].fn(spark, sf_dir).collect()
    assert rows, "excision report is empty"
    for r in rows:
        assert 0 <= r.docs_affected <= r.docs_total
        assert 0 <= r.docs_emptied <= r.docs_affected
        assert 0 <= r.lines_removed <= r.lines_total
        assert 0 <= r.tokens_removed <= r.tokens_total
        assert (
            r.kept_ppm
            == (r.tokens_total - r.tokens_removed) * 1_000_000 // r.tokens_total
        )


def test_hot_lines_are_full_width_and_cross_doc(spark, sf_dir):
    rows = REGISTRY["line_dedup_hot_lines"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.df_docs >= 2, "hot line must appear in >= 2 distinct docs"
        assert r.line_tokens == 8, "short tail fragments are exempt"
        assert r.occurrences >= r.df_docs
        assert len(r.line_text.split(" ")) == 8


def test_reuse_matrix_is_upper_triangle(spark, sf_dir):
    rows = REGISTRY["line_source_reuse_matrix"].fn(spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert r.shared_lines >= 1
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))


def test_dedup_funnel_is_monotone(spark, sf_dir):
    rows = {
        r.stage: r
        for r in REGISTRY["dedup_pipeline_funnel"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[0].docs_kept >= rows[1].docs_kept >= rows[2].docs_kept
    assert rows[0].tokens_kept >= rows[1].tokens_kept >= rows[2].tokens_kept
    assert rows[0].docs_kept_ppm == 1_000_000


def test_lttb_keeps_series_extent_points(spark, sf_dir):
    from formula_1_spark.sources.tables import load_table

    out = REGISTRY["events_lttb_downsample"].fn(spark, sf_dir)
    picked = {r.bucket: r for r in out.collect()}
    ev = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("x"), "event_id"
    )
    lo = ev.orderBy(F.asc("x"), F.asc("event_id")).first()
    hi = ev.orderBy(F.desc("x"), F.desc("event_id")).first()
    first_bucket, last_bucket = min(picked), max(picked)
    assert picked[first_bucket].ts_us == lo.x, "bucket 1 must keep the FIRST point"
    assert picked[last_bucket].ts_us == hi.x, "last bucket must keep the LAST point"


def test_driver_priority_names_all_registered():
    """A typo in _DRIVER_PRIORITY silently skips a driver window slot —
    every pinned name must exist in the registry."""
    from formula_1_spark.queries.registry import _DRIVER_PRIORITY

    missing = [n for n in _DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"unregistered names in _DRIVER_PRIORITY: {missing}"
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY), "duplicates"
    # the driver snapshots the first 50 — the pinned window must fill it
    assert len(_DRIVER_PRIORITY) == 50


def test_cdc_chunks_reassemble_and_self_synchronize(spark):
    """The two CDC invariants: (1) chunks concatenate back to the exact
    original text; (2) boundaries self-synchronize — prepending tokens
    changes only chunks before the first post-prefix cut, so the CHUNK
    SET of the shared suffix is identical (the property that makes CDC
    dedup robust to insertions, unlike fixed windows)."""
    import random

    from formula_1_spark.queries.line_dedup import _CDC_K, _CDC_D  # noqa: F401

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    base_docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 120)))
        for _ in range(40)
    ]
    prefix = "zz1 zz2 zz3"
    rows = []
    for i, text in enumerate(base_docs):
        rows.append((2 * i, text, "orig"))
        rows.append((2 * i + 1, prefix + " " + text, "prefixed"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    import formula_1_spark.queries.line_dedup as ld
    from pyspark.sql import functions as F

    # reuse the registered query's chunker by calling the internals the
    # same way: write the frame to a temp dir and run the chunk stage
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="cdc_prop_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))

    # rebuild the chunk relation exactly as cdc_chunk_dedup does
    spec = REGISTRY["cdc_chunk_dedup"]
    out = spec.fn(spark, d)  # smoke: runs end-to-end on the fixture
    assert out.count() > 0

    # direct invariant checks on the chunk grain
    t = F.split(F.col("text"), " ")
    from formula_1_spark.operators.dedup import md5_long

    base = docs.select("doc_id", "text", t.alias("t"), F.size(t).alias("n"))
    cuts = F.when(
        F.col("n") >= ld._CDC_K,
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - ld._CDC_K),
                lambda i: F.when(
                    md5_long(
                        F.concat_ws(" ", F.slice(F.col("t"), i + 1, ld._CDC_K))
                    )
                    % ld._CDC_D
                    == 0,
                    i + ld._CDC_K,
                ),
            ),
            lambda x: x.isNotNull() & (x < F.col("n")),
        ),
    ).otherwise(F.array().cast("array<int>"))
    bounds = F.array_sort(
        F.array_distinct(
            F.concat(F.array(F.lit(0)), cuts.cast("array<int>"), F.array(F.col("n")))
        )
    )
    chunked = base.withColumn("bounds", bounds).select(
        "doc_id",
        "text",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.size("bounds") - 2),
                lambda j: F.array_join(
                    F.slice(
                        F.col("t"),
                        F.element_at("bounds", j + 1) + 1,
                        F.element_at("bounds", j + 2)
                        - F.element_at("bounds", j + 1),
                    ),
                    " ",
                ),
            ),
            " ",
        ).alias("reassembled"),
        F.transform(
            F.sequence(F.lit(0), F.size("bounds") - 2),
            lambda j: F.array_join(
                F.slice(
                    F.col("t"),
                    F.element_at("bounds", j + 1) + 1,
                    F.element_at("bounds", j + 2) - F.element_at("bounds", j + 1),
                ),
                " ",
            ),
        ).alias("chunks"),
    )
    got = {r.doc_id: r for r in chunked.collect()}
    n_shared_tail = 0
    for i, text in enumerate(base_docs):
        orig, pref = got[2 * i], got[2 * i + 1]
        # invariant 1: exact reassembly
        assert orig.reassembled == text
        assert pref.reassembled == prefix + " " + text
        # invariant 2: self-synchronization — every original chunk that
        # starts at/after the prefixed doc's first interior cut beyond
        # the prefix region must appear verbatim among the prefixed
        # doc's chunks
        orig_set = set(orig.chunks)
        tail_shared = [c for c in pref.chunks[1:] if c in orig_set]
        n_shared_tail += len(tail_shared)
        # after the first realigned boundary, chunks are common; docs
        # long enough to have >=2 cuts must share at least one chunk
        if len(orig.chunks) >= 3 and len(pref.chunks) >= 3:
            assert tail_shared, (
                f"doc {i}: no shared chunk after prefix insertion — "
                "boundaries failed to re-synchronize"
            )
    assert n_shared_tail > 0


def test_multiprobe_dominates_single_probe(spark, sf_dir):
    """Multi-probe candidates are a superset of single-probe candidates
    (the exact band key is always probed), so per query: candidate count
    and recall@10 must both be >= the single-probe values."""
    rows = REGISTRY["multiprobe_recall_gain"].fn(spark, sf_dir).collect()
    single = {r.query_id: r for r in rows if r.method == "lsh_single"}
    multi = {r.query_id: r for r in rows if r.method == "lsh_multiprobe"}
    assert set(single) == set(multi) and single
    for qid in single:
        assert multi[qid].n_candidates >= single[qid].n_candidates
        assert multi[qid].recall_ppm >= single[qid].recall_ppm


def test_tv_drift_is_a_bounded_metric(spark, sf_dir):
    rows = REGISTRY["source_token_tv_drift"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.tv_ppm <= 1_000_000, "TV distance must be in [0, 1]"
        assert r.distinct_tokens >= 1


def test_kcenter_distances_non_increasing(spark, sf_dir):
    """Farthest-point traversal: the selected max-min distance can never
    increase from one round to the next (the 2-approximation argument
    rests on this monotonicity)."""
    rows = sorted(
        REGISTRY["kcenter_greedy_seeding"].fn(spark, sf_dir).collect(),
        key=lambda r: r.seed_round,
    )
    assert [r.seed_round for r in rows] == [0, 1, 2, 3]
    assert len({r.vec_id for r in rows}) == 4, "seeds must be distinct"
    # Round 0 is excluded by construction: the first seed is picked by
    # min vec_id, not by distance, and its dist_ppm is defined as 0 — so
    # monotonicity only holds from round 1 onward.
    assert rows[0].dist_ppm == 0
    for a, b in zip(rows[1:], rows[2:]):
        assert b.dist_ppm <= a.dist_ppm


def test_power_iteration_output_is_unit_norm(spark, sf_dir):
    rows = REGISTRY["embedding_power_iteration"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    norm2 = sum((r.loading_ppm / 1e6) ** 2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-3, f"loadings should be ~unit norm, got {norm2}"


def test_bpe_rounds_vocab_and_counts_sane(spark, sf_dir):
    rows = sorted(
        REGISTRY["bpe_merge_rounds"].fn(spark, sf_dir).collect(),
        key=lambda r: r.merge_round,
    )
    assert [r.merge_round for r in rows] == [1, 2, 3]
    for r in rows:
        assert r.merged == r.pair_a + r.pair_b
        assert r.pair_count >= 1
    # each merge adds exactly one (new) symbol unless it eliminated all
    # occurrences of an old one; vocab can never grow by more than 1
    for a, b in zip(rows, rows[1:]):
        assert b.vocab_after <= a.vocab_after + 1
    # the argmax pair count can never increase round-over-round more
    # than... (not monotone in general) — but it must stay positive
    assert all(r.pair_count > 0 for r in rows)


def test_backlog_never_negative_and_closes_out(spark, sf_dir):
    rows = REGISTRY["orders_open_backlog_daily"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.open_orders >= 0
        assert r.opened >= 0 and r.closed >= 0
    assert rows[-1].open_orders == 0, "all orders eventually close"
    assert sum(r.opened for r in rows) == sum(r.closed for r in rows)
