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
