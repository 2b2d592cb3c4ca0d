"""Training-corpus curation operators (engine extensions, round 5).

Three pipeline stages a 100 TB pretraining-data build runs between raw
crawl and tokenizer:

* ``segment_dedup_retention`` — the APPLICATION stage of exact substring
  dedup (CCNet / RefinedWeb line-level dedup; Lee et al. 2022): chunk
  every document into fixed 8-token segments, keep each distinct
  segment's FIRST occurrence corpus-wide, and report per-source
  retention. ``crossdoc_ngram_spans`` (queries/scale_ops.py) is the
  discovery stage — this is the stage that actually drops text.
* ``token_budget_selection`` — quality-ranked greedy selection under a
  global token budget (the "data mixing under a token target" step of
  every pretraining run): rank docs by an exact integer quality score,
  admit in rank order while the running token total fits the budget.
  The global prefix-sum runs on ``global_ordered_cumsum`` — ONE range
  shuffle + an Arrow running-total pass — never a single-partition
  window.
* ``kanonymity_audit`` — governance: how identifiable is a customer
  from the quasi-identifier triple (nation, market segment, account-
  balance bucket)? Reports k-anonymity group structure per segment.

Reference scope note: the reference pipeline (SURVEY.md §2) has no
curation surface; these are extension operators the brief's
training-data track requires. All arithmetic is integer (counts, ppm
shares via ``div``) so Spark and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.windows import global_ordered_cumsum
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import fan_out, load_table

SEG_TOKENS = 8
# Combined first-occurrence key: doc_id * 2^20 + seg_idx. Lexicographic
# (doc_id, seg_idx) order as ONE comparable BIGINT — supports ~1M
# segments/doc and doc_id < 2^43 before overflow, both far beyond the
# corpus (documents are single-space tokenized; segments/doc ≈ tokens/8).
_SEG_KEY_BASE = 1 << 20


def _doc_segments(docs: DataFrame) -> DataFrame:
    """One row per (doc, 8-token segment): explode fixed non-overlapping
    token windows. Pure codegen Column work (split / sequence / slice /
    array_join) — no UDFs; the explode fans out ~tokens/8 rows per doc."""
    toks = F.split(F.col("text"), " ")
    n_segs = ((F.size(toks) + F.lit(SEG_TOKENS - 1)) / SEG_TOKENS).cast("int")
    return (
        docs.select(
            "doc_id",
            "source",
            toks.alias("tok"),
            F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx"),
        )
        .select(
            "doc_id",
            "source",
            F.col("seg_idx").cast("bigint").alias("seg_idx"),
            F.array_join(
                F.slice(
                    F.col("tok"),
                    F.col("seg_idx") * SEG_TOKENS + 1,
                    SEG_TOKENS,
                ),
                " ",
            ).alias("seg_text"),
        )
    )


@register(
    "segment_dedup_retention",
    ops="EXT-dedup-segment,P6,A1,A5,J1 (line-level dedup application stage)",
    doc="CCNet-style segment-level exact dedup with retention accounting: "
    "split each doc into fixed 8-token segments, keep each distinct "
    "segment's first corpus occurrence (min (doc_id, seg_idx) as one "
    "combined BIGINT key), and report per source: segments total/kept, "
    "docs intact (nothing dropped) / emptied (everything dropped), and "
    "retained ppm. Both shuffles key on segment text — as spreadable as "
    "the corpus; winners join back segment-grain (same key, AQE-local).",
    oracle=f"""
WITH segs AS (
  SELECT doc_id, source, seg_idx,
         array_to_string(
           list_slice(tok, seg_idx * {SEG_TOKENS} + 1,
                      seg_idx * {SEG_TOKENS} + {SEG_TOKENS}), ' ') AS seg_text
  FROM (
    SELECT doc_id, source, tok,
           unnest(range((len(tok) + {SEG_TOKENS - 1}) // {SEG_TOKENS}))
             AS seg_idx
    FROM (SELECT doc_id, source, string_split(text, ' ') AS tok
          FROM documents)
  )
),
winners AS (
  SELECT seg_text,
         MIN(doc_id * {_SEG_KEY_BASE} + seg_idx) AS win_key
  FROM segs GROUP BY seg_text
),
flagged AS (
  SELECT s.doc_id, s.source,
         CASE WHEN s.doc_id * {_SEG_KEY_BASE} + s.seg_idx = w.win_key
              THEN 1 ELSE 0 END AS kept
  FROM segs s JOIN winners w USING (seg_text)
),
per_doc AS (
  SELECT doc_id, source,
         CAST(COUNT(1) AS BIGINT) AS n_segs,
         CAST(SUM(kept) AS BIGINT) AS n_kept
  FROM flagged GROUP BY doc_id, source
)
SELECT source,
       CAST(COUNT(1) AS BIGINT) AS docs_total,
       CAST(SUM(CASE WHEN n_kept = n_segs THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_intact,
       CAST(SUM(CASE WHEN n_kept = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_emptied,
       CAST(SUM(n_segs) AS BIGINT) AS segs_total,
       CAST(SUM(n_kept) AS BIGINT) AS segs_kept,
       CAST(SUM(n_kept) * 1000000 // SUM(n_segs) AS BIGINT)
         AS retained_ppm
FROM per_doc
GROUP BY source
ORDER BY source
""",
)
def segment_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    segs = _doc_segments(docs)
    seg_key = (F.col("doc_id") * _SEG_KEY_BASE + F.col("seg_idx")).alias(
        "seg_key"
    )
    keyed = segs.select("doc_id", "source", "seg_text", seg_key)
    winners = keyed.groupBy("seg_text").agg(
        F.min("seg_key").alias("win_key")
    )
    flagged = keyed.join(winners, "seg_text").select(
        "doc_id",
        "source",
        F.when(F.col("seg_key") == F.col("win_key"), 1)
        .otherwise(0)
        .alias("kept"),
    )
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum("kept").alias("n_kept"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_total"),
            F.sum(
                F.when(F.col("n_kept") == F.col("n_segs"), 1).otherwise(0)
            ).alias("docs_intact"),
            F.sum(F.when(F.col("n_kept") == 0, 1).otherwise(0)).alias(
                "docs_emptied"
            ),
            F.sum("n_segs").alias("segs_total"),
            F.sum("n_kept").alias("segs_kept"),
            F.expr("sum(n_kept) * 1000000 div sum(n_segs)").alias(
                "retained_ppm"
            ),
        )
        .orderBy("source")
    )


BUDGET_PCT = 30


@register(
    "token_budget_selection",
    ops="EXT-budget-select,W2,A1 (global ordered prefix sum, two-phase)",
    doc="Quality-ranked greedy selection under a global token budget "
    "(30% of corpus tokens): score each doc by distinct-token ppm "
    "(exact integer), rank by (quality DESC, doc_id), admit while the "
    "running token total fits. The corpus-wide prefix sum runs on "
    "global_ordered_cumsum — ONE range shuffle + an Arrow running-total "
    "pass + broadcast per-partition offsets — never a single-partition "
    "window. Reports per-source admission.",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) * 1000000
              // len(string_split(text, ' ')) AS BIGINT) AS quality_ppm
  FROM documents
),
cum AS (
  SELECT *,
         CAST(SUM(n_tokens) OVER (ORDER BY quality_ppm DESC, doc_id)
              AS BIGINT) AS cum_tokens,
         CAST((SELECT SUM(n_tokens) FROM scored) * {BUDGET_PCT} // 100
              AS BIGINT) AS budget
  FROM scored
)
SELECT source,
       CAST(COUNT(1) AS BIGINT) AS docs_total,
       CAST(SUM(CASE WHEN cum_tokens <= budget THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN cum_tokens <= budget THEN n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_kept,
       CAST(COALESCE(MIN(CASE WHEN cum_tokens <= budget
                               THEN quality_ppm END), -1) AS BIGINT)
         AS min_quality_kept_ppm
FROM cum
GROUP BY source
ORDER BY source
""",
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 1000000"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("quality_ppm"),
    )
    # Corpus token total: the cumsum's stats pass already sums every
    # partition — total_alias reuses its final accumulator, so the corpus
    # is tokenized exactly ONCE (a separate agg would re-run the whole
    # split(text) projection a second time).
    cum = global_ordered_cumsum(
        scored,
        [F.desc("quality_ppm"), F.asc("doc_id")],
        "n_tokens",
        "cum_tokens",
        total_alias="__total_tokens",
    )
    kept = F.col("cum_tokens") <= F.expr(
        f"__total_tokens * {BUDGET_PCT} div 100"
    )
    return (
        cum.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_total"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("docs_kept"),
            F.sum("n_tokens").alias("tokens_total"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias(
                "tokens_kept"
            ),
            F.coalesce(
                F.min(F.when(kept, F.col("quality_ppm"))), F.lit(-1)
            )
            .cast("bigint")
            .alias("min_quality_kept_ppm"),
        )
        .orderBy("source")
    )


K_THRESHOLD = 5


def _acctbal_bucket(col: Column) -> Column:
    """1000-wide account-balance bucket; floor of a double is IEEE-exact
    and identical across engines."""
    return F.floor(col / 1000).cast("int")


@register(
    "kanonymity_audit",
    ops="EXT-kanonymity,A1,A5,A6 (quasi-identifier group-size audit)",
    doc="k-anonymity audit over the quasi-identifier triple (nation, "
    "market segment, 1000-wide acctbal bucket): group customers by QID, "
    "then report per market segment how re-identifiable the population "
    "is — group count, customers in groups below k=5, singleton groups, "
    "min/max group size, at-risk ppm. Two aggregates (QID grain, then "
    "segment grain); all keys high-cardinality-spreadable.",
    oracle=f"""
WITH qid AS (
  SELECT c_mktsegment,
         c_nationkey,
         CAST(FLOOR(c_acctbal / 1000) AS INTEGER) AS bal_bucket,
         CAST(COUNT(1) AS BIGINT) AS k
  FROM customer
  GROUP BY c_mktsegment, c_nationkey, bal_bucket
)
SELECT c_mktsegment,
       CAST(COUNT(1) AS BIGINT) AS n_groups,
       CAST(SUM(k) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN k < {K_THRESHOLD} THEN k ELSE 0 END) AS BIGINT)
         AS customers_at_risk,
       CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS singleton_groups,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST(SUM(CASE WHEN k < {K_THRESHOLD} THEN k ELSE 0 END) * 1000000
            // SUM(k) AS BIGINT) AS at_risk_ppm
FROM qid
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = fan_out(load_table(spark, sf_dir, "customer"))
    qid = cust.groupBy(
        "c_mktsegment",
        "c_nationkey",
        _acctbal_bucket(F.col("c_acctbal")).alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).alias("k"))
    at_risk = F.sum(
        F.when(F.col("k") < K_THRESHOLD, F.col("k")).otherwise(0)
    )
    return (
        qid.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_customers"),
            at_risk.alias("customers_at_risk"),
            F.sum(F.when(F.col("k") == 1, 1).otherwise(0)).alias(
                "singleton_groups"
            ),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.expr(
                f"sum(CASE WHEN k < {K_THRESHOLD} THEN k ELSE 0 END)"
                " * 1000000 div sum(k)"
            ).alias("at_risk_ppm"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "source_ablation_impact",
    ops="EXT-ablation,A1,J1 (leave-one-source-out corpus valuation)",
    doc="Data valuation lite — what does each source contribute to the "
    "corpus? For every source: token share, vocabulary types EXCLUSIVE "
    "to it (lost if the source were dropped), vocab-loss ppm, and the "
    "corpus type-token ratio WITHOUT the source — all from ONE pass of "
    "grouped counts (no per-source re-scan: the leave-one-out metrics "
    "are algebraic in (token, source) counts). Token-keyed shuffles "
    "only; the two corpus scalars ride a 1-row broadcast.",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
),
per_ts AS (
  SELECT t, source, CAST(COUNT(1) AS BIGINT) AS occ
  FROM tok GROUP BY t, source
),
per_t AS (
  SELECT t, CAST(SUM(occ) AS BIGINT) AS total_occ,
         CAST(COUNT(1) AS BIGINT) AS n_sources
  FROM per_ts GROUP BY t
),
scal AS (
  SELECT CAST(COUNT(1) AS BIGINT) AS v_all,
         CAST(SUM(total_occ) AS BIGINT) AS n_all
  FROM per_t
),
per_source AS (
  SELECT ts.source,
         CAST(SUM(ts.occ) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN t.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS exclusive_types
  FROM per_ts ts JOIN per_t t USING (t)
  GROUP BY ts.source
),
docs_per AS (
  SELECT source, CAST(COUNT(1) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
)
SELECT p.source, d.n_docs, p.n_tokens,
       CAST(p.n_tokens * 1000000 // s.n_all AS BIGINT) AS token_share_ppm,
       p.exclusive_types,
       CAST(p.exclusive_types * 1000000 // s.v_all AS BIGINT)
         AS vocab_loss_ppm,
       CAST((s.v_all - p.exclusive_types) * 1000000
            // (s.n_all - p.n_tokens) AS BIGINT) AS ttr_without_ppm
FROM per_source p
JOIN docs_per d USING (source)
CROSS JOIN scal s
ORDER BY p.source
""",
)
def source_ablation_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    per_ts = tok.groupBy("t", "source").agg(
        F.count(F.lit(1)).alias("occ")
    )
    per_t = per_ts.groupBy("t").agg(
        F.sum("occ").alias("total_occ"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    scal = per_t.agg(
        F.count(F.lit(1)).alias("v_all"),
        F.sum("total_occ").alias("n_all"),
    )
    per_source = (
        per_ts.join(per_t.select("t", "n_sources"), "t")
        .groupBy("source")
        .agg(
            F.sum("occ").alias("n_tokens"),
            F.sum(
                F.when(F.col("n_sources") == 1, 1).otherwise(0)
            ).alias("exclusive_types"),
        )
    )
    docs_per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        per_source.join(docs_per, "source")
        .join(F.broadcast(scal))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("n_tokens * 1000000 div n_all").alias("token_share_ppm"),
            "exclusive_types",
            F.expr("exclusive_types * 1000000 div v_all").alias(
                "vocab_loss_ppm"
            ),
            F.expr(
                "(v_all - exclusive_types) * 1000000 div (n_all - n_tokens)"
            ).alias("ttr_without_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Class-balance reweighting plan (round 6)
# ---------------------------------------------------------------------------


@register(
    "class_balance_reweighting",
    ops="EXT-curation-reweight,A1 (inverse-frequency class weights)",
    doc="Inverse-frequency class-balance weights over the language "
    "column: weight_ppm = total / (n_classes * class_count) in integer "
    "ppm, plus the post-reweight share per class (integer cross-check "
    "that the weighted mixture is ~uniform) and the raw-vs-uniform "
    "deficit. Two bounded aggregates + a 1-row totals broadcast — the "
    "standard loss-reweighting / sampler-weight table at any scale.",
    oracle="""
WITH per_class AS (
  SELECT lang, COUNT(1) AS n_docs FROM documents GROUP BY lang
),
tot AS (
  SELECT SUM(n_docs) AS n_total, COUNT(1) AS n_classes FROM per_class
),
weighted AS (
  SELECT p.lang, p.n_docs, t.n_total, t.n_classes,
         p.n_docs * 1000000 // t.n_total AS raw_share_ppm,
         t.n_total * 1000000 // (t.n_classes * p.n_docs) AS weight_ppm
  FROM per_class p CROSS JOIN tot t
)
SELECT lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(raw_share_ppm AS BIGINT) AS raw_share_ppm,
       CAST(weight_ppm AS BIGINT) AS weight_ppm,
       CAST(n_docs::HUGEINT * weight_ppm * 1000000
            // (SELECT SUM(n_docs::HUGEINT * (n_total * 1000000 // (n_classes * n_docs)))
                FROM weighted) AS BIGINT) AS reweighted_share_ppm
FROM weighted
ORDER BY lang
""",
)
def class_balance_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_class = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_class.agg(
        F.sum("n_docs").alias("n_total"),
        F.count(F.lit(1)).alias("n_classes"),
    )
    weighted = per_class.join(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr("(n_docs * 1000000) div n_total").alias("raw_share_ppm"),
        F.expr("(n_total * 1000000) div (n_classes * n_docs)").alias(
            "weight_ppm"
        ),
    )
    # decimal(38,0) lift: n_docs * weight_ppm * 1e6 overflows int64 once
    # class counts reach ~1e7 docs — the 10x-probe bug pattern.
    wsum = weighted.agg(
        F.sum(
            F.expr("cast(n_docs as decimal(38,0)) * weight_ppm")
        ).alias("w_total")
    )
    return (
        weighted.join(F.broadcast(wsum))
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("raw_share_ppm").cast("bigint").alias("raw_share_ppm"),
            F.col("weight_ppm").cast("bigint").alias("weight_ppm"),
            F.expr(
                "cast((cast(n_docs as decimal(38,0)) * weight_ppm * 1000000)"
                " div w_total as bigint)"
            ).alias("reweighted_share_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Output-shard packing plan (round 6)
# ---------------------------------------------------------------------------

_SHARD_TOKENS = 2_000  # tokens per output shard (test-scale knob)


@register(
    "shard_packing_plan",
    ops="EXT-curation-sharding,A1,W1 (balanced output-shard assignment)",
    doc="Deterministic output-shard packing: docs in doc_id order are "
    "packed greedily into fixed token-budget shards — shard_id = "
    "(cumulative_tokens - 1) div budget on the exact two-phase global "
    "cumsum (global_ordered_cumsum: ONE range shuffle + Arrow running "
    "total, no single-partition window). Per shard: docs, tokens, "
    "doc_id range, fill ppm. The write-side plan every 100 TB export "
    "needs: balanced files without a global sort bottleneck.",
    oracle=f"""
WITH sized AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM sized
),
assigned AS (
  SELECT doc_id, n_tokens,
         (cum_tokens - 1) // {_SHARD_TOKENS} AS shard_id
  FROM cum
)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(COUNT(1) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc,
       CAST(SUM(n_tokens) * 1000000 // {_SHARD_TOKENS} AS BIGINT)
         AS fill_ppm
FROM assigned
GROUP BY shard_id
ORDER BY shard_id
""",
)
def shard_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    cum = global_ordered_cumsum(
        sized, [F.asc("doc_id")], "n_tokens", "cum_tokens"
    )
    assigned = cum.select(
        "doc_id",
        "n_tokens",
        F.expr(f"(cum_tokens - 1) div {_SHARD_TOKENS}").alias("shard_id"),
    )
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
            F.expr(
                f"cast((sum(n_tokens) * 1000000) div {_SHARD_TOKENS}"
                " as bigint)"
            ).alias("fill_ppm"),
        )
        .select(F.col("shard_id").cast("bigint").alias("shard_id"), "n_docs",
                "tokens", "first_doc", "last_doc", "fill_ppm")
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# Greedy set-cover selection (round 8)
# ---------------------------------------------------------------------------

_COVER_ROUNDS = 4
_COVER_GRAM = 8


def _cover_oracle() -> str:
    """Unrolled greedy max-coverage CTEs: round t picks the doc with the
    most grams NOT covered by rounds 1..t-1 (ties: min doc_id)."""
    parts = [
        rf"""g AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(array_to_string(
            list_slice(t, i + 1, i + {_COVER_GRAM}), ' ')), 1, 15))::BIGINT AS gr
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
       unnest(range(0, greatest(len(t) - {_COVER_GRAM - 1}, 0))) u(i)
)"""
    ]
    prev_cov = None
    selects = []
    for t in range(1, _COVER_ROUNDS + 1):
        gain_src = (
            "g"
            if prev_cov is None
            else f"(SELECT doc_id, gr FROM g ANTI JOIN {prev_cov} USING (gr))"
        )
        parts.append(
            f"p{t} AS (SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS gain "
            f"FROM {gain_src} q{t} GROUP BY doc_id "
            f"ORDER BY gain DESC, doc_id LIMIT 1)"
        )
        cov = f"c{t}"
        base = "SELECT gr FROM g JOIN p{t} USING (doc_id)".format(t=t)
        if prev_cov is None:
            parts.append(f"{cov} AS ({base})")
        else:
            parts.append(f"{cov} AS (SELECT gr FROM {prev_cov} UNION {base})")
        prev_cov = cov
        selects.append(
            f"SELECT CAST({t} AS BIGINT) AS round, doc_id, gain,"
            f" (SELECT CAST(COUNT(1) AS BIGINT) FROM c{t}) AS covered_total"
            f" FROM p{t}"
        )
    return (
        "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)
        + "\nORDER BY round"
    )


@register(
    "greedy_gram_cover",
    ops="EXT-curation-setcover,A1,J-anti (submodular max-coverage pick)",
    doc="Greedy maximum-coverage selection (the 1-1/e submodular "
    "guarantee; the DataComp/coreset 'cover the benchmark vocabulary "
    "with k exemplars' op): 4 unrolled rounds, each picking the doc "
    "with the most distinct 8-grams NOT yet covered (ties: min doc_id) "
    "and folding its grams into the covered set. Per round: one anti-"
    "join of the gram postings against the (selected-docs-bounded, "
    "checkpointed) covered set + one groupBy argmax — the kcenter/"
    "kcore eager-checkpoint pattern keeps plan lineage flat. Emits "
    "(round, doc_id, marginal gain, cumulative covered grams) — gains "
    "non-increasing by submodularity, pinned by a golden test.",
    oracle=_cover_oracle(),
)
def greedy_gram_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.dedup import positional_gram_postings

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    g = (
        positional_gram_postings(docs, _COVER_GRAM)
        .select("doc_id", F.col("g").alias("gr"))
        .distinct()
        .localCheckpoint(eager=False)  # scanned once per round
    )
    covered = None
    picks = []
    for t in range(1, _COVER_ROUNDS + 1):
        pool = g if covered is None else g.join(covered, "gr", "leftanti")
        # 1-row pick, eagerly checkpointed: without it round t's plan
        # embeds every prior round's argmax subtree (the kcenter lesson)
        pick = (
            pool.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("gain"))
            .orderBy(F.desc("gain"), F.asc("doc_id"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        new_cov = g.join(F.broadcast(pick.select("doc_id")), "doc_id").select("gr")
        covered = (
            new_cov
            if covered is None
            else covered.unionByName(new_cov).distinct()
        ).localCheckpoint(eager=True)  # bounded by selected docs' vocab
        n_cov = covered.count()  # tiny relation; drives the output column
        picks.append(
            pick.select(
                F.lit(t).cast("bigint").alias("round"),
                "doc_id",
                "gain",
                F.lit(n_cov).cast("bigint").alias("covered_total"),
            )
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.orderBy("round")


# ---------------------------------------------------------------------------
# Curriculum phase assignment (round 9)
# ---------------------------------------------------------------------------

_PHASE1_PCT = 20  # highest-quality tokens first
_PHASE2_PCT = 50  # cumulative cut for phase 2; remainder is phase 3


@register(
    "curriculum_phase_assignment",
    ops="EXT-curriculum,W2,A1 (multi-threshold budgeted ordering)",
    doc="Quality-ordered curriculum split: rank docs by distinct-token "
    "quality (DESC, doc_id tiebreak), run ONE corpus-wide prefix sum of "
    "tokens (global_ordered_cumsum: range shuffle + Arrow running total; "
    "the grand total rides out of the same pass via total_alias, no "
    "second scan), and cut the order at 20% / 50% of total tokens into "
    "training phases 1-3 (highest-quality tokens teach first). Reports "
    "per (phase, source): docs, tokens, and the quality band the phase "
    "spans — the curriculum-schedule evidence for staged pretraining.",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) * 1000000
              // len(string_split(text, ' ')) AS BIGINT) AS quality_ppm
  FROM documents
),
cum AS (
  SELECT *,
         CAST(SUM(n_tokens) OVER (ORDER BY quality_ppm DESC, doc_id)
              AS BIGINT) AS cum_tokens,
         CAST((SELECT SUM(n_tokens) FROM scored) AS BIGINT) AS total
  FROM scored
),
phased AS (
  SELECT *,
         CASE WHEN cum_tokens <= total * {_PHASE1_PCT} // 100 THEN 1
              WHEN cum_tokens <= total * {_PHASE2_PCT} // 100 THEN 2
              ELSE 3 END AS phase
  FROM cum
)
SELECT CAST(phase AS INTEGER) AS phase, source,
       CAST(COUNT(1) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens,
       CAST(MIN(quality_ppm) AS BIGINT) AS min_quality_ppm,
       CAST(MAX(quality_ppm) AS BIGINT) AS max_quality_ppm
FROM phased
GROUP BY phase, source
ORDER BY phase, source
""",
)
def curriculum_phase_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 1000000"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("quality_ppm"),
    )
    cum = global_ordered_cumsum(
        scored,
        [F.desc("quality_ppm"), F.asc("doc_id")],
        "n_tokens",
        "cum_tokens",
        total_alias="__total",
    )
    phased = cum.withColumn(
        "phase",
        F.expr(
            f"CASE WHEN cum_tokens <= __total * {_PHASE1_PCT} div 100 THEN 1 "
            f"WHEN cum_tokens <= __total * {_PHASE2_PCT} div 100 THEN 2 "
            "ELSE 3 END"
        ).cast("int"),
    )
    return (
        phased.groupBy("phase", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens"),
            F.min("quality_ppm").cast("bigint").alias("min_quality_ppm"),
            F.max("quality_ppm").cast("bigint").alias("max_quality_ppm"),
        )
        .orderBy("phase", "source")
    )


# ---------------------------------------------------------------------------
# Context-window truncation waste (round 9)
# ---------------------------------------------------------------------------

_CTX_LIMITS = (256, 512, 1024)


@register(
    "context_truncation_waste",
    ops="EXT-curation-context,A1,A3 (context-length budget audit)",
    doc="Context-window sizing evidence: for each candidate training "
    "context length (256/512/1024 tokens), how many documents exceed it, "
    "how many tokens a hard truncation discards, and the discarded "
    "fraction in ppm — the trade a packing pipeline weighs before fixing "
    "its sequence length. ONE corpus scan, conditional aggregates per "
    "limit over the broadcast 3-row grid; all exact integers.",
    oracle=f"""
WITH sized AS (
  SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
),
lims AS (SELECT unnest([{", ".join(str(l) for l in _CTX_LIMITS)}])
           AS ctx_limit),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(COUNT(1) AS BIGINT) AS total_docs FROM sized)
SELECT CAST(l.ctx_limit AS INTEGER) AS ctx_limit,
       t.total_docs,
       CAST(SUM(CASE WHEN s.n_tokens > l.ctx_limit THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_truncated,
       CAST(SUM(GREATEST(s.n_tokens - l.ctx_limit, 0)) AS BIGINT)
         AS tokens_lost,
       CAST(SUM(GREATEST(s.n_tokens - l.ctx_limit, 0)) * 1000000
            // t.total_tokens AS BIGINT) AS lost_ppm
FROM sized s, lims l, tot t
GROUP BY l.ctx_limit, t.total_docs, t.total_tokens
ORDER BY ctx_limit
""",
)
def context_truncation_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    sized = docs.select(
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens")
    )
    lims = spark.range(1).select(
        F.explode(F.array(*[F.lit(l) for l in _CTX_LIMITS])).alias("ctx_limit")
    )
    tot = sized.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("total_docs"),
    )
    return (
        sized.join(F.broadcast(lims), F.lit(True))
        .join(F.broadcast(tot), F.lit(True))
        .groupBy("ctx_limit", "total_docs", "total_tokens")
        .agg(
            F.sum(F.when(F.col("n_tokens") > F.col("ctx_limit"), 1).otherwise(0))
            .cast("bigint")
            .alias("docs_truncated"),
            F.sum(F.greatest(F.col("n_tokens") - F.col("ctx_limit"), F.lit(0)))
            .cast("bigint")
            .alias("tokens_lost"),
            F.expr(
                "CAST(sum(GREATEST(n_tokens - ctx_limit, 0)) * 1000000"
                " div total_tokens AS BIGINT)"
            ).alias("lost_ppm"),
        )
        .select(
            F.col("ctx_limit").cast("int").alias("ctx_limit"),
            "total_docs",
            "docs_truncated",
            "tokens_lost",
            "lost_ppm",
        )
        .orderBy("ctx_limit")
    )
