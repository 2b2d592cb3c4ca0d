"""Text-analysis queries over ``documents`` with DuckDB oracles.

The oracle SQL mirrors each Spark expression operation-for-operation
(same operand order, same integer/double division points) so doubles come
out bit-identical. DuckDB regexp_replace needs the 'g' flag to match
Spark's replace-all semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.functions.text import (
    LANG_MARKERS,
    fingerprint,
    lang_guess,
    quality_score,
    token_count,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table

_EN = LANG_MARKERS["en"]
_ES = LANG_MARKERS["es"]
_DE = LANG_MARKERS["de"]

_LANG_CASE = f"""CASE
  WHEN len(regexp_extract_all(text, '{_EN}')) >= len(regexp_extract_all(text, '{_ES}'))
   AND len(regexp_extract_all(text, '{_EN}')) >= len(regexp_extract_all(text, '{_DE}'))
   AND len(regexp_extract_all(text, '{_EN}')) > 0 THEN 'en'
  WHEN len(regexp_extract_all(text, '{_ES}')) >= len(regexp_extract_all(text, '{_DE}'))
   AND len(regexp_extract_all(text, '{_ES}')) > 0 THEN 'es'
  WHEN len(regexp_extract_all(text, '{_DE}')) > 0 THEN 'de'
  ELSE 'und' END"""


@register(
    "text_quality_profile",
    ops="EXT-text,F1,F6,P6",
    doc="Per-document text stats: token count, heuristic language ID, "
    "quality score, normalized fingerprint — all JVM-side expressions.",
    oracle=f"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       {_LANG_CASE} AS lang_guess,
       len(regexp_extract_all(text, '{_EN}'))
         / len(regexp_split_to_array(trim(text), '\\s+')) * 0.4
       + least(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.3
       + (1.0 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
              / length(text)) * 0.3 AS quality,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents
""",
)
def text_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        lang_guess("text").alias("lang_guess"),
        quality_score("text").alias("quality"),
        fingerprint("text").alias("fp"),
    )


@register(
    "text_lang_report",
    ops="EXT-text,A5,F9",
    doc="Corpus report: per (source, guessed language) doc count, label "
    "agreement, mean token count.",
    oracle=f"""
WITH profiled AS (
  SELECT source, lang,
         {_LANG_CASE} AS lang_guess,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
)
SELECT source, lang_guess,
       COUNT(1) AS n_docs,
       COUNT(CASE WHEN lang_guess = lang THEN 1 END) AS label_matches,
       AVG(n_tokens) AS avg_tokens
FROM profiled
GROUP BY source, lang_guess
""",
)
def text_lang_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    profiled = docs.select(
        "source",
        "lang",
        lang_guess("text").alias("lang_guess"),
        token_count("text").alias("n_tokens"),
    )
    return profiled.groupBy("source", "lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("lang_guess") == F.col("lang"), True)).alias("label_matches"),
        F.avg("n_tokens").alias("avg_tokens"),
    )


# BPE-ish pre-tokenization pattern (GPT-2-style segment classes without
# lookarounds, so Java regex and RE2 agree): letter runs, digit runs,
# punctuation singletons.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "text_bpe_tokens",
    ops="EXT-text-bpe",
    doc="BPE-ish regex pre-tokenization: per-doc segment count + "
    "whitespace-token ratio (the token-budget estimator shape).",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS INTEGER)
         AS bpe_segments,
       len(regexp_extract_all(text, '{BPE_PATTERN}'))
         / len(regexp_split_to_array(trim(text), '\\s+')) AS segs_per_word
FROM documents
""",
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    segs = F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
    return docs.select(
        "doc_id",
        segs.alias("bpe_segments"),
        (segs / token_count("text")).alias("segs_per_word"),
    )


# The quality expression as reusable SQL (mirrors functions.text
# .quality_score op-for-op; also used inline by the funnel oracle).
_QUALITY_SQL = f"""
       len(regexp_extract_all(text, '{_EN}'))
         / len(regexp_split_to_array(trim(text), '\\s+')) * 0.4
       + least(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.3
       + (1.0 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
              / length(text)) * 0.3"""


@register(
    "source_quality_rollup",
    ops="EXT-source-reputation,A1,A3,A5 (two-level rollup + join-back)",
    doc="Per-source reputation rollup (the RefinedWeb-style source "
    "scoring gate): doc count, exact mean quality (floor-quantized "
    "integer sum, order-independent), mean tokens, low-quality fraction, "
    "and within-source duplicate fraction from fingerprint multiplicity.",
    oracle=f"""
WITH base AS (
  SELECT source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         CAST(FLOOR(({_QUALITY_SQL}) * 1000000000.0) AS BIGINT) AS q9,
         len(regexp_split_to_array(trim(text), '\\s+')) AS ntok,
         CASE WHEN ({_QUALITY_SQL}) < 0.3 THEN 1 ELSE 0 END AS lowq
  FROM documents
),
fpc AS (SELECT source, fp, COUNT(1) AS c FROM base GROUP BY source, fp),
dup AS (SELECT source, CAST(SUM(c - 1) AS BIGINT) AS n_dup FROM fpc GROUP BY source),
agg AS (
  SELECT source, COUNT(1) AS n_docs,
         CAST(SUM(q9) AS DOUBLE) / (1000000000.0 * COUNT(1)) AS avg_quality,
         CAST(SUM(ntok) AS BIGINT) / COUNT(1) AS avg_tokens,
         CAST(SUM(lowq) AS BIGINT) / COUNT(1) AS low_q_frac
  FROM base GROUP BY source
)
SELECT a.source, a.n_docs, a.avg_quality, a.avg_tokens, a.low_q_frac,
       d.n_dup / a.n_docs AS dup_frac
FROM agg a JOIN dup d USING (source)
""",
)
def source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    q = quality_score("text")
    n = F.count(F.lit(1))
    base = docs.select(
        "source",
        fingerprint("text").alias("fp"),
        F.floor(q * F.lit(1000000000.0)).cast("bigint").alias("q9"),
        token_count("text").alias("ntok"),
        (q < F.lit(0.3)).cast("int").alias("lowq"),
    )
    fpc = base.groupBy("source", "fp").agg(F.count(F.lit(1)).alias("c"))
    dup = fpc.groupBy("source").agg(F.sum(F.col("c") - 1).alias("n_dup"))
    agg = base.groupBy("source").agg(
        n.alias("n_docs"),
        (F.sum("q9").cast("double") / (F.lit(1000000000.0) * n)).alias("avg_quality"),
        (F.sum("ntok") / n).alias("avg_tokens"),
        (F.sum("lowq") / n).alias("low_q_frac"),
    )
    return agg.join(dup, "source").select(
        "source", "n_docs", "avg_quality", "avg_tokens", "low_q_frac",
        (F.col("n_dup") / F.col("n_docs")).alias("dup_frac"),
    )


_QUALITY_SQL = f"""len(regexp_extract_all(text, '{_EN}'))
         / len(regexp_split_to_array(trim(text), '\\s+')) * 0.4
       + least(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.3
       + (1.0 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
              / length(text)) * 0.3"""


@register(
    "filter_cascade_audit",
    ops="EXT-filter-cascade,A5,F1 (pipeline observability)",
    doc="Curation-filter cascade audit: each document is attributed to "
    "the FIRST filter it fails (too_short -> low_quality -> unknown_lang "
    "-> pass), rolled up per (source, verdict) with doc counts and the "
    "group's worst quality. The single-scan CASE cascade is how a "
    "100 TB curation run explains its kill rates without re-running "
    "filters; min/max aggregates keep doubles order-independent.",
    oracle=f"""
WITH scored AS (
  SELECT source,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         {_QUALITY_SQL} AS quality,
         {_LANG_CASE} AS lang_guess
  FROM documents
),
verdicts AS (
  SELECT source,
         CASE WHEN n_tokens < 20 THEN 'too_short'
              WHEN quality < 0.40 THEN 'low_quality'
              WHEN lang_guess = 'und' THEN 'unknown_lang'
              ELSE 'pass' END AS verdict,
         quality
  FROM scored
)
SELECT source, verdict, COUNT(1) AS n_docs,
       MIN(quality) AS min_quality, MAX(quality) AS max_quality
FROM verdicts
GROUP BY source, verdict
""",
)
def filter_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
        lang_guess("text").alias("lang_guess"),
    )
    verdict = (
        F.when(F.col("n_tokens") < 20, "too_short")
        .when(F.col("quality") < 0.40, "low_quality")
        .when(F.col("lang_guess") == "und", "unknown_lang")
        .otherwise("pass")
    )
    return (
        scored.select("source", verdict.alias("verdict"), "quality")
        .groupBy("source", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
        )
    )


@register(
    "token_length_deciles",
    ops="EXT-length-profile,W1,A1 (sequence-length decile audit)",
    doc="Sequence-length decile profile — the audit behind packing/"
    "truncation decisions: documents ranked by token count into ntile"
    "(10) deciles (total order (n_toks, doc_id), so tile boundaries are "
    "engine-independent), then per decile: doc count, min/max token "
    "count, exact mean on the integer grid, and total tokens. The "
    "window runs over (doc_id, n_toks) pairs — never over token rows.",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_toks
  FROM documents
),
tiled AS (
  SELECT doc_id, n_toks,
         CAST(NTILE(10) OVER (ORDER BY n_toks ASC, doc_id ASC) AS INT)
           AS decile
  FROM t
)
SELECT decile,
       CAST(COUNT(1) AS BIGINT) AS n_docs,
       MIN(n_toks) AS min_toks,
       MAX(n_toks) AS max_toks,
       CAST(SUM(n_toks) AS BIGINT) AS total_toks,
       CAST(SUM(n_toks) AS DOUBLE) / COUNT(1) AS mean_toks
FROM tiled
GROUP BY decile
""",
)
def token_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import global_ntile_two_phase

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", token_count("text").cast("int").alias("n_toks")
    )
    # Two-phase exact NTILE(10) — an unpartitioned ntile window here would
    # sort the whole corpus through one partition at 100 TB.
    tiled = global_ntile_two_phase(
        t, [F.asc("n_toks"), F.asc("doc_id")], 10, alias="decile"
    )
    n = F.count(F.lit(1))
    return tiled.groupBy("decile").agg(
        n.alias("n_docs"),
        F.min("n_toks").alias("min_toks"),
        F.max("n_toks").alias("max_toks"),
        F.sum("n_toks").alias("total_toks"),
        (F.sum("n_toks").cast("double") / n).alias("mean_toks"),
    )


@register(
    "bpe_pair_merge_stats",
    ops="EXT-bpe-induction,A1,O3 (tokenizer merge-candidate ranking)",
    doc="The first step of BPE tokenizer induction, distributed: within "
    "every whitespace token, count all adjacent CHARACTER pairs "
    "(weighted by corpus frequency) and rank the top-20 merge "
    "candidates — exactly what a byte-pair trainer computes before its "
    "first merge. Pure expression explode (transform(sequence) over "
    "substr), one map-side-combined groupBy on the pair; no UDFs.",
    oracle="""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents
),
pairs AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> substr(t, i, 2))) AS pair
  FROM toks
  WHERE len(t) >= 2
)
SELECT pair, CAST(COUNT(1) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 20
""",
)
def bpe_pair_merge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.text import tokens
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens("text")).alias("t")).filter(
        F.length("t") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.substring(F.col("t"), i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


@register(
    "lang_id_confusion_matrix",
    ops="EXT-langid-eval,A1 (classifier confusion vs labels)",
    doc="Evaluation of the marker-word language heuristic against the "
    "corpus's lang labels: the full confusion matrix (label x guess "
    "counts) plus per-cell share of the label's row in ppm — the "
    "standard precision/recall raw material. One scan, one two-key "
    "aggregate; the window for row totals runs over the tiny matrix.",
    oracle=f"""
WITH guessed AS (
  SELECT lang AS label, {_LANG_CASE} AS guess FROM documents
),
cells AS (
  SELECT label, guess, CAST(COUNT(1) AS BIGINT) AS n
  FROM guessed GROUP BY label, guess
)
SELECT label, guess, n,
       CAST((n * 1000000) // SUM(n) OVER (PARTITION BY label) AS BIGINT)
         AS row_share_ppm,
       (label = guess) AS is_correct
FROM cells
""",
)
def lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.select(F.col("lang").alias("label"), lang_guess("text").alias("guess"))
        .groupBy("label", "guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("label")
    return cells.select(
        "label",
        "guess",
        "n",
        F.expr("n * 1000000").cast("bigint").alias("_num"),
        F.sum("n").over(w).alias("_rt"),
        (F.col("label") == F.col("guess")).alias("is_correct"),
    ).select(
        "label",
        "guess",
        "n",
        F.expr("_num div _rt").alias("row_share_ppm"),
        "is_correct",
    )


@register(
    "top_terms_per_source",
    ops="EXT-source-terms,W1,A1 (per-source TF-IDF characterization)",
    doc="What characterizes each source: per (source, term) occurrence "
    "counts weighted by a quantized rational IDF (ppm grid — exact "
    "cross-engine), top-5 terms per source by (score, term). Terms "
    "shorter than 3 chars are dropped (prepositions dominate "
    "otherwise). One explode, two map-side aggs, a window over the "
    "per-source term lists only.",
    oracle="""
WITH tok AS (
  SELECT source, doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents
),
tf AS (
  SELECT source, t, CAST(COUNT(1) AS BIGINT) AS n
  FROM tok WHERE length(t) >= 3 GROUP BY source, t
),
df AS (
  SELECT t, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok WHERE length(t) >= 3 GROUP BY t
),
nd AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.source, tf.t AS term, tf.n,
         tf.n * (((SELECT n_docs FROM nd) * 1000000) // (df.df + 1)) AS score
  FROM tf JOIN df ON df.t = tf.t
)
SELECT source, term, n, score, CAST(rk AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY score DESC, term ASC) AS rk
  FROM scored
) WHERE rk <= 5
""",
)
def top_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source",
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    ).filter(F.length("t") >= 3)
    tf = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    df = tok.groupBy("t").agg(F.countDistinct("doc_id").alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df.withColumnRenamed("t", "t2"), tf.t == F.col("t2"))
        .crossJoin(F.broadcast(nd))
        .select(
            "source",
            F.col("t").alias("term"),
            "n",
            # decimal(38,0) lift on the tf x idf product: for mid-df terms
            # the bigint product n * (n_docs*1e6 div df) can exceed int64
            # at corpus scale (~1e12 docs). Values are unchanged where
            # bigint sufficed; ranking on decimal is exact.
            F.expr(
                "cast(n as decimal(38,0)) * ((n_docs * 1000000) div (df + 1))"
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("source", "term", "n", "score", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "source_mix_drift",
    ops="EXT-mix-drift,A1,W1 (corpus composition drift audit)",
    doc="Source-mix drift: the corpus split into 10 doc_id-decile "
    "batches (the ingestion-order proxy the testdata offers), per "
    "(batch, source) share in ppm, and each cell's absolute deviation "
    "from the source's corpus-wide share — the composition-drift "
    "monitor a mixture plan (corpus_mixture_plan) is recalibrated "
    "from. Two aggregates over one scan; the share window runs over "
    "the tiny (batch, source) matrix.",
    oracle="""
WITH b AS (
  SELECT source, CAST(NTILE(10) OVER (ORDER BY doc_id ASC) AS INT) AS batch
  FROM documents
),
cells AS (
  SELECT batch, source, CAST(COUNT(1) AS BIGINT) AS n
  FROM b GROUP BY batch, source
),
shares AS (
  SELECT batch, source, n,
         CAST((n * 1000000) // SUM(n) OVER (PARTITION BY batch) AS BIGINT)
           AS share_ppm,
         CAST((SUM(n) OVER (PARTITION BY source) * 1000000)
           // SUM(n) OVER () AS BIGINT) AS corpus_share_ppm
  FROM cells
)
SELECT batch, source, n, share_ppm, corpus_share_ppm,
       abs(share_ppm - corpus_share_ppm) AS drift_ppm
FROM shares
""",
)
def source_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.operators.windows import global_ntile_two_phase

    docs = load_table(spark, sf_dir, "documents")
    # Two-phase exact NTILE(10) on doc_id — keeps the batch assignment
    # fully parallel instead of a single-partition corpus sort.
    b = global_ntile_two_phase(
        docs.select("source", "doc_id"), [F.asc("doc_id")], 10, alias="batch"
    ).select("source", "batch")
    cells = b.groupBy("batch", "source").agg(F.count(F.lit(1)).alias("n"))
    wb = Window.partitionBy("batch")
    ws = Window.partitionBy("source")
    wall = Window.partitionBy()
    shares = cells.select(
        "batch",
        "source",
        "n",
        F.expr("n * 1000000").alias("_num"),
        F.sum("n").over(wb).alias("_bt"),
        (F.sum("n").over(ws) * 1000000).alias("_snum"),
        F.sum("n").over(wall).alias("_tot"),
    ).select(
        "batch",
        "source",
        "n",
        F.expr("_num div _bt").alias("share_ppm"),
        F.expr("_snum div _tot").alias("corpus_share_ppm"),
    )
    return shares.withColumn(
        "drift_ppm", F.abs(F.col("share_ppm") - F.col("corpus_share_ppm"))
    )


@register(
    "vocab_growth_heaps",
    ops="EXT-heaps-law,A1,W1 (vocabulary-growth audit)",
    doc="Heaps'-law vocabulary growth: the corpus split into 10 "
    "doc_id-decile batches, each distinct token attributed to its FIRST "
    "batch (min over the token's postings — one groupBy, no iterative "
    "scan), then per batch: tokens processed, newly-seen vocabulary, "
    "cumulative vocabulary, new-per-token rate in ppm. Sub-linear "
    "cumulative growth is the expected natural-corpus shape; a linear "
    "curve flags synthetic or shuffled text. The cumulative window "
    "runs over 10 rows.",
    oracle="""
WITH b AS (
  SELECT doc_id, CAST(NTILE(10) OVER (ORDER BY doc_id ASC) AS INT) AS batch,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents
),
batch_tokens AS (
  SELECT batch, CAST(COUNT(1) AS BIGINT) AS n_tokens FROM b GROUP BY batch
),
first_seen AS (
  SELECT t, MIN(batch) AS first_batch FROM b GROUP BY t
),
new_vocab AS (
  SELECT first_batch AS batch, CAST(COUNT(1) AS BIGINT) AS new_tokens
  FROM first_seen GROUP BY first_batch
)
SELECT bt.batch, bt.n_tokens,
       COALESCE(nv.new_tokens, 0) AS new_tokens,
       CAST(SUM(COALESCE(nv.new_tokens, 0)) OVER (ORDER BY bt.batch
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_vocab,
       (COALESCE(nv.new_tokens, 0) * 1000000) // bt.n_tokens
         AS new_per_token_ppm
FROM batch_tokens bt LEFT JOIN new_vocab nv ON nv.batch = bt.batch
""",
)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.operators.windows import global_ntile_two_phase
    from formula_1_spark.sources.tables import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # Two-phase exact NTILE(10) on doc_id; the cumulative window below
    # stays — it runs over 10 batch rows, not the corpus.
    tiled = global_ntile_two_phase(
        docs.select("doc_id", "text"), [F.asc("doc_id")], 10, alias="batch"
    )
    b = fan_out(tiled).select(
        "batch", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t")
    )
    batch_tokens = b.groupBy("batch").agg(F.count(F.lit(1)).alias("n_tokens"))
    first_seen = b.groupBy("t").agg(F.min("batch").alias("first_batch"))
    new_vocab = first_seen.groupBy(
        F.col("first_batch").alias("batch")
    ).agg(F.count(F.lit(1)).alias("new_tokens"))
    w = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        batch_tokens.join(new_vocab, "batch", "left")
        .select(
            "batch",
            "n_tokens",
            F.coalesce("new_tokens", F.lit(0)).alias("new_tokens"),
        )
        .select(
            "batch",
            "n_tokens",
            "new_tokens",
            F.sum("new_tokens").over(w).alias("cumulative_vocab"),
            F.expr("(new_tokens * 1000000) div n_tokens").alias(
                "new_per_token_ppm"
            ),
        )
    )


_PMI_MIN_PAIR = 20


@register(
    "pmi_collocations_topk",
    ops="EXT-pmi,A1,J1,O3 (pointwise mutual information collocations)",
    doc="Top-50 bigram collocations by PMI: adjacent token pairs vs "
    "unigram frequencies, scored as the exact integer ratio "
    "c12*N*1e6 div (c1*c2) — monotone in PMI, no float logs, so ranks "
    "agree across engines bit-for-bit; decimal(38,0) arithmetic keeps "
    "the c12*N*1e6 product exact at corpus scale (int64 would overflow "
    "past N~9e6 at the min pair count). Unigram counts broadcast-join "
    "onto the pair relation (vocab << corpus); min pair support 20 "
    "prunes the long tail before the joins; top-k via orderBy+limit is "
    "a distributed TakeOrdered, never a global window.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
),
uni AS (
  SELECT t AS w, CAST(COUNT(1) AS BIGINT) AS c
  FROM (SELECT unnest(tok) AS t FROM toks) GROUP BY t
),
n_total AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
pairs AS (
  SELECT tok[i] AS w1, tok[i + 1] AS w2, CAST(COUNT(1) AS BIGINT) AS c12
  FROM (SELECT tok, unnest(range(1, len(tok))) AS i FROM toks
        WHERE len(tok) >= 2)
  GROUP BY w1, w2
  HAVING COUNT(1) >= {_PMI_MIN_PAIR}
)
SELECT p.w1, p.w2, p.c12,
       u1.c AS c1, u2.c AS c2,
       CAST(p.c12 * n.n * 1000000 // (u1.c * u2.c) AS BIGINT) AS pmi_ppm
FROM pairs p
JOIN uni u1 ON p.w1 = u1.w
JOIN uni u2 ON p.w2 = u2.w
CROSS JOIN n_total n
ORDER BY pmi_ppm DESC, w1, w2
LIMIT 50
""",
)
def pmi_collocations_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.split(F.col("text"), " ").alias("tok"))
    uni = (
        toks.select(F.explode("tok").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = uni.agg(F.sum("c").cast("bigint").alias("n"))
    pairs = (
        toks.filter(F.size("tok") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tok") - 1),
                    lambda i: F.struct(
                        F.element_at("tok", i).alias("w1"),
                        F.element_at("tok", i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= _PMI_MIN_PAIR)
    )
    u1 = uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1")
    u2 = uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2")
    return (
        pairs.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(n_total))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.expr(
                "CAST(CAST(c12 AS DECIMAL(38,0)) * n * 1000000"
                " div (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)"
            ).alias("pmi_ppm"),
        )
        .orderBy(F.desc("pmi_ppm"), "w1", "w2")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Unrolled BPE merge rounds (round 7)
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled BPE trainer CTEs mirroring the Spark loop: per round,
    frequency-weighted adjacent-pair counts, the top pair (ties to
    lexicographic), then a greedy left-to-right fold applying the merge
    in every word."""
    parts = [
        """toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS t FROM documents
),
words AS (SELECT t AS word, CAST(COUNT(1) AS BIGINT) AS freq FROM toks GROUP BY t),
w0 AS (
  SELECT word, freq,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, i, 1)) AS syms
  FROM words
)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(f"""pc{t} AS (
  SELECT s.syms[j + 1] AS a, s.syms[j + 2] AS b,
         CAST(SUM(s.freq) AS BIGINT) AS n
  FROM w{t - 1} s, unnest(range(0, len(s.syms) - 1)) u(j)
  GROUP BY 1, 2
)""")
        parts.append(
            f"top{t} AS (SELECT a, b, n FROM pc{t}"
            f" ORDER BY n DESC, a ASC, b ASC LIMIT 1)"
        )
        parts.append(f"""w{t} AS (
  SELECT w.word, w.freq,
         CASE WHEN len(w.syms) <= 1 THEN w.syms ELSE
           list_reduce(list_transform(w.syms, s -> [s]),
             (acc, x) -> CASE
               WHEN acc[len(acc)] = p.a AND x[1] = p.b
               THEN list_concat(list_slice(acc, 1, len(acc) - 1),
                                [acc[len(acc)] || x[1]])
               ELSE list_concat(acc, x) END)
         END AS syms
  FROM w{t - 1} w, top{t} p
)""")
        parts.append(
            f"v{t} AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS vocab"
            f" FROM (SELECT unnest(syms) AS s FROM w{t}))"
        )
    selects = [
        f"SELECT {t} AS merge_round, p.a AS pair_a, p.b AS pair_b,"
        f" p.a || p.b AS merged, p.n AS pair_count, v{t}.vocab AS vocab_after"
        f" FROM top{t} p, v{t}"
        for t in range(1, rounds + 1)
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY merge_round"
    )


@register(
    "bpe_merge_rounds",
    ops="EXT-bpe-induction,A1,O3 (iterative tokenizer training, unrolled)",
    doc="Three full BPE trainer iterations, distributed and declarative "
    "(no driver loop): per round, frequency-weighted adjacent-symbol "
    "pair counts over the word table, the argmax pair (count desc, "
    "lexicographic ties), and a greedy left-to-right merge fold "
    "applied inside every word via an array aggregate — the exact "
    "non-overlapping-occurrence semantics of a byte-pair trainer. "
    "Extends bpe_pair_merge_stats (which ranks round-1 candidates "
    "only) to the actual training loop. Each round is one "
    "map-side-combined pair aggregate + a 1-row top-pair broadcast + "
    "a per-row fold; the word table (vocab-sized, not corpus-sized) "
    "is the only relation that iterates.",
    oracle=_bpe_oracle(),
)
def bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.text import tokens
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    words = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(F.col("t").alias("word"), "freq")
    )
    w = words.select(
        "word",
        "freq",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.substring(F.col("word"), i, F.lit(1)),
        ).alias("syms"),
    )
    out_rows = []
    for t in range(1, _BPE_ROUNDS + 1):
        pairs = (
            w.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda j: F.struct(
                            F.element_at("syms", (j + 1).cast("int")).alias("a"),
                            F.element_at("syms", (j + 2).cast("int")).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .select("freq", "p.a", "p.b")
        )
        top = (
            pairs.groupBy("a", "b")
            .agg(F.sum("freq").cast("bigint").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .select(
                F.col("a").alias("pa"), F.col("b").alias("pb"), "n"
            )
        )
        merged_syms = F.when(F.size("syms") <= 1, F.col("syms")).otherwise(
            F.aggregate(
                F.transform(F.col("syms"), lambda s: F.array(s)),
                F.array().cast("array<string>"),
                lambda acc, x: F.when(F.size(acc) == 0, x)
                .when(
                    (F.element_at(acc, -1) == F.col("pa"))
                    & (F.element_at(x, 1) == F.col("pb")),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(
                            F.concat(F.element_at(acc, -1), F.element_at(x, 1))
                        ),
                    ),
                )
                .otherwise(F.concat(acc, x)),
            )
        )
        w = w.join(F.broadcast(top)).select(
            "word", "freq", merged_syms.alias("syms")
        )
        vocab = w.select(F.explode("syms").alias("s")).agg(
            F.count_distinct("s").cast("bigint").alias("vocab_after")
        )
        out_rows.append(
            top.join(F.broadcast(vocab)).select(
                F.lit(t).alias("merge_round"),
                F.col("pa").alias("pair_a"),
                F.col("pb").alias("pair_b"),
                F.concat("pa", "pb").alias("merged"),
                F.col("n").alias("pair_count"),
                "vocab_after",
            )
        )
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("merge_round")


# ---------------------------------------------------------------------------
# Character-trigram Gini diversity (round 10)
# ---------------------------------------------------------------------------


@register(
    "char_trigram_gini_diversity",
    ops="EXT-text-diversity,F1,A5 (log-free repetition/gibberish signal)",
    doc="Character-trigram Gini diversity per document: 1 - sum(p_i^2) "
    "over the doc's trigram distribution, computed as the exact integer "
    "ratio (n^2 - sum(c^2)) / n^2 in ppm — a Simpson-style diversity "
    "index that flags repetitive/templated text (low Gini) and keyboard "
    "gibberish (suspiciously high Gini vs natural language) WITHOUT the "
    "cross-engine-unstable log() an entropy formulation would need. "
    "Also emits the top-trigram share. One explode + two hash "
    "aggregates, all map-side combinable; docs under 3 chars have no "
    "trigrams and drop out of both engines identically.",
    oracle="""
WITH tris AS (
  SELECT doc_id,
         list_transform(range(0, greatest(length(text) - 2, 0)),
                        i -> substr(text, CAST(i + 1 AS INT), 3)) AS g
  FROM documents
),
cnt AS (
  SELECT doc_id, gram, CAST(COUNT(1) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(g) AS gram FROM tris) u
  GROUP BY doc_id, gram
),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * c) AS BIGINT) AS ssq,
         CAST(COUNT(1) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS mx
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n AS n_tris, n_distinct AS n_distinct_tris,
       CAST((CAST(n AS HUGEINT) * n - ssq) * 1000000
            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS gini_ppm,
       CAST(mx * 1000000 // n AS BIGINT) AS top_share_ppm
FROM agg
""",
)
def char_trigram_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    g = F.when(
        F.length("text") >= 3,
        F.transform(
            F.sequence(F.lit(0), F.length("text") - 3),
            lambda i: F.substring(F.col("text"), i + 1, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    cnt = (
        docs.select("doc_id", F.explode(g).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("ssq"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("mx"),
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("n_tris"),
        F.col("n_distinct").alias("n_distinct_tris"),
        # DECIMAL(38,0) numerator/denominator: (n^2 - ssq) * 1e6 overflows
        # BIGINT past ~3M trigrams per doc; decimal `div` (IntegralDivide)
        # is exact floor like DuckDB's HUGEINT `//`, so per-doc size is
        # unbounded to ~1e15 trigrams (38-digit headroom) on both engines.
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * n - ssq) * 1000000"
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("gini_ppm"),
        F.expr("CAST(mx * 1000000 div n AS BIGINT)").alias("top_share_ppm"),
    )


# ---------------------------------------------------------------------------
# Intra-document repetition excision (Gopher-style, round 11)
# ---------------------------------------------------------------------------

# Gopher (Rae et al. 2021, Table A1) repetition-filter thresholds, in ppm:
# duplicate-unit character fraction > 0.20, top word-2-gram character
# fraction > 0.18, duplicate word-5-gram character fraction > 0.15. First
# matching rule wins (most specific signal last).
_REP_DUP_UNIT_PPM = 200_000
_REP_TOP2_PPM = 180_000
_REP_DUP5_PPM = 150_000


def repetition_excision_signals(
    docs: DataFrame, unit_sep: str = r"\s+"
) -> DataFrame:
    """Per-document intra-doc repetition profile + excision verdict
    (Gopher/Rae-style within-doc dedup, complementing the cross-doc
    families in queries/dedup.py). Differs from
    ``queries/decontam.repetition_profile`` (token-fraction flags over
    word n-grams only): this operator adds the dedup-UNIT grain (lines /
    paragraphs via ``unit_sep`` — the "duplicate line fraction" Gopher
    signal the flat token stream cannot express), reports CHARACTER-mass
    ppm (what excision actually removes), names the offending top
    bigram, and emits a first-matching-rule excision ACTION.

    Signals, each as an exact-integer ppm of the doc's character count
    (no floats, so thresholds are bit-stable across engines):

    * ``dupunit_ppm`` — characters inside repeated dedup UNITS (units =
      ``unit_sep`` splits: lines/paragraphs on real corpora, words on the
      single-line testdata) — the "duplicate line fraction" signal;
    * ``top2_gram``/``top2_ppm`` — the most frequent word 2-gram (count
      DESC, gram ASC tie-break) and its character mass — the templated-
      text signal;
    * ``dup5_ppm`` — characters inside word 5-grams occurring >= 2 times
      (overlapping occurrences each count, per Gopher, so the raw value
      can exceed 1e6; thresholds compare the raw value).

    ONE scan + one (doc_id, grain, gram)-keyed shuffle for all three
    grains: units, 2-grams and 5-grams ride a single tagged explode, and
    the top-2-gram argmax folds into the same per-doc aggregate via the
    min-of-(-count, gram) struct trick — no window, no second scan, no
    per-grain join. Numerators are bounded by 5x doc chars, so BIGINT
    ppm math holds to ~1.8e12 chars per document.
    """
    # Generate barrier (guide §4.1, the media_phash pattern): the split
    # arrays are projected ONCE per row UNDER the explode; the gram
    # lambdas above index the materialized array columns. Building grams
    # from the raw split expressions lets CollapseProject inline
    # split(trim(text)) into every `F.get(arr, i + j)` lambda element —
    # each 5-gram element re-splits the whole document 5 times, O(len²)
    # per doc (measured ~10.5 s for this query at sf0.1, 6x the fixed
    # shape).
    arrs = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.split(F.trim(F.col("text")), unit_sep).alias("u_arr"),
        *(
            ()
            if unit_sep == r"\s+"
            else (F.split(F.trim(F.col("text")), r"\s+").alias("w_arr"),)
        ),
    )
    w = F.col("u_arr")
    words = F.col("u_arr") if unit_sep == r"\s+" else F.col("w_arr")
    empty = F.array().cast("array<struct<grain:string,gram:string>>")

    def grams(arr, n: int, tag: str):
        mk = lambda i: F.concat_ws(
            " ", *[F.get(arr, i + j) for j in range(n)]
        )
        return F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - n),
                lambda i: F.struct(
                    F.lit(tag).alias("grain"), mk(i).alias("gram")
                ),
            ),
        ).otherwise(empty)

    tagged = F.concat(
        F.transform(
            w,
            lambda u: F.struct(F.lit("u").alias("grain"), u.alias("gram")),
        ),
        grams(words, 2, "2"),
        grams(words, 5, "5"),
    )
    cnt = (
        arrs.select("doc_id", "n_chars", F.explode(tagged).alias("x"))
        .groupBy("doc_id", "n_chars", "x.grain", "x.gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    is_u, is_2, is_5 = (F.col("grain") == g for g in ("u", "2", "5"))
    gram_chars = F.col("c") * F.length("gram").cast("bigint")
    per = cnt.groupBy("doc_id", "n_chars").agg(
        F.sum(F.when(is_u, F.col("c")).otherwise(F.lit(0))).alias("n_units"),
        F.sum(
            F.when(is_u & (F.col("c") >= 2), gram_chars).otherwise(F.lit(0))
        ).alias("dup_chars"),
        F.min(
            F.when(is_2, F.struct((-F.col("c")).alias("nc"), F.col("gram")))
        ).alias("t2"),
        F.sum(
            F.when(is_5 & (F.col("c") >= 2), gram_chars).otherwise(F.lit(0))
        ).alias("dup5_chars"),
    )
    return per.select(
        "doc_id",
        "n_units",
        F.expr("CAST(dup_chars * 1000000 div n_chars AS BIGINT)").alias(
            "dupunit_ppm"
        ),
        F.coalesce(F.col("t2.gram"), F.lit("")).alias("top2_gram"),
        F.expr(
            "CAST(coalesce(-t2.nc * CAST(length(t2.gram) AS BIGINT), 0)"
            " * 1000000 div n_chars AS BIGINT)"
        ).alias("top2_ppm"),
        F.expr("CAST(dup5_chars * 1000000 div n_chars AS BIGINT)").alias(
            "dup5_ppm"
        ),
    ).withColumn(
        "action",
        F.when(F.col("dupunit_ppm") > _REP_DUP_UNIT_PPM, "drop_dup_unit")
        .when(F.col("top2_ppm") > _REP_TOP2_PPM, "drop_top_bigram")
        .when(F.col("dup5_ppm") > _REP_DUP5_PPM, "drop_dup_5gram")
        .otherwise("keep"),
    )


@register(
    "doc_repetition_excision",
    ops="EXT-text-repetition,F1,A3,A5 (Gopher within-doc dedup signals)",
    doc="Intra-document repetition removal plan (Gopher/Rae-style "
    "within-doc dedup): per doc, exact-integer ppm of characters inside "
    "repeated dedup units (lines on real corpora; words on this "
    "single-line testdata), inside the single most frequent word 2-gram "
    "(count DESC, gram ASC tie-break), and inside duplicated word "
    "5-grams (overlapping occurrences each count, per the paper), plus "
    "a first-matching-rule excision verdict at the Gopher thresholds "
    "(0.20 / 0.18 / 0.15). One scan + one gram-keyed shuffle for all "
    "three grains (tagged explode; the top-bigram argmax folds into the "
    "per-doc aggregate via a min-of-(-count, gram) struct, no window). "
    "Complements cross-doc dedup and char_trigram_gini_diversity.",
    oracle=f"""
WITH base AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents
),
ucnt AS (
  SELECT doc_id, u, CAST(COUNT(1) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(w) AS u FROM base)
  GROUP BY doc_id, u
),
udup AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_units,
         CAST(SUM(CASE WHEN c >= 2 THEN c * length(u) ELSE 0 END)
              AS BIGINT) AS dup_chars
  FROM ucnt GROUP BY doc_id
),
g2cnt AS (
  SELECT doc_id, g, CAST(COUNT(1) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(list_transform(range(0, greatest(len(w) - 1, 0)),
                      i -> w[CAST(i + 1 AS INT)] || ' ' || w[CAST(i + 2 AS INT)])) AS g
        FROM base)
  GROUP BY doc_id, g
),
top2 AS (
  SELECT doc_id, g AS top2_gram,
         c * CAST(length(g) AS BIGINT) AS top2_chars
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY c DESC, g ASC) AS r
        FROM g2cnt) WHERE r = 1
),
g5cnt AS (
  SELECT doc_id, g, CAST(COUNT(1) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(list_transform(range(0, greatest(len(w) - 4, 0)),
                      i -> w[CAST(i + 1 AS INT)] || ' ' || w[CAST(i + 2 AS INT)] || ' ' ||
                           w[CAST(i + 3 AS INT)] || ' ' || w[CAST(i + 4 AS INT)] || ' ' ||
                           w[CAST(i + 5 AS INT)])) AS g
        FROM base)
  GROUP BY doc_id, g
),
g5dup AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END)
              AS BIGINT) AS dup5_chars
  FROM g5cnt GROUP BY doc_id
),
j AS (
  SELECT b.doc_id, u.n_units,
         CAST(u.dup_chars * 1000000 // b.n_chars AS BIGINT) AS dupunit_ppm,
         COALESCE(t.top2_gram, '') AS top2_gram,
         CAST(COALESCE(t.top2_chars, 0) * 1000000 // b.n_chars AS BIGINT)
           AS top2_ppm,
         CAST(COALESCE(f.dup5_chars, 0) * 1000000 // b.n_chars AS BIGINT)
           AS dup5_ppm
  FROM base b
  JOIN udup u USING (doc_id)
  LEFT JOIN top2 t ON t.doc_id = b.doc_id
  LEFT JOIN g5dup f ON f.doc_id = b.doc_id
)
SELECT doc_id, n_units, dupunit_ppm, top2_gram, top2_ppm, dup5_ppm,
       CASE WHEN dupunit_ppm > {_REP_DUP_UNIT_PPM} THEN 'drop_dup_unit'
            WHEN top2_ppm > {_REP_TOP2_PPM} THEN 'drop_top_bigram'
            WHEN dup5_ppm > {_REP_DUP5_PPM} THEN 'drop_dup_5gram'
            ELSE 'keep' END AS action
FROM j
""",
)
def doc_repetition_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return repetition_excision_signals(docs)
