"""Corpus-fingerprinting + tokenizer-economics operators (round 5,
slate 4): the remaining audit surface a 100 TB training-data pipeline
runs between dedup and mixing.

* ``winnow_fingerprint_dedup`` — MOSS-style winnowing (Schleimer,
  Wilkerson & Aiken, SIGMOD 2003): hash every word k-gram, keep the
  minimum hash of each sliding window of w consecutive k-gram hashes.
  The surviving fingerprints are position-robust (any shared substring
  of >= w+k-1 words guarantees a shared fingerprint), so cross-doc
  fingerprint collisions are a high-recall near-dup candidate signal at
  a fraction of full-shingle posting volume. Pure array Column math per
  row; only the (doc_id, fingerprint) pairs ever shuffle.
* ``tokenizer_fertility_audit`` — tokenizer economics per (lang,
  source): BPE-ish segments per whitespace word (fertility) and UTF-8
  bytes per segment, the two numbers that decide real token budgets on
  multilingual corpora. Integer ppm via decimal(38,0)-lifted scaling.
* ``zipf_rank_doubling`` — integer-exact Zipf health check: for term
  ranks r in {1, 2, 4, ..., 128}, the frequency ratio f(r)/f(2r) in
  ppm (a Zipfian corpus gives ~2e6 at every doubling). Avoids
  cross-engine ``ln`` entirely — ranks come from an exact two-phase
  top-k and ratios are integer division.
* ``oov_rate_audit`` — fix a top-V vocabulary by corpus frequency
  (exact two-phase top-k), then per source: token total, OOV token
  count/ppm, distinct OOV terms. The vocab is broadcast; the token
  stream never shuffles until the 20-row source aggregate.
* ``event_attribution_first_last`` — first-touch / last-touch
  marketing-style attribution for ``purchase`` events over each user's
  (ts, event_id)-ordered history: first touch = the user's first event
  ever, last touch = most recent non-purchase event before the
  purchase (``last(..., ignorenulls=True)`` over a trailing frame).
  Revenue in integer cents so sums are order-independent.

Reference scope: extends the reference's analytics surface
(`Data Visualization.sql`) with pipeline-audit operators the brief
requires; no counterpart notebook exists, so parity is oracle-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.queries.text_analysis import BPE_PATTERN
from formula_1_spark.sources.tables import fan_out, load_table

_PPM = 1_000_000

_WIN_K = 3  # words per k-gram
_WIN_W = 4  # k-gram hashes per winnowing window

# Gram-hash combine: each TOKEN is md5'd once (28-bit prefix); a k-gram's
# 32-bit hash is the exact-int64 polynomial (h0*K1 + h1) % 2^32 * K2 + h2
# % 2^32 over consecutive token hashes. Versus md5 per gram (each token
# string hashed k times inside k joined gram strings) this cuts the md5
# work ~3x and drops the per-gram slice+join string building — measured
# 2.42s -> 1.92s for the fingerprint stage at sf0.1, bit-identical in
# both engines (28-bit inputs keep every intermediate < 2^52 < 2^63).
_HASH_M = 1 << 32
_HASH_K1 = 1_000_003
_HASH_K2 = 999_983


def _gram_hash_sql(k: int) -> str:
    """DuckDB: list of 32-bit k-gram polynomial hashes over per-token
    28-bit md5 prefixes (k=3 hard-wired in the combine)."""
    assert k == 3
    return f"""list_transform(
        range(0, greatest(len(th) - {k}, -1) + 1),
        i -> ((th[i+1] * {_HASH_K1} + th[i+2]) % {_HASH_M} * {_HASH_K2}
              + th[i+3]) % {_HASH_M})"""


@register(
    "winnow_fingerprint_dedup",
    ops="EXT-winnowing,DEDUP (windowed-min k-gram fingerprints)",
    doc="Winnowing fingerprints (k=3-word grams, window w=4): per-row "
    "array math builds gram hashes (per-token md5 prefix, exact-int64 "
    "polynomial combine — one md5 per TOKEN, not per gram) and takes "
    "each sliding window's minimum; distinct (doc, fp) pairs are the "
    "only shuffled relation. Fingerprints held by >=2 docs mark dup "
    "candidates. Per source: docs, fingerprinted docs, fingerprint "
    "volume, and dup-candidate docs.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         list_transform(string_split(text, ' '),
                        t -> ('0x' || substr(md5(t), 1, 7))::BIGINT) AS th
  FROM documents
),
hashed AS (
  SELECT doc_id, source, {_gram_hash_sql(_WIN_K)} AS h FROM toks
),
fps AS (
  SELECT DISTINCT doc_id, source, fp
  FROM (
    SELECT doc_id, source,
           unnest(list_transform(
             range(0, greatest(len(h) - {_WIN_W}, 0) + 1),
             i -> list_aggregate(list_slice(h, i + 1, i + {_WIN_W}),
                                 'min'))) AS fp
    FROM hashed WHERE len(h) >= 1
  )
),
fp_df AS (
  SELECT fp, COUNT(1) AS n_docs FROM fps GROUP BY fp
),
per_doc AS (
  SELECT f.doc_id, f.source,
         COUNT(1) AS n_fps,
         MAX(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS is_cand
  FROM fps f JOIN fp_df d USING (fp)
  GROUP BY f.doc_id, f.source
),
by_src AS (
  SELECT source,
         CAST(COUNT(1) AS BIGINT) AS docs_fingerprinted,
         CAST(SUM(n_fps) AS BIGINT) AS total_fps,
         CAST(SUM(is_cand) AS BIGINT) AS dup_candidate_docs
  FROM per_doc GROUP BY source
),
totals AS (
  SELECT source, CAST(COUNT(1) AS BIGINT) AS docs_total
  FROM documents GROUP BY source
),
shared AS (
  SELECT CAST(COUNT(1) AS BIGINT) AS shared_fps
  FROM fp_df WHERE n_docs >= 2
)
SELECT t.source, t.docs_total, b.docs_fingerprinted, b.total_fps,
       b.dup_candidate_docs, s.shared_fps
FROM totals t JOIN by_src b USING (source) CROSS JOIN shared s
ORDER BY t.source
""",
)
def winnow_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    th = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("bigint"),
    )
    base = docs.select("doc_id", "source", th.alias("th"))
    # Gram combine via three SHIFTED SLICES zipped pairwise — NOT
    # element_at(th, i) inside a sequence-transform lambda: CollapseProject
    # re-inlines the md5 token array into every element access, turning
    # the gram build O(n^2) per doc (measured 33s vs 1.9s at sf0.1).
    # Guard: docs shorter than k tokens emit an empty gram list, matching
    # the oracle's empty range().
    n_g = F.size("th") - (_WIN_K - 1)
    grams = F.when(
        F.size("th") >= _WIN_K,
        F.zip_with(
            F.zip_with(
                F.slice(F.col("th"), 1, n_g),
                F.slice(F.col("th"), 2, n_g),
                lambda x, y: (x * _HASH_K1 + y) % _HASH_M,
            ),
            F.slice(F.col("th"), 3, n_g),
            lambda s, z: (s * _HASH_K2 + z) % _HASH_M,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    hashed = base.select("doc_id", "source", grams.alias("h")).filter(
        F.size("h") >= 1
    )
    fp_arr = F.transform(
        F.sequence(
            F.lit(0), F.greatest(F.size("h") - _WIN_W, F.lit(0))
        ),
        lambda i: F.array_min(F.slice(F.col("h"), i + 1, _WIN_W)),
    )
    fps = hashed.select(
        "doc_id", "source", F.explode(fp_arr).alias("fp")
    ).distinct()
    fp_df = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        fps.join(fp_df, "fp")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.max(
                F.when(F.col("n_docs") >= 2, 1).otherwise(0)
            ).alias("is_cand"),
        )
    )
    by_src = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_fingerprinted"),
        F.sum("n_fps").alias("total_fps"),
        F.sum("is_cand").alias("dup_candidate_docs"),
    )
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_total")
    )
    shared = fp_df.filter(F.col("n_docs") >= 2).agg(
        F.count(F.lit(1)).alias("shared_fps")
    )
    return (
        totals.join(by_src, "source")
        .join(F.broadcast(shared))
        .select(
            "source",
            "docs_total",
            "docs_fingerprinted",
            "total_fps",
            "dup_candidate_docs",
            "shared_fps",
        )
        .orderBy("source")
    )


@register(
    "tokenizer_fertility_audit",
    ops="EXT-fertility,A1 (tokenizer economics per lang/source)",
    doc="Tokenizer fertility audit per (lang, source): BPE-ish segments "
    "per whitespace word (fertility_ppm) and UTF-8 bytes per segment "
    "(bytes_per_seg_ppm) — the numbers that decide real token budgets "
    "on multilingual data. One scan, pure regexp_count/octet_length "
    "Column math, decimal(38,0)-lifted ppm scaling (corpus-level sums "
    "times 1e6 overflow int64 at ~100 TB).",
    oracle=f"""
SELECT lang, source,
       CAST(COUNT(1) AS BIGINT) AS docs,
       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
         AS words,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}'))) AS BIGINT)
         AS bpe_segments,
       CAST(SUM(octet_length(text::BLOB)) AS BIGINT) AS utf8_bytes,
       CAST(SUM(len(regexp_extract_all(text, '{BPE_PATTERN}')))
            * {_PPM}
            // SUM(len(string_split_regex(trim(text), '\\s+')))
            AS BIGINT) AS fertility_ppm,
       CAST(SUM(octet_length(text::BLOB)) * {_PPM}
            // SUM(len(regexp_extract_all(text, '{BPE_PATTERN}')))
            AS BIGINT) AS bytes_per_seg_ppm
FROM documents
GROUP BY lang, source
ORDER BY lang, source
""",
)
def tokenizer_fertility_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    per_doc = docs.select(
        "lang",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).alias("s"),
        F.octet_length("text").alias("b"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("w").alias("words"),
            F.sum("s").alias("bpe_segments"),
            F.sum("b").alias("utf8_bytes"),
        )
        .select(
            "lang",
            "source",
            "docs",
            "words",
            "bpe_segments",
            "utf8_bytes",
            F.expr(
                f"(cast(bpe_segments as decimal(38,0)) * {_PPM})"
                " div words"
            ).alias("fertility_ppm"),
            F.expr(
                f"(cast(utf8_bytes as decimal(38,0)) * {_PPM})"
                " div bpe_segments"
            ).alias("bytes_per_seg_ppm"),
        )
        .orderBy("lang", "source")
    )


_ZIPF_TOP = 256  # ranks held; doubling pairs reach r=128 vs r=256


@register(
    "zipf_rank_doubling",
    ops="EXT-zipf,A1,W2 (integer-exact rank-doubling frequency ratios)",
    doc="Zipf health check without ln(): exact global term ranks from "
    "two-phase top-256 (total order: freq desc, term asc), then for "
    "r in {1,2,4,...,128} the ratio f(r)/f(2r) in ppm — a Zipfian "
    "corpus shows ~2e6 at every doubling. Term counting shuffles on "
    "the term key; the 256-row rank relation self-joins broadcast.",
    oracle=f"""
WITH tf AS (
  SELECT t AS term, CAST(COUNT(1) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY t
),
ranked AS (
  SELECT term, freq,
         CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS BIGINT)
           AS rk
  FROM tf ORDER BY freq DESC, term LIMIT {_ZIPF_TOP}
)
SELECT a.rk AS rank, a.term, a.freq,
       b.freq AS freq_at_double,
       CAST(a.freq * {_PPM} // b.freq AS BIGINT) AS doubling_ratio_ppm
FROM ranked a JOIN ranked b ON b.rk = a.rk * 2
WHERE a.rk IN (1, 2, 4, 8, 16, 32, 64, 128)
ORDER BY a.rk
""",
)
def zipf_rank_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import two_phase_global_topk

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tf = (
        docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = two_phase_global_topk(
        tf,
        [F.desc("freq"), F.asc("term")],
        _ZIPF_TOP,
        alias="rk",
        unique_order=True,
    ).select(F.col("rk").cast("bigint").alias("rk"), "term", "freq")
    a = ranked.filter(
        F.col("rk").isin(1, 2, 4, 8, 16, 32, 64, 128)
    )
    b = ranked.select(
        F.col("rk").alias("b_rk"), F.col("freq").alias("freq_at_double")
    )
    return (
        a.join(F.broadcast(b), a["rk"] * 2 == b["b_rk"])
        .select(
            F.col("rk").alias("rank"),
            "term",
            "freq",
            "freq_at_double",
            F.expr(f"freq * {_PPM} div freq_at_double").alias(
                "doubling_ratio_ppm"
            ),
        )
        .orderBy("rank")
    )


_VOCAB_V = 1000


@register(
    "oov_rate_audit",
    ops="EXT-oov,A1,J1 (top-V vocabulary coverage per source)",
    doc="OOV audit: fix the top-1000-term vocabulary by exact corpus "
    "frequency (two-phase top-k, total order), broadcast it, then per "
    "source count tokens, OOV tokens/ppm, and distinct OOV terms. The "
    "token stream joins the broadcast vocab without shuffling; only "
    "term counting and the 20-row source aggregate shuffle.",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
),
tf AS (
  SELECT t AS term, COUNT(1) AS freq FROM tok GROUP BY t
),
vocab AS (
  SELECT term FROM tf ORDER BY freq DESC, term LIMIT {_VOCAB_V}
)
SELECT source,
       CAST(COUNT(1) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
            * {_PPM} // COUNT(1) AS BIGINT) AS oov_ppm,
       CAST(COUNT(DISTINCT CASE WHEN v.term IS NULL THEN tok.t END)
            AS BIGINT) AS distinct_oov_terms
FROM tok LEFT JOIN vocab v ON tok.t = v.term
GROUP BY source
ORDER BY source
""",
)
def oov_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import two_phase_global_topk

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    tf = tok.groupBy(F.col("t").alias("term")).agg(
        F.count(F.lit(1)).alias("freq")
    )
    vocab = two_phase_global_topk(
        tf,
        [F.desc("freq"), F.asc("term")],
        _VOCAB_V,
        alias="rk",
        unique_order=True,
    ).select("term", F.lit(1).alias("in_vocab"))
    return (
        tok.join(
            F.broadcast(vocab), tok["t"] == vocab["term"], "left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("tokens_total"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("oov_tokens"),
            # decimal(38,0) lift: per-source token totals * 1e6 pass
            # int64 range at ~100 TB corpus scale
            F.expr(
                "(cast(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)"
                f" as decimal(38,0)) * {_PPM}) div count(1)"
            ).alias("oov_ppm"),
            F.countDistinct(
                F.when(F.col("in_vocab").isNull(), F.col("t"))
            ).alias("distinct_oov_terms"),
        )
        .orderBy("source")
    )


@register(
    "event_attribution_first_last",
    ops="EXT-attribution,W1 (first/last-touch purchase attribution)",
    doc="First-touch / last-touch attribution: over each user's "
    "(ts, event_id)-ordered history, every purchase credits the user's "
    "first event ever (first touch) and the most recent non-purchase "
    "event before it (last touch, last(...ignorenulls) over a trailing "
    "frame). Revenue summed in integer cents (order-independent). "
    "Windows partition by user_id — millions of independent partitions "
    "at scale, no global sort.",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         FIRST_VALUE(event_type) OVER w_all AS first_touch,
         LAST_VALUE(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
           OVER w_prev AS last_touch
  FROM events
  WINDOW
    w_all AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_prev AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT first_touch, COALESCE(last_touch, 'none') AS last_touch,
       CAST(COUNT(1) AS BIGINT) AS purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM seq
WHERE event_type = 'purchase'
GROUP BY first_touch, COALESCE(last_touch, 'none')
ORDER BY first_touch, last_touch
""",
)
def event_attribution_first_last(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w_all = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = events.select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.first("event_type").over(w_all).alias("first_touch"),
        F.last(
            F.when(
                F.col("event_type") != "purchase", F.col("event_type")
            ),
            ignorenulls=True,
        )
        .over(w_prev)
        .alias("last_touch"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(
            "first_touch",
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.sum("cents").alias("revenue_cents"),
        )
        .orderBy("first_touch", "last_touch")
    )


# ---------------------------------------------------------------------------
# Corpus novelty / saturation curve (round 7)
# ---------------------------------------------------------------------------

_NOV_K = 8  # gram width (same as the span family)
_NOV_TILES = 10


@register(
    "corpus_novelty_curve",
    ops="EXT-corpus-growth,A1,W2 (marginal-data saturation curve)",
    doc="How much NEW content does each marginal slice of the corpus "
    "add? Docs are bucketed into 10 ingestion deciles (exact two-phase "
    "NTILE over doc_id — the ingestion-order proxy), every distinct "
    "8-gram is attributed to its FIRST document (min doc_id), and each "
    "decile reports its distinct grams vs first-occurrence grams as "
    "novelty ppm. The declining curve is THE saturation signal a "
    "data-acquisition decision reads (keep crawling this source?). "
    "Gram attribution is one min-aggregate on the 60-bit hash; nothing "
    "pairwise.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
pos AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(array_to_string(
            list_slice(t, i + 1, i + {_NOV_K}), ' ')), 1, 15))::BIGINT AS g
  FROM toks, unnest(range(0, greatest(len(t) - {_NOV_K - 1}, 0))) u(i)
),
first AS (SELECT g, MIN(doc_id) AS first_doc FROM pos GROUP BY g),
per_doc AS (
  SELECT p.doc_id,
         CAST(COUNT(1) AS BIGINT) AS grams,
         CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS novel
  FROM pos p JOIN first f USING (g)
  GROUP BY p.doc_id
),
tiled AS (
  SELECT CAST(NTILE({_NOV_TILES}) OVER (ORDER BY doc_id) AS INT) AS decile,
         grams, novel
  FROM per_doc
)
SELECT decile,
       CAST(COUNT(1) AS BIGINT) AS docs,
       CAST(SUM(grams) AS BIGINT) AS grams_total,
       CAST(SUM(novel) AS BIGINT) AS grams_novel,
       CAST(SUM(novel) * 1000000 // SUM(grams) AS BIGINT) AS novelty_ppm
FROM tiled
GROUP BY decile
ORDER BY decile
""",
)
def corpus_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.dedup import positional_gram_postings
    from formula_1_spark.operators.windows import global_ntile_two_phase

    docs = load_table(spark, sf_dir, "documents")
    pos = (
        positional_gram_postings(docs, _NOV_K)
        .select("doc_id", "g")
        .distinct()
    )
    # A gram is novel in exactly the doc that is its min(doc_id), so the
    # per-doc novel count is a count over the gram-grain min aggregate —
    # no need to join the first-occurrence relation back onto the full
    # gram relation (that join shuffled every (doc, gram) row a second
    # time; both aggregates here are map-side combinable and the only
    # join left is doc-grain).
    grams_per_doc = pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("grams")
    )
    novel_per_doc = (
        pos.groupBy("g")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("novel"))
    )
    per_doc = (
        grams_per_doc.join(novel_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "grams",
            F.coalesce("novel", F.lit(0)).cast("bigint").alias("novel"),
        )
    )
    tiled = global_ntile_two_phase(
        per_doc, [F.asc("doc_id")], _NOV_TILES, alias="decile"
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("grams").cast("bigint").alias("grams_total"),
            F.sum("novel").cast("bigint").alias("grams_novel"),
            F.expr(
                "cast(sum(novel) * 1000000 div sum(grams) as bigint)"
            ).alias("novelty_ppm"),
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("docs").cast("bigint").alias("docs"),
            "grams_total",
            "grams_novel",
            "novelty_ppm",
        )
        .orderBy("decile")
    )
