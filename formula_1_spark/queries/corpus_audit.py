"""Corpus-audit operators (round 5, slate 3): evaluation-side checks a
training-data pipeline runs AFTER splitting and filtering.

* ``code_switch_audit`` — multi-language (code-switched) document
  detection from the marker lexicons: a doc is code-switched when >=2
  languages each hit >=2 marker words. Pure regexp_count Column math.
* ``split_ngram_coverage`` — generalization raw material: what fraction
  of each eval split's distinct word-3-grams also occur in train?
  (Decontamination REMOVES overlap; this MEASURES the remaining lexical
  coverage per language.) Gram-keyed semi-join, never materializing the
  cross product.
* ``boilerplate_phrase_filter`` — CCNet-style boilerplate detection:
  bigrams whose document frequency exceeds 30% of the corpus are
  boilerplate phrases; documents carrying >=3 of them get flagged, per
  source. Integer cross-multiplied threshold (df*100 > 30*D) — no
  division, no floats.
* ``source_quality_calibration`` — per-source score calibration: exact
  quartile boundaries of the quality score per source (an AGGREGATE
  percentile, not a per-row window — boundaries broadcast back, so no
  per-source single-task window at scale), then each doc lands in a
  quartile bucket by strict comparison. Interpolated boundaries are
  exact doubles (p*(n-1) ranks with frac in {0,.25,.5,.75} over ints),
  so Spark and DuckDB agree bit-for-bit.

All four run on the ``documents`` table; shuffles key on grams/tokens
(as spreadable as the corpus) or on the 20-source dimension only after
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.functions.text import LANG_MARKERS, marker_count
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import fan_out, load_table

_EN = LANG_MARKERS["en"]
_ES = LANG_MARKERS["es"]
_DE = LANG_MARKERS["de"]

_MIN_HITS = 2  # a language "is present" at >= 2 marker hits


@register(
    "code_switch_audit",
    ops="EXT-codeswitch,F1,A1 (multi-language document detection)",
    doc="Code-switched document detection: count marker-word hits per "
    "language (the same lexicons the lang-ID heuristic uses); a doc is "
    "code-switched when >=2 languages each reach 2 hits. Per source: "
    "docs, code-switched docs, ppm, and the worst doc's language "
    "count. One scan, pure regexp_count expressions, one aggregate.",
    oracle=f"""
WITH hits AS (
  SELECT source,
         CASE WHEN len(regexp_extract_all(text, '{_EN}')) >= {_MIN_HITS}
              THEN 1 ELSE 0 END
       + CASE WHEN len(regexp_extract_all(text, '{_ES}')) >= {_MIN_HITS}
              THEN 1 ELSE 0 END
       + CASE WHEN len(regexp_extract_all(text, '{_DE}')) >= {_MIN_HITS}
              THEN 1 ELSE 0 END AS n_langs
  FROM documents
)
SELECT source,
       CAST(COUNT(1) AS BIGINT) AS docs_total,
       CAST(SUM(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS code_switched_docs,
       CAST(SUM(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) * 1000000
            // COUNT(1) AS BIGINT) AS code_switched_ppm,
       CAST(MAX(n_langs) AS INTEGER) AS max_langs_present
FROM hits
GROUP BY source
ORDER BY source
""",
)
def code_switch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    present = [
        F.when(marker_count("text", pat) >= _MIN_HITS, 1).otherwise(0)
        for pat in (_EN, _ES, _DE)
    ]
    n_langs = (present[0] + present[1] + present[2]).alias("n_langs")
    hits = docs.select("source", n_langs)
    switched = F.sum(F.when(F.col("n_langs") >= 2, 1).otherwise(0))
    return (
        hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_total"),
            switched.alias("code_switched_docs"),
            F.expr(
                "sum(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) * 1000000"
                " div count(1)"
            ).alias("code_switched_ppm"),
            F.max("n_langs").cast("int").alias("max_langs_present"),
        )
        .orderBy("source")
    )


_SPLIT_CASE = """CASE
  WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 < 8
    THEN 'train'
  WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 = 8
    THEN 'val'
  ELSE 'test' END"""


@register(
    "split_ngram_coverage",
    ops="EXT-coverage,J-semi,A1 (eval-split lexical coverage vs train)",
    doc="Per (eval split, lang): how many distinct word-3-grams the "
    "val/test docs contain, and what fraction also occurs in train "
    "(the md5(doc_id) 8/1/1 split of dataset_hash_split). Distinct "
    "gram sets built per split, covered = left-semi against the train "
    "set on (lang, gram) — gram-keyed shuffles only, the uncovered "
    "complement never leaves its partition.",
    oracle=f"""
WITH tagged AS (
  SELECT doc_id, lang, {_SPLIT_CASE} AS split,
         string_split(text, ' ') AS tok
  FROM documents
),
grams AS (
  SELECT DISTINCT lang, split, g
  FROM (
    SELECT lang, split,
           unnest(list_transform(range(0, greatest(len(tok) - 2, 0)),
                  i -> array_to_string(list_slice(tok, i + 1, i + 3), ' ')))
             AS g
    FROM tagged
  )
),
train_set AS (SELECT DISTINCT lang, g FROM grams WHERE split = 'train'),
eval_grams AS (SELECT lang, split, g FROM grams WHERE split <> 'train')
SELECT e.split, e.lang,
       CAST(COUNT(1) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS covered_grams,
       CAST(SUM(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(1) AS BIGINT) AS coverage_ppm
FROM eval_grams e
LEFT JOIN train_set t ON e.lang = t.lang AND e.g = t.g
GROUP BY e.split, e.lang
ORDER BY e.split, e.lang
""",
)
def split_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    b = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
    )
    toks = F.split(F.col("text"), " ")
    grams_arr = F.transform(
        F.sequence(
            F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0)) - 1
        ),
        lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
    )
    tagged = docs.select(
        "lang",
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test").alias(
            "split"
        ),
        F.explode(grams_arr).alias("g"),
    ).distinct()
    train_set = (
        tagged.filter(F.col("split") == "train")
        .select("lang", "g")
        .distinct()
        .withColumn("in_train", F.lit(1))
    )
    eval_grams = tagged.filter(F.col("split") != "train")
    return (
        eval_grams.join(train_set, ["lang", "g"], "left")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("in_train").isNotNull(), 1).otherwise(0)
            ).alias("covered_grams"),
            F.expr(
                "sum(CASE WHEN in_train IS NOT NULL THEN 1 ELSE 0 END)"
                " * 1000000 div count(1)"
            ).alias("coverage_ppm"),
        )
        .orderBy("split", "lang")
    )


_BOILER_DF_PCT = 30  # bigram is boilerplate when df > 30% of docs
_BOILER_MIN_PHRASES = 3  # doc flagged at >= 3 distinct boilerplate phrases


@register(
    "boilerplate_phrase_filter",
    ops="EXT-boilerplate,A1,J1 (document-frequency phrase filter)",
    doc="Boilerplate detection: word bigrams whose document frequency "
    "exceeds 30% of the corpus (integer cross-multiply, df*100 > 30*D) "
    "are boilerplate phrases; docs carrying >=3 distinct ones are "
    "flagged. Per source: docs, flagged docs, ppm, distinct boilerplate "
    "phrases seen. The phrase list is corpus-bounded-small and "
    "broadcast back onto the per-doc bigram relation.",
    oracle=f"""
WITH doc_bigrams AS (
  SELECT DISTINCT doc_id, source, g
  FROM (
    SELECT doc_id, source,
           unnest(list_transform(range(0, greatest(len(tok) - 1, 0)),
                  i -> array_to_string(list_slice(tok, i + 1, i + 2), ' ')))
             AS g
    FROM (SELECT doc_id, source, string_split(text, ' ') AS tok
          FROM documents)
  )
),
d_total AS (SELECT CAST(COUNT(1) AS BIGINT) AS d FROM documents),
boiler AS (
  SELECT g FROM doc_bigrams CROSS JOIN d_total
  GROUP BY g, d
  HAVING COUNT(1) * 100 > {_BOILER_DF_PCT} * d
),
per_doc AS (
  SELECT db.doc_id, db.source,
         CAST(COUNT(b.g) AS BIGINT) AS n_boiler
  FROM doc_bigrams db LEFT JOIN boiler b ON db.g = b.g
  GROUP BY db.doc_id, db.source
),
flags AS (
  SELECT doc_id, source, n_boiler,
         CASE WHEN n_boiler >= {_BOILER_MIN_PHRASES} THEN 1 ELSE 0 END
           AS flagged
  FROM per_doc
)
SELECT f.source,
       CAST(COUNT(1) AS BIGINT) AS docs_total,
       CAST(SUM(f.flagged) AS BIGINT) AS flagged_docs,
       CAST(SUM(f.flagged) * 1000000 // COUNT(1) AS BIGINT)
         AS flagged_ppm,
       CAST(MAX(f.n_boiler) AS BIGINT) AS max_boiler_phrases,
       (SELECT CAST(COUNT(1) AS BIGINT) FROM boiler) AS corpus_boiler_phrases
FROM flags f
GROUP BY f.source
ORDER BY f.source
""",
)
def boilerplate_phrase_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(
            F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)) - 1
        ),
        lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
    )
    # The exploded distinct bigram relation feeds BOTH the boiler-phrase
    # df aggregate and the per-doc flag join; checkpointing it (and the
    # tiny boiler set, read by the join and the corpus-wide count)
    # executes the explode+distinct once instead of twice.
    doc_bigrams = (
        docs.select("doc_id", "source", F.explode(bigrams).alias("g"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    d_total = docs.agg(F.count(F.lit(1)).alias("d"))
    boiler = (
        doc_bigrams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(d_total))
        .filter(F.col("df") * 100 > _BOILER_DF_PCT * F.col("d"))
        .select("g")
        .withColumn("is_boiler", F.lit(1))
        .localCheckpoint(eager=False)
    )
    per_doc = (
        doc_bigrams.join(F.broadcast(boiler), "g", "left")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.coalesce("is_boiler", F.lit(0))).alias("n_boiler"))
    )
    n_boiler_phrases = boiler.agg(
        F.count(F.lit(1)).alias("corpus_boiler_phrases")
    )
    flagged = F.when(
        F.col("n_boiler") >= _BOILER_MIN_PHRASES, 1
    ).otherwise(0)
    return (
        per_doc.withColumn("flagged", flagged)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_total"),
            F.sum("flagged").alias("flagged_docs"),
            F.expr("sum(flagged) * 1000000 div count(1)").alias(
                "flagged_ppm"
            ),
            F.max("n_boiler").alias("max_boiler_phrases"),
        )
        .join(F.broadcast(n_boiler_phrases))
        .orderBy("source")
    )


@register(
    "source_quality_calibration",
    ops="EXT-calibration,A5,J1 (per-group exact quantile bucketing)",
    doc="Per-source score calibration: exact quartile boundaries "
    "(p25/p50/p75, linear interpolation over the integer quality "
    "score — an AGGREGATE, so no per-source single-task window) are "
    "broadcast back and each doc lands in a bucket by strict "
    "comparison. Per (source, quartile): docs and the score range. "
    "The standard move before mixing heterogeneous sources: compare "
    "calibrated ranks, not raw scores.",
    oracle="""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(list_distinct(string_split(text, ' '))) * 1000000
              // len(string_split(text, ' ')) AS BIGINT) AS q
  FROM documents
),
bounds AS (
  SELECT source,
         quantile_cont(q, 0.25) AS p25,
         quantile_cont(q, 0.50) AS p50,
         quantile_cont(q, 0.75) AS p75
  FROM scored GROUP BY source
),
bucketed AS (
  SELECT s.source, s.q,
         1 + CASE WHEN s.q > b.p25 THEN 1 ELSE 0 END
           + CASE WHEN s.q > b.p50 THEN 1 ELSE 0 END
           + CASE WHEN s.q > b.p75 THEN 1 ELSE 0 END AS quartile
  FROM scored s JOIN bounds b USING (source)
)
SELECT source, CAST(quartile AS INTEGER) AS quartile,
       CAST(COUNT(1) AS BIGINT) AS n_docs,
       CAST(MIN(q) AS BIGINT) AS min_q,
       CAST(MAX(q) AS BIGINT) AS max_q
FROM bucketed
GROUP BY source, quartile
ORDER BY source, quartile
""",
)
def source_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    scored = docs.select(
        "source",
        F.expr(
            "CAST(size(array_distinct(split(text, ' '))) * 1000000"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("q"),
    )
    bounds = scored.groupBy("source").agg(
        F.expr("percentile(q, 0.25)").alias("p25"),
        F.expr("percentile(q, 0.50)").alias("p50"),
        F.expr("percentile(q, 0.75)").alias("p75"),
    )
    quartile = (
        F.lit(1)
        + F.when(F.col("q") > F.col("p25"), 1).otherwise(0)
        + F.when(F.col("q") > F.col("p50"), 1).otherwise(0)
        + F.when(F.col("q") > F.col("p75"), 1).otherwise(0)
    ).cast("int")
    return (
        scored.join(F.broadcast(bounds), "source")
        .select("source", "q", quartile.alias("quartile"))
        .groupBy("source", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
        )
        .orderBy("source", "quartile")
    )


# ---------------------------------------------------------------------------
# Total-variation token drift (round 7)
# ---------------------------------------------------------------------------


@register(
    "source_token_tv_drift",
    ops="EXT-corpus-audit,A1 (exact total-variation mixture drift)",
    doc="Per-source unigram-distribution drift from the corpus mixture "
    "as TOTAL-VARIATION distance — the integer-exact alternative to "
    "KL/JS (no logs, no float accumulation): both shares are "
    "floor-quantized to ppm per token, and absent tokens contribute "
    "their corpus share algebraically (tv = (sum_present|p-q| + Q_total "
    "- sum_present q) / 2), so NO source x vocabulary grid is ever "
    "materialized — the only corpus-scale join is (source, token) "
    "counts against token totals on the token key. The drift number "
    "mixture rebalancing watches per source.",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
),
st AS (SELECT source, t, CAST(COUNT(1) AS BIGINT) AS n_st FROM tok GROUP BY 1, 2),
s AS (SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
ct AS (SELECT t, CAST(SUM(n_st) AS BIGINT) AS n_t FROM st GROUP BY 1),
tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n FROM ct),
qtot AS (SELECT CAST(SUM(n_t * 1000000 // t.n) AS BIGINT) AS q FROM ct, tot t),
agg AS (
  SELECT x.source,
         CAST(MAX(s.n_s) AS BIGINT) AS n_tokens,
         CAST(COUNT(1) AS BIGINT) AS distinct_tokens,
         CAST(SUM(abs(x.n_st * 1000000 // s.n_s
                      - c.n_t * 1000000 // t.n)) AS BIGINT) AS a,
         CAST(SUM(c.n_t * 1000000 // t.n) AS BIGINT) AS b
  FROM st x
  JOIN s USING (source)
  JOIN ct c USING (t)
  CROSS JOIN tot t
  GROUP BY x.source
)
SELECT g.source, g.n_tokens, g.distinct_tokens,
       CAST((g.a + q.q - g.b) // 2 AS BIGINT) AS tv_ppm
FROM agg g, qtot q
ORDER BY g.source
""",
)
def source_token_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    st = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_st")
    )
    s = st.groupBy("source").agg(F.sum("n_st").cast("bigint").alias("n_s"))
    ct = st.groupBy("t").agg(F.sum("n_st").cast("bigint").alias("n_t"))
    tot = ct.agg(F.sum("n_t").cast("bigint").alias("n"))
    qtot = (
        ct.join(F.broadcast(tot))
        .agg(
            F.expr("cast(sum(n_t * 1000000 div n) as bigint)").alias("q")
        )
    )
    agg = (
        st.join(F.broadcast(s), "source")
        .join(ct, "t")
        .join(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_tokens"),
            F.expr(
                "cast(sum(abs(n_st * 1000000 div n_s"
                " - n_t * 1000000 div n)) as bigint)"
            ).alias("a"),
            F.expr("cast(sum(n_t * 1000000 div n) as bigint)").alias("b"),
        )
    )
    return (
        agg.join(F.broadcast(qtot))
        .select(
            "source",
            "n_tokens",
            "distinct_tokens",
            F.expr("cast((a + q - b) div 2 as bigint)").alias("tv_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Source diversity indices (round 9)
# ---------------------------------------------------------------------------


@register(
    "source_diversity_index",
    ops="EXT-corpus-diversity,A1,A5 (Simpson concentration per language)",
    doc="Per-language source diversity: token shares per (lang, source) "
    "in integer ppm, then the Simpson concentration index sum(share^2) "
    "and its inverse — the effective number of sources — per language. "
    "All accumulation is exact integers in ppm space (share_ppm <= 1e6, "
    "so share_ppm^2 sums stay under 2^63 at ANY corpus size — the "
    "overflow-safe formulation; summing raw token-count squares would "
    "overflow int64 near 10^9 tokens/source). The training-mix evidence "
    "for how concentrated each language's data supply is: effective "
    "sources near 1 = single-source capture risk.",
    oracle="""
WITH tok AS (
  SELECT lang, source,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS t
  FROM documents GROUP BY lang, source
),
tot AS (
  SELECT lang, CAST(SUM(t) AS BIGINT) AS total FROM tok GROUP BY lang
),
shares AS (
  SELECT k.lang, k.source,
         CAST(k.t * 1000000 // o.total AS BIGINT) AS share_ppm
  FROM tok k JOIN tot o ON o.lang = k.lang
)
SELECT s.lang,
       CAST(COUNT(1) AS BIGINT) AS n_sources,
       CAST(MAX(o.total) AS BIGINT) AS tokens_total,
       CAST(MAX(s.share_ppm) AS BIGINT) AS top_share_ppm,
       CAST(SUM(s.share_ppm * s.share_ppm) AS BIGINT) AS simpson_pp12,
       CAST(1000000000000 * 1000 // SUM(s.share_ppm * s.share_ppm)
            AS BIGINT) AS effective_sources_milli
FROM shares s JOIN tot o ON o.lang = s.lang
GROUP BY s.lang
ORDER BY s.lang
""",
)
def source_diversity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.groupBy("lang", "source").agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("bigint")
        .alias("t")
    )
    tot = tok.groupBy("lang").agg(F.sum("t").cast("bigint").alias("total"))
    shares = tok.join(F.broadcast(tot), "lang").select(
        "lang",
        "source",
        F.expr("CAST(t * 1000000 div total AS BIGINT)").alias("share_ppm"),
        "total",
    )
    return (
        shares.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
            F.max("total").cast("bigint").alias("tokens_total"),
            F.max("share_ppm").cast("bigint").alias("top_share_ppm"),
            F.sum(F.col("share_ppm") * F.col("share_ppm"))
            .cast("bigint")
            .alias("simpson_pp12"),
            F.expr(
                "CAST(1000000000000 * 1000 div "
                "sum(share_ppm * share_ppm) AS BIGINT)"
            ).alias("effective_sources_milli"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test (round 10)
# ---------------------------------------------------------------------------

_KS_BIN = 100  # doc-length bin width (chars): bounds the value domain
_KS_CRIT2_PPM = 1_844_164  # c(0.05)^2 = 1.358^2, scaled 1e6


@register(
    "ks_drift_test",
    ops="EXT-ks-test,A1,W1 (two-sample distribution drift)",
    doc="Two-sample Kolmogorov-Smirnov drift test per source: each "
    "source's doc-length distribution (100-char bins — the bin grid "
    "bounds the value domain at any corpus scale) against its "
    "complement (the rest of the corpus). The KS statistic is the "
    "exact sup-norm of the cumulative-share difference on the ppm "
    "integer grid, evaluated on the densified (source x bin) grid so "
    "both CDFs are compared at every jump point; the alpha=0.05 "
    "decision avoids the float sqrt in c(a)*sqrt((m+n)/mn) by "
    "comparing SQUARES with a decimal(38,0) lift (ks^2*m*n vs "
    "c^2*1e12*(m+n)) — exact at any corpus size. The sup-norm "
    "complement to source_token_tv_drift's L1 distance. One corpus "
    "aggregate; everything after is (sources x bins)-grain.",
    oracle=f"""
WITH binned AS (
  SELECT source, CAST(n_chars // {_KS_BIN} AS BIGINT) AS bin,
         CAST(COUNT(1) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
bins AS (SELECT DISTINCT bin FROM binned),
per_src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS m FROM binned GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM binned),
gbin AS (SELECT bin, CAST(SUM(c) AS BIGINT) AS g FROM binned GROUP BY 1),
grid AS (
  SELECT s.source, s.m, b.bin,
         COALESCE(x.c, 0) AS c_src,
         gb.g - COALESCE(x.c, 0) AS c_comp
  FROM per_src s
  CROSS JOIN bins b
  JOIN gbin gb ON gb.bin = b.bin
  LEFT JOIN binned x ON x.source = s.source AND x.bin = b.bin
),
cum AS (
  SELECT source, m, bin,
         SUM(c_src) OVER (PARTITION BY source ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cs,
         SUM(c_comp) OVER (PARTITION BY source ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS cc
  FROM grid
),
ks AS (
  SELECT c.source, MAX(c.m) AS m,
         (SELECT n_all FROM tot) - MAX(c.m) AS n_comp,
         MAX(ABS(c.cs * 1000000 // c.m
                 - c.cc * 1000000 // ((SELECT n_all FROM tot) - c.m)))
           AS ks_ppm
  FROM cum c GROUP BY c.source
)
SELECT source, CAST(m AS BIGINT) AS m, CAST(n_comp AS BIGINT) AS n_comp,
       CAST(ks_ppm AS BIGINT) AS ks_ppm,
       CAST(CAST(ks_ppm AS DECIMAL(38,0)) * ks_ppm * m * n_comp
            > CAST({_KS_CRIT2_PPM} AS DECIMAL(38,0)) * 1000000 * 1000000
              * (m + n_comp) AS BOOLEAN) AS drift_at_05
FROM ks
ORDER BY source
""",
)
def ks_drift_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    binned = (
        docs.groupBy(
            "source", F.expr(f"CAST(n_chars div {_KS_BIN} AS BIGINT)").alias("bin")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # (sources x bins)-grain, referenced by four downstream subtrees
        .localCheckpoint(eager=False)
    )
    bins = binned.select("bin").distinct()
    per_src = binned.groupBy("source").agg(F.sum("c").cast("bigint").alias("m"))
    tot = binned.agg(F.sum("c").cast("bigint").alias("n_all"))
    gbin = binned.groupBy("bin").agg(F.sum("c").cast("bigint").alias("g"))
    grid = (
        per_src.join(F.broadcast(bins))
        .join(F.broadcast(gbin), "bin")
        .join(binned.withColumnRenamed("c", "c_src"), ["source", "bin"], "left")
        .select(
            "source",
            "m",
            "bin",
            F.coalesce("c_src", F.lit(0)).alias("c_src"),
            (F.col("g") - F.coalesce("c_src", F.lit(0))).alias("c_comp"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("cs", F.sum("c_src").over(w)).withColumn(
        "cc", F.sum("c_comp").over(w)
    )
    ks = (
        cum.join(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("m").alias("m"),
            (F.max("n_all") - F.max("m")).alias("n_comp"),
            F.max(
                F.abs(
                    F.expr("cs * 1000000 div m")
                    - F.expr("cc * 1000000 div (n_all - m)")
                )
            ).alias("ks_ppm"),
        )
    )
    return ks.select(
        "source",
        F.col("m").cast("bigint").alias("m"),
        F.col("n_comp").cast("bigint").alias("n_comp"),
        F.col("ks_ppm").cast("bigint").alias("ks_ppm"),
        F.expr(
            "CAST(CAST(ks_ppm AS DECIMAL(38,0)) * ks_ppm * m * n_comp"
            f" > CAST({_KS_CRIT2_PPM} AS DECIMAL(38,0)) * 1000000 * 1000000"
            " * (m + n_comp) AS BOOLEAN)"
        ).alias("drift_at_05"),
    ).orderBy("source")
