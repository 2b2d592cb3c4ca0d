"""Deterministic-sampling and corpus-statistics queries over
``documents``, each with an exact DuckDB oracle (the sampling hash is the
engine-shared md5 family, so even "random" sampling is hash-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.functions.text import lang_guess, tokens
from formula_1_spark.operators.sampling import (
    GRID,
    fixed_n_per_stratum,
    hash_uniform_sql,
    stratified_sample,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.queries.text_analysis import _LANG_CASE
from formula_1_spark.sources.tables import load_table

_RATES = {"en": 0.5, "es": 0.25, "de": 0.125, "und": 0.05}

_RATE_CASE = (
    "CASE "
    + " ".join(f"WHEN lang_guess = '{k}' THEN {v}" for k, v in _RATES.items())
    + " ELSE 0.0 END"
)


@register(
    "sample_stratified_by_lang",
    ops="EXT-sampling,P7",
    doc="Language-rebalancing stratified sample: per-language keep-rates "
    "(en 0.5 / es 0.25 / de 0.125 / und 0.05) decided by a salted md5 "
    "hash of doc_id — reproducible run-to-run, shuffle-free, and "
    "hash-checkable against the oracle.",
    oracle=f"""
WITH langd AS (
  SELECT doc_id, source, {_LANG_CASE} AS lang_guess FROM documents
)
SELECT doc_id, source, lang_guess,
       {hash_uniform_sql("doc_id", "strat")} AS u
FROM langd
WHERE {hash_uniform_sql("doc_id", "strat")} < {_RATE_CASE}
""",
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.sampling import hash_uniform

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", lang_guess("text").alias("lang_guess")
    )
    sampled = stratified_sample(
        docs, F.col("lang_guess"), _RATES, key_col="doc_id", salt="strat"
    )
    return sampled.withColumn("u", hash_uniform(F.col("doc_id"), "strat"))


@register(
    "sample_fixed_per_source",
    ops="EXT-sampling,W1",
    doc="Deterministic per-group reservoir: exactly min(20, |group|) docs "
    "per source, ranked by salted hash (doc_id tiebreak). One shuffle on "
    "the stratum key; WindowGroupLimit prunes map-side.",
    oracle=f"""
WITH u AS (
  SELECT doc_id, source, {hash_uniform_sql("doc_id", "resv")} AS u
  FROM documents
),
ranked AS (
  SELECT doc_id, source, u,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY u ASC, doc_id ASC) AS INTEGER) AS rk
  FROM u
)
SELECT doc_id, source, u, rk FROM ranked WHERE rk <= 20
""",
)
def sample_fixed_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return fixed_n_per_stratum(docs, "source", 20, key_col="doc_id", salt="resv")


@register(
    "corpus_ngram_stats",
    ops="EXT-text,A1,O3",
    doc="Corpus bigram frequency table: top-10 word bigrams per guessed "
    "language by document frequency (distinct docs containing the "
    "bigram) with total occurrence counts — the LM-style corpus stat.",
    oracle=f"""
WITH langd AS (
  SELECT doc_id, {_LANG_CASE} AS lang_guess,
         regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, lang_guess,
         unnest(list_transform(range(0, greatest(len(t) - 1, 0)),
                i -> array_to_string(list_slice(t, i + 1, i + 2), ' '))) AS bigram
  FROM langd
),
stats AS (
  SELECT lang_guess, bigram,
         COUNT(1) AS n_occurrences,
         COUNT(DISTINCT doc_id) AS doc_freq
  FROM grams
  GROUP BY lang_guess, bigram
),
ranked AS (
  SELECT lang_guess, bigram, n_occurrences, doc_freq,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang_guess
           ORDER BY doc_freq DESC, n_occurrences DESC, bigram ASC) AS INTEGER) AS rk
  FROM stats
)
SELECT lang_guess, bigram, n_occurrences, doc_freq, rk
FROM ranked WHERE rk <= 10
""",
)
def corpus_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # tokenize once per row behind a cache barrier (CollapseProject would
    # re-split per bigram otherwise — see functions/text.py), then build
    # bigrams and explode to (doc, lang, bigram) rows for a single
    # grouped aggregation with map-side partial counts.
    tok = docs.select(
        "doc_id", lang_guess("text").alias("lang_guess"), tokens("text").alias("toks")
    ).persist()
    grams = tok.select(
        "doc_id",
        "lang_guess",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - F.lit(2)),
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    stats = grams.groupBy("lang_guess", "bigram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    w = Window.partitionBy("lang_guess").orderBy(
        F.desc("doc_freq"), F.desc("n_occurrences"), F.asc("bigram")
    )
    return (
        stats.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("lang_guess", "bigram", "n_occurrences", "doc_freq", "rk")
    )


CONTEXT_TOKENS = 512  # packing budget per training sequence


@register(
    "sequence_packing",
    ops="EXT-packing,W1,A5 (per-shard greedy packing via window cumsum)",
    doc=f"Sequence packing for training: docs are packed in doc_id order "
    f"into {CONTEXT_TOKENS}-token bins PER SOURCE (a doc joins the bin "
    f"its cumulative offset starts in). Per-shard windows keep the "
    f"cumsum parallel at scale — packing is embarrassingly shardable, "
    f"a GLOBAL packing order would serialize the corpus.",
    oracle=f"""
WITH base AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '\\s+')) AS ntok
  FROM documents
),
cum AS (
  SELECT doc_id, source, ntok,
         SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id) AS cumtok
  FROM base
),
binned AS (
  SELECT source,
         CAST(FLOOR((cumtok - ntok) / {CONTEXT_TOKENS}.0) AS BIGINT) AS bin_id,
         ntok
  FROM cum
)
SELECT source, bin_id,
       COUNT(1) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS bin_tokens,
       CAST(SUM(ntok) AS BIGINT) / {CONTEXT_TOKENS}.0 AS fill_ratio
FROM binned GROUP BY source, bin_id
""",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", F.size(tokens("text")).alias("ntok")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    cum = base.withColumn("cumtok", F.sum("ntok").over(w))
    binned = cum.select(
        "source",
        F.floor((F.col("cumtok") - F.col("ntok")) / F.lit(float(CONTEXT_TOKENS)))
        .cast("bigint")
        .alias("bin_id"),
        "ntok",
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("bin_tokens"),
        (F.sum("ntok") / F.lit(float(CONTEXT_TOKENS))).alias("fill_ratio"),
    )


# Target language mixture for the sampled training corpus, as a share of
# a token budget set to 30% of the corpus.
_MIX_TARGETS = {"en": 0.5, "es": 0.2, "de": 0.2, "und": 0.1}
_MIX_BUDGET_FRAC = 0.3

_TARGET_CASE = (
    "CASE "
    + " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in _MIX_TARGETS.items())
    + " ELSE 0.0 END"
)


@register(
    "corpus_mixture_plan",
    ops="EXT-mixture,A1,W2,J1 (two-phase plan: aggregate -> broadcast -> apply)",
    doc="Mixture balancing: per-language keep rates computed IN-PLAN "
    "(rate = min(1, budget*share/lang_tokens), budget = 30% of corpus "
    "tokens via a post-aggregation global window), broadcast back onto "
    "the corpus, applied with the deterministic sampling hash; reports "
    "planned rate and achieved kept docs/tokens per language — no "
    "driver-side collect anywhere.",
    oracle=f"""
WITH base AS (
  SELECT doc_id, {_LANG_CASE} AS lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS ntok
  FROM documents
),
totals AS (
  SELECT lang, COUNT(1) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS lang_tokens
  FROM base GROUP BY lang
),
plan AS (
  SELECT lang, n_docs, lang_tokens,
         CAST({_TARGET_CASE} AS DOUBLE) AS target_share,
         least(1.0, CAST({_MIX_BUDGET_FRAC} AS DOUBLE)
                    * CAST(SUM(lang_tokens) OVER () AS DOUBLE)
                    * CAST(({_TARGET_CASE}) AS DOUBLE)
                    / CAST(lang_tokens AS DOUBLE)) AS keep_rate
  FROM totals
),
kept AS (
  SELECT b.lang, COUNT(1) AS kept_docs, CAST(SUM(b.ntok) AS BIGINT) AS kept_tokens
  FROM base b JOIN plan p ON b.lang = p.lang
  WHERE {hash_uniform_sql("b.doc_id", "mix")} < p.keep_rate
  GROUP BY b.lang
)
SELECT p.lang, p.n_docs, p.lang_tokens, p.target_share, p.keep_rate,
       COALESCE(k.kept_docs, 0) AS kept_docs,
       COALESCE(k.kept_tokens, 0) AS kept_tokens
FROM plan p LEFT JOIN kept k ON p.lang = k.lang
""",
)
def corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.operators.sampling import hash_uniform

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        lang_guess("text").alias("lang"),
        F.size(tokens("text")).alias("ntok"),
    )
    totals = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("ntok").alias("lang_tokens")
    )
    share = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in _MIX_TARGETS.items()
        ],
        F.lit(0.0),
    )
    wall = Window.partitionBy()
    plan = totals.select(
        "lang",
        "n_docs",
        "lang_tokens",
        share.alias("target_share"),
        F.least(
            F.lit(1.0),
            F.lit(_MIX_BUDGET_FRAC)
            * F.sum("lang_tokens").over(wall)
            * share
            / F.col("lang_tokens"),
        ).alias("keep_rate"),
    )
    kept = (
        base.join(F.broadcast(plan.select("lang", "keep_rate")), "lang")
        .filter(hash_uniform(F.col("doc_id"), "mix") < F.col("keep_rate"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("ntok").alias("kept_tokens"),
        )
    )
    return plan.join(kept, "lang", "left").select(
        "lang",
        "n_docs",
        "lang_tokens",
        "target_share",
        "keep_rate",
        F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
        F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
    )


@register(
    "doc_rarity_filter",
    ops="EXT-text-rarity,A1,W1 (doc-vs-corpus statistic, join-free)",
    doc="CCNet-style rarity filter: each document scored against the "
    "CORPUS bigram distribution — fraction of its bigrams whose global "
    "occurrence count is <= 2, on an exact integer ppm grid, flagged at "
    ">= 50%. The corpus count attaches via a window over the bigram key "
    "(one shuffle) instead of a counts-table self-join (two shuffles + "
    "join); the doc-level re-aggregation is the only other shuffle. All "
    "outputs are exact integers — no log-prob floats to drift.",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(0, greatest(len(t) - 1, 0)),
                i -> array_to_string(list_slice(t, i + 1, i + 2), ' '))) AS bigram
  FROM toks
),
occ AS (
  SELECT doc_id, COUNT(1) OVER (PARTITION BY bigram) AS n_occ FROM grams
),
doc AS (
  SELECT doc_id, COUNT(1) AS n_bigrams,
         SUM(CASE WHEN n_occ <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_rare
  FROM occ GROUP BY doc_id
)
SELECT doc_id, n_bigrams, n_rare,
       (n_rare * 1000000) // n_bigrams AS rare_ppm,
       (n_rare * 1000000) // n_bigrams >= 500000 AS flag_suspect
FROM doc
""",
)
def doc_rarity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", tokens("text").alias("toks"))
    grams = tok.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - F.lit(2)),
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    occ = grams.select(
        "doc_id", F.count(F.lit(1)).over(Window.partitionBy("bigram")).alias("n_occ")
    )
    doc = occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum((F.col("n_occ") <= 2).cast("bigint")).alias("n_rare"),
    )
    rare_ppm = F.expr("(n_rare * 1000000) DIV n_bigrams")
    return doc.select(
        "doc_id",
        "n_bigrams",
        "n_rare",
        rare_ppm.alias("rare_ppm"),
        (rare_ppm >= 500000).alias("flag_suspect"),
    )


# ---------------------------------------------------------------------------
# pass@k estimator (round 10)
# ---------------------------------------------------------------------------

_PAK_K = 5


def _pak_fold_sql(n: str, c: str, k: int) -> str:
    """The unbiased pass@k complement C(n-c,k)/C(n,k) as an unrolled
    integer fold: r_{i+1} = r_i * max(n-c-i, 0) // (n-i), r_0 = 1e6.
    Each step floors on the ppm grid, so the value deviates from the
    exact rational by < k ppm — but DETERMINISTICALLY, the identical op
    sequence in both engines, and without the ~n^k intermediate product
    that would overflow int64 for large attempt counts."""
    expr = "1000000"
    for i in range(k):
        expr = f"(({expr}) * GREATEST({n} - {c} - {i}, 0)) // ({n} - {i})"
    return expr


@register(
    "pass_at_k_estimator",
    ops="EXT-eval-passk,A1,P7 (combinatorial eval metric)",
    doc=f"pass@{_PAK_K} estimator (Chen et al. 2021, HumanEval): per user, "
    "attempts n = click+purchase events, successes c = purchases; "
    "pass@k = 1 - C(n-c,k)/C(n,k), the probability that k samples drawn "
    "without replacement contain a success. The complement ratio is "
    "computed as an unrolled per-factor integer fold on the ppm grid "
    "(each step multiplies by (n-c-i) and floor-divides by (n-i)), "
    "which both engines replay bit-for-bit and which never forms the "
    "n^k product that overflows int64 at large attempt counts (< k ppm "
    "from the exact rational, documented). Users with fewer than k "
    "attempts are excluded (the estimator is undefined). Per-user "
    "grain: one corpus aggregate, then pure per-row arithmetic.",
    oracle=f"""
WITH att AS (
  SELECT user_id,
         CAST(COUNT(1) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id
)
SELECT user_id, n, c,
       CAST(1000000 - ({_pak_fold_sql("n", "c", _PAK_K)}) AS BIGINT)
         AS pass_at_k_ppm
FROM att
WHERE n >= {_PAK_K}
ORDER BY user_id
""",
)
def pass_at_k_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    att = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("c"),
        )
        .filter(F.col("n") >= _PAK_K)
    )
    fold = _pak_fold_sql("n", "c", _PAK_K).replace("//", "div")
    return att.select(
        "user_id",
        "n",
        "c",
        F.expr(f"CAST(1000000 - ({fold}) AS BIGINT)").alias("pass_at_k_ppm"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence intervals (round 11)
# ---------------------------------------------------------------------------

# Poisson(1) inverse-CDF thresholds on the 32-bit md5-uniform grid:
# weight w = #{k : u >= T_k} for u in [0, 2^32). Computed ONCE here in
# Python and embedded as identical integer literals in BOTH engines, so
# libm exp never has to agree cross-engine (the engines only compare
# ints). Truncated at w=8: P(w > 8) < 1.2e-7 per draw.
_BOOT_T = []
_cum = 0.0
for _k in range(8):
    import math as _math

    _cum += _math.exp(-1.0) / _math.factorial(_k)
    _BOOT_T.append(int(_cum * 2**32))
_BOOT_B = 64
_BOOT_LO_RANK = 2  # ~2.5th percentile of 64 replicates
_BOOT_HI_RANK = 63  # ~97.5th percentile


def _boot_w_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_BOOT_T)
    )
    return f"CASE {arms} ELSE 8 END"


@register(
    "poisson_bootstrap_ci",
    ops="EXT-stat-bootstrap,A1,W1 (map-reduce bootstrap CI)",
    doc=f"Poisson bootstrap confidence intervals (Chamandy et al. 2012 — "
    f"THE bootstrap that scales: classical resampling needs the whole "
    f"dataset per replicate; the Poisson approximation gives every row "
    f"an independent Poisson(1) weight per replicate, so all "
    f"{_BOOT_B} replicates stream in ONE pass with map-side combine, "
    f"no materialized resamples). Weights are md5-derived (row, "
    f"replicate) uniforms cut by precomputed inverse-CDF integer "
    f"thresholds; replicate means use exact cents/DECIMAL(38) "
    f"arithmetic; the CI is the {_BOOT_LO_RANK}nd/{_BOOT_HI_RANK}rd "
    f"order statistic of the {_BOOT_B} replicate means per group. "
    f"Everything replays bit-for-bit in the oracle.",
    oracle=f"""
WITH base AS (
  SELECT o_orderpriority AS priority, o_orderkey AS ok,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
weighted AS (
  SELECT b.priority, r.b,
         {_boot_w_sql("CAST(('0x' || substr(md5(CAST(b.ok AS VARCHAR) || ':' || CAST(r.b AS VARCHAR)), 1, 8)) AS BIGINT)")} AS w,
         b.cents
  FROM base b, (SELECT unnest(range(0, {_BOOT_B})) AS b) r
),
rep AS (
  SELECT priority, b, CAST(SUM(w) AS HUGEINT) AS sw,
         CAST(SUM(w * cents) AS HUGEINT) AS swx
  FROM weighted GROUP BY priority, b
),
rep_mean AS (
  SELECT priority, b,
         CASE WHEN sw = 0 THEN NULL
              ELSE CAST(swx * 1000000 // sw AS BIGINT) END AS mean_micents
  FROM rep
),
ranked AS (
  SELECT priority, mean_micents,
         ROW_NUMBER() OVER (PARTITION BY priority
                            ORDER BY mean_micents ASC, b ASC) AS r
  FROM rep_mean
),
ci AS (
  SELECT priority,
         MAX(CASE WHEN r = {_BOOT_LO_RANK} THEN mean_micents END) AS ci_lo_micents,
         MAX(CASE WHEN r = {_BOOT_HI_RANK} THEN mean_micents END) AS ci_hi_micents
  FROM ranked GROUP BY priority
),
pt AS (
  SELECT priority, CAST(COUNT(1) AS BIGINT) AS n_orders,
         CAST(CAST(SUM(cents) AS HUGEINT) * 1000000 // COUNT(1) AS BIGINT)
           AS point_mean_micents
  FROM base GROUP BY priority
)
SELECT p.priority, p.n_orders, p.point_mean_micents,
       c.ci_lo_micents, c.ci_hi_micents
FROM pt p JOIN ci c USING (priority)
ORDER BY p.priority
""",
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.operators.dedup import md5_int32
    from formula_1_spark.sources.tables import fan_out

    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("ok"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # One pass over base x 64 replicate ids; the explode fans out map-side
    # and collapses immediately into the (priority, b) partial aggregate —
    # the streaming Poisson-bootstrap shape (no resample materialization).
    # fan_out BEFORE the explode: the 64x replicate md5s are the whole
    # cost of this query, and a single-row-group parquet scan otherwise
    # serializes all of it onto one core (measured 9.0 s -> ~1 s at
    # sf0.1; no-op once the scan has >= core-count splits).
    weighted = fan_out(base).select(
        "priority",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "ok",
    )
    u = md5_int32(
        F.concat_ws(
            ":", F.col("ok").cast("string"), F.col("b").cast("string")
        )
    )
    w = F.when(u < _BOOT_T[0], 0)
    for k, t in enumerate(_BOOT_T[1:], start=1):
        w = w.when(u < t, k)
    w = w.otherwise(8)
    rep = (
        weighted.withColumn("w", w)
        .groupBy("priority", "b")
        .agg(
            F.sum("w").cast("decimal(38,0)").alias("sw"),
            F.sum(F.col("w") * F.col("cents"))
            .cast("decimal(38,0)")
            .alias("swx"),
        )
    )
    rep_mean = rep.select(
        "priority",
        "b",
        F.expr(
            "CASE WHEN sw = 0 THEN NULL"
            " ELSE CAST(swx * 1000000 div sw AS BIGINT) END"
        ).alias("mean_micents"),
    )
    wr = Window.partitionBy("priority").orderBy(
        F.asc("mean_micents"), F.asc("b")
    )
    ranked = rep_mean.withColumn("r", F.row_number().over(wr))
    ci = ranked.groupBy("priority").agg(
        F.max(
            F.when(F.col("r") == _BOOT_LO_RANK, F.col("mean_micents"))
        ).alias("ci_lo_micents"),
        F.max(
            F.when(F.col("r") == _BOOT_HI_RANK, F.col("mean_micents"))
        ).alias("ci_hi_micents"),
    )
    pt = base.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "CAST(CAST(SUM(cents) AS DECIMAL(38,0)) * 1000000"
            " div COUNT(1) AS BIGINT)"
        ).alias("point_mean_micents"),
    )
    return (
        pt.join(ci, "priority")
        .select(
            "priority",
            "n_orders",
            "point_mean_micents",
            "ci_lo_micents",
            "ci_hi_micents",
        )
        .orderBy("priority")
    )
