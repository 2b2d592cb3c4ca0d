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
