"""Temperature-scaled mixture resampling — the multilingual-LLM staple.

Rebalances a corpus toward target shares proportional to p_i^tau
(tau = 0.5 here): per-domain keep-rate ``sqrt(n_min / n_i)`` makes the
expected kept count proportional to sqrt(n_i), i.e. p^0.5 — rare domains
are kept whole, dominant domains subsampled. Selection reuses the
engine-shared salted-md5 uniform grid (``operators/sampling``), so the
sample is reproducible row-for-row in any engine, shuffle-free, and
single-pass over the corpus (the rate table is a tiny broadcast).

Determinism: n_i and n_min are exact integers; ``sqrt`` of their exact
double quotient is correctly rounded IEEE in both engines, and the
uniform values are exact 1e-6-grid doubles, so the < comparison is
bit-identical. tau=0.5 is implemented with ``sqrt`` precisely because a
general ``pow`` is NOT guaranteed correctly rounded across libms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.sampling import hash_uniform, hash_uniform_sql
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table

_SALT = "temp"


@register(
    "sample_temperature_mixture",
    ops="EXT-sampling,A1,J1,P7 (temperature-scaled domain rebalancing)",
    doc="Temperature-0.5 mixture resampling over the document languages: "
    "per-language keep-rate sqrt(n_min/n_i) (rarest language kept whole) "
    "applied via the salted-md5 uniform grid — deterministic, "
    "shuffle-free on the corpus side, rate table broadcast. Expected "
    "kept counts are proportional to p^0.5, the standard temperature "
    "rebalancing for multilingual/multi-domain training mixtures.",
    oracle=f"""
WITH cnt AS (
  SELECT lang, CAST(COUNT(1) AS BIGINT) AS n_lang
  FROM documents GROUP BY lang
),
mn AS (SELECT MIN(n_lang) AS n_min FROM cnt),
rates AS (
  SELECT lang, n_lang,
         sqrt(CAST(n_min AS DOUBLE) / CAST(n_lang AS DOUBLE)) AS keep_rate
  FROM cnt, mn
)
SELECT d.doc_id, d.lang, r.n_lang, r.keep_rate,
       {hash_uniform_sql("d.doc_id", _SALT)} AS u
FROM documents d JOIN rates r ON r.lang = d.lang
WHERE {hash_uniform_sql("d.doc_id", _SALT)} < r.keep_rate
""",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    mn = cnt.agg(F.min("n_lang").alias("n_min"))
    rates = cnt.join(F.broadcast(mn), F.lit(True)).select(
        "lang",
        "n_lang",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_lang").cast("double")).alias(
            "keep_rate"
        ),
    )
    u = hash_uniform(F.col("doc_id"), _SALT)
    return (
        docs.join(F.broadcast(rates), "lang")
        .withColumn("u", u)
        .filter(F.col("u") < F.col("keep_rate"))
        .select("doc_id", "lang", "n_lang", "keep_rate", "u")
    )
