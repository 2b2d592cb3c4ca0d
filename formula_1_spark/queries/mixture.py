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


# ---------------------------------------------------------------------------
# UniMax budget waterfilling (round 9)
# ---------------------------------------------------------------------------

_UNIMAX_E_NUM = 3  # per-language epoch cap = 3/2 epochs (UniMax's small-N cap)
_UNIMAX_E_DEN = 2


@register(
    "unimax_budget_allocation",
    ops="EXT-mixture-unimax,A1,W1 (epoch-capped budget waterfilling)",
    doc="UniMax language-budget allocation (Chung et al. 2023, ICLR): "
    "given a total token budget (here: one corpus-size worth) and a "
    "per-language epoch cap (3/2 epochs), waterfill ascending by "
    "capacity — languages whose cap fits under the water level get their "
    "full cap ('capped'), the rest split the remaining budget equally. "
    "Closed-form via ONE window pass over the per-language aggregate "
    "(exact integers: capped_i iff cap_i * langs_remaining_i <= budget - "
    "prefix_cap_sum_i, a prefix property of the ascending order). The "
    "corpus is scanned once for token counts; everything after is "
    "lang-grain (~10s of rows at any corpus size).",
    oracle=f"""
WITH tok AS (
  SELECT lang,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
caps AS (
  SELECT lang, n_tokens,
         CAST(n_tokens * {_UNIMAX_E_NUM} // {_UNIMAX_E_DEN} AS BIGINT) AS cap
  FROM tok
),
par AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS budget,
         CAST(COUNT(1) AS BIGINT) AS n_langs
  FROM caps
),
ord AS (
  SELECT lang, n_tokens, cap,
         CAST(ROW_NUMBER() OVER (ORDER BY cap ASC, lang ASC) AS BIGINT) AS rn,
         CAST(SUM(cap) OVER (ORDER BY cap ASC, lang ASC
                             ROWS UNBOUNDED PRECEDING) - cap AS BIGINT)
           AS excl
  FROM caps
),
flagged AS (
  SELECT o.*, p.budget, p.n_langs,
         CASE WHEN o.cap * (p.n_langs - o.rn + 1) <= p.budget - o.excl
              THEN 1 ELSE 0 END AS capped
  FROM ord o, par p
),
stats AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN capped = 1 THEN cap END), 0) AS BIGINT)
           AS capped_tokens,
         CAST(SUM(capped) AS BIGINT) AS n_capped
  FROM flagged
)
SELECT f.lang, f.n_tokens, f.cap AS capacity,
       CAST(CASE WHEN f.capped = 1 THEN f.cap
                 ELSE (f.budget - s.capped_tokens)
                      // (f.n_langs - s.n_capped) END AS BIGINT) AS allocated,
       CAST(CASE WHEN f.capped = 1 THEN f.cap
                 ELSE (f.budget - s.capped_tokens)
                      // (f.n_langs - s.n_capped) END * 1000000
            // f.n_tokens AS BIGINT) AS epochs_ppm,
       CAST(f.capped AS INT) AS capped
FROM flagged f, stats s
ORDER BY f.lang
""",
)
def unimax_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    caps = tok.withColumn(
        "cap",
        F.expr(
            f"CAST(n_tokens * {_UNIMAX_E_NUM} div {_UNIMAX_E_DEN} AS BIGINT)"
        ),
    )
    par = caps.agg(
        F.sum("n_tokens").cast("bigint").alias("budget"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    # Window over the LANG-GRAIN aggregate (~10s of rows at any corpus
    # size) — bounded by the upstream Aggregate, never the corpus.
    w = Window.orderBy(F.asc("cap"), F.asc("lang"))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordd = caps.withColumn(
        "rn", F.row_number().over(w).cast("bigint")
    ).withColumn(
        "excl", (F.sum("cap").over(wsum) - F.col("cap")).cast("bigint")
    )
    flagged = ordd.join(F.broadcast(par)).withColumn(
        "capped",
        F.when(
            F.col("cap") * (F.col("n_langs") - F.col("rn") + 1)
            <= F.col("budget") - F.col("excl"),
            1,
        ).otherwise(0),
    )
    stats = flagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped") == 1, F.col("cap"))), F.lit(0)
        )
        .cast("bigint")
        .alias("capped_tokens"),
        F.sum("capped").cast("bigint").alias("n_capped"),
    )
    alloc = F.when(F.col("capped") == 1, F.col("cap")).otherwise(
        F.expr("(budget - capped_tokens) div (n_langs - n_capped)")
    )
    return (
        flagged.join(F.broadcast(stats))
        .select(
            "lang",
            "n_tokens",
            F.col("cap").alias("capacity"),
            alloc.cast("bigint").alias("allocated"),
            F.expr(
                "CAST(CASE WHEN capped = 1 THEN cap"
                " ELSE (budget - capped_tokens) div (n_langs - n_capped)"
                f" END * 1000000 div n_tokens AS BIGINT)"
            ).alias("epochs_ppm"),
            F.col("capped").cast("int").alias("capped"),
        )
        .orderBy("lang")
    )
