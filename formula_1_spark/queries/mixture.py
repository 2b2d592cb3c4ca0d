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


# ---------------------------------------------------------------------------
# IPF / raking mixture weights (round 9)
# ---------------------------------------------------------------------------

_IPF_GRID = 10_000_000  # pp10m share grid: products stay under int64 at any n
_IPF_ROUNDS = 3


def _ipf_ctes(rounds: int) -> str:
    """Unrolled row-scale / column-scale rounds, windows over the cell
    relation (bounded by the lang x source domain)."""
    parts = []
    prev = "w0"
    for r in range(1, rounds + 1):
        parts.append(
            f"r{r}a AS (SELECT lang, source, n_tokens,\n"
            f"  CAST({prev} * t_row // SUM({prev}) OVER (PARTITION BY lang)"
            f" AS BIGINT) AS w, t_row, t_col, w0 FROM {'cells' if r == 1 else f'r{r-1}b'})"
        )
        parts.append(
            f"r{r}b AS (SELECT lang, source, n_tokens,\n"
            f"  CAST(w * t_col // SUM(w) OVER (PARTITION BY source)"
            f" AS BIGINT) AS {'w' + str(r)}, t_row, t_col, w0 FROM r{r}a)"
        )
        prev = f"w{r}"
    return ",\n".join(parts)


@register(
    "ipf_raking_weights",
    ops="EXT-mixture-ipf,A1,W1 (iterative proportional fitting)",
    doc="IPF / raking mixture weights: fit the (lang x source) token-share "
    "matrix to UNIFORM lang and source marginals by three unrolled "
    "row-scale / column-scale rounds — the survey-statistics raking "
    "estimator, used here to derive per-cell sampling weights that "
    "simultaneously balance languages and sources. Shares live on an "
    "exact pp10m integer grid (floor divisions only, so every round is "
    "bit-identical cross-engine and products never leave int64 at any "
    "corpus size); the corpus is scanned ONCE for token counts, then "
    "every round is a window pass over the domain-bounded cell matrix. "
    "Reports per cell the raw share, the raked weight, and the "
    "resampling ratio in ppm.",
    oracle=f"""
WITH tok AS (
  SELECT lang, source,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY lang, source
),
par AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS grand,
         CAST({_IPF_GRID} // COUNT(DISTINCT lang) AS BIGINT) AS t_row,
         CAST({_IPF_GRID} // COUNT(DISTINCT source) AS BIGINT) AS t_col
  FROM tok
),
cells AS (
  SELECT t.lang, t.source, t.n_tokens,
         CAST(t.n_tokens * {_IPF_GRID} // p.grand AS BIGINT) AS w0,
         p.t_row, p.t_col
  FROM tok t, par p
),
{_ipf_ctes(_IPF_ROUNDS)}
SELECT lang, source, n_tokens,
       CAST(w0 AS BIGINT) AS share_pp10m,
       CAST(w{_IPF_ROUNDS} AS BIGINT) AS rake_pp10m,
       CAST(w{_IPF_ROUNDS} * 1000000 // GREATEST(w0, 1) AS BIGINT)
         AS ratio_ppm
FROM r{_IPF_ROUNDS}b
ORDER BY lang, source
""",
)
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.groupBy("lang", "source").agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("bigint")
        .alias("n_tokens")
    )
    par = tok.agg(
        F.sum("n_tokens").cast("bigint").alias("grand"),
        F.expr(f"CAST({_IPF_GRID} div count(DISTINCT lang) AS BIGINT)").alias(
            "t_row"
        ),
        F.expr(
            f"CAST({_IPF_GRID} div count(DISTINCT source) AS BIGINT)"
        ).alias("t_col"),
    )
    cells = tok.join(F.broadcast(par), F.lit(True)).select(
        "lang",
        "source",
        "n_tokens",
        F.expr(f"CAST(n_tokens * {_IPF_GRID} div grand AS BIGINT)").alias("w0"),
        "t_row",
        "t_col",
    )
    w_lang = Window.partitionBy("lang")
    w_src = Window.partitionBy("source")
    cur = cells.withColumn("w", F.col("w0"))
    for _ in range(_IPF_ROUNDS):
        cur = (
            cur.withColumn("rs", F.sum("w").over(w_lang))
            .withColumn("w", F.expr("CAST(w * t_row div rs AS BIGINT)"))
            .drop("rs")
            .withColumn("cs", F.sum("w").over(w_src))
            .withColumn("w", F.expr("CAST(w * t_col div cs AS BIGINT)"))
            .drop("cs")
        )
    return cur.select(
        "lang",
        "source",
        "n_tokens",
        F.col("w0").cast("bigint").alias("share_pp10m"),
        F.col("w").cast("bigint").alias("rake_pp10m"),
        F.expr("CAST(w * 1000000 div GREATEST(w0, 1) AS BIGINT)").alias(
            "ratio_ppm"
        ),
    ).orderBy("lang", "source")


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (round 10)
# ---------------------------------------------------------------------------

_DRM_ROUNDS = 3
_DRM_ETA_PPM = 500_000  # multiplicative-weights step size (0.5 on ppm grid)
_DRM_SMOOTH_PPM = 100_000  # uniform smoothing mix (0.2 in the paper; 0.1 here)


def _doremi_ctes(rounds: int) -> str:
    """Unrolled multiplicative-weights rounds over the domain-grain
    relation: boost ∝ excess loss, renormalize to the ppm simplex, then
    mix with uniform — all floor-division integer ops."""
    parts = []
    prev = "w0"
    for r in range(1, rounds + 1):
        parts.append(
            f"m{r} AS (SELECT source, n_tokens, loss_ppm, excess_ppm, w0, k,\n"
            f"  CAST({prev} * (1000000 + ({_DRM_ETA_PPM} * excess_ppm)"
            f" // 1000000) // 1000000 AS BIGINT) AS raw"
            f"{', ' + prev if r > 1 else ''}"
            f" FROM {'dom' if r == 1 else f'n{r-1}'})"
        )
        parts.append(
            f"n{r} AS (SELECT source, n_tokens, loss_ppm, excess_ppm, w0, k,\n"
            f"  CAST((1000000 - {_DRM_SMOOTH_PPM})"
            f" * (raw * 1000000 // SUM(raw) OVER ()) // 1000000\n"
            f"  + ({_DRM_SMOOTH_PPM} * (1000000 // k)) // 1000000"
            f" AS BIGINT) AS w{r} FROM m{r})"
        )
        prev = f"w{r}"
    return ",\n".join(parts)


@register(
    "doremi_domain_reweight",
    ops="EXT-mixture-doremi,A1,W1 (multiplicative-weights domain reweighting)",
    doc="DoReMi-shaped domain reweighting (Xie et al. 2023, NeurIPS): "
    f"{_DRM_ROUNDS} multiplicative-weights rounds boost each source's "
    "mixture weight proportionally to its EXCESS LOSS over the corpus "
    "baseline, renormalize onto the ppm simplex, and mix with the "
    "uniform distribution (smoothing) — the Group-DRO update the paper "
    "runs alongside proxy-model training, here with a deterministic "
    "static loss proxy (token-repetition rate: 1e6 - distinct/total "
    "tokens in ppm, an exact-integer stand-in for the reference-model "
    "excess log-loss). Linear 1 + eta*excess boost instead of exp() "
    "because libm exp is not cross-engine bit-stable; every update is "
    "floor-division integer arithmetic on the ppm grid, so any engine "
    "replays it exactly. One corpus scan builds the domain aggregates; "
    "every round is a window pass over the domain-grain (<= #sources) "
    "relation.",
    oracle=f"""
WITH tok AS (
  SELECT source,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
              AS BIGINT) AS n_tokens,
         CAST(SUM(len(list_distinct(regexp_split_to_array(trim(text),
              '\\s+')))) AS BIGINT) AS n_distinct
  FROM documents GROUP BY source
),
gstat AS (
  SELECT CAST(1000000 - SUM(n_distinct) * 1000000 // SUM(n_tokens)
              AS BIGINT) AS base_ppm,
         CAST(COUNT(1) AS BIGINT) AS k
  FROM tok
),
dom AS (
  SELECT t.source, t.n_tokens,
         CAST(1000000 - t.n_distinct * 1000000 // t.n_tokens AS BIGINT)
           AS loss_ppm,
         GREATEST(CAST(1000000 - t.n_distinct * 1000000 // t.n_tokens
                       AS BIGINT) - g.base_ppm, 0) AS excess_ppm,
         CAST(1000000 // g.k AS BIGINT) AS w0, g.k
  FROM tok t, gstat g
),
{_doremi_ctes(_DRM_ROUNDS)}
SELECT source, n_tokens, loss_ppm, excess_ppm,
       w0 AS w0_ppm, w{_DRM_ROUNDS} AS w_final_ppm,
       CAST(w{_DRM_ROUNDS} * 1000000 // GREATEST(w0, 1) AS BIGINT)
         AS boost_ppm,
       CAST(RANK() OVER (ORDER BY w{_DRM_ROUNDS} DESC, source ASC) AS INT)
         AS rank
FROM n{_DRM_ROUNDS}
ORDER BY source
""",
)
def doremi_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim("text"), r"\s+")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(toks)).cast("bigint").alias("n_tokens"),
        F.sum(F.size(F.array_distinct(toks))).cast("bigint").alias("n_distinct"),
    )
    glob = tok.agg(
        F.expr(
            "CAST(1000000 - sum(n_distinct) * 1000000 div sum(n_tokens)"
            " AS BIGINT)"
        ).alias("base_ppm"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    dom = tok.join(F.broadcast(glob), F.lit(True)).select(
        "source",
        "n_tokens",
        F.expr("CAST(1000000 - n_distinct * 1000000 div n_tokens AS BIGINT)")
        .alias("loss_ppm"),
        F.greatest(
            F.expr(
                "CAST(1000000 - n_distinct * 1000000 div n_tokens AS BIGINT)"
            )
            - F.col("base_ppm"),
            F.lit(0).cast("bigint"),
        ).alias("excess_ppm"),
        F.expr("CAST(1000000 div k AS BIGINT)").alias("w0"),
        "k",
    )
    # Unpartitioned window over the domain-grain relation: bounded at
    # #sources rows at any corpus scale (same argument as the UniMax
    # waterfill below — mixture.py is on the reviewed allowlist).
    cur = dom.withColumn("w", F.col("w0"))
    for _ in range(_DRM_ROUNDS):
        cur = (
            cur.withColumn(
                "raw",
                F.expr(
                    f"CAST(w * (1000000 + ({_DRM_ETA_PPM} * excess_ppm)"
                    " div 1000000) div 1000000 AS BIGINT)"
                ),
            )
            .withColumn(
                "w",
                F.expr(
                    f"CAST((1000000 - {_DRM_SMOOTH_PPM})"
                    " * (raw * 1000000 div SUM(raw) OVER ()) div 1000000"
                    f" + ({_DRM_SMOOTH_PPM} * (1000000 div k)) div 1000000"
                    " AS BIGINT)"
                ),
            )
            .drop("raw")
        )
    return cur.select(
        "source",
        "n_tokens",
        "loss_ppm",
        "excess_ppm",
        F.col("w0").cast("bigint").alias("w0_ppm"),
        F.col("w").cast("bigint").alias("w_final_ppm"),
        F.expr("CAST(w * 1000000 div GREATEST(w0, 1) AS BIGINT)").alias(
            "boost_ppm"
        ),
        F.rank()
        .over(Window.orderBy(F.desc("w"), F.asc("source")))
        .cast("int")
        .alias("rank"),
    ).orderBy("source")
