"""Dedup-pipeline tuning analytics: LSH band planning, SimHash ROC,
soft-dedup reweighting.

Round-9 additions to the dedup family. All three reuse the memoized
shared relations from ``queries.dedup`` (tokens → shingles → rare-shingle
candidate index → exact-Jaccard verification), so each query adds only
tiny-relation work on top of the family's one corpus pass.

Determinism notes (cross-engine bit-exactness):

* The LSH S-curve ``P(s) = 1 - (1 - s^r)^b`` is evaluated with REPEATED
  SQUARING through named intermediate columns (never libm ``pow``, which
  is not guaranteed correctly rounded, and never inline expression
  nesting, which Catalyst's CollapseProject would blow up exponentially).
  Both engines run the SAME expression text over the same exact bin
  midpoints, so every double is bit-identical; expected counts are then
  floored to integer micros per bin BEFORE summation, so aggregate order
  cannot perturb the result.
* ROC counts are exact integers; rates are integer ppm divisions.

Reference scope: the reference (uwe-uffuchs/formula-1) has no dedup
surface; extension operators per SURVEY.md §2's "beyond the reference"
list (MinHash/LSH + SimHash tuning evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.queries.dedup import (
    _SHINGLES_CTE,
    _shared_loose_jaccard_pairs,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table

# (bands, rows_per_band) grid with bands * rows = 128 minhashes — the
# standard family of operating points for a 128-perm signature.
_BR_CONFIGS: tuple[tuple[int, int], ...] = (
    (64, 2),
    (32, 4),
    (16, 8),
    (8, 16),
    (4, 32),
)

# Shared verified-pair CTE: the loosest (>= 0.25) exact-Jaccard pass over
# the rare-shingle candidate index — same text as dedup_threshold_sweep.
_VERIFIED_CTES = f"""
{_SHINGLES_CTE},
posting AS (SELECT doc_id, unnest(sh) AS shingle FROM shf),
rare AS (
  SELECT shingle FROM posting GROUP BY shingle HAVING COUNT(1) <= 50
),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM posting p1
  JOIN rare r ON p1.shingle = r.shingle
  JOIN posting p2 ON p2.shingle = p1.shingle
  WHERE p1.doc_id < p2.doc_id
),
verified AS (
  SELECT c.a, c.b,
         len(list_intersect(sa.sh, sb.sh))
           / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) AS jaccard
  FROM cand c
  JOIN shf sa ON sa.doc_id = c.a
  JOIN shf sb ON sb.doc_id = c.b
  WHERE len(list_intersect(sa.sh, sb.sh))
          / (sa.n_sh + sb.n_sh - len(list_intersect(sa.sh, sb.sh))) >= 0.25
)
"""

# Stepwise S-curve evaluation: each (name, expr) adds one named column.
# The SAME snippets run in Spark (chained selectExpr) and DuckDB (chained
# CTEs), so the arithmetic is textually — hence bitwise — identical.
_SCURVE_STEPS: tuple[tuple[str, str], ...] = (
    ("s", "CAST(2 * bin + 1 AS DOUBLE) / 40.0"),
    ("s2", "s * s"),
    ("s4", "s2 * s2"),
    ("s8", "s4 * s4"),
    ("s16", "s8 * s8"),
    ("s32", "s16 * s16"),
    (
        "sr",
        "CASE rows_per_band WHEN 2 THEN s2 WHEN 4 THEN s4 WHEN 8 THEN s8 "
        "WHEN 16 THEN s16 WHEN 32 THEN s32 END",
    ),
    ("q", "1.0 - sr"),
    ("q2", "q * q"),
    ("q4", "q2 * q2"),
    ("q8", "q4 * q4"),
    ("q16", "q8 * q8"),
    ("q32", "q16 * q16"),
    ("q64", "q32 * q32"),
    (
        "qb",
        "CASE bands WHEN 4 THEN q4 WHEN 8 THEN q8 WHEN 16 THEN q16 "
        "WHEN 32 THEN q32 WHEN 64 THEN q64 END",
    ),
    ("p", "1.0 - qb"),
    ("p_micro", "CAST(floor(p * 1000000.0) AS BIGINT)"),
    ("miss_micro", "CAST(floor((1.0 - p) * 1000000.0) AS BIGINT)"),
)


def _scurve_sql_chain(base: str) -> str:
    """Chained CTEs applying each S-curve step to ``base``."""
    ctes, prev = [], base
    for i, (name, expr) in enumerate(_SCURVE_STEPS):
        cte = f"sc{i}"
        ctes.append(f"{cte} AS (SELECT *, {expr} AS {name} FROM {prev})")
        prev = cte
    return ",\n".join(ctes), prev


_SC_CTES, _SC_LAST = _scurve_sql_chain("combos")

_BAND_VALUES = ", ".join(f"({b}, {r})" for b, r in _BR_CONFIGS)


@register(
    "lsh_band_planning",
    ops="EXT-dedup-tuning,A1,A3 (LSH operating-point planner)",
    doc="MinHash-LSH band planner: measure the candidate-pair similarity "
    "histogram once (exact word-3-gram Jaccard over the shared "
    "rare-shingle index, loosest >= 0.25 verify, 0.05-wide bins), then "
    "score every (bands, rows_per_band) split of a 128-perm signature "
    "with the S-curve P(s) = 1-(1-s^r)^b evaluated at bin midpoints by "
    "repeated squaring (bit-exact cross-engine; no libm pow). Reports "
    "expected candidates, expected missed true dups (s >= 0.5) and "
    "expected false-positive candidates (s < 0.5) in integer micro-pairs "
    "— the standard evidence for picking the LSH operating point before "
    "a 100 TB run, priced from one cheap histogram instead of five full "
    "banding passes.",
    oracle=f"""
WITH {_VERIFIED_CTES},
hist AS (
  SELECT LEAST(CAST(floor(jaccard * 20) AS INTEGER), 19) AS bin,
         CAST(COUNT(1) AS BIGINT) AS n_pairs
  FROM verified GROUP BY 1
),
cfg AS (
  SELECT * FROM (VALUES {_BAND_VALUES}) AS t(bands, rows_per_band)
),
combos AS (SELECT h.bin, h.n_pairs, c.bands, c.rows_per_band FROM hist h, cfg c),
{_SC_CTES}
SELECT CAST(bands AS INTEGER) AS bands,
       CAST(rows_per_band AS INTEGER) AS rows_per_band,
       CAST(SUM(n_pairs) AS BIGINT) AS pairs_scored,
       CAST(SUM(n_pairs * p_micro) AS BIGINT) AS exp_candidates_micro,
       CAST(SUM(CASE WHEN bin >= 10 THEN n_pairs * miss_micro ELSE 0 END)
            AS BIGINT) AS exp_missed_dup_micro,
       CAST(SUM(CASE WHEN bin < 10 THEN n_pairs * p_micro ELSE 0 END)
            AS BIGINT) AS exp_fp_micro
FROM {_SC_LAST}
GROUP BY 1, 2
ORDER BY bands DESC
""",
)
def lsh_band_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    verified = _shared_loose_jaccard_pairs(spark, sf_dir)
    hist = (
        verified.select(
            F.least(F.floor(F.col("jaccard") * 20).cast("int"), F.lit(19)).alias(
                "bin"
            )
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    cfg = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("bands"), F.lit(r).alias("rows_per_band")
                    )
                    for b, r in _BR_CONFIGS
                ]
            )
        ).alias("c")
    ).select("c.bands", "c.rows_per_band")
    combos = hist.join(F.broadcast(cfg), F.lit(True))
    for name, expr in _SCURVE_STEPS:
        combos = combos.selectExpr("*", f"{expr} AS {name}")
    return (
        combos.groupBy("bands", "rows_per_band")
        .agg(
            F.sum("n_pairs").cast("bigint").alias("pairs_scored"),
            F.sum(F.col("n_pairs") * F.col("p_micro"))
            .cast("bigint")
            .alias("exp_candidates_micro"),
            F.sum(
                F.when(
                    F.col("bin") >= 10, F.col("n_pairs") * F.col("miss_micro")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("exp_missed_dup_micro"),
            F.sum(
                F.when(
                    F.col("bin") < 10, F.col("n_pairs") * F.col("p_micro")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("exp_fp_micro"),
        )
        .select(
            F.col("bands").cast("int").alias("bands"),
            F.col("rows_per_band").cast("int").alias("rows_per_band"),
            "pairs_scored",
            "exp_candidates_micro",
            "exp_missed_dup_micro",
            "exp_fp_micro",
        )
        .orderBy(F.desc("bands"))
    )


_ROC_THRESHOLDS = (0, 1, 2, 3, 4, 6, 8, 12)

# 60-bit SimHash signature CTEs — same text as the dedup_simhash oracle.
_SIG_CTES = """
tokr AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents
),
th AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tokr
),
bits AS (
  SELECT doc_id, j.j AS j,
         SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, (SELECT unnest(range(0, 60)) AS j) j
  GROUP BY doc_id, j.j
),
sig AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sig
  FROM bits GROUP BY doc_id
)
"""


@register(
    "simhash_hamming_roc",
    ops="EXT-dedup-tuning,A3,J4 (SimHash threshold ROC)",
    doc="SimHash operating-point ROC: over the loose-verified candidate "
    "population (exact Jaccard >= 0.25; ground truth = Jaccard >= 0.5), "
    "join each pair's 60-bit SimHash signatures and sweep the Hamming "
    "acceptance threshold, reporting exact TP/FP/FN/TN and integer-ppm "
    "precision/recall per threshold from ONE conditional-aggregate pass. "
    "The calibration evidence for choosing max_hamming before deploying "
    "SimHash as the cheap dedup pre-filter.",
    oracle=f"""
WITH {_VERIFIED_CTES},
{_SIG_CTES},
scored AS (
  SELECT v.jaccard >= 0.5 AS is_dup,
         CAST(bit_count(xor(sa.sig, sb.sig)) AS INTEGER) AS hamming
  FROM verified v
  JOIN sig sa ON sa.doc_id = v.a
  JOIN sig sb ON sb.doc_id = v.b
),
thr AS (
  SELECT unnest([{", ".join(str(t) for t in _ROC_THRESHOLDS)}]) AS max_hamming
),
counts AS (
  SELECT t.max_hamming,
         CAST(SUM(CASE WHEN s.is_dup AND s.hamming <= t.max_hamming
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN NOT s.is_dup AND s.hamming <= t.max_hamming
                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN s.is_dup AND s.hamming > t.max_hamming
                       THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN NOT s.is_dup AND s.hamming > t.max_hamming
                       THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored s, thr t
  GROUP BY t.max_hamming
)
SELECT CAST(max_hamming AS INTEGER) AS max_hamming, tp, fp, fn, tn,
       CAST(tp * 1000000 // GREATEST(tp + fp, 1) AS BIGINT) AS precision_ppm,
       CAST(tp * 1000000 // GREATEST(tp + fn, 1) AS BIGINT) AS recall_ppm
FROM counts
ORDER BY max_hamming
""",
)
def simhash_hamming_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.queries.dedup import _shared_simhash_sigs

    verified = _shared_loose_jaccard_pairs(spark, sf_dir)
    # Family-memoized signatures: this query reads the relation TWICE
    # (sig_a/sig_b joins) — with the checkpoint the per-token md5 +
    # 60-bit aggregate executes once per (session, sf_dir), not 2x here
    # plus once more in dedup_simhash.
    sigs = _shared_simhash_sigs(spark, sf_dir)
    scored = (
        verified.join(
            sigs.select(F.col("doc_id").alias("doc_id_1"), F.col("sig").alias("sig_a")),
            "doc_id_1",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_id_2"), F.col("sig").alias("sig_b")),
            "doc_id_2",
        )
        .select(
            (F.col("jaccard") >= 0.5).alias("is_dup"),
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
            .cast("int")
            .alias("hamming"),
        )
    )
    thr = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in _ROC_THRESHOLDS])
        ).alias("max_hamming")
    )
    counts = (
        scored.join(F.broadcast(thr), F.lit(True))
        .groupBy("max_hamming")
        .agg(
            F.sum(
                F.when(
                    F.col("is_dup") & (F.col("hamming") <= F.col("max_hamming")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when(
                    (~F.col("is_dup")) & (F.col("hamming") <= F.col("max_hamming")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(
                F.when(
                    F.col("is_dup") & (F.col("hamming") > F.col("max_hamming")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fn"),
            F.sum(
                F.when(
                    (~F.col("is_dup")) & (F.col("hamming") > F.col("max_hamming")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("tn"),
        )
    )
    return counts.select(
        F.col("max_hamming").cast("int").alias("max_hamming"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("CAST(tp * 1000000 div GREATEST(tp + fp, 1) AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.expr("CAST(tp * 1000000 div GREATEST(tp + fn, 1) AS BIGINT)").alias(
            "recall_ppm"
        ),
    ).orderBy("max_hamming")


@register(
    "soft_dedup_weights",
    ops="EXT-dedup-soft,A1,W1 (duplicate-aware reweighting)",
    doc="Soft dedup (SoftDeDup-style): instead of dropping duplicates, "
    "down-weight each document by 1/cluster_size over exact "
    "normalized-text fingerprint clusters (one window pass on the "
    "fingerprint key, no join-back). Per source: docs, raw tokens, "
    "soft-effective tokens (sum of n_tokens*1e6 div cluster_size, exact "
    "integer micros) and hard-dedup kept tokens (canonical = min doc_id) "
    "— the evidence for how much token mass reweighting preserves vs "
    "hard removal.",
    oracle="""
WITH base AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
),
w AS (
  SELECT source, n_tokens,
         CAST(COUNT(1) OVER (PARTITION BY fp) AS BIGINT) AS c,
         doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS is_canonical
  FROM base
)
SELECT source,
       CAST(COUNT(1) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM((n_tokens * 1000000) // c) AS BIGINT) AS soft_tokens_micro,
       CAST(SUM(CASE WHEN is_canonical THEN n_tokens ELSE 0 END) AS BIGINT)
         AS hard_kept_tokens
FROM w
GROUP BY source
ORDER BY source
""",
)
def soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("fp"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("fp")
    weighted = base.select(
        "source",
        "n_tokens",
        F.count(F.lit(1)).over(w).cast("bigint").alias("c"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            F.sum(F.expr("(n_tokens * 1000000) div c"))
            .cast("bigint")
            .alias("soft_tokens_micro"),
            F.sum(F.when(F.col("is_canonical"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("hard_kept_tokens"),
        )
        .orderBy("source")
    )
