"""Corpus importance selection and key-skew auditing.

* ``dsir_importance_select`` — DSIR-shaped data selection (Xie et al.
  2023, "Data Selection for Language Models via Importance Resampling"):
  hash token features into a fixed bucket domain, contrast a TARGET
  distribution (here: ``lang = 'en'`` documents) against the RAW corpus,
  score each document by the sum of its tokens' target-vs-raw contrast,
  and keep the top-k. Published DSIR uses a log-probability ratio; here
  the per-bucket score is an integer rate contrast on a parts-per-million
  grid (``floor(cnt_t*1e6/T) - floor(cnt_r*1e6/R)``) so the whole
  selection is bit-exact cross-engine — ``log`` differs in the last ulp
  between libm implementations and would make top-k boundaries flaky.

* ``key_skew_profile`` — the partition-skew audit a shuffle-heavy job
  needs before it runs: per-key counts of a fact foreign key, the top-10
  hottest keys with parts-per-million share, and the global amplification
  factor ``max_cnt * n_keys / total`` (how much slower the hottest
  reducer is than the average one). This is the measurement side of the
  salting/AQE-skew mitigations in ``operators/joins.py``.

Reference scope note: the reference (uwe-uffuchs/formula-1) has no
data-selection surface; extension operators per SURVEY.md §2's "beyond
the reference" training-data-pipeline list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.dedup import md5_int32
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import fan_out, load_table

_N_BUCKETS = 1024
_PPM = 1_000_000
_TOP_K = 50


@register(
    "dsir_importance_select",
    ops="EXT-dsir-selection,A1,J1,O3 (hashed-feature importance resampling)",
    doc="DSIR-shaped target-vs-raw document selection: md5-hashed token "
    "buckets (1024), per-bucket integer rate contrast in ppm "
    "(deterministic stand-in for the published log-ratio), per-doc score "
    "= sum of its tokens' bucket scores, ranked by per-token mean "
    "contrast (length-normalized), top-50. One "
    "explode pass feeds both bucket histograms (conditional agg); the "
    "1024-row score table broadcasts back onto the exploded tokens — no "
    "full-corpus shuffle beyond the per-doc sum.",
    oracle=f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
  FROM documents
),
bt AS MATERIALIZED (
  SELECT ('0x' || substr(md5(t), 1, 8))::BIGINT % {_N_BUCKETS} AS bucket,
         doc_id, lang
  FROM tok
),
hist AS (
  SELECT bucket,
         CAST(COUNT(1) AS BIGINT) AS cnt_r,
         CAST(COUNT(1) FILTER (WHERE lang = 'en') AS BIGINT) AS cnt_t
  FROM bt GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(cnt_r) AS BIGINT) AS tot_r,
         CAST(SUM(cnt_t) AS BIGINT) AS tot_t
  FROM hist
),
score AS (
  SELECT bucket,
         (cnt_t * {_PPM}) // (SELECT tot_t FROM tot)
         - (cnt_r * {_PPM}) // (SELECT tot_r FROM tot) AS s
  FROM hist
),
doc_score AS (
  SELECT b.doc_id,
         any_value(b.lang) AS lang,
         CAST(COUNT(1) AS BIGINT) AS n_toks,
         CAST(SUM(s.s) AS BIGINT) AS score_ppm,
         CAST(SUM(s.s) // COUNT(1) AS BIGINT) AS mean_contrast_ppm
  FROM bt b JOIN score s ON s.bucket = b.bucket
  GROUP BY b.doc_id
)
SELECT doc_id, lang, n_toks, score_ppm, mean_contrast_ppm
FROM doc_score
ORDER BY mean_contrast_ppm DESC, doc_id ASC
LIMIT {_TOP_K}
""",
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    bt = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
    ).select(
        "doc_id", "lang", F.pmod(md5_int32(F.col("t")), F.lit(_N_BUCKETS)).alias("bucket")
    )
    hist = bt.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt_r"),
        F.count_if(F.col("lang") == "en").alias("cnt_t"),
    )
    # 1024-row histogram → single-row totals → per-bucket ppm contrast.
    tot = hist.agg(
        F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t")
    )
    score = (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.expr(
                f"(cnt_t * {_PPM}) div tot_t - (cnt_r * {_PPM}) div tot_r"
            ).alias("s"),
        )
    )
    doc_score = (
        bt.join(F.broadcast(score), "bucket")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("s").alias("score_ppm"),
        )
        # Length normalization: rank by PER-TOKEN contrast, not the raw
        # sum — otherwise long documents dominate on volume alone. Both
        # engines truncate integer division toward zero, so the rank key
        # is exact for negative contrasts too.
        .withColumn("mean_contrast_ppm", F.expr("score_ppm div n_toks"))
    )
    return (
        doc_score.orderBy(F.desc("mean_contrast_ppm"), F.asc("doc_id"))
        .limit(_TOP_K)
        .select("doc_id", "lang", "n_toks", "score_ppm", "mean_contrast_ppm")
    )


@register(
    "key_skew_profile",
    ops="EXT-skew-audit,A1,W2 (hot-key shuffle profiler)",
    doc="Shuffle-skew audit of lineitem's supplier key: per-key counts "
    "(map-side combined), top-10 hottest keys with ppm share, and the "
    "global amplification factor max_cnt*n_keys/total (ppm grid) that "
    "predicts reducer imbalance. Windows run over the post-agg KEY "
    "relation (|keys| rows), never over the fact table.",
    oracle=f"""
WITH counts AS MATERIALIZED (
  SELECT l_suppkey AS key, CAST(COUNT(1) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_suppkey
),
gstats AS (
  SELECT CAST(COUNT(1) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         quantile_cont(cnt, 0.5) AS p50_cnt
  FROM counts
)
SELECT CAST(r.rk AS INT) AS rank, r.key, r.cnt,
       (r.cnt * {_PPM}) // g.total AS share_ppm,
       g.n_keys, g.total, g.max_cnt, g.p50_cnt,
       (g.max_cnt * g.n_keys * {_PPM}) // g.total AS amplification_ppm
FROM (
  SELECT key, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC) AS rk
  FROM counts
) r, gstats g
WHERE r.rk <= 10
ORDER BY r.rk
""",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    glob = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile(cnt, 0.5)").alias("p50_cnt"),
    )
    # Key-grain relation (scales with the corpus): two-phase top-10;
    # (cnt, key) is a total order so rank == row_number.
    from formula_1_spark.operators.windows import two_phase_global_topk

    top = two_phase_global_topk(
        counts, [F.desc("cnt"), F.asc("key")], 10, alias="rk",
        unique_order=True,
    )
    return (
        top.crossJoin(F.broadcast(glob))
        .select(
            F.col("rk").cast("int").alias("rank"),
            "key",
            "cnt",
            F.expr(f"(cnt * {_PPM}) div total").alias("share_ppm"),
            "n_keys",
            "total",
            "max_cnt",
            "p50_cnt",
            F.expr(f"(max_cnt * n_keys * {_PPM}) div total").alias(
                "amplification_ppm"
            ),
        )
        .orderBy("rank")
    )
