"""URL/domain-level dedup keys — web-corpus canonicalization as Column math.

Web-scale training corpora dedup at THREE grains: content (MinHash et al.,
``queries/dedup.py``), semantic (``operators/similarity.py``), and URL —
the cheapest and always-first pass: normalize each document's source URL
(scheme/case/www/query-tracking/trailing-slash noise) and keep one
document per canonical URL. This module implements the URL grain.

The ``documents`` table carries no URL column, so a deterministic synthetic
URL is derived from (doc_id, source, lang) with exactly the noise classes a
crawler sees — mixed scheme, ``WWW.`` casing, ``?utm_*`` tracking params,
trailing slashes — and several doc_ids intentionally collide onto one
canonical URL (path = doc_id mod 40). The ORACLE builds the identical URLs
and normalizes them independently in SQL, so the normalizer's semantics
(not just its round-trip) are what's checked.

Scale notes (100 TB): normalization is pure per-row Column work inside
whole-stage codegen (three regexp_replace + lower); the dedup is a
two-level aggregate — (domain, canonical_url) grain, then domain grain —
i.e. two shuffles whose keys are every bit as spreadable as the corpus;
no windows over the fact stream, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import fan_out, load_table


def normalize_url(url: Column) -> Column:
    """Canonical URL key: strip scheme, lowercase, strip leading ``www.``,
    drop query/fragment, drop trailing slash. Mirrored 1:1 by the SQL in
    :func:`url_dedup_canonical`'s oracle (Java and RE2 regex agree on
    these anchored patterns)."""
    u = F.regexp_replace(url, "^https?://", "")
    u = F.lower(u)
    u = F.regexp_replace(u, "^www\\.", "")
    u = F.regexp_replace(u, "[?#].*$", "")
    return F.regexp_replace(u, "/$", "")


def synthetic_url(doc_id: Column, source: Column, lang: Column) -> Column:
    """Deterministic noisy URL for a document — the fixture generator."""
    return F.concat(
        F.when(doc_id % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(doc_id % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        source,
        F.lit(".example.com/"),
        lang,
        F.lit("/page-"),
        (doc_id % 40).cast("string"),
        F.when(doc_id % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            doc_id % 5 == 0,
            F.concat(F.lit("?utm_source=feed&ref="), doc_id.cast("string")),
        ).otherwise(F.lit("")),
    )


_URL_SQL = """
  (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
  || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
  || source || '.example.com/' || lang || '/page-' || (doc_id % 40)
  || (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END)
  || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&ref=' || doc_id
      ELSE '' END)
"""


@register(
    "url_dedup_canonical",
    ops="EXT-url-dedup,P6,A1,A5 (URL canonicalization + domain rollup)",
    doc="URL-grain dedup: synthesize each doc's noisy source URL "
    "(scheme/WWW-case/utm-params/trailing-slash), normalize to a "
    "canonical key (codegen regexp chain), keep the min doc_id per "
    "canonical URL, and roll up per domain: docs seen, canonical URLs, "
    "duplicate docs removed, and the worst per-URL pile-up. Two "
    "aggregates — URL grain then domain grain; the oracle rebuilds and "
    "re-normalizes the same URLs independently in SQL.",
    oracle=f"""
WITH urls AS (
  SELECT doc_id, {_URL_SQL} AS url FROM documents
),
norm AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               lower(regexp_replace(url, '^https?://', '')),
               '^www\\.', ''),
             '[?#].*$', ''),
           '/$', '') AS canon
  FROM urls
),
per_url AS (
  SELECT regexp_extract(canon, '^([^/]+)', 1) AS domain,
         canon,
         CAST(COUNT(1) AS BIGINT) AS n_docs,
         CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
  FROM norm GROUP BY domain, canon
)
SELECT domain,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(COUNT(1) AS BIGINT) AS n_urls,
       CAST(SUM(n_docs) - COUNT(1) AS BIGINT) AS n_dup_docs,
       CAST(MAX(n_docs) AS BIGINT) AS max_docs_per_url,
       CAST(MIN(canonical_doc_id) AS BIGINT) AS first_doc_id
FROM per_url
GROUP BY domain
ORDER BY domain
""",
)
def url_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    canon = docs.select(
        "doc_id",
        normalize_url(
            synthetic_url(F.col("doc_id"), F.col("source"), F.col("lang"))
        ).alias("canon"),
    )
    per_url = (
        canon.select(
            F.regexp_extract("canon", "^([^/]+)", 1).alias("domain"),
            "canon",
            "doc_id",
        )
        .groupBy("domain", "canon")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )
    return (
        per_url.groupBy("domain")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.count(F.lit(1)).alias("n_urls"),
            (F.sum("n_docs") - F.count(F.lit(1))).alias("n_dup_docs"),
            F.max("n_docs").alias("max_docs_per_url"),
            F.min("canonical_doc_id").alias("first_doc_id"),
        )
        .orderBy("domain")
    )
