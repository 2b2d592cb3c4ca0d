"""Training-data pipeline operators over ``documents``: overlapping
token-window chunking, PII scrubbing, deterministic hash-based dataset
splitting — the remaining staples of an LLM data pipeline, each
oracle-checked.

Scale notes: chunking is a pure expression + explode (rows scale with
chunks, no shuffle); scrubbing is chained regexp_replace inside codegen;
hash splitting replaces ``.sample()`` randomness with a content-stable
md5 bucket — reproducible across runs, engines and partitionings, which
is what makes dataset splits auditable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.functions.text import tokens
from formula_1_spark.queries.registry import REGISTRY, register
from formula_1_spark.sources.tables import load_table

CHUNK = 40  # tokens per chunk
STRIDE = 30  # overlap = CHUNK - STRIDE


@register(
    "doc_chunking",
    ops="EXT-chunking,P3",
    doc=f"Overlapping token-window chunking ({CHUNK}-token windows, "
    f"stride {STRIDE}): one row per training sample.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id, s.s AS chunk_start,
         array_to_string(list_slice(t, s.s + 1, s.s + {CHUNK}), ' ') AS chunk_text
  FROM toks,
       (SELECT unnest(range(0, 100000, {STRIDE})) AS s) s
  WHERE s.s < len(t)
)
SELECT doc_id, CAST(chunk_start AS INTEGER) AS chunk_start, chunk_text,
       CAST(len(regexp_split_to_array(chunk_text, '\\s+')) AS INTEGER) AS chunk_tokens
FROM chunks
""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    # chunk starts: 0, STRIDE, 2*STRIDE, ... while start < n_tokens
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - 1, F.lit(0)),
        F.lit(STRIDE),
    )
    chunked = docs.select(
        "doc_id", toks.alias("t"), F.explode(starts).alias("chunk_start")
    ).filter(F.col("chunk_start") < F.size("t"))
    with_text = chunked.select(
        "doc_id",
        "chunk_start",
        F.concat_ws(" ", F.slice("t", F.col("chunk_start") + 1, CHUNK)).alias(
            "chunk_text"
        ),
    )
    return with_text.withColumn(
        "chunk_tokens", F.size(F.split("chunk_text", r"\s+"))
    )


def text_scrub_pii_columns(text_col: str = "text") -> list:
    """Reusable scrub projection: scrubbed text + changed flag."""
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.col(text_col), r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"
            ),
            r"https?://[^ ]+",
            "<URL>",
        ),
        r"[0-9]{6,}",
        "<NUM>",
    )
    return [
        scrub.alias("scrubbed"),
        (scrub != F.col(text_col)).alias("was_scrubbed"),
    ]


@register(
    "text_scrub_pii",
    ops="EXT-scrub,F1",
    doc="Chained regexp scrubbing: emails, URLs, long digit runs replaced "
    "with typed placeholder tokens; flags rows that changed.",
    oracle="""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
           'https?://[^ ]+', '<URL>', 'g'),
         '[0-9]{6,}', '<NUM>', 'g') AS scrubbed,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
           'https?://[^ ]+', '<URL>', 'g'),
         '[0-9]{6,}', '<NUM>', 'g') <> text AS was_scrubbed
FROM documents
""",
)
def text_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", *text_scrub_pii_columns())


@register(
    "dataset_hash_split",
    ops="EXT-split,A5",
    doc="Deterministic train/val/test split: md5(doc_id) bucket mod 10 → "
    "8/1/1 — content-stable, engine-independent, auditable (no RNG).",
    oracle="""
WITH bucketed AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 AS b
  FROM documents
),
tagged AS (
  SELECT doc_id, lang,
         CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END
           AS split
  FROM bucketed
)
SELECT split, lang, COUNT(1) AS n_docs
FROM tagged GROUP BY split, lang
""",
)
def dataset_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
    )
    tagged = docs.select(
        "doc_id",
        "lang",
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test").alias("split"),
    )
    return tagged.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "training_data_funnel",
    ops="EXT-funnel,P7,A1,J-semi (quality -> dedup -> sample composition)",
    doc="The end-to-end curation funnel in ONE declarative DAG: quality "
    "gate (score > 0.45) -> exact-dedup canonical-only gate (doc is the "
    "min-id of its fingerprint group) -> language-stratified hash sample "
    "(en 0.5 / es 0.25 / de 0.125 / und 0.05). Catalyst fuses the three "
    "gates into a single scan + one semi-join; every stage reuses an "
    "already-oracle-proven primitive, and the composition itself is "
    "hash-checked here.",
    oracle=None,  # filled below after the imports resolve
)
def training_data_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.text import fingerprint, lang_guess, quality_score
    from formula_1_spark.operators.sampling import hash_uniform, stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    prof = docs.select(
        "doc_id",
        "text",
        lang_guess("text").alias("lang_guess"),
        quality_score("text").alias("quality"),
    ).filter(F.col("quality") > 0.45)
    canon = (
        docs.select(fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    kept = prof.join(
        canon, prof.doc_id == canon.canonical_id, "left_semi"
    )
    sampled = stratified_sample(
        kept,
        F.col("lang_guess"),
        {"en": 0.5, "es": 0.25, "de": 0.125, "und": 0.05},
        key_col="doc_id",
        salt="strat",
    )
    return sampled.select(
        "doc_id",
        "lang_guess",
        "quality",
        hash_uniform(F.col("doc_id"), "strat").alias("u"),
    )


def _funnel_oracle() -> str:
    from formula_1_spark.operators.sampling import hash_uniform_sql
    from formula_1_spark.queries.text_analysis import _LANG_CASE

    rate_case = (
        "CASE WHEN lang_guess = 'en' THEN 0.5 WHEN lang_guess = 'es' THEN 0.25 "
        "WHEN lang_guess = 'de' THEN 0.125 WHEN lang_guess = 'und' THEN 0.05 "
        "ELSE 0.0 END"
    )
    quality_sql = """
       len(regexp_extract_all(text, '\\b(the|and|of|to|a|in|is)\\b'))
         / len(regexp_split_to_array(trim(text), '\\s+')) * 0.4
       + least(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.3
       + (1.0 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
              / length(text)) * 0.3"""
    return f"""
WITH prof AS (
  SELECT doc_id, text, {_LANG_CASE} AS lang_guess, {quality_sql} AS quality
  FROM documents
),
canon AS (
  SELECT MIN(doc_id) AS canonical_id
  FROM (SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents)
  GROUP BY fp
)
SELECT doc_id, lang_guess, quality,
       {hash_uniform_sql("doc_id", "strat")} AS u
FROM prof
WHERE quality > 0.45
  AND doc_id IN (SELECT canonical_id FROM canon)
  AND {hash_uniform_sql("doc_id", "strat")} < {rate_case}
"""


REGISTRY["training_data_funnel"].oracle = _funnel_oracle()


@register(
    "training_epoch_shuffle",
    ops="EXT-epoch-shuffle,W2 (distributed global enumeration)",
    doc="Deterministic training-epoch shuffle: every document gets a "
    "unique 1-based position for epoch 7, ordered by "
    "md5('epoch7:' || doc_id) — content-stable, so the training order "
    "is reproducible across runs, engines and partitionings. The rank "
    "is computed by distributed_global_enumerate (range-partition -> "
    "per-partition row_number + prefix-sum of partition counts), NOT a "
    "single-partition window — at 100 TB all rows never converge on "
    "one task; only #partitions longs reach the driver.",
    oracle="""
SELECT doc_id,
       md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
       CAST(ROW_NUMBER() OVER (
         ORDER BY md5('epoch7:' || CAST(doc_id AS VARCHAR))) AS BIGINT)
         AS epoch_pos
FROM documents
""",
)
def training_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import distributed_global_enumerate

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    return distributed_global_enumerate(
        docs, [F.col("shuffle_key")], alias="epoch_pos"
    )


@register(
    "grouped_kfold_split",
    ops="EXT-groupkfold,A1,W2 (leakage-safe group-aware fold assignment)",
    doc="Group-aware k-fold assignment over events: every USER (the "
    "group) lands wholly in one of 5 folds via the salted-md5 hash — no "
    "user's events can straddle train and eval, the group-level leakage "
    "guarantee GroupKFold gives. Emits the fold-balance audit: users, "
    "events, event share in ppm, plus the relative imbalance of the "
    "heaviest fold. Content-stable hash -> identical folds on any "
    "engine, run, or partitioning.",
    oracle="""
WITH ev AS (
  SELECT user_id,
         ('0x' || substr(md5('gkf5' || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % 5 AS fold
  FROM events
),
per_fold AS (
  SELECT fold,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(COUNT(1) AS BIGINT) AS n_events
  FROM ev GROUP BY fold
),
tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total,
               CAST(MAX(n_events) AS BIGINT) AS mx FROM per_fold)
SELECT p.fold, p.n_users, p.n_events,
       (p.n_events * 1000000) // t.total AS share_ppm,
       (t.mx * 5 * 1000000) // t.total AS max_fold_amplification_ppm
FROM per_fold p, tot t
""",
)
def grouped_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("user_id")
    # The fold is a PURE function of the group key, so it is computed
    # per-row in codegen — no distinct-users relation, no join, nothing
    # to broadcast. This is what makes the split free at 100 TB.
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("gkf5"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 5
    ).alias("fold")
    ev = events.select("user_id", fold)
    per_fold = ev.groupBy("fold").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    tot = per_fold.agg(
        F.sum("n_events").alias("total"), F.max("n_events").alias("mx")
    )
    return per_fold.crossJoin(F.broadcast(tot)).select(
        "fold",
        "n_users",
        "n_events",
        F.expr("(n_events * 1000000) div total").alias("share_ppm"),
        F.expr("(mx * 5 * 1000000) div total").alias(
            "max_fold_amplification_ppm"
        ),
    )


@register(
    "temporal_split_audit",
    ops="EXT-temporal-split,A1,J1 (time-cutoff split with leakage audit)",
    doc="Time-based train/test split audit: cutoff = min_ts + 80% of the "
    "observed span (integer micros arithmetic — no sort, no percentile "
    "estimate), events tagged train (< cutoff) / test (>= cutoff), and "
    "per split: events, distinct users, share ppm — plus the "
    "cross-split USER overlap (the population a time split deliberately "
    "allows but a user-level split would forbid; compare "
    "grouped_kfold_split). Scalar bounds broadcast; one shuffle per "
    "distinct-count.",
    oracle="""
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
),
tagged AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) < b.mn + ((b.mx - b.mn) * 4) // 5
              THEN 'train' ELSE 'test' END AS split
  FROM events, bounds b
),
per_split AS (
  SELECT split,
         CAST(COUNT(1) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM tagged GROUP BY split
),
ov AS (
  SELECT CAST(COUNT(1) AS BIGINT) AS overlap_users FROM (
    SELECT user_id FROM tagged WHERE split = 'train'
    INTERSECT
    SELECT user_id FROM tagged WHERE split = 'test'
  )
),
tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM per_split)
SELECT p.split, p.n_events, p.n_users,
       (p.n_events * 1000000) // t.total AS share_ppm,
       o.overlap_users
FROM per_split p, ov o, tot t
""",
)
def temporal_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    bounds = events.agg(F.min("us").alias("mn"), F.max("us").alias("mx"))
    tagged = events.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.when(
            F.col("us") < F.col("mn") + F.expr("((mx - mn) * 4) div 5"),
            F.lit("train"),
        )
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    per_split = tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    ov = (
        tagged.filter(F.col("split") == "train")
        .select("user_id")
        .intersect(tagged.filter(F.col("split") == "test").select("user_id"))
        .agg(F.count(F.lit(1)).alias("overlap_users"))
    )
    tot = per_split.agg(F.sum("n_events").alias("total"))
    return (
        per_split.crossJoin(F.broadcast(ov))
        .crossJoin(F.broadcast(tot))
        .select(
            "split",
            "n_events",
            "n_users",
            F.expr("(n_events * 1000000) div total").alias("share_ppm"),
            "overlap_users",
        )
    )


# ---------------------------------------------------------------------------
# Rendezvous (HRW) shard assignment (round 10)
# ---------------------------------------------------------------------------

_HRW_SHARDS = 8


def _hrw_hash_sql(key: str, shard: str) -> str:
    return (
        f"('0x' || substr(md5(CAST({key} AS VARCHAR) || ':' ||"
        f" CAST({shard} AS VARCHAR)), 1, 15))::BIGINT"
    )


@register(
    "rendezvous_shard_assignment",
    ops="EXT-sharding-hrw,A1,J1 (highest-random-weight placement)",
    doc=f"Rendezvous / highest-random-weight sharding (Thaler & Ravishankar "
    f"1998): each doc lands on argmax over {_HRW_SHARDS} shards of "
    "md5(doc:shard) — the placement scheme whose rebalance cost when a "
    "shard is ADDED is 1/(n+1) (only docs whose new shard wins the "
    "argmax move), vs ~n/(n+1) for mod-hashing. The query measures both "
    "properties on the corpus: per-shard occupancy (ppm of uniform) and "
    "the ppm of docs that would move when shard 8 joins — expected "
    "~111,111 (1/9). One bounded x9 explode + a per-doc arg_max "
    "aggregate (map-side combinable); no shuffle wider than doc grain.",
    oracle=f"""
WITH ex AS (
  SELECT doc_id, u.s AS s, {_hrw_hash_sql("doc_id", "u.s")} AS h
  FROM documents, unnest(range(0, {_HRW_SHARDS + 1})) AS u(s)
),
assigned AS (
  SELECT doc_id,
         arg_max(CASE WHEN s < {_HRW_SHARDS} THEN s END,
                 CASE WHEN s < {_HRW_SHARDS} THEN h END) AS shard8,
         arg_max(s, h) AS shard9
  FROM ex GROUP BY doc_id
),
tot AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_docs FROM assigned)
SELECT CAST(shard8 AS BIGINT) AS shard,
       CAST(COUNT(1) AS BIGINT) AS n_docs,
       CAST(COUNT(1) * 1000000 // (SELECT n_docs FROM tot) AS BIGINT)
         AS share_ppm,
       CAST(SUM(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END) AS BIGINT)
         AS moved_on_expand,
       CAST(SUM(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END) * 1000000
            // COUNT(1) AS BIGINT) AS moved_ppm
FROM assigned
GROUP BY shard8
ORDER BY shard
""",
)
def rendezvous_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents")).select("doc_id")
    ex = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_HRW_SHARDS))).alias("s"),
    ).withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"),
                        F.col("s").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
    )
    assigned = ex.groupBy("doc_id").agg(
        F.expr(
            f"max_by(CASE WHEN s < {_HRW_SHARDS} THEN s END,"
            f" CASE WHEN s < {_HRW_SHARDS} THEN h END)"
        ).alias("shard8"),
        F.expr("max_by(s, h)").alias("shard9"),
    )
    tot = assigned.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        assigned.join(F.broadcast(tot))
        .groupBy("shard8")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("CAST(count(1) * 1000000 div max(n_total) AS BIGINT)")
            .alias("share_ppm"),
            F.sum(F.when(F.col("shard9") != F.col("shard8"), 1).otherwise(0))
            .cast("bigint")
            .alias("moved_on_expand"),
            F.expr(
                "CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END)"
                " * 1000000 div count(1) AS BIGINT)"
            ).alias("moved_ppm"),
        )
        .select(
            F.col("shard8").cast("bigint").alias("shard"),
            "n_docs",
            "share_ppm",
            "moved_on_expand",
            "moved_ppm",
        )
        .orderBy("shard")
    )
