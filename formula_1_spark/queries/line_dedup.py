"""Line-grain exact dedup with a cross-doc df threshold (round 7).

C4 (Raffel et al. 2020) and Falcon/RefinedWeb (Penedo et al. 2023) both
remove REPEATED LINES from web text: a line whose fingerprint occurs in
enough distinct documents is boilerplate (navigation chrome, cookie
banners, licence footers) and is excised from EVERY document. This is a
different grain and a different policy from the repo's existing dedup
surface:

* ``segment_dedup_retention`` (queries/curation.py) keeps each distinct
  segment's FIRST occurrence — one survivor per segment text.
* ``dedup_span_extents`` (queries/span_extents.py) finds maximal shared
  spans per doc PAIR.
* This family removes ALL occurrences of any line with cross-doc
  document frequency >= ``_HOT_DF`` — the C4/Falcon policy, where hot
  lines are noise to delete, not content to keep once.

The synthetic ``documents`` table is single-space tokenized with no
newlines, so a "line" is a fixed non-overlapping ``_LINE_TOKENS``-token
window (same convention as ``segment_dedup_retention``); on real crawl
text the splitter would be ``split(text, '\\n')`` and everything
downstream is unchanged.

Queries:

* ``line_dedup_hot_lines`` — discovery: the top-50 hottest line
  fingerprints by cross-doc df, with occurrence and token budgets. The
  list a curation run eyeballs before committing to a removal pass.
* ``line_dedup_excision`` — apply accounting per source: docs affected /
  emptied, lines and tokens removed, kept ppm. The per-source C4-style
  removal report.
* ``line_source_reuse_matrix`` — source x source counts of shared hot
  lines: which corpus sources recycle each other's boilerplate (mirror
  sites, syndication). Audit-grain evidence for source-level curation.

Scale: lines are one explode (~tokens/_LINE_TOKENS rows/doc); all work
downstream of the explode runs on 60-bit md5 line hashes (int shuffles,
never strings at corpus scale). The only corpus-scale shuffles are the
hash-keyed df groupBy and the hash-keyed join back to occurrences; the
reuse matrix joins the per-(hash, source) DISTINCT relation with itself
on the hash, whose fan-out is bounded by the source count per line —
never by occurrence count, so a million-doc boilerplate line contributes
at most (#sources choose 2) matrix rows.

Reference scope: extends the reference's curation surface (its
`Transform Silver Data.py` dedups whole rows only); parity is
oracle-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.dedup import md5_long
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import fan_out, load_table

_LINE_TOKENS = 8  # tokens per synthetic "line" (docs carry no newlines)
_HOT_DF = 2  # a line in >= this many distinct docs is boilerplate
_PPM = 1_000_000

# Shared oracle prefix: explode fixed token windows, hash each line to
# the repo-standard 60-bit md5 BIGINT (see operators.dedup.md5_long),
# count cross-doc document frequency per hash.
_LINE_CTES = f"""
WITH lines AS (
  SELECT doc_id, source, seg_idx,
         array_to_string(list_slice(tok, seg_idx * {_LINE_TOKENS} + 1,
                 seg_idx * {_LINE_TOKENS} + {_LINE_TOKENS}), ' ') AS line_text,
         len(list_slice(tok, seg_idx * {_LINE_TOKENS} + 1,
                 seg_idx * {_LINE_TOKENS} + {_LINE_TOKENS})) AS n_tok
  FROM (
    SELECT doc_id, source, tok,
           unnest(range((len(tok) + {_LINE_TOKENS - 1}) // {_LINE_TOKENS}))
             AS seg_idx
    FROM (SELECT doc_id, source, string_split(text, ' ') AS tok
          FROM documents)
  )
),
fp AS (
  SELECT doc_id, source, n_tok, line_text,
         ('0x' || substr(md5(line_text), 1, 15))::BIGINT AS g
  FROM lines
),
freq AS (
  -- full-width lines only: short tail fragments are exempt from removal
  -- (the Falcon short-line exemption), and a full line's text can never
  -- equal a shorter tail's, so the restriction is a pure filter
  SELECT g, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df_docs,
         CAST(COUNT(1) AS BIGINT) AS occurrences
  FROM fp WHERE n_tok = {_LINE_TOKENS} GROUP BY g
)
"""


def _doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tok, line_text, g): one row per fixed
    non-overlapping token window, hashed. Pure codegen Column work
    (split / sequence / slice / array_join / md5) — no UDFs."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    n_segs = (
        (F.size(toks) + F.lit(_LINE_TOKENS - 1)) / _LINE_TOKENS
    ).cast("int")
    sliced = F.slice(
        F.col("tok"), F.col("seg_idx") * _LINE_TOKENS + 1, _LINE_TOKENS
    )
    return (
        docs.select(
            "doc_id",
            "source",
            toks.alias("tok"),
            F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx"),
        )
        .select(
            "doc_id",
            "source",
            F.col("seg_idx").cast("bigint").alias("seg_idx"),
            F.size(sliced).cast("bigint").alias("n_tok"),
            F.array_join(sliced, " ").alias("line_text"),
        )
        .withColumn("g", md5_long(F.col("line_text")))
    )


def _line_df(lines: DataFrame) -> DataFrame:
    """Cross-doc document frequency per line hash, full-width lines only
    (short tail fragments are exempt from removal — the Falcon
    short-line exemption)."""
    return (
        lines.filter(F.col("n_tok") == _LINE_TOKENS)
        .groupBy("g")
        .agg(
            F.count_distinct("doc_id").alias("df_docs"),
            F.count(F.lit(1)).alias("occurrences"),
        )
    )


@register(
    "line_dedup_hot_lines",
    ops="EXT-dedup-line,A1,O3 (C4/Falcon repeated-line discovery)",
    doc="Repeated-line discovery: top-50 line fingerprints by cross-doc "
    "document frequency (df >= 2), with total occurrences, the token "
    "budget each would free if excised everywhere, and the line text. "
    "All grouping on 60-bit md5 hashes; the global top-50 is a "
    "TakeOrdered, never a single-partition sort.",
    oracle=_LINE_CTES
    + f"""
SELECT d.g AS line_g, d.df_docs, d.occurrences,
       CAST(MIN(f.n_tok) AS BIGINT) AS line_tokens,
       CAST(d.occurrences * MIN(f.n_tok) AS BIGINT) AS tokens_freed,
       MIN(f.line_text) AS line_text
FROM freq d JOIN fp f USING (g)
WHERE d.df_docs >= {_HOT_DF}
GROUP BY d.g, d.df_docs, d.occurrences
ORDER BY d.df_docs DESC, d.g
LIMIT 50
""",
)
def line_dedup_hot_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _doc_lines(spark, sf_dir)
    freq = _line_df(lines).filter(F.col("df_docs") >= _HOT_DF)
    return (
        lines.join(freq, "g")
        .groupBy("g", "df_docs", "occurrences")
        .agg(
            F.min("n_tok").cast("bigint").alias("line_tokens"),
            F.min("line_text").alias("line_text"),
        )
        .select(
            F.col("g").alias("line_g"),
            "df_docs",
            "occurrences",
            "line_tokens",
            (F.col("occurrences") * F.col("line_tokens"))
            .cast("bigint")
            .alias("tokens_freed"),
            "line_text",
        )
        .orderBy(F.desc("df_docs"), F.asc("line_g"))
        .limit(50)
    )


@register(
    "line_dedup_excision",
    ops="EXT-dedup-line,A1,A3 (C4/Falcon repeated-line removal accounting)",
    doc="Repeated-line excision accounting, C4/Falcon policy: every "
    "occurrence of a line with cross-doc df >= 2 is removed from EVERY "
    "doc (contrast segment_dedup_retention, which keeps first "
    "occurrences). Per source: docs affected / fully emptied, lines and "
    "tokens removed, post-excision kept ppm (integer arithmetic).",
    oracle=_LINE_CTES
    + f""",
hot AS (SELECT g FROM freq WHERE df_docs >= {_HOT_DF}),
per_doc AS (
  SELECT f.doc_id, f.source,
         CAST(COUNT(1) AS BIGINT) AS n_lines,
         CAST(SUM(f.n_tok) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS lines_removed,
         CAST(SUM(CASE WHEN h.g IS NOT NULL THEN f.n_tok ELSE 0 END)
              AS BIGINT) AS tokens_removed
  FROM fp f LEFT JOIN hot h ON f.g = h.g
  GROUP BY f.doc_id, f.source
)
SELECT source,
       CAST(COUNT(1) AS BIGINT) AS docs_total,
       CAST(SUM(CASE WHEN lines_removed > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_affected,
       CAST(SUM(CASE WHEN lines_removed = n_lines THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_emptied,
       CAST(SUM(n_lines) AS BIGINT) AS lines_total,
       CAST(SUM(lines_removed) AS BIGINT) AS lines_removed,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM(tokens_removed) AS BIGINT) AS tokens_removed,
       CAST((SUM(n_tokens) - SUM(tokens_removed)) * {_PPM}
            // SUM(n_tokens) AS BIGINT) AS kept_ppm
FROM per_doc
GROUP BY source
ORDER BY source
""",
)
def line_dedup_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _doc_lines(spark, sf_dir)
    hot_flagged = _line_df(lines).filter(F.col("df_docs") >= _HOT_DF)
    hot = hot_flagged.select("g", F.lit(1).alias("is_hot"))
    flag = F.col("is_hot").isNotNull()
    per_doc = (
        lines.join(hot, "g", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.when(flag, 1).otherwise(0)).alias("lines_removed"),
            F.sum(F.when(flag, F.col("n_tok")).otherwise(0)).alias(
                "tokens_removed"
            ),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs_total"),
            F.sum(
                F.when(F.col("lines_removed") > 0, 1).otherwise(0)
            ).alias("docs_affected"),
            F.sum(
                F.when(
                    F.col("lines_removed") == F.col("n_lines"), 1
                ).otherwise(0)
            ).alias("docs_emptied"),
            F.sum("n_lines").cast("bigint").alias("lines_total"),
            F.sum("lines_removed").cast("bigint").alias("lines_removed"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            F.sum("tokens_removed").cast("bigint").alias("tokens_removed"),
            F.expr(
                f"cast((sum(n_tokens) - sum(tokens_removed)) * {_PPM}"
                " div sum(n_tokens) as bigint)"
            ).alias("kept_ppm"),
        )
        .orderBy("source")
    )


@register(
    "line_source_reuse_matrix",
    ops="EXT-dedup-line,J5,A5 (cross-source boilerplate reuse matrix)",
    doc="Source x source shared-hot-line counts: for every hot line "
    "(cross-doc df >= 2), which pairs of corpus sources both carry it. "
    "The self-join runs on the per-(hash, source) DISTINCT relation, so "
    "per-hash fan-out is bounded by the source count, never occurrence "
    "count — a million-doc boilerplate line adds at most (sources "
    "choose 2) rows. Mirror-site / syndication evidence for "
    "source-level curation.",
    oracle=_LINE_CTES
    + f""",
src_fp AS (
  SELECT DISTINCT f.g, f.source
  FROM fp f JOIN freq d USING (g)
  WHERE d.df_docs >= {_HOT_DF}
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(1) AS BIGINT) AS shared_lines
FROM src_fp a JOIN src_fp b USING (g)
WHERE a.source < b.source
GROUP BY a.source, b.source
ORDER BY source_a, source_b
""",
)
def line_source_reuse_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = _doc_lines(spark, sf_dir)
    freq = _line_df(lines).filter(F.col("df_docs") >= _HOT_DF).select("g")
    src_fp = (
        lines.join(freq, "g", "leftsemi").select("g", "source").distinct()
    )
    a = src_fp.select("g", F.col("source").alias("source_a"))
    b = src_fp.select("g", F.col("source").alias("source_b"))
    return (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_lines"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (round 7)
# ---------------------------------------------------------------------------

_CDC_K = 4  # tokens per boundary-test gram
_CDC_D = 16  # boundary divisor: P(cut) = 1/16 per gram -> ~16-token chunks


@register(
    "cdc_chunk_dedup",
    ops="EXT-dedup-cdc,A1 (content-defined chunking dup audit)",
    doc="Content-defined chunking dedup (FastCDC/LBFS-style, "
    "re-expressed relationally): a chunk boundary falls after token "
    "i+3 wherever the 4-token gram hash at i is divisible by 16 "
    "(~16-token expected chunks), so boundaries SELF-SYNCHRONIZE — "
    "unlike the fixed windows of segment/line dedup, an insertion "
    "shifts at most one chunk before the cut pattern realigns, and "
    "shared substrings across docs land in identical chunks. All "
    "boundary math is per-row array HOFs (zero shuffle); the only "
    "corpus-scale shuffle is the chunk-hash groupBy. Per source: "
    "chunk/token totals, occurrences of globally-duplicated chunks "
    "(corpus count >= 2), and the duplicated-token ppm.",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
),
g AS (
  SELECT doc_id, source, t, n,
         CASE WHEN n >= {_CDC_K} THEN
           list_filter(
             list_transform(range(0, n - {_CDC_K} + 1),
               i -> CASE WHEN ('0x' || substr(md5(array_to_string(
                        list_slice(t, i + 1, i + {_CDC_K}), ' ')), 1, 15)
                        )::BIGINT % {_CDC_D} = 0
                    THEN i + {_CDC_K} ELSE NULL END),
             x -> x IS NOT NULL AND x < n)
         ELSE CAST([] AS BIGINT[]) END AS cuts
  FROM d
),
b AS (
  SELECT doc_id, source, t,
         list_sort(list_distinct(
           list_concat(list_concat([0], cuts), [n]))) AS bounds
  FROM g
),
chunks AS (
  SELECT doc_id, source,
         array_to_string(
           list_slice(t, bounds[j + 1] + 1, bounds[j + 2]), ' ') AS chunk_text,
         bounds[j + 2] - bounds[j + 1] AS n_tok
  FROM b, unnest(range(0, len(bounds) - 1)) u(j)
),
hashed AS (
  SELECT doc_id, source, n_tok,
         ('0x' || substr(md5(chunk_text), 1, 15))::BIGINT AS cg
  FROM chunks
),
freq AS (SELECT cg, COUNT(1) AS cnt FROM hashed GROUP BY cg)
SELECT h.source,
       CAST(COUNT(1) AS BIGINT) AS chunks_total,
       CAST(COUNT(DISTINCT h.cg) AS BIGINT) AS chunks_distinct,
       CAST(SUM(CASE WHEN f.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_chunk_occurrences,
       CAST(SUM(h.n_tok) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN f.cnt >= 2 THEN h.n_tok ELSE 0 END) AS BIGINT)
         AS dup_tokens,
       CAST(SUM(CASE WHEN f.cnt >= 2 THEN h.n_tok ELSE 0 END) * {_PPM}
            // SUM(h.n_tok) AS BIGINT) AS dup_token_ppm
FROM hashed h JOIN freq f USING (cg)
GROUP BY h.source
ORDER BY h.source
""",
)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    base = docs.select("doc_id", "source", t.alias("t"), n.alias("n"))
    gram_hash = lambda i: md5_long(  # noqa: E731
        F.concat_ws(" ", F.slice(F.col("t"), i + 1, _CDC_K))
    )
    cuts = F.when(
        F.col("n") >= _CDC_K,
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.col("n") - _CDC_K),
                lambda i: F.when(
                    gram_hash(i) % _CDC_D == 0, i + _CDC_K
                ),
            ),
            lambda x: x.isNotNull() & (x < F.col("n")),
        ),
    ).otherwise(F.array().cast("array<int>"))
    bounds = F.array_sort(
        F.array_distinct(
            F.concat(
                F.array(F.lit(0)), cuts.cast("array<int>"), F.array(F.col("n"))
            )
        )
    )
    with_bounds = base.withColumn("bounds", bounds)
    chunks = with_bounds.select(
        "doc_id",
        "source",
        "t",
        "bounds",
        F.explode(
            F.sequence(F.lit(0), F.size("bounds") - 2)
        ).alias("j"),
    ).select(
        "doc_id",
        "source",
        (
            F.element_at("bounds", F.col("j") + 2)
            - F.element_at("bounds", F.col("j") + 1)
        ).cast("bigint").alias("n_tok"),
        F.array_join(
            F.slice(
                F.col("t"),
                F.element_at("bounds", F.col("j") + 1) + 1,
                F.element_at("bounds", F.col("j") + 2)
                - F.element_at("bounds", F.col("j") + 1),
            ),
            " ",
        ).alias("chunk_text"),
    )
    hashed = chunks.select(
        "doc_id", "source", "n_tok", md5_long(F.col("chunk_text")).alias("cg")
    )
    # Pre-aggregate to (source, cg) before the frequency join: the global
    # chunk frequency is the sum of per-source occurrence counts, and
    # every per-source metric below is recoverable from this grain
    # (chunks_distinct = rows per source, chunks_total = sum occ, token
    # sums weight by occ-group token totals). The expensive chunk
    # pipeline (per-doc gram hashing + boundary slicing) executes ONCE
    # behind the checkpoint — previously both the frequency build and
    # the join-back re-ran it — and the join input shrinks from chunk
    # grain to (source, cg) grain.
    grouped = (
        hashed.groupBy("source", "cg")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.sum("n_tok").cast("bigint").alias("tok"),
        )
        .localCheckpoint(eager=False)
    )
    freq = grouped.groupBy("cg").agg(F.sum("occ").alias("cnt"))
    dup = F.col("cnt") >= 2
    return (
        grouped.join(freq, "cg")
        .groupBy("source")
        .agg(
            F.sum("occ").cast("bigint").alias("chunks_total"),
            F.count(F.lit(1)).cast("bigint").alias("chunks_distinct"),
            F.sum(F.when(dup, F.col("occ")).otherwise(0))
            .cast("bigint")
            .alias("dup_chunk_occurrences"),
            F.sum("tok").cast("bigint").alias("tokens_total"),
            F.sum(F.when(dup, F.col("tok")).otherwise(0))
            .cast("bigint")
            .alias("dup_tokens"),
            F.expr(
                f"cast(sum(case when cnt >= 2 then tok else 0 end)"
                f" * {_PPM} div sum(tok) as bigint)"
            ).alias("dup_token_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Incremental line-grain dedup (round 7)
# ---------------------------------------------------------------------------


@register(
    "line_dedup_incremental",
    ops="EXT-dedup-line,EXT-dedup-incremental,A1 (batch vs base-index)",
    doc="Incremental flavor of line-grain dedup: the corpus is split by "
    "the shared md5 rule into a BASE (buckets 0-8) whose full-width "
    "line fingerprints form an append-only index, and an INCOMING batch "
    "(bucket 9) checked against it. Per incoming source: lines already "
    "in the base index (drop), novel lines (append to the index), "
    "novel-but-duplicated-within-batch lines, and the token budget "
    "each class carries. The join is asymmetric — O(batch x index "
    "bucket), never corpus^2 — the same scale shape as "
    "dedup_incremental_minhash.",
    oracle=f"""
WITH lines AS (
  SELECT doc_id, source,
         array_to_string(list_slice(tok, seg_idx * {_LINE_TOKENS} + 1,
                 seg_idx * {_LINE_TOKENS} + {_LINE_TOKENS}), ' ') AS line_text,
         len(list_slice(tok, seg_idx * {_LINE_TOKENS} + 1,
                 seg_idx * {_LINE_TOKENS} + {_LINE_TOKENS})) AS n_tok
  FROM (
    SELECT doc_id, source, tok,
           unnest(range((len(tok) + {_LINE_TOKENS - 1}) // {_LINE_TOKENS}))
             AS seg_idx
    FROM (SELECT doc_id, source, string_split(text, ' ') AS tok
          FROM documents)
  )
),
fp AS (
  SELECT doc_id, source, n_tok,
         ('0x' || substr(md5(line_text), 1, 15))::BIGINT AS g,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 AS bkt
  FROM lines
  WHERE n_tok = {_LINE_TOKENS}
),
base_idx AS (SELECT DISTINCT g FROM fp WHERE bkt < 9),
incoming AS (SELECT * FROM fp WHERE bkt = 9),
batch_freq AS (
  SELECT g, COUNT(1) AS cnt FROM incoming GROUP BY g
),
flagged AS (
  SELECT i.source, i.n_tok,
         CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END AS in_base,
         CASE WHEN b.g IS NULL AND f.cnt >= 2 THEN 1 ELSE 0 END AS batch_dup
  FROM incoming i
  LEFT JOIN base_idx b ON i.g = b.g
  JOIN batch_freq f ON i.g = f.g
)
SELECT source,
       CAST(COUNT(1) AS BIGINT) AS lines_incoming,
       CAST(SUM(in_base) AS BIGINT) AS lines_in_base,
       CAST(SUM(batch_dup) AS BIGINT) AS lines_batch_dup,
       CAST(COUNT(1) - SUM(in_base) AS BIGINT) AS lines_novel,
       CAST(SUM(in_base * n_tok) AS BIGINT) AS tokens_dropped,
       CAST(SUM((1 - in_base) * n_tok) AS BIGINT) AS tokens_appended
FROM flagged
GROUP BY source
ORDER BY source
""",
)
def line_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.queries.decontam import split_bucket

    lines = _doc_lines(spark, sf_dir).filter(
        F.col("n_tok") == _LINE_TOKENS
    ).withColumn("bkt", split_bucket("doc_id"))
    base_idx = (
        lines.filter(F.col("bkt") < 9).select("g").distinct()
        .withColumn("in_base_f", F.lit(1))
    )
    incoming = lines.filter(F.col("bkt") == 9)
    batch_freq = incoming.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    flagged = (
        incoming.join(base_idx, "g", "left")
        .join(batch_freq, "g")
        .select(
            "source",
            "n_tok",
            F.when(F.col("in_base_f").isNotNull(), 1)
            .otherwise(0)
            .alias("in_base"),
            F.when(
                F.col("in_base_f").isNull() & (F.col("cnt") >= 2), 1
            )
            .otherwise(0)
            .alias("batch_dup"),
        )
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("lines_incoming"),
            F.sum("in_base").cast("bigint").alias("lines_in_base"),
            F.sum("batch_dup").cast("bigint").alias("lines_batch_dup"),
            (F.count(F.lit(1)) - F.sum("in_base"))
            .cast("bigint")
            .alias("lines_novel"),
            F.sum(F.col("in_base") * F.col("n_tok"))
            .cast("bigint")
            .alias("tokens_dropped"),
            F.sum((F.lit(1) - F.col("in_base")) * F.col("n_tok"))
            .cast("bigint")
            .alias("tokens_appended"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Hot-line position profile (round 7)
# ---------------------------------------------------------------------------


@register(
    "hot_line_position_profile",
    ops="EXT-dedup-line,A1 (boilerplate position structure)",
    doc="WHERE in documents do repeated lines live? Each hot-line "
    "occurrence (cross-doc df >= 2, full-width) is bucketed by its "
    "position third within the doc (lead / mid / tail — navigation "
    "chrome and footers concentrate at the edges in real crawls); per "
    "(source, position) the occurrence count and the within-source "
    "share ppm. Rides the line relation; one extra bounded aggregate.",
    oracle=_LINE_CTES
    + f""",
hot AS (SELECT g FROM freq WHERE df_docs >= {_HOT_DF}),
sized AS (
  SELECT doc_id, source, seg_idx,
         ('0x' || substr(md5(line_text), 1, 15))::BIGINT AS g,
         COUNT(1) OVER (PARTITION BY doc_id) AS n_lines
  FROM lines WHERE n_tok = {_LINE_TOKENS}
),
pos AS (
  SELECT s.source,
         CASE WHEN s.seg_idx * 3 < s.n_lines THEN 'lead'
              WHEN s.seg_idx * 3 < s.n_lines * 2 THEN 'mid'
              ELSE 'tail' END AS position
  FROM sized s JOIN hot h ON s.g = h.g
),
per_src AS (SELECT source, COUNT(1) AS n_src FROM pos GROUP BY source)
SELECT p.source, p.position,
       CAST(COUNT(1) AS BIGINT) AS occurrences,
       CAST(COUNT(1) * 1000000 // x.n_src AS BIGINT) AS source_share_ppm
FROM pos p JOIN per_src x USING (source)
GROUP BY p.source, p.position, x.n_src
ORDER BY p.source, p.position
""",
)
def hot_line_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lines = _doc_lines(spark, sf_dir)
    full = lines.filter(F.col("n_tok") == _LINE_TOKENS)
    hot = _line_df(lines).filter(F.col("df_docs") >= _HOT_DF).select("g")
    sized = full.withColumn(
        "n_lines", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    pos = (
        sized.join(hot, "g", "leftsemi")
        .withColumn(
            "position",
            F.when(F.col("seg_idx") * 3 < F.col("n_lines"), "lead")
            .when(F.col("seg_idx") * 3 < F.col("n_lines") * 2, "mid")
            .otherwise("tail"),
        )
        .select("source", "position")
    )
    per_src = pos.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    return (
        pos.groupBy("source", "position")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .join(F.broadcast(per_src), "source")
        .select(
            "source",
            "position",
            F.col("occurrences").cast("bigint").alias("occurrences"),
            F.expr(
                "cast(occurrences * 1000000 div n_src as bigint)"
            ).alias("source_share_ppm"),
        )
        .orderBy("source", "position")
    )
