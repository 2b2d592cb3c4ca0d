"""Data-quality expectations, weighted (priority) sampling, and GROUPING
SETS — pipeline-governance surface with full DuckDB oracles.

Reference scope note: the reference (uwe-uffuchs/formula-1) has no
quality gate — malformed rows flow into silver unchecked (SURVEY.md §2.12
quirks). These queries are the engine's extension surface for curation
pipelines that must quantify and quarantine bad rows at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.quality import DROP, WARN, Expectation, expectation_stats
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table, load_tables

# One shared rule set: the Spark side builds Column predicates, the oracle
# repeats each predicate verbatim in SQL (NULL-safe via coalesce, matching
# operators.quality semantics: NULL predicate == violation).
_RULES_SQL = [
    ("qty_positive", DROP, "l_quantity >= 1"),
    ("qty_le_45", WARN, "l_quantity <= 45"),
    ("price_positive", DROP, "l_extendedprice > 0"),
    ("discount_le_8pct", WARN, "l_discount <= 0.08"),
    ("tax_le_6pct", WARN, "l_tax <= 0.06"),
    ("flag_known", DROP, "l_returnflag IN ('A', 'N', 'R')"),
]

_STATS_AGG = ",\n".join(
    f"    SUM(CASE WHEN NOT coalesce({sql}, FALSE) THEN 1 ELSE 0 END)::BIGINT AS v{i}"
    for i, (_, _, sql) in enumerate(_RULES_SQL)
)
_STATS_ROWS = "\nUNION ALL\n".join(
    f"SELECT '{name}' AS rule_name, '{action}' AS action, n AS n_rows, "
    f"v{i} AS n_violations, (v{i} * 1000000) // n AS violation_ppm FROM a"
    for i, (name, action, _) in enumerate(_RULES_SQL)
)


def lineitem_expectations() -> list[Expectation]:
    return [
        Expectation(name, F.expr(sql), action) for name, action, sql in _RULES_SQL
    ]


@register(
    "data_quality_expectations",
    ops="EXT-quality-expectations,A3,P7 (declarative row constraints, one-pass stats)",
    doc="DLT-style expectations over lineitem: six named rules (drop/warn "
    "actions) evaluated as conditional sums in ONE aggregation pass (no "
    "per-rule scans), reported as exact integer-ppm violation rates. The "
    "enforce() split (clean/quarantine streams off the same scan) is "
    "pytest-covered; this query drives the stats surface.",
    oracle=f"""
WITH a AS (
  SELECT COUNT(1) AS n,
{_STATS_AGG}
  FROM lineitem
)
{_STATS_ROWS}
""",
)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return expectation_stats(li, lineitem_expectations())


@register(
    "sample_weighted_priority",
    ops="EXT-sampling-weighted,W2,O3 (priority sampling, two-phase top-k)",
    doc="Weighted sampling without replacement via priority sampling "
    "(Duffield-Lund-Thorup): priority = weight / hash-uniform(0,1], "
    "top-100 by priority two-phase (per-partition prune, no global "
    "sort), tau = 101st priority, est_weight = max(w, tau) the "
    "Horvitz-Thompson subset-sum estimator. All priorities are single "
    "IEEE divisions of exact integers — bit-identical cross-engine.",
    oracle="""
WITH pr AS (
  SELECT doc_id, n_chars,
         CAST(CAST(n_chars AS BIGINT) * 1000000 AS DOUBLE)
           / ((('0x' || substr(md5('prio' || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000) + 1) AS priority
  FROM documents
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS rk FROM pr
),
tau AS (SELECT MIN(CASE WHEN rk = 101 THEN priority END) AS tau FROM rk)
SELECT r.doc_id, r.n_chars, r.priority, CAST(r.rk AS INTEGER) AS rk,
       coalesce(t.tau, 0.0) AS tau,
       greatest(CAST(r.n_chars AS DOUBLE), coalesce(t.tau, 0.0)) AS est_weight
FROM rk r, tau t WHERE r.rk <= 100
""",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.sampling import priority_sample

    docs = load_table(spark, sf_dir, "documents")
    return priority_sample(docs, k=100, weight_col="n_chars").select(
        "doc_id", "n_chars", "priority", "rk", "tau", "est_weight"
    )


@register(
    "orders_grouping_sets",
    ops="A5,EXT-grouping-sets (multi-grain aggregate, one shuffle)",
    doc="GROUPING SETS ((priority), (year), ()) over orders in one pass — "
    "three aggregation grains from a single Expand+Aggregate (one "
    "shuffle), the relational sibling of cube/rollup. Null grain keys "
    "are coalesced to sentinels so the result is engine-portable without "
    "grouping_id().",
    oracle="""
SELECT COALESCE(o_orderpriority, 'ALL') AS priority_grp,
       COALESCE(o_year, -1) AS year_grp,
       COUNT(1) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM (
  SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) AS o_year, o_totalprice
  FROM orders
)
GROUP BY GROUPING SETS ((o_orderpriority), (o_year), ())
""",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["orders"], register=True)
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority_grp,
               COALESCE(o_year, -1) AS year_grp,
               COUNT(1) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM (
          SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) AS o_year, o_totalprice
          FROM orders
        )
        GROUP BY GROUPING SETS ((o_orderpriority), (o_year), ())
        """
    )


# log10(1 + 1/d) in parts-per-million — the public Benford first-digit
# expectation (rounded to the nearest ppm; a fixed literal in BOTH
# engines, so the comparison is exact).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE = "CASE d " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
) + " END"


@register(
    "benford_price_audit",
    ops="EXT-benford,A1,F1 (digit-distribution anomaly audit)",
    doc="Benford first-digit audit of o_totalprice — the classic "
    "fabricated-data / unit-mixing screen: observed first-digit shares "
    "in ppm vs the log10(1+1/d) expectation (fixed ppm literals, exact "
    "cross-engine), absolute deviation per digit, and the total "
    "variation distance in the final row set. One scan, one 9-group "
    "aggregate. (TPC-H prices are near-uniform, so the audit correctly "
    "reports a LARGE deviation — the signal a screen exists to raise.)",
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS d
  FROM orders WHERE o_totalprice >= 1
),
counts AS (
  SELECT d, CAST(COUNT(1) AS BIGINT) AS n FROM digits GROUP BY d
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT c.d AS first_digit, c.n,
       (c.n * 1000000) // t.total AS observed_ppm,
       {_BENFORD_CASE.replace('CASE d', 'CASE c.d')} AS benford_ppm,
       abs((c.n * 1000000) // t.total - {_BENFORD_CASE.replace('CASE d', 'CASE c.d')})
         AS deviation_ppm
FROM counts c, tot t
""",
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("total"))
    benford = F.expr(_BENFORD_CASE)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("first_digit"),
            "n",
            F.expr("(n * 1000000) div total").alias("observed_ppm"),
            benford.alias("benford_ppm"),
            F.abs(F.expr("(n * 1000000) div total") - benford).alias(
                "deviation_ppm"
            ),
        )
    )


@register(
    "quality_vs_duplication",
    ops="EXT-quality-dup-corr,A1,W1 (curation-signal cross-tabulation)",
    doc="Do duplicates skew low-quality? Quality-score quintiles "
    "(ntile(5) over the (score, doc_id) total order) cross-tabulated "
    "with exact-dup membership (doc's fingerprint group has >1 copy): "
    "per quintile, docs, duplicate docs, dup-rate ppm. The evidence "
    "behind ordering dedup before/after quality gates in a curation "
    "funnel. One scan feeds both signals; windows run over doc-level "
    "relations.",
    oracle="""
WITH q AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\\b(the|and|of|to|a|in|is)\\b'))
           / len(regexp_split_to_array(trim(text), '\\s+')) * 0.4
         + least(len(regexp_split_to_array(trim(text), '\\s+')) / 100.0, 1.0) * 0.3
         + (1.0 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                / length(text)) * 0.3 AS score,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
dupes AS (
  SELECT fp, COUNT(1) > 1 AS is_dup_group FROM q GROUP BY fp
),
tiled AS (
  SELECT q.doc_id, d.is_dup_group,
         CAST(NTILE(5) OVER (ORDER BY q.score ASC, q.doc_id ASC) AS INT)
           AS quintile
  FROM q JOIN dupes d ON d.fp = q.fp
)
SELECT quintile,
       CAST(COUNT(1) AS BIGINT) AS n_docs,
       CAST(COUNT(1) FILTER (WHERE is_dup_group) AS BIGINT) AS n_dup_docs,
       (COUNT(1) FILTER (WHERE is_dup_group) * 1000000) // COUNT(1)
         AS dup_rate_ppm
FROM tiled
GROUP BY quintile
""",
)
def quality_vs_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.text import fingerprint, quality_score
    from formula_1_spark.operators.windows import global_ntile_two_phase

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select(
        "doc_id",
        quality_score("text").alias("score"),
        fingerprint("text").alias("fp"),
    )
    dupes = q.groupBy("fp").agg((F.count(F.lit(1)) > 1).alias("is_dup_group"))
    # Two-phase exact NTILE(5) over (score, doc_id) — parallel batch
    # assignment instead of a single-partition corpus sort.
    tiled = global_ntile_two_phase(
        q.join(dupes, "fp").select("doc_id", "is_dup_group", "score"),
        [F.asc("score"), F.asc("doc_id")],
        5,
        alias="quintile",
    )
    return tiled.groupBy("quintile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if("is_dup_group").alias("n_dup_docs"),
        F.expr("(count_if(is_dup_group) * 1000000) div count(1)").alias(
            "dup_rate_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# Gopher-style heuristic quality gate (round 6)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and", "in")
_GOPHER_MIN_WORDS = 10
_GOPHER_MAX_WORDS = 1000

_STOP_HITS_SQL = " + ".join(
    f"(CASE WHEN list_contains(t, '{s}') THEN 1 ELSE 0 END)"
    for s in _STOPWORDS
)


@register(
    "gopher_quality_gate",
    ops="EXT-quality-gopher,A3,F1-F10 (heuristic rule battery)",
    doc="Gopher-style (Rae et al. 2021, Appendix A) heuristic quality "
    "rules, integer-exact per doc and rolled up per source: word-count "
    "bounds, mean word length in [3,10] (cross-multiplied, no floats), "
    ">= 2 distinct stopwords, >= 80% alphabetic words, < 10% "
    "symbol-to-word ratio. One scan, pure Column math; the per-rule "
    "pass counts say WHICH rule gates each source's loss.",
    oracle=f"""
WITH d AS (
  SELECT source, string_split_regex(trim(text), '\\s+') AS t,
         length(regexp_replace(text, '\\s+', '', 'g')) AS sum_len,
         len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_sym
  FROM documents
),
per_doc AS (
  SELECT source,
         len(t) AS n_words,
         sum_len,
         n_sym,
         {_STOP_HITS_SQL} AS stop_hits,
         len(list_filter(t, x -> regexp_matches(x, '^[a-z]+$'))) AS n_alpha
  FROM d
),
flags AS (
  SELECT source,
         CASE WHEN n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
              THEN 1 ELSE 0 END AS r_wordcount,
         CASE WHEN sum_len >= 3 * n_words AND sum_len <= 10 * n_words
              THEN 1 ELSE 0 END AS r_meanwordlen,
         CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r_stopwords,
         CASE WHEN n_alpha * 10 >= n_words * 8 THEN 1 ELSE 0 END AS r_alpha,
         CASE WHEN n_sym * 10 < n_words THEN 1 ELSE 0 END AS r_symbol
  FROM per_doc
)
SELECT source,
       CAST(COUNT(1) AS BIGINT) AS docs,
       CAST(SUM(r_wordcount) AS BIGINT) AS pass_wordcount,
       CAST(SUM(r_meanwordlen) AS BIGINT) AS pass_meanwordlen,
       CAST(SUM(r_stopwords) AS BIGINT) AS pass_stopwords,
       CAST(SUM(r_alpha) AS BIGINT) AS pass_alpha,
       CAST(SUM(r_symbol) AS BIGINT) AS pass_symbol,
       CAST(SUM(r_wordcount * r_meanwordlen * r_stopwords
                * r_alpha * r_symbol) AS BIGINT) AS pass_all,
       CAST(SUM(r_wordcount * r_meanwordlen * r_stopwords
                * r_alpha * r_symbol) * 1000000 // COUNT(1) AS BIGINT)
         AS pass_all_ppm
FROM flags
GROUP BY source
ORDER BY source
""",
)
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = F.split(F.trim("text"), r"\s+")
    stop_hits = sum(
        F.when(F.array_contains(t, s), 1).otherwise(0) for s in _STOPWORDS
    )
    per_doc = docs.select(
        "source",
        F.size(t).alias("n_words"),
        F.length(F.regexp_replace("text", r"\s+", "")).alias("sum_len"),
        F.regexp_count("text", F.lit(r"#|\.\.\.")).alias("n_sym"),
        stop_hits.alias("stop_hits"),
        F.size(F.filter(t, lambda x: x.rlike("^[a-z]+$"))).alias("n_alpha"),
    )
    flags = per_doc.select(
        "source",
        F.when(
            F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS), 1
        )
        .otherwise(0)
        .alias("r_wordcount"),
        F.when(
            (F.col("sum_len") >= 3 * F.col("n_words"))
            & (F.col("sum_len") <= 10 * F.col("n_words")),
            1,
        )
        .otherwise(0)
        .alias("r_meanwordlen"),
        F.when(F.col("stop_hits") >= 2, 1).otherwise(0).alias("r_stopwords"),
        F.when(F.col("n_alpha") * 10 >= F.col("n_words") * 8, 1)
        .otherwise(0)
        .alias("r_alpha"),
        F.when(F.col("n_sym") * 10 < F.col("n_words"), 1)
        .otherwise(0)
        .alias("r_symbol"),
    )
    pass_all = (
        F.col("r_wordcount")
        * F.col("r_meanwordlen")
        * F.col("r_stopwords")
        * F.col("r_alpha")
        * F.col("r_symbol")
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("r_wordcount").cast("bigint").alias("pass_wordcount"),
            F.sum("r_meanwordlen").cast("bigint").alias("pass_meanwordlen"),
            F.sum("r_stopwords").cast("bigint").alias("pass_stopwords"),
            F.sum("r_alpha").cast("bigint").alias("pass_alpha"),
            F.sum("r_symbol").cast("bigint").alias("pass_symbol"),
            F.sum(pass_all).cast("bigint").alias("pass_all"),
            F.expr(
                "cast((sum(r_wordcount * r_meanwordlen * r_stopwords"
                " * r_alpha * r_symbol) * 1000000) div count(1) as bigint)"
            ).alias("pass_all_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Quality-threshold sweep (round 7)
# ---------------------------------------------------------------------------

_Q_BUCKET = 100_000  # threshold grid step (ppm)


@register(
    "quality_threshold_sweep",
    ops="EXT-quality-sweep,A1,W1 (filter-cutoff operating curve)",
    doc="DCLM-style quality-cutoff operating curve: score each doc by "
    "distinct-token ppm (the token_budget_selection score), histogram "
    "scores into 100k-ppm buckets with ONE scan, then a bounded "
    "bucket-to-threshold explode over the <= 11-row histogram yields "
    "docs/tokens kept at every grid threshold 0..1e6. The curve a "
    "curation run reads to pick its filter cutoff; the corpus-scale "
    "work is one aggregate — everything after runs on bucket grain, "
    "never doc grain.",
    oracle=f"""
WITH scored AS (
  SELECT len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) * 1000000
           // len(string_split(text, ' ')) AS quality_ppm
  FROM documents
),
hist AS (
  SELECT quality_ppm // {_Q_BUCKET} AS b,
         CAST(COUNT(1) AS BIGINT) AS docs,
         CAST(SUM(n_tokens) AS BIGINT) AS toks
  FROM scored GROUP BY quality_ppm // {_Q_BUCKET}
),
grid AS (SELECT unnest(range(0, 11)) AS t),
cum AS (
  SELECT g.t * {_Q_BUCKET} AS threshold_ppm,
         CAST(COALESCE(SUM(h.docs), 0) AS BIGINT) AS docs_kept,
         CAST(COALESCE(SUM(h.toks), 0) AS BIGINT) AS tokens_kept
  FROM grid g LEFT JOIN hist h ON h.b >= g.t
  GROUP BY g.t
),
tot AS (SELECT SUM(docs) AS d0, SUM(toks) AS t0 FROM hist)
SELECT CAST(threshold_ppm AS BIGINT) AS threshold_ppm, docs_kept, tokens_kept,
       CAST(docs_kept * 1000000 // t.d0 AS BIGINT) AS docs_kept_ppm,
       CAST(tokens_kept * 1000000 // t.t0 AS BIGINT) AS tokens_kept_ppm
FROM cum, tot t
ORDER BY threshold_ppm
""",
)
def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.expr(
            "cast(size(array_distinct(split(text, ' '))) as bigint)"
            " * 1000000 div size(split(text, ' '))"
        ).alias("quality_ppm"),
    )
    hist = scored.groupBy(
        (F.col("quality_ppm") / _Q_BUCKET).cast("bigint").alias("b")
    ).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("toks"),
    )
    grid = spark.range(0, 11).select(F.col("id").alias("t"))
    # Each histogram bucket b contributes to every threshold t <= b: a
    # bounded explode (<= 11 rows per bucket) + hash aggregate — an
    # equality join shape, no nested-loop range join anywhere.
    contrib = hist.select(
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.least(F.col("b"), F.lit(10)))
        ).alias("t"),
        "docs",
        "toks",
    )
    cum_agg = contrib.groupBy("t").agg(
        F.sum("docs").alias("docs_kept_raw"),
        F.sum("toks").alias("tokens_kept_raw"),
    )
    cum = grid.join(cum_agg, "t", "left").select(
        "t",
        F.coalesce("docs_kept_raw", F.lit(0)).cast("bigint").alias("docs_kept"),
        F.coalesce("tokens_kept_raw", F.lit(0))
        .cast("bigint")
        .alias("tokens_kept"),
    )
    tot = hist.agg(
        F.sum("docs").alias("d0"), F.sum("toks").alias("t0")
    )
    return (
        cum.join(F.broadcast(tot))
        .select(
            (F.col("t") * _Q_BUCKET).cast("bigint").alias("threshold_ppm"),
            "docs_kept",
            "tokens_kept",
            F.expr("cast(docs_kept * 1000000 div d0 as bigint)").alias(
                "docs_kept_ppm"
            ),
            F.expr("cast(tokens_kept * 1000000 div t0 as bigint)").alias(
                "tokens_kept_ppm"
            ),
        )
        .orderBy("threshold_ppm")
    )


# ---------------------------------------------------------------------------
# Hashed-n-gram linear quality classifier (fastText-style, VERDICT r9 6b)
# ---------------------------------------------------------------------------

# Feature space: ALL unigram + bigram occurrences (not distinct — token
# frequency is signal), hashed into _CLS_BUCKETS weight slots (the hashing
# trick: the model is a fixed B-dim vector regardless of vocabulary, grams
# colliding into a slot share its weight — exactly fastText's input layer).
# Weights here are a deterministic md5-derived stand-in for trained values
# (integers in [-1000, 1000]), so both engines replay the dot product in
# exact integer arithmetic; a trained model would broadcast its weight
# table instead, same plan shape. The logistic link is monotonic, so the
# keep/drop decision "sigmoid(mean_w) > 0.5" is exactly "score_sum > 0" —
# no cross-engine-unstable exp() anywhere.
_CLS_BUCKETS = 4096


def _cls_weight_hex() -> str:
    """The B-dim weight vector: weight of bucket b = first 32 md5 bits of
    str(b), mod 2001, shifted to [-1000, 1000]. Computed DRIVER-SIDE and
    embedded as ONE hex-packed string literal (3 hex digits per bucket,
    value + 1000); the per-row lookup is substring + conv on the 12 KB
    constant. Two rejected alternatives, both measured: evaluating the
    md5 chain per ROW hits an interpreted non-codegen path in Spark
    (nested md5-of-computed-string, 12 us/row -> 29 s for 5M grams), and
    a 4096-element array literal costs 3.4 s of DRIVER-side plan
    construction per invocation (4096 Column objects). The packed string
    is also the honest model shape — a trained fastText layer ships as a
    fixed weight table broadcast with the plan, not a hash formula."""
    import hashlib

    return "".join(
        f"{(int(hashlib.md5(str(b).encode()).hexdigest()[:8], 16) % 2001):03x}"
        for b in range(_CLS_BUCKETS)
    )


@register(
    "quality_classifier_hashed_ngram",
    ops="EXT-quality-classifier,F1,A5 (hashing-trick linear text scorer)",
    doc="fastText-style hashed-n-gram quality classifier as pure Column "
    "math: every unigram+bigram OCCURRENCE hashes (md5/32-bit) into 4096 "
    "weight buckets; per-doc score is the exact-integer sum of bucket "
    "weights; keep/drop = sign of the score (== sigmoid(mean)>0.5, the "
    "logistic link being monotonic). One explode + one hash-aggregate — "
    "map-side combinable, no Python, no vocabulary state; scoring cost "
    "is O(tokens) regardless of corpus size. mean_w_ppm is the "
    "length-normalized margin both engines floor identically.",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source,
         t || list_transform(range(0, greatest(len(t) - 1, 0)),
               i -> array_to_string(list_slice(t, i + 1, i + 2), ' ')) AS g
  FROM toks
),
gr AS (
  SELECT doc_id, source, len(g) AS n_grams, unnest(g) AS gram FROM grams
),
wv AS (
  SELECT doc_id, source, n_grams,
         ((('0x' || substr(md5(CAST(
              ('0x' || substr(md5(gram), 1, 8))::BIGINT % {_CLS_BUCKETS}
            AS VARCHAR)), 1, 8))::BIGINT % 2001) - 1000) AS w
  FROM gr
),
agg AS (
  SELECT doc_id, source, n_grams, SUM(w) AS score_sum
  FROM wv GROUP BY doc_id, source, n_grams
)
SELECT doc_id, source,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(score_sum AS BIGINT) AS score_sum,
       CAST(FLOOR(score_sum * 1000000.0 / n_grams) AS BIGINT) AS mean_w_ppm,
       CASE WHEN score_sum > 0 THEN 'keep' ELSE 'drop' END AS label
FROM agg
""",
)
def quality_classifier_hashed_ngram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from formula_1_spark.operators.dedup import md5_int32
    from formula_1_spark.queries.dedup import _shared_relations

    # Token arrays come from the session-memoized dedup family relation
    # (ONE persisted copy per (app, sf_dir) — a per-call persist() here
    # accumulated cache entries across invocations until storage
    # thrashed, measured 16 -> 54 s run-to-run at sf0.1). The persist
    # barrier also stops CollapseProject re-inlining the regex split
    # once per gram (operators/dedup.shingles_from_tokens pitfall).
    tok = _shared_relations(spark, sf_dir)["tok"].withColumnRenamed("toks", "t")
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.concat_ws(" ", F.slice("t", i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # n_grams is pure token arithmetic (len + max(len-1, 0)) — sizing the
    # concatenated gram array instead would build every bigram twice
    # (once for size, once for the explode).
    gr = tok.select(
        "doc_id",
        (F.size("t") + F.greatest(F.size("t") - 1, F.lit(0))).alias("n_grams"),
        F.explode(F.concat(F.col("t"), bigrams)).alias("gram"),
    )
    bucket = (md5_int32(F.col("gram")) % _CLS_BUCKETS).cast("int")
    w = (
        F.conv(F.substring(F.lit(_cls_weight_hex()), bucket * 3 + 1, 3), 16, 10)
        .cast("bigint")
        - 1000
    )
    agg = (
        gr.withColumn("w", w)
        .groupBy("doc_id", "n_grams")
        .agg(F.sum("w").alias("score_sum"))
    )
    # source re-attaches at doc grain AFTER the gram aggregate — the
    # exploded stream never carries the string column.
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return agg.join(src, "doc_id").select(
        "doc_id",
        "source",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        "score_sum",
        F.floor(F.col("score_sum") * 1000000.0 / F.col("n_grams"))
        .cast("bigint")
        .alias("mean_w_ppm"),
        F.when(F.col("score_sum") > 0, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )
