"""Sketch-based approximate aggregates (HyperLogLog++ via
``approx_count_distinct``). The sketch VALUES are engine-specific, so the
oracle can't compare them directly — instead the query emits the exact
distinct counts alongside boolean error-bound flags (|approx - exact| <=
5% of exact, a 5-sigma bound at rsd=0.01), and the oracle asserts the
exact counts hash-exactly and the flags are all true. A wrong or drifting
sketch flips a flag and reds the driver row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table


@register(
    "approx_distinct_sketch",
    ops="EXT-sketch-hll",
    doc="HyperLogLog++ approximate distinct counts per return flag "
    "(rsd=0.01), oracle-checked via exact counts + 5%-error-bound flags "
    "(sketch values are engine-specific; the bound is what's portable).",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       1 AS orders_within_5pct,
       1 AS parts_within_5pct
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # The HLL sketches and the exact distinct counts MUST be separate
    # aggregations: countDistinct rewrites through Expand (one row copy
    # per distinct child), and any HLL aggregate sharing that Aggregate
    # allocates its multi-KB sketch buffer per EXPANDED group — measured
    # ~30 GB of aggregation state / 65 s at sf0.1. Split, each side is a
    # plain one-shuffle agg; the 3-row join-back is free.
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("a_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("a_parts"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.col(e) * F.lit(0.05)
    ).cast("int")
    return approx.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        within("a_orders", "exact_orders").alias("orders_within_5pct"),
        within("a_parts", "exact_parts").alias("parts_within_5pct"),
    )


@register(
    "approx_quantile_sketch",
    ops="EXT-sketch-quantile",
    doc="Approximate percentiles (Greenwald-Khanna-class sketch via "
    "percentile_approx, accuracy=1000) per return flag, oracle-checked "
    "via exact percentiles + sandwich flags: the sketch p50/p95 must lie "
    "within the exact [p49,p51]/[p94,p96] bands (rank error <= 1/accuracy "
    "guarantees it). Sketch values themselves are engine-specific.",
    oracle="""
SELECT l_returnflag,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50) AS exact_p50,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS exact_p95,
       1 AS p50_in_band,
       1 AS p95_in_band
FROM lineitem
GROUP BY l_returnflag
""",
)
def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    # Exact side: pre-aggregate to (value, frequency) first — prices have
    # bounded distinct cardinality (2dp grid), so the map-side-combined
    # groupBy shrinks the percentile's reduce input from |rows| to
    # |distinct values| (~100x at sf0.1, more at scale). percentile with
    # a frequency column over the multiset is definitionally identical
    # to percentile over the raw rows.
    counts = li.groupBy("l_returnflag", price.alias("p")).agg(
        F.count(F.lit(1)).alias("freq")
    )
    exact = counts.groupBy("l_returnflag").agg(
        F.percentile(
            "p", [0.49, 0.50, 0.51, 0.94, 0.95, 0.96], F.col("freq")
        ).alias("eq")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx(price, [0.50, 0.95], 1000).alias("aq"),
    )
    agg = approx.join(exact, "l_returnflag")
    band = lambda a, lo, hi: ((a >= lo) & (a <= hi)).cast("int")  # noqa: E731
    return agg.select(
        "l_returnflag",
        F.col("eq")[1].alias("exact_p50"),
        F.col("eq")[4].alias("exact_p95"),
        band(F.col("aq")[0], F.col("eq")[0], F.col("eq")[2]).alias("p50_in_band"),
        band(F.col("aq")[1], F.col("eq")[3], F.col("eq")[5]).alias("p95_in_band"),
    )


@register(
    "hll_mergeable_rollup",
    ops="EXT-sketch-hll-merge,A1 (Datasketches HLL: sketch fine, union coarse)",
    doc="THE pre-aggregation pattern for 100 TB distinct counts: HLL "
    "sketches built at fine grain (priority x year) once, then UNIONED "
    "to the coarse grain (priority) without rescanning rows — "
    "hll_sketch_agg + hll_union_agg (Datasketches, mergeable across "
    "partitions/days/tables). Oracle checks the exact distinct counts "
    "hash-exactly and a 5%-bound flag on the merged estimate (sketch "
    "bytes are engine-specific; the bound is what's portable).",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       1 AS merged_est_within_5pct
FROM orders
GROUP BY o_orderpriority
""",
)
def hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # Fine grain: one sketch per (priority, year). At scale these would be
    # PERSISTED (per-partition rollup tables) and this query would only
    # run the union — no raw-row rescan.
    fine = orders.groupBy(
        "o_orderpriority", F.year("o_orderdate").alias("o_year")
    ).agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    coarse = fine.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_customers")
    )
    return coarse.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "exact_customers",
        (
            F.abs(F.col("merged_est") - F.col("exact_customers"))
            <= F.col("exact_customers") * F.lit(0.05)
        )
        .cast("int")
        .alias("merged_est_within_5pct"),
    )


@register(
    "heavy_hitters_topk",
    ops="EXT-sketch-topk,A1 (approx_top_k frequent items)",
    doc="Heavy hitters via approx_top_k(l_suppkey, 10, 100000): the "
    "explicit maxItemsTracked >= distinct suppliers makes sketch counts "
    "structurally exact (not incidentally, as the old default-10000 "
    "variant relied on). The check is TIE-INSENSITIVE and oracle-"
    "computed end to end: every item whose exact count strictly exceeds "
    "the 11th-highest count MUST appear in any correct top-10 with its "
    "exact count, so the query emits exactly those items with the "
    "sketch's reported count — a dropped item (null) or an inexact "
    "count hash-mismatches the oracle's exact recompute. No expected "
    "flags are hardcoded; n_reported/n_rows anchors are computed by "
    "both engines.",
    oracle="""
WITH exact AS (
  SELECT l_suppkey, COUNT(1) AS true_count FROM lineitem GROUP BY l_suppkey
),
ranked AS (
  SELECT true_count,
         ROW_NUMBER() OVER (ORDER BY true_count DESC) AS rn
  FROM exact
),
b AS (SELECT MAX(CASE WHEN rn = 11 THEN true_count END) AS b11 FROM ranked),
strict AS (
  SELECT e.l_suppkey, e.true_count
  FROM exact e, b
  WHERE e.true_count > COALESCE(b.b11, -1)
),
meta AS (
  SELECT CAST(LEAST(10, COUNT(DISTINCT l_suppkey)) AS INT) AS n_reported,
         COUNT(1) AS n_rows
  FROM lineitem
)
SELECT s.l_suppkey,
       CAST(s.true_count AS BIGINT) AS reported_count,
       m.n_reported, m.n_rows
FROM strict s, meta m
""",
)
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    top = (
        li.agg(F.expr("approx_top_k(l_suppkey, 10, 100000)").alias("t"))
        .select(F.explode("t").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("est_count"))
    )
    exact = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("true_count"))
    # Boundary = the 11th-highest exact count (tie-order independent: the
    # VALUE at sorted position 11 is unique even when row_number's tie
    # break isn't). The window runs over the post-agg supplier relation —
    # #distinct suppliers rows, not lineitem rows.
    # Supplier-grain relation: two-phase top-11 instead of an
    # unpartitioned window. The suppkey tiebreak makes the order total
    # (rank == row_number); the VALUE at position 11 is unchanged by the
    # tie order, which is all the boundary needs.
    from formula_1_spark.operators.windows import two_phase_global_topk

    ranked = two_phase_global_topk(
        exact, [F.desc("true_count"), F.asc("l_suppkey")], 11, alias="rn",
        unique_order=True,
    )
    b = ranked.agg(
        F.max(F.when(F.col("rn") == 11, F.col("true_count"))).alias("b11")
    )
    strict = (
        exact.crossJoin(F.broadcast(b))
        .filter(F.col("true_count") > F.coalesce(F.col("b11"), F.lit(-1)))
        .select("l_suppkey")
    )
    # n_reported comes from the SKETCH's actual output row count; the
    # oracle recomputes the value it must equal (LEAST(10, #distinct)).
    meta = top.agg(F.count(F.lit(1)).cast("int").alias("n_reported")).crossJoin(
        li.agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        strict.join(top, strict.l_suppkey == top.item, "left")
        .crossJoin(F.broadcast(meta))
        .select(
            "l_suppkey",
            F.col("est_count").alias("reported_count"),
            "n_reported",
            "n_rows",
        )
    )


_CM_D = 4  # hash rows
_CM_W = 1024  # buckets per row


@register(
    "countmin_error_audit",
    ops="EXT-countmin,A1,W2 (hand-rolled mergeable sketch + error audit)",
    doc=f"Count-min sketch built from scratch in relational ops: "
    f"{_CM_D} salted md5 hash rows x {_CM_W} buckets over lineitem "
    f"supplier occurrences (one explode -> one (row, bucket) groupBy — "
    f"map-side combinable, mergeable across partitions/days by "
    f"construction), then the audit: estimate = min over rows for the "
    f"top-20 exact suppliers, overestimate ppm vs truth (count-min "
    f"never underestimates). Sketch is deterministic (shared md5 "
    f"family), so DuckDB replays it bit-for-bit — unlike the "
    f"approx_top_k queries, nothing here is flag-asserted.",
    oracle=f"""
WITH occ AS (
  SELECT l_suppkey AS key FROM lineitem
),
coords AS (
  SELECT key, i.i AS i,
         ('0x' || substr(md5(i.i || ':' || CAST(key AS VARCHAR)), 1, 8))::BIGINT
           % {_CM_W} AS bucket
  FROM occ, (SELECT unnest(range(0, {_CM_D})) AS i) i
),
sketch AS (
  SELECT i, bucket, CAST(COUNT(1) AS BIGINT) AS c
  FROM coords GROUP BY i, bucket
),
exact AS (
  SELECT key, CAST(COUNT(1) AS BIGINT) AS exact_n FROM occ GROUP BY key
),
top20 AS (
  SELECT key, exact_n,
         ROW_NUMBER() OVER (ORDER BY exact_n DESC, key ASC) AS rk
  FROM exact QUALIFY rk <= 20
),
probe AS (
  SELECT t.key, t.exact_n, t.rk, MIN(s.c) AS est_n
  FROM top20 t,
       (SELECT unnest(range(0, {_CM_D})) AS i) i
  JOIN sketch s
    ON s.i = i.i
   AND s.bucket = ('0x' || substr(md5(i.i || ':' || CAST(t.key AS VARCHAR)), 1, 8))::BIGINT
                  % {_CM_W}
  GROUP BY t.key, t.exact_n, t.rk
)
SELECT CAST(rk AS INT) AS rank, key, exact_n, est_n,
       est_n - exact_n AS overestimate,
       ((est_n - exact_n) * 1000000) // exact_n AS overestimate_ppm
FROM probe
ORDER BY rank
""",
)
def countmin_error_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("key")
    )
    coord = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat_ws(
                                        ":", F.lit(str(i)), F.col("key").cast("string")
                                    )
                                ),
                                1,
                                8,
                            ),
                            16,
                            10,
                        ).cast("bigint"),
                        F.lit(_CM_W),
                    ).alias("bucket"),
                )
                for i in range(_CM_D)
            ]
        )
    ).alias("c")
    # The 4 md5 coordinates depend only on `key`, so the sketch counts
    # are recoverable from the key-grain aggregate: count of rows landing
    # in (i, bucket) == sum of exact_n over the keys hashing there. One
    # corpus scan (the exact aggregate, checkpointed for its two readers)
    # instead of two, and 4 md5s per DISTINCT key instead of per row —
    # at any scale key cardinality << row count.
    exact = (
        li.groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .localCheckpoint(eager=False)
    )
    sketch = (
        exact.select("exact_n", coord)
        .select("exact_n", "c.i", "c.bucket")
        .groupBy("i", "bucket")
        .agg(F.sum("exact_n").alias("c"))
    )
    # Key-grain relation (scales with the corpus): two-phase top-20;
    # (exact_n, key) is a total order so rank == row_number.
    from formula_1_spark.operators.windows import two_phase_global_topk

    top20 = two_phase_global_topk(
        exact, [F.desc("exact_n"), F.asc("key")], 20, alias="rk",
        unique_order=True,
    )
    probe_coords = top20.select("key", "exact_n", "rk", coord).select(
        "key", "exact_n", "rk", "c.i", "c.bucket"
    )
    probe = (
        probe_coords.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("key", "exact_n", "rk")
        .agg(F.min("c").alias("est_n"))
    )
    return probe.select(
        F.col("rk").cast("int").alias("rank"),
        "key",
        "exact_n",
        "est_n",
        (F.col("est_n") - F.col("exact_n")).alias("overestimate"),
        F.expr("((est_n - exact_n) * 1000000) div exact_n").alias(
            "overestimate_ppm"
        ),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) source-overlap sketch (round 8)
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_GRAM = 8
_KMV_BUCKETS = 32

_KMV_CTES = f"""
WITH toks AS (
  SELECT d.source, string_split_regex(trim(d.text), '\\s+') AS t
  FROM documents d
),
grams AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(array_to_string(
            list_slice(t, i + 1, i + {_KMV_GRAM}), ' ')), 1, 15))::BIGINT AS g
  FROM toks, unnest(range(0, greatest(len(t) - {_KMV_GRAM - 1}, 0))) u(i)
),
kmv AS (
  SELECT source, g FROM (
    SELECT source, g,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY g) AS rk
    FROM grams) q WHERE rk <= {_KMV_K}
),
srcs AS (SELECT DISTINCT source FROM documents),
prs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM srcs a JOIN srcs b ON a.source < b.source
),
tagged AS (
  SELECT p.source_a, p.source_b, v.g,
         MAX(CASE WHEN v.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN v.source = p.source_b THEN 1 ELSE 0 END) AS in_b
  FROM prs p JOIN kmv v ON v.source IN (p.source_a, p.source_b)
  GROUP BY p.source_a, p.source_b, v.g
),
merged AS (
  SELECT source_a, source_b, in_a, in_b FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY source_a, source_b ORDER BY g) AS rk
    FROM tagged) q WHERE rk <= {_KMV_K}
),
est AS (
  SELECT source_a, source_b,
         CAST(SUM(in_a * in_b) * 1000000 // COUNT(1) AS BIGINT)
           AS est_jaccard_ppm
  FROM merged GROUP BY source_a, source_b
),
ex AS (
  SELECT a.source AS source_a, b.source AS source_b,
         COUNT(1) AS n_inter
  FROM grams a JOIN grams b ON b.g = a.g AND a.source < b.source
  GROUP BY a.source, b.source
),
sizes AS (SELECT source, COUNT(1) AS n FROM grams GROUP BY source),
exact AS (
  SELECT p.source_a, p.source_b,
         CAST(COALESCE(x.n_inter, 0) * 1000000
              // (sa.n + sb.n - COALESCE(x.n_inter, 0)) AS BIGINT)
           AS exact_jaccard_ppm
  FROM prs p
  JOIN sizes sa ON sa.source = p.source_a
  JOIN sizes sb ON sb.source = p.source_b
  LEFT JOIN ex x ON x.source_a = p.source_a AND x.source_b = p.source_b
)
SELECT e.source_a, e.source_b, e.est_jaccard_ppm, x.exact_jaccard_ppm,
       CAST(ABS(e.est_jaccard_ppm - x.exact_jaccard_ppm) AS BIGINT)
         AS abs_err_ppm
FROM est e JOIN exact x USING (source_a, source_b)
ORDER BY e.source_a, e.source_b
"""


@register(
    "kmv_source_overlap",
    ops="EXT-sketch-kmv,A1,W1,J1 (KMV Jaccard between sources)",
    doc="Pairwise source-vocabulary overlap from K-minimum-values "
    "sketches (Bar-Yossef et al. 2002; the Theta-sketch set-operation "
    "core): per source keep the 64 smallest distinct 8-gram md5 values "
    "— computed scale-honestly as bucket-partial k-mins (32 hash "
    "buckets, bounded window groups) merged by a second bounded k-min, "
    "never one corpus-grain window per source. The Jaccard estimate for "
    "a pair is |both-sketch members of the union's k-min| / K, computed "
    "entirely on the <= 64-row-per-source sketches — at 100 TB the "
    "pairwise stage never re-touches the corpus, and sketches merge "
    "across shards/days by k-min union, the set-INTERSECTION capability "
    "HLL rollups (hll_mergeable_rollup) cannot give. Deterministic md5 "
    "hashing -> the estimate itself is exactly oracle-checkable, "
    "alongside the exact Jaccard and the absolute error.",
    oracle=_KMV_CTES,
)
def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from formula_1_spark.operators.dedup import positional_gram_postings
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # localCheckpoint: four consumers read this relation (the sketch
    # path, both sides of the exact-intersection self-join, and the
    # per-source sizes) — without the materialization each re-ran the
    # full md5-per-gram postings build.
    grams = (
        positional_gram_postings(docs, _KMV_GRAM)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "g")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Two-phase exact k-min per source: partial k-min inside 32 hash
    # buckets (bounded window groups), then k-min of the <= 32*K
    # survivors — identical result to a single per-source window without
    # ever funnelling a source's full gram set through one task.
    w_bucket = Window.partitionBy("source", "bkt").orderBy("g")
    w_src = Window.partitionBy("source").orderBy("g")
    kmv = (
        grams.withColumn("bkt", F.pmod(F.col("g"), F.lit(_KMV_BUCKETS)))
        .withColumn("rk", F.row_number().over(w_bucket))
        .filter(F.col("rk") <= _KMV_K)
        .withColumn("rk2", F.row_number().over(w_src))
        .filter(F.col("rk2") <= _KMV_K)
        .select("source", "g")
        .localCheckpoint(eager=False)  # tiny; reused by the pair stage
    )
    srcs = docs.select("source").distinct()
    prs = srcs.select(F.col("source").alias("source_a")).join(
        srcs.select(F.col("source").alias("source_b")),
        F.col("source_a") < F.col("source_b"),
    )
    tagged = (
        F.broadcast(prs)
        .join(
            kmv.select(F.col("source").alias("v_src"), "g"),
            (F.col("v_src") == F.col("source_a"))
            | (F.col("v_src") == F.col("source_b")),
        )
        .groupBy("source_a", "source_b", "g")
        .agg(
            F.max(
                F.when(F.col("v_src") == F.col("source_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("v_src") == F.col("source_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    w_pair = Window.partitionBy("source_a", "source_b").orderBy("g")
    est = (
        tagged.withColumn("rk", F.row_number().over(w_pair))
        .filter(F.col("rk") <= _KMV_K)
        .groupBy("source_a", "source_b")
        .agg(
            F.expr(
                "cast((sum(in_a * in_b) * 1000000) div count(1) as bigint)"
            ).alias("est_jaccard_ppm")
        )
    )
    ga = grams.select(F.col("source").alias("source_a"), "g")
    gb = grams.select(F.col("source").alias("source_b"), "g")
    inter = (
        ga.join(gb, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = grams.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    exact = (
        prs.join(
            sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb")),
            "source_b",
        )
        .join(inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.expr(
                "cast((coalesce(n_inter, 0) * 1000000)"
                " div (na + nb - coalesce(n_inter, 0)) as bigint)"
            ).alias("exact_jaccard_ppm"),
        )
    )
    return (
        est.join(exact, ["source_a", "source_b"])
        .select(
            "source_a",
            "source_b",
            "est_jaccard_ppm",
            "exact_jaccard_ppm",
            F.abs(F.col("est_jaccard_ppm") - F.col("exact_jaccard_ppm"))
            .cast("bigint")
            .alias("abs_err_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation audit (round 9)
# ---------------------------------------------------------------------------

_JCE_RATE_PPM = 62_500  # 1/16 key-sampling rate on the md5 grid


@register(
    "join_cardinality_estimate_audit",
    ops="EXT-optimizer-stats,A1,A3 (sampled-key join-size estimation)",
    doc="Optimizer-statistics audit: estimate the self-equi-join "
    "cardinality of events on (user_id) per event_type — true size is "
    "sum(cnt^2) over join keys — from a 1/16 deterministic KEY sample "
    "(the shared salted-md5 grid, so the sample is identical in any "
    "engine) scaled by 16, and report the exact size, the estimate, and "
    "the signed error in ppm. Key-level sampling is how a distributed "
    "planner prices candidate joins without scanning group counts for "
    "every key: ONE aggregate per side at key grain, sample decided in "
    "codegen, everything after is key-grain. All integers exact.",
    oracle=f"""
WITH grp AS (
  SELECT event_type, user_id, CAST(COUNT(1) AS BIGINT) AS cnt
  FROM events GROUP BY event_type, user_id
),
flagged AS (
  SELECT event_type, cnt,
         CASE WHEN (('0x' || substr(md5('jce' || ':'
                      || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000000) < {_JCE_RATE_PPM}
              THEN 1 ELSE 0 END AS sampled
  FROM grp
)
SELECT event_type,
       CAST(COUNT(1) AS BIGINT) AS n_keys,
       CAST(SUM(sampled) AS BIGINT) AS keys_sampled,
       CAST(SUM(cnt * cnt) AS BIGINT) AS exact_join_rows,
       CAST(SUM(CASE WHEN sampled = 1 THEN cnt * cnt ELSE 0 END)
            * 1000000 // {_JCE_RATE_PPM} AS BIGINT) AS estimated_join_rows,
       CAST((SUM(CASE WHEN sampled = 1 THEN cnt * cnt ELSE 0 END)
             * 1000000 // {_JCE_RATE_PPM} - SUM(cnt * cnt))
            * 1000000 // SUM(cnt * cnt) AS BIGINT) AS err_ppm
FROM flagged
GROUP BY event_type
ORDER BY event_type
""",
)
def join_cardinality_estimate_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    grp = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    u = F.expr(
        "conv(substring(md5(concat_ws(':', 'jce', CAST(user_id AS STRING))),"
        " 1, 15), 16, 10)"
    ).cast("bigint")
    flagged = grp.select(
        "event_type",
        "cnt",
        F.when((u % 1_000_000) < _JCE_RATE_PPM, 1).otherwise(0).alias("sampled"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("sampled").cast("bigint").alias("keys_sampled"),
            F.sum(F.col("cnt") * F.col("cnt"))
            .cast("bigint")
            .alias("exact_join_rows"),
            F.expr(
                "CAST(sum(CASE WHEN sampled = 1 THEN cnt * cnt ELSE 0 END)"
                f" * 1000000 div {_JCE_RATE_PPM} AS BIGINT)"
            ).alias("estimated_join_rows"),
            # engines disagree on negative integer division (floor vs
            # truncate), so the signed error decomposes into sign * abs
            F.expr(
                "CAST(CASE WHEN sum(CASE WHEN sampled = 1 THEN cnt * cnt"
                f" ELSE 0 END) * 1000000 div {_JCE_RATE_PPM}"
                " >= sum(cnt * cnt) THEN 1 ELSE -1 END"
                " * (ABS(sum(CASE WHEN sampled = 1 THEN cnt * cnt ELSE 0 END)"
                f" * 1000000 div {_JCE_RATE_PPM} - sum(cnt * cnt))"
                " * 1000000 div sum(cnt * cnt)) AS BIGINT)"
            ).alias("err_ppm"),
        )
        .orderBy("event_type")
    )
