"""Scale-technique operators promoted to the driver gate.

Each query here demonstrates a technique that matters at 100 TB and was
previously pytest-only (or absent), now with a DuckDB oracle:

* ``bucketed_colocated_join`` — bucketed managed tables joined with ZERO
  exchange (pay the shuffle once at write time; every later fact-fact
  join is co-located). The query RAISES unless the sort-merge join plan
  is exchange-free on both sides, so a green driver row is itself the
  proof.
* ``entity_resolution_fuzzy`` — blocked fuzzy entity matching
  (block-key equi-join bounds the candidate pairs, JVM ``levenshtein``
  scores them; no UDFs).
* ``quality_quantile_filter`` — per-group exact-percentile thresholds
  broadcast back against the corpus (two-pass filter: a tiny agg, then
  a map-side-only filter join).
* ``crossdoc_ngram_spans`` — exact repeated-span detection across
  documents (the first stage of suffix-style exact substring dedup a la
  "Deduplicating Training Data Makes Language Models Better"): explode
  token 8-grams, one partially-aggregated groupBy, no Python.
* ``nation_trade_shortest_path`` — iterative frontier BFS (Pregel-lite)
  over a derived trade graph; per-level anti-join keeps the BFS minimal
  and the per-round persist bounds recompute, the same discipline as
  ``operators/graph.py`` connected components.

Reference scope note: the reference (uwe-uffuchs/formula-1) has no
fact-fact bucketing, ER, or graph surface — these are extension
operators in the spirit of SURVEY.md §2's "beyond the reference" list.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.fixtures import source_fingerprint
from formula_1_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Bucketed co-located join
# ---------------------------------------------------------------------------


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Bucketed orders/lineitem managed tables, fingerprint-named so a
    testdata regeneration can never serve stale buckets (same contract
    as sources/fixtures.py cache roots, but catalog-resident)."""
    from formula_1_spark.sources.io import write_bucketed_table

    fp = source_fingerprint(sf_dir, "orders", "lineitem")
    o_tab, l_tab = f"ord_buck_{fp}", f"li_buck_{fp}"
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix(
        "file:"
    )
    for tab, tbl_src in ((o_tab, "orders"), (l_tab, "lineitem")):
        if spark.catalog.tableExists(tab):
            continue
        # A fresh in-memory catalog can't see a prior session's managed
        # table, but its warehouse directory survives and blocks the
        # write with LOCATION_ALREADY_EXISTS — clear the orphan.
        import shutil

        shutil.rmtree(os.path.join(warehouse, tab), ignore_errors=True)
        if tbl_src == "orders":
            df = load_table(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority", "o_totalprice"
            )
            write_bucketed_table(
                df, tab, ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"]
            )
        else:
            df = load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice"
            )
            write_bucketed_table(
                df, tab, ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"]
            )
    return o_tab, l_tab


@register(
    "bucketed_colocated_join",
    ops="S8,J4,A5,EXT-bucketing (shuffle-free fact-fact join at rest)",
    doc="Orders and lineitem written as managed tables bucketed 8-ways "
    "on the join key, then sort-merge-joined reading co-located buckets "
    "directly: the function RAISES unless the forced-SMJ plan contains "
    "ZERO 'Exchange hashpartitioning' below the join, so a green driver "
    "row proves the at-rest co-location, not just the join values. This "
    "is the 100 TB answer to repeated fact-fact joins: pay the shuffle "
    "once at write time.",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(1) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o_tab, l_tab = _bucketed_tables(spark, sf_dir)
    o = spark.table(o_tab).hint("merge")
    li = spark.table(l_tab).hint("merge")
    joined = o.join(li, o.o_orderkey == li.l_orderkey)

    # The co-location proof: a forced sort-merge join between identically
    # bucketed tables must need no exchange on either side. (The final
    # groupBy below still exchanges on o_orderpriority — that one is the
    # aggregation's, not the join's, so assert on the join subplan.)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise RuntimeError(
            "bucketed join plan contains an exchange — co-location lost:\n"
            + plan[:2000]
        )

    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Runtime bloom-filter join pruning
# ---------------------------------------------------------------------------


@register(
    "runtime_bloom_pruned_join",
    ops="J4,A5,EXT-runtime-filter (bloom semi-join pushdown)",
    doc="Catalyst runtime bloom-filter injection: a selective dim-side "
    "filter (URGENT orders) builds a bloom_filter_agg whose "
    "might_contain probe is pushed into the fact scan, so non-matching "
    "lineitem rows die before the join shuffle — at 100 TB this is the "
    "difference between shuffling the whole fact table and shuffling "
    "the ~20%% that can match. The function RAISES unless the physical "
    "plan contains BOTH the bloom build and the might_contain probe "
    "(thresholds are lowered to make injection fire at test scale; at "
    "production scan sizes the defaults fire on their own), so a green "
    "driver row proves the runtime filter, not just the join values.",
    oracle="""
SELECT l.l_returnflag, COUNT(1) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
""",
)
def runtime_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # Test-scale scans are far below the 10 GB production default.
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # The filter only pays off on a shuffle join (a broadcast join
        # already prunes via the hash relation) — force SMJ for the probe.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_extendedprice"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        out = joined.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "bloom_filter_agg" not in plan or "might_contain" not in plan:
            raise RuntimeError(
                "runtime bloom filter was not injected into the plan:\n"
                + plan[:2000]
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


# ---------------------------------------------------------------------------
# AQE skew-join split
# ---------------------------------------------------------------------------


@register(
    "aqe_skew_split_join",
    ops="J4,A5,EXT-aqe-skew (adaptive skew-partition splitting)",
    doc="AQE skew-join demonstration: a synthetic hot key (~96%% of "
    "lineitem collapses onto one join key) would pin one reducer in a "
    "plain sort-merge join; with spark.sql.adaptive.skewJoin enabled "
    "AQE splits the oversized partition into parallel sub-partitions "
    "at runtime — the complement of the static salting in "
    "skew_salted_join. The query body is action-free (the driver gate "
    "executes the returned frame exactly once); the 'skew=true' "
    "finalized-plan assertion lives in tests/test_plan_quality.py::"
    "test_aqe_skew_join_splits, which runs the join under the lowered "
    "skew thresholds and fails if AQE stops splitting. Values are "
    "checked by the oracle on the plain join definition.",
    oracle="""
WITH keyed AS (
  SELECT CASE WHEN l_orderkey % 25 < 24 THEN 0
              ELSE 1 + CAST(l_orderkey % 4 AS BIGINT) END AS skew_key,
         l_extendedprice
  FROM lineitem
),
dim AS (
  SELECT CAST(k AS BIGINT) AS skew_key, 'seg_' || CAST(k AS VARCHAR) AS segment
  FROM (SELECT unnest(range(0, 5)) AS k)
)
SELECT d.segment, CAST(COUNT(1) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(k.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM keyed k JOIN dim d ON d.skew_key = k.skew_key
GROUP BY d.segment
""",
)
def aqe_skew_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return skew_join_frame(spark, sf_dir)


def skew_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skewed join itself, action-free. ~96% of lineitem maps to
    skew_key 0; the 5-row dim is merge-hinted so the join is a real
    shuffle join AQE can split (a broadcast would dissolve the skew and
    prove nothing)."""
    from pyspark.sql import functions as F  # noqa: F811

    from formula_1_spark.sources.tables import fan_out

    # fan_out: the skew reader splits a hot reduce partition by MAP
    # output ranges — a one-split scan gives it nothing to split on.
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
    )
    keyed = li.select(
        F.when(F.col("l_orderkey") % 25 < 24, F.lit(0).cast("bigint"))
        .otherwise(F.lit(1) + (F.col("l_orderkey") % 4).cast("bigint"))
        .alias("skew_key"),
        "l_extendedprice",
    )
    dim = spark.range(0, 5).select(
        F.col("id").alias("skew_key"),
        F.concat(F.lit("seg_"), F.col("id").cast("string")).alias("segment"),
    )
    joined = keyed.join(dim.hint("merge"), "skew_key")
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


def skew_split_confs(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """AQE skew-split conf overrides sized from the fact row count (a
    parquet-footer count) so the hot partition splits into ~8 chunks at
    ANY test scale — fixed tiny thresholds over-split large shuffles
    into hundreds of micro-tasks (measured 10x wall at sf0.1). The
    production defaults (256MB/64MB) achieve the same on real partitions
    without tuning; the force flag stops the cost model vetoing the
    split because the downstream aggregation re-shuffles anyway.
    Used by tests/test_plan_quality.py::test_aqe_skew_join_splits."""
    from formula_1_spark.sources.tables import table_row_count

    n_rows = table_row_count(spark, sf_dir, "lineitem")
    est_hot = max(2048, n_rows * 8)  # ~compressed bytes of the hot key
    advisory = max(1024, est_hot // 8)
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            advisory * 2
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(advisory),
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": str(
            max(1024, advisory // 4)
        ),
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }


# ---------------------------------------------------------------------------
# Blocked fuzzy entity resolution
# ---------------------------------------------------------------------------


@register(
    "entity_resolution_fuzzy",
    ops="EXT-entity-resolution,J4,P7,F-levenshtein (deletion-neighborhood join)",
    doc="Fuzzy entity resolution via deletion-neighborhood join "
    "(FastSS/SymSpell): every name emits itself plus each single-char-"
    "deletion variant; two names at edit distance <= 1 provably share a "
    "variant, so candidates come from ONE equi-join on (nation, "
    "variant) whose buckets hold only true near-duplicates — "
    "near-linear in corpus size where a nation-only (or prefix/suffix "
    "pigeonhole) block degenerates quadratic on this corpus's shared "
    "'Customer#' prefix. Survivors are verified with the JVM "
    "levenshtein codegen expression. The oracle is the naive quadratic "
    "definition, so the blocking is proven lossless, not assumed. No "
    "Python in the loop.",
    oracle="""
SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
       a.c_name AS name_a, b.c_name AS name_b,
       a.c_nationkey AS nationkey,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""",
)
def entity_resolution_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.entity import fuzzy_pairs_lev1

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    pairs = fuzzy_pairs_lev1(
        cust, key_col="c_custkey", name_col="c_name", block_col="c_nationkey"
    )
    return pairs.select(
        F.col("key_a").alias("custkey_a"),
        F.col("key_b").alias("custkey_b"),
        "name_a",
        "name_b",
        F.col("c_nationkey").alias("nationkey"),
        "edit_dist",
    )


# ---------------------------------------------------------------------------
# Per-group exact-percentile quality filter
# ---------------------------------------------------------------------------


@register(
    "quality_quantile_filter",
    ops="EXT-quality-filter,A5,J1,P7 (per-group percentile threshold)",
    doc="Corpus quality gate with per-language thresholds: the exact "
    "25th percentile of document length per language (a tiny aggregate "
    "— one row per language) broadcast back against the corpus; only "
    "documents at or above their language's threshold survive. The "
    "linear interpolation on integer lengths is IEEE-exact in both "
    "engines, so the double threshold is bit-identical.",
    oracle="""
WITH thr AS (
  SELECT lang, quantile_cont(n_chars, 0.25) AS p25
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars, t.p25
FROM documents d JOIN thr t ON t.lang = d.lang
WHERE CAST(d.n_chars AS DOUBLE) >= t.p25
""",
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    thr = docs.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.25)).alias("p25")
    )
    return (
        docs.join(F.broadcast(thr), "lang")
        .filter(F.col("n_chars").cast("double") >= F.col("p25"))
        .select("doc_id", "lang", "n_chars", "p25")
    )


# ---------------------------------------------------------------------------
# Cross-document repeated n-gram spans (exact substring dedup, stage 1)
# ---------------------------------------------------------------------------

_SPAN_N = 8


@register(
    "crossdoc_ngram_spans",
    ops="EXT-dedup-substring,P6,A5 (repeated-span detection)",
    doc="Exact repeated-span detection across documents — the discovery "
    "stage of exact substring dedup (Lee et al. 2022, 'Deduplicating "
    "Training Data Makes Language Models Better'): every token 8-gram "
    "is exploded and grouped once (map-side partial counts); spans seen "
    "in >= 2 distinct documents come back with their document frequency "
    "and total occurrences. All codegen expressions, no Python.",
    oracle=f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
grams AS (
  SELECT doc_id, array_to_string(l[i:i+{_SPAN_N - 1}], ' ') AS span
  FROM toks, unnest(generate_series(1, len(l) - {_SPAN_N - 1})) t(i)
)
SELECT span,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(1) AS n_occurrences
FROM grams
GROUP BY span
HAVING COUNT(DISTINCT doc_id) >= 2
""",
)
def crossdoc_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Split on the single-space delimiter exactly as the oracle does
    # (documents are single-space tokenized at generation time).
    toks = docs.select("doc_id", F.split("text", " ").alias("l"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("l") >= _SPAN_N,
                F.transform(
                    F.sequence(F.lit(0), F.size("l") - F.lit(_SPAN_N)),
                    lambda i: F.concat_ws(" ", F.slice("l", i + 1, _SPAN_N)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("span"),
    )
    return (
        grams.groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# Iterative frontier BFS over the nation trade graph
# ---------------------------------------------------------------------------

_BFS_MAX_HOPS = 6
_TOP_PARTNERS = 3


@register(
    "nation_trade_shortest_path",
    ops="EXT-graph-bfs,A5,W1,J4 (iterative frontier BFS, Pregel-lite)",
    doc="Multi-source shortest hop-counts over a derived trade graph: "
    "edges are each customer-nation's top-3 supplier-nations by line "
    "count (deterministic rank tiebreak on dst), BFS runs 6 frontier "
    "rounds — per-level anti-join keeps distances minimal, per-round "
    "persist bounds recompute, exactly the operators/graph.py "
    "discipline. Integer hop counts make the oracle exact.",
    oracle=f"""
WITH RECURSIVE trade AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(1) AS n
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
e AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rk
    FROM trade
  ) WHERE rk <= {_TOP_PARTNERS}
),
walk(origin, node, d) AS (
  SELECT n_nationkey AS origin, n_nationkey AS node, 0 AS d FROM nation
  UNION
  SELECT w.origin, e.dst, w.d + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.d < {_BFS_MAX_HOPS}
)
SELECT origin, node, CAST(MIN(d) AS INT) AS hops
FROM walk GROUP BY origin, node
""",
)
def nation_trade_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.queries.graph_rank import shared_trade_edges

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    trade = shared_trade_edges(spark, sf_dir)
    rk = F.row_number().over(
        Window.partitionBy("src").orderBy(F.col("n").desc(), F.col("dst"))
    )
    edges = (
        trade.withColumn("rk", rk)
        .filter(F.col("rk") <= _TOP_PARTNERS)
        .select("src", "dst")
        .persist()
    )

    dist = nation.select(
        F.col("n_nationkey").alias("origin"),
        F.col("n_nationkey").alias("node"),
        F.lit(0).alias("hops"),
    ).persist()
    frontier = dist
    for step in range(1, _BFS_MAX_HOPS + 1):
        moved = (
            frontier.join(edges, frontier.node == edges.src)
            .select("origin", F.col("dst").alias("node"), F.lit(step).alias("hops"))
            .distinct()
        )
        # BFS invariant: first sighting is the minimal hop count, so any
        # (origin, node) already in dist must not be re-added.
        frontier = moved.join(dist, ["origin", "node"], "left_anti").persist()
        if frontier.isEmpty():
            break
        nxt = dist.union(frontier).persist()
        dist.unpersist()
        dist = nxt
    edges.unpersist()
    return dist.select("origin", "node", F.col("hops").cast("int").alias("hops"))
