"""Weighted PageRank over the nation trade graph — exact-integer iterate.

Completes the graph-operator family (connected components for dedup
clusters, frontier BFS for shortest paths) with the canonical iterative
link-analysis algorithm, kept bit-exact cross-engine by quantized
integer arithmetic (see ``operators/graph.pagerank_quantized``). The
oracle unrolls the same ``_ITERS`` iterations as static CTEs.

Reference scope note: the reference (uwe-uffuchs/formula-1) has no graph
surface; extension operator per SURVEY.md §2's "beyond the reference"
list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.operators.graph import PR_SCALE, pagerank_quantized
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table

_ITERS = 8
_DAMP = 85

_TRADE_CTE = """
trade AS MATERIALIZED (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
         CAST(COUNT(1) AS BIGINT) AS n
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
outw AS MATERIALIZED (SELECT src, CAST(SUM(n) AS BIGINT) AS ow FROM trade GROUP BY src),
nn AS (SELECT CAST(COUNT(1) AS BIGINT) AS n_nodes FROM nation)
"""

# Six graph queries (pagerank, HITS, triangles, k-core, LPA, shortest
# path) each recomputed the IDENTICAL corpus-scale trade aggregate —
# lineitem ⋈ orders ⋈ customer ⋈ supplier → (src, dst, line count) —
# before doing nation-grain work on its <= 25^2 rows. The aggregate is
# memoized per (session, lineitem identity) as an eager localCheckpoint
# (the graph-side twin of dedup._shared_relations and
# dedup._SEM_SHARED), so the corpus joins run ONCE per session and every
# family member starts from the ~600-row checkpoint. Values unaffected:
# the aggregate is an exact integer relation, each query's edge list is
# derived from it by exact algebra (distinct keys / orientation-collapsed
# sums), and every oracle still recomputes trade from the base tables —
# a stale memo would hash-mismatch. trade_reach_recursive_sql is NOT
# rewired: its contract is one WITH RECURSIVE text run verbatim by both
# engines.
_TRADE_SHARED: dict[tuple, DataFrame] = {}


def shared_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized directed nation trade aggregate: (src, dst, n) with
    src <> dst, n = exact line count (LongType) — bit-identical to the
    inline aggregate every family member previously built."""
    from formula_1_spark.queries import memo

    key = memo.file_key(spark, sf_dir, "lineitem")
    ent = memo.get(_TRADE_SHARED, key)
    if ent is None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        )
        supp = load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        )
        ent = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .filter(F.col("c_nationkey") != F.col("s_nationkey"))
            .groupBy(
                F.col("c_nationkey").alias("src"),
                F.col("s_nationkey").alias("dst"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        memo.install(_TRADE_SHARED, key, ent)
    return ent


def shared_trade_edges_undirected(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(a, b, n) with a = least(src, dst), b = greatest, n = summed line
    count — the orientation-collapsed form k-core and LPA previously
    aggregated from line grain (sum of the <= 2 directed counts per
    unordered pair is exactly the line-grain count)."""
    return (
        shared_trade_edges(spark, sf_dir)
        .groupBy(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def _pagerank_ctes(iters: int) -> str:
    """Unrolled per-iteration CTE chain mirroring pagerank_quantized."""
    tele = (
        f"(((100 - {_DAMP}) * ({PR_SCALE} // (SELECT n_nodes FROM nn))) // 100)"
    )
    parts = [
        f"pr0 AS MATERIALIZED (SELECT n_nationkey AS node, "
        f"{PR_SCALE} // (SELECT n_nodes FROM nn) AS pr_q FROM nation)"
    ]
    for i in range(iters):
        parts.append(
            f"c{i} AS MATERIALIZED (\n"
            f"  SELECT e.dst AS node, CAST(SUM((p.pr_q * e.n) // o.ow) AS BIGINT) AS m\n"
            f"  FROM trade e JOIN outw o ON o.src = e.src\n"
            f"  JOIN pr{i} p ON p.node = e.src\n"
            f"  GROUP BY e.dst\n)"
        )
        parts.append(
            f"pr{i + 1} AS MATERIALIZED (\n"
            f"  SELECT p.node,\n"
            f"         {tele} + ({_DAMP} * COALESCE(c.m, 0)) // 100 AS pr_q\n"
            f"  FROM pr{i} p LEFT JOIN c{i} c ON c.node = p.node\n)"
        )
    return ",\n".join(parts)


@register(
    "nation_trade_pagerank",
    ops="EXT-graph-pagerank,A5,J4,W2 (iterative link analysis)",
    doc=f"Weighted PageRank ({_ITERS} iterations, damping 0.85) over the "
    "nation trade graph (edge weight = line count between customer and "
    "supplier nations). Every iteration is exact scaled-bigint "
    "arithmetic — floor-divided redistributions and integer sums — so "
    "the result is bit-identical regardless of engine or aggregation "
    "order, and the oracle replays the identical unrolled iterations. "
    "Per iteration: one source-keyed join of the rank relation with the "
    "persisted out-weighted edges + one map-side-combined groupBy on "
    "destination — the canonical distributed PageRank shape.",
    oracle=f"""
WITH {_TRADE_CTE},
{_pagerank_ctes(_ITERS)}
SELECT node, pr_q,
       CAST(pr_q AS DOUBLE) / {float(PR_SCALE)!r} AS pr,
       CAST(RANK() OVER (ORDER BY pr_q DESC, node ASC) AS INT) AS rank
FROM pr{_ITERS}
""",
)
def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    trade = shared_trade_edges(spark, sf_dir)
    pr = pagerank_quantized(nation, trade, iters=_ITERS, damping_pct=_DAMP)
    return pr.select(
        "node",
        "pr_q",
        (F.col("pr_q").cast("double") / F.lit(float(PR_SCALE))).alias("pr"),
        F.rank()
        .over(Window.orderBy(F.desc("pr_q"), F.asc("node")))
        .cast("int")
        .alias("rank"),
    )


@register(
    "nation_trade_triangles",
    ops="EXT-graph-triangles,J1 (oriented triangle enumeration)",
    doc="Triangle enumeration over the undirected nation trade graph: "
    "edges oriented low-key→high-key, then the standard two-join "
    "oriented wedge-close (e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) with a<b<c) — "
    "each triangle found exactly once. At corpus scale the orientation "
    "is by DEGREE (low-degree endpoint first), which bounds wedge "
    "fanout by the max low-degree; on the 25-node nation graph the "
    "key orientation is equivalent and the edge list broadcasts.",
    oracle=f"""
WITH {_TRADE_CTE},
edges AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM trade
)
SELECT e1.a AS nation_a, e1.b AS nation_b, e2.b AS nation_c
FROM edges e1
JOIN edges e2 ON e2.a = e1.b
JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
""",
)
def nation_trade_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The distinct unordered pairs of the line-grain trade relation are
    # exactly the distinct unordered pairs of its (src, dst) aggregate
    # keys — derive from the memoized aggregate, not a fresh corpus join.
    trade = shared_trade_edges(spark, sf_dir)
    edges = trade.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    e1 = edges.select(F.col("a"), F.col("b"))
    e2 = edges.select(F.col("a").alias("b2a"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("e3a"), F.col("b").alias("e3b"))
    return (
        e1.join(F.broadcast(e2), F.col("b") == F.col("b2a"))
        .join(
            F.broadcast(e3),
            (F.col("e3a") == F.col("a")) & (F.col("e3b") == F.col("c")),
            "left_semi",
        )
        .select(
            F.col("a").alias("nation_a"),
            F.col("b").alias("nation_b"),
            F.col("c").alias("nation_c"),
        )
    )


# ---------------------------------------------------------------------------
# Native recursive CTE (Spark 4 WITH RECURSIVE) — reachability profile
# ---------------------------------------------------------------------------

_REACH_HOPS = 4
_REACH_TOP = 3

# ONE SQL text, run verbatim by BOTH engines: Spark 4.x executes WITH
# RECURSIVE natively (each recursion level is a distributed join against
# the previous level's result — the engine-native replacement for the
# driver-side frontier loop in nation_trade_shortest_path), and DuckDB
# runs the identical ANSI text as the oracle. UNION ALL + MIN(d) instead
# of UNION keeps the recursive member cheap (no per-level distinct); the
# path fan-out is bounded by top-3 edges per node and 4 levels.
_REACH_SQL = f"""
WITH RECURSIVE trade AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, COUNT(1) AS n
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY c.c_nationkey, s.s_nationkey
),
e AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rk
    FROM trade
  ) ranked WHERE rk <= {_REACH_TOP}
),
walk(origin, node, d) AS (
  SELECT n_nationkey AS origin, n_nationkey AS node, 0 AS d FROM nation
  UNION ALL
  SELECT w.origin, e.dst, w.d + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.d < {_REACH_HOPS}
),
min_hops AS (
  SELECT origin, node, MIN(d) AS hops FROM walk GROUP BY origin, node
)
SELECT origin, CAST(hops AS INT) AS hops,
       CAST(COUNT(1) AS BIGINT) AS n_reachable
FROM min_hops
GROUP BY origin, hops
ORDER BY origin, hops
"""


@register(
    "trade_reach_recursive_sql",
    ops="EXT-recursive-cte,A5,J5 (native WITH RECURSIVE reachability)",
    doc="Engine-native recursive CTE (Spark 4 WITH RECURSIVE): hop-count "
    "reachability profile over the top-3 trade-partner graph — how many "
    "nations each origin first reaches at hop d. The SAME SQL text runs "
    "on Spark (each recursion level a distributed join) and DuckDB. "
    "UNION ALL + MIN(d) bounds the recursive member (no per-level "
    "distinct); fan-out capped by top-3 edges x 4 levels. The declarative "
    "counterpart of nation_trade_shortest_path's driver-side frontier "
    "loop (operators/graph.py discipline).",
    oracle=_REACH_SQL,
)
def trade_reach_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import load_tables

    load_tables(
        spark,
        sf_dir,
        ["lineitem", "orders", "customer", "supplier", "nation"],
        register=True,
    )
    return spark.sql(_REACH_SQL)


# ---------------------------------------------------------------------------
# k-core membership by unrolled peeling (round 7)
# ---------------------------------------------------------------------------

_KCORE_K = 10
_KCORE_PEELS = 4

_KCORE_EDGE_CTES = """
trade AS (
  SELECT LEAST(c.c_nationkey, s.s_nationkey) AS a,
         GREATEST(c.c_nationkey, s.s_nationkey) AS b,
         CAST(COUNT(1) AS BIGINT) AS n
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
med AS (SELECT quantile_cont(n, 0.5) AS m FROM trade),
e0 AS MATERIALIZED (SELECT a, b FROM trade, med WHERE n > m)"""


def _kcore_oracle(k: int = _KCORE_K, peels: int = _KCORE_PEELS) -> str:
    parts = [_KCORE_EDGE_CTES]
    parts.append("""d0 AS MATERIALIZED (
  SELECT node, CAST(COUNT(1) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) u GROUP BY node
)""")
    for t in range(1, peels + 1):
        parts.append(
            f"alive{t} AS (SELECT node FROM d{t - 1} WHERE degree >= {k})"
        )
        parts.append(f"""e{t} AS MATERIALIZED (
  SELECT e.a, e.b FROM e0 e
  JOIN alive{t} x ON x.node = e.a
  JOIN alive{t} y ON y.node = e.b
)""")
        parts.append(f"""d{t} AS MATERIALIZED (
  SELECT node, CAST(COUNT(1) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM e{t} UNION ALL SELECT b FROM e{t}) u GROUP BY node
)""")
    parts.append(f"""core AS (SELECT node FROM d{peels} WHERE degree >= {k}),
conv AS (
  SELECT (SELECT COUNT(1) FROM core)
       = (SELECT COUNT(1) FROM d{peels - 1} WHERE degree >= {k}) AS converged
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT d.node, d.degree AS degree0,
       c.node IS NOT NULL AS in_core,
       (SELECT converged FROM conv) AS converged
FROM d0 d LEFT JOIN core c ON c.node = d.node
ORDER BY d.node
"""
    )


@register(
    "trade_kcore_membership",
    ops="EXT-graph-kcore,A1,J-semi (iterative peeling, unrolled)",
    doc=f"k-core decomposition of the median-thresholded nation trade "
    f"graph (edges above the median weight — a scale-invariant "
    f"sparsifier) by {_KCORE_PEELS} unrolled peeling rounds: each round "
    f"recomputes degrees and drops nodes under k={_KCORE_K}, "
    "declaratively (semi-joins on the alive set — no driver loop). "
    "Emits every node's initial degree, core membership, and whether "
    "the peel CONVERGED by the last round (the honest fixpoint flag: "
    "on a graph where 4 rounds don't reach fixpoint the flag reads "
    "false rather than silently reporting a non-core). Degrees are "
    "domain-bounded (<= 25 nations); the only corpus-scale work is the "
    "one trade aggregate.",
    oracle=_kcore_oracle(),
)
def trade_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    trade = shared_trade_edges_undirected(spark, sf_dir)
    med = trade.agg(F.expr("percentile(n, 0.5)").alias("m"))
    e0 = (
        trade.join(F.broadcast(med))
        .filter(F.col("n") > F.col("m"))
        .select("a", "b")
        # EAGER: ~300 rows, but ~10 downstream subtrees (alive broadcasts,
        # per-peel degrees, the convergence scalars) each replan from it —
        # lazy materialization lets every subtree re-run the corpus join
        .localCheckpoint(eager=True)
    )

    def degrees(e):
        return (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        )

    d0 = degrees(e0)
    d_prev, e_prev = d0, e0
    alive_prev_count = None
    for _ in range(_KCORE_PEELS):
        # EAGER checkpoint of the <= 25-row alive set each round: without
        # it every peel's plan embeds the previous peel's full lineage
        # THREE times (e_prev + two alive broadcasts), and planning time
        # grows exponentially with peel count (measured 12s at peel 3)
        alive = (
            d_prev.filter(F.col("degree") >= _KCORE_K)
            .select("node")
            .localCheckpoint(eager=True)
        )
        e_cur = e_prev.join(
            F.broadcast(alive.select(F.col("node").alias("a"))), "a"
        ).join(F.broadcast(alive.select(F.col("node").alias("b"))), "b")
        d_prev, e_prev = degrees(e_cur), e_cur
        alive_prev_count = alive
    core = d_prev.filter(F.col("degree") >= _KCORE_K).select("node")
    conv = (
        core.agg(F.count(F.lit(1)).alias("c_final"))
        .join(
            F.broadcast(
                alive_prev_count.agg(F.count(F.lit(1)).alias("c_prev"))
            )
        )
        .select((F.col("c_final") == F.col("c_prev")).alias("converged"))
    )
    return (
        d0.join(
            core.withColumn("in_core_f", F.lit(1)), "node", "left"
        )
        .join(F.broadcast(conv))
        .select(
            "node",
            F.col("degree").alias("degree0"),
            F.col("in_core_f").isNotNull().alias("in_core"),
            "converged",
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Part co-purchase clustering coefficient (round 8)
# ---------------------------------------------------------------------------

_CP_SUP = 2  # minimum co-purchase support for an edge


@register(
    "part_copurchase_clustering",
    ops="EXT-graph-clustering,J1,A1 (local clustering coefficient)",
    doc="Per-part local clustering coefficient over the DATA-SCALE "
    "co-purchase graph (edges = part pairs bought together in >= 2 "
    "orders): cc = 2T / (d(d-1)) in integer ppm — the community-"
    "tightness signal nation_trade_triangles' 25-node demo cannot "
    "give. Scale shape: the pair join is keyed per ORDER and bounded "
    "by basket size (TPC-H <= 7 parts/order), the support threshold "
    "prunes the edge list BEFORE any wedge work, and triangles close "
    "on the low-key orientation (at web scale: low-DEGREE orientation, "
    "same two-join shape). Each triangle credits its 3 corners via one "
    "explode; degree and triangle counts meet in one bounded join.",
    oracle=f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS MATERIALIZED (
  SELECT a.l_partkey AS a, bb.l_partkey AS b
  FROM b a JOIN b bb
    ON bb.l_orderkey = a.l_orderkey AND a.l_partkey < bb.l_partkey
  GROUP BY 1, 2 HAVING COUNT(1) >= {_CP_SUP}
),
deg AS (
  SELECT node, CAST(COUNT(1) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM edges UNION ALL SELECT b FROM edges) u
  GROUP BY node
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcount AS (
  SELECT node, CAST(COUNT(1) AS BIGINT) AS triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri) c
  GROUP BY node
)
SELECT d.node AS p_partkey, d.degree,
       CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
       CAST(COALESCE(t.triangles, 0) * 2000000
            // (d.degree * (d.degree - 1)) AS BIGINT) AS cc_ppm
FROM deg d LEFT JOIN tcount t USING (node)
WHERE d.degree >= 2
ORDER BY p_partkey
""",
)
def part_copurchase_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("a"))
    bb = li.select(F.col("l_orderkey"), F.col("l_partkey").alias("b"))
    edges = (
        a.join(bb, "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _CP_SUP)
        .select("a", "b")
        .localCheckpoint(eager=False)  # read 5x (degree x2, wedge x3)
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    tcount = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    return (
        deg.join(tcount, "node", "left")
        .filter(F.col("degree") >= 2)
        .select(
            F.col("node").alias("p_partkey"),
            "degree",
            F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
            F.expr(
                "cast((coalesce(triangles, 0) * 2000000)"
                " div (degree * (degree - 1)) as bigint)"
            ).alias("cc_ppm"),
        )
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# HITS hubs/authorities (round 9)
# ---------------------------------------------------------------------------

_HITS_ITERS = 6


def _hits_ctes(iters: int) -> str:
    """Unrolled per-iteration CTE chain mirroring hits_quantized."""
    from formula_1_spark.operators.graph import HITS_SCALE

    rescale = (
        "CAST(COALESCE({r}, 0) // GREATEST(SUM(COALESCE({r}, 0)) OVER () "
        f"// {HITS_SCALE}, 1) AS BIGINT)"
    )
    parts = [
        f"h0 AS MATERIALIZED (SELECT n_nationkey AS node, "
        f"CAST({HITS_SCALE} AS BIGINT) AS h_q FROM nation)"
    ]
    for i in range(iters):
        parts.append(
            f"araw{i} AS MATERIALIZED (\n"
            f"  SELECT e.dst AS node, CAST(SUM(e.n * h.h_q) AS BIGINT) AS r\n"
            f"  FROM trade e JOIN h{i} h ON h.node = e.src GROUP BY e.dst\n)"
        )
        parts.append(
            f"a{i + 1} AS MATERIALIZED (\n"
            f"  SELECT n.n_nationkey AS node,\n"
            f"         {rescale.format(r='ar.r')} AS a_q\n"
            f"  FROM nation n LEFT JOIN araw{i} ar ON ar.node = n.n_nationkey\n)"
        )
        parts.append(
            f"hraw{i} AS MATERIALIZED (\n"
            f"  SELECT e.src AS node, CAST(SUM(e.n * aa.a_q) AS BIGINT) AS r\n"
            f"  FROM trade e JOIN a{i + 1} aa ON aa.node = e.dst GROUP BY e.src\n)"
        )
        parts.append(
            f"h{i + 1} AS MATERIALIZED (\n"
            f"  SELECT n.n_nationkey AS node,\n"
            f"         {rescale.format(r='hr.r')} AS h_q\n"
            f"  FROM nation n LEFT JOIN hraw{i} hr ON hr.node = n.n_nationkey\n)"
        )
    return ",\n".join(parts)


@register(
    "trade_hits_hubs_authorities",
    ops="EXT-graph-hits,A5,J4,W2 (mutual-reinforcement link analysis)",
    doc=f"Weighted HITS ({_HITS_ITERS} iterations) over the directed "
    "nation trade graph: hub score = how much a customer nation's "
    "spending flows to authoritative supplier nations, authority = how "
    "much supply flows from strong hubs — the complementary centrality "
    "to PageRank (which only follows in-links). Every half-iteration is "
    "exact scaled-bigint arithmetic with a deterministic floor-division "
    "rescale (operators/graph.hits_quantized), so the result is "
    "bit-identical across engines and aggregation orders; the oracle "
    "replays the identical unrolled iterations. Per half-iteration: one "
    "key join + one map-side-combined groupBy — the same distributed "
    "shape as PageRank; node-grain relations stay tiny at any corpus "
    "scale.",
    oracle=f"""
WITH {_TRADE_CTE},
{{hits_ctes}}
SELECT h.node, h.h_q AS hub_q, a.a_q AS auth_q,
       CAST(RANK() OVER (ORDER BY h.h_q DESC, h.node ASC) AS INTEGER)
         AS hub_rank,
       CAST(RANK() OVER (ORDER BY a.a_q DESC, a.node ASC) AS INTEGER)
         AS auth_rank
FROM h{_HITS_ITERS} h JOIN a{_HITS_ITERS} a ON a.node = h.node
""".replace("{hits_ctes}", _hits_ctes(_HITS_ITERS)),
)
def trade_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.graph import hits_quantized

    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    trade = shared_trade_edges(spark, sf_dir)
    scores = hits_quantized(nation, trade, iters=_HITS_ITERS)
    return scores.select(
        "node",
        F.col("h_q").alias("hub_q"),
        F.col("a_q").alias("auth_q"),
        F.rank()
        .over(Window.orderBy(F.desc("h_q"), F.asc("node")))
        .cast("int")
        .alias("hub_rank"),
        F.rank()
        .over(Window.orderBy(F.desc("a_q"), F.asc("node")))
        .cast("int")
        .alias("auth_rank"),
    )


# ---------------------------------------------------------------------------
# Label-propagation communities (round 10)
# ---------------------------------------------------------------------------

_LPA_ITERS = 3


def _lpa_ctes(iters: int) -> str:
    """Unrolled synchronous LPA rounds mirroring operators/graph.py
    label_propagation — argmax of neighbor-label weight, ties to the
    smallest label, zero-weight self-loops keep isolated nodes present."""
    parts = [
        """und AS MATERIALIZED (
  SELECT a AS src, b AS dst, n AS w FROM e0
  UNION ALL SELECT b, a, n FROM e0
  UNION ALL SELECT n_nationkey, n_nationkey, 0 FROM nation
)""",
        "lbl0 AS (SELECT n_nationkey AS node, n_nationkey AS lbl FROM nation)",
    ]
    for i in range(iters):
        parts.append(
            f"s{i} AS (\n"
            f"  SELECT e.dst AS node, l.lbl, CAST(SUM(e.w) AS BIGINT) AS s\n"
            f"  FROM und e JOIN lbl{i} l ON l.node = e.src GROUP BY 1, 2\n)"
        )
        parts.append(
            f"lbl{i + 1} AS MATERIALIZED (\n"
            f"  SELECT node, lbl FROM (\n"
            f"    SELECT node, lbl, ROW_NUMBER() OVER (\n"
            f"      PARTITION BY node ORDER BY s DESC, lbl ASC) AS r\n"
            f"    FROM s{i}) WHERE r = 1\n)"
        )
    return ",\n".join(parts)


@register(
    "label_propagation_communities",
    ops="EXT-graph-lpa,A1,W1 (synchronous label propagation)",
    doc=f"Community detection by synchronous weighted label propagation "
    f"(Raghavan et al. 2007), {_LPA_ITERS} rounds over the "
    "median-thresholded undirected nation trade graph (the same "
    "scale-invariant sparsifier as trade_kcore_membership — the full "
    "graph is near-complete and collapses to one community). Fully "
    "deterministic: integer edge weights, argmax by (weight DESC, label "
    "ASC), zero-weight self-loops keep isolated nations present without "
    "referencing the label relation twice per round (plan grows "
    "linearly in rounds — operators/graph.py label_propagation). Emits "
    "each nation's final community, the community size, and the "
    "size-rank. The only corpus-scale work is the one trade aggregate; "
    "every LPA round is nation-grain.",
    oracle=f"""
WITH {_KCORE_EDGE_CTES.replace("SELECT a, b FROM trade", "SELECT a, b, n FROM trade")},
{_lpa_ctes(_LPA_ITERS)},
comm AS (
  SELECT lbl AS community, CAST(COUNT(1) AS BIGINT) AS comm_size
  FROM lbl{_LPA_ITERS} GROUP BY lbl
)
SELECT l.node, CAST(l.lbl AS BIGINT) AS community, c.comm_size,
       CAST(DENSE_RANK() OVER (ORDER BY c.comm_size DESC, l.lbl ASC)
            AS INT) AS comm_rank
FROM lbl{_LPA_ITERS} l JOIN comm c ON c.community = l.lbl
ORDER BY l.node
""",
)
def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.graph import label_propagation

    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    trade = shared_trade_edges_undirected(spark, sf_dir)
    med = trade.agg(F.expr("percentile(n, 0.5)").alias("m"))
    # EAGER: <= 300 edge rows feeding 2 * iters downstream subtrees — lazy
    # materialization would replan the corpus join per subtree (the same
    # reasoning as trade_kcore_membership's e0 checkpoint).
    e0 = (
        trade.join(F.broadcast(med))
        .filter(F.col("n") > F.col("m"))
        .select("a", "b", "n")
        .localCheckpoint(eager=True)
    )
    und = e0.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), F.col("n").alias("w")
    ).unionByName(
        e0.select(
            F.col("b").alias("src"), F.col("a").alias("dst"), F.col("n").alias("w")
        )
    )
    lbl = label_propagation(nation, und, iters=_LPA_ITERS)
    comm = lbl.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("comm_size")
    )
    return (
        lbl.join(F.broadcast(comm), "lbl")
        .select(
            "node",
            F.col("lbl").cast("bigint").alias("community"),
            "comm_size",
            F.dense_rank()
            .over(Window.orderBy(F.desc("comm_size"), F.asc("lbl")))
            .cast("int")
            .alias("comm_rank"),
        )
        .orderBy("node")
    )
