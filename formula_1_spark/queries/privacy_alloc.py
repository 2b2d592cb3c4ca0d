"""Privacy-publishing + exact-allocation operators (round 5, slate 5):
the governance math a pipeline runs before releasing aggregates or
drawing a fixed-size corpus sample.

* ``ldiversity_audit`` — l-diversity (Machanavajjhala et al., ICDE
  2006) complements the existing k-anonymity audit: a quasi-identifier
  group is unsafe when its SENSITIVE attribute (order priority) takes
  fewer than l distinct values, even if the group itself is large.
  QI = (customer nation, market segment, order year); two aggregates,
  both on high-cardinality-spreadable keys.
* ``proportional_allocation_plan`` — largest-remainder (Hamilton)
  apportionment: allocate an exact N-doc sampling budget across
  (lang, source) strata so that every stratum gets floor(N*n/T) and
  the N - sum(floor) leftovers go to the largest remainders
  (deterministic tie-break). Pure integer math; the only window runs
  on the bounded stratum relation (langs x sources), never on rows.
* ``small_cell_suppression`` — statistical-disclosure control: cells
  of the (customer, order priority) contingency table with fewer than 5
  orders are suppressed before publication; reports per priority how
  much volume suppression costs. Cell keys are customer-grain —
  high-cardinality, spreadable.

All ppm columns are integer ``div`` with decimal(38,0) lifts where a
corpus-scale sum crosses int64 after the 1e6 multiply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import fan_out, load_table

_PPM = 1_000_000

_L_MIN = 3  # a QI group needs >= 3 distinct priorities to be safe


@register(
    "ldiversity_audit",
    ops="EXT-ldiversity,J1,A1,A5 (sensitive-attribute diversity audit)",
    doc="l-diversity audit: QI = (nation, market segment, order year), "
    "sensitive attribute = order priority. A group with fewer than 3 "
    "distinct priorities lets an attacker who can place a customer in "
    "the group infer their order behavior, however large the group. "
    "Per market segment: QI groups, failing groups, priority-singleton "
    "groups, min/max distinct priorities, at-risk orders and ppm.",
    oracle=f"""
WITH qid AS (
  SELECT c.c_mktsegment,
         c.c_nationkey,
         CAST(year(o.o_orderdate) AS INTEGER) AS yr,
         CAST(COUNT(1) AS BIGINT) AS k,
         CAST(COUNT(DISTINCT o.o_orderpriority) AS BIGINT) AS l
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_nationkey, yr
)
SELECT c_mktsegment,
       CAST(COUNT(1) AS BIGINT) AS qid_groups,
       CAST(SUM(CASE WHEN l < {_L_MIN} THEN 1 ELSE 0 END) AS BIGINT)
         AS failing_groups,
       CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS singleton_groups,
       CAST(MIN(l) AS BIGINT) AS min_l,
       CAST(MAX(l) AS BIGINT) AS max_l,
       CAST(SUM(CASE WHEN l < {_L_MIN} THEN k ELSE 0 END) AS BIGINT)
         AS orders_at_risk,
       CAST(SUM(CASE WHEN l < {_L_MIN} THEN k ELSE 0 END) * {_PPM}
            // SUM(k) AS BIGINT) AS at_risk_ppm
FROM qid
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = fan_out(load_table(spark, sf_dir, "orders"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    qid = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "c_mktsegment",
            "c_nationkey",
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("o_orderpriority").alias("l"),
        )
    )
    risk = F.sum(F.when(F.col("l") < _L_MIN, F.col("k")).otherwise(0))
    return (
        qid.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("qid_groups"),
            F.sum(
                F.when(F.col("l") < _L_MIN, 1).otherwise(0)
            ).alias("failing_groups"),
            F.sum(F.when(F.col("l") == 1, 1).otherwise(0)).alias(
                "singleton_groups"
            ),
            F.min("l").alias("min_l"),
            F.max("l").alias("max_l"),
            risk.alias("orders_at_risk"),
            # decimal lift: at-risk order counts * 1e6 cross int64 at
            # warehouse scale
            F.expr(
                "(cast(sum(CASE WHEN l < 3 THEN k ELSE 0 END)"
                f" as decimal(38,0)) * {_PPM}) div sum(k)"
            ).alias("at_risk_ppm"),
        )
        .orderBy("c_mktsegment")
    )


_ALLOC_N = 1000  # total sampling budget to apportion


@register(
    "proportional_allocation_plan",
    ops="EXT-allocation,A1,W2 (largest-remainder sampling apportionment)",
    doc="Hamilton / largest-remainder apportionment of an exact "
    "1000-doc sampling budget across (lang, source) strata: every "
    "stratum gets floor(N*n/T); the N - sum(floor) leftover seats go "
    "to the largest remainders (ties: lang, source). Integer-exact — "
    "allocations sum to N by construction. The ranking window runs on "
    "the aggregated stratum relation, whose size is bounded by "
    "langs x sources at any corpus scale.",
    oracle=f"""
WITH strata AS (
  SELECT lang, source, CAST(COUNT(1) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang, source
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t FROM strata),
quota AS (
  SELECT s.lang, s.source, s.n_docs,
         CAST(({_ALLOC_N} * s.n_docs) // t.t AS BIGINT) AS quota_base,
         CAST(({_ALLOC_N} * s.n_docs) % t.t AS BIGINT) AS remainder
  FROM strata s CROSS JOIN tot t
),
leftover AS (
  SELECT CAST({_ALLOC_N} - SUM(quota_base) AS BIGINT) AS extras
  FROM quota
),
ranked AS (
  SELECT q.*, l.extras,
         CAST(ROW_NUMBER() OVER (
           ORDER BY q.remainder DESC, q.lang, q.source) AS BIGINT) AS rk
  FROM quota q CROSS JOIN leftover l
)
SELECT lang, source, n_docs, quota_base, remainder,
       CAST(CASE WHEN rk <= extras THEN 1 ELSE 0 END AS BIGINT)
         AS got_extra,
       CAST(quota_base
            + CASE WHEN rk <= extras THEN 1 ELSE 0 END AS BIGINT)
         AS allocated
FROM ranked
ORDER BY lang, source
""",
)
def proportional_allocation_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # The stratum relation is referenced three times (quota, total,
    # leftover); persist it so the corpus is scanned ONCE, not per
    # reference — it is bounded at langs x sources rows at any scale.
    strata = (
        docs.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .persist()
    )
    tot = strata.agg(F.sum("n_docs").alias("t"))
    quota = strata.join(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        F.expr(f"({_ALLOC_N} * n_docs) div t").alias("quota_base"),
        F.expr(f"({_ALLOC_N} * n_docs) % t").alias("remainder"),
    )
    leftover = quota.agg(
        (F.lit(_ALLOC_N) - F.sum("quota_base")).alias("extras")
    )
    # Bounded post-agg window: the stratum relation is langs x sources
    # rows at ANY corpus scale, so a global ordering here is safe.
    rk = F.row_number().over(
        Window.orderBy(F.desc("remainder"), F.asc("lang"), F.asc("source"))
    )
    return (
        quota.join(F.broadcast(leftover))
        .withColumn("rk", rk.cast("bigint"))
        .select(
            "lang",
            "source",
            "n_docs",
            "quota_base",
            "remainder",
            F.when(F.col("rk") <= F.col("extras"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("got_extra"),
            (
                F.col("quota_base")
                + F.when(F.col("rk") <= F.col("extras"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("allocated"),
        )
        .orderBy("lang", "source")
    )


_CELL_MIN = 5  # publication threshold: cells below this are suppressed


@register(
    "small_cell_suppression",
    ops="EXT-suppression,A1,A5 (statistical disclosure control)",
    doc="Small-cell suppression before publishing the (customer, order "
    "priority) contingency table: cells with fewer than 5 orders are "
    "withheld. Per priority: cells, suppressed cells, suppressed and "
    "published order volume, suppression ppm. Cell keys are "
    "customer-grain (high cardinality) — the aggregate spreads.",
    oracle=f"""
WITH cells AS (
  SELECT o_custkey, o_orderpriority, CAST(COUNT(1) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey, o_orderpriority
)
SELECT o_orderpriority,
       CAST(COUNT(1) AS BIGINT) AS cells,
       CAST(SUM(CASE WHEN n < {_CELL_MIN} THEN 1 ELSE 0 END) AS BIGINT)
         AS suppressed_cells,
       CAST(SUM(CASE WHEN n < {_CELL_MIN} THEN n ELSE 0 END) AS BIGINT)
         AS suppressed_orders,
       CAST(SUM(CASE WHEN n >= {_CELL_MIN} THEN n ELSE 0 END) AS BIGINT)
         AS published_orders,
       CAST(SUM(CASE WHEN n < {_CELL_MIN} THEN n ELSE 0 END) * {_PPM}
            // SUM(n) AS BIGINT) AS suppressed_ppm
FROM cells
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def small_cell_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = fan_out(load_table(spark, sf_dir, "orders"))
    cells = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        cells.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cells"),
            F.sum(
                F.when(F.col("n") < _CELL_MIN, 1).otherwise(0)
            ).alias("suppressed_cells"),
            F.sum(
                F.when(F.col("n") < _CELL_MIN, F.col("n")).otherwise(0)
            ).alias("suppressed_orders"),
            F.sum(
                F.when(F.col("n") >= _CELL_MIN, F.col("n")).otherwise(0)
            ).alias("published_orders"),
            # decimal lift: order volume * 1e6 crosses int64 at scale
            F.expr(
                "(cast(sum(CASE WHEN n < 5 THEN n ELSE 0 END)"
                f" as decimal(38,0)) * {_PPM}) div sum(n)"
            ).alias("suppressed_ppm"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Neyman (optimal) allocation (round 8)
# ---------------------------------------------------------------------------

_NEY_N = 500  # total sampling budget


@register(
    "neyman_allocation_plan",
    ops="EXT-allocation,A1,W2 (Neyman optimal stratified allocation)",
    doc="Neyman optimal allocation of a 500-doc sampling budget across "
    "sources: n_h proportional to N_h * sigma_h (stratum size x token-"
    "count stddev), the allocation minimizing the stratified-mean "
    "variance at fixed budget (Neyman 1934) — proportional_allocation_"
    "plan's size-only apportionment upgraded with the variance signal. "
    "sigma comes from EXACT integer sufficient statistics (n, sum x, "
    "sum x^2 as bigints; one IEEE sqrt floor-quantized to ppm), weights "
    "are exact bigints, and seats apportion by largest remainder, so "
    "allocations sum to the budget by construction and the whole plan "
    "is bit-exact cross-engine. Zero-variance strata honestly get 0.",
    oracle=f"""
WITH stats AS (
  SELECT source,
         CAST(COUNT(1) AS BIGINT) AS n_docs,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sx2
  FROM (SELECT source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                 AS x
        FROM documents) q
  GROUP BY source
),
sig AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs * sx2 - sx * sx AS DOUBLE))
                    * 1000000.0 / n_docs) AS BIGINT) AS sigma_ppm
  FROM stats
),
w AS (
  SELECT source, n_docs, sigma_ppm,
         CAST(n_docs * sigma_ppm AS BIGINT) AS wt
  FROM sig
),
tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS t FROM w),
quota AS (
  SELECT w.source, w.n_docs, w.sigma_ppm,
         CAST(({_NEY_N} * w.wt) // t.t AS BIGINT) AS quota_base,
         CAST(({_NEY_N} * w.wt) % t.t AS BIGINT) AS remainder
  FROM w CROSS JOIN tot t
),
leftover AS (
  SELECT CAST({_NEY_N} - SUM(quota_base) AS BIGINT) AS extras FROM quota
),
ranked AS (
  SELECT q.*, l.extras,
         CAST(ROW_NUMBER() OVER (
           ORDER BY q.remainder DESC, q.source) AS BIGINT) AS rk
  FROM quota q CROSS JOIN leftover l
)
SELECT source, n_docs, sigma_ppm, quota_base,
       CAST(quota_base
            + CASE WHEN rk <= extras THEN 1 ELSE 0 END AS BIGINT)
         AS allocated
FROM ranked
ORDER BY source
""",
)
def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.text import token_count

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    stats = (
        docs.select(
            "source", token_count("text").cast("bigint").alias("x")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
        )
        .persist()  # bounded at |sources| rows; referenced by quota + totals
    )
    sig = stats.select(
        "source",
        "n_docs",
        F.floor(
            F.sqrt((F.col("n_docs") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double"))
            * F.lit(1_000_000.0)
            / F.col("n_docs")
        )
        .cast("bigint")
        .alias("sigma_ppm"),
    )
    w = sig.withColumn("wt", (F.col("n_docs") * F.col("sigma_ppm")).cast("bigint"))
    tot = w.agg(F.sum("wt").alias("t"))
    quota = w.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "sigma_ppm",
        F.expr(f"({_NEY_N} * wt) div t").alias("quota_base"),
        F.expr(f"({_NEY_N} * wt) % t").alias("remainder"),
    )
    leftover = quota.agg((F.lit(_NEY_N) - F.sum("quota_base")).alias("extras"))
    rk = F.row_number().over(
        Window.orderBy(F.desc("remainder"), F.asc("source"))
    )
    return (
        quota.join(F.broadcast(leftover))
        .withColumn("rk", rk.cast("bigint"))
        .select(
            "source",
            "n_docs",
            "sigma_ppm",
            "quota_base",
            (
                F.col("quota_base")
                + F.when(F.col("rk") <= F.col("extras"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("allocated"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# t-closeness audit (round 10) — completes the k-anonymity / l-diversity trio
# ---------------------------------------------------------------------------

_T_PPM = 150_000  # publication threshold: EMD(group, global) <= 0.15


@register(
    "tcloseness_audit",
    ops="EXT-tcloseness,J1,A1,W1 (ordered-attribute EMD audit)",
    doc="t-closeness audit (Li et al., ICDE 2007), completing the "
    "k-anonymity (curation.py) / l-diversity trio: a QI group leaks even "
    "with many distinct sensitive values when its DISTRIBUTION over them "
    "strays from the global one. QI = (market segment, nation); ordered "
    "sensitive attribute = order priority; distance = the ordered-EMD "
    "closed form sum|cumulative(P - Q)| / (m - 1), computed on the exact "
    "ppm integer grid so both engines agree bit-for-bit. The (group x "
    "priority) grid is densified with a bounded cross join (125 x 5 at "
    "any corpus scale) so zero-count cells contribute their full deficit; "
    "cumulative diffs run in a group-partitioned window over that "
    "bounded grid. One corpus-scale aggregate; everything after is "
    "group-grain.",
    oracle=f"""
WITH cnt AS (
  SELECT c.c_mktsegment AS seg, c.c_nationkey AS nat,
         o.o_orderpriority AS pri, CAST(COUNT(1) AS BIGINT) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
grp AS (SELECT seg, nat, CAST(SUM(n) AS BIGINT) AS n_g FROM cnt GROUP BY 1, 2),
pris AS (SELECT DISTINCT pri FROM cnt),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(COUNT(DISTINCT pri) AS BIGINT) AS m
  FROM cnt
),
q AS (
  SELECT pri, CAST(SUM(n) * 1000000 // (SELECT n_tot FROM tot) AS BIGINT)
           AS q_ppm
  FROM cnt GROUP BY pri
),
grid AS (
  SELECT g.seg, g.nat, g.n_g, p.pri, COALESCE(c.n, 0) AS n
  FROM grp g CROSS JOIN pris p
  LEFT JOIN cnt c ON c.seg = g.seg AND c.nat = g.nat AND c.pri = p.pri
),
cum AS (
  SELECT gr.seg, gr.nat, gr.n_g,
         SUM(CAST(gr.n * 1000000 // gr.n_g AS BIGINT) - q.q_ppm)
           OVER (PARTITION BY gr.seg, gr.nat ORDER BY gr.pri
                 ROWS UNBOUNDED PRECEDING) AS cumdiff
  FROM grid gr JOIN q ON q.pri = gr.pri
)
SELECT seg AS c_mktsegment, nat AS c_nationkey,
       CAST(MAX(n_g) AS BIGINT) AS n_orders,
       CAST(SUM(ABS(cumdiff)) // ((SELECT m FROM tot) - 1) AS BIGINT)
         AS emd_ppm,
       CAST(SUM(ABS(cumdiff)) // ((SELECT m FROM tot) - 1) > {_T_PPM}
            AS BOOLEAN) AS t_violation
FROM cum
GROUP BY seg, nat
ORDER BY c_mktsegment, c_nationkey
""",
)
def tcloseness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = fan_out(load_table(spark, sf_dir, "orders"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    cnt = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        # Bounded (segments x nations x priorities) — referenced by four
        # downstream subtrees (groups, priorities, global dist, grid).
        .localCheckpoint(eager=False)
    )
    grp = cnt.groupBy("seg", "nat").agg(F.sum("n").cast("bigint").alias("n_g"))
    pris = cnt.select("pri").distinct()
    tot = cnt.agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.countDistinct("pri").cast("bigint").alias("m"),
    )
    q = (
        cnt.groupBy("pri")
        .agg(F.sum("n").cast("bigint").alias("n_p"))
        .join(F.broadcast(tot), F.lit(True))
        .select("pri", F.expr("CAST(n_p * 1000000 div n_tot AS BIGINT)").alias("q_ppm"), "m")
    )
    grid = (
        grp.join(F.broadcast(pris))
        .join(cnt, ["seg", "nat", "pri"], "left")
        .select("seg", "nat", "n_g", "pri", F.coalesce("n", F.lit(0)).alias("n"))
    )
    w = (
        Window.partitionBy("seg", "nat")
        .orderBy("pri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.join(F.broadcast(q), "pri").withColumn(
        "cumdiff",
        F.sum(
            F.expr("CAST(n * 1000000 div n_g AS BIGINT)") - F.col("q_ppm")
        ).over(w),
    )
    return (
        cum.groupBy("seg", "nat")
        .agg(
            F.max("n_g").cast("bigint").alias("n_orders"),
            F.expr(
                "CAST(sum(abs(cumdiff)) div (max(m) - 1) AS BIGINT)"
            ).alias("emd_ppm"),
        )
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("nat").alias("c_nationkey"),
            "n_orders",
            "emd_ppm",
            (F.col("emd_ppm") > _T_PPM).alias("t_violation"),
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )


# ---------------------------------------------------------------------------
# Differential-privacy release mechanisms (round 11)
# ---------------------------------------------------------------------------

# Discrete-Laplace noise for count release: z = G1 - G2 with G ~
# Geometric(1 - p), p = exp(-eps/sensitivity) — exactly the two-sided
# geometric mechanism (Ghosh-Roughgarden-Sundararajan 2009, the
# universally optimal eps-DP mechanism for counts). The geometric
# inverse-CDF thresholds T_k = floor((1 - p^(k+1)) * 2^32) are computed
# ONCE here in Python and embedded as identical integer literals in both
# engines, cut against md5-derived per-GROUP uniforms — libm exp never
# has to agree cross-engine, and the "randomness" is a deterministic
# function of the group key, so the whole release replays bit-for-bit.
# Magnitude truncates at 30 (residual mass ~3e-7, same arm both engines).
import math as _m

_DP_EPS_STR = "0.5"
_DP_P = _m.exp(-0.5)
_DP_T = [int((1 - _DP_P ** (k + 1)) * 2**32) for k in range(30)]
# (eps, delta)-DP partition selection threshold (Korolova et al. 2009
# shape): tau = ceil(1 + (1/eps) * ln(1/(2*delta))), delta = 1e-6.
_DP_TAU = _m.ceil(1 + 2.0 * _m.log(1.0 / (2.0 * 1e-6)))


def _geom_sql(u: str) -> str:
    arms = " ".join(f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_DP_T))
    return f"CASE {arms} ELSE 30 END"


def _geom_col(u):
    w = F.when(u < _DP_T[0], 0)
    for k, t in enumerate(_DP_T[1:], start=1):
        w = w.when(u < t, k)
    return w.otherwise(30)


def _dp_u_sql(tag: str, key: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{tag}:' || {key}), 1, 8)) AS BIGINT)"
    )


def _dp_u_col(tag: str, key):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{tag}:"), key)), 1, 8), 16, 10
    ).cast("bigint")


@register(
    "dp_noisy_counts",
    ops="EXT-privacy-dp,A1,F1 (discrete-Laplace count release)",
    doc=f"eps-DP per-source document-count release (eps={_DP_EPS_STR}, "
    "sensitivity 1): the two-sided-geometric (discrete Laplace) "
    "mechanism adds z = G1 - G2 per released count, with the geometric "
    "draws deterministically derived from md5(group key) uniforms cut "
    "by Python-precomputed inverse-CDF integer thresholds — the "
    "mechanism-calibration audit grain (true count, noise, released "
    "count, abs error side by side). One count aggregate; noise math is "
    "per released GROUP, never per row.",
    oracle=f"""
WITH counts AS (
  SELECT source, CAST(COUNT(1) AS BIGINT) AS n_true
  FROM documents GROUP BY source
),
noised AS (
  SELECT source, n_true,
         CAST({_geom_sql(_dp_u_sql("dpa", "source"))}
              - {_geom_sql(_dp_u_sql("dpb", "source"))} AS BIGINT) AS noise
  FROM counts
)
SELECT source, n_true, noise, n_true + noise AS n_noisy,
       abs(noise) AS abs_err
FROM noised ORDER BY source
""",
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_true"))
    noise = (
        _geom_col(_dp_u_col("dpa", F.col("source")))
        - _geom_col(_dp_u_col("dpb", F.col("source")))
    ).cast("bigint")
    return (
        counts.withColumn("noise", noise)
        .select(
            "source",
            "n_true",
            "noise",
            (F.col("n_true") + F.col("noise")).alias("n_noisy"),
            F.abs("noise").alias("abs_err"),
        )
        .orderBy("source")
    )


@register(
    "dp_partition_selection",
    ops="EXT-privacy-dp-partition,A1,F1 ((eps,delta)-DP group-by release)",
    doc=f"(eps,delta)-DP partition selection over the (lang, source) "
    f"group-by (eps={_DP_EPS_STR}, delta=1e-6, tau={_DP_TAU}): when the "
    "group-by domain is DATA-DERIVED, releasing even the bucket LIST "
    "leaks membership, so production DP group-bys release only buckets "
    "whose noisy count clears the stability threshold tau — the "
    "mechanism behind every DP analytics engine's GROUP BY. Per bucket: "
    "true count, noisy count, released flag; suppressed mass is the "
    "price of delta.",
    oracle=f"""
WITH counts AS (
  SELECT lang, source, CAST(COUNT(1) AS BIGINT) AS n_true
  FROM documents GROUP BY lang, source
),
noised AS (
  SELECT lang, source, n_true,
         n_true
         + {_geom_sql(_dp_u_sql("dpa", "lang || ':' || source"))}
         - {_geom_sql(_dp_u_sql("dpb", "lang || ':' || source"))} AS n_noisy
  FROM counts
)
SELECT lang, source, n_true, CAST(n_noisy AS BIGINT) AS n_noisy,
       CAST(CASE WHEN n_noisy > {_DP_TAU} THEN 1 ELSE 0 END AS INT)
         AS released
FROM noised ORDER BY lang, source
""",
)
def dp_partition_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    counts = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    key = F.concat_ws(":", F.col("lang"), F.col("source"))
    n_noisy = (
        F.col("n_true")
        + _geom_col(_dp_u_col("dpa", key))
        - _geom_col(_dp_u_col("dpb", key))
    ).cast("bigint")
    return (
        counts.withColumn("n_noisy", n_noisy)
        .select(
            "lang",
            "source",
            "n_true",
            "n_noisy",
            F.when(F.col("n_noisy") > _DP_TAU, 1)
            .otherwise(0)
            .cast("int")
            .alias("released"),
        )
        .orderBy("lang", "source")
    )
