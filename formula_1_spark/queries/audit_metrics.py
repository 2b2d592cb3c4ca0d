"""Corpus/mart metric-audit operators (round 5, slate 6): the
integer-exact evaluation metrics a pipeline publishes about itself.

* ``vocab_coverage_curve`` — token-mass coverage at power-of-two
  vocabulary cutoffs (64..8192): the curve that decides how large a
  tokenizer vocabulary actually needs to be for this corpus. Exact
  global term ranks from the shuffle-free two-phase top-k; the corpus
  token total is a scan-only aggregate (no second term shuffle).
* ``kappa_lang_agreement`` — Cohen's kappa (ppm) between the corpus's
  lang labels and the marker-word language heuristic, per source:
  observed agreement vs chance agreement from the label/guess
  marginals. The contingency cells are bounded (4 langs x 4 guesses
  per source) so every join after the doc scan is broadcast-sized.
* ``orders_priority_chisq_drift`` — chi-square-style drift index (ppm)
  of each month's order-priority mix against the corpus-lifetime mix:
  sum over priorities of (share_ppm - expected_ppm)^2 / expected_ppm.
  Shares are integer ppm, so the index is integer-exact cross-engine
  and bounded (no HUGEINT-range products); complements the share-delta
  monitor (``source_mix_drift``) with a single ranked-severity number.
* ``user_contribution_bounds`` — differential-privacy prep: per
  (priority, month) aggregation cell, the maximum single-customer
  contribution (the L1 sensitivity a DP release of the cell would
  clip at), contributor counts, and a dominance flag (one customer
  > 50% of the cell). Cell keys are bounded; the contribution
  aggregate spreads on (cell, customer).

All ratio columns are integer ppm; products that cross int64 at
warehouse scale are lifted to decimal(38,0) before the multiply.
Reference scope: extends the reference's analytics surface
(`Data Visualization.sql`) with publication metrics; no counterpart
notebook exists, so parity is oracle-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.functions.text import lang_guess
from formula_1_spark.queries.registry import register
from formula_1_spark.queries.text_analysis import _LANG_CASE
from formula_1_spark.sources.tables import fan_out, load_table

_PPM = 1_000_000

_CURVE_CUTS = (64, 128, 256, 512, 1024, 2048, 4096, 8192)


@register(
    "vocab_coverage_curve",
    ops="EXT-vocab-curve,A1,W2 (token-mass coverage at 2^k cutoffs)",
    doc="Coverage curve: share of total token mass covered by the "
    "top-V terms for V in {64,...,8192}. Ranks come from the exact "
    "two-phase top-8192 (total order: freq desc, term asc); the token "
    "total is a scan-only sum of per-doc token counts (no second "
    "term-key shuffle). The 8-row cutoff relation joins broadcast.",
    oracle=f"""
WITH tf AS (
  SELECT t AS term, CAST(COUNT(1) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
  GROUP BY t
),
tot AS (
  SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t_total
  FROM documents
),
ranked AS (
  SELECT term, freq,
         CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS BIGINT)
           AS rk
  FROM tf ORDER BY freq DESC, term LIMIT {max(_CURVE_CUTS)}
),
cuts(v) AS (VALUES {", ".join(f"({v})" for v in _CURVE_CUTS)})
SELECT CAST(c.v AS BIGINT) AS vocab_size,
       CAST(COUNT(1) AS BIGINT) AS terms_in_vocab,
       CAST(SUM(r.freq) AS BIGINT) AS covered_tokens,
       CAST(SUM(r.freq) * {_PPM} // t.t_total AS BIGINT) AS coverage_ppm
FROM ranked r JOIN cuts c ON r.rk <= c.v CROSS JOIN tot t
GROUP BY c.v, t.t_total
ORDER BY vocab_size
""",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.windows import two_phase_global_topk

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    tf = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # Corpus token total straight off the doc scan — cheaper than a
    # second pass over the term-key shuffle tf would need.
    tot = docs.agg(F.sum(F.size(toks)).alias("t_total"))
    ranked = two_phase_global_topk(
        tf,
        [F.desc("freq"), F.asc("term")],
        max(_CURVE_CUTS),
        alias="rk",
        unique_order=True,
    ).select(F.col("rk").cast("bigint").alias("rk"), "freq")
    cuts = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in _CURVE_CUTS])).alias("v")
    )
    return (
        ranked.join(F.broadcast(cuts), ranked["rk"] <= cuts["v"])
        .join(F.broadcast(tot))
        .groupBy(F.col("v").cast("bigint").alias("vocab_size"), "t_total")
        .agg(
            F.count(F.lit(1)).alias("terms_in_vocab"),
            F.sum("freq").alias("covered_tokens"),
            # decimal lift: covered token mass * 1e6 crosses int64 at
            # corpus scale
            F.expr(
                f"(cast(sum(freq) as decimal(38,0)) * {_PPM})"
                " div any_value(t_total)"
            ).alias("coverage_ppm"),
        )
        .drop("t_total")
        .orderBy("vocab_size")
    )


@register(
    "kappa_lang_agreement",
    ops="EXT-kappa,A1,J1 (chance-corrected classifier agreement)",
    doc="Cohen's kappa per source between lang labels and the marker "
    "heuristic: po = observed agreement, pe = chance agreement from "
    "label x guess marginals, kappa = (po-pe)/(1-pe), all in integer "
    "ppm. The (source, label, guess) contingency relation is bounded "
    "(langs x guesses per source) so marginal joins are broadcast; "
    "only the doc scan and the cell aggregate touch corpus-scale data.",
    oracle=f"""
WITH cells AS (
  SELECT source, lang AS label, {_LANG_CASE} AS guess,
         CAST(COUNT(1) AS BIGINT) AS n
  FROM documents GROUP BY source, label, guess
),
tot AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN label = guess THEN n ELSE 0 END) AS BIGINT)
           AS agree
  FROM cells GROUP BY source
),
rows_m AS (
  SELECT source, label AS l, CAST(SUM(n) AS BIGINT) AS r
  FROM cells GROUP BY source, label
),
cols_m AS (
  SELECT source, guess AS l, CAST(SUM(n) AS BIGINT) AS c
  FROM cells GROUP BY source, guess
),
pe AS (
  SELECT r.source, CAST(SUM(r.r * c.c) AS BIGINT) AS pe_num
  FROM rows_m r JOIN cols_m c ON r.source = c.source AND r.l = c.l
  GROUP BY r.source
),
ppm AS (
  SELECT t.source, t.n_docs, t.agree,
         CAST(t.agree * {_PPM} // t.n_docs AS BIGINT) AS po_ppm,
         CAST(p.pe_num * {_PPM} // (t.n_docs * t.n_docs) AS BIGINT)
           AS pe_ppm
  FROM tot t JOIN pe p ON t.source = p.source
)
SELECT source, n_docs, agree, po_ppm, pe_ppm,
       CAST(CASE WHEN pe_ppm >= {_PPM} THEN {_PPM}
            ELSE (po_ppm - pe_ppm) * {_PPM} // ({_PPM} - pe_ppm)
            END AS BIGINT) AS kappa_ppm
FROM ppm
ORDER BY source
""",
)
def kappa_lang_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    cells = (
        docs.select(
            "source",
            F.col("lang").alias("label"),
            lang_guess("text").alias("guess"),
        )
        .groupBy("source", "label", "guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.groupBy("source").agg(
        F.sum("n").alias("n_docs"),
        F.sum(
            F.when(F.col("label") == F.col("guess"), F.col("n")).otherwise(0)
        ).alias("agree"),
    )
    rows_m = cells.groupBy("source", F.col("label").alias("l")).agg(
        F.sum("n").alias("r")
    )
    cols_m = cells.groupBy("source", F.col("guess").alias("l")).agg(
        F.sum("n").alias("c")
    )
    pe = (
        rows_m.join(F.broadcast(cols_m), ["source", "l"])
        .groupBy("source")
        .agg(F.sum(F.col("r") * F.col("c")).alias("pe_num"))
    )
    ppm = tot.join(F.broadcast(pe), "source").select(
        "source",
        "n_docs",
        "agree",
        # decimal lifts: agree * 1e6 and pe_num (= sum of marginal
        # products, ~n_docs^2) overflow int64 at corpus scale
        F.expr(
            f"cast((cast(agree as decimal(38,0)) * {_PPM}) div n_docs"
            " as bigint)"
        ).alias("po_ppm"),
        F.expr(
            f"cast((cast(pe_num as decimal(38,0)) * {_PPM})"
            " div (cast(n_docs as decimal(38,0)) * n_docs) as bigint)"
        ).alias("pe_ppm"),
    )
    kappa = F.when(F.col("pe_ppm") >= _PPM, F.lit(_PPM)).otherwise(
        F.expr(f"(po_ppm - pe_ppm) * {_PPM} div ({_PPM} - pe_ppm)")
    )
    return ppm.withColumn("kappa_ppm", kappa.cast("bigint")).orderBy(
        "source"
    )


@register(
    "orders_priority_chisq_drift",
    ops="EXT-chisq,A1 (chi-square drift index vs lifetime mix)",
    doc="Chi-square-style drift index per order month: for each "
    "priority, the month's share (ppm) minus the corpus-lifetime "
    "expected share (ppm), squared, divided by the expected share; "
    "summed over priorities. Integer-exact (shares are integer ppm, "
    "bounded magnitudes) and order-independent. One orders scan, one "
    "(month, priority) aggregate; months and priorities are "
    "domain-bounded so every later join is broadcast.",
    oracle=f"""
WITH cells AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         o_orderpriority AS pri, CAST(COUNT(1) AS BIGINT) AS n
  FROM orders GROUP BY month, pri
),
months AS (
  SELECT month, CAST(SUM(n) AS BIGINT) AS m_total FROM cells
  GROUP BY month
),
pris AS (
  SELECT pri, CAST(SUM(n) AS BIGINT) AS p_total FROM cells GROUP BY pri
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells),
scored AS (
  SELECT c.month, c.pri,
         CAST(c.n * {_PPM} // m.m_total AS BIGINT) AS share_ppm,
         CAST(p.p_total * {_PPM} // t.t AS BIGINT) AS exp_ppm
  FROM cells c
  JOIN months m ON c.month = m.month
  JOIN pris p ON c.pri = p.pri
  CROSS JOIN tot t
)
SELECT month,
       CAST(SUM((share_ppm - exp_ppm) * (share_ppm - exp_ppm)
                // exp_ppm) AS BIGINT) AS chisq_index_ppm,
       CAST(MAX(abs(share_ppm - exp_ppm)) AS BIGINT) AS max_delta_ppm
FROM scored
GROUP BY month
ORDER BY month
""",
)
def orders_priority_chisq_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = fan_out(load_table(spark, sf_dir, "orders"))
    cells = orders.groupBy(
        F.date_format(
            F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"
        ).alias("month"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count(F.lit(1)).alias("n"))
    months = cells.groupBy("month").agg(F.sum("n").alias("m_total"))
    pris = cells.groupBy("pri").agg(F.sum("n").alias("p_total"))
    tot = cells.agg(F.sum("n").alias("t"))
    scored = (
        cells.join(F.broadcast(months), "month")
        .join(F.broadcast(pris), "pri")
        .join(F.broadcast(tot))
        .select(
            "month",
            # decimal lifts: monthly order counts * 1e6 cross int64 at
            # warehouse scale
            F.expr(
                f"cast((cast(n as decimal(38,0)) * {_PPM}) div m_total"
                " as bigint)"
            ).alias("share_ppm"),
            F.expr(
                f"cast((cast(p_total as decimal(38,0)) * {_PPM}) div t"
                " as bigint)"
            ).alias("exp_ppm"),
        )
    )
    delta = F.col("share_ppm") - F.col("exp_ppm")
    return (
        scored.groupBy("month")
        .agg(
            F.sum(
                F.expr(
                    "(share_ppm - exp_ppm) * (share_ppm - exp_ppm)"
                    " div exp_ppm"
                )
            )
            .cast("bigint")
            .alias("chisq_index_ppm"),
            F.max(F.abs(delta)).cast("bigint").alias("max_delta_ppm"),
        )
        .orderBy("month")
    )


@register(
    "user_contribution_bounds",
    ops="EXT-dp-sensitivity,A1 (per-cell max user contribution)",
    doc="DP release prep for the (priority, month) order-count table: "
    "per cell, distinct contributing customers, total orders, the "
    "maximum single-customer contribution (the L1 sensitivity a DP "
    "mechanism would clip at), its ppm share, and a dominance flag "
    "(one customer > 50% of the cell). The contribution aggregate "
    "spreads on (cell, customer); the cell relation is domain-bounded.",
    oracle=f"""
WITH contrib AS (
  SELECT o_orderpriority AS pri,
         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         o_custkey, CAST(COUNT(1) AS BIGINT) AS n
  FROM orders GROUP BY pri, month, o_custkey
)
SELECT pri, month,
       CAST(COUNT(1) AS BIGINT) AS contributors,
       CAST(SUM(n) AS BIGINT) AS orders_total,
       CAST(MAX(n) AS BIGINT) AS l1_sensitivity,
       CAST(MAX(n) * {_PPM} // SUM(n) AS BIGINT) AS dominance_ppm,
       (MAX(n) * 2 > SUM(n)) AS dominated
FROM contrib
GROUP BY pri, month
ORDER BY pri, month
""",
)
def user_contribution_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = fan_out(load_table(spark, sf_dir, "orders"))
    contrib = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_format(
            F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"
        ).alias("month"),
        "o_custkey",
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        contrib.groupBy("pri", "month")
        .agg(
            F.count(F.lit(1)).alias("contributors"),
            F.sum("n").alias("orders_total"),
            F.max("n").alias("l1_sensitivity"),
            # decimal lift: max-contribution * 1e6 can cross int64 when
            # a cell's count does at warehouse scale
            F.expr(
                f"cast((cast(max(n) as decimal(38,0)) * {_PPM}) div sum(n)"
                " as bigint)"
            ).alias("dominance_ppm"),
            (F.max("n") * 2 > F.sum("n")).alias("dominated"),
        )
        .orderBy("pri", "month")
    )
