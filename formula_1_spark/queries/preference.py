"""Preference-data aggregation + label-reliability operators.

RLHF-style pipelines turn PAIRWISE preferences (human A/B votes, judge
verdicts) into per-item strengths, and audit LABEL quality by measuring
agreement between independent raters. Both are aggregation problems that
must scale to billions of comparisons:

* :func:`preference_bradley_terry` — Bradley-Terry strength estimation
  via Hunter's (2004) MM algorithm: fixed parallel rounds, each a pair
  join + an ordered-fold denominator, over a BOUNDED player panel. The
  comparison stream is arbitrarily large; everything after the win-count
  aggregation is panel-sized.
* :func:`annotator_agreement_kappa` — Cohen's kappa between two raters
  in EXACT integer arithmetic (kappa = (agree·N - pe_num) /
  (N² - pe_num) on a ppm grid, DECIMAL(38)/HUGEINT so corpus size is
  unbounded), plus the full 2x2 confusion matrix.

Float-determinism contract (BT): every division is computed per row by
identical IEEE ops in both engines, and every SUM that feeds a division
is an ordered left fold over a sorted list (Spark ``aggregate`` over
``array_sort(collect_list(struct(key, val)))``; DuckDB ``list_reduce``
over ``list(val ORDER BY key)``) — never an unordered float SUM, whose
partial-aggregation order differs across engines. ``0.0 + x == x``
exactly, so the differing init conventions agree (see
functions/vectors.py).

No reference counterpart (extension surface; SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import load_table

_BT_ITERS = 3

# Kappa rater thresholds (self-contained; integer-exact comparisons).
_KAPPA_MIN_WORDS = 10
_KAPPA_MAX_WORDS = 1000
_KAPPA_STOPWORDS = ("the", "a", "of", "to", "and", "in")


def _bt_iter_ctes() -> str:
    """CTE chain for the MM rounds: terms -> ordered-fold denominator ->
    raw update -> ordered-fold total -> normalized strengths."""
    parts = [
        "s0 AS (SELECT p, CAST(1.0 AS DOUBLE) AS s FROM wins)",
    ]
    for t in range(1, _BT_ITERS + 1):
        p = t - 1
        parts.append(f"""t{t}_terms AS (
  SELECT y.p, y.q, y.n / (sp.s + sq.s) AS term
  FROM sym y JOIN s{p} sp ON sp.p = y.p JOIN s{p} sq ON sq.p = y.q
)""")
        parts.append(f"""t{t}_den AS (
  SELECT p, list_reduce(list(term ORDER BY q), (a, v) -> a + v) AS den
  FROM t{t}_terms GROUP BY p
)""")
        parts.append(f"""t{t}_raw AS (
  SELECT w.p, w.w_p / d.den AS raw FROM wins w JOIN t{t}_den d ON d.p = w.p
)""")
        parts.append(
            f"t{t}_tot AS (SELECT list_reduce(list(raw ORDER BY p), "
            f"(a, v) -> a + v) AS tot FROM t{t}_raw)"
        )
        parts.append(
            f"s{t} AS (SELECT p, raw / tot AS s FROM t{t}_raw, t{t}_tot)"
        )
    return ",\n".join(parts)


@register(
    "preference_bradley_terry",
    ops="EXT-pref-bt,J1,A1,W1 (pairwise preferences -> MM strengths)",
    doc=f"Bradley-Terry preference aggregation (Hunter 2004 MM, "
    f"{_BT_ITERS} rounds): supplier NATIONS are the players; within "
    f"each order, every pair of participating nations is one comparison "
    f"won by the nation with the cheaper best lineitem (price ties "
    f"excluded). The unbounded comparison stream reduces to per-pair "
    f"win counts (one shuffle keyed by order, one by pair); the MM "
    f"rounds then run on the bounded panel: p_i' = w_i / "
    f"sum_j n_ij/(p_i+p_j), normalized — every float sum an ordered "
    f"left fold, so the oracle replays bit-for-bit.",
    oracle=f"""
WITH per AS (
  SELECT l.l_orderkey AS ok, s.s_nationkey AS nat,
         MIN(l.l_extendedprice) AS best
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.nat AS i, b.nat AS j,
         CASE WHEN a.best < b.best THEN 1 ELSE 0 END AS win_i
  FROM per a JOIN per b ON a.ok = b.ok AND a.nat < b.nat
  WHERE a.best <> b.best
),
matches AS (
  SELECT i, j, CAST(SUM(win_i) AS BIGINT) AS wi,
         CAST(COUNT(1) - SUM(win_i) AS BIGINT) AS wj,
         CAST(COUNT(1) AS BIGINT) AS n
  FROM pairs GROUP BY i, j
),
sym AS (
  SELECT i AS p, j AS q, wi AS w, n FROM matches
  UNION ALL
  SELECT j AS p, i AS q, wj AS w, n FROM matches
),
wins AS (
  SELECT p, CAST(SUM(w) AS BIGINT) AS w_p, CAST(SUM(n) AS BIGINT) AS n_p
  FROM sym GROUP BY p
),
{_bt_iter_ctes()}
SELECT n.n_name AS nation, w.w_p AS wins, w.n_p AS n_matches,
       f.s AS strength,
       CAST(ROW_NUMBER() OVER (ORDER BY f.s DESC, f.p ASC) AS INT) AS rank
FROM s{_BT_ITERS} f
JOIN wins w ON w.p = f.p
JOIN nation n ON n.n_nationkey = f.p
ORDER BY rank
""",
)
def preference_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")

    per = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .groupBy(
            F.col("l_orderkey").alias("ok"), F.col("s_nationkey").alias("nat")
        )
        .agg(F.min("l_extendedprice").alias("best"))
    )
    pairs = (
        per.alias("a")
        .join(
            per.alias("b"),
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.nat") < F.col("b.nat")),
        )
        .filter(F.col("a.best") != F.col("b.best"))
        .select(
            F.col("a.nat").alias("i"),
            F.col("b.nat").alias("j"),
            (F.col("a.best") < F.col("b.best")).cast("bigint").alias("win_i"),
        )
    )
    matches = pairs.groupBy("i", "j").agg(
        F.sum("win_i").alias("wi"),
        (F.count(F.lit(1)) - F.sum("win_i")).alias("wj"),
        F.count(F.lit(1)).alias("n"),
    )
    sym = matches.select(
        F.col("i").alias("p"), F.col("j").alias("q"), F.col("wi").alias("w"), "n"
    ).unionByName(
        matches.select(
            F.col("j").alias("p"),
            F.col("i").alias("q"),
            F.col("wj").alias("w"),
            "n",
        )
    )
    # Panel-sized from here on (players² rows max — players = nations, a
    # DOMAIN-bounded 25 at any corpus scale); lazily checkpointed so the
    # three unrolled MM rounds replan a leaf, not the corpus reduction.
    # repartition(1): the corpus reduction inherits the corpus-wide
    # shuffle width, so without it every panel-grain MM stage fans out
    # #shuffle-partitions tasks for <= 600 rows — measured 1.8x FASTER on
    # 8 cores than 32 at sf0.1 (pure task-launch overhead, guide §2.1);
    # one partition is the scale-correct width for a bounded panel.
    sym = sym.repartition(1).localCheckpoint(eager=False)
    wins = (
        sym.groupBy("p")
        .agg(F.sum("w").alias("w_p"), F.sum("n").alias("n_p"))
        # consumed by every MM round's join-back AND the final select —
        # checkpoint once (panel-sized) instead of re-aggregating per round
        .localCheckpoint(eager=False)
    )

    strengths = wins.select("p", F.lit(1.0).alias("s"))
    for _ in range(_BT_ITERS):
        sp = strengths.select(F.col("p").alias("pp"), F.col("s").alias("s_p"))
        sq = strengths.select(F.col("p").alias("qq"), F.col("s").alias("s_q"))
        terms = (
            sym.join(F.broadcast(sp), F.col("p") == F.col("pp"))
            .join(F.broadcast(sq), F.col("q") == F.col("qq"))
            .select(
                "p", "q", (F.col("n") / (F.col("s_p") + F.col("s_q"))).alias("term")
            )
        )
        den = (
            terms.groupBy("p")
            .agg(F.collect_list(F.struct("q", "term")).alias("arr"))
            .select(
                "p",
                F.aggregate(
                    F.array_sort("arr"), F.lit(0.0), lambda a, x: a + x["term"]
                ).alias("den"),
            )
        )
        raw = wins.join(den, "p").select(
            "p", (F.col("w_p") / F.col("den")).alias("raw")
        )
        tot = (
            raw.agg(F.collect_list(F.struct("p", "raw")).alias("arr"))
            .select(
                F.aggregate(
                    F.array_sort("arr"), F.lit(0.0), lambda a, x: a + x["raw"]
                ).alias("tot")
            )
        )
        strengths = (
            raw.join(F.broadcast(tot), F.lit(True))
            .select("p", (F.col("raw") / F.col("tot")).alias("s"))
            # Each round references the previous strengths TWICE (sp, sq)
            # — without a per-round barrier the logical plan doubles every
            # round (the 2^iters double-reference trap, see
            # label_propagation). Panel-sized relation: checkpoint is
            # O(players).
            .localCheckpoint(eager=False)
        )

    w_rank = Window.orderBy(F.desc("s"), F.asc("p"))
    return (
        strengths.join(wins, "p")
        .join(F.broadcast(na), F.col("p") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("w_p").alias("wins"),
            F.col("n_p").alias("n_matches"),
            F.col("s").alias("strength"),
            F.row_number().over(w_rank).cast("int").alias("rank"),
        )
        .orderBy("rank")
    )


@register(
    "annotator_agreement_kappa",
    ops="EXT-pref-kappa,A3,F1 (inter-rater reliability, exact ints)",
    doc="Cohen's kappa between two independent keep/drop raters over the "
    "documents table (rater A: word count in "
    f"[{_KAPPA_MIN_WORDS},{_KAPPA_MAX_WORDS}] and mean word length in "
    "[3,10]; rater B: >= 2 distinct stopwords and symbol runs <= 10% of "
    "words) — the label-reliability audit an annotation pipeline runs "
    "before trusting labels. Exact integer arithmetic: kappa = "
    "(agree*N - pe_num) / (N^2 - pe_num) on the ppm grid in "
    "DECIMAL(38)/HUGEINT, so corpus size is unbounded; output is the "
    "2x2 confusion matrix with the constant observed-agreement and "
    "kappa columns.",
    oracle=f"""
WITH per_doc AS (
  SELECT doc_id,
         length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
           AS n_words_est,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')
           AS toks
  FROM documents
),
feat AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_reduce(list_transform(toks, x -> CAST(length(x) AS BIGINT)),
              (a, v) -> a + v) AS BIGINT) AS sum_len,
         CAST({" + ".join(f"CASE WHEN list_contains(toks, '{s}') THEN 1 ELSE 0 END" for s in _KAPPA_STOPWORDS)}
              AS BIGINT) AS stop_hits,
         CAST(len(regexp_extract_all(array_to_string(toks, ' '), '#|\\.\\.\\.'))
              AS BIGINT) AS n_sym
  FROM per_doc
),
rated AS (
  SELECT doc_id,
         CASE WHEN n_words BETWEEN {_KAPPA_MIN_WORDS} AND {_KAPPA_MAX_WORDS}
                   AND sum_len >= 3 * n_words AND sum_len <= 10 * n_words
              THEN 1 ELSE 0 END AS a_keep,
         CASE WHEN stop_hits >= 2 AND n_sym * 10 <= n_words
              THEN 1 ELSE 0 END AS b_keep
  FROM feat
),
cells AS (
  SELECT a_keep, b_keep, CAST(COUNT(1) AS BIGINT) AS n
  FROM rated GROUP BY a_keep, b_keep
),
tot AS (
  SELECT CAST(SUM(n) AS HUGEINT) AS nn,
         CAST(SUM(CASE WHEN a_keep = 1 THEN n ELSE 0 END) AS HUGEINT) AS a1,
         CAST(SUM(CASE WHEN b_keep = 1 THEN n ELSE 0 END) AS HUGEINT) AS b1,
         CAST(SUM(CASE WHEN a_keep = b_keep THEN n ELSE 0 END) AS HUGEINT)
           AS agree
  FROM cells
),
summary AS (
  SELECT CAST(agree * 1000000 // nn AS BIGINT) AS agree_ppm,
         CAST(CASE WHEN nn * nn = a1 * b1 + (nn - a1) * (nn - b1) THEN NULL
              ELSE (agree * nn - (a1 * b1 + (nn - a1) * (nn - b1))) * 1000000
                   // (nn * nn - (a1 * b1 + (nn - a1) * (nn - b1)))
              END AS BIGINT) AS kappa_ppm
  FROM tot
)
SELECT c.a_keep, c.b_keep, c.n, s.agree_ppm, s.kappa_ppm
FROM cells c, summary s
ORDER BY c.a_keep DESC, c.b_keep DESC
""",
)
def annotator_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != F.lit(""))
    stop_hits = sum(
        F.when(F.array_contains(t, s), 1).otherwise(0)
        for s in _KAPPA_STOPWORDS
    )
    feat = docs.select(
        F.size(t).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(t, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ).alias("sum_len"),
        stop_hits.cast("bigint").alias("stop_hits"),
        F.regexp_count(
            F.array_join(t, " "), F.lit(r"#|\.\.\.")
        ).cast("bigint").alias("n_sym"),
    )
    rated = feat.select(
        F.when(
            F.col("n_words").between(_KAPPA_MIN_WORDS, _KAPPA_MAX_WORDS)
            & (F.col("sum_len") >= 3 * F.col("n_words"))
            & (F.col("sum_len") <= 10 * F.col("n_words")),
            1,
        )
        .otherwise(0)
        .alias("a_keep"),
        F.when(
            (F.col("stop_hits") >= 2)
            & (F.col("n_sym") * 10 <= F.col("n_words")),
            1,
        )
        .otherwise(0)
        .alias("b_keep"),
    )
    cells = rated.groupBy("a_keep", "b_keep").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.agg(
        F.sum("n").cast("decimal(38,0)").alias("nn"),
        F.sum(F.when(F.col("a_keep") == 1, F.col("n")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("a1"),
        F.sum(F.when(F.col("b_keep") == 1, F.col("n")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("b1"),
        F.sum(F.when(F.col("a_keep") == F.col("b_keep"), F.col("n")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("agree"),
    )
    summary = tot.select(
        F.expr("CAST(agree * 1000000 div nn AS BIGINT)").alias("agree_ppm"),
        F.expr(
            "CAST(CASE WHEN nn * nn = a1 * b1 + (nn - a1) * (nn - b1)"
            " THEN NULL"
            " ELSE (agree * nn - (a1 * b1 + (nn - a1) * (nn - b1))) * 1000000"
            "      div (nn * nn - (a1 * b1 + (nn - a1) * (nn - b1)))"
            " END AS BIGINT)"
        ).alias("kappa_ppm"),
    )
    return (
        cells.join(F.broadcast(summary), F.lit(True))
        .select("a_keep", "b_keep", "n", "agree_ppm", "kappa_ppm")
        .orderBy(F.desc("a_keep"), F.desc("b_keep"))
    )
