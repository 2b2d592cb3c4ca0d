"""Embedding-space analytics: label centroids and hard-negative mining.

* ``label_centroid_cohesion`` — per-label mean embedding on the same
  floor-quantized exact-integer grid as the k-means operator (a float
  mean is accumulation-order-dependent; the quantized mean is
  bit-identical cross-engine), plus per-label cohesion = mean cosine of
  members to their centroid, computed on the 1e-6 grid so the average
  itself is exact. The "are my classes tight" audit before training a
  classifier on frozen embeddings.

* ``hard_negative_mining`` — for each query vector, the top-5 most
  similar CORPUS vectors with a DIFFERENT label: contrastive-training
  hard negatives (high-similarity, wrong-class). Exact cosine ranking
  over the label anti-filter; the broadcast-queries corpus scan never
  shuffles full vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from formula_1_spark.functions.vectors import cosine
from formula_1_spark.operators.sampling import hash_uniform_sql
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import fan_out, load_table

_Q = 1_000_000.0  # component / cosine quantization grid (1e-6)


@register(
    "label_centroid_cohesion",
    ops="EXT-embedding-analytics,A1,J1 (exact-grid class centroids)",
    doc="Per-label embedding centroid (floor-quantized exact-integer "
    "mean per dimension — the kmeans_centroids determinism contract) "
    "and class cohesion: mean cosine of members to their own centroid, "
    "averaged on the same 1e-6 grid so the mean of floats is an exact "
    "rational. Emits per label: member count, centroid norm, cohesion. "
    "One posexplode aggregate for centroids (map-side combined), one "
    "broadcast join back for cohesion.",
    oracle=f"""
WITH ex AS (
  SELECT label, vec_id, d.dim AS dim,
         CAST(embedding[d.dim + 1] AS DOUBLE) AS v
  FROM embeddings, (SELECT unnest(range(0, 64)) AS dim) d
),
comp AS (
  SELECT label, dim,
         CAST(SUM(CAST(FLOOR(v * {_Q}) AS BIGINT)) AS DOUBLE)
           / ({_Q} * COUNT(*)) AS c
  FROM ex GROUP BY label, dim
),
cents AS (
  SELECT label, list(c ORDER BY dim) AS cent FROM comp GROUP BY label
),
scored AS (
  SELECT e.label, e.vec_id,
         FLOOR(({{cos}}) * {_Q}) AS cos_q
  FROM embeddings e JOIN cents c ON c.label = e.label
)
SELECT s.label,
       CAST(COUNT(1) AS BIGINT) AS n_members,
       sqrt(list_reduce(list_transform(c.cent, x -> x * x),
            (a, b) -> a + b)) AS centroid_norm,
       CAST(SUM(s.cos_q) AS DOUBLE) / ({_Q} * COUNT(1)) AS cohesion
FROM scored s JOIN cents c ON c.label = s.label
GROUP BY s.label, c.cent
""".format(cos="""
list_reduce(list_transform(list_zip(e.embedding, c.cent),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)
/ (sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        (acc, v) -> acc + v))
 * sqrt(list_reduce(list_transform(c.cent, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        (acc, v) -> acc + v)))
"""),
)
def label_centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    long = emb.select(
        "label", "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select("label", "vec_id", "dim", F.col("v").cast("double").alias("v"))
    comp = (
        long.select(
            "label", "dim", F.floor(F.col("v") * F.lit(_Q)).alias("q")
        )
        .groupBy("label", "dim")
        .agg(
            (F.sum("q").cast("double") / (F.lit(_Q) * F.count(F.lit(1)))).alias("c")
        )
    )
    cents = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("cent")
    )
    scored = emb.join(F.broadcast(cents), "label").select(
        "label",
        "vec_id",
        "cent",
        F.floor(cosine(F.col("embedding"), F.col("cent")) * F.lit(_Q)).alias(
            "cos_q"
        ),
    )
    norm_sq = F.aggregate(
        F.transform(F.col("cent"), lambda x: x * x),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return (
        scored.groupBy("label", "cent")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (
                F.sum("cos_q").cast("double") / (F.lit(_Q) * F.count(F.lit(1)))
            ).alias("cohesion"),
        )
        .select(
            "label",
            "n_members",
            F.sqrt(norm_sq).alias("centroid_norm"),
            "cohesion",
        )
    )


@register(
    "hard_negative_mining",
    ops="EXT-hard-negatives,W1,J1 (contrastive negative selection)",
    doc="Contrastive hard negatives: for each query vector (vec_id < "
    "10), the top-5 most-cosine-similar corpus vectors whose LABEL "
    "differs — exactly the high-similarity wrong-class examples a "
    "contrastive trainer wants. Exact cosine over the anti-label "
    "filter; queries broadcast, corpus scan unshuffled, per-query "
    "window rank.",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, label AS q_label, embedding AS q_vec
  FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q.query_id, q.q_label, e.vec_id AS neg_id, e.label AS neg_label,
         list_reduce(list_transform(list_zip(q.q_vec, e.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
                     (acc, v) -> acc + v)
         / (sqrt(list_reduce(list_transform(q.q_vec,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))
          * sqrt(list_reduce(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v)))
           AS cos
  FROM embeddings e, q
  WHERE e.label <> q.q_label
)
SELECT query_id, q_label, neg_id, neg_label, cos, CAST(rk AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neg_id ASC) AS rk
  FROM scored
) WHERE rk <= 5
""",
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    c = fan_out(emb).select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("c_vec"),
    )
    scored = c.join(
        F.broadcast(q), F.col("neg_label") != F.col("q_label")
    ).withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "q_label",
            "neg_id",
            "neg_label",
            "cos",
            F.col("rank").cast("int").alias("rank"),
        )
    )


@register(
    "knn_label_noise",
    ops="EXT-knn-label-audit,W1,J1 (mislabeled-example detection)",
    doc="Label-noise audit: for each probe vector (vec_id < 100), the "
    "fraction of its k=10 exact-cosine nearest neighbors (self excluded) "
    "carrying a DIFFERENT label — the standard kNN screen for mislabeled "
    "training examples. Probes broadcast against the unshuffled corpus "
    "scan (same plan family as hard_negative_mining); per-probe window "
    "rank over the scored relation only.",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, label AS q_label, embedding AS q_vec
  FROM embeddings WHERE vec_id < 100
),
scored AS (
  SELECT q.query_id, q.q_label, e.vec_id AS nb_id, e.label AS nb_label,
         list_reduce(list_transform(list_zip(q.q_vec, e.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
                     (acc, v) -> acc + v)
         / (sqrt(list_reduce(list_transform(q.q_vec,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))
          * sqrt(list_reduce(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v)))
           AS cos
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
),
knn AS (
  SELECT query_id, q_label, nb_label
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos DESC, nb_id ASC) AS rk
    FROM scored
  ) WHERE rk <= 10
)
SELECT query_id, q_label,
       CAST(COUNT(1) FILTER (WHERE nb_label <> q_label) AS BIGINT) AS n_diff,
       COUNT(1) FILTER (WHERE nb_label <> q_label) / 10.0 AS frac_diff,
       CAST(COUNT(1) FILTER (WHERE nb_label <> q_label) >= 8 AS BOOLEAN)
         AS flagged_noisy
FROM knn
GROUP BY query_id, q_label
""",
)
def knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    c = fan_out(emb).select(
        F.col("vec_id").alias("nb_id"),
        F.col("label").alias("nb_label"),
        F.col("embedding").alias("c_vec"),
    )
    scored = c.join(
        F.broadcast(q), F.col("nb_id") != F.col("query_id")
    ).withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nb_id"))
    knn = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 10
    )
    n_diff = F.count_if(F.col("nb_label") != F.col("q_label"))
    return knn.groupBy("query_id", "q_label").agg(
        n_diff.alias("n_diff"),
        (n_diff / F.lit(10.0)).alias("frac_diff"),
        (n_diff >= 8).alias("flagged_noisy"),
    )


@register(
    "embedding_dim_stats",
    ops="EXT-embedding-diagnostics,A1 (per-dimension distribution audit)",
    doc="Per-dimension embedding distribution audit — the collapse / "
    "dead-dimension screen run before trusting cosine similarity: for "
    "each of the 64 dims, count, quantized mean, min, max, and "
    "variance, all from the 1e-6 integer grid: sum and sum-of-squares "
    "of quantized ints are exact bigints, and the final double "
    "arithmetic uses an identical operation order in both engines, so "
    "the moments are bit-identical cross-engine. One posexplode + one "
    "map-side-combined groupBy; output is 64 rows.",
    oracle=f"""
WITH ex AS (
  SELECT d.dim AS dim,
         CAST(FLOOR(CAST(embedding[d.dim + 1] AS DOUBLE) * {_Q}) AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(range(0, 64)) AS dim) d
)
SELECT dim,
       CAST(COUNT(1) AS BIGINT) AS n,
       CAST(SUM(q) AS DOUBLE) / ({_Q} * COUNT(1)) AS mean,
       CAST(MIN(q) AS DOUBLE) / {_Q} AS min_v,
       CAST(MAX(q) AS DOUBLE) / {_Q} AS max_v,
       (CAST(SUM(q * q) AS DOUBLE)
        - CAST(SUM(q) AS DOUBLE) * SUM(q) / COUNT(1))
         / ({_Q} * {_Q} * COUNT(1)) AS variance
FROM ex
GROUP BY dim
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    ex = emb.select(F.posexplode("embedding").alias("dim", "v")).select(
        "dim",
        F.floor(F.col("v").cast("double") * F.lit(_Q)).alias("q"),
    )
    n = F.count(F.lit(1))
    sq = F.sum("q")
    sqq = F.sum(F.col("q") * F.col("q"))
    return ex.groupBy("dim").agg(
        n.alias("n"),
        (sq.cast("double") / (F.lit(_Q) * n)).alias("mean"),
        (F.min("q").cast("double") / F.lit(_Q)).alias("min_v"),
        (F.max("q").cast("double") / F.lit(_Q)).alias("max_v"),
        (
            (sqq.cast("double") - sq.cast("double") * sq / n)
            / (F.lit(_Q) * F.lit(_Q) * n)
        ).alias("variance"),
    )


@register(
    "embedding_cosine_histogram",
    ops="EXT-similarity-calibration,A1 (pairwise-distance distribution)",
    doc="Similarity-threshold calibration: the distribution of pairwise "
    "cosines over a deterministic hash sample of vectors (md5 bucket "
    "< 64 of 1024 — a bounded all-pairs within the sample, never the "
    "corpus), bucketed to floor(cos*10). The histogram every near-dup "
    "threshold (0.92? 0.4?) should be read against before it is "
    "pinned; sampled pair count scales with the SQUARE of the sample "
    "rate, not corpus size.",
    oracle="""
WITH s AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE ('0x' || substr(md5('pairs' || ':' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
        % 1024 < 64
),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                     x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
                     (acc, v) -> acc + v)
         / (sqrt(list_reduce(list_transform(a.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))
          * sqrt(list_reduce(list_transform(b.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v)))
           AS cos
  FROM s a JOIN s b ON a.vec_id < b.vec_id
)
SELECT CAST(FLOOR(cos * 10) AS INT) AS cos_decile,
       CAST(COUNT(1) AS BIGINT) AS n_pairs,
       MIN(cos) AS min_cos, MAX(cos) AS max_cos
FROM pairs
GROUP BY 1
""",
)
def embedding_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("pairs"), F.col("vec_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1024
    )
    s = emb.filter(bucket < 64).select("vec_id", "embedding")
    a = s.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = s.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    pairs = a.join(F.broadcast(b), F.col("ia") < F.col("ib")).withColumn(
        "cos", cosine(F.col("ea"), F.col("eb"))
    )
    return pairs.groupBy(
        F.floor(F.col("cos") * 10).cast("int").alias("cos_decile")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("cos").alias("min_cos"),
        F.max("cos").alias("max_cos"),
    )


# ---------------------------------------------------------------------------
# Cross-dimension correlation audit (round 6)
# ---------------------------------------------------------------------------

_CORR_TOPK = 10


@register(
    "embedding_corr_pairs",
    ops="EXT-embedding-corr,A1 (exact dim-pair correlation top-k)",
    doc="Cross-dimension redundancy audit: Pearson correlation for every "
    "(i < j) dimension pair from exact integer sufficient statistics on "
    "the 1e-6 component grid — per-row pair products explode to dim^2/2 "
    "rows but collapse map-side, so the SHUFFLE carries only 2016 "
    "(i, j) keys regardless of corpus size (the whitening/PCA go-no-go "
    "audit: strongly correlated dims mean the embedding wastes "
    "capacity). Top-10 pairs by |corr| in floor-ppm; HUGEINT/decimal "
    "sums (n * Σxy overflows int64 past ~1e6 vectors).",
    oracle=f"""
WITH ex AS (
  SELECT vec_id, i.i AS dim,
         CAST(FLOOR(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000.0)
              AS BIGINT) AS q
  FROM embeddings, (SELECT unnest(range(0, 64)) AS i) i
),
dimstats AS (
  SELECT dim, COUNT(1) AS n,
         SUM(q::HUGEINT) AS s, SUM(q::HUGEINT * q) AS ss
  FROM ex GROUP BY dim
),
prods AS (
  SELECT a.dim AS i, b.dim AS j, SUM(a.q::HUGEINT * b.q) AS sxy
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim < b.dim
  GROUP BY a.dim, b.dim
),
corr AS (
  SELECT p.i, p.j,
         CAST(FLOOR(
           (da.n * CAST(p.sxy AS DOUBLE) - CAST(da.s AS DOUBLE) * CAST(db.s AS DOUBLE))
           * 1000000.0
           / (sqrt(da.n * CAST(da.ss AS DOUBLE) - CAST(da.s AS DOUBLE) * CAST(da.s AS DOUBLE))
            * sqrt(db.n * CAST(db.ss AS DOUBLE) - CAST(db.s AS DOUBLE) * CAST(db.s AS DOUBLE)))
         ) AS BIGINT) AS corr_ppm
  FROM prods p
  JOIN dimstats da ON da.dim = p.i
  JOIN dimstats db ON db.dim = p.j
)
SELECT CAST(i AS INT) AS dim_i, CAST(j AS INT) AS dim_j, corr_ppm
FROM corr
ORDER BY abs(corr_ppm) DESC, i, j
LIMIT {_CORR_TOPK}
""",
)
def embedding_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    qarr = F.transform(
        "embedding",
        lambda v: F.floor(v.cast("double") * 1000000.0).cast("bigint"),
    )
    base = emb.select("vec_id", qarr.alias("q"))
    # Per-dim sufficient stats: 64-key aggregate.
    ex = base.select("vec_id", F.posexplode("q").alias("dim", "qv"))
    dimstats = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("qv").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("qv").cast("decimal(38,0)") * F.col("qv")).alias("ss"),
    )
    # Per-row (i, j, qi*qj) pair products: dim^2/2 rows per vector that
    # collapse in the map-side partial aggregate — the shuffle carries
    # only the 2016 (i, j) keys.
    pair_structs = F.expr(
        """flatten(transform(sequence(0, 62), i ->
             transform(sequence(i + 1, 63), j ->
               struct(i AS i, j AS j, q[i] * q[j] AS p))))"""
    )
    prods = (
        base.select(F.explode(pair_structs).alias("x"))
        .groupBy(F.col("x.i").alias("i"), F.col("x.j").alias("j"))
        .agg(F.sum(F.col("x.p").cast("decimal(38,0)")).alias("sxy"))
    )
    da = dimstats.select(
        F.col("dim").alias("i"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("ss").alias("ssa"),
    )
    db = dimstats.select(
        F.col("dim").alias("j"),
        F.col("s").alias("sb"),
        F.col("ss").alias("ssb"),
    )
    dd = lambda c: F.col(c).cast("double")
    corr = (
        prods.join(F.broadcast(da), "i")
        .join(F.broadcast(db), "j")
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            F.floor(
                (F.col("na") * dd("sxy") - dd("sa") * dd("sb"))
                * 1000000.0
                / (
                    F.sqrt(F.col("na") * dd("ssa") - dd("sa") * dd("sa"))
                    * F.sqrt(F.col("na") * dd("ssb") - dd("sb") * dd("sb"))
                )
            )
            .cast("bigint")
            .alias("corr_ppm"),
        )
    )
    return corr.orderBy(
        F.abs("corr_ppm").desc(), "dim_i", "dim_j"
    ).limit(_CORR_TOPK)


# ---------------------------------------------------------------------------
# Distributed power iteration (round 7)
# ---------------------------------------------------------------------------

_PI_ITERS = 3
_PI_DIMS = 64


def _pi_oracle(iters: int = _PI_ITERS, dims: int = _PI_DIMS) -> str:
    """Unrolled power-iteration CTEs mirroring the Spark loop
    bit-for-bit (same quantization contract as _kmeans_ctes in
    queries/similarity.py)."""
    init = ", ".join(["0.125"] * dims)
    parts = [f"v0 AS (SELECT [{init}]::DOUBLE[] AS vl)"]
    for t in range(1, iters + 1):
        parts.append(f"""s{t} AS (
  SELECT e.vec_id, e.embedding,
         list_reduce(list_transform(list_zip(e.embedding, v.vl),
           x -> CAST(x[1] AS DOUBLE) * x[2]), (acc, x) -> acc + x) AS s
  FROM embeddings e, v{t - 1} v
)""")
        parts.append(f"""u{t} AS (
  SELECT d.dim AS dim,
         SUM(CAST(FLOOR(s * CAST(embedding[d.dim + 1] AS DOUBLE) * 1000000)
                  AS BIGINT)) AS u_int
  FROM s{t}, (SELECT unnest(range(0, {dims})) AS dim) d
  GROUP BY d.dim
)""")
        parts.append(
            f"n{t} AS (SELECT SUM(u_int::HUGEINT * u_int) AS n2 FROM u{t})"
        )
        parts.append(
            f"p{t} AS (SELECT dim, CAST(FLOOR(u_int::DOUBLE"
            f" / sqrt(n2::DOUBLE) * 1000000) AS BIGINT) AS ppm"
            f" FROM u{t}, n{t})"
        )
        parts.append(
            f"v{t} AS (SELECT list(ppm::DOUBLE / 1000000.0 ORDER BY dim)"
            f" AS vl FROM p{t})"
        )
    return ",\n".join(parts)


@register(
    "embedding_power_iteration",
    ops="EXT-embedding-analytics,A1 (iterative distributed linear algebra)",
    doc="Dominant singular direction of the embedding matrix by 3 "
    "unrolled DISTRIBUTED power iterations — the classic iterative "
    "algorithm expressed as a declarative plan, no driver loop: each "
    "iteration is one broadcast of the 64-dim vector, one per-row "
    "left-fold dot product, one posexplode + 64-group integer "
    "aggregate, one 1-row norm broadcast. Cross-engine exactness via "
    "the kmeans_centroids quantization contract: every per-row term is "
    "floor-quantized to the 1e-6 grid BEFORE summation (integer sums "
    "are order-independent), and the normalized components re-quantize "
    "to integer ppm each round. At 100 TB each iteration is a single "
    "map-side-combined aggregate over the corpus.",
    oracle=f"""
WITH {_pi_oracle()}
SELECT CAST(dim AS INT) AS dim, ppm AS loading_ppm
FROM p{_PI_ITERS}
ORDER BY dim
""",
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.vectors import dot

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    v = spark.range(1).select(
        F.array(*[F.lit(0.125) for _ in range(_PI_DIMS)]).alias("vl")
    )
    p = None
    for _ in range(_PI_ITERS):
        scored = emb.join(F.broadcast(v)).select(
            "embedding", dot(F.col("embedding"), F.col("vl")).alias("s")
        )
        terms = scored.select(
            "s", F.posexplode("embedding").alias("dim", "x")
        )
        u = terms.groupBy("dim").agg(
            F.sum(
                F.floor(
                    F.col("s") * F.col("x").cast("double") * 1_000_000
                ).cast("bigint")
            ).alias("u_int")
        )
        n2 = u.agg(
            F.sum(F.expr("cast(u_int as decimal(38,0)) * u_int")).alias("n2")
        )
        p = u.join(F.broadcast(n2)).select(
            "dim",
            F.floor(
                F.col("u_int").cast("double")
                / F.sqrt(F.col("n2").cast("double"))
                * 1_000_000
            )
            .cast("bigint")
            .alias("ppm"),
        )
        v = p.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "ppm"))),
                lambda st: st["ppm"].cast("double") / 1_000_000.0,
            ).alias("vl")
        )
    return p.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("ppm").alias("loading_ppm"),
    ).orderBy("dim")


# ---------------------------------------------------------------------------
# Embedding-norm outlier audit (round 7)
# ---------------------------------------------------------------------------


@register(
    "embedding_norm_outliers",
    ops="EXT-embedding-analytics,A1 (robust broken-vector screen)",
    doc="Broken-embedding screen: per-vector L2 norm floor-quantized to "
    "integer ppm (exact cross-engine left-fold), corpus median and MAD "
    "over the quantized norms (exact percentile interpolation on "
    "integers), and per-label outlier counts at |norm - median| > "
    "5*MAD. Zero/NaN-norm rows and scale-drifted batches are the "
    "classic upstream-encoder failures this catches before ANN "
    "indexing. Aggregates run over (label, norm) rollups.",
    oracle="""
WITH norms AS (
  SELECT vec_id, label,
         CAST(FLOOR(sqrt(list_reduce(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             (acc, v) -> acc + v)) * 1000000) AS BIGINT) AS norm_ppm
  FROM embeddings
),
med AS (SELECT quantile_cont(norm_ppm, 0.5) AS m FROM norms),
dev AS (
  SELECT n.label, n.norm_ppm, abs(n.norm_ppm - m.m) AS ad
  FROM norms n, med m
),
mad AS (SELECT quantile_cont(ad, 0.5) AS mad FROM dev)
SELECT d.label,
       CAST(COUNT(1) AS BIGINT) AS n_vectors,
       CAST(MIN(d.norm_ppm) AS BIGINT) AS min_norm_ppm,
       CAST(MAX(d.norm_ppm) AS BIGINT) AS max_norm_ppm,
       CAST(SUM(CASE WHEN d.ad > 5 * x.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d, mad x
GROUP BY d.label
ORDER BY d.label
""",
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.vectors import norm

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    norms = emb.select(
        "label",
        F.floor(norm(F.col("embedding")) * 1_000_000)
        .cast("bigint")
        .alias("norm_ppm"),
    )
    med = norms.agg(F.expr("percentile(norm_ppm, 0.5)").alias("m"))
    dev = norms.join(F.broadcast(med)).select(
        "label",
        "norm_ppm",
        F.abs(F.col("norm_ppm") - F.col("m")).alias("ad"),
    )
    mad = dev.agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("norm_ppm").cast("bigint").alias("min_norm_ppm"),
            F.max("norm_ppm").cast("bigint").alias("max_norm_ppm"),
            F.sum(
                F.when(F.col("ad") > 5 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Farthest-point (k-center greedy) diversity seeding (round 7)
# ---------------------------------------------------------------------------

_KC_SEEDS = 4

# DuckDB cosine template (same left-fold contract as functions.vectors)
_PI_COS = """
list_reduce(list_transform(list_zip({a}, {b}),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)
/ (sqrt(list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        (acc, v) -> acc + v))
 * sqrt(list_reduce(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        (acc, v) -> acc + v)))
"""


def _kc_oracle(k: int = _KC_SEEDS) -> str:
    cos0 = _PI_COS.format(a="e.embedding", b="s.embedding")
    parts = [
        "s0 AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 1)",
        f"""d0 AS (
  SELECT e.vec_id, e.embedding,
         1000000 - CAST(FLOOR(({cos0}) * 1000000) AS BIGINT) AS dmin
  FROM embeddings e, s0 s
)""",
    ]
    for t in range(1, k):
        cost = _PI_COS.format(a="d.embedding", b="s.embedding")
        parts.append(
            f"s{t} AS (SELECT vec_id, embedding, dmin FROM d{t - 1}"
            f" ORDER BY dmin DESC, vec_id LIMIT 1)"
        )
        if t < k - 1:
            parts.append(f"""d{t} AS (
  SELECT d.vec_id, d.embedding,
         LEAST(d.dmin,
               1000000 - CAST(FLOOR(({cost}) * 1000000) AS BIGINT)) AS dmin
  FROM d{t - 1} d, s{t} s
)""")
    selects = ["SELECT 0 AS seed_round, vec_id, CAST(0 AS BIGINT) AS dist_ppm FROM s0"]
    for t in range(1, k):
        selects.append(
            f"SELECT {t}, vec_id, CAST(dmin AS BIGINT) FROM s{t}"
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY seed_round"


@register(
    "kcenter_greedy_seeding",
    ops="EXT-sampling-diversity,A1,O3 (farthest-point traversal)",
    doc="Farthest-point (k-center greedy) diversity sampling over the "
    "embedding corpus — the coreset/active-learning exemplar selection "
    "pass: seed with the min-id vector, then 3 unrolled rounds each "
    "pick the vector farthest (max 1e6-scaled 1-cos, quantized to "
    "integer ppm, ties to min id) from the selected set, maintaining "
    "running min-distances declaratively (no driver loop). Each round "
    "is one corpus scan + a global TakeOrdered(1) + a 1-row broadcast; "
    "selected points self-exclude (their dmin collapses to 0).",
    oracle="WITH " + _kc_oracle(),
)
def kcenter_greedy_seeding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.vectors import cosine as _cos

    emb = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    s0 = emb.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("s_id"), F.col("embedding").alias("s_vec")
    )
    dist_to = lambda seed_vec: (  # noqa: E731
        F.lit(1_000_000)
        - F.floor(_cos(F.col("embedding"), seed_vec) * 1_000_000)
    ).cast("bigint")
    cur = emb.join(F.broadcast(s0)).select(
        "vec_id", "embedding", dist_to(F.col("s_vec")).alias("dmin")
    )
    picks = [
        s0.select(
            F.lit(0).alias("seed_round"),
            F.col("s_id").alias("vec_id"),
            F.lit(0).cast("bigint").alias("dist_ppm"),
        )
    ]
    for t in range(1, _KC_SEEDS):
        # Checkpoint the 1-row pick: without it cur_t embeds cur_{t-1}
        # TWICE (directly + inside this limit(1) subtree) and the plan
        # doubles per round — the same replanning blowup the k-core
        # peeler hit (graph_rank.py). Lazy (GC-freed) is enough: the
        # single materialization at action time already cuts the lineage.
        st = (
            cur.orderBy(F.desc("dmin"), F.asc("vec_id"))
            .limit(1)
            .localCheckpoint(eager=False)
        )
        picks.append(
            st.select(
                F.lit(t).alias("seed_round"),
                "vec_id",
                F.col("dmin").cast("bigint").alias("dist_ppm"),
            )
        )
        if t < _KC_SEEDS - 1:
            seed = st.select(
                F.col("embedding").alias("s_vec")
            )
            cur = cur.join(F.broadcast(seed)).select(
                "vec_id",
                "embedding",
                F.least(F.col("dmin"), dist_to(F.col("s_vec"))).alias("dmin"),
            )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.orderBy("seed_round")


# ---------------------------------------------------------------------------
# Label-centroid similarity matrix (round 8)
# ---------------------------------------------------------------------------

_CENT_COS = """
list_reduce(list_transform(list_zip({a}, {b}),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)
/ (sqrt(list_reduce(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        (acc, v) -> acc + v))
 * sqrt(list_reduce(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        (acc, v) -> acc + v)))
"""


@register(
    "label_centroid_similarity",
    ops="EXT-embedding-analytics,A1,J4 (class-pair centroid cosine matrix)",
    doc="Pairwise label-centroid cosine matrix — the BETWEEN-class "
    "complement of label_centroid_cohesion's within-class audit (the "
    "two together are the class-separability read before training on "
    "frozen embeddings: tight classes + low cross-centroid cosine = "
    "separable), and the embedding-space complement of "
    "kmv_source_overlap's lexical overlap. Centroids use the same "
    "floor-quantized exact-integer mean as k-means; the pair stage is "
    "a |labels|^2-bounded join over 10 centroid rows — the corpus is "
    "touched once for the component sums, never by the pairing.",
    oracle=f"""
WITH ex AS (
  SELECT label, d.dim AS dim, CAST(embedding[d.dim + 1] AS DOUBLE) AS v
  FROM embeddings, (SELECT unnest(range(0, 64)) AS dim) d
),
comp AS (
  SELECT label, dim,
         CAST(SUM(CAST(FLOOR(v * {_Q}) AS BIGINT)) AS DOUBLE)
           / ({_Q} * COUNT(*)) AS c,
         COUNT(*) AS nd
  FROM ex GROUP BY label, dim
),
cents AS (
  SELECT label, list(c ORDER BY dim) AS cent,
         CAST(MAX(nd) AS BIGINT) AS n_members
  FROM comp GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       a.n_members AS n_a, b.n_members AS n_b,
       CAST(FLOOR(({_CENT_COS.format(a="a.cent", b="b.cent")}) * {_Q})
            AS BIGINT) AS centroid_cos_q
FROM cents a JOIN cents b ON a.label < b.label
ORDER BY label_a, label_b
""",
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.functions.vectors import cosine as _cos

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    long = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select("label", "dim", F.col("v").cast("double").alias("v"))
    comp = (
        long.select("label", "dim", F.floor(F.col("v") * F.lit(_Q)).alias("q"))
        .groupBy("label", "dim")
        .agg(
            (F.sum("q").cast("double") / (F.lit(_Q) * F.count(F.lit(1)))).alias("c"),
            F.count(F.lit(1)).alias("nd"),
        )
    )
    cents = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("cent"),
        F.max("nd").cast("bigint").alias("n_members"),
    )
    a = cents.select(
        F.col("label").alias("label_a"),
        F.col("cent").alias("cent_a"),
        F.col("n_members").alias("n_a"),
    )
    b = cents.select(
        F.col("label").alias("label_b"),
        F.col("cent").alias("cent_b"),
        F.col("n_members").alias("n_b"),
    )
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.floor(_cos(F.col("cent_a"), F.col("cent_b")) * F.lit(_Q))
            .cast("bigint")
            .alias("centroid_cos_q"),
        )
        .orderBy("label_a", "label_b")
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation-quality audit (round 9)
# ---------------------------------------------------------------------------

_MRL_PROBES = 4
_MRL_K = 10
_MRL_DIMS = (16, 32, 64)  # 64 = full dimension (sanity row: overlap == k)


@register(
    "matryoshka_truncation_audit",
    ops="EXT-embedding-mrl,W1,A1,J4 (truncated-dim retrieval quality)",
    doc="Matryoshka-style truncation audit: for a deterministic probe "
    f"panel ({_MRL_PROBES} lowest vec_ids), retrieve top-{_MRL_K} "
    "neighbors by full-dimension cosine and by prefix-truncated cosine "
    "(first 16 / 32 components, renormalized), and report per dimension "
    "the overlap@k with the full-dim ranking — the evidence for how many "
    "components a memory-constrained ANN tier can drop. Cosines are "
    "floored to integer ppm with vec_id tiebreaks, so ranks are "
    "bit-stable cross-engine. The probe panel broadcasts (declared "
    "brute-force baseline shape); per-(dim, probe) top-k runs TWO-PHASE "
    "(per-partition prune to k, then the tiny survivor rank) so no "
    "corpus-sized partition ever funnels through one task.",
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS p
  FROM embeddings ORDER BY vec_id LIMIT {_MRL_PROBES}
),
dims AS (SELECT unnest([{", ".join(str(d) for d in _MRL_DIMS)}]) AS dims),
scored AS (
  SELECT d.dims, pr.probe_id, e.vec_id,
         CAST(FLOOR(({_PI_COS.format(
             a="list_slice(e.embedding, 1, d.dims)",
             b="list_slice(pr.p, 1, d.dims)")}) * 1000000) AS BIGINT)
           AS cos_ppm
  FROM embeddings e, probes pr, dims d
  WHERE e.vec_id <> pr.probe_id
),
ranked AS (
  SELECT dims, probe_id, vec_id,
         ROW_NUMBER() OVER (PARTITION BY dims, probe_id
                            ORDER BY cos_ppm DESC, vec_id ASC) AS r
  FROM scored
),
topk AS (SELECT dims, probe_id, vec_id FROM ranked WHERE r <= {_MRL_K}),
full_set AS (SELECT probe_id, vec_id FROM topk WHERE dims = {_MRL_DIMS[-1]}),
overlap AS (
  SELECT t.dims, t.probe_id, CAST(COUNT(1) AS BIGINT) AS n_overlap
  FROM topk t JOIN full_set f
    ON f.probe_id = t.probe_id AND f.vec_id = t.vec_id
  GROUP BY t.dims, t.probe_id
)
SELECT CAST(dims AS INTEGER) AS dims,
       CAST(SUM(n_overlap) AS BIGINT) AS overlap_total,
       CAST(MIN(n_overlap) AS BIGINT) AS overlap_min,
       CAST(SUM(n_overlap) * 1000 // ({_MRL_PROBES} * {_MRL_K}) AS BIGINT)
         AS mean_overlap_milli
FROM overlap
GROUP BY dims
ORDER BY dims
""",
)
def matryoshka_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    probes = (
        emb.orderBy("vec_id")
        .limit(_MRL_PROBES)
        .select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("p"))
    )
    dims = spark.range(1).select(
        F.explode(F.array(*[F.lit(d) for d in _MRL_DIMS])).alias("dims")
    )
    pairs = emb.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
    scored = pairs.join(F.broadcast(dims), F.lit(True)).select(
        "dims",
        "probe_id",
        "vec_id",
        F.floor(
            cosine(
                F.slice(F.col("embedding"), 1, F.col("dims")),
                F.slice(F.col("p"), 1, F.col("dims")),
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("cos_ppm"),
    )
    # Two-phase per-(dims, probe) top-k: local prune bounds every survivor
    # set at k per partition, so the final rank window sees <= k * parts
    # rows per key instead of the corpus.
    local_w = Window.partitionBy(
        F.spark_partition_id(), "dims", "probe_id"
    ).orderBy(F.desc("cos_ppm"), F.asc("vec_id"))
    pruned = (
        scored.withColumn("lr", F.row_number().over(local_w))
        .filter(F.col("lr") <= _MRL_K)
        .drop("lr")
    )
    final_w = Window.partitionBy("dims", "probe_id").orderBy(
        F.desc("cos_ppm"), F.asc("vec_id")
    )
    topk = (
        pruned.withColumn("r", F.row_number().over(final_w))
        .filter(F.col("r") <= _MRL_K)
        .select("dims", "probe_id", "vec_id")
        .localCheckpoint(eager=False)
    )
    full_set = topk.filter(F.col("dims") == _MRL_DIMS[-1]).select(
        F.col("probe_id").alias("f_probe"), F.col("vec_id").alias("f_vec")
    )
    overlap = (
        topk.join(
            full_set,
            (F.col("probe_id") == F.col("f_probe"))
            & (F.col("vec_id") == F.col("f_vec")),
        )
        .groupBy("dims", "probe_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    return (
        overlap.groupBy("dims")
        .agg(
            F.sum("n_overlap").cast("bigint").alias("overlap_total"),
            F.min("n_overlap").cast("bigint").alias("overlap_min"),
            F.expr(
                f"CAST(sum(n_overlap) * 1000 div ({_MRL_PROBES} * {_MRL_K})"
                " AS BIGINT)"
            ).alias("mean_overlap_milli"),
        )
        .select(F.col("dims").cast("int").alias("dims"), "overlap_total",
                "overlap_min", "mean_overlap_milli")
        .orderBy("dims")
    )


# ---------------------------------------------------------------------------
# k-means|| oversampling init (round 9)
# ---------------------------------------------------------------------------

_KPP_L = 16  # oversampling factor per round (~2x the target k=8)


def _kpp_dist_sql(a: str, b: str) -> str:
    """Milli-quantized cosine distance 1000 - floor(cos*1000): exact int
    in [0, 2000]. Milli (not ppm) so sum-of-squares stays under int64
    even at 10^12 points (4e6 per point)."""
    return f"(1000 - CAST(FLOOR(({_PI_COS.format(a=a, b=b)}) * 1000) AS BIGINT))"


@register(
    "kmeanspp_parallel_init",
    ops="EXT-clustering-init,A1,W1 (k-means|| oversampling)",
    doc="k-means|| initialization (Bahmani et al. 2012, VLDB): seed with "
    "the min-id vector, then TWO oversampling rounds each keep point i "
    f"with probability {_KPP_L} * d(i)^2 / sum(d^2) (d = milli-quantized "
    "cosine distance to the nearest candidate so far, exact integers; "
    "the keep decision reuses the engine-shared salted-md5 uniform grid, "
    "so sampling is reproducible row-for-row in any engine). Distance "
    "updates run as a MAP-ONLY fold over the sorted broadcast candidate "
    "array — no corpus x candidates shuffle — and the final weights "
    "(points per nearest candidate, the input to the weighted k-means "
    "that follows) come from one argmin fold + one count aggregate. "
    "Rounds never re-pick a selected candidate: each keep round "
    "anti-joins the candidate set so far (explicit, not a reliance on "
    "the float cosine of a vector with itself quantizing to exactly "
    "d = 0). Per round: one corpus scan; everything else is "
    "candidate-grain.",
    oracle=f"""
WITH c0 AS (
  SELECT vec_id AS c_id, embedding AS c_vec
  FROM embeddings ORDER BY vec_id LIMIT 1
),
d0 AS (
  SELECT e.vec_id, e.embedding,
         {_kpp_dist_sql("e.embedding", "c.c_vec")} AS d
  FROM embeddings e, c0 c
),
t0 AS (SELECT CAST(SUM(d * d) AS BIGINT) AS t FROM d0),
keep1 AS (
  SELECT p.vec_id, p.embedding
  FROM d0 p, t0
  WHERE p.vec_id NOT IN (SELECT c_id FROM c0)
    AND {hash_uniform_sql("p.vec_id", "kpp0")}
        < CAST({_KPP_L} * p.d * p.d AS DOUBLE) / CAST(t0.t AS DOUBLE)
),
k1d AS (
  SELECT p.vec_id, MIN({_kpp_dist_sql("p.embedding", "k.embedding")}) AS md
  FROM d0 p, keep1 k GROUP BY p.vec_id
),
d1 AS (
  SELECT p.vec_id, p.embedding, LEAST(p.d, COALESCE(k.md, p.d)) AS d
  FROM d0 p LEFT JOIN k1d k ON k.vec_id = p.vec_id
),
t1 AS (SELECT CAST(SUM(d * d) AS BIGINT) AS t FROM d1),
keep2 AS (
  SELECT p.vec_id, p.embedding
  FROM d1 p, t1
  WHERE p.vec_id NOT IN (SELECT c_id FROM c0 UNION ALL
                         SELECT vec_id FROM keep1)
    AND {hash_uniform_sql("p.vec_id", "kpp1")}
        < CAST({_KPP_L} * p.d * p.d AS DOUBLE) / CAST(t1.t AS DOUBLE)
),
cands AS (
  SELECT 0 AS round_added, c_id AS cand_id, c_vec AS cand_vec FROM c0
  UNION ALL
  SELECT 1, vec_id, embedding FROM keep1
  UNION ALL
  SELECT 2, vec_id, embedding FROM keep2
),
assigned AS (
  SELECT vec_id, cand_id FROM (
    SELECT e.vec_id, c.cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_kpp_dist_sql("e.embedding", "c.cand_vec")} ASC,
                      c.cand_id ASC) AS r
    FROM embeddings e, cands c) WHERE r = 1
)
SELECT CAST(c.round_added AS INTEGER) AS round_added,
       CAST(c.cand_id AS BIGINT) AS cand_id,
       CAST(COUNT(a.vec_id) AS BIGINT) AS weight
FROM cands c LEFT JOIN assigned a ON a.cand_id = c.cand_id
GROUP BY c.round_added, c.cand_id
ORDER BY round_added, cand_id
""",
)
def kmeanspp_parallel_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.sampling import hash_uniform

    emb = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )

    def dist_to(vec):
        return (
            F.lit(1000).cast("bigint")
            - F.floor(cosine(F.col("embedding"), vec) * 1000).cast("bigint")
        )

    def keep_round(drel, salt, selected):
        """One oversampling round: threshold the shared uniform grid at
        l * d^2 / sum(d^2); the total rides on a 1-row broadcast. The
        candidate set so far (``selected``: vec_id-only, candidate-grain
        so broadcastable) is anti-joined out — an explicit no-re-pick
        guarantee instead of trusting cos(v, v) to quantize to d = 0."""
        t = drel.agg(F.sum(F.col("d") * F.col("d")).cast("bigint").alias("t"))
        return (
            drel.join(F.broadcast(selected), "vec_id", "left_anti")
            .join(F.broadcast(t), F.lit(True))
            .filter(
                hash_uniform(F.col("vec_id"), salt)
                < (F.lit(_KPP_L) * F.col("d") * F.col("d")).cast("double")
                / F.col("t").cast("double")
            )
            .select("vec_id", "embedding")
            .localCheckpoint(eager=False)
        )

    def min_over(drel, keeps):
        """Map-only distance update: fold over the SORTED broadcast
        candidate array (sort_array makes the fold order deterministic;
        min over exact ints is order-free anyway)."""
        arr = keeps.agg(
            F.sort_array(
                F.collect_list(F.struct("vec_id", "embedding"))
            ).alias("ks")
        )
        return drel.join(F.broadcast(arr), F.lit(True)).select(
            "vec_id",
            "embedding",
            F.least(
                F.col("d"),
                F.aggregate(
                    F.col("ks"),
                    F.lit(2001).cast("bigint"),
                    lambda acc, k: F.least(acc, dist_to(k["embedding"])),
                ),
            ).alias("d"),
        )

    c0 = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
        .localCheckpoint(eager=False)
    )
    d0 = emb.join(F.broadcast(c0), F.lit(True)).select(
        "vec_id", "embedding", dist_to(F.col("c_vec")).alias("d")
    )
    sel0 = c0.select(F.col("c_id").alias("vec_id"))
    keep1 = keep_round(d0, "kpp0", sel0)
    d1 = min_over(d0, keep1)
    keep2 = keep_round(d1, "kpp1", sel0.unionByName(keep1.select("vec_id")))

    cands = (
        c0.select(
            F.lit(0).alias("round_added"),
            F.col("c_id").alias("cand_id"),
            F.col("c_vec").alias("cand_vec"),
        )
        .unionByName(
            keep1.select(
                F.lit(1).alias("round_added"),
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("cand_vec"),
            )
        )
        .unionByName(
            keep2.select(
                F.lit(2).alias("round_added"),
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("cand_vec"),
            )
        )
        .localCheckpoint(eager=False)
    )
    # Argmin assignment as another map-only fold over the sorted candidate
    # array: acc = (best_d, best_id), strict < keeps the lowest cand_id on
    # ties — identical to the oracle's ROW_NUMBER (d ASC, cand_id ASC).
    carr = cands.agg(
        F.sort_array(F.collect_list(F.struct("cand_id", "cand_vec"))).alias(
            "cs"
        )
    )
    assigned = (
        emb.join(F.broadcast(carr), F.lit(True))
        .select(
            "vec_id",
            F.aggregate(
                F.col("cs"),
                F.struct(
                    F.lit(2001).cast("bigint").alias("bd"),
                    F.lit(-1).cast("bigint").alias("bi"),
                ),
                lambda acc, c: F.when(
                    dist_to(c["cand_vec"]) < acc["bd"],
                    F.struct(
                        dist_to(c["cand_vec"]).alias("bd"),
                        c["cand_id"].cast("bigint").alias("bi"),
                    ),
                ).otherwise(acc),
            )["bi"].alias("cand_id"),
        )
        .groupBy("cand_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
    )
    return (
        cands.select("round_added", "cand_id")
        .join(assigned, "cand_id", "left")
        .select(
            F.col("round_added").cast("int").alias("round_added"),
            F.col("cand_id").cast("bigint").alias("cand_id"),
            F.coalesce("weight", F.lit(0)).cast("bigint").alias("weight"),
        )
        .orderBy("round_added", "cand_id")
    )


# ---------------------------------------------------------------------------
# One Lloyd iteration of k-means (round 10)
# ---------------------------------------------------------------------------

_LLOYD_K = 8


@register(
    "kmeans_lloyd_iteration",
    ops="EXT-clustering-lloyd,A1,W1 (one exact k-means step)",
    doc="One Lloyd iteration of k-means over the embedding corpus — the "
    "step that follows kmeanspp_parallel_init in a full clustering run, "
    f"made exactly reproducible: vectors quantize to the offset-millis "
    "grid q = floor((x + 2) * 1000) (the +2 offset keeps every "
    "coordinate non-negative, so floor-division centroid means agree "
    "between Spark's truncating div and DuckDB's flooring // — squared "
    "L2 distances are offset-invariant), assignment is argmin of exact "
    "integer squared L2 with ties to the smallest centroid id, and the "
    "centroid update is the per-dimension floor mean. Reports per "
    "cluster the member count, exact inertia, and the squared shift of "
    "the updated centroid. Scale shape: the distance pass is a map-only "
    "fold over the sorted broadcast centroid array (no corpus x k "
    "shuffle); the update is one posexplode + (cluster, dim)-keyed "
    "aggregate — k*dims result rows.",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR((CAST(x AS DOUBLE) + 2) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
seeds AS (
  SELECT vec_id AS cid, qv AS cv FROM q ORDER BY vec_id LIMIT {_LLOYD_K}
),
dist AS (
  SELECT p.vec_id, s.cid,
         list_reduce(list_transform(list_zip(p.qv, s.cv),
                     x -> (x[1] - x[2]) * (x[1] - x[2])),
                     (a, v) -> a + v) AS d
  FROM q p, seeds s
),
assigned AS (
  SELECT vec_id, cid, d FROM (
    SELECT vec_id, cid, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY d ASC, cid ASC) AS r
    FROM dist) WHERE r = 1
),
members AS (
  SELECT cid, CAST(COUNT(1) AS BIGINT) AS n_members,
         CAST(SUM(d) AS BIGINT) AS inertia
  FROM assigned GROUP BY cid
),
newdim AS (
  SELECT a.cid, u.i, CAST(SUM(p.qv[u.i::INT]) // m.n_members AS BIGINT) AS c_new
  FROM assigned a
  JOIN q p ON p.vec_id = a.vec_id
  JOIN members m ON m.cid = a.cid,
  unnest(range(1, 65)) AS u(i)
  GROUP BY a.cid, u.i, m.n_members
),
shift AS (
  SELECT n.cid,
         CAST(SUM((s.cv[n.i::INT] - n.c_new) * (s.cv[n.i::INT] - n.c_new))
              AS BIGINT) AS shift_sq
  FROM newdim n JOIN seeds s ON s.cid = n.cid
  GROUP BY n.cid
)
SELECT m.cid AS cluster_id, m.n_members, m.inertia, sh.shift_sq
FROM members m JOIN shift sh ON sh.cid = m.cid
ORDER BY cluster_id
""",
)
def kmeans_lloyd_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor((x.cast("double") + F.lit(2.0)) * 1000).cast(
                "bigint"
            ),
        ).alias("qv"),
    )
    seeds = (
        emb.orderBy("vec_id")
        .limit(_LLOYD_K)
        .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
        .localCheckpoint(eager=False)
    )
    # Map-only assignment: fold over the sorted broadcast centroid array,
    # acc = (best_d, best_id); strict < keeps the smallest cid on ties —
    # identical to the oracle's ROW_NUMBER (d ASC, cid ASC).
    carr = seeds.agg(
        F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("cs")
    )

    def sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )

    assigned = (
        emb.join(F.broadcast(carr), F.lit(True))
        .select(
            "vec_id",
            "qv",
            F.aggregate(
                F.col("cs"),
                F.struct(
                    F.lit(None).cast("bigint").alias("bd"),
                    F.lit(-1).cast("bigint").alias("bi"),
                ),
                lambda acc, c: F.when(
                    acc["bd"].isNull() | (sqdist(F.col("qv"), c["cv"]) < acc["bd"]),
                    F.struct(
                        sqdist(F.col("qv"), c["cv"]).alias("bd"),
                        c["cid"].cast("bigint").alias("bi"),
                    ),
                ).otherwise(acc),
            ).alias("best"),
        )
        .select(
            "vec_id",
            "qv",
            F.col("best.bi").alias("cid"),
            F.col("best.bd").alias("d"),
        )
        .localCheckpoint(eager=False)
    )
    members = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("d").cast("bigint").alias("inertia"),
    )
    newdim = (
        assigned.select("cid", F.posexplode("qv").alias("i0", "v"))
        .groupBy("cid", (F.col("i0") + 1).alias("i"))
        .agg(F.sum("v").alias("s"))
        .join(F.broadcast(members), "cid")
        .select(
            "cid", "i", F.expr("CAST(s div n_members AS BIGINT)").alias("c_new")
        )
    )
    seed_dims = seeds.select(
        "cid", F.posexplode("cv").alias("i0", "c_old")
    ).select("cid", (F.col("i0") + 1).alias("i"), "c_old")
    shift = (
        newdim.join(F.broadcast(seed_dims), ["cid", "i"])
        .groupBy("cid")
        .agg(
            F.sum((F.col("c_old") - F.col("c_new")) * (F.col("c_old") - F.col("c_new")))
            .cast("bigint")
            .alias("shift_sq")
        )
    )
    return (
        members.join(shift, "cid")
        .select(
            F.col("cid").alias("cluster_id"), "n_members", "inertia", "shift_sq"
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random-projection distortion audit (round 10)
# ---------------------------------------------------------------------------

_JL_DIMS = 64
_JL_PROJ = 16


def _jl_signs() -> list[list[int]]:
    """The +-1 projection matrix (16 rows x 64 input dims), derived once
    from salted md5 so both engines share it as embedded LITERALS — no
    in-engine hashing, no float randomness. Achlioptas (2003): +-1
    entries satisfy the JL lemma like Gaussians do."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[:15], 16) % 2
            == 0
            else -1
            for i in range(_JL_DIMS)
        ]
        for j in range(_JL_PROJ)
    ]


def _jl_proj_sql(col: str, j: int, signs: list[list[int]]) -> str:
    arr = ", ".join(str(s) for s in signs[j])
    return (
        f"list_reduce(list_transform(list_zip({col}, [{arr}]),"
        " x -> x[1] * CAST(x[2] AS BIGINT)), (a, v) -> a + v)"
    )


def _jl_oracle() -> str:
    signs = _jl_signs()
    projs = ",\n         ".join(
        f"{_jl_proj_sql('qv', j, signs)} AS p{j}" for j in range(_JL_PROJ)
    )
    dsum = " + ".join(
        f"(a.p{j} - b.p{j}) * (a.p{j} - b.p{j})" for j in range(_JL_PROJ)
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
proj AS (
  SELECT vec_id, qv,
         {projs}
  FROM q
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_reduce(list_transform(list_zip(a.qv, b.qv),
                     x -> (x[1] - x[2]) * (x[1] - x[2])),
                     (acc, v) -> acc + v) AS orig_sq,
         CAST(({dsum}) // {_JL_PROJ} AS BIGINT) AS est_sq
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 2 = 0
)
SELECT vec_a, vec_b, CAST(orig_sq AS BIGINT) AS orig_sq, est_sq,
       CAST(est_sq * 1000000 // orig_sq AS BIGINT) AS distortion_ppm
FROM pairs
WHERE orig_sq > 0
ORDER BY vec_a
"""


@register(
    "random_projection_jl_audit",
    ops="EXT-embedding-jl,P6,J1 (random-projection distortion audit)",
    doc="Johnson-Lindenstrauss sketch audit: project the milli-quantized "
    f"embeddings from {_JL_DIMS} to {_JL_PROJ} dims with a +-1 "
    "Achlioptas matrix (derived from salted md5 ONCE at query-build "
    "time and embedded as integer literals in both engines — no "
    "in-engine randomness), then compare each consecutive-id pair's "
    "exact squared L2 distance with its sketch estimate "
    "sum(dp_j^2)/16. distortion_ppm ~ 1e6 means the sketch preserved "
    "the distance; the spread around it is the JL epsilon the 16-dim "
    "sketch actually buys. All-integer folds over the embedding arrays "
    "— map-only per vector, one equi-join on adjacent ids for pairing "
    "(no quadratic pair enumeration), no shuffle wider than the pair "
    "relation.",
    oracle=_jl_oracle(),
)
def random_projection_jl_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    signs = _jl_signs()
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
        ).alias("qv"),
    )
    proj_cols = [
        F.expr(
            "aggregate(zip_with(qv, array({arr}), (x, s) -> x * CAST(s AS BIGINT)),"
            " 0L, (a, v) -> a + v)".format(
                arr=", ".join(str(s) for s in signs[j])
            )
        ).alias(f"p{j}")
        for j in range(_JL_PROJ)
    ]
    proj = emb.select("vec_id", "qv", *proj_cols)
    a = proj.select(
        F.col("vec_id").alias("vec_a"),
        F.col("qv").alias("qa"),
        *[F.col(f"p{j}").alias(f"pa{j}") for j in range(_JL_PROJ)],
    ).filter(F.col("vec_a") % 2 == 0)
    b = proj.select(
        F.col("vec_id").alias("vec_b"),
        F.col("qv").alias("qb"),
        *[F.col(f"p{j}").alias(f"pb{j}") for j in range(_JL_PROJ)],
    )
    dsum_sql = " + ".join(
        f"(pa{j} - pb{j}) * (pa{j} - pb{j})" for j in range(_JL_PROJ)
    )
    pairs = a.join(b, F.col("vec_b") == F.col("vec_a") + 1).select(
        "vec_a",
        "vec_b",
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("orig_sq"),
        F.expr(f"CAST(({dsum_sql}) div {_JL_PROJ} AS BIGINT)").alias(
            "est_sq_raw"
        ),
    )
    return (
        pairs.filter(F.col("orig_sq") > 0)
        .select(
            "vec_a",
            "vec_b",
            "orig_sq",
            F.col("est_sq_raw").alias("est_sq"),
            F.expr("CAST(est_sq_raw * 1000000 div orig_sq AS BIGINT)").alias(
                "distortion_ppm"
            ),
        )
        .orderBy("vec_a")
    )
