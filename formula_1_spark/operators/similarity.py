"""Similarity search over embedding columns (SURVEY.md §7.1(7)).

Two paths:

* :func:`brute_force_topk` — exact cosine top-k: broadcast the query set
  against the corpus (BroadcastNestedLoopJoin — the corpus side never
  shuffles), per-query window rank. The baseline and the verifier.
* :func:`lsh_topk` — the scale path: 16-bit random-hyperplane signatures
  (signs derived from md5, so fully deterministic and oracle-computable),
  banded 4x4 for multi-probe candidate generation, exact cosine re-rank
  among candidates. At 100 TB the only shuffle is on (band_id, band_key)
  buckets; the quadratic cross join disappears.

Recall tuning: 4-bit bands → P(band match) = (1 - θ/π)^4 per band for
angle θ; with 4 bands, high-similarity neighbors are recovered with high
probability while random pairs (cos≈0) match with p ≈ 4·(1/2)^4 = 25%
per band set — candidates stay ~4x under the corpus, and the exact
re-rank keeps precision at 1.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from formula_1_spark.functions.vectors import cosine, flat_dot, flatten_vec, norm
from formula_1_spark.sources.tables import fan_out

N_PLANES = 16
N_BANDS = 4
BAND_BITS = N_PLANES // N_BANDS


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector. ``fan_out``
    keeps the scoring loop parallel when the corpus scan is one split."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def plane_sign(p: int, d: int) -> float:
    """Deterministic ±1 hyperplane component: parity of the first md5 hex
    digit of 'p,d'. Computed in PYTHON at plan-build time — the value is
    row-independent, so baking it in as a literal removes ~dims*planes
    runtime hashes per row (measured 5x on the ANN query). The DuckDB
    oracle embeds the identical literals."""
    import hashlib

    return 1.0 if int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[0], 16) & 1 else -1.0


@lru_cache(maxsize=None)
def _sign_array(p: int, dims: int) -> Column:
    """The ±1 sign vector for hyperplane p as ONE parsed SQL expression.
    Building it as ``F.array(*[F.lit(...)] * 64)`` costs 64 driver→JVM
    round trips per plane per side (~2s of plan-build time across 16
    planes x 2 sides); a single ``F.expr`` string parses JVM-side in one
    call, and the cache reuses the Column across planes/sides/queries.
    (A fully-flattened 64-term multiply-add chain per plane was tried and
    is SLOWER — 16 planes x 64 subscripts explodes the expression tree
    past codegen's sweet spot; the HOF fold wins here.)"""
    vals = ", ".join(f"{plane_sign(p, d)}D" for d in range(dims))
    return F.expr(f"array({vals})")


def _projection(vec_col: Column, p: int, dims: int) -> Column:
    """Signed projection onto pseudo-random hyperplane p: a zip_with
    against the literal sign vector + left-fold sum (same order as the
    oracle's list_reduce)."""
    return F.aggregate(
        F.zip_with(vec_col, _sign_array(p, dims), lambda x, s: x.cast("double") * s),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def band_keys(
    vec_col: Column,
    dims: int = 64,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
) -> list[Column]:
    """``n_bands`` band keys, each packing ``n_planes/n_bands`` sign bits
    into an int. Bits per band is the bucket-granularity knob: buckets
    per band = 2^(bits), so EXPECTED BUCKET SIZE = corpus / 2^bits. Fixed
    bits means bucket size grows linearly with the corpus and in-bucket
    pair work quadratically — size bits to the corpus (see
    ``scaled_banding``)."""
    bits = [_projection(vec_col, p, dims) > 0 for p in range(n_planes)]
    band_bits = n_planes // n_bands
    keys = []
    for b in range(n_bands):
        key = F.lit(0)
        for i in range(band_bits):
            key = key + F.when(bits[b * band_bits + i], F.lit(1 << i)).otherwise(F.lit(0))
        keys.append(key.alias(f"band_{b}"))
    return keys


MAX_BAND_BITS = 16  # plane-index stride per band in the scaled layout
SCALED_BANDS = 8


def scaled_bits(n_vectors: int, target_bucket: int = 32) -> int:
    """Bits per band sized so expected bucket occupancy stays near
    ``target_bucket`` regardless of corpus size: bits ~= log2(n/target),
    clamped to [4, 16]."""
    import math

    return max(4, min(16, int(math.log2(max(n_vectors, 1) / target_bucket + 1)) + 1))


def scaled_banding(n_vectors: int, target_bucket: int = 32) -> tuple[int, int]:
    """(n_planes, n_bands) sized so expected bucket occupancy stays near
    ``target_bucket`` regardless of corpus size: bits = log2(n / target),
    8 bands for recall. In-bucket pair work per band is then
    O(n * target_bucket) — linear in the corpus, the LSH contract that a
    FIXED banding silently breaks at scale."""
    bits = scaled_bits(n_vectors, target_bucket)
    return bits * SCALED_BANDS, SCALED_BANDS


def strided_band_keys(
    vec_col: Column,
    dims: int,
    bits: int,
    n_bands: int = SCALED_BANDS,
    stride: int = MAX_BAND_BITS,
) -> list[Column]:
    """Band keys for the CORPUS-SCALED layout: band ``b`` owns the fixed
    plane range [b*stride, b*stride + stride) and uses its first ``bits``
    planes. Striding by the max bits (instead of packing planes
    contiguously as ``band_keys`` does) makes plane ownership independent
    of the corpus-derived ``bits``, so a STATIC oracle can precompute
    every possible projection and gate each bit slot on the same
    count-derived ``bits`` scalar — and a re-run at a different corpus
    size only widens each band's keyspace, never reshuffles which planes
    feed which band."""
    keys = []
    for b in range(n_bands):
        key = F.lit(0)
        for i in range(bits):
            bit = _projection(vec_col, b * stride + i, dims) > 0
            key = key + F.when(bit, F.lit(1 << i)).otherwise(F.lit(0))
        keys.append(key.alias(f"band_{b}"))
    return keys


def _vec_base(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
    """(id, vec) relation shared by candidate generation and the exact
    re-rank. Deliberately NOT persisted: the re-scan is column-pruned and
    every added cache-materialization stage costs more than the rescan at
    any scale (at 100 TB you never cache the corpus anyway)."""
    return fan_out(df).select(
        F.col("vec_id").alias(id_alias), F.col("embedding").alias(vec_alias)
    )


def _with_bands(
    base: DataFrame,
    id_alias: str,
    vec_alias: str,
    dims: int,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(id, band_id, band_key) long form — IDS ONLY. Vectors are not
    carried through the bucket join/distinct (they'd bloat every shuffle
    row by dims floats); the re-rank joins them back from ``base``."""
    withb = base.select(
        id_alias, *band_keys(F.col(vec_alias), dims, n_planes, n_bands)
    )
    structs = F.array(
        *[
            F.struct(F.lit(b).alias("band_id"), F.col(f"band_{b}").alias("band_key"))
            for b in range(n_bands)
        ]
    )
    return withb.select(id_alias, F.explode(structs).alias("bk")).select(
        id_alias, "bk.band_id", "bk.band_key"
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    dims: int = 64,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
    flat: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, the scale path: candidates = pairs
    sharing >= 1 hyperplane-LSH band, exact cosine re-verify >= threshold.

    Recall profile (pair survives with prob 1-(1-p^r)^b, p = 1 - θ/π,
    r bits per band, b bands): ~1.0 at true near-dup similarity
    (cos >= 0.9 → 98%+ at the 4x4 default), degrading as the threshold
    approaches random (cos 0.45 → ~50%) — LSH cannot cheaply separate 63°
    from 90°; no banding can. The candidate bucket join shuffles
    (id, band) rows only; the verify joins unit vectors back by id. Never
    an all-pairs join.

    The 16-plane default is a TEST-SCALE setting. Bucket occupancy is
    corpus/2^(bits per band), so at a growing corpus pass
    ``scaled_banding(n)`` here — e.g. 64 planes / 8 bands at 50 k vectors
    — or in-bucket pair explosion reintroduces the quadratic work the
    banding exists to avoid (measured: 10x vectors at the fixed default
    -> 10x+ wall; with scaled banding -> ~2x).
    """
    # localCheckpoint, not persist — GC-freed, no CacheManager pin.
    base = emb.select(
        F.col("vec_id"), F.col("embedding"), norm(F.col("embedding")).alias("na")
    ).localCheckpoint(eager=False)
    bands = _with_bands(base, "vec_id", "embedding", dims, n_planes, n_bands)
    return _verify_band_candidates(base, bands, threshold, dims, flat=flat)


def _verify_band_candidates(
    base: DataFrame,
    bands: DataFrame,
    threshold: float,
    dims: int,
    broadcast_vectors: bool = True,
    flat: DataFrame | None = None,
) -> DataFrame:
    """Bucket the (id, band) long form, explode in-bucket pairs, exact
    cosine re-verify. Bucket pattern rather than a bands⋈bands self-join:
    ONE shuffle groups each (band_id, band_key) bucket, pairs explode
    in-bucket, and bucket size bounds the quadratic work (the LSH
    contract).

    ``broadcast_vectors`` hints the two unit-vector projections as the
    broadcast/build sides. Without the hint both join inputs are
    stat-less checkpoint scans and the planner has been observed to
    broadcast the CANDIDATE side instead, streaming the corpus through
    it and materializing a candidates x (2 x dims) wide intermediate —
    measured 9.4 s vs 1.3 s at sf0.1 for the identical result. The pair
    relation is larger than the vector relation by the bucket-occupancy
    factor, so building on the vector side is also the right choice at
    scale; pass False only when the vector projection itself exceeds
    broadcast capacity (the planner then falls back to a shuffled join
    keyed on vec_id).

    ``flat`` short-circuits the per-call unit-vector flattening with a
    pre-flattened ``(vec_id, u0..u{dims-1})`` relation (the session memo
    in queries/dedup.py): analyzing the 2 x dims division expressions
    costs ~seconds of driver time per call, while renaming attribute
    refs off a checkpoint leaf is free. Values identical — u_d is the
    same ``embedding[d]/na`` expression, evaluated at checkpoint time."""
    buckets = (
        bands.groupBy("band_id", "band_key")
        .agg(F.collect_set("vec_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        buckets.select(F.explode("ids").alias("vec_id_1"), F.col("ids"))
        .select("vec_id_1", F.explode("ids").alias("vec_id_2"))
        .filter(F.col("vec_id_1") < F.col("vec_id_2"))
        .distinct()
    )
    a, b = _flat_pair_sides(base, flat, dims)
    if broadcast_vectors:
        a, b = F.broadcast(a), F.broadcast(b)
    return (
        cand.join(a, "vec_id_1")
        .join(b, "vec_id_2")
        .withColumn("cos", flat_dot("x", "y", dims))
        .filter(F.col("cos") >= threshold)
        .select("vec_id_1", "vec_id_2", "cos")
    )


def _flat_pair_sides(
    base: DataFrame, flat: DataFrame | None, dims: int
) -> tuple[DataFrame, DataFrame]:
    """The two unit-vector join sides of a pair-verify tail: either
    flattened per call from ``base`` (2 x dims division expressions to
    analyze) or renamed off a pre-flattened ``(vec_id, u0..)`` memo."""
    if flat is not None:
        # Guard the memo contract (r11 ADVICE): a memo built at a
        # different dims would silently produce wrong candidates.
        assert f"u{dims - 1}" in flat.columns and f"u{dims}" not in flat.columns, (
            f"flat memo layout mismatch: expected u0..u{dims - 1}, got "
            f"{[c for c in flat.columns if c.startswith('u')][:3]}..."
        )
        a = flat.selectExpr(
            "vec_id AS vec_id_1", *[f"u{d} AS x{d}" for d in range(dims)]
        )
        b = flat.selectExpr(
            "vec_id AS vec_id_2", *[f"u{d} AS y{d}" for d in range(dims)]
        )
        return a, b
    a = base.selectExpr(
        "vec_id AS vec_id_1", *flatten_vec("x", "embedding", dims, denom="na")
    )
    b = base.selectExpr(
        "vec_id AS vec_id_2", *flatten_vec("y", "embedding", dims, denom="na")
    )
    return a, b


def cosine_near_dup_pairs_scaled(
    emb: DataFrame,
    threshold: float = 0.45,
    dims: int = 64,
    target_bucket: int = 32,
    n_vectors: int | None = None,
    flat: DataFrame | None = None,
) -> DataFrame:
    """:func:`cosine_near_dup_pairs` with CORPUS-SCALED banding — the
    production default. Bits per band = ``scaled_bits(n)`` so expected
    bucket occupancy stays ~``target_bucket`` at any corpus size, keeping
    in-bucket pair work linear in the corpus (measured: 10x vectors at
    the fixed 16-plane banding -> 10x+ wall; scaled -> ~2x). Plane
    indices are strided (:func:`strided_band_keys`) so the layout is
    reproducible by a static oracle at any corpus size.

    ``n_vectors`` defaults to a count of ``emb`` — one column-pruned
    metadata-only scan at plan-build time (parquet row counts come from
    footers; at 100 TB this is a driver round-trip, not a data read).
    """
    n = emb.count() if n_vectors is None else n_vectors
    bits = scaled_bits(n, target_bucket)
    # localCheckpoint, not persist — GC-freed, no CacheManager pin.
    base = emb.select(
        F.col("vec_id"), F.col("embedding"), norm(F.col("embedding")).alias("na")
    ).localCheckpoint(eager=False)
    withb = base.select(
        "vec_id", *strided_band_keys(F.col("embedding"), dims, bits)
    )
    structs = F.array(
        *[
            F.struct(F.lit(b).alias("band_id"), F.col(f"band_{b}").alias("band_key"))
            for b in range(SCALED_BANDS)
        ]
    )
    bands = withb.select("vec_id", F.explode(structs).alias("bk")).select(
        "vec_id", "bk.band_id", "bk.band_key"
    )
    return _verify_band_candidates(base, bands, threshold, dims, flat=flat)


def semantic_dedup_pairs(
    emb: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    threshold: float = 0.45,
    dims: int = 64,
    flat: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster the embedding space with
    deterministic k-means, then compare pairs ONLY within a cluster
    (exact cosine >= ``threshold``). The clustering bounds the quadratic
    verify the way the paper's k-means sharding does — per-cell pair
    count is (n/n_cells)^2-ish, and ``n_cells`` grows with the corpus so
    per-cell work stays constant at scale. Complements the hyperplane-LSH
    candidate path (:func:`cosine_near_dup_pairs`): k-means cells adapt
    to the data distribution where LSH bands are data-oblivious.

    Deterministic end-to-end (seeded k-means, argmax-with-tie-break
    assignment, left-fold cosine), hence exactly oracle-checkable.
    """
    # localCheckpoint, not persist — see semantic_dedup_pairs_scaled.
    cents = kmeans_centroids(emb, n_cells=n_cells, iters=iters).localCheckpoint(
        eager=False
    )
    base = emb.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("na")
    ).localCheckpoint(eager=False)
    scored = fan_out(base).join(F.broadcast(cents), F.lit(True)).withColumn(
        "cell_cos", cosine(F.col("embedding"), F.col("cent"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cell_cos"), F.asc("cell_id"))
    assign = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "cell_id")
    )
    return _pairs_within_cells(base, assign, threshold, dims, flat=flat)


def _pairs_within_cells(
    base: DataFrame,
    assign: DataFrame,
    threshold: float,
    dims: int,
    flat: DataFrame | None = None,
) -> DataFrame:
    """Shared verify tail: bucket the (vec_id, cell_id) assignment, explode
    in-cell pairs, exact prenormalized flat-dot cosine >= threshold.

    The unit-vector projections are hinted as the broadcast/build sides
    for the same reason as :func:`_verify_band_candidates`: the pair
    relation outweighs the vector relation by the cell-occupancy factor,
    and without the hint the planner has been observed to broadcast the
    PAIR side and materialize a pairs x (2 x dims) wide intermediate."""
    # Bucket pattern: one shuffle on cell_id, pairs explode in-cell.
    buckets = (
        assign.groupBy("cell_id")
        .agg(F.collect_set("vec_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        buckets.select("cell_id", F.explode("ids").alias("vec_id_1"), F.col("ids"))
        .select("cell_id", "vec_id_1", F.explode("ids").alias("vec_id_2"))
        .filter(F.col("vec_id_1") < F.col("vec_id_2"))
    )
    a, b = _flat_pair_sides(base, flat, dims)
    return (
        cand.join(F.broadcast(a), "vec_id_1")
        .join(F.broadcast(b), "vec_id_2")
        .withColumn("cos", flat_dot("x", "y", dims))
        .filter(F.col("cos") >= threshold)
        .select("cell_id", "vec_id_1", "vec_id_2", "cos")
    )


def _flat_cell_cos(cents: DataFrame, source: DataFrame, dims: int):
    """(source x broadcast cents) scored by the codegen flat-dot cosine
    dot(raw, raw) / (na * nc) — bit-identical to the interpreted
    ``cosine()`` fold (same left-fold order, same norm formula), ~10-100x
    cheaper per pair, which matters once n_cells scales with the corpus.
    ``source`` must carry (vec_id, embedding, na)."""
    # k rows. The plan barrier stops CollapseProject re-inlining the norm
    # fold. localCheckpoint (not persist): called once per k-means
    # iteration, a persist would pin one relation per call in the
    # CacheManager for the session's lifetime; checkpoint blocks are
    # freed by the ContextCleaner once the iteration's DataFrame is
    # dropped, and the LogicalRDD leaf also stops the unrolled-iteration
    # plan from deepening.
    cents_flat = (
        cents.select("cell_id", norm(F.col("cent")).alias("nc"), "cent")
        .selectExpr("cell_id", "nc", *flatten_vec("y", "cent", dims))
        .localCheckpoint(eager=False)
    )
    flat_src = source.selectExpr(
        "vec_id", "embedding", "na", *flatten_vec("x", "embedding", dims)
    )
    return flat_src.join(F.broadcast(cents_flat), F.lit(True)).withColumn(
        "cell_cos", flat_dot("x", "y", dims) / (F.col("na") * F.col("nc"))
    )


def kmeans_centroids_flat(
    corpus: DataFrame, n_cells: int, iters: int = 2, dims: int = 64
) -> DataFrame:
    """:func:`kmeans_centroids` with the assignment cosine on the flat
    codegen kernel instead of the interpreted HOF fold — required once
    ``n_cells`` scales with the corpus (n x k assignment cosines per
    iteration). Bit-identical iterations: dot(raw)/(|a||b|) in the same
    fold order, identical floor-quantized exact means, same tie-breaks."""
    # localCheckpoint, not persist: reused every iteration, but a persist
    # is never released in a long-lived session — checkpoint blocks are
    # GC-freed when the loop's references drop (see _flat_cell_cos).
    cv = corpus.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("na")
    ).localCheckpoint(eager=False)
    cents = corpus.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cent"),
    )
    for _ in range(iters):
        scored = _flat_cell_cos(cents, fan_out(cv), dims)
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("cell_cos"), F.asc("cell_id")
        )
        assign = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("cell_id", "embedding")
        )
        long = assign.select(
            "cell_id", F.posexplode("embedding").alias("dim", "val")
        )
        comp = (
            long.select(
                "cell_id",
                "dim",
                F.floor(F.col("val").cast("double") * F.lit(KMEANS_SCALE)).alias("q"),
            )
            .groupBy("cell_id", "dim")
            .agg(
                (
                    F.sum("q").cast("double")
                    / (F.lit(KMEANS_SCALE) * F.count(F.lit(1)))
                ).alias("comp")
            )
        )
        cents = comp.groupBy("cell_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "comp"))),
                lambda s: s["comp"],
            ).alias("cent")
        )
        # EAGER inter-iteration checkpoint (the NN-descent round-barrier
        # lesson): a LAZY checkpoint still pays analysis of its full
        # embedded subtree at call time, so iteration t+1's k x dims flat
        # expressions re-analyze iteration t's on the driver (measured
        # ~3-7 s of the _SEM_SHARED build at k=45, sf0.1). Materializing
        # the k-row centroid relation per round keeps analysis linear in
        # iters; values unchanged (checkpoint = materialization boundary).
        cents = cents.localCheckpoint(eager=True)
    return cents


def semantic_dedup_pairs_scaled(
    emb: DataFrame,
    n_cells: int,
    iters: int = 2,
    threshold: float = 0.45,
    dims: int = 64,
    base: DataFrame | None = None,
    assign: DataFrame | None = None,
    flat: DataFrame | None = None,
) -> DataFrame:
    """:func:`semantic_dedup_pairs` with corpus-scaled cells and the flat
    assignment kernel — the production path. With ``n_cells ~ sqrt(n)``
    both cost terms balance at O(n^1.5): assignment does n x k flat dots
    and per-cell verify does k x (n/k)^2 pair dots; the fixed-cell
    variant's verify is O(n^2 / k) and measured 10x data -> ~30x wall at
    the probe, vs ~3x here. Bit-identical cosine semantics throughout."""
    # localCheckpoint, not persist: base feeds both the assignment scan
    # and the per-cell verify joins; checkpoint blocks are GC-freed after
    # the query result materializes, where a persist would pin the corpus
    # in the CacheManager for the session's lifetime. cents is already a
    # barriered k-row relation inside _flat_cell_cos; no extra pin needed.
    if base is None or assign is None:
        cents = kmeans_centroids_flat(
            emb, n_cells=n_cells, iters=iters, dims=dims
        )
        base = emb.select(
            "vec_id", "embedding", norm(F.col("embedding")).alias("na")
        ).localCheckpoint(eager=False)
        scored = _flat_cell_cos(cents, fan_out(base), dims)
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("cell_cos"), F.asc("cell_id")
        )
        assign = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("vec_id", "cell_id")
        )
    # else: caller passes the already-barriered shared base/assignment
    # (e.g. queries.dedup._shared_semantic_relations) — identical values
    # (training is bit-deterministic), planned once per session.
    return _pairs_within_cells(
        base, assign.select("vec_id", "cell_id"), threshold, dims, flat=flat
    )


KMEANS_SCALE = 1000000.0  # component quantization grid for exact means


def kmeans_centroids(
    corpus: DataFrame, n_cells: int = 8, iters: int = 2, dims: int = 64
) -> DataFrame:
    """Deterministic distributed k-means (spherical — cosine assignment),
    a fixed ``iters`` unrolled iterations, fully inside the DataFrame
    plan (no driver collect; the per-iteration join is a broadcast of
    n_cells centroids — exactly how trained centroids ship at 100 TB).

    Exact cross-engine reproducibility: a double-precision MEAN is
    accumulation-order-dependent, so each component is floor-quantized to
    a 1e-6 grid FIRST (``floor(x * 1e6)`` — identical in IEEE on both
    engines) and the mean is computed over exact integer sums:
    ``cast(sum(q) as double) / (1e6 * count)``. The SQL oracle replicates
    every iteration bit-for-bit (tie-breaks on cell_id).

    Init: cells seeded from the first ``n_cells`` vectors (deterministic).
    Empty cells simply drop out (both engines agree).
    """
    cv = corpus.select("vec_id", "embedding")
    cents = corpus.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cent"),
    )
    for _ in range(iters):
        scored = cv.join(F.broadcast(cents), F.lit(True)).withColumn(
            "cell_cos", cosine(F.col("embedding"), F.col("cent"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("cell_cos"), F.asc("cell_id"))
        assign = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("cell_id", "embedding")
        )
        long = assign.select(
            "cell_id", F.posexplode("embedding").alias("dim", "val")
        )
        comp = (
            long.select(
                "cell_id",
                "dim",
                F.floor(F.col("val").cast("double") * F.lit(KMEANS_SCALE)).alias("q"),
            )
            .groupBy("cell_id", "dim")
            .agg(
                (
                    F.sum("q").cast("double")
                    / (F.lit(KMEANS_SCALE) * F.count(F.lit(1)))
                ).alias("comp")
            )
        )
        cents = comp.groupBy("cell_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "comp"))),
                lambda s: s["comp"],
            ).alias("cent")
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    learn_iters: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer assigns every corpus
    vector to its nearest centroid cell; queries probe only the
    ``n_probe`` nearest cells and re-rank exactly within them.

    Centroids are LEARNED by :func:`kmeans_centroids` (``learn_iters``
    deterministic spherical k-means iterations; ``learn_iters=0`` falls
    back to the static first-``n_cells`` quantizer). Cell assignment =
    argmax cosine with (cell id) tie-break. The shuffle key is the cell
    id; per-cell skew is bounded by the quantizer balance, the classic
    IVF tradeoff.
    """
    if centroids is None:
        centroids = kmeans_centroids(
            corpus, n_cells=n_cells, iters=learn_iters
        ).localCheckpoint(eager=False)  # GC-freed, no CacheManager pin
    # else: caller passes an already-barriered trained quantizer (e.g. the
    # session-memoized shared_centroids) — identical values, planned once.
    qv = _vec_base(queries, "query_id", "q_vec")
    cv = _vec_base(corpus, "neighbor_id", "c_vec")

    def assign(base: DataFrame, id_alias: str, vec_alias: str, top: int) -> DataFrame:
        # (id, cell_id) only — vectors rejoin from the persisted base at
        # re-rank time instead of riding through the cell join/distinct.
        scored = base.join(F.broadcast(centroids), F.lit(True)).withColumn(
            "cell_cos", cosine(F.col(vec_alias), F.col("cent"))
        )
        w = Window.partitionBy(id_alias).orderBy(F.desc("cell_cos"), F.asc("cell_id"))
        return (
            scored.withColumn("cell_rank", F.row_number().over(w))
            .filter(F.col("cell_rank") <= top)
            .select(id_alias, "cell_id")
        )

    cand = (
        assign(qv, "query_id", "q_vec", n_probe)
        .join(assign(cv, "neighbor_id", "c_vec", 1), "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return rerank_exact_topk(cand, qv, cv, k)


def hamming1_probe_keys() -> Column:
    """Multi-probe key array for one band: the exact ``band_key`` plus
    every Hamming-1 perturbation (flip one of the band's hyperplane
    bits) — (1 + BAND_BITS) keys total. The single shared definition of
    the probe fan-out; drift here would silently desynchronize
    :func:`multiprobe_lsh_topk` from the recall audit if the banding
    layout ever changes."""
    return F.array(
        F.col("band_key"),
        *[F.col("band_key").bitwiseXOR(F.lit(1 << i)) for i in range(BAND_BITS)],
    )


def expand_multiprobe(qb: DataFrame, id_col: str) -> DataFrame:
    """Explode a query-side band relation into its multi-probe keys:
    one (id, band_id, band_key) row per probe bucket."""
    return qb.select(id_col, "band_id", F.explode(hamming1_probe_keys()).alias("band_key"))


def rerank_exact_topk(
    cand: DataFrame, qv: DataFrame, cv: DataFrame, k: int
) -> DataFrame:
    """Shared exact-cosine re-rank tail over an id-pair candidate set:
    rejoin vectors from the (small, broadcast) query base and the corpus
    base, score, keep the per-query top-``k`` (ties to min neighbor id).
    Used by every bucketed ANN variant (LSH single/multi-probe, IVF) —
    the candidate GENERATION differs per index; the re-rank never does."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dims: int = 64,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k: candidates share >= 1 LSH band with the
    query; exact cosine re-rank among candidates. Deterministic (md5-based
    hyperplanes), hence exactly oracle-checkable despite being 'approx'.

    ``corpus_bands`` short-circuits the corpus-side banding with the
    session-memoized (neighbor_id, band_id, band_key) relation — the 16
    per-vector hyperplane projections are the corpus-proportional cost of
    this index, identical across the four LSH consumers (and exactly
    what a persisted LSH index stores at production scale)."""
    qv = _vec_base(queries, "query_id", "q_vec")
    cv = _vec_base(corpus, "neighbor_id", "c_vec")
    if corpus_bands is None:
        corpus_bands = _with_bands(cv, "neighbor_id", "c_vec", dims)
    else:
        # Guard the memo contract (r11 ADVICE): a band relation built at a
        # different (dims, plane) layout would silently change candidates.
        # The memo key carries dims (queries.similarity.shared_corpus_bands);
        # here assert the schema at least matches the band shape.
        assert {"neighbor_id", "band_id", "band_key"} <= set(
            corpus_bands.columns
        ), f"corpus_bands layout mismatch: {corpus_bands.columns}"
    # Broadcast the query-side bands: the corpus band stream joins
    # map-side and only (query_id, neighbor_id) id pairs reach the
    # distinct — 2 shuffles end-to-end (distinct + final window).
    cand = (
        F.broadcast(_with_bands(qv, "query_id", "q_vec", dims))
        .join(corpus_bands, ["band_id", "band_key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return rerank_exact_topk(cand, qv, cv, k)


def multiprobe_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dims: int = 64,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al. 2007, VLDB): each query probes
    its exact band bucket PLUS every Hamming-1 perturbation of the band
    key (:func:`hamming1_probe_keys`) — the perturbed buckets are where
    near neighbors that landed just across a hyperplane live. Recall
    rises toward brute force without adding hash tables; the probe
    fan-out is (1 + BAND_BITS) keys per (query, band), query-side only,
    so the corpus-side index cost is IDENTICAL to single-probe
    :func:`lsh_topk` — the right trade at 100 TB, where corpus band rows
    dominate storage and the query side is the small relation. Same
    deterministic md5 hyperplanes -> exactly oracle-checkable."""
    qv = _vec_base(queries, "query_id", "q_vec")
    cv = _vec_base(corpus, "neighbor_id", "c_vec")
    if corpus_bands is None:
        corpus_bands = _with_bands(cv, "neighbor_id", "c_vec", dims)
    else:
        assert {"neighbor_id", "band_id", "band_key"} <= set(
            corpus_bands.columns
        ), f"corpus_bands layout mismatch: {corpus_bands.columns}"
    probes = expand_multiprobe(
        _with_bands(qv, "query_id", "q_vec", dims), "query_id"
    )
    cand = (
        F.broadcast(probes)
        .join(corpus_bands, ["band_id", "band_key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return rerank_exact_topk(cand, qv, cv, k)


def pq_subspace_model(
    corpus: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    learn_iters: int = 2,
    dims: int = 64,
    cents: DataFrame | None = None,
):
    """Shared PQ training front end: split every vector into ``m``
    subspaces and learn one deterministic spherical-k-means codebook per
    subspace. Returns ``(corpus_long, cents, sub_structs, w_assign)`` —
    the long (vec_id, s, sub-vector) relation, the trained (s, cell_id,
    cent) codebooks (localCheckpointed), the subspace-split Column for
    re-use on a query relation, and the per-(s, vec_id) assignment
    window. Used by :func:`pq_topk` (ADC search) and the PQ distortion
    audit.

    All m subspaces ride ONE long relation off a single scan, so
    codebook training / encoding are each ONE subspace-keyed DAG instead
    of m sequential chains (measured 4.8x on the registered query at
    sf0.1). Values are identical to per-subspace runs — every
    aggregation below is keyed by s.
    """
    sub = dims // m
    pre_trained = cents
    sub_structs = F.array(
        *[
            F.struct(
                F.lit(s).alias("s"),
                F.slice("embedding", s * sub + 1, sub).alias("sub_emb"),
            )
            for s in range(m)
        ]
    )
    corpus_long = (
        fan_out(corpus)
        .select("vec_id", F.explode(sub_structs).alias("x"))
        .select("vec_id", "x.s", F.col("x.sub_emb").alias("embedding"))
    )

    w_assign = Window.partitionBy("s", "vec_id").orderBy(
        F.desc("cell_cos"), F.asc("cell_id")
    )
    if pre_trained is not None:
        # Caller passes an already-barriered trained codebook relation
        # (e.g. the session-memoized shared_pq_cents) — identical values
        # to inline training (bit-deterministic), planned once.
        return corpus_long, pre_trained, sub_structs, w_assign

    # Batched deterministic spherical k-means (mirrors kmeans_centroids
    # per subspace — floor-quantized exact means, cell_id tie-break).
    cents = corpus_long.filter(F.col("vec_id") < n_codes).select(
        "s",
        F.col("vec_id").alias("cell_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("cent"),
    )
    for _ in range(learn_iters):
        scored = corpus_long.join(F.broadcast(cents), "s").withColumn(
            "cell_cos", cosine(F.col("embedding"), F.col("cent"))
        )
        assign = (
            scored.withColumn("r", F.row_number().over(w_assign))
            .filter(F.col("r") == 1)
            .select("s", "cell_id", "embedding")
        )
        long = assign.select(
            "s", "cell_id", F.posexplode("embedding").alias("dim", "val")
        )
        comp = (
            long.select(
                "s",
                "cell_id",
                "dim",
                F.floor(F.col("val").cast("double") * F.lit(KMEANS_SCALE)).alias("q"),
            )
            .groupBy("s", "cell_id", "dim")
            .agg(
                (
                    F.sum("q").cast("double")
                    / (F.lit(KMEANS_SCALE) * F.count(F.lit(1)))
                ).alias("comp")
            )
        )
        cents = comp.groupBy("s", "cell_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "comp"))),
                lambda st: st["comp"],
            ).alias("cent")
        )
    cents = cents.localCheckpoint(eager=False)  # GC-freed, no CacheManager pin
    return corpus_long, cents, sub_structs, w_assign


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 4,
    n_codes: int = 8,
    learn_iters: int = 2,
    dims: int = 64,
    n_candidates: int = 20,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC), the memory-bound scale path (Jégou et al. 2011): the vector
    space splits into ``m`` subspaces, each with its own ``n_codes``-cell
    deterministic k-means codebook (:func:`kmeans_centroids` on the
    slice); every corpus vector compresses to ``m`` small codes
    (log2(n_codes) bits each — a 64-float vector becomes m bytes at
    rest). A query never touches corpus vectors during candidate
    generation: it precomputes ``m x n_codes`` subspace dot products
    (the ADC lookup table, broadcast — tiny), and a candidate's
    approximate score is the FIXED-ORDER sum of m table lookups, so the
    approximation is bit-exact cross-engine. Top-``n_candidates`` per
    query by ADC score then re-rank by exact cosine.

    Scale design: corpus-side work per subspace is one broadcast-
    centroid assignment (argmax over n_codes, no shuffle beyond the
    window by vec_id) and the candidate scoring joins the CODES relation
    (m ints per vector) against broadcast ADC tables — the full-width
    embedding column is only read again for the final candidate re-rank.
    """
    from formula_1_spark.functions.vectors import dot

    qv = _vec_base(queries, "query_id", "q_vec")
    cv = _vec_base(corpus, "neighbor_id", "c_vec")
    corpus_long, cents, sub_structs, w_assign = pq_subspace_model(
        corpus, m=m, n_codes=n_codes, learn_iters=learn_iters, dims=dims,
        cents=cents,
    )

    codes_long = (
        corpus_long.join(F.broadcast(cents), "s")
        .withColumn("cell_cos", cosine(F.col("embedding"), F.col("cent")))
        .withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select("vec_id", "s", F.col("cell_id").alias("code"))
    )
    q_long = (
        queries.select(F.col("vec_id").alias("query_id"), F.explode(sub_structs).alias("x"))
        .select("query_id", "x.s", F.col("x.sub_emb").alias("q_sub"))
    )
    adc = q_long.join(F.broadcast(cents), "s").select(
        "query_id",
        "s",
        F.col("cell_id").alias("code"),
        dot(F.col("q_sub"), F.col("cent")).alias("d"),
    )

    # One (s, code)-keyed join + a pivot to m columns summed in FIXED
    # subspace order — never an accumulation-order-dependent float SUM.
    pair_terms = codes_long.join(F.broadcast(adc), ["s", "code"])
    piv = pair_terms.groupBy("query_id", "vec_id").agg(
        *[
            F.max(F.when(F.col("s") == s, F.col("d"))).alias(f"d_{s}")
            for s in range(m)
        ]
    )
    approx_col = F.col("d_0")
    for s in range(1, m):
        approx_col = approx_col + F.col(f"d_{s}")
    scored = (
        piv.filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            approx_col.alias("approx"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = (
        scored.withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", cosine(F.col("q_vec"), F.col("c_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    n_codes: int = 8,
    learn_iters: int = 2,
    dims: int = 64,
    n_candidates: int = 20,
    coarse: DataFrame | None = None,
    pq_cents: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ ANN (the FAISS IVFADC layout, ``by_residual=False``
    variant): an IVF coarse quantizer prunes the candidate space to the
    query's ``n_probe`` nearest cells, then PQ-ADC scores ONLY the
    cell-pruned pairs — combining IVF's candidate pruning with PQ's
    memory compression, the standard billion-scale serving layout
    (Jégou et al. 2011 §IV). Differences from the components:
    :func:`ivf_topk` re-ranks every cell member exactly (full-width
    vector reads per candidate); :func:`pq_topk` ADC-scores the WHOLE
    corpus (no pruning). Here the full-width embedding column is read
    only for the final top-``n_candidates`` exact re-rank.

    Scale: corpus-side state is m codes + 1 cell id per vector; the ADC
    tables and centroids broadcast; the only corpus-scale shuffles are
    the cell-candidate join (bounded by cell balance — audited by
    ivf_cell_balance) and the pair-grain pivot. Deterministic k-means +
    fixed-order ADC sums -> exactly oracle-checkable."""
    from formula_1_spark.functions.vectors import dot

    qv = _vec_base(queries, "query_id", "q_vec")
    cv = _vec_base(corpus, "neighbor_id", "c_vec")
    if coarse is None:
        coarse = kmeans_centroids(
            corpus, n_cells=n_cells, iters=learn_iters, dims=dims
        ).localCheckpoint(eager=False)

    def assign(base: DataFrame, id_alias: str, vec_alias: str, top: int) -> DataFrame:
        scored = base.join(F.broadcast(coarse), F.lit(True)).withColumn(
            "cell_cos", cosine(F.col(vec_alias), F.col("cent"))
        )
        w = Window.partitionBy(id_alias).orderBy(F.desc("cell_cos"), F.asc("cell_id"))
        return (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= top)
            .select(id_alias, "cell_id")
        )

    cell_cand = (
        assign(qv, "query_id", "q_vec", n_probe)
        .join(assign(cv, "neighbor_id", "c_vec", 1), "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )

    corpus_long, cents, sub_structs, w_assign = pq_subspace_model(
        corpus, m=m, n_codes=n_codes, learn_iters=learn_iters, dims=dims,
        cents=pq_cents,
    )
    codes_long = (
        corpus_long.join(F.broadcast(cents), "s")
        .withColumn("cell_cos", cosine(F.col("embedding"), F.col("cent")))
        .withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select(F.col("vec_id").alias("neighbor_id"), "s", F.col("cell_id").alias("code"))
    )
    q_long = queries.select(
        F.col("vec_id").alias("query_id"), F.explode(sub_structs).alias("x")
    ).select("query_id", "x.s", F.col("x.sub_emb").alias("q_sub"))
    adc = q_long.join(F.broadcast(cents), "s").select(
        "query_id",
        "s",
        F.col("cell_id").alias("code"),
        dot(F.col("q_sub"), F.col("cent")).alias("d"),
    )

    pair_terms = cell_cand.join(codes_long, "neighbor_id").join(
        F.broadcast(adc), ["query_id", "s", "code"]
    )
    piv = pair_terms.groupBy("query_id", "neighbor_id").agg(
        *[
            F.max(F.when(F.col("s") == s, F.col("d"))).alias(f"d_{s}")
            for s in range(m)
        ]
    )
    approx_col = F.col("d_0")
    for s in range(1, m):
        approx_col = approx_col + F.col(f"d_{s}")
    wc = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = (
        piv.select("query_id", "neighbor_id", approx_col.alias("approx"))
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    return rerank_exact_topk(cand, qv, cv, k)


def nndescent_graph(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_a: int = 2654435761,
    init_b: int = 40503,
    dims: int = 64,
    broadcast_vectors: bool = True,
) -> DataFrame:
    """NN-descent k-NN GRAPH construction (Dong, Moses & Li, WWW'11) —
    the graph-based ANN family (HNSW/NSG ancestors), complementing the
    bucketed families (LSH bands, IVF cells, PQ codes): every corpus
    vector keeps its current best-``k`` neighbor list, and each round
    improves it by scoring only *neighbors of neighbors* — "a neighbor
    of a neighbor is likely a neighbor".

    Determinism (oracle contract): the init graph is arithmetic, not
    random — neighbor ``j`` of vector ``v`` is
    ``(v + 1 + ((v*init_a + j*init_b) % (N-1))) % N`` (exact int64, no
    self-loops by construction), and every round scores candidates with
    the same left-fold double cosine as the DuckDB oracle, ties broken
    by ascending neighbor id. The whole construction replays bit-exactly
    in SQL.

    Scale shape: per round the candidate set is current ∪ reversed ∪
    through-one-hop edges — ≤ N·(2k + k²) id pairs, every join keyed by
    a vector id (shuffle-partitioned, degree-bounded); nothing is ever
    all-pairs and no relation is collected. The per-round graph is
    lazily localCheckpoint-ed so the unrolled lineage stays linear in
    ``iters`` instead of 3^iters. At 100 TB this is the standard
    distributed NN-descent layout: the graph relation (N·k rows) is the
    only growing state, and each refinement round is two hash joins plus
    one windowed top-k.
    """
    ids = corpus.select(F.col(id_col).alias("v"))
    ncnt = corpus.agg(F.count(F.lit(1)).alias("n"))
    off = (F.col("v") * F.lit(init_a) + F.col("j").cast("bigint") * F.lit(init_b)) % (
        F.col("n") - 1
    )
    g = (
        ids.join(F.broadcast(ncnt), F.lit(True))  # 1-row scalar fan-in
        .select("v", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"), "n")
        .withColumn("nb", (F.col("v") + 1 + off) % F.col("n"))
        .select("v", "nb")
        .distinct()
    )
    # Pair scoring via the flat multiply-add kernel (codegen), not the
    # interpreted per-pair HOF cosine — ≤ N·(2k+k²) candidate pairs per
    # round made this the whole cost of the build (measured ~9.5 s of
    # ~10 s at sf0.1; 10x with the HOF per pair, per the module doc).
    # cos = flat_dot/(na·nb) reproduces cosine()'s dot/(norm·norm)
    # bit-for-bit (left-to-right adds, product-then-divide). The norm is
    # materialized under a checkpoint so CollapseProject cannot inline
    # the HOF fold into all `dims` flattened columns.
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
    ).localCheckpoint(eager=False)
    qe = base.selectExpr(
        "id AS v", "nrm AS na", *flatten_vec("x", "vec", dims)
    )
    ce = base.selectExpr(
        "id AS nb", "nrm AS nbn", *flatten_vec("y", "vec", dims)
    )
    # Join-strategy contract (guide §3.1, the _verify_band_candidates
    # precedent): the candidate-pair side outweighs the vector side by
    # the candidate-degree factor (≤ 2k + k² pairs per vector vs 1 row),
    # so the vector projections are the build/broadcast sides. Both
    # inputs are stat-less checkpoint scans — without the hint the
    # planner guesses. Past broadcast capacity pass
    # ``broadcast_vectors=False``: the joins fall back to shuffles keyed
    # on the vector id, the standard distributed NN-descent layout.
    qe_j = F.broadcast(qe) if broadcast_vectors else qe
    ce_j = F.broadcast(ce) if broadcast_vectors else ce
    w = Window.partitionBy("v").orderBy(F.desc("cos"), F.asc("nb"))
    ranked = None
    for t in range(iters):
        rev = g.select(F.col("nb").alias("v"), F.col("v").alias("nb"))
        # shuffle_hash: both sides are the degree-bounded N·k graph —
        # per-partition hash build is safe at any scale and skips the
        # sort-merge join's two full sorts (guide §3.1).
        thru = (
            g.alias("a")
            .join(g.alias("b").hint("shuffle_hash"), F.col("a.nb") == F.col("b.v"))
            .filter(F.col("b.nb") != F.col("a.v"))
            .select(F.col("a.v").alias("v"), F.col("b.nb").alias("nb"))
        )
        # ONE exchange per round (guide §2.4): hash-repartition by v, then
        # dedup on (v, nb) — HashPartitioning(v) satisfies the dedup
        # aggregate's (v, nb) clustering — and the broadcast scoring joins
        # preserve it, so the top-k window re-uses the same exchange
        # instead of adding its own (2 exchanges -> 1 per round).
        cand = (
            g.unionByName(rev)
            .unionByName(thru)
            .repartition("v")
            .dropDuplicates(["v", "nb"])
        )
        ranked = (
            cand.join(qe_j, "v")
            .join(ce_j, "nb")
            .withColumn(
                "cos", flat_dot("x", "y", dims) / (F.col("na") * F.col("nbn"))
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        g = ranked.select("v", "nb")
        if t < iters - 1:
            # EAGER: a lazy checkpoint only truncates lineage after first
            # execution, so every DataFrame built during the next round is
            # ANALYZED against the full unrolled tree (g appears 4x per
            # round -> plan size grows ~4^iters; measured ~10 s of pure
            # driver-side analysis for iters=2 at sf0.1). Materializing the
            # N*k-row graph per round keeps analysis linear in iters.
            g = g.localCheckpoint(eager=True)
    return ranked.select(
        F.col("v").alias("vec_id"),
        F.col("nb").alias("neighbor_id"),
        "cos",
        F.col("rank").cast("int").alias("rank"),
    )
