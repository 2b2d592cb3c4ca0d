"""Deduplication operators (training-data-pipeline extensions,
SURVEY.md §7.1(7)): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:

* **No all-pairs work.** Every near-dup variant generates candidates via
  an inverted index (rare shingles / LSH band buckets / SimHash chunks) —
  the only shuffles are on those candidate keys, and the quadratic blowup
  is bounded per bucket (document-frequency caps, band width).
* **Signatures are computed inside whole-stage codegen** — MinHash /
  SimHash are pure ``transform``/``aggregate`` Column expressions over the
  token arrays, no Python UDF, no explode of k hash functions.
* **Shared deterministic hash.** ``h_i(s) = int(md5(i || ':' || s)[:15])``
  is computable identically in ANSI SQL (DuckDB oracle) and Spark, so even
  the probabilistic variants are exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from formula_1_spark.functions.text import (
    fingerprint,
    tokens,
    word_ngrams_from_tokens,
)
from formula_1_spark.sources.tables import fan_out

LONG_MAX = 9223372036854775807


def md5_long(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT (15 hex chars —
    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_int32(c: Column) -> Column:
    """First 32 bits of md5 as BIGINT (8 hex chars). Shingles are hashed
    to this domain once, and ALL downstream dedup work (posting lists,
    Jaccard intersections, MinHash permutations) runs on ints — 4-10x
    lighter shuffles and intersections than string shingles. Collision
    rate at 300 shingles/doc is ~1e-5 per pair and the oracle replicates
    the identical hashing, so parity is exact."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup on the normalized fingerprint: one row per
    distinct content, keeping the smallest id as canonical. Single shuffle
    on the 128-bit fingerprint — the exact-dedup cost floor."""
    return (
        docs.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted-index candidates + exact verify)
# ---------------------------------------------------------------------------


def tokenized(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, toks) — the whitespace-token relation every doc-dedup
    variant starts from. ``fan_out`` first: tokenization is the
    CPU-heaviest per-row stage and must not run on a one-partition scan.
    Callers persist (the relation feeds several downstream pipelines)."""
    return fan_out(docs).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
    )


def shingles_from_tokens(tok: DataFrame, n: int) -> DataFrame:
    """(doc_id, sh: array<bigint>) — distinct word n-grams hashed to the
    32-bit md5 domain (see :func:`md5_int32`), built from an
    already-materialized token relation. Building n-grams from a CACHED
    token relation matters: tokenization inlined into the n-gram lambda
    re-runs the regex split once per n-gram per row (measured ~2x)."""
    return tok.select(
        "doc_id",
        F.array_distinct(
            F.transform(word_ngrams_from_tokens(F.col("toks"), n), md5_int32)
        ).alias("sh"),
    ).filter(F.size("sh") > 0)


def _shingled(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Tokenize + shingle in one call (standalone entry point)."""
    return shingles_from_tokens(tokenized(docs, id_col, text_col).persist(), n)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 50,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs over word ``n``-gram shingle sets.

    Candidate generation: inverted index over shingles with document
    frequency <= ``max_df`` (ubiquitous shingles generate quadratic
    candidate noise and no precision — dropping them is the standard
    scale-out move; a true near-dup pair above any real threshold shares
    at least one non-ubiquitous shingle at corpus scale). Verification
    computes exact Jaccard on the FULL shingle sets via array
    intersection, so candidate pruning never changes a reported score.

    ``sh`` short-circuits shingling with a pre-built (persisted) shingle
    relation — the dedup query family shares one.
    """
    # The shingled relation feeds candidate generation AND verification —
    # persist it so tokenize/shingle runs once, not once per branch.
    if sh is None:
        sh = _shingled(docs, id_col, text_col, n).persist()
    return jaccard_pairs_from_shingles(sh, threshold=threshold, max_df=max_df)


def rare_shingle_candidates(sh: DataFrame, max_df: int = 50) -> DataFrame:
    """(a, b) candidate id pairs sharing at least one rare shingle
    (document frequency <= ``max_df``) — the inverted-index stage every
    exact near-dup verify (Jaccard, containment) starts from. Callers
    that run several verifies persist this once."""
    posting = sh.select("doc_id", F.explode("sh").alias("shingle"))
    # df via a partition-only window, filter, THEN collect: collecting
    # before the df filter would materialize a stopword shingle's entire
    # posting list in one non-spillable aggregation buffer (OOM at
    # corpus scale); the window buffers rows in a spillable sorter, and
    # the groupBy below reuses the window's hash partitioning on
    # `shingle` — one shuffle total, collect_set bounded by max_df.
    w = Window.partitionBy("shingle")
    rare = (
        posting.withColumn("df", F.count(F.lit(1)).over(w))
        .filter(F.col("df") <= max_df)
        .groupBy("shingle")
        .agg(F.collect_set("doc_id").alias("docs"))
    )
    return (
        rare.select(F.explode("docs").alias("a"), F.col("docs"))
        .select("a", F.explode("docs").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )


def jaccard_pairs_from_shingles(
    sh: DataFrame,
    threshold: float = 0.5,
    max_df: int = 50,
    cand: DataFrame | None = None,
) -> DataFrame:
    """Inverted-index candidates + exact-Jaccard verify over a persisted
    (doc_id, sh) relation. ``cand`` short-circuits candidate generation
    with a pre-built (persisted) pair relation."""
    if cand is None:
        cand = rare_shingle_candidates(sh, max_df)
    return _verify_jaccard(cand, sh, threshold)


def _verify_jaccard(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate id pairs against full
    shingle sets. The per-doc array relation is orders of magnitude
    smaller than the candidate pair set, so it is broadcast — the pair
    stream never shuffles. (At corpus scales where the array relation
    outgrows broadcast, swap to the posting-list count formulation:
    self-join postings semi-joined to candidate docs, groupBy pair.)"""
    sized = sh.select("doc_id", "sh", F.size("sh").alias("n_sh"))
    a = sized.select(
        F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("na")
    )
    b = sized.select(
        F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("nb")
    )
    return (
        cand.join(F.broadcast(a), "a")
        .join(F.broadcast(b), "b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("a").alias("doc_id_1"), F.col("b").alias("doc_id_2"), "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# MinHash hash family: ONE md5 base hash per shingle, then k linear
# permutations h_i(x) = (a_i * x + b_i) mod P over the 31-bit field.
# 32x cheaper than per-i md5 and still exactly reproducible in ANSI SQL.
# a_i/b_i are fixed constants derived from i (odd multipliers, a_i != 0).
MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    return [(2 * i + 1, 12345 + 7 * i) for i in range(k)]


def minhash_signatures(
    sh: DataFrame, k: int = 32, id_col: str = "doc_id", sh_col: str = "sh"
) -> DataFrame:
    """(doc_id, sigs array<bigint>) via explode → one md5 per shingle →
    k grouped mins of linear permutations. The explode keeps the md5 cost
    at exactly one hash per (doc, shingle) row — an expression-tree
    formulation gets re-inlined by CollapseProject into every aggregate
    and goes k-times slower."""
    base = sh.select(F.col(id_col), F.explode(F.col(sh_col)).alias("shingle")).select(
        F.col(id_col), (F.col("shingle") % MINHASH_P).alias("x")
    )
    mins = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % MINHASH_P).alias(f"s{i}")
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    grouped = base.groupBy(id_col).agg(*mins)
    return grouped.select(
        id_col, F.array(*[F.col(f"s{i}") for i in range(k)]).alias("sigs")
    )


def lsh_band_rows(sigs: DataFrame, bands: int, r: int) -> DataFrame:
    """Explode (doc_id, sigs) into (doc_id, band_id, band_key) rows —
    band_key is the comma-joined slice of ``r`` signature values."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_id"),
                F.concat_ws(",", F.slice("sigs", j * r + 1, r)).alias("band_key"),
            )
            for j in range(bands)
        ]
    )
    return sigs.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id", "band.band_id", "band.band_key"
    )


def minhash_lsh_cross_pairs(
    sh: DataFrame,
    base_pred,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric (base-corpus vs incoming) MinHash-LSH near-dup: pair a
    base doc with an incoming doc sharing any band bucket, then verify
    exact Jaccard on the full shingle sets.

    ``base_pred`` is a Column predicate over ``doc_id`` deciding the base
    side; the complement is the incoming side. This is the incremental
    flavor of ``minhash_lsh_pairs``: at scale the base side's band rows
    are a precomputed index (append-only, partitioned by band), and each
    new batch joins its bands against that index instead of re-pairing
    the whole corpus — candidate work is O(batch x bucket), independent
    of corpus size."""
    sigs = minhash_signatures(sh, k)
    rows = lsh_band_rows(sigs, bands, k // bands)
    base = rows.filter(base_pred).select(
        F.col("doc_id").alias("a"), "band_id", "band_key"
    )
    incoming = rows.filter(~base_pred).select(
        F.col("doc_id").alias("b"), "band_id", "band_key"
    )
    cand = base.join(incoming, ["band_id", "band_key"]).select("a", "b").distinct()
    return _verify_jaccard(cand, sh, threshold)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    sh: DataFrame | None = None,
) -> DataFrame:
    """MinHash(k) signatures → LSH banding (``bands`` × ``k/bands`` rows)
    → candidate pairs sharing any band bucket → exact-Jaccard verification
    on full shingle sets.

    With k=32, b=8, r=4 the candidate-recall S-curve crosses ~50% at
    Jaccard ≈ (1/8)^(1/4) ≈ 0.6 — tuned for the 0.5-0.9 near-dup range.
    The only shuffle keys are (band_id, band_key): at 100 TB the bucket
    join replaces an impossible all-pairs comparison, and skewed buckets
    (natural near-dup clusters) are handled by AQE skew-join splitting.
    """
    r = k // bands
    if sh is None:
        sh = _shingled(docs, id_col, text_col, n).persist()
    sigs = minhash_signatures(sh, k)
    bands_df = lsh_band_rows(sigs, bands, r)

    # Bucket pattern instead of a bands⋈bands self-join: ONE shuffle
    # groups each (band_id, band_key) bucket, pairs explode in-bucket.
    # The signature aggregation upstream runs once (the self-join form
    # computed it for both sides), and bucket size bounds the quadratic
    # work exactly as the LSH analysis promises.
    buckets = (
        bands_df.groupBy("band_id", "band_key")
        .agg(F.collect_set("doc_id").alias("docs"))
        .filter(F.size("docs") > 1)
    )
    cand = (
        buckets.select(F.explode("docs").alias("a"), F.col("docs"))
        .select("a", F.explode("docs").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    return _verify_jaccard(cand, sh, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4  # 4 x 15-bit chunks: hamming <= 3 ⇒ >= 1 chunk equal


def simhash_signatures(
    docs_tokens: DataFrame | None = None,
    bits: int = SIMHASH_BITS,
    id_col: str = "doc_id",
    exploded: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig) — 60-bit SimHash over the token multiset.

    Explode → ONE md5 per (doc, token) row → 60 grouped ±1 sums → pack
    the sign bits. (An expression-tree formulation hashes every token 60
    times after CollapseProject re-inlines it into each per-bit aggregate
    — measured 60x slower.) Shift amounts are Python-int literals, so the
    per-bit expressions come from a Python loop; execution is all
    JVM-side hash aggregation with map-side partial sums.

    ``exploded`` short-circuits the explode with a caller-built
    ``(id_col, t)`` token relation. Use it when the token expression is
    expensive to re-evaluate per array element: a ``transform`` lambda
    re-evaluates every outer expression it references (e.g. a payload
    decode) once PER ELEMENT after CollapseProject inlines it, turning an
    O(len) gram pass into O(len²) per document — a caller-side Generate
    barrier (explode the index, slice above the Generate) evaluates the
    decode once per row instead (measured 12x on the media gram path)."""
    if exploded is None:
        exploded = docs_tokens.select(F.col(id_col), F.explode("toks").alias("t"))
    base = exploded.select(F.col(id_col), md5_long(F.col("t")).alias("h"))
    sums = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    grouped = base.groupBy(id_col).agg(*sums)
    sig = F.lit(0).cast("bigint")
    for j in range(bits):
        sig = sig + F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return grouped.select(id_col, sig.alias("sig"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    tok: DataFrame | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: 60-bit signatures, candidates via the
    4-chunk pigeonhole (hamming <= 3 guarantees an equal 15-bit chunk),
    verified by exact ``bit_count(xor)``. ``tok`` short-circuits
    tokenization with the family-shared token relation; ``sigs`` a
    pre-built ``(doc_id, sig)`` signature relation (the family memo —
    the per-token md5 + 60-bit aggregate is the dominant cost and is
    shared verbatim by the ROC tuning query)."""
    if sigs is None:
        if tok is None:
            tok = tokenized(docs, id_col, text_col)
        sigs = simhash_signatures(tok)
    chunk_w = SIMHASH_BITS // SIMHASH_CHUNKS
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.shiftright(F.col("sig"), c * chunk_w)
                        .bitwiseAND(F.lit((1 << chunk_w) - 1))
                        .alias("chunk_val"),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("ch"),
    ).select("doc_id", "sig", "ch.chunk_id", "ch.chunk_val")

    # Bucket pattern (see minhash_lsh_pairs): one shuffle on the chunk
    # key, signatures computed once, in-bucket pair explosion.
    buckets = (
        chunks.groupBy("chunk_id", "chunk_val")
        .agg(F.collect_set(F.struct("doc_id", "sig")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    return (
        buckets.select(F.explode("ds").alias("x"), "ds")
        .select("x", F.explode("ds").alias("y"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_id_1"),
            F.col("y.doc_id").alias("doc_id_2"),
            F.bit_count(F.col("x.sig").bitwiseXOR(F.col("y.sig"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Shingle-set containment (asymmetric near-dup: quotes / partial copies)
# ---------------------------------------------------------------------------


def containment_pairs_from_shingles(
    sh: DataFrame,
    threshold: float = 0.8,
    max_df: int = 50,
    cand: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric containment pairs: ``C = |A∩B| / min(|A|, |B|)``.

    Jaccard under-scores a short document embedded verbatim inside a long
    one (the union is dominated by the long side); containment of the
    smaller set is the standard detector for quotes and partial copies.

    Candidates come from the same rare-shingle inverted index as the
    Jaccard path; verification uses the POSTING-LIST COUNT formulation
    rather than broadcast array intersection: postings semi-joined to
    candidate docs, self-joined on shingle, grouped per pair. That is the
    scale path named in :func:`_verify_jaccard`'s docstring — no per-doc
    array ever broadcasts, every shuffle carries only (id, shingle) ints,
    so it survives corpora whose shingle relation outgrows broadcast.
    """
    sized = sh.select("doc_id", F.size("sh").alias("n_sh"))
    posting = sh.select("doc_id", F.explode("sh").alias("shingle"))
    if cand is None:
        cand = rare_shingle_candidates(sh, max_df)
    cand_ids = (
        cand.select(F.col("a").alias("doc_id"))
        .union(cand.select("b"))
        .distinct()
    )
    # Postings pruned to candidate docs before the shingle self-join: the
    # pair explosion is bounded by candidate-set df, not corpus df.
    p = posting.join(cand_ids, "doc_id")
    pa = p.select(F.col("doc_id").alias("a"), "shingle")
    pb = p.select(F.col("doc_id").alias("b"), "shingle")
    common = (
        pa.join(pb, "shingle")
        .filter(F.col("a") < F.col("b"))
        .join(cand, ["a", "b"], "left_semi")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sized.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    nb = sized.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    return (
        common.join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .withColumn("containment", F.col("common") / F.least("na", "nb"))
        .filter(F.col("containment") >= threshold)
        .withColumn(
            "jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
        )
        .select(
            F.col("a").alias("doc_id_1"),
            F.col("b").alias("doc_id_2"),
            "common",
            "na",
            "nb",
            "containment",
            "jaccard",
        )
    )


# ---------------------------------------------------------------------------
# Exact duplicated-span extents (substring-level dedup, Lee et al. 2022)
# ---------------------------------------------------------------------------


def positional_gram_postings(
    docs: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, g): one row per token ``k``-gram, ``pos`` 0-based,
    ``g`` the 60-bit md5 prefix of the space-joined gram (see
    :func:`md5_long` for the DuckDB-identical hash). The positional
    postings relation behind exact substring-level dedup: unlike the
    DISTINCT shingle sets the Jaccard family uses, positions are kept so
    consecutive matches can be stitched back into maximal spans.
    Expression-only gram construction (``transform(sequence)``), one
    ``posexplode`` — postings volume is exactly the token count."""
    tok = fan_out(docs).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("t")
    )
    grams = F.when(
        F.size("t") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - k),
            lambda i: md5_long(F.concat_ws(" ", F.slice("t", i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return tok.select(
        "doc_id", F.posexplode(grams).alias("pos", "g")
    ).withColumn("pos", F.col("pos").cast("bigint"))


def df_capped_postings(
    pos: DataFrame, max_df: int, min_df: int = 1
) -> DataFrame:
    """Drop grams held by more than ``max_df`` (or fewer than ``min_df``)
    distinct docs BEFORE any pair generation. This is the knob that
    bounds the per-gram join fan-out: a boilerplate gram shared by a
    million docs would otherwise explode into 10^12 pairs. Hot grams are
    boilerplate by definition and have their own detector
    (``boilerplate_phrase_filter``); dropping them is the Lee et al.
    suffix-array df-threshold re-expressed as an inverted-index cap."""
    keep = (
        pos.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("d"))
        .filter((F.col("d") >= min_df) & (F.col("d") <= max_df))
        .select("g")
    )
    return pos.join(keep, "g", "leftsemi")


def duplicated_span_extents(
    pos_a: DataFrame,
    pos_b: DataFrame,
    k: int,
    min_span_tokens: int,
    anti_reflexive: bool = True,
) -> DataFrame:
    """Maximal duplicated-span extents between two positional-posting
    relations: (doc_a, doc_b, a_start, b_start, span_tokens), one row per
    maximal run of >= ``min_span_tokens - k + 1`` consecutive matching
    k-grams (a shared substring of ``L`` tokens is exactly a run of
    ``L - k + 1`` consecutive gram matches).

    Matching gram occurrences (pa, pb) lying on one diagonal
    ``pa - pb`` with consecutive pa form a run; runs are found with the
    classic gaps-and-islands trick ``pa - row_number()`` — the window is
    partitioned by (pair, diagonal), so its size is bounded by the
    shorter doc's length, never by corpus size. The only corpus-scale
    shuffles are the gram-keyed join (fan-out bounded by
    :func:`df_capped_postings`) and the pair-keyed island aggregate.

    Spark-native stand-in for the suffix-array pass of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"):
    recall-exact for spans >= min_span_tokens on df-surviving grams.
    """
    a = pos_a.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g"
    )
    b = pos_b.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g"
    )
    pairs = a.join(b, "g")
    if anti_reflexive:
        pairs = pairs.filter(F.col("doc_a") < F.col("doc_b"))
    pairs = pairs.withColumn("diag", F.col("pa") - F.col("pb"))
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    isl = pairs.withColumn("grp", F.col("pa") - F.row_number().over(w))
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
            (F.count(F.lit(1)) + (k - 1)).cast("bigint").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span_tokens)
        .drop("diag", "grp")
    )
