"""Multimodal queries over documents-as-media with DuckDB oracles.

``media_feature_extract`` runs the REAL mapInPandas Arrow path (Python
md5 kernel); its oracle recomputes the same features in SQL — proving the
Python batch kernel, not just the plan around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from formula_1_spark.operators.multimodal import (
    FEATURE_DIM,
    documents_as_media,
    extract_features,
    frame_sample_plan,
)
from formula_1_spark.queries.registry import register
from formula_1_spark.sources.tables import fan_out, load_table

_MEDIA_CTE = """
media AS (
  SELECT doc_id AS media_id,
         (['image', 'audio', 'video'])[(doc_id % 3)::INT + 1] AS media_type,
         text AS payload_text,
         (n_chars % 1920)::INT AS meta_width,
         (n_chars % 1080)::INT AS meta_height,
         (n_chars * 40)::INT AS meta_duration_ms
  FROM documents
)
"""

# One scalar column per feature dim: the driver canonicalizer hashes by
# pandas factorize, which cannot hash list cells — so arrays stay OUT of
# driver-facing result schemas (flatten to f0..f{dim-1}).
_FEATURES = ", ".join(
    f"(('0x' || substr(md5(payload_text || ':' || {i}), 1, 15))::BIGINT"
    f" / CAST(1152921504606846976 AS DOUBLE)) AS f{i}"
    for i in range(FEATURE_DIM)
)


@register(
    "media_feature_extract",
    ops="EXT-multimodal-features,UDF-pandas",
    doc="Arrow-batched mapInPandas feature extraction over binary payloads "
    "(deterministic md5 kernel — the stubbed stand-in for a real encoder); "
    "oracle recomputes the Python kernel in SQL. Features emitted as "
    "scalar columns f0..f7 so the result is hashable row-wise.",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT media_id, media_type,
       CAST(strlen(payload_text) AS BIGINT) AS n_bytes,
       {_FEATURES}
FROM media
""",
)
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deliberately NOT fanned out: each partition spawns a Python worker,
    # and for this trivial md5 stand-in kernel 32 worker spawns cost more
    # than the compute. A real decode kernel (CPU-bound per row) WOULD
    # fan_out first — workers amortize, cores win.
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        *[F.col("features")[i].alias(f"f{i}") for i in range(FEATURE_DIM)],
    )


@register(
    "media_frame_sample_plan",
    ops="EXT-multimodal-frames,P3",
    doc="Catalyst-side frame-sampling plan: one row per 1s frame tick per "
    "video payload (sequence + explode — no Python).",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT media_id, unnest(range(0, greatest(meta_duration_ms - 1, 0) + 1, 1000)) AS frame_ts_ms
FROM media WHERE media_type = 'video'
""",
)
def media_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return frame_sample_plan(media).select(
        "media_id", F.col("frame_ts_ms").cast("bigint")
    )


@register(
    "media_resize_plan",
    ops="EXT-multimodal-resize,P6,P7",
    doc="Fit-within-224 resize planning over image/video rows: "
    "aspect-preserving integer output dims (BIGINT div on both engines), "
    "no upscaling. The multimodal counterpart of frame sampling — the "
    "plan is relational; only the pixel resample needs the Arrow kernel.",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT media_id, media_type,
       CAST(meta_width AS BIGINT) AS in_width,
       CAST(meta_height AS BIGINT) AS in_height,
       CASE WHEN greatest(meta_width, meta_height) > 224
            THEN (CAST(meta_width AS BIGINT) * 224)
                 // greatest(CAST(meta_width AS BIGINT), CAST(meta_height AS BIGINT))
            ELSE CAST(meta_width AS BIGINT) END AS out_width,
       CASE WHEN greatest(meta_width, meta_height) > 224
            THEN (CAST(meta_height AS BIGINT) * 224)
                 // greatest(CAST(meta_width AS BIGINT), CAST(meta_height AS BIGINT))
            ELSE CAST(meta_height AS BIGINT) END AS out_height
FROM media
WHERE media_type IN ('image', 'video') AND meta_width > 0 AND meta_height > 0
""",
)
def media_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.multimodal import resize_plan

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return resize_plan(media, target=224)


@register(
    "media_perceptual_buckets",
    ops="EXT-multimodal-dedup,UDF-pandas,A1 (perceptual-hash bucketing)",
    doc="Perceptual-bucket media dedup: the mapInPandas feature kernel "
    "(the stubbed stand-in for a real image/audio encoder) feeds a "
    "1-bit-per-dimension quantizer — concat of sign bits = an 8-bit "
    "perceptual hash — and items are grouped by (media_type, phash). "
    "Same-bucket items are near-dup CANDIDATES exactly as in SimHash "
    "chunk bucketing; with a real encoder the buckets would be "
    "perceptually similar frames/clips. One groupBy shuffle on the "
    "(type, hash) key; member lists emitted as sorted strings so the "
    "result stays scalar-typed for the driver hasher.",
    oracle=f"""
WITH {_MEDIA_CTE},
feat AS (
  SELECT media_id, media_type,
         array_to_string(list_transform(range(0, {FEATURE_DIM}), i ->
           CAST(FLOOR((('0x' || substr(md5(payload_text || ':' || i), 1, 15))::BIGINT
                / CAST(1152921504606846976 AS DOUBLE)) * 2) AS INT)), '') AS phash
  FROM media
)
SELECT media_type, phash,
       CAST(COUNT(1) AS BIGINT) AS n_items,
       MIN(media_id) AS canonical_id,
       array_to_string(list_sort(list(media_id)), ',') AS member_ids
FROM feat
GROUP BY media_type, phash
HAVING COUNT(1) > 1
""",
)
def media_perceptual_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media, fake=True)
    ph = feats.select(
        "media_id",
        "media_type",
        F.concat_ws(
            "",
            F.transform(
                "features", lambda x: F.floor(x * 2).cast("int").cast("string")
            ),
        ).alias("phash"),
    )
    return (
        ph.groupBy("media_type", "phash")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("media_id").alias("canonical_id"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("media_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("member_ids"),
        )
        .filter(F.col("n_items") > 1)
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup banding (round 6)
# ---------------------------------------------------------------------------

_HAM_MAX = 3  # 4-chunk pigeonhole: recall is EXACT for hamming <= 3


@register(
    "media_phash_near_dup",
    ops="EXT-multimodal-dedup,J4,A5 (pHash Hamming band join)",
    doc="Perceptual-hash near-dup detection for media payloads — the "
    "image-dedup shape every 100 TB multimodal corpus runs. Stand-in "
    "perceptual kernel (fake-codec caveat of the media family): 60-bit "
    "SimHash over the payload's byte 4-gram multiset — locality-"
    "sensitive, so near-identical payloads land at small Hamming "
    "distance; swap for a real DCT pHash when codecs exist. Candidates "
    "via the 4x15-bit chunk pigeonhole WITHIN a media_type (exact "
    "recall for hamming <= 3), verified by bit_count(xor). Only "
    "(type, chunk) buckets ever join — never all pairs.",
    oracle=f"""
WITH {_MEDIA_CTE},
grams AS (
  SELECT media_type, media_id,
         unnest(list_transform(
           range(0, greatest(len(payload_text) - 4, 0) + 1),
           i -> substr(payload_text, i + 1, 4))) AS t
  FROM media
),
th AS (
  SELECT media_type, media_id,
         ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
  FROM grams
),
bits AS (
  SELECT media_type, media_id, j.j AS j,
         SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, (SELECT unnest(range(0, 60)) AS j) j
  GROUP BY media_type, media_id, j.j
),
sig AS (
  SELECT media_type, media_id,
         CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)
              AS BIGINT) AS sig
  FROM bits GROUP BY media_type, media_id
),
chunks AS (
  SELECT media_type, media_id, sig, c.c AS chunk_id,
         (sig >> (c.c * 15)) & 32767 AS chunk_val
  FROM sig, (SELECT unnest(range(0, 4)) AS c) c
),
pairs AS (
  SELECT DISTINCT x.media_type, x.media_id AS media_id_1,
         y.media_id AS media_id_2,
         CAST(bit_count(xor(x.sig, y.sig)) AS INTEGER) AS hamming
  FROM chunks x
  JOIN chunks y ON x.media_type = y.media_type
               AND x.chunk_id = y.chunk_id AND x.chunk_val = y.chunk_val
  WHERE x.media_id < y.media_id
)
SELECT media_type, media_id_1, media_id_2, hamming
FROM pairs WHERE hamming <= {_HAM_MAX}
ORDER BY media_type, media_id_1, media_id_2
""",
)
def media_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.dedup import simhash_signatures
    from formula_1_spark.sources.tables import fan_out

    media = documents_as_media(
        fan_out(load_table(spark, sf_dir, "documents"))
    )
    # Generate barrier: decode the payload ONCE per row (projection under
    # the explode), slice grams ABOVE the Generate. The previous
    # array-of-grams form re-evaluated decode(payload) per element inside
    # the transform lambda — O(len²) per document, measured 6.5s -> 0.5s
    # for the gram+md5 stage at sf0.1 (guide §1.2 per-task work).
    withtxt = media.select(
        "media_id", F.decode(F.col("payload"), "UTF-8").alias("txt")
    )
    exploded = withtxt.select(
        "media_id",
        "txt",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.length("txt") - 4, F.lit(0)))
        ).alias("i"),
    ).select("media_id", F.expr("substring(txt, i + 1, 4)").alias("t"))
    sigs = simhash_signatures(exploded=exploded, id_col="media_id").join(
        media.select("media_id", "media_type"), "media_id"
    )
    chunk_w = 15
    chunks = sigs.select(
        "media_type",
        "media_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), c * chunk_w).bitwiseAND(
                        F.lit((1 << chunk_w) - 1)
                    )
                    for c in range(4)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    x = chunks.select(
        "media_type",
        "chunk_id",
        "chunk_val",
        F.col("media_id").alias("media_id_1"),
        F.col("sig").alias("sig1"),
    )
    y = chunks.select(
        "media_type",
        "chunk_id",
        "chunk_val",
        F.col("media_id").alias("media_id_2"),
        F.col("sig").alias("sig2"),
    )
    return (
        x.join(y, ["media_type", "chunk_id", "chunk_val"])
        .filter(F.col("media_id_1") < F.col("media_id_2"))
        .select(
            "media_type",
            "media_id_1",
            "media_id_2",
            F.bit_count(F.col("sig1").bitwiseXOR(F.col("sig2")))
            .cast("int")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= _HAM_MAX)
        .orderBy("media_type", "media_id_1", "media_id_2")
    )


# ---------------------------------------------------------------------------
# Audio frame-energy VAD profile (round 9)
# ---------------------------------------------------------------------------

_VAD_THRESHOLD = 1_200_000  # ~frame * mean(byte^2) for ASCII text payloads


@register(
    "media_audio_energy_vad",
    ops="EXT-multimodal-audio,P6,A1 (Arrow frame-energy kernel)",
    doc="Audio voice-activity profile over the synthetic media lake: the "
    "declared Arrow mapInPandas kernel treats each audio payload's bytes "
    "as 8-bit PCM, frames them at 128 samples (trailing partial frame "
    "kept), and emits exact integer frame energies (sum of squared "
    "samples); per media the query reports frames, active frames above "
    "the energy threshold, activity ppm, and the peak frame. Real codecs "
    "stay env-gated (operators/multimodal.decode_media contract); the "
    "oracle replays the byte math by exploding the hex-encoded UTF-8 "
    "blob (true BYTES, not code points — agrees with the kernel on "
    "non-ASCII payloads too), proving the Python kernel itself, not "
    "just the plan around it. Top 20 by "
    "(peak desc, media_id) via the two-phase global top-k.",
    oracle=f"""
WITH {{media_cte}},
audio AS (
  SELECT media_id, hex(encode(payload_text)) AS hx,
         octet_length(encode(payload_text)) AS n_bytes
  FROM media WHERE media_type = 'audio'
),
bytes AS (
  -- UTF-8 BYTES, not code points: the Python kernel frames
  -- encode(text).frombuffer(uint8), so the oracle must too (a non-ASCII
  -- payload has more bytes than chars and values never exceed 255).
  -- hex() the blob once, then read byte i as two hex nibbles.
  SELECT a.media_id, u.i AS i,
         16 * (strpos('0123456789ABCDEF', substr(a.hx, 2 * u.i + 1, 1)) - 1)
           + strpos('0123456789ABCDEF', substr(a.hx, 2 * u.i + 2, 1)) - 1 AS c
  FROM audio a, unnest(range(0, a.n_bytes)) AS u(i)
),
frames AS (
  SELECT media_id, CAST(i // 128 AS BIGINT) AS frame_id,
         CAST(SUM(c * c) AS BIGINT) AS energy
  FROM bytes GROUP BY 1, 2
),
per_media AS (
  SELECT media_id,
         CAST(COUNT(1) AS BIGINT) AS n_frames,
         CAST(SUM(CASE WHEN energy > {_VAD_THRESHOLD} THEN 1 ELSE 0 END)
              AS BIGINT) AS active_frames,
         CAST(SUM(CASE WHEN energy > {_VAD_THRESHOLD} THEN 1 ELSE 0 END)
              * 1000000 // COUNT(1) AS BIGINT) AS active_ppm,
         CAST(MAX(energy) AS BIGINT) AS peak_energy
  FROM frames GROUP BY media_id
)
SELECT media_id, n_frames, active_frames, active_ppm, peak_energy,
       CAST(RANK() OVER (ORDER BY peak_energy DESC, media_id ASC) AS BIGINT)
         AS rank
FROM per_media
ORDER BY peak_energy DESC, media_id ASC
LIMIT 20
""".format(media_cte=_MEDIA_CTE),
)
def media_audio_energy_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.multimodal import audio_frame_energy
    from formula_1_spark.operators.windows import two_phase_global_topk
    from formula_1_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = documents_as_media(docs).filter(F.col("media_type") == "audio")
    frames = audio_frame_energy(media, frame=128, fake=True)
    per_media = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(F.when(F.col("energy") > _VAD_THRESHOLD, 1).otherwise(0))
        .cast("bigint")
        .alias("active_frames"),
        F.expr(
            f"CAST(sum(CASE WHEN energy > {_VAD_THRESHOLD} THEN 1 ELSE 0 END)"
            " * 1000000 div count(1) AS BIGINT)"
        ).alias("active_ppm"),
        F.max("energy").cast("bigint").alias("peak_energy"),
    )
    return two_phase_global_topk(
        per_media,
        [F.desc("peak_energy"), F.asc("media_id")],
        k=20,
    ).select(
        "media_id", "n_frames", "active_frames", "active_ppm", "peak_energy",
        F.col("rank").cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Byte-nibble histogram via mapInArrow (round 10)
# ---------------------------------------------------------------------------

_HEX_CHARS = "0123456789ABCDEF"


@register(
    "media_byte_histogram",
    ops="EXT-multimodal-bytes,UDF-arrow (mapInArrow record-batch kernel)",
    doc="Per-media-type histogram of payload high nibbles (byte >> 4, 16 "
    "bins) through the mapInArrow record-batch kernel — the zero-copy "
    "Arrow surface (vs mapInPandas' pandas materialization), "
    "pre-aggregated inside the kernel so the post-kernel exchange moves "
    "O(batches x 48) rows however large the payloads. The oracle "
    "replays the byte math WITHOUT explosion: the high nibble of byte i "
    "is the hex digit at odd position of hex(payload), so "
    "regexp_replace('(.).' -> first-of-pair) keeps exactly the high "
    "nibbles and 16 length-difference counts finish the histogram. "
    "Shares in ppm of each type's byte volume.",
    oracle=f"""
WITH {{media_cte}},
hx AS (
  SELECT media_type,
         regexp_replace(hex(encode(payload_text)), '(.).', '\\1', 'g') AS h
  FROM media
),
counts AS (
  SELECT media_type, u.nib AS nibble,
         CAST(SUM(len(h) - len(replace(h, substr('{_HEX_CHARS}',
              u.nib::INT + 1, 1), ''))) AS BIGINT) AS n
  FROM hx, unnest(range(0, 16)) AS u(nib)
  GROUP BY 1, 2
)
SELECT media_type, CAST(nibble AS BIGINT) AS nibble, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY media_type) AS BIGINT)
         AS share_ppm
FROM counts
WHERE n > 0
ORDER BY media_type, nibble
""".format(media_cte=_MEDIA_CTE),
)
def media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from formula_1_spark.operators.multimodal import byte_nibble_histogram_arrow

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = documents_as_media(docs)
    hist = byte_nibble_histogram_arrow(media)
    return (
        hist.withColumn(
            "share_ppm",
            F.expr("CAST(n * 1000000 div SUM(n) OVER"
                   " (PARTITION BY media_type) AS BIGINT)"),
        )
        .select(
            "media_type", F.col("nibble").cast("bigint").alias("nibble"),
            "n", "share_ppm",
        )
        .orderBy("media_type", "nibble")
    )
