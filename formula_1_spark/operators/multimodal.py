"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7.1(7)).

Media lives in DataFrames as opaque ``binary`` payload columns plus typed
metadata — the lakehouse-native layout (payloads inline for small media,
or pointer + byte-range for large objects; either way the Spark plan shape
is identical). Decode / resize / frame-sample are Python-side work and
therefore run as Arrow-batched ``mapInPandas`` stages — the ONE place this
engine uses Python UDFs, because Spark has no builtin codecs.

The actual codecs (Pillow / ffmpeg / torchaudio) are NOT installed in this
environment, so the decode kernels are STUBBED: ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic md5-based stand-in produces the same schema/batch shapes the
real kernel would. Everything AROUND the kernel — schema contract, Arrow
batch iteration, partition sizing, metadata passthrough — is real and
tested.

Scale notes: mapInPandas streams Arrow batches (no full-partition
materialization); media work is embarrassingly parallel, so the only knob
that matters is input-split sizing (``spark.sql.files.maxPartitionBytes``
low enough that a partition of payloads fits executor memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def fake_feature_vector(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature extractor: feature i is the first 60
    bits of md5(payload || ':' || i) scaled to [0, 1). Reproducible in
    ANSI SQL, so the full mapInPandas path is oracle-checkable."""
    out = []
    for i in range(dim):
        h = hashlib.md5(payload + b":" + str(i).encode()).hexdigest()
        out.append(int(h[:15], 16) / float(1 << 60))
    return out


def extract_features(
    media: DataFrame, fake: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``fake=False`` is the real-codec path — STUB: raises
    NotImplementedError (no image/audio libraries in this environment).
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires Pillow/ffmpeg — not available; "
            "use fake=True for the deterministic stand-in kernel"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(fake_feature_vector),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payloads to pixel/sample arrays — STUB for the real codecs.
    The fake path emits deterministic 'decoded' dimensions derived from
    metadata so downstream plumbing (resize planning, frame sampling) can
    be exercised end-to-end."""
    if not fake:
        raise NotImplementedError("real decode requires media codecs — not installed")
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("decoded_width", T.IntegerType(), True),
            T.StructField("decoded_height", T.IntegerType(), True),
            T.StructField("n_frames", T.IntegerType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "decoded_width": pdf["meta_width"].fillna(0).astype("int32"),
                    "decoded_height": pdf["meta_height"].fillna(0).astype("int32"),
                    "n_frames": (
                        pdf["meta_duration_ms"].fillna(0).astype("int64") // 40
                    ).astype("int32"),  # 25 fps
                }
            )

    return media.mapInPandas(kernel, schema=schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Pure-SQL frame sampling plan: one output row per sampled frame
    timestamp (video only) — demonstrates that *planning* multimodal work
    stays in Catalyst; only the pixel work needs Python."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("meta_duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """Fit-within-``target`` resize planning, Catalyst-side: integer-exact
    output dimensions preserving aspect ratio (no upscaling — frames
    already inside the box keep native size). Like
    :func:`frame_sample_plan`, the point is that multimodal *planning* is
    relational work; only the pixel resample needs the (stubbed) Arrow
    kernel, and it receives exact target dims per row."""
    w = F.col("meta_width").cast("bigint")
    h = F.col("meta_height").cast("bigint")
    longest = F.greatest(w, h)
    out_w = F.expr(
        f"CAST(meta_width AS BIGINT) * {target}"
        " div greatest(CAST(meta_width AS BIGINT), CAST(meta_height AS BIGINT))"
    )
    out_h = F.expr(
        f"CAST(meta_height AS BIGINT) * {target}"
        " div greatest(CAST(meta_width AS BIGINT), CAST(meta_height AS BIGINT))"
    )
    return (
        media.filter(
            F.col("media_type").isin("image", "video") & (w > 0) & (h > 0)
        )
        .select(
            "media_id",
            "media_type",
            w.alias("in_width"),
            h.alias("in_height"),
            F.when(longest > target, out_w).otherwise(w).alias("out_width"),
            F.when(longest > target, out_h).otherwise(h).alias("out_height"),
        )
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads (the testdata
    has no real media) with deterministic synthetic metadata. Keeps every
    multimodal query runnable — and oracle-checkable — on the driver
    tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.col("n_chars") % 1920).cast("int").alias("meta_width"),
        (F.col("n_chars") % 1080).cast("int").alias("meta_height"),
        (F.col("n_chars") * 40).cast("int").alias("meta_duration_ms"),
    )


AUDIO_FRAME = 128  # fake-PCM frame width (bytes per analysis frame)

FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_id", T.LongType(), False),
        T.StructField("energy", T.LongType(), False),
    ]
)


def audio_frame_energy(
    media: DataFrame, frame: int = AUDIO_FRAME, fake: bool = True
) -> DataFrame:
    """Per-frame energy over audio payloads — the VAD/segmentation front
    end of an audio-training pipeline, run as the declared Arrow
    ``mapInPandas`` kernel (Spark has no audio decoders).

    ``fake=False`` is the real-codec path — STUB: raises
    NotImplementedError (no torchaudio/ffmpeg in this environment). The
    fake path treats the payload BYTES as 8-bit PCM samples: frame f is
    bytes [f*frame, (f+1)*frame) (the trailing partial frame included)
    and its energy is the exact integer sum of squared sample values —
    reproducible in ANSI SQL, so the whole kernel is oracle-checkable.

    Scale: the kernel is stateless per payload and emits frame-grain rows
    (len/frame per media) — embarrassingly parallel, output volume is a
    1/frame fraction of the input bytes."""
    if not fake:
        raise NotImplementedError(
            "real audio decoding requires torchaudio/ffmpeg — not "
            "available; use fake=True for the 8-bit PCM stand-in kernel"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, fids, energies = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                s = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n_frames = (len(s) + frame - 1) // frame
                sq = s * s
                for f in range(n_frames):
                    ids.append(mid)
                    fids.append(f)
                    energies.append(int(sq[f * frame : (f + 1) * frame].sum()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=FRAME_ENERGY_SCHEMA
    )


NIBBLE_HIST_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("nibble", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def byte_nibble_histogram_arrow(media: DataFrame) -> DataFrame:
    """Per-media-type histogram of payload HIGH NIBBLES (byte >> 4, 16
    bins) via ``mapInArrow`` — the zero-copy Arrow record-batch kernel
    surface (no pandas materialization; the batch's binary buffer feeds
    numpy directly). The byte-content profiling pass a media pipeline
    runs to sanity-check codecs/encodings before decode.

    Each batch is PRE-AGGREGATED inside the kernel (emits at most
    types x 16 rows per batch), so the exchange after the kernel moves
    O(batches * 48) rows regardless of payload volume — the map-side
    combine pattern, done in Python because the bytes are opaque to
    Catalyst. Callers finish with a groupBy sum.
    """
    import numpy as np
    import pyarrow as pa

    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            types = batch.column("media_type").to_pylist()
            payloads = batch.column("payload").to_pylist()
            acc: dict[str, "np.ndarray"] = {}
            for mt, payload in zip(types, payloads):
                counts = np.bincount(
                    np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=16
                )
                prev = acc.get(mt)
                acc[mt] = counts if prev is None else prev + counts
            out_t, out_nib, out_n = [], [], []
            for mt, counts in acc.items():
                for nib in range(16):
                    if counts[nib]:
                        out_t.append(mt)
                        out_nib.append(nib)
                        out_n.append(int(counts[nib]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_t, type=pa.string()),
                    pa.array(out_nib, type=pa.int64()),
                    pa.array(out_n, type=pa.int64()),
                ],
                names=["media_type", "nibble", "n"],
            )

    return (
        media.select("media_type", "payload")
        .mapInArrow(kernel, schema=NIBBLE_HIST_SCHEMA)
        .groupBy("media_type", "nibble")
        .agg(F.sum("n").cast("bigint").alias("n"))
    )
