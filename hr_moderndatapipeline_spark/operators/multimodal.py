"""Multimodal (image/audio/video) column plumbing.

Beyond-reference capability (BASELINE.json north star). Media are
opaque ``binary`` payload columns with a typed metadata struct; the
Spark-side plumbing — schema, partition-friendly batch shape,
``mapInPandas`` Arrow iteration, UDF signatures — is real and tested.
The actual codec work is STUBBED: this container ships no image/audio
libraries, so ``decode_media`` raises ``NotImplementedError`` unless
``fake=True``, in which case a clearly-marked deterministic fake
(byte-statistics features) stands in. Swapping the fake for
PIL/libav decoding changes only the inner function body — the
distributed plan is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def fake_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media corpus built from the documents
    table: payload = UTF-8 bytes of the text (an opaque blob as far
    as the pipeline is concerned), media_type cycles by id, metadata
    derived deterministically. Stands in for a real multimodal scan
    (parquet with binary columns behaves identically)."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> dict:
    """Decode one payload. REAL CODECS NOT AVAILABLE IN THIS
    ENVIRONMENT — ``fake=True`` switches to the deterministic stub;
    otherwise this raises, making the stubbed boundary explicit."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in this "
            "container; pass fake=True for the deterministic stub"
        )
    import numpy as np

    arr = np.frombuffer(payload or b"", dtype=np.uint8)
    return {"n_bytes": int(arr.size), "mean": float(arr.mean()) if arr.size else 0.0}


def extract_features(media: DataFrame, batch_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real distributed shape for multimodal
    featurization (per-partition batch iteration, bounded memory,
    no driver involvement). Feature math is the deterministic fake
    (byte-histogram moments) standing in for a vision/audio model."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            n_bytes = []
            for payload in pdf["payload"]:
                if not batch_fake:  # pragma: no cover - explicit stub boundary
                    raise NotImplementedError("real codecs unavailable; use batch_fake=True")
                arr = np.frombuffer(payload or b"", dtype=np.uint8).astype(np.float64)
                true_size = int(arr.size)  # BEFORE the histogram pad:
                # decode_media reports 0 for empty payloads, and so
                # must this path ("drop n_bytes == 0" filters rely
                # on the two agreeing)
                if arr.size == 0:
                    arr = np.zeros(1)
                hist = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))[0]
                total = hist.sum() or 1
                feats.append((hist / total).tolist())
                n_bytes.append(true_size)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "features": feats,
                }
            )

    from hr_moderndatapipeline_spark.operators.relational import rebalance

    return rebalance(media).mapInPandas(_extract, schema=_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    frame timestamp (metadata-driven; decoding the actual frame is
    the stubbed step). Pure JVM expressions — explode over a
    generated timestamp sequence, no Python."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )


def audio_segments(media: DataFrame, segment_ms: int = 5000) -> DataFrame:
    """Fixed-length segmentation for audio rows — the windowing step
    before any audio featurizer (decode itself stays stubbed): one
    row per segment with [start, end) bounds clipped to the clip
    duration. Same map-side explode shape as ``sample_frames``; rows
    scale with duration/segment, no Python."""
    dur = F.col("meta.duration_ms")
    starts = F.sequence(
        F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(segment_ms)
    )
    return (
        media.filter(F.col("media_type") == "audio")
        .select("media_id", dur.alias("_dur"), F.explode(starts).alias("seg_start_ms"))
        .select(
            "media_id",
            F.col("seg_start_ms").cast("int").alias("seg_start_ms"),
            F.least(F.col("seg_start_ms") + segment_ms, F.col("_dur"))
            .cast("int")
            .alias("seg_end_ms"),
        )
    )
