"""Multimodal column operators: image/audio/video as opaque binary +
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch iteration, partition sizing —
is real and tested; the actual codec calls (PIL/ffmpeg/librosa are not
in this container) are isolated behind ``_decode_image_bytes`` /
``_sample_frames_bytes``, which raise ``NotImplementedError`` unless
``deterministic_fake=True`` substitutes a seeded, content-derived fake
(md5 of the bytes → stable pseudo-dimensions/features) so tests can
exercise the full distributed path.

Scale notes:
- Binary payloads ride in parquet with the metadata columns, so
  filters on metadata (``media_type = 'image'``, ``n_bytes < 10MB``)
  prune row groups WITHOUT touching payload bytes (parquet column
  pruning keeps the binary column unread until the UDF stage).
- ``mapInPandas`` streams Arrow batches: peak executor memory is one
  batch of payloads, controlled by ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` — set it low (e.g. 64) for multi-MB media rows.
- Feature extraction is a narrow map: no shuffle anywhere.
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
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_hash", T.StringType(), True),
    ]
)


def _decode_image_bytes(payload: bytes | None, deterministic_fake: bool):
    """(width, height, channels, mean_luma); all-None for a NULL
    payload (matches SQL semantics — an absent payload has no
    features). Real impl needs PIL — STUB: not in this container."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not installed); "
            "pass deterministic_fake=True for the content-derived stand-in"
        )
    if payload is None:
        return None, None, None, None
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4, h[3] / 255.0


def _sample_frames_bytes(
    payload: bytes, n_frames: int, deterministic_fake: bool
) -> list[str]:
    """Frame-content hashes. Real impl needs ffmpeg — STUB."""
    if not deterministic_fake:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg (not installed); "
            "pass deterministic_fake=True for the content-derived stand-in"
        )
    return [
        hashlib.md5((payload or b"") + bytes([i])).hexdigest() for i in range(n_frames)
    ]


_ARROW_BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


def _rechunk(
    batches: Iterator[pd.DataFrame], batch_size: int
) -> Iterator[pd.DataFrame]:
    """Slice incoming Arrow batches to <= batch_size rows.

    The Arrow maxRecordsPerBatch conf is session state read at ACTION
    time, so a lazy operator cannot set-and-restore it without either
    leaking it session-wide (the bug this replaced) or having it never
    apply. Internal re-chunking bounds per-batch decode memory and the
    OUTPUT Arrow batches regardless of the session conf; for multi-MB
    payload INPUT transfer, bracket the action with arrow_batch_size():

        with arrow_batch_size(spark, 64):
            extract_image_features(media).write.parquet(...)
    """
    for pdf in batches:
        for lo in range(0, len(pdf), batch_size):
            yield pdf.iloc[lo : lo + batch_size]


class arrow_batch_size:
    """Context manager: temporarily cap Arrow batch size, restoring the
    previous session value afterwards."""

    def __init__(self, spark, batch_size: int):
        self.spark, self.batch_size = spark, batch_size

    def __enter__(self):
        self.prev = self.spark.conf.get(_ARROW_BATCH_CONF, None)
        self.spark.conf.set(_ARROW_BATCH_CONF, str(self.batch_size))

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(_ARROW_BATCH_CONF)
        else:
            self.spark.conf.set(_ARROW_BATCH_CONF, self.prev)


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive/refresh the typed metadata columns from the payload —
    pure JVM expressions (length, crc), no Python."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long"))


def extract_image_features(
    media: DataFrame, deterministic_fake: bool = False, batch_size: int = 64
) -> DataFrame:
    """Image decode + feature extraction over Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _rechunk(batches, batch_size):
            feats = [
                _decode_image_bytes(p, deterministic_fake) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                }
            )

    imgs = media.filter(F.col("media_type") == "image").select("media_id", "payload")
    return imgs.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    media: DataFrame,
    n_frames: int = 4,
    deterministic_fake: bool = False,
    batch_size: int = 16,
) -> DataFrame:
    """Frame sampling: one output row per (video, frame_idx)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _rechunk(batches, batch_size):
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, fh in enumerate(
                    _sample_frames_bytes(payload, n_frames, deterministic_fake)
                ):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(fh)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    vids = media.filter(F.col("media_type") == "video").select("media_id", "payload")
    return vids.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def _audio_features_bytes(payload: bytes | None, deterministic_fake: bool):
    """(duration_s, sample_rate, rms); all-None for a NULL payload.
    Real impl needs librosa/soundfile — STUB: not in this container."""
    if not deterministic_fake:
        raise NotImplementedError(
            "audio decode requires librosa/soundfile (not installed); "
            "pass deterministic_fake=True for the content-derived stand-in"
        )
    if payload is None:
        return None, None, None
    h = hashlib.md5(payload).digest()
    return 0.5 + h[0] / 8.0, (8, 16, 22, 44)[h[1] % 4] * 1000, h[2] / 255.0


def _resize_image_bytes(
    payload: bytes, width: int, height: int, deterministic_fake: bool
) -> bytes:
    """Resized image bytes. Real impl needs PIL — STUB."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv (not installed); "
            "pass deterministic_fake=True for the content-derived stand-in"
        )
    # content- and size-derived stand-in payload (stable across runs)
    return hashlib.md5((payload or b"") + f"{width}x{height}".encode()).digest()


def extract_audio_features(
    media: DataFrame, deterministic_fake: bool = False, batch_size: int = 64
) -> DataFrame:
    """Audio decode + feature extraction over Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _rechunk(batches, batch_size):
            feats = [
                _audio_features_bytes(p, deterministic_fake) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_s": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "rms": [f[2] for f in feats],
                }
            )

    auds = media.filter(F.col("media_type") == "audio").select("media_id", "payload")
    return auds.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    deterministic_fake: bool = False,
    batch_size: int = 16,
) -> DataFrame:
    """Image resize — binary in, binary out (the map shape every
    payload-rewriting op shares: decode → transform → re-encode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _rechunk(batches, batch_size):
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        _resize_image_bytes(p, width, height, deterministic_fake)
                        for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    imgs = media.filter(F.col("media_type") == "image").select("media_id", "payload")
    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)
