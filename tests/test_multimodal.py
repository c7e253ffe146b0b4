"""Multimodal plumbing tests: binary columns through mapInPandas."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from automated_etl_pipeline_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    attach_metadata,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, media_type="image", payload=b"\x89PNG fake bytes 1", mime="image/png", n_bytes=None),
        Row(media_id=2, media_type="image", payload=b"\x89PNG other bytes 22", mime="image/png", n_bytes=None),
        Row(media_id=3, media_type="video", payload=b"\x00\x00ftyp fake mp4", mime="video/mp4", n_bytes=None),
        Row(media_id=4, media_type="audio", payload=b"RIFF fake wav", mime="audio/wav", n_bytes=None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_attach_metadata_lengths(media):
    out = {r.media_id: r.n_bytes for r in attach_metadata(media).collect()}
    assert out[1] == len(b"\x89PNG fake bytes 1")
    assert out[4] == len(b"RIFF fake wav")


def test_image_features_deterministic(media):
    a = extract_image_features(media, deterministic_fake=True).collect()
    b = extract_image_features(media, deterministic_fake=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # content-derived, stable
    assert {r.media_id for r in a} == {1, 2}  # only images
    for r in a:
        assert 16 <= r.width <= 255 and 1 <= r.channels <= 4
        assert 0.0 <= r.mean_luma <= 1.0


def test_video_frame_sampling_shape(media):
    frames = sample_video_frames(media, n_frames=3, deterministic_fake=True).collect()
    assert len(frames) == 3  # one video × 3 frames
    assert [f.frame_idx for f in sorted(frames, key=lambda r: r.frame_idx)] == [0, 1, 2]
    assert len({f.frame_hash for f in frames}) == 3


def test_real_decode_path_raises_cleanly(media):
    with pytest.raises(Exception, match="PIL|decode"):
        extract_image_features(media, deterministic_fake=False).collect()


def test_audio_features_and_resize(spark):
    import hashlib

    from automated_etl_pipeline_spark.multimodal.binary_ops import (
        extract_audio_features,
        resize_images,
    )

    rows = [
        (1, "audio", b"wavbytes-1", "audio/wav", 10),
        (2, "image", b"pngbytes-2", "image/png", 10),
        (3, "audio", b"wavbytes-3", "audio/wav", 10),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, mime string, n_bytes long"
    )
    feats = {r.media_id: r for r in extract_audio_features(df, deterministic_fake=True).collect()}
    assert set(feats) == {1, 3}
    assert all(f.sample_rate in (8000, 16000, 22000, 44000) for f in feats.values())
    assert all(f.duration_s > 0 for f in feats.values())

    resized = resize_images(df, 32, 32, deterministic_fake=True).collect()
    assert [r.media_id for r in resized] == [2]
    want = hashlib.md5(b"pngbytes-2" + b"32x32").digest()
    assert bytes(resized[0].payload) == want and resized[0].width == 32
