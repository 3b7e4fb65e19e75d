from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from scala_etl_test_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake image bytes", "image/png", 640, 480, 1),
        (2, "video", b"\x00\x00ftyp fake video bytes", "video/mp4", 1920, 1080, 9),
        (3, "audio", b"RIFF fake audio", "audio/wav", None, None, 1),
        (4, "image", b"", "image/png", 1, 1, 1),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_payload_stats_native(media):
    out = {r["media_id"]: r for r in M.attach_payload_stats(media).collect()}
    assert out[1]["byte_len"] == 21
    assert out[1]["payload_md5"] == hashlib.md5(b"\x89PNG fake image bytes").hexdigest()
    assert out[4]["byte_len"] == 0


def test_extract_features_arrow_batched(media):
    out = M.extract_features(media)
    assert out.schema == M.DECODED_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    feats = rows[1]["features"]
    assert len(feats) == 16
    assert sum(feats) == pytest.approx(1.0)
    assert rows[1]["features"] == M.byte_histogram_features(b"\x89PNG fake image bytes")
    assert rows[4]["features"] == [0.0] * 16


def test_real_codec_path_is_marked_stub(media):
    with pytest.raises(Exception) as exc_info:
        M.extract_features(media, use_real_codec=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sampling_native(media):
    out = M.sample_frame_indices(media, every=2)
    video = out.filter(F.col("media_id") == 2).select("frame_index").collect()
    assert [r["frame_index"] for r in video] == [0, 2, 4, 6, 8]
    image = out.filter(F.col("media_id") == 1).select("frame_index").collect()
    assert [r["frame_index"] for r in image] == [0]


def test_resize_media_deterministic_and_shaped(spark):
    import hashlib

    from scala_etl_test_spark.operators.multimodal import fake_resize, resize_media

    media = spark.createDataFrame(
        [(1, "image", b"imgbytes", "image/raw"), (2, "image", b"other", "image/raw")],
        "media_id long, modality string, payload binary, mime string",
    )
    out = resize_media(media, width=32, height=32)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    expected = fake_resize(b"imgbytes", 32, 32)
    assert bytes(rows[1]["payload"]) == expected
    assert rows[1]["resized_md5"] == hashlib.md5(expected).hexdigest()
    assert rows[1]["out_width"] == rows[1]["out_height"] == 32
    # content-addressed: different inputs -> different resized payloads
    assert rows[1]["resized_md5"] != rows[2]["resized_md5"]


def test_resize_real_codec_is_marked_stub(spark):
    import pytest

    from scala_etl_test_spark.operators.multimodal import resize_media

    media = spark.createDataFrame(
        [(1, "image", b"x", "image/raw")],
        "media_id long, modality string, payload binary, mime string",
    )
    with pytest.raises(Exception, match="codecs unavailable|NotImplementedError"):
        resize_media(media, use_real_codec=True).collect()
