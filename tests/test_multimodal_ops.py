"""Tests for the multimodal binary-column plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    docs = spark.createDataFrame(
        [(0, "abcdabcd"), (1, "zzzz"), (2, "a" * 100)], ["doc_id", "text"]
    )
    return docs.transform(MM.pack_media())


def test_pack_media_shape(media_df):
    rows = {r["doc_id"]: r for r in media_df.collect()}
    assert rows[0]["media_type"] == "image"
    assert rows[1]["media_type"] == "audio"
    assert rows[2]["media_type"] == "video"
    assert bytes(rows[0]["payload"]) == b"abcdabcd"
    assert rows[2]["media_meta"]["n_bytes"] == 100
    assert rows[0]["media_meta"]["codec"] == "synthetic/v1"


def test_media_metadata_golden(media_df):
    out = {r["doc_id"]: r for r in media_df.transform(MM.media_metadata()).collect()}
    assert out[0]["n_bytes"] == 8
    assert out[0]["content_md5"] == hashlib.md5(b"abcdabcd").hexdigest()
    assert out[0]["magic_hex"] == b"abcd".hex().upper()


def test_decode_media_is_stubbed(media_df):
    with pytest.raises(NotImplementedError):
        MM.decode_media(media_df)


def test_byte_histogram_features(media_df):
    out = {
        r["doc_id"]: r["features"]
        for r in media_df.transform(MM.byte_histogram_features()).collect()
    }
    # 'zzzz': all bytes 0x7a -> bin 7 gets everything
    assert out[1][7] == pytest.approx(1.0)
    assert sum(out[1]) == pytest.approx(1.0)
    # 'abcdabcd': bytes 0x61-0x64 -> all in bin 6
    assert out[0][6] == pytest.approx(1.0)
    assert len(out[0]) == 16


def test_frame_sample(spark):
    df = spark.createDataFrame([(0, "x" * 100)], ["doc_id", "text"]).transform(
        MM.pack_media()
    )
    rows = df.transform(MM.frame_sample(frame_size=16, stride=4)).collect()
    frames = rows[0]["frames"]
    # frames start at bytes 1 and 65: floor((100-16)/64)+1 = 2 frames
    assert len(frames) == 2
    assert all(len(bytes(f)) == 16 for f in frames)


def test_frame_sample_short_payload(spark):
    df = spark.createDataFrame([(0, "short")], ["doc_id", "text"]).transform(
        MM.pack_media()
    )
    assert df.transform(MM.frame_sample(frame_size=16)).collect()[0]["frames"] == []


def test_resize_grid_block_average(spark):
    """4x4 byte grid -> 2x2 block means; short payloads zero-pad."""
    from rentals_data_pipeline_spark.operators.multimodal import resize_grid

    grid = bytes([0, 4, 8, 12,
                  4, 8, 12, 16,
                  100, 104, 108, 112,
                  104, 108, 112, 116])
    df = spark.createDataFrame([(1, grid), (2, b"\xff")], ["doc_id", "payload"])
    rows = {
        r.doc_id: r.resized
        for r in df.transform(resize_grid(src_size=4, dst_size=2)).collect()
    }
    assert rows[1] == [4.0, 12.0, 104.0, 112.0]
    assert rows[2][0] == 255 / 4  # one real byte + 3 zero-pad in block 0
    assert rows[2][1:] == [0.0, 0.0, 0.0]


def test_audio_energy_golden(spark):
    from rentals_data_pipeline_spark.operators import multimodal as MM
    import math

    # 64 'A's (ord 65) -> one window, rms = 65; 100 bytes -> still 1 window
    df = spark.createDataFrame(
        [(1, "A" * 64), (2, "A" * 100), (3, "ab"), (4, "")],
        "doc_id long, text string",
    )
    media = df.transform(MM.pack_media())
    got = {
        r["doc_id"]: r["energy"]
        for r in media.transform(MM.audio_energy(window=64)).collect()
    }
    assert got[1] == [65.0]
    assert got[2] == [65.0]  # trailing partial window dropped
    assert got[3] == [] and got[4] == []
    mixed = spark.createDataFrame([(9, "AB" * 32)], "doc_id long, text string")
    rms = mixed.transform(MM.pack_media()).transform(
        MM.audio_energy(window=64)
    ).collect()[0]["energy"][0]
    assert rms == math.sqrt((32 * 65 * 65 + 32 * 66 * 66) / 64)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        MM.audio_energy(window=60)
