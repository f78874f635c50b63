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


def test_decode_media_rejects_non_wav(media_df):
    """pack_media payloads are raw utf-8 (no RIFF container): the real
    decode path surfaces them as unsupported-codec rows, not errors."""
    rows = MM.decode_media(media_df).collect()
    assert rows and all(
        r["decode_error"].startswith("unsupported codec: magic=")
        for r in rows
    )


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


def test_pack_wav_decode_round_trip(spark):
    """pack_wav -> decode_media inverts exactly: 8-bit unsigned PCM
    samples are the text's utf-8 bytes; NULL text is an error row."""
    df = spark.createDataFrame(
        [(1, "Hello"), (2, ""), (3, None)], "doc_id long, text string"
    )
    dec = {
        r["doc_id"]: r
        for r in MM.decode_media(df.transform(MM.pack_wav())).collect()
    }
    assert dec[1]["decode_error"] is None
    assert dec[1]["n_channels"] == 1 and dec[1]["sample_rate"] == 8000
    assert dec[1]["decoded"] == [[float(b) for b in b"Hello"]]
    assert dec[2]["decode_error"] is None and dec[2]["decoded"] == [[]]
    assert dec[3]["decode_error"] == "null payload"
    assert dec[3]["decoded"] is None


def test_decode_media_16bit_stereo(spark):
    """decode_media de-interleaves 16-bit signed stereo correctly."""
    import io
    import wave

    import numpy as np

    left = np.array([0, 1000, -2000], dtype="<i2")
    right = np.array([5, -6, 30000], dtype="<i2")
    inter = np.empty(6, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(inter.tobytes())
    df = spark.createDataFrame(
        [(7, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    row = MM.decode_media(df).collect()[0]
    assert row["decode_error"] is None
    assert row["n_channels"] == 2 and row["sample_rate"] == 44100
    assert row["decoded"] == [left.tolist(), right.tolist()]


def test_decode_media_failures_are_rows(spark):
    """Foreign magic, truncated containers, and unsupported widths all
    yield decode_error ROWS — a corrupt blob never kills the stage."""
    import struct

    # Hand-built WAV claiming 64-bit PCM — parses, then rejected by width
    # (8/16/24/32-bit PCM all decode for real as of round 6).
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 64000, 8, 64)
    wide = (
        b"RIFF"
        + struct.pack("<I", 36 + 8)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", 8)
        + b"\x00" * 8
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(b"OggS\x00\x02not-a-wav")),
            (2, bytearray(b"RIFF\x00\x00\x00\x00WAVEtruncated")),
            (3, bytearray(wide)),
        ],
        "doc_id long, payload binary",
    )
    errs = {r["doc_id"]: r["decode_error"] for r in MM.decode_media(df).collect()}
    assert errs[1].startswith("ogg parse error")
    assert "error" in errs[2] or errs[2].startswith("wave parse")
    assert errs[3] == "unsupported sample width: 8"


def test_shot_boundaries_planted_cut(spark):
    """Two homogeneous 64-byte 'shots' with different bytes: the only
    frame transition is a maximal cut (L1 = 128); a uniform payload has
    zero change and no boundary."""
    from rentals_data_pipeline_spark.operators.multimodal import (
        shot_boundaries,
    )

    cut = ("a" * 64 + "Z" * 64).encode()     # bins differ entirely
    flat = ("m" * 192).encode()              # 3 identical frames
    df = spark.createDataFrame(
        [(1, bytearray(cut)), (2, bytearray(flat))],
        "doc_id long, payload binary",
    )
    got = {
        (r["doc_id"], r["frame"]): (r["l1_change"], r["is_boundary"])
        for r in df.transform(shot_boundaries()).collect()
    }
    assert got[(1, 1)] == (128, True)    # full histogram swap
    assert got[(2, 1)] == (0, False)
    assert got[(2, 2)] == (0, False)


def test_media_curation_keep_rule(spark, tmp_path):
    """Flagship keep rule: a long dynamic doc passes; a short doc and
    a long-but-static doc fail."""
    from rentals_data_pipeline_spark.plans import multimodal_queries  # noqa: F401
    from rentals_data_pipeline_spark.plans.catalog import QUERIES

    dynamic = "a" * 64 + "Z" * 64 + "q" * 64       # cut between frames
    static = "m" * 256                              # no cuts
    short = "tiny"
    rows = [(1, dynamic), (2, static), (3, short)]
    spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["pipeline_media_curation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1]["keep"] and got[1]["n_cuts"] >= 1
    assert not got[2]["keep"] and got[2]["n_cuts"] == 0
    assert not got[3]["keep"] and got[3]["n_bytes"] == 4
    # exact energy: 256 * ord('m')^2 for the static doc
    assert got[2]["total_sq_energy"] == 256 * ord("m") ** 2


def test_shot_boundaries_oracle_handles_long_docs(spark, tmp_path):
    """Round-6 ADVICE: the oracle's frame spine is derived from
    MAX(nf), not a hard-coded 100-frame cap — a document longer than
    6400 chars (100 frames) must produce identical engine-vs-oracle
    results instead of silently truncating the oracle side."""
    import duckdb

    import __spark_entry__  # noqa: F401 — populates the catalog registry
    from rentals_data_pipeline_spark.plans.catalog import ORACLE_SQL, QUERIES

    long_text = ("a" * 640 + "z" * 640) * 8  # 10240 chars = 160 frames
    rows = [(1, long_text, "en", 0), (2, "short doc text here", "en", 0)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, label int"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r["doc_id"], r["frame"]): (r["l1_change"], r["is_boundary"])
        for r in QUERIES["multimodal_shot_boundaries"](
            spark, str(tmp_path)
        ).collect()
    }
    assert max(f for _, f in got) == 159  # all 160 frames, not 100

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = {
        (d, f): (l1, b)
        for d, f, l1, b in con.execute(
            ORACLE_SQL["multimodal_shot_boundaries"]
        ).fetchall()
    }
    assert got == want


def test_pack_gif_anim_decode_video_frames_roundtrip(spark):
    """Real animated-GIF roundtrip through Spark: each 64-byte text
    chunk becomes one frame whose pixel lumas are exactly 85*(byte&3);
    per-frame means are exact integer-sum/count doubles, delays are
    the deterministic 10*(i+1) GCE values, NULL text is an error row,
    and a short doc still produces one (padded) frame."""
    from rentals_data_pipeline_spark.operators import multimodal as MM

    text = "the quick brown fox jumps over the lazy dog " * 4  # 3 frames
    docs = spark.createDataFrame(
        [(1, text), (2, "tiny"), (3, None)], "doc_id long, text string"
    )
    rows = MM.decode_video_frames(
        docs.transform(MM.pack_gif_anim())
    ).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 3 and all(
        r["n_frames"] == 3 and r["decode_error"] is None for r in by_doc[1]
    )
    data = text.encode()
    for r in sorted(by_doc[1], key=lambda r: r["frame_idx"]):
        f = r["frame_idx"]
        chunk = data[f * 64 : (f + 1) * 64]
        want_mean = sum(85 * (b & 3) for b in chunk) / 64.0
        assert r["mean_r"] == want_mean == r["mean_g"] == r["mean_b"]
        assert r["delay_cs"] == 10 * (f + 1)
        assert (r["width"], r["height"]) == (8, 8)
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_frames"] == 1
    assert by_doc[3][0]["decode_error"] == "null payload"


def test_pack_png_and_flac_roundtrip_exact(spark):
    """pack_png / pack_flac -> decode_media: the decoded pixels/samples
    ARE the text's bytes (zero-padded to 256) — signature+CRC+inflate
    +unfilter for PNG, metadata walk + frame codes + verbatim subframe
    for FLAC."""
    text = "".join(chr(32 + (i * 7) % 90) for i in range(100))
    want = [float(b) for b in text.encode()] + [0.0] * 156
    docs = spark.createDataFrame(
        [(1, text), (2, None)], "doc_id long, text string"
    )
    png = {r["doc_id"]: r for r in MM.decode_media(
        docs.transform(MM.pack_png())).collect()}
    assert png[1]["decode_error"] is None
    assert png[1]["decoded"] == [want]
    assert png[2]["decode_error"] == "null payload"
    flac = {r["doc_id"]: r for r in MM.decode_media(
        docs.transform(MM.pack_flac())).collect()}
    assert flac[1]["decode_error"] is None
    assert flac[1]["sample_rate"] == 8000 and flac[1]["n_channels"] == 1
    assert flac[1]["decoded"] == [want]
    # BMP: decoded top-down RGB interleave == text bytes (the writer's
    # row flip + BGR swap cancels the decoder's)
    want_rgb = [float(b) for b in text.encode()] + [0.0] * (768 - 100)
    bmp = {r["doc_id"]: r for r in MM.decode_media(
        docs.transform(MM.pack_bmp())).collect()}
    assert bmp[1]["decode_error"] is None
    got = bmp[1]["decoded"]  # [R, G, B] planes, top-down row-major
    inter = [v for px in zip(*got) for v in px]
    assert inter == want_rgb
    assert bmp[2]["decode_error"] == "null payload"


def test_pack_avi_mjpeg_decodes_to_tile_values(spark):
    """pack_avi_mjpeg -> decode_video_frames roundtrip: per-frame means
    recomputed from the text's chunk bytes exactly (DC-only blocks with
    unit quant tables are lossless), delays 10 cs from strh
    scale/rate, NULL text -> null-payload error row."""
    text = "a" * 16 + "b" * 16 + "c" * 16 + "d" * 16 + "`" * 64  # 2 frames
    docs = spark.createDataFrame(
        [(1, text), (2, None)], "doc_id long, text string"
    )
    rows = MM.decode_video_frames(
        docs.transform(MM.pack_avi_mjpeg())
    ).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2
    data = text.encode()
    for r in sorted(by_doc[1], key=lambda r: r["frame_idx"]):
        ch = data[r["frame_idx"] * 64 : (r["frame_idx"] + 1) * 64]
        want = sum(85 * (ch[k] & 3) for k in (0, 16, 32, 48)) / 4.0
        assert r["mean_r"] == want == r["mean_g"] == r["mean_b"]
        assert r["delay_cs"] == 10
        assert (r["width"], r["height"]) == (16, 16)
        assert r["n_frames"] == 2 and r["decode_error"] is None
    assert by_doc[2][0]["decode_error"] == "null payload"


def test_pipeline_video_curation_golden(spark, tmp_path):
    """The video-curation flagship: doc_id % 3 routes AVI / GIF / MP4
    (round 9); motion docs keep, static loops and one-frame stills
    drop; durations are container-faithful (AVI/MP4 10 cs/frame, GIF
    10(f+1) cs)."""
    import __spark_entry__ as E

    doc_cuts = "c" * 64 + "`" * 64 + "c" * 64  # 3 frames, 2 max-jumps
    doc_flat = "c" * 192  # 3 identical frames
    doc_tiny = "hi"  # 1 frame -> still
    spark.createDataFrame(
        [(0, doc_cuts), (1, doc_cuts), (2, doc_cuts), (3, doc_flat),
         (4, doc_tiny), (5, doc_tiny)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (
            r["container"], r["n_frames"], r["duration_cs"],
            r["n_cuts"], r["label"], r["keep"],
        )
        for r in E.queries()["pipeline_video_curation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0] == ("avi", 3, 30, 2, "motion", True)
    assert got[1] == ("gif", 3, 60, 2, "motion", True)
    assert got[2] == ("mp4", 3, 30, 2, "motion", True)
    assert got[3] == ("avi", 3, 30, 0, "static_loop", False)
    assert got[4] == ("gif", 1, 10, 0, "still", False)
    assert got[5] == ("mp4", 1, 10, 0, "still", False)
    assert len(got) == 6


def test_video_shot_boundaries_query_golden(spark, tmp_path):
    """The rows-only catalog query, both containers: a doc whose chunks
    alternate luma-heavy and luma-light text shows cuts; a constant doc
    is static. GIF durations sum the GCE delays (10(f+1) cs); AVI
    durations are 10 cs per frame from strh scale/rate."""
    import __spark_entry__ as E

    # chunk A: bytes & 3 == 3 (e.g. 'c' = 0x63 -> 3) / chunk B: byte
    # '`' = 0x60 -> 0: maximal luma jump between 64-byte chunks
    doc_cuts = "c" * 64 + "`" * 64 + "c" * 64
    doc_flat = "c" * 192
    spark.createDataFrame(
        [(1, doc_cuts), (2, doc_flat)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["container"], r["doc_id"]): (
            r["n_frames"], r["duration_cs"], r["n_cuts"], r["is_static"]
        )
        for r in E.queries()["multimodal_video_shot_boundaries"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[("gif", 1)] == (3, 60, 2, False)  # 10+20+30 cs, two jumps
    assert got[("gif", 2)] == (3, 60, 0, True)
    assert got[("avi", 1)] == (3, 30, 2, False)  # 3 x 10 cs
    assert got[("avi", 2)] == (3, 30, 0, True)
    assert len(got) == 4


def test_pack_mp4_mjpeg_parity_with_avi(spark):
    """MP4 and AVI packs carry bit-identical frame JPEGs, so
    decode_video_frames must produce IDENTICAL per-frame rows (means,
    delays, counts, geometry) for the same text through either
    container; NULL text -> null-payload error row in both."""
    text = "a" * 16 + "b" * 16 + "c" * 16 + "d" * 16 + "`" * 64
    docs = spark.createDataFrame(
        [(1, text), (2, None)], "doc_id long, text string"
    )
    keys = ("doc_id", "frame_idx", "n_frames", "delay_cs", "width",
            "height", "mean_r", "mean_g", "mean_b", "truncated",
            "decode_error")

    def rows(op):
        return sorted(
            tuple(r[k] for k in keys)
            for r in MM.decode_video_frames(docs.transform(op)).collect()
        )

    avi = rows(MM.pack_avi_mjpeg())
    mp4 = rows(MM.pack_mp4_mjpeg())
    assert avi == mp4
    good = [r for r in mp4 if r[-1] is None]
    assert len(good) == 2
    assert all(r[9] is False for r in good)  # truncated column present+False


def test_pack_ogg_opus_probe_row(spark):
    """pack_ogg_opus -> probe_media: real pages, real CRCs, and the
    packet count / duration the oracle replays from byte length."""
    text = "x" * 130  # 3 chunks -> 3 audio pages
    docs = spark.createDataFrame(
        [(1, text), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r
           for r in MM.probe_media(docs.transform(MM.pack_ogg_opus()))
           .collect()}
    r = out[1]
    assert (r["format"], r["codec"]) == ("ogg", "opus")
    assert (r["channels"], r["sample_rate"]) == (1, 48000)
    assert r["n_frames"] == 3 + 2  # 3 audio packets + OpusHead + OpusTags
    assert r["duration_s"] == pytest.approx(0.03)
    assert r["probe_error"] is None
    assert out[2]["probe_error"] == "null payload"


def test_pack_ogg_flac_decode_roundtrip(spark):
    """pack_ogg_flac -> decode_media (round 10): the Ogg page walk +
    packet reassembly feeds the native FLAC decoder and the decoded
    samples ARE the text's bytes, zero-padded to 256 — identical to
    the bare pack_flac contract, reached through the Ogg branch."""
    text = "ogg flac roundtrip é"  # multibyte tail: bytes, not chars
    docs = spark.createDataFrame(
        [(1, text), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r
           for r in MM.decode_media(docs.transform(MM.pack_ogg_flac()))
           .collect()}
    r = out[1]
    assert r["decode_error"] is None
    assert (r["n_channels"], r["sample_rate"]) == (1, 8000)
    data = text.encode("utf-8")
    want = list(data) + [0] * (256 - len(data))
    assert [int(v) for v in r["decoded"][0]] == want
    assert out[2]["decode_error"] == "null payload"
    # probe agrees with decode on the same payloads (triage coherence)
    p = {r["doc_id"]: r
         for r in MM.probe_media(docs.transform(MM.pack_ogg_flac()))
         .collect()}[1]
    assert (p["format"], p["codec"]) == ("ogg", "flac")
    assert (p["channels"], p["sample_rate"]) == (1, 8000)
    assert p["duration_s"] == pytest.approx(256 / 8000)


def test_decoded_mp4_stats_query_golden(spark, tmp_path):
    """The oracle-paired round-9 query end-to-end on a local corpus:
    per-frame means replay from the text bytes, the same golden the
    AVI twin pins (both containers carry the same frames)."""
    import __spark_entry__ as E

    text = "c" * 64 + "`" * 64
    spark.createDataFrame(
        [(1, text), (2, None)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        (r["doc_id"], r["frame_idx"], r["n_frames"], r["delay_cs"],
         r["mean_luma"])
        for r in E.queries()["multimodal_decoded_mp4_stats"](
            spark, str(tmp_path)
        ).collect()
    )
    want_f0 = 85 * (ord("c") & 3)  # all four tiles = byte 'c'
    want_f1 = 85 * (ord("`") & 3)
    assert got == [(1, 0, 2, 10, float(want_f0)),
                   (1, 1, 2, 10, float(want_f1))]


def test_decode_media_mp4_first_frame(spark):
    """decode_media's stills view now covers MJPEG-in-MP4: the first
    frame decodes as a 3-channel image; an MP4 carrying a compressed
    codec stays an 'unsupported mp4 codec' error ROW."""
    text = "c" * 64 + "`" * 64
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    packed = docs.transform(MM.pack_mp4_mjpeg())
    row = MM.decode_media(packed).collect()[0]
    assert row["decode_error"] is None
    assert row["n_channels"] == 3 and row["sample_rate"] is None
    # 16x16 constant-tile first frame: every channel value is 85*('c'&3)
    want = float(85 * (ord("c") & 3))
    assert all(v == want for v in row["decoded"][0])
    assert len(row["decoded"][0]) == 256
