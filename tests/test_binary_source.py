"""Tests for the binaryFile source (multimodal ingest front door)."""

from __future__ import annotations

import pytest

from rentals_data_pipeline_spark.sources.binary import read_binary_files


def _write_files(tmp_path):
    (tmp_path / "a.wav").write_bytes(b"RIFF" + b"\x00" * 60)
    (tmp_path / "b.wav").write_bytes(b"RIFF" + b"\x01" * 600)
    (tmp_path / "c.txt").write_bytes(b"not media")
    sub = tmp_path / "nested"
    sub.mkdir()
    (sub / "d.wav").write_bytes(b"RIFF" + b"\x02" * 20)
    return tmp_path


def test_reads_all_files_with_stable_ids(spark, tmp_path):
    root = _write_files(tmp_path)
    df = read_binary_files(spark, str(root))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.wav", "b.wav", "c.txt", "d.wav"}
    assert rows["a.wav"]["length"] == 64
    assert bytes(rows["a.wav"]["media"])[:4] == b"RIFF"
    # ids deterministic across reads
    again = {
        r["path"].rsplit("/", 1)[-1]: r["doc_id"]
        for r in read_binary_files(spark, str(root)).collect()
    }
    assert again == {k: v["doc_id"] for k, v in rows.items()}


def test_glob_and_size_filters(spark, tmp_path):
    root = _write_files(tmp_path)
    df = read_binary_files(spark, str(root), glob="*.wav", max_bytes=100)
    names = sorted(r["path"].rsplit("/", 1)[-1] for r in df.collect())
    assert names == ["a.wav", "d.wav"]  # c.txt globbed out, b.wav too big


def test_composes_with_multimodal_kernels(spark, tmp_path):
    """Ingested bytes flow straight into the existing metadata kernel."""
    from rentals_data_pipeline_spark.operators import multimodal as MM

    root = _write_files(tmp_path)
    df = read_binary_files(spark, str(root), glob="*.wav")
    meta = df.transform(MM.media_metadata(payload_col="media"))
    got = meta.collect()
    assert len(got) == 3
    assert all(r["n_bytes"] > 0 for r in got)
    assert all(r["magic_hex"] == "52494646" for r in got)  # "RIFF"


def test_raw_files_to_probe_triage(spark, tmp_path):
    """The full ingest-triage front door: raw media files on disk →
    distributed binaryFile listing → header-only probe. A directory
    mixing WAV, PNG and a foreign blob triages to one typed row per
    file with no decode and no task failure."""
    import struct
    import wave as wavelib

    import io

    buf = io.BytesIO()
    with wavelib.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x01" * 1600)
    (tmp_path / "a.wav").write_bytes(buf.getvalue())
    ihdr = struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0)
    import zlib

    png = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", 13) + b"IHDR" + ihdr
           + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    (tmp_path / "b.png").write_bytes(png)
    (tmp_path / "c.bin").write_bytes(b"\x00\x01\x02\x03junk")

    from rentals_data_pipeline_spark.operators.multimodal import probe_media
    from rentals_data_pipeline_spark.sources.binary import read_binary_files

    files = read_binary_files(spark, str(tmp_path))
    probed = probe_media(files, payload_col="media")
    by_fmt = {r["format"]: r for r in probed.collect()}
    assert by_fmt[("wav")]["sample_rate"] == 16000
    assert by_fmt["wav"]["duration_s"] == pytest.approx(0.1)
    assert (by_fmt["png"]["width"], by_fmt["png"]["height"]) == (7, 5)
    assert None in by_fmt and "unsupported" in by_fmt[None]["probe_error"]
