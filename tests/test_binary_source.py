"""Tests for the binaryFile source (multimodal ingest front door)."""

from __future__ import annotations

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
