"""JSONL ingest: schema-first read + corrupt-line quarantine."""

from __future__ import annotations

from pyspark.sql import types as T

from rentals_data_pipeline_spark.sources.jsonl import read_jsonl, split_quarantine

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write(tmp_path, lines):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_and_quarantine_split(spark, tmp_path):
    lines = [
        '{"doc_id": 1, "text": "hello world"}',
        "this is not json at all",
        '{"doc_id": 2, "text": "second"}',
        '{"doc_id": "not a number", "text": "type mismatch"}',
    ]
    df = read_jsonl(spark, _write(tmp_path, lines), SCHEMA)
    clean, quarantine = split_quarantine(df)
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    bad = {r["raw_line"] for r in quarantine.collect()}
    assert "this is not json at all" in bad
    assert len(bad) == 2


def test_all_clean_gives_empty_quarantine(spark, tmp_path):
    lines = ['{"doc_id": 10, "text": "a"}', '{"doc_id": 11, "text": "b"}']
    df = read_jsonl(spark, _write(tmp_path, lines), SCHEMA)
    clean, quarantine = split_quarantine(df)
    assert clean.count() == 2
    assert quarantine.count() == 0


def test_schema_is_explicit_no_inference(spark, tmp_path):
    """Types come from the declared schema, not inference: doc_id stays
    LongType even when every value would infer smaller."""
    lines = ['{"doc_id": 1, "text": "x"}']
    df = read_jsonl(spark, _write(tmp_path, lines), SCHEMA)
    assert dict(df.dtypes)["doc_id"] == "bigint"
    assert dict(df.dtypes)["text"] == "string"
