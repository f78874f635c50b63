"""XML ingest/egress: schema-first read, quarantine, roundtrip, from_xml."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from rentals_data_pipeline_spark.sources.xml import (
    parse_xml_strings,
    read_xml,
    split_quarantine,
    write_xml,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write(tmp_path, body: str) -> str:
    p = tmp_path / "docs.xml"
    p.write_text(f"<rows>\n{body}\n</rows>\n")
    return str(p)


def test_clean_and_quarantine_split(spark, tmp_path):
    path = _write(
        tmp_path,
        "<row><doc_id>1</doc_id><text>hello</text></row>\n"
        "<row><doc_id>not a number</doc_id><text>bad type</text></row>\n"
        "<row><doc_id>2</doc_id><text>world</text></row>",
    )
    clean, quarantine = split_quarantine(read_xml(spark, path, SCHEMA))
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: "hello", 2: "world"}
    assert quarantine.count() == 1


def test_schema_is_explicit_no_inference(spark, tmp_path):
    path = _write(tmp_path, "<row><doc_id>1</doc_id><text>7</text></row>")
    df = read_xml(spark, path, SCHEMA)
    assert dict(df.dtypes)["doc_id"] == "bigint"
    assert dict(df.dtypes)["text"] == "string"  # declared, not inferred int


def test_attributes_surface_with_prefix(spark, tmp_path):
    """Element attributes arrive as `_name` columns (attributePrefix
    default) — declared in the schema like any other field."""
    schema = T.StructType(
        [
            T.StructField("_lang", T.StringType()),
            T.StructField("doc_id", T.LongType()),
        ]
    )
    path = _write(tmp_path, '<row lang="en"><doc_id>5</doc_id></row>')
    row = read_xml(spark, path, schema).collect()[0]
    assert row["_lang"] == "en" and row["doc_id"] == 5


def test_write_read_roundtrip_multifile(spark, tmp_path):
    """The sink writes one well-formed document per task (no single
    writer); reading the directory back recovers every row."""
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
    ).repartition(4)
    out = str(tmp_path / "out")
    write_xml(df, out, row_tag="doc", root_tag="corpus")
    import pathlib

    parts = [p for p in pathlib.Path(out).iterdir() if p.suffix == ".xml"]
    assert len(parts) > 1  # genuinely distributed, no coalesce(1)
    back = (
        spark.read.schema(SCHEMA)
        .option("rowTag", "doc")
        .format("xml")
        .load(out)
    )
    assert {r["doc_id"] for r in back.collect()} == set(range(20))


def test_parse_xml_strings_column(spark):
    """Embedded-XML column parse: valid bodies become structs, garbage
    becomes a null struct — never a task failure."""
    df = spark.createDataFrame(
        [
            (1, "<meta><lang>en</lang><stars>5</stars></meta>"),
            (2, "<meta><lang>fr</lang></meta>"),
            (3, "not xml at all <<<"),
        ],
        "doc_id long, body string",
    )
    schema = "lang STRING, stars INT"
    out = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id", parse_xml_strings(F.col("body"), schema).alias("p")
        ).collect()
    }
    assert out[1]["lang"] == "en" and out[1]["stars"] == 5
    assert out[2]["lang"] == "fr" and out[2]["stars"] is None
    assert out[3] is None or out[3]["lang"] is None


def test_read_xml_no_matching_rows(spark, tmp_path):
    """A document with zero row tags reads as an empty frame with the
    declared schema (plus the quarantine column)."""
    p = tmp_path / "empty.xml"
    p.write_text("<rows></rows>\n")
    df = read_xml(spark, str(p), SCHEMA)
    assert df.count() == 0
    assert set(df.columns) == {"doc_id", "text", "_corrupt_record"}
