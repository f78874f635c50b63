"""Catalog queries for the text-analysis extension (documents table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import text as TX
from rentals_data_pipeline_spark.plans.catalog import query
from rentals_data_pipeline_spark.sources.tables import load_table

_EN = ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"])


@query(
    "text_token_stats",
    f"""
SELECT
    doc_id,
    lang,
    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
    CAST(len(list_distinct(string_split_regex(text, '\\s+'))) AS BIGINT)
        AS n_distinct_tokens,
    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT)
        AS n_bpe_units,
    FLOOR((length(regexp_replace(text, '\\s+', '', 'g'))
           / NULLIF(len(string_split_regex(text, '\\s+')), 0)) * 10000.0 + 0.5)
        / 10000.0 AS avg_token_len
FROM documents
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", "text").transform(TX.token_stats()).drop(
        "text"
    )


@query(
    "text_quality_score",
    f"""
WITH t AS (
    SELECT
        doc_id,
        CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS n,
        CAST(len(list_distinct(string_split_regex(text, '\\s+'))) AS DOUBLE) AS nd,
        CAST(len(list_filter(string_split_regex(text, '\\s+'),
                             t -> t IN ({_EN}))) AS DOUBLE) AS sw
    FROM documents
)
SELECT
    doc_id,
    FLOOR((0.4 * LEAST(n / 100.0, 1.0) + 0.3 * (nd / NULLIF(n, 0.0))
           + 0.3 * (sw / NULLIF(n, 0.0))) * 10000.0 + 0.5) / 10000.0 AS quality
FROM t
""",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "text").transform(TX.quality_score()).drop("text")


_LANG_SCORES_SQL = ",\n        ".join(
    "CAST(len(list_filter(toks, t -> t IN ({words}))) AS DOUBLE)"
    " / NULLIF(CAST(len(toks) AS DOUBLE), 0.0) AS score_{lang}".format(
        words=", ".join(f"'{w}'" for w in ws), lang=lang
    )
    for lang, ws in TX.STOPWORDS.items()
)


@query(
    "text_language_id",
    f"""
WITH t AS (
    SELECT doc_id, lang, string_split_regex(text, '\\s+') AS toks
    FROM documents
),
s AS (
    SELECT doc_id, lang,
        {_LANG_SCORES_SQL}
    FROM t
)
SELECT
    doc_id,
    lang,
    CASE
        WHEN GREATEST(score_en, score_es, score_de, score_fr) IS NULL
             OR GREATEST(score_en, score_es, score_de, score_fr) <= 0
            THEN 'unknown'
        WHEN score_en = GREATEST(score_en, score_es, score_de, score_fr) THEN 'en'
        WHEN score_es = GREATEST(score_en, score_es, score_de, score_fr) THEN 'es'
        WHEN score_de = GREATEST(score_en, score_es, score_de, score_fr) THEN 'de'
        ELSE 'fr'
    END AS lang_pred
FROM s
""",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", "text").transform(TX.language_id()).drop(
        "text"
    )


@query(
    "text_vocabulary_top100",
    """
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
    FROM documents
),
v AS (
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM tok GROUP BY 1
)
SELECT token, n_occurrences, n_docs
FROM v
ORDER BY n_occurrences DESC, token
LIMIT 100
""",
)
def text_vocabulary_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: the 100 most frequent tokens with total
    occurrences and document frequency (ties broken by token, so the
    limit frontier is deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        TX.token_frequencies(docs)
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(100)
    )


@query(
    "text_tfidf_top_terms",
    """
WITH tok AS (
    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
    FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n_corpus FROM documents),
scored AS (
    SELECT tf.doc_id, tf.token,
           FLOOR((tf.tf * n.n_corpus / dfreq.df) * 10000.0 + 0.5) / 10000.0
               AS tfidf
    FROM tf JOIN dfreq USING (token) CROSS JOIN n
    WHERE tf.doc_id % 100 = 0
),
r AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
    FROM scored
)
SELECT doc_id, token, tfidf FROM r WHERE rn <= 3
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per probe document (doc_id % 100 = 0)
    by rational-idf tf-idf (tf · N / df — log-free so the oracle
    reproduces the rounded score exactly). The probe predicate applies
    to the tf branch only; df and N stay corpus-wide."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.tf_idf_top_terms(docs, k=3, probe=F.col("doc_id") % 100 == 0)


@query(
    "text_fingerprints",
    """
SELECT
    doc_id,
    md5(text) AS fp_exact,
    md5(array_to_string(list_sort(list_distinct(string_split_regex(text, '\\s+'))), ' '))
        AS fp_bow,
    list_aggregate(
        list_transform(
            generate_series(1, GREATEST(length(text) - 7, 1)),
            i -> md5(substring(text, i, 8))
        ),
        'min'
    ) AS fp_minshingle
FROM documents
""",
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "text").transform(TX.fingerprints()).drop("text")
