"""End-to-end corpus-curation pipeline query.

The flagship composition for the LLM-training-data surface: one
DataFrame plan chaining the text-analysis and dedup operators the way a
real corpus-curation job runs them —

    language-ID filter → quality-score filter → exact dedup →
    bag-of-words near-dup removal → per-doc token stats

Every stage is JVM built-ins (no Python in the plan), so Catalyst fuses
the whole chain into a scan → project/filter → two keyed windows
pipeline: filters and column pruning push into the parquet scan, the
fingerprints are the only shuffle keys (never the document body), and
the two dedup windows are the D1 deterministic keep-first shape. At
100 TB the plan's shuffle volume is two passes over the (already
language/quality-pruned) survivor set keyed on 32-byte digests.

Fully oracle-paired: each stage reuses arithmetic already certified by
its standalone query (text_language_id, text_quality_score,
text_fingerprints, text_token_stats, dedup_exact_documents), so the
DuckDB oracle recomputes the whole pipeline exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import relational as R
from rentals_data_pipeline_spark.operators import text as TX
from rentals_data_pipeline_spark.plans.catalog import query
from rentals_data_pipeline_spark.sources.tables import load_table

QUALITY_FLOOR = 0.35

_EN = ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"])

_LANG_SCORES_SQL = ",\n        ".join(
    "CAST(len(list_filter(toks, t -> t IN ({words}))) AS DOUBLE)"
    " / NULLIF(CAST(len(toks) AS DOUBLE), 0.0) AS score_{lang}".format(
        words=", ".join(f"'{w}'" for w in ws), lang=lang
    )
    for lang, ws in TX.STOPWORDS.items()
)


@query(
    "pipeline_corpus_curation",
    f"""
WITH t AS (
    SELECT doc_id, text, string_split_regex(text, '\\s+') AS toks
    FROM documents
),
s AS (
    SELECT doc_id, text, toks,
        {_LANG_SCORES_SQL}
    FROM t
),
en AS (
    -- language_id predicts 'en': best score positive and en ties win
    SELECT doc_id, text, toks FROM s
    WHERE GREATEST(score_en, score_es, score_de, score_fr) > 0
      AND score_en = GREATEST(score_en, score_es, score_de, score_fr)
),
q AS (
    SELECT doc_id, text, toks,
        FLOOR((0.4 * LEAST(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                        / NULLIF(CAST(len(toks) AS DOUBLE), 0.0))
               + 0.3 * (CAST(len(list_filter(toks, t -> t IN ({_EN}))) AS DOUBLE)
                        / NULLIF(CAST(len(toks) AS DOUBLE), 0.0)))
              * 10000.0 + 0.5) / 10000.0 AS quality
    FROM en
),
qf AS (SELECT * FROM q WHERE quality >= {QUALITY_FLOOR}),
fp AS (
    SELECT *,
        md5(text) AS fp_exact,
        md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp_bow
    FROM qf
),
d1 AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp_exact ORDER BY doc_id) AS rn1
    FROM fp
),
d2 AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp_bow ORDER BY doc_id) AS rn2
    FROM d1 WHERE rn1 = 1
)
SELECT
    doc_id,
    quality,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT)
        AS n_bpe_units
FROM d2 WHERE rn2 = 1
""",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated English sub-corpus: predicted-English docs above the
    quality floor, exact-deduped then bag-of-words near-dup-removed
    (deterministic keep-first by doc_id at both stages), with per-doc
    token statistics."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.transform(TX.language_id())
        .where(F.col("lang_pred") == "en")
        .transform(TX.quality_score())
        .where(F.col("quality") >= QUALITY_FLOOR)
        .transform(TX.fingerprints())
        .transform(R.dedup_keep_first(["fp_exact"], [F.col("doc_id")]))
        .transform(R.dedup_keep_first(["fp_bow"], [F.col("doc_id")]))
        .transform(TX.token_stats())
        .select("doc_id", "quality", "n_tokens", "n_bpe_units")
    )
