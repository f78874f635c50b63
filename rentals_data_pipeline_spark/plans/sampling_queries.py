"""Catalog queries for deterministic sampling / dataset splitting.

Every query here is fully oracle-paired: the md5-bucket arithmetic
(operators/sampling.py::hash_bucket) is reproduced in DuckDB as
``('0x' || substr(md5(seed || key), 1, 8))::BIGINT % n``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import sampling as SP
from rentals_data_pipeline_spark.plans.catalog import query
from rentals_data_pipeline_spark.sources.tables import load_table

_BUCKET = (
    "(('0x' || substr(md5({seed} || CAST({key} AS VARCHAR)), 1, 8))::BIGINT"
    " % 10000)"
)


@query(
    "sample_split_documents",
    f"""
WITH b AS (
    SELECT doc_id,
           {_BUCKET.format(seed="'split'", key="doc_id")} AS bucket
    FROM documents
)
SELECT
    doc_id,
    CASE WHEN bucket < 8000 THEN 'train'
         WHEN bucket < 9000 THEN 'val'
         ELSE 'test' END AS split
FROM b
""",
)
def sample_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment for every document —
    deterministic by content-independent key hash, so assignments are
    stable across runs, partitionings, and corpus growth."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.transform(
        SP.train_val_test_split("doc_id", (0.8, 0.1, 0.1))
    ).select("doc_id", "split")


@query(
    "sample_deterministic_documents",
    f"""
SELECT doc_id
FROM documents
WHERE {_BUCKET.format(seed="''", key="doc_id")} < 1000
""",
)
def sample_deterministic_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeatable 10% Bernoulli-style sample of the corpus: the
    hash-bucket predicate is row-local, so it pushes to the scan and
    non-sampled rows never leave it."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.transform(SP.deterministic_sample("doc_id", 0.10))


@query(
    "sample_stratified_events",
    f"""
WITH r AS (
    SELECT event_id, event_type,
           ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY {_BUCKET.format(seed="''", key="event_id")}, event_id
           ) AS rn
    FROM events
)
SELECT event_id, event_type FROM r WHERE rn <= 100
""",
)
def sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum reservoir: the 100 events per
    event_type with the smallest (hash, id) — per-class downsampling
    that runs as WindowGroupLimit (map-side top-k before the one
    shuffle)."""
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    return events.transform(SP.stratified_take(["event_type"], "event_id", 100))


@query(
    "sample_weighted_documents",
    """
WITH d AS (
    SELECT doc_id, length(text) AS weight,
        (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
            / 4294967296.0 AS u
    FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
)
SELECT doc_id, CAST(weight AS BIGINT) AS weight
FROM d
ORDER BY ln(u) / weight DESC, doc_id ASC
LIMIT 50
""",
)
def sample_weighted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling for training data: 50 documents drawn
    without replacement with probability proportional to length
    (Efraimidis–Spirakis priorities over md5-derived uniforms —
    deterministic across runs, partitionings, and engines). The common
    curation move of oversampling long/high-quality documents, as a
    repeatable operator.

    Oracle-paired since round 10: ln() appears ONLY in the ranking
    key, never in an output column — the result is (doc_id, integer
    weight), hash-exact by construction. A cross-engine ln()
    last-bit divergence could only flip the selected set if two
    priorities at the rank-50 cutoff were within ~1 ulp of each other
    (adjacent-priority gaps here are ~1e-4; the discipline's ln ban
    is about emitted VALUES, which this query has none of)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("weight")
    )
    return docs.transform(
        SP.weighted_sample_topk("doc_id", "weight", 50)
    ).select("doc_id", "weight")


@query(
    "sample_corpus_mixture",
    f"""
WITH g AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
w AS (
    SELECT lang, n,
        FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS w6
    FROM g
),
t AS (
    SELECT SUM(CAST(w6 AS DECIMAL(28,6))) AS tw, SUM(n) AS ntot FROM w
),
r AS (
    SELECT lang,
        CAST(FLOOR(
            LEAST(1.0,
                  0.3 * CAST(t.ntot AS DOUBLE) * w.w6
                  / CAST(t.tw AS DOUBLE) / CAST(w.n AS DOUBLE))
            * 10000.0) AS INTEGER) AS cut
    FROM w CROSS JOIN t
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE {_BUCKET.format(seed="'mix'", key="d.doc_id")} < r.cut
""",
)
def sample_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-mixed (alpha = 0.5) corpus sample by language: the
    multilingual rebalancing recipe — rates proportional to
    sqrt(n_lang)/n_lang, expected volume pinned at 30% of the corpus —
    so the dominant language is down-sampled hardest while rare
    languages keep most rows (operators/sampling.py::
    temperature_mixture_sample). The rate table is |langs| rows
    broadcast back; membership is the deterministic md5 hash bucket,
    so the oracle replays the sample row-for-row."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return docs.transform(
        SP.temperature_mixture_sample("doc_id", "lang", 0.3, "mix")
    ).select("doc_id", "lang")


@query(
    "sample_stratified_split_embeddings",
    """
WITH r AS (
    SELECT vec_id, label,
        ROW_NUMBER() OVER (
            PARTITION BY label
            ORDER BY md5('strat' || CAST(vec_id AS VARCHAR))
        ) AS rn,
        COUNT(*) OVER (PARTITION BY label) AS n
    FROM embeddings
)
SELECT vec_id, label,
    CASE WHEN rn <= (n * 8) // 10 THEN 'train'
         WHEN rn <= (n * 9) // 10 THEN 'val'
         ELSE 'test' END AS split
FROM r
""",
)
def sample_stratified_split_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Label-balanced train/val/test split
    (operators/sampling.py::stratified_split): within each label, rows
    rank by md5 and integer thresholds of the label size cut the
    splits — EVERY class lands within one row of 80/10/10, where the
    plain hash split only hits fractions in expectation (a 44-row
    class can draw 35/2/7). One window shuffle on the label; md5
    ordering makes the assignment deterministic, engine-reproducible,
    and layout-invariant, so the oracle replays it row-for-row."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label").transform(
        SP.stratified_split("vec_id", "label")
    )


@query(
    "sample_balanced_labels",
    """
WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
m AS (SELECT MIN(n) AS min_n FROM c),
r AS (
    SELECT vec_id, label,
        ROW_NUMBER() OVER (
            PARTITION BY label
            ORDER BY md5('bal' || CAST(vec_id AS VARCHAR)), vec_id
        ) AS rn
    FROM embeddings
)
SELECT vec_id, label FROM r CROSS JOIN m WHERE rn <= m.min_n
""",
)
def sample_balanced_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every label keeps exactly
    min-class-size rows — the rebalancing a classifier's training set
    applies before fitting, deterministic (md5 order, id tiebreak) so
    the same rows survive on every run, engine, and layout. The
    per-label take executes as WindowGroupLimit (map-side partial
    top-k); the 1-row min-size broadcast closes the dynamic limit.
    Unlike sample_stratified_events' fixed n-per-stratum, the limit
    here is DERIVED from the data — the auto-parameter pattern."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    m = c.agg(F.min("n").alias("min_n"))
    from pyspark.sql import Window as W7

    h = F.md5(F.concat(F.lit("bal"), F.col("vec_id").cast("string")))
    w = W7.partitionBy("label").orderBy(h, "vec_id")
    return (
        emb.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .where(F.col("rn") <= F.col("min_n"))
        .select("vec_id", "label")
    )


@query(
    "sample_dsir_importance",
    r"""
WITH d AS (
    SELECT doc_id, text, (doc_id % 7 = 0) AS tgt FROM documents
),
toks AS (
    SELECT doc_id, tgt, string_split_regex(text, '\s+') AS t FROM d
),
grams AS (
    SELECT doc_id, tgt,
        (('0x' || substr(md5('dsir' || (t[i] || ' ' || t[i + 1])), 1, 8))::BIGINT
         % 4096) AS b
    FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
),
cnt AS (
    SELECT b,
        SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
        SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS cr
    FROM grams GROUP BY b
),
tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM cnt),
lr AS (
    SELECT b,
        CAST(FLOOR((ln((ct + 1.0) / (nt + 4096.0))
                  - ln((cr + 1.0) / (nr + 4096.0))) * 100000000.0 + 0.5)
             / 100000000.0 AS DECIMAL(28,8)) AS lr8
    FROM cnt CROSS JOIN tot
),
doc AS (
    SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, SUM(lr8) AS s
    FROM grams g JOIN lr USING (b)
    WHERE NOT g.tgt
    GROUP BY g.doc_id
)
SELECT doc_id, n_grams,
    FLOOR(CAST(s AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS log_importance
FROM doc
""",
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores (arXiv:2302.03169) for the raw pool
    against a target slice (operators/sampling.py::dsir_log_importance)
    — the data-selection step a pretraining pipeline runs to upweight
    raw web documents that look like a curated target corpus. Target =
    every 7th document (a deterministic stand-in for the curated
    slice); every other document scores
    Σ_bigrams [ln p_target(bucket) - ln p_raw(bucket)] over 4096
    md5-hashed bigram buckets with add-1 smoothing. The per-bucket
    log-ratio is 8-dp-anchored DECIMAL so the per-doc sum is
    engine-exact (the text_unigram_logprob contract); compose with
    sample_weighted_documents (A-ES) for the paper's resampling step."""
    docs = load_table(spark, sf_dir, "documents")
    flagged = docs.select(
        "doc_id",
        "text",
        (F.col("doc_id") % 7 == 0).alias("is_target"),
    )
    return flagged.transform(SP.dsir_log_importance())
