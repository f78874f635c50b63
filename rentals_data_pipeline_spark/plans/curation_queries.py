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

from rentals_data_pipeline_spark.functions.rounding import round_half_up
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


_PREP_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, text, string_split_regex(text, '\s+') AS toks
    FROM documents
),
s AS (
    SELECT doc_id, text, toks,
        {_LANG_SCORES_SQL}
    FROM t
),
en AS (
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
rep AS (
    SELECT * FROM qf
    WHERE FLOOR(((len(toks) - len(list_distinct(toks)))
                 / CAST(len(toks) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
          <= 0.6
),
-- benchmark grams come from the RAW corpus (the eval suite is external
-- to the filters); training side = filtered survivors off the benchmark
g_all AS (
    SELECT doc_id,
        CASE WHEN len(toks) >= 5
             THEN list_distinct(list_transform(
                      generate_series(1, len(toks) - 4),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                           || ' ' || toks[i+3] || ' ' || toks[i+4]))
             ELSE [] END AS s
    FROM t
),
bm AS (
    SELECT DISTINCT u.gram
    FROM g_all, unnest(g_all.s) AS u(gram)
    WHERE g_all.doc_id % 97 = 0
),
contaminated AS (
    SELECT DISTINCT g_all.doc_id
    FROM g_all, unnest(g_all.s) AS u(gram)
    JOIN bm ON u.gram = bm.gram
    WHERE g_all.doc_id % 97 <> 0
),
clean AS (
    SELECT * FROM rep
    WHERE doc_id % 97 <> 0
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
dd AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM clean
),
survivors AS (
    SELECT doc_id, toks, len(toks) AS n, quality FROM dd WHERE rn = 1
),
c AS (
    SELECT doc_id, n, quality, i.i AS chunk_idx,
        CAST(LEAST(i.i * 56 + 64, n) - (i.i * 56 + 1) + 1 AS BIGINT)
            AS n_chunk_tokens
    FROM survivors, (SELECT unnest(range(0, 1000)) AS i) i
    WHERE n > 0 AND i.i < FLOOR((n - 1) / 56) + 1
),
sp AS (
    SELECT *,
        CASE WHEN (('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 10000) < 8000 THEN 'train'
             WHEN (('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 10000) < 9000 THEN 'val'
             ELSE 'test' END AS split
    FROM c
),
sh AS (
    SELECT *,
        ('0x' || substr(md5('pack' || COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 8))::BIGINT
            % 16 AS shard
    FROM sp
),
lb AS (
    SELECT *,
        (SUM(n_chunk_tokens) OVER (
            PARTITION BY split, shard ORDER BY doc_id, chunk_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 511) // 512
            AS local_bin,
        (SUM(n_chunk_tokens) OVER (PARTITION BY split, shard) + 511) // 512
            AS nb
    FROM sh
),
off AS (
    SELECT split, shard,
        COALESCE(SUM(nb) OVER (
            PARTITION BY split ORDER BY shard
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS shard_off
    FROM (SELECT DISTINCT split, shard, nb FROM lb)
)
SELECT lb.doc_id,
    CAST(lb.chunk_idx AS BIGINT) AS chunk_idx,
    lb.split,
    CAST(lb.local_bin + off.shard_off AS BIGINT) AS bin_id,
    lb.n_chunk_tokens,
    lb.quality
FROM lb JOIN off ON lb.split IS NOT DISTINCT FROM off.split
    AND lb.shard = off.shard
"""


@query("pipeline_training_data_prep", _PREP_ORACLE)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data release pipeline in one plan — the
    third flagship, composing six certified extension families
    end-to-end the way a data release actually ships:

        language-ID -> quality floor -> repetition filter (Gopher
        dup-token fraction) -> benchmark decontamination (5-gram
        overlap vs the held-out doc_id%97 suite) -> exact dedup ->
        64/8 chunking -> deterministic train/val/test split ->
        512-token bin packing

    Every stage reuses arithmetic its standalone query already
    certifies, so the DuckDB oracle replays the WHOLE chain and one
    hash match certifies stage ordering + composition (filters before
    decontamination, dedup after it, packing windows per split).
    Scale shape: filters fuse into the scan; decontamination moves
    only 32-byte digests (benchmark digest set broadcasts); dedup
    keys on md5; packing is two-level — md5-sharded windows per
    (split, shard) with a broadcast prefix-sum offset making bins
    contiguous per split — so no sort task ever owns a whole split
    (the round-5 verdict's 100x scale-killer, fixed by computation).
    The only fact-sized shuffles are the digest-keyed dedup, the
    shingle windows, and the (split, shard) packing exchange."""
    from rentals_data_pipeline_spark.operators import sampling as SP
    from rentals_data_pipeline_spark.operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), r"\s+")
    dup_frac = F.floor(
        (
            (F.size(toks) - F.size(F.array_distinct(toks)))
            / F.size(toks).cast("double")
        )
        * F.lit(1e4)
        + F.lit(0.5)
    ) / F.lit(1e4)
    filtered = (
        docs.transform(TX.language_id())
        .where(F.col("lang_pred") == "en")
        .transform(TX.quality_score())
        .where(F.col("quality") >= QUALITY_FLOOR)
        .where(dup_frac <= 0.6)
    )
    benchmark = docs.where(F.col("doc_id") % 97 == 0)
    train = filtered.where(F.col("doc_id") % 97 != 0)
    clean = decontaminate(train, benchmark, "doc_id", "text", n=5)
    survivors = (
        clean.withColumn("fp_exact", F.md5("text"))
        .transform(R.dedup_keep_first(["fp_exact"], [F.col("doc_id")]))
    )
    # ONE linear plan: quality rides the chunk explode (keep_cols) and
    # the split label is a row-local hash of doc_id — the former
    # two-branch form (chunks JOIN split) recomputed the whole
    # filter+decontaminate subtree once per branch
    chunks = survivors.select("doc_id", "quality", "text").transform(
        TX.chunk_documents(chunk_tokens=64, overlap=8, keep_cols=("quality",))
    )
    # Two-level packing reads its input twice (running-sum windows +
    # the shard-totals aggregate); truncate the lineage so the
    # filter->decontaminate->dedup->chunk chain above — joins and
    # shingle windows — evaluates ONCE (the pagerank localCheckpoint
    # pattern; on a durable cluster use checkpoint() to shared storage
    # for executor-loss tolerance). Project down FIRST: a checkpoint
    # materializes every column it is handed, and nothing downstream
    # needs chunk_text — pruning cannot push through an RDD boundary.
    packed = (
        chunks.transform(SP.train_val_test_split("doc_id", (0.8, 0.1, 0.1)))
        .select("doc_id", "chunk_idx", "n_chunk_tokens", "quality", "split")
        .localCheckpoint(eager=True)
        .transform(
            TX.pack_chunks_into_bins(
                bin_tokens=512,
                order_by=["doc_id", "chunk_idx"],
                partition_by=["split"],
                n_shards=16,
            )
        )
    )
    return packed.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "split",
        "bin_id",
        "n_chunk_tokens",
        "quality",
    )


_SEMANTIC_CURATION_ORACLE_TEMPLATE = """
WITH {semdedup_ctes},
keptv AS (
    SELECT a.vec_id FROM a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    WHERE d.vec_id IS NULL
),
t AS (
    SELECT doc.doc_id, doc.text,
           string_split_regex(doc.text, '\\s+') AS toks
    FROM documents doc JOIN keptv k ON doc.doc_id = k.vec_id
),
q AS (
    SELECT doc_id,
        FLOOR((0.4 * LEAST(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                        / NULLIF(CAST(len(toks) AS DOUBLE), 0.0))
               + 0.3 * (CAST(len(list_filter(toks, x -> x IN ({en}))) AS DOUBLE)
                        / NULLIF(CAST(len(toks) AS DOUBLE), 0.0)))
              * 10000.0 + 0.5) / 10000.0 AS quality
    FROM t
)
SELECT doc_id, quality,
    CASE WHEN (('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000) < 8000 THEN 'train'
         WHEN (('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 10000) < 9000 THEN 'val'
         ELSE 'test' END AS split
FROM q WHERE quality >= {floor}
"""


def _semantic_curation_oracle() -> str:
    from rentals_data_pipeline_spark.plans.similarity_queries import (
        SEMDEDUP_CORE_CTES,
    )

    return _SEMANTIC_CURATION_ORACLE_TEMPLATE.format(
        semdedup_ctes=SEMDEDUP_CORE_CTES, en=_EN, floor=QUALITY_FLOOR
    )


@query("pipeline_semantic_curation", _semantic_curation_oracle())
def pipeline_semantic_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup-paper release workflow (arXiv:2303.09540 §4), cross-
    modality: semantically dedup the EMBEDDINGS table (fixed-seed 8-way
    clustering, cosine > 0.35, keep-the-centroid-outlier —
    operators/similarity.py::semdedup_keep), keep only the DOCUMENTS
    whose vectors survived (left-semi on doc_id = vec_id; docs without
    an embedding are out of scope by definition), gate the survivors on
    the certified quality score, and split train/val/test by the
    leakage-free md5-bucket hash. One hash match certifies the
    embedding-side dedup, the cross-table handoff, the quality
    arithmetic, and the split thresholds end-to-end.

    Plan shape: semdedup's one cluster exchange + one matmul stage; the
    kept-id sliver broadcasts into the documents scan (the corpus side
    never shuffles for the handoff); quality + split are codegen map
    stages fused into that scan."""
    from rentals_data_pipeline_spark.operators import sampling as SP
    from rentals_data_pipeline_spark.operators import similarity as SIM

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = (
        SIM.semdedup_keep(emb, n_clusters=8, threshold=0.35)
        .where(F.col("kept"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    return (
        docs.join(F.broadcast(kept), "doc_id", "left_semi")
        .transform(TX.quality_score())
        .where(F.col("quality") >= QUALITY_FLOOR)
        .transform(SP.train_val_test_split("doc_id", (0.8, 0.1, 0.1)))
        .select("doc_id", "quality", "split")
    )


@query(
    "pipeline_curation_funnel_by_source",
    f"""
WITH t AS (
    SELECT doc_id, source, text,
        string_split_regex(text, '\\s+') AS toks
    FROM documents
),
s AS (
    SELECT doc_id, source, text, toks,
        {_LANG_SCORES_SQL}
    FROM t
),
f AS (
    SELECT doc_id, source,
        COALESCE(CAST(len(toks) AS BIGINT), 0) AS n_toks,
        COALESCE(GREATEST(score_en, score_es, score_de, score_fr) > 0
                 AND score_en = GREATEST(score_en, score_es,
                                         score_de, score_fr),
                 FALSE) AS lang_pass,
        COALESCE(GREATEST(score_en, score_es, score_de, score_fr) > 0
                 AND score_en = GREATEST(score_en, score_es,
                                         score_de, score_fr)
                 AND FLOOR((0.4 * LEAST(CAST(len(toks) AS DOUBLE) / 100.0,
                                        1.0)
                     + 0.3 * (CAST(len(list_distinct(toks)) AS DOUBLE)
                              / NULLIF(CAST(len(toks) AS DOUBLE), 0.0))
                     + 0.3 * (CAST(len(list_filter(toks,
                                                   t -> t IN ({_EN})))
                                   AS DOUBLE)
                              / NULLIF(CAST(len(toks) AS DOUBLE), 0.0)))
                     * 10000.0 + 0.5) / 10000.0 >= {QUALITY_FLOOR},
                 FALSE) AS elig,
        md5(text) AS fp
    FROM s
),
w AS (
    SELECT *,
        MIN(CASE WHEN elig THEN doc_id END)
            OVER (PARTITION BY fp) AS first_elig
    FROM f
),
fin AS (
    SELECT *, (elig AND doc_id = first_elig) AS final_pass FROM w
)
SELECT source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN lang_pass THEN 1 ELSE 0 END) AS BIGINT)
        AS n_lang_pass,
    CAST(SUM(CASE WHEN elig THEN 1 ELSE 0 END) AS BIGINT)
        AS n_quality_pass,
    CAST(SUM(CASE WHEN final_pass THEN 1 ELSE 0 END) AS BIGINT)
        AS n_docs_out,
    CAST(SUM(n_toks) AS BIGINT) AS tokens_in,
    CAST(SUM(CASE WHEN final_pass THEN n_toks ELSE 0 END) AS BIGINT)
        AS tokens_out,
    FLOOR((CAST(SUM(CASE WHEN final_pass THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0
        AS survival_rate
FROM fin
GROUP BY source
""",
)
def pipeline_curation_funnel_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source curation funnel — the dataset-card table every corpus
    release publishes (docs/tokens in, survivors of each gate, final
    survival rate per source), for the same gate chain
    pipeline_corpus_curation certifies: predicted-English → quality
    floor → exact keep-first dedup.

    Design point: the funnel is COLUMNS, not jobs — every stage
    predicate computes as a flag in one projection over one scan, the
    exact-dedup survivor is a window MIN over md5(text) restricted to
    eligible docs (keep-first by doc_id among docs that passed the
    upstream gates, matching the sequential pipeline's semantics), and
    the report is ONE aggregation on source. Total movement at 100 TB:
    one 16-byte-digest-keyed window shuffle + one |sources|-row agg —
    vs the naive per-stage count() chain that re-scans the corpus once
    per gate. Every stage reuses arithmetic certified by its
    standalone query (text_language_id, text_quality_score,
    dedup_exact_documents), so the DuckDB oracle replays the whole
    funnel; NULL-text docs count in n_docs, fail every gate
    (COALESCE(flag, FALSE) on both engines), and contribute 0 tokens."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    from pyspark.sql import Window

    scored = docs.transform(TX.language_id()).transform(TX.quality_score())
    lang_pass = F.coalesce(F.col("lang_pred") == "en", F.lit(False))
    elig = F.coalesce(
        (F.col("lang_pred") == "en")
        & (F.col("quality") >= QUALITY_FLOOR),
        F.lit(False),
    )
    flags = scored.select(
        "doc_id",
        "source",
        F.coalesce(
            F.size(TX.tokens(F.col("text"))).cast("long"), F.lit(0)
        ).alias("n_toks"),
        lang_pass.alias("lang_pass"),
        elig.alias("elig"),
        F.md5("text").alias("fp"),
    )
    first_elig = F.min(
        F.when(F.col("elig"), F.col("doc_id"))
    ).over(Window.partitionBy("fp"))
    fin = flags.withColumn(
        "final_pass", F.col("elig") & (F.col("doc_id") == first_elig)
    )
    one = F.lit(1)
    zero = F.lit(0)
    return (
        fin.groupBy("source")
        .agg(
            F.count(one).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("lang_pass"), one).otherwise(zero))
            .cast("long")
            .alias("n_lang_pass"),
            F.sum(F.when(F.col("elig"), one).otherwise(zero))
            .cast("long")
            .alias("n_quality_pass"),
            F.sum(F.when(F.col("final_pass"), one).otherwise(zero))
            .cast("long")
            .alias("n_docs_out"),
            F.sum("n_toks").cast("long").alias("tokens_in"),
            F.sum(
                F.when(F.col("final_pass"), F.col("n_toks")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("tokens_out"),
            round_half_up(
                F.sum(
                    F.when(F.col("final_pass"), one).otherwise(zero)
                ).cast("double")
                / F.count(one).cast("double"),
                4,
            ).alias("survival_rate"),
        )
    )
