"""Near-duplicate deduplication for LLM-data pipelines.

Three families over a ``documents``-shaped table, all built from JVM-side
built-ins (split / higher-order array functions / md5) so candidate
generation stays in whole-stage codegen:

- **MinHash + LSH banding** (``minhash_signature`` / ``lsh_candidate_pairs``
  / ``minhash_near_dup_pairs``): k-gram shingles → k lexicographic-min
  md5 signatures → band keys → bucket self-join → exact Jaccard verify.
  The O(n²) pair space is never materialized; only same-bucket
  candidates are verified. For a pair with Jaccard j the miss
  probability is (1 - j^rows)^bands — with the default 16 bands × 2
  rows, j ≥ 0.9 pairs are missed with p < 4e-12, so results are
  hash-comparable against an exhaustive oracle.

- **SimHash** (``simhash``, ``simhash_hamming_pairs``): 16-bit sign-of-sums
  fingerprint over token hashes. Pairing uses pigeonhole blocking: the
  16 bits split into 4 blocks of 4; any pair within Hamming distance 3
  must agree on ≥ 1 whole block, so recall is exactly 1 (deterministic,
  unlike MinHash banding) while candidate generation is an equi-join.

- **Exact / n-gram Jaccard** primitives (``token_ngram_set``,
  ``jaccard``): the verification kernel shared by both families. Exact
  dedup itself is ``relational.dedup_keep_first`` (reference D1,
  jobs/transform.py:107-119).

Hashes are md5 (not xxhash64) so the DuckDB oracle reproduces the exact
same values; md5 here is a partitioning/fingerprint hash, not crypto.

No reference counterpart (the reference only has exact key dedup,
jobs/transform.py:119); this is the mandated LLM-pipeline extension
surface (BASELINE.json "dedup").
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.functions.rounding import round_half_up

Op = Callable[[DataFrame], DataFrame]

_HIGH_NIBBLE = tuple("89abcdef")  # hex digits with the high bit set


def token_ngram_set(text_col: Column, n: int = 3) -> Column:
    """Distinct word-level n-gram shingles of a text column.

    Word n-grams (not char shingles) because the downstream Jaccard is
    over the shingle *set*; n=3 sharpens near-dup separation on
    small-vocabulary corpora where unigram sets saturate.
    """
    toks = F.split(text_col, r"\s+")
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: for each seed s, the lexicographic min of
    md5(s || ':' || shingle) over the shingle set (array<string> of
    length ``num_hashes``). Lexicographic min over hex strings is a
    valid uniform min-hash family; md5 keeps it oracle-reproducible."""
    def seeded_min(s: int) -> Column:
        # closure factory: a `lambda g, s=s` would be read by pyspark as
        # a 2-arg (element, index) lambda, binding s to the index column
        return F.array_min(
            F.transform(shingles, lambda g: F.md5(F.concat(F.lit(f"{s}:"), g)))
        )

    return F.array(*[seeded_min(s) for s in range(num_hashes)])


def band_keys(sig: Column, bands: int = 16, rows: int = 2) -> Column:
    """LSH band keys: md5 of each band's concatenated signature rows."""
    return F.array(
        *[
            F.md5(F.concat(*[F.element_at(sig, b * rows + r + 1) for r in range(rows)]))
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    banded: DataFrame, id_col: str, band_col: str = "band", key_col: str = "band_key"
) -> DataFrame:
    """Bucket self-join: pairs sharing ≥1 (band, key) bucket.

    Input is the exploded (id, band, band_key) table; the join shuffles
    on (band, band_key) — at 100 TB each bucket is tiny (near-dup
    clusters), so this is an equi-join on a high-cardinality key, not a
    cross join. Output pairs are distinct with id_a < id_b.
    """
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=[band_col, key_col])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard(set_a: Column, set_b: Column) -> Column:
    """|A ∩ B| / |A ∪ B| as double (null-safe: empty union → null)."""
    inter = F.size(F.array_intersect(set_a, set_b)).cast("double")
    union = F.size(F.array_union(set_a, set_b)).cast("double")
    return inter / F.nullif(union, F.lit(0.0))


def minhash_near_dup_pairs(
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    rows: int = 2,
    threshold: float = 0.5,
    scale: int = 4,
) -> Callable[[DataFrame], DataFrame]:
    """Full near-dup pipeline: shingle → MinHash → LSH buckets →
    candidate pairs → exact-Jaccard verify (> threshold).

    Returns (id_a, id_b, jaccard) with jaccard rounded for stable
    cross-engine hashing. The shingle sets are carried through the
    candidate join (array columns) so verification needs no re-scan of
    the text.
    """

    def _apply(df: DataFrame) -> DataFrame:
        shingled = df.select(
            F.col(id_col), token_ngram_set(F.col(text_col), ngram).alias("shingles")
        )
        sig = shingled.select(
            id_col,
            "shingles",
            band_keys(minhash_signature(F.col("shingles"), num_hashes), bands, rows).alias(
                "bands"
            ),
        )
        banded = sig.select(
            id_col, F.posexplode("bands").alias("band", "band_key")
        )
        pairs = lsh_candidate_pairs(banded, id_col)
        sets = shingled  # (id, shingles)
        verified = (
            pairs.join(
                sets.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("set_a")),
                "id_a",
            )
            .join(
                sets.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("set_b")),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                round_half_up(jaccard(F.col("set_a"), F.col("set_b")), scale).alias(
                    "jaccard"
                ),
            )
            .where(F.col("jaccard") > threshold)
        )
        return verified

    return _apply


def simhash(text_col: Column, nbits: int = 16) -> Column:
    """SimHash fingerprint as an ``nbits``-char '0'/'1' string.

    Bit i is the sign of Σ_tokens (±1), where the ±1 is the high bit of
    hex digit i of md5(token) (each md5 nibble is uniform, and its high
    bit is an unbiased coin). Token multiplicity is kept — SimHash
    weights by term frequency. A string (not a long) so the oracle SQL
    stays engine-portable.
    """
    if nbits > 32:
        raise ValueError("md5 yields 32 hex digits; nbits must be <= 32")
    md5s = F.transform(F.split(text_col, r"\s+"), F.md5)

    def bit_sum(i: int) -> Column:
        # closure factory (not a default arg: pyspark inspects lambda
        # arity, so `lambda acc, h, i=i` would read as a 3-arg merge fn)
        def merge(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.substring(h, i + 1, 1).isin(*_HIGH_NIBBLE), 1
            ).otherwise(-1)

        return F.aggregate(md5s, F.lit(0), merge)

    bits = [
        F.when(bit_sum(i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(nbits)
    ]
    return F.concat(*bits)


def hamming(a: Column, b: Column, nbits: int = 16) -> Column:
    """Hamming distance between two equal-length bit strings."""
    diffs = [
        F.when(F.substring(a, i + 1, 1) != F.substring(b, i + 1, 1), 1).otherwise(0)
        for i in range(nbits)
    ]
    total = diffs[0]
    for d in diffs[1:]:
        total = total + d
    return total


def simhash_hamming_pairs(
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 16,
    blocks: int = 4,
    max_distance: int = 3,
) -> Callable[[DataFrame], DataFrame]:
    """All pairs within SimHash Hamming distance ``max_distance``.

    Candidate generation by pigeonhole blocking: split the fingerprint
    into ``blocks`` equal substrings; a pair with ≤ blocks-1 differing
    bits must match on at least one whole block, so an equi-join on
    (block_idx, block_value) has recall exactly 1 for
    max_distance ≤ blocks - 1. Exact Hamming verify runs only on
    candidates. Returns (id_a, id_b, hamming_distance).
    """
    if max_distance > blocks - 1:
        raise ValueError("pigeonhole blocking needs max_distance <= blocks - 1")
    width = nbits // blocks

    def _apply(df: DataFrame) -> DataFrame:
        hashed = df.select(F.col(id_col), simhash(F.col(text_col), nbits).alias("sh"))
        blocked = hashed.select(
            id_col,
            "sh",
            F.posexplode(
                F.array(
                    *[F.substring("sh", b * width + 1, width) for b in range(blocks)]
                )
            ).alias("block", "block_val"),
        )
        a = blocked.alias("a")
        b = blocked.alias("b")
        pairs = (
            a.join(b, on=["block", "block_val"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.sh").alias("sh_a"),
                F.col("b.sh").alias("sh_b"),
            )
            .distinct()
        )
        return (
            pairs.withColumn(
                "hamming_distance", hamming(F.col("sh_a"), F.col("sh_b"), nbits)
            )
            .where(F.col("hamming_distance") <= max_distance)
            .select("id_a", "id_b", "hamming_distance")
        )

    return _apply
