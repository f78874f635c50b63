"""Golden-value unit tests for the text-analysis operators.

Hand-computed expectations in the reference's golden style
(reference tests/test_transform.py:90-108).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        ("d1", "the cat sat on the mat"),          # 6 tokens, 5 distinct
        ("d2", "el gato y la casa de que"),        # spanish stopwords
        ("d3", "zzz qqq xxx"),                     # no stopwords anywhere
        ("d4", "a b a b a b"),                     # repetition
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_stats_golden(docs_df):
    out = {r["doc_id"]: r for r in docs_df.transform(TX.token_stats()).collect()}
    assert out["d1"]["n_tokens"] == 6
    assert out["d1"]["n_distinct_tokens"] == 5
    # "the cat sat on the mat" -> 6 letter-runs, no digits/punct
    assert out["d1"]["n_bpe_units"] == 6
    # chars without spaces = 17, / 6 tokens = 2.8333
    assert out["d1"]["avg_token_len"] == pytest.approx(2.8333)
    assert out["d4"]["n_distinct_tokens"] == 2


def test_quality_score_golden(docs_df):
    out = {r["doc_id"]: r for r in docs_df.transform(TX.quality_score()).collect()}
    # d1: n=6, ttr=5/6, sw=2/6 ("the" twice) ->
    # 0.4*min(6/100,1) + 0.3*(5/6) + 0.3*(2/6) = 0.024 + 0.25 + 0.1
    assert out["d1"]["quality"] == pytest.approx(0.374)
    # d3: n=3, ttr=1, sw=0 -> 0.4*0.03 + 0.3 = 0.312
    assert out["d3"]["quality"] == pytest.approx(0.312)


def test_language_id(docs_df):
    out = {r["doc_id"]: r["lang_pred"] for r in docs_df.transform(TX.language_id()).collect()}
    assert out["d1"] == "en"
    assert out["d2"] == "es"
    assert out["d3"] == "unknown"


def test_fingerprints_dup_detection(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy dog"),   # exact dup of a
        ("c", "dog lazy the over jumps fox brown quick the"),   # same bag of words
        ("d", "completely different text with other words"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in df.transform(TX.fingerprints()).collect()}
    assert out["a"]["fp_exact"] == out["b"]["fp_exact"]
    assert out["a"]["fp_exact"] != out["c"]["fp_exact"]
    assert out["a"]["fp_bow"] == out["c"]["fp_bow"]
    assert out["a"]["fp_bow"] != out["d"]["fp_bow"]
    # exact dups always share the min-shingle fingerprint
    assert out["a"]["fp_minshingle"] == out["b"]["fp_minshingle"]


def test_token_frequencies_golden(spark):
    rows = [
        (1, "a b a"),
        (2, "a c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["token"]: r for r in TX.token_frequencies(df).collect()}
    assert out["a"]["n_occurrences"] == 3 and out["a"]["n_docs"] == 2
    assert out["b"]["n_occurrences"] == 1 and out["b"]["n_docs"] == 1
    assert out["c"]["n_occurrences"] == 1 and out["c"]["n_docs"] == 1


def test_tf_idf_top_terms_golden(spark):
    """tf-idf = tf * N / df (rational idf). Corpus of 4 docs: 'rare'
    appears twice in doc 1 only -> 2*4/1 = 8.0, beating the ubiquitous
    'common' (1*4/4 = 1.0)."""
    rows = [
        (1, "common rare rare"),
        (2, "common x"),
        (3, "common y"),
        (4, "common z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    top = TX.tf_idf_top_terms(df, k=1).collect()
    by_doc = {r["doc_id"]: r for r in top}
    assert by_doc[1]["token"] == "rare" and by_doc[1]["tfidf"] == 8.0
    # docs 2-4: their unique token (4.0) beats 'common' (1.0)
    assert by_doc[2]["token"] == "x" and by_doc[2]["tfidf"] == 4.0


def test_tf_idf_probe_keeps_corpus_wide_df(spark):
    """Restricting ranking to a probe set must not change the scores:
    df and N stay corpus-wide."""
    rows = [
        (1, "common rare rare"),
        (2, "common x"),
        (3, "common y"),
        (4, "common z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = {
        (r["doc_id"], r["token"]): r["tfidf"]
        for r in TX.tf_idf_top_terms(df, k=2).collect()
        if r["doc_id"] == 1
    }
    probed = {
        (r["doc_id"], r["token"]): r["tfidf"]
        for r in TX.tf_idf_top_terms(df, k=2, probe=F.col("doc_id") == 1).collect()
    }
    assert probed == full and len(probed) == 2


def test_chunk_documents_overlap_and_tail(spark):
    """10 tokens, chunks of 4 with overlap 1 (stride 3): starts at
    tokens 1,4,7,10 -> windows [1-4],[4-7],[7-10],[10] (partial tail)."""
    text = " ".join(f"w{i}" for i in range(1, 11))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        for r in df.transform(
            TX.chunk_documents(chunk_tokens=4, overlap=1)
        ).collect()
    )
    assert rows == [
        (0, "w1 w2 w3 w4", 4),
        (1, "w4 w5 w6 w7", 4),
        (2, "w7 w8 w9 w10", 4),
        (3, "w10", 1),
    ]


def test_pack_chunks_bins_are_contiguous_and_bounded(spark):
    """Boundary packing: bins contiguous per shard, each bin's total
    under budget + one max chunk, and assignment repartition-stable."""
    rows = [(d, i, 60) for d in range(4) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_idx", "n_chunk_tokens"])
    pack = TX.pack_chunks_into_bins(
        bin_tokens=128, order_by=["doc_id", "chunk_idx"]
    )
    out = df.transform(pack).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r["n_chunk_tokens"])
    # contiguous ids from 1
    assert sorted(by_bin) == list(range(1, len(by_bin) + 1))
    for tot in (sum(v) for v in by_bin.values()):
        assert tot <= 128 + 60  # budget + <1 chunk overshoot
    # layout invariance
    out2 = df.repartition(7).transform(pack).collect()
    assert {(r["doc_id"], r["chunk_idx"], r["bin_id"]) for r in out} == {
        (r["doc_id"], r["chunk_idx"], r["bin_id"]) for r in out2
    }


def test_text_ops_handle_unicode(spark):
    """Non-ASCII text (accents, CJK, emoji) must flow through every
    text operator without crashing, with token counts by whitespace
    (codepoint-aware, not byte-based)."""
    rows = [
        (1, "café au lait — très bien"),
        (2, "深度 学习 模型"),
        (3, "emoji 🚀 test 🚀"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    stats = {r["doc_id"]: r for r in df.transform(TX.token_stats()).collect()}
    assert stats[1]["n_tokens"] == 6  # the em-dash is its own token
    assert stats[2]["n_tokens"] == 3
    assert stats[3]["n_tokens"] == 4
    # quality, language-ID, fingerprints, chunking all execute
    df.transform(TX.quality_score()).collect()
    df.transform(TX.language_id()).collect()
    fp = {r["doc_id"]: r for r in df.transform(TX.fingerprints()).collect()}
    assert len({fp[i]["fp_exact"] for i in (1, 2, 3)}) == 3
    chunks = df.transform(TX.chunk_documents(chunk_tokens=2, overlap=0)).collect()
    assert sum(1 for c in chunks if c["doc_id"] == 2) == 2  # 3 tokens -> 2 chunks


def test_redact_pii_golden(spark):
    from rentals_data_pipeline_spark.operators import text as TX

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-corp.io or call 555-0123-4567 from 10.0.0.1"),
            (2, "no pii here, just 1.2 numbers and a dot."),
            (3, "two mails x@y.com z@w.org and ip 192.168.255.255"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in df.transform(TX.redact_pii()).collect()}
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (1, 1, 1)
    assert got[1]["redacted"] == "mail [EMAIL] or call [PHONE] from [IP]"
    assert (got[2]["n_email"], got[2]["n_phone"], got[2]["n_ipv4"]) == (0, 0, 0)
    assert got[2]["redacted"] == got[2]["text"]
    assert got[3]["n_email"] == 2 and got[3]["n_ipv4"] == 1
    assert got[3]["redacted"] == "two mails [EMAIL] [EMAIL] and ip [IP]"


def test_compression_ratio_golden(spark):
    """The zlib ratio separates the three regimes the filter exists
    for, and agrees exactly with a direct zlib call on the same bytes
    (one deterministic implementation, level fixed); NULL and empty
    text yield NULL."""
    import zlib

    from rentals_data_pipeline_spark.operators.text import compression_ratio

    degenerate = "spam " * 400
    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "geese argue about parquet footers and shuffle partitions in "
        "a surprisingly eloquent committee meeting about compression"
    )
    noise = "Kj8#qZ2!mP9$wX4&vB7*nC1@hT6%rL3^yD5(sF0)gQ"
    rows = [(0, degenerate), (1, prose), (2, noise), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in df.transform(compression_ratio()).collect()
    }
    for i, t in [(0, degenerate), (1, prose), (2, noise)]:
        b = t.encode()
        assert got[i] == len(zlib.compress(b, 6)) / len(b)
    assert got[0] < 0.05 < got[1] < 0.95 < got[2]
    assert got[3] is None and got[4] is None


def test_repetition_stats_golden(spark):
    from rentals_data_pipeline_spark.operators import text as TX

    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now"),      # bigram "buy now" dominates
            (2, "all words here are distinct"),  # no repetition
            (3, "solo"),                         # < 2 tokens: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in df.transform(TX.repetition_stats()).collect()}
    # doc 1: 6 tokens, 2 distinct -> dup 4/6; bigrams: "buy now"x3,
    # "now buy"x2 of 5 total -> top 0.6
    assert got[1]["n_tokens"] == 6
    assert got[1]["dup_token_frac"] == 0.6667
    assert got[1]["top_bigram_frac"] == 0.6
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.25
    assert got[3]["top_bigram_frac"] is None


def test_gopher_rules_golden(spark):
    """Hand-built docs exercise each rule's failure mode independently."""
    from rentals_data_pipeline_spark.operators.text import gopher_rules

    long_ok = "the " + "word " * 60 + "of the end"       # passes all
    too_short = "the of and to in is a"                   # < 50 words
    no_stop = "alpha beta gamma delta " * 20              # 0 stopwords
    numeric = ("123 456 789 000 111 " * 12) + "the of"    # alpha frac low
    rows = [(1, long_ok), (2, too_short), (3, no_stop), (4, numeric)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in df.transform(gopher_rules()).collect()
    }
    assert got[1]["passes_gopher"]
    assert not got[2]["rule_word_count"] and not got[2]["passes_gopher"]
    assert not got[3]["rule_stopwords"] and got[3]["rule_word_count"]
    assert not got[4]["rule_alpha"] and got[4]["rule_stopwords"]
    # mean word length is exact-integer division rounded half-up at 4dp
    n = got[1]["n_words"]
    assert got[1]["mean_word_len"] == pytest.approx(
        (len(long_ok.replace(" ", "")) / n), abs=1e-4
    )


def test_char_entropy_closed_forms(spark):
    """Exact closed forms: single-symbol 0 bits, two equal symbols 1,
    four equal symbols 2; uniform k-ary = log2(k)."""
    from rentals_data_pipeline_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "aab")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["char_entropy_bits"]
        for r in df.transform(char_entropy()).collect()
    }
    assert got[1] == 0.0 and got[2] == 1.0 and got[3] == 2.0
    # H(2/3, 1/3) = log2(3) - 2/3  ~ 0.9183
    assert got[4] == pytest.approx(0.9183, abs=1e-4)


def test_vocab_coverage_hand_computed(spark):
    """r12: minimal-vocab coverage on a corpus small enough to check by
    hand. Frequencies: a×6, b×3, c×3, d×2, e×1 (total 15).
    - 50%: needed 8 -> a (6) + one of {b,c} (3) = 2 terms, 9 tokens
    - 90%: needed 14 -> a+b+c (12) + d (2) = 4 terms, 14 tokens
    - 95%: needed 15 (ceil 14.25) -> all 5 terms, 15 tokens
    - 99%: needed 15 -> all 5 terms
    The 50% row exercises the boundary-bucket ceil take (1 of the 2
    frequency-3 terms)."""
    from rentals_data_pipeline_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [("a a a b b c",), ("a a a b c c d d e",), (None,)],
        "text string",
    )
    got = {
        r.coverage_pct: (r.vocab_size, r.covered_tokens, r.total_tokens)
        for r in vocab_coverage(docs).collect()
    }
    assert got == {
        50: (2, 9, 15),
        90: (4, 14, 15),
        95: (5, 15, 15),
        99: (5, 15, 15),
    }
