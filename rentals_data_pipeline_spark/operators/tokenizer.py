"""Distributed BPE tokenizer training + encoding.

The missing piece between "BPE-ish token counting" (``text.py``) and a
real training-data pipeline: LEARN a byte-pair-encoding merge table
from the corpus, then segment text with it. Classic algorithm
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — public paper), re-expressed for Spark's execution
model:

- **Train on the word histogram, not the corpus.** BPE statistics are
  a function of (distinct word, frequency); the histogram is
  vocab-sized (~millions of rows at 100 TB) while the corpus is
  corpus-sized. One corpus-scale groupBy builds the histogram; every
  merge iteration after that touches only the histogram.
- **A merge is one ``regexp_replace``.** Words are carried as
  space-joined symbol strings ("l o w </w>"); merging pair (a, b)
  rewrites ``(?<=^| )a b(?= |$)`` -> "ab". The zero-width lookarounds
  keep consecutive occurrences mergeable ("a a a" -> "aa a", exactly
  BPE's left-to-right non-overlap), and the whole step stays in
  whole-stage codegen — no Python in the loop.
- **One 1-row collect per iteration** (the argmax pair), the same
  bounded-driver contract as ``graph.pagerank_auto``. Ties break
  deterministically by (count DESC, pair ASC) so the learned merge
  table is independent of partitioning.
- **Lineage is checkpointed** every ``checkpoint_every`` merges —
  each iteration adds a regexp_replace to the plan; an un-checkpointed
  30k-merge loop would build a 30k-operator lineage.
- **The histogram is bounded by contract.** ``max_words`` caps the
  driver-visible iteration working set: if the corpus has more
  distinct words, training keeps the top ``max_words`` by (count DESC,
  word ASC) — the standard practice of training BPE on the
  highest-mass vocabulary — and proceeds; the cap is enforced, not
  documented-and-hoped (round-5 verdict item 7 pattern).

Encoding (``bpe_segment_expr``) chains the learned merges as
regexp_replace calls over the whole document's symbol string. Safe
because every word ends with the ``</w>`` symbol and no learnable pair
starts with ``</w>`` — cross-word positions can never match an
intra-word pattern. The chain is JVM-side and shuffle-free, right for
the merge-table sizes this engine trains in-session (tens to
hundreds); for production 30k-merge vocabularies use
``bpe_segment_via_vocab``, which runs the regex chain over the
DISTINCT-WORD relation (vocab-sized — the histogram trick again) and
joins the segmentation back, trading one token-level shuffle for
per-word regex work that is O(vocab) instead of O(corpus).

No reference counterpart (the rentals reference has zero text
functions, SURVEY §2.9); mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators.text import BPE_ISH_PATTERN
from rentals_data_pipeline_spark.operators.topn import global_top_n

#: End-of-word marker symbol (its own symbol, so merges may absorb it:
#: ("t", "</w>") is learnable and yields the suffix symbol "t</w>").
EOW = "</w>"


def _quote_regex(sym: str) -> str:
    """Literal-quote a symbol for use inside a Java regex (symbols can
    be punctuation: ``.``, ``+``, ...). ``\\Q...\\E`` quotes everything
    except an embedded ``\\E``, which cannot survive quoting — guard it.
    """
    if "\\E" in sym:  # pragma: no cover - unreachable via BPE_ISH_PATTERN
        raise ValueError(f"symbol contains \\E: {sym!r}")
    return "\\Q" + sym + "\\E"


def _merge_pattern(a: str, b: str) -> str:
    """Regex merging one adjacent symbol pair in a space-joined symbol
    string: consume only "a b", check delimiters with zero-width
    lookarounds so back-to-back occurrences both merge."""
    return f"(?<=^|[ ]){_quote_regex(a)} {_quote_regex(b)}(?=[ ]|$)"


def _quote_replacement(sym: str) -> str:
    """Escape Java replacement-string metacharacters
    (``Matcher.quoteReplacement`` semantics): a raw ``$`` is an illegal
    group reference (a corpus with standalone '$' price tokens would
    crash the merge regexp_replace at runtime) and a raw ``\\``
    silently disappears, letting a backslash symbol collide with the
    EOW marker."""
    return sym.replace("\\", "\\\\").replace("$", "\\$")


def word_histogram(
    docs: DataFrame, text_col: str = "text", pattern: str = BPE_ISH_PATTERN
) -> DataFrame:
    """(word, cnt) over the pre-tokenized corpus — the one corpus-scale
    job in BPE training. Lower-cased to match ``BPE_ISH_PATTERN``'s
    letter class."""
    return (
        docs.select(
            F.explode(
                # F.lit, not an expr-embedded SQL literal: Spark SQL
                # string escapes would eat the pattern's backslashes.
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(pattern), F.lit(0)
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _to_symbols(word_col: Column) -> Column:
    """'low' -> 'l o w </w>' (space-joined initial character symbols
    plus the end-of-word marker)."""
    chars = F.filter(F.split(word_col, ""), lambda c: c != F.lit(""))
    return F.concat_ws(" ", F.concat(chars, F.array(F.lit(EOW))))


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge of adjacent (a, b) in one
    word's symbol list — BPE's merge rule ('a a a' + (a,a) -> 'aa a')."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _driver_train(
    rows: list[tuple[str, int]], num_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Pure-Python BPE fold over a collected (symbol-string, count)
    histogram — the sub-bound tier of ``bpe_train``. Incremental: pair
    counts live in a dict, the argmax in a lazy-deletion heap keyed
    (-count, pair) — identical ordering to the distributed
    ``orderBy(total desc, a asc, b asc)`` (UTF-8 byte order equals
    code-point order, so Python string comparison agrees with Spark's
    binary string sort) — and each merge touches only the words that
    contain its pair (inverted index), not the whole vocabulary. A 32k-
    merge train is therefore heap-log work per merge, not 32k Spark
    jobs."""
    import heapq

    vocab: list[list] = []  # [symbol list, word count]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, cnt) in enumerate(rows):
        s = syms.split(" ")
        vocab.append([s, cnt])
        for p in zip(s, s[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def _bump(p: tuple[str, str], delta: int) -> None:
        c = pair_counts.get(p, 0) + delta
        if c <= 0:
            pair_counts.pop(p, None)
        else:
            pair_counts[p] = c
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, p = heap[0]
            cur = pair_counts.get(p)
            if cur is None or cur != -negc:
                heapq.heappop(heap)  # stale entry (count since changed)
                continue
            best, best_cnt = p, cur
            break
        if best is None or best_cnt < min_pair_count:
            break
        merges.append(best)
        a, b = best
        for wi in pair_words.pop(best, set()):
            s, cnt = vocab[wi]
            if not any(
                s[i] == a and s[i + 1] == b for i in range(len(s) - 1)
            ):
                continue  # stale index entry — word no longer has the pair
            new = _merge_word(s, a, b)
            vocab[wi][0] = new
            for p in zip(s, s[1:]):
                _bump(p, -cnt)
            for p in zip(new, new[1:]):
                _bump(p, cnt)
                pair_words.setdefault(p, set()).add(wi)
        pair_counts.pop(best, None)  # fully merged away
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    max_words: int = 1_000_000,
    checkpoint_every: int = 10,
    min_pair_count: int = 2,
    driver_bound: int = 200_000,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges; returns them in order.

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (merging a frequency-1 pair memorizes a
    single word). Deterministic for a given corpus: ties in pair
    frequency break by lexicographic pair order, and the ``max_words``
    truncation orders by (cnt DESC, word ASC).

    Scale-tiered like ``graph.pagerank_auto``: a histogram below
    ``driver_bound`` rows collects ONCE and folds every merge
    driver-side in pure Python (incremental pair counts + lazy-deletion
    heap — a 32k-merge production vocabulary trains in seconds), while
    an at-or-above-bound histogram takes the distributed loop: one
    vocab-sized pair-count aggregation + 1-row argmax collect per merge,
    the bounded-driver contract. Both tiers implement the identical
    (count DESC, pair ASC) recurrence, so the learned table is
    bit-identical either way (pinned by test)."""
    spark = docs.sparkSession
    hist = word_histogram(docs, text_col)
    # Enforced histogram bound: keep the highest-mass vocabulary.
    # global_top_n, not orderBy().limit() — the latter is
    # TakeOrderedAndProject, whose driver merge of max_words x
    # numPartitions candidate rows is exactly the unbounded-driver
    # shape this engine bans (1M-word cap over a 1000-partition
    # histogram = a billion rows on the driver).
    # checkpoint BEFORE the tier probe: the probe's limit().collect()
    # and the distributed loop's first iteration would otherwise each
    # run the full tokenize + histogram + top-N lineage — twice the
    # costliest stage on exactly the corpora the distributed tier
    # exists for. The checkpoint is bounded (<= max_words rows) and
    # both tiers read from its blocks.
    hist = (
        global_top_n(hist, [F.col("cnt").desc(), F.col("word").asc()], max_words)
        .select(_to_symbols(F.col("word")).alias("syms"), "cnt")
        .localCheckpoint(eager=True)
    )
    bound = min(driver_bound, max_words + 1)
    probe = hist.limit(bound).collect()
    if len(probe) < bound:
        return _driver_train(
            [(r["syms"], r["cnt"]) for r in probe], num_merges, min_pair_count
        )

    merges: list[tuple[str, str]] = []
    for step in range(num_merges):
        # Adjacent pairs via zip_with(slice, slice): empty for words
        # already collapsed to one symbol. NOT sequence(0, size-2) —
        # for a single-symbol word that is sequence(0, -1) = [0, -1]
        # (descending!), whose NULL-partner pseudo-pairs outvote real
        # pairs once frequent words fully merge. slice/zip_with is
        # also ANSI-safe (no out-of-range element access).
        pairs = (
            hist.select(
                F.explode(
                    F.expr(
                        "zip_with("
                        "slice(split(syms, ' '), 1, size(split(syms, ' ')) - 1), "
                        "slice(split(syms, ' '), 2, size(split(syms, ' ')) - 1), "
                        "(x, y) -> struct(x as a, y as b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("total"))
            .orderBy(F.col("total").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["total"] < min_pair_count:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        hist = hist.withColumn(
            "syms",
            F.regexp_replace("syms", _merge_pattern(a, b), _quote_replacement(a + b)),
        )
        if (step + 1) % checkpoint_every == 0:
            hist = hist.localCheckpoint()
    return merges


def bpe_segment_expr(
    merges: list[tuple[str, str]], text_col: str = "text"
) -> Column:
    """Column of BPE tokens (array<string>) for ``text_col``.

    Pre-tokenizes, explodes to initial character symbols with ``</w>``
    markers, then applies the merge table as chained JVM
    ``regexp_replace`` calls over the whole document symbol string —
    shuffle-free, no Python. Cross-word merges are impossible by
    construction (every word ends in ``</w>`` and no pair starts with
    it), so whole-document application equals per-word application.
    """
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), F.lit(0)
    )
    syms = F.concat_ws(" ", F.transform(words, _to_symbols))
    for a, b in merges:
        syms = F.regexp_replace(syms, _merge_pattern(a, b), _quote_replacement(a + b))
    return F.filter(F.split(syms, " "), lambda t: t != F.lit(""))


def bpe_token_count_expr(
    merges: list[tuple[str, str]], text_col: str = "text"
) -> Column:
    """Token count under the learned vocabulary — the statistic
    curation pipelines bin and pack by."""
    return F.size(bpe_segment_expr(merges, text_col))


def _segment_word_col(word_col: Column, merges: list[tuple[str, str]]) -> Column:
    """array<string> of BPE tokens for ONE word column (the per-word
    regex chain ``bpe_segment_expr`` applies to whole documents)."""
    syms = _to_symbols(word_col)
    for a, b in merges:
        syms = F.regexp_replace(syms, _merge_pattern(a, b), _quote_replacement(a + b))
    return F.split(syms, " ")


def bpe_segment_via_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    output_col: str = "bpe_tokens",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Scale path for LARGE merge tables: segment each DISTINCT word
    once, then map the segmentation back over the corpus.

    ``bpe_segment_expr`` chains ``len(merges)`` regexp_replace passes
    over EVERY document — right for the tens-of-merges tables this
    engine trains in-session, wrong for a production 30k-merge
    vocabulary (30k regex passes × corpus bytes). Here the regex chain
    runs over the distinct-word relation — vocab-sized, the same
    histogram trick training uses — and documents rebuild their token
    arrays by joining words back to the segmented vocab:

    - tokenize each doc to its word array (the cheap codegen
      tokenizer, no merges; it evaluates twice — once in the
      vocab-distinct branch, once in the probe branch — a deliberate
      trade: re-running a narrow regex scan is cheaper at corpus
      scale than checkpointing the tokenized corpus to executor
      disk just to share it),
    - posexplode to (id, pos, word),
    - equi-join the segmented vocab — broadcast when the caller says
      the vocab fits an executor (default), plain equi-join (sort-merge
      at scale, AQE may still demote it) otherwise,
    - reassemble: collect_list of (pos, toks) structs, array_sort
      (struct ordering = field order, pos leads and is unique per
      doc), flatten; left-join back so word-less docs keep an empty
      array instead of vanishing.

    Output is exactly ``bpe_segment_expr``'s (pinned by test); the
    explicit trade is one token-level shuffle (the reassembly groupBy)
    to cut per-word regex work from O(corpus) to O(vocab). ``id_col``
    must be unique — the reassembly groups by it.
    """
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), F.lit(0)
    )
    with_words = docs.withColumn("_words", words)
    vocab = (
        with_words.select(F.explode("_words").alias("_word"))
        .distinct()
        .select("_word", _segment_word_col(F.col("_word"), merges).alias("_toks"))
    )
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    segmented = (
        with_words.select(id_col, F.posexplode("_words").alias("_pos", "_word"))
        .join(vocab, "_word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_toks"))),
                    lambda s: s["_toks"],
                )
            ).alias(output_col)
        )
    )
    return (
        docs.join(segmented, id_col, "left")
        .withColumn(output_col, F.coalesce(F.col(output_col), F.array()))
    )
