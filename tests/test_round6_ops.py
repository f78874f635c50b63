"""Round-6 operator invariants.

Pins the contracts of the round-6 scale-shape rewrites: two-level bin
packing (sharded windows + prefix-sum offsets) and the in-array
indexed-concat shingle path that replaced the lead-window form.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from rentals_data_pipeline_spark.operators.text import pack_chunks_into_bins


def _chunk_rows(seed: int = 3, n_docs: int = 120):
    rng = random.Random(seed)
    rows = []
    for d in range(n_docs):
        split = ["train", "val", "test"][d % 3]
        for c in range(rng.randint(1, 6)):
            rows.append((d, c, rng.randint(8, 64), split))
    return rows


def test_two_level_packing_invariants(spark):
    """For ANY n_shards: every chunk is assigned exactly one bin; bins
    are contiguous 1..max per split; no bin's token total exceeds the
    budget by a full chunk (each shard's running-sum walk can overshoot
    by less than one chunk, and shards never share a bin id after the
    prefix-sum offset)."""
    df = spark.createDataFrame(
        _chunk_rows(),
        "doc_id long, chunk_idx long, n_chunk_tokens long, split string",
    )
    budget = 128
    for n_shards in (0, 1, 4, 16):
        out = df.transform(
            pack_chunks_into_bins(
                bin_tokens=budget,
                order_by=["doc_id", "chunk_idx"],
                partition_by=["split"],
                n_shards=n_shards,
            )
        ).collect()
        assert len(out) == df.count()  # every chunk assigned
        by_split_bin: dict = {}
        for r in out:
            by_split_bin.setdefault(r["split"], {}).setdefault(
                r["bin_id"], 0
            )
            by_split_bin[r["split"]][r["bin_id"]] += r["n_chunk_tokens"]
        max_chunk = max(r["n_chunk_tokens"] for r in out)
        for split, bins in by_split_bin.items():
            ids = sorted(bins)
            assert ids == list(range(1, len(ids) + 1)), (
                f"bins not contiguous for {split} at n_shards={n_shards}: {ids[:10]}"
            )
            for b, total in bins.items():
                assert total < budget + max_chunk, (
                    f"bin {split}/{b} overshoots by a full chunk: {total}"
                )


def test_two_level_packing_keeps_null_shard_keys(spark):
    """A NULL shard key must land in a real shard, not vanish: the
    shard hash NULL-propagated pre-fix, and the inner offset equi-join
    silently dropped the NULL-shard rows (n_shards=0 kept them)."""
    rows = [(None, 0, 60, "train"), (1, 0, 60, "train"), (2, 0, 60, "train")]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, n_chunk_tokens long, split string"
    )
    for n_shards in (0, 4):
        out = df.transform(
            pack_chunks_into_bins(
                bin_tokens=128,
                order_by=["doc_id", "chunk_idx"],
                partition_by=["split"],
                n_shards=n_shards,
            )
        ).collect()
        assert len(out) == 3, f"rows lost at n_shards={n_shards}"
        assert all(r["bin_id"] >= 1 for r in out)


def test_two_level_packing_keeps_null_partition_values(spark):
    """A NULL in a partition_by column is a real packing partition
    (window partitionBy groups NULLs, same as n_shards=0), so the
    offsets join back must be NULL-SAFE: pre-fix the plain equi-join
    silently dropped every NULL-partition row (round-6 advice repro:
    3 rows -> 2). Both tiers must agree on the NULL group's bins."""
    rows = [(1, 0, 60, None), (2, 0, 60, "train"), (3, 0, 60, None)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, n_chunk_tokens long, split string"
    )
    outs = {}
    for n_shards in (0, 4):
        out = df.transform(
            pack_chunks_into_bins(
                bin_tokens=128,
                order_by=["doc_id", "chunk_idx"],
                partition_by=["split"],
                n_shards=n_shards,
            )
        ).collect()
        assert len(out) == 3, f"NULL-partition rows lost at n_shards={n_shards}"
        outs[n_shards] = sorted(
            (r["doc_id"], r["split"], r["bin_id"]) for r in out
        )
        # Bins stay contiguous 1..max inside the NULL partition (bin
        # BOUNDARIES may differ across tiers — sharding splits the
        # walk — but ids are dense and every NULL row keeps one).
        null_bins = sorted({b for d, s, b in outs[n_shards] if s is None})
        assert null_bins == list(range(1, len(null_bins) + 1))
    assert {d for d, s, b in outs[4] if s is None} == {1, 3}


def test_two_level_packing_preserves_rows_property(spark):
    """For ANY chunk relation (including NULL keys and NULL-free),
    sharded packing keeps exactly the input rows and every (partition,
    bin) total stays under budget + one chunk — row preservation is
    the invariant the NULL-shard-key fix restored."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(0, 9)),  # doc_id (nullable)
                st.integers(0, 4),  # chunk_idx
                st.integers(1, 80),  # tokens
                st.sampled_from(["train", "val", None]),  # split (nullable)
            ),
            min_size=1,
            max_size=25,
            unique_by=lambda r: (r[0], r[1], r[3]),
        ),
        n_shards=st.integers(0, 6),
    )
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(rows, n_shards):
        df = spark.createDataFrame(
            rows, "doc_id long, chunk_idx long, n_chunk_tokens long, split string"
        ).repartition(3)
        out = df.transform(
            pack_chunks_into_bins(
                bin_tokens=100,
                order_by=["doc_id", "chunk_idx"],
                partition_by=["split"],
                n_shards=n_shards,
            )
        ).collect()
        assert len(out) == len(rows)
        nkey = lambda t: (t[0] is None, t[0] or 0, t[1], t[2] or "")  # noqa: E731
        assert sorted(
            ((r["doc_id"], r["chunk_idx"], r["split"]) for r in out), key=nkey
        ) == sorted(((r[0], r[1], r[3]) for r in rows), key=nkey)
        totals: dict = {}
        for r in out:
            totals[(r["split"], r["bin_id"])] = (
                totals.get((r["split"], r["bin_id"]), 0) + r["n_chunk_tokens"]
            )
        for tot in totals.values():
            assert tot < 100 + 80

    prop()


def test_two_level_packing_layout_invariant(spark):
    """Bin assignment is a pure function of the data — identical on
    any physical layout of the input."""
    df = spark.createDataFrame(
        _chunk_rows(seed=11),
        "doc_id long, chunk_idx long, n_chunk_tokens long, split string",
    )
    op = pack_chunks_into_bins(
        bin_tokens=96,
        order_by=["doc_id", "chunk_idx"],
        partition_by=["split"],
        n_shards=8,
    )
    want = sorted(tuple(r) for r in df.transform(op).collect())
    for layout in (df.repartition(13), df.repartition(1), df.orderBy(F.rand(seed=5))):
        assert sorted(tuple(r) for r in layout.transform(op).collect()) == want


def test_shingle_digest_rows_matches_naive_ngrams(spark):
    """The in-array indexed-concat shingle path emits exactly the md5
    digests of the naive per-document n-gram walk — one row per gram
    OCCURRENCE (duplicates kept), none for docs shorter than n."""
    from rentals_data_pipeline_spark.operators.dedup import (
        shingle_digest_rows,
    )

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x"]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for d in range(40)
    ]
    n = 5
    want = []
    for d, text in docs:
        w = text.split(" ") if text else [""]
        for i in range(len(w) - n + 1):
            gram = " ".join(w[i : i + n])
            want.append((d, hashlib.md5(gram.encode()).hexdigest()))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r["doc_id"], r["d"])
        for r in df.transform(shingle_digest_rows("doc_id", "text", n)).collect()
    ]
    assert sorted(got) == sorted(want)
