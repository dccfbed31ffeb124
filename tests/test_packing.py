"""Sequence packing: hand-counted chunks + stream-equality properties."""

from __future__ import annotations

import numpy as np

from wotan_spark.spark.packing import pack_sequences


def _df(spark, rows):
    return spark.createDataFrame(
        [(d, t, len(t), "unit") for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int, source string")


def test_pack_hand_counted(spark):
    docs = _df(spark, [("a", [1, 2, 3]), ("b", [4, 5]), ("c", [6, 7, 8, 9])])
    got = {r.chunk_id: (list(r.tokens), r.n_docs)
           for r in pack_sequences(docs, 4).collect()}
    # stream 1..9 in doc_id order; trailing [9] dropped
    assert got == {0: ([1, 2, 3, 4], 2), 1: ([5, 6, 7, 8], 2)}


def test_pack_keep_last_and_eod(spark):
    docs = _df(spark, [("a", [1, 2, 3]), ("b", [4, 5]), ("c", [6, 7, 8, 9])])
    got = {r.chunk_id: (list(r.tokens), r.n_docs)
           for r in pack_sequences(docs, 4, drop_last=False).collect()}
    assert got[2] == ([9], 1)
    # EOD separator: stream 1,2,3,-1,4,5,-1,6,7,8,9,-1 -> three full chunks
    got = {r.chunk_id: list(r.tokens)
           for r in pack_sequences(docs, 4, eod_token=-1).collect()}
    assert got == {0: [1, 2, 3, -1], 1: [4, 5, -1, 6], 2: [7, 8, 9, -1]}


def test_pack_long_doc_spans_chunks(spark):
    docs = _df(spark, [("only", list(range(10)))])
    got = {r.chunk_id: (list(r.tokens), r.n_docs)
           for r in pack_sequences(docs, 3).collect()}
    assert got == {0: ([0, 1, 2], 1), 1: ([3, 4, 5], 1), 2: ([6, 7, 8], 1)}


def test_pack_stream_equality_and_partition_invariance(spark):
    """Concatenated chunks == concatenated per-doc streams (token-array
    equality through the op), identically at any input partitioning and
    any range-partition count — the two-phase offset must not depend on
    physical layout."""
    rng = np.random.default_rng(7)
    rows = [(f"doc_{i:03d}",
             [int(x) for x in rng.integers(-5000, 5000,
                                           int(rng.integers(1, 400)))])
            for i in range(60)]
    docs = _df(spark, rows)
    want = [t for _, toks in sorted(rows) for t in toks]
    L = 256
    want = want[:len(want) // L * L]

    def stream(df):
        out = sorted(df.collect(), key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in out] == list(range(len(out)))
        assert all(len(r.tokens) == L for r in out)
        return [t for r in out for t in r.tokens]

    assert stream(pack_sequences(docs, L)) == want
    assert stream(pack_sequences(docs.repartition(1), L, partitions=3)) == want
    assert stream(pack_sequences(docs.repartition(17, "doc_id"), L,
                                 partitions=16)) == want


def test_pack_n_docs_counts_contributors(spark):
    # many single-token docs into one chunk: n_docs == context_len
    docs = _df(spark, [(f"d{i:02d}", [i]) for i in range(8)])
    rows = pack_sequences(docs, 8).collect()
    assert len(rows) == 1 and rows[0].n_docs == 8


def test_pack_without_n_tok_column(spark):
    """Frames lacking the contract's n_tok column fall back to sizing the
    arrays; output identical."""
    docs = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", [4, 5]), ("c", [6, 7, 8, 9])],
        "doc_id string, tokens array<int>")
    got = {r.chunk_id: list(r.tokens)
           for r in pack_sequences(docs, 4).collect()}
    assert got == {0: [1, 2, 3, 4], 1: [5, 6, 7, 8]}


def test_pack_inaccurate_n_tok_fails_loudly(spark):
    """The metadata pass trusts the contract's n_tok; every way it can lie
    must raise (stale count, NULL with a live payload, positive with an
    empty payload) rather than silently dropping or corrupting chunks."""
    import pytest

    def packed(rows):
        df = spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int, source string")
        return pack_sequences(df, 4).collect()

    with pytest.raises(Exception, match="n_tok does not match"):
        packed([("a", [1, 2, 3], 5, "unit"), ("b", [4, 5, 6, 7], 4, "unit")])
    # NULL n_tok with non-empty tokens: the doc falls out of the metadata
    # pass only — an inner join would silently drop its tokens
    with pytest.raises(Exception, match="n_tok does not match"):
        packed([("a", [1, 2, 3], None, "unit"),
                ("b", [4, 5, 6, 7, 8], 5, "unit")])
    # declared-positive but empty payload: the doc falls out of the body
    # side only — its declared tokens would silently shift every later doc
    with pytest.raises(Exception, match="n_tok does not match"):
        packed([("a", [], 3, "unit"), ("b", [4, 5, 6, 7, 8], 5, "unit")])


def test_shard_chunks_deterministic_and_balanced(spark):
    from wotan_spark.spark.packing import shard_chunks
    chunks = spark.createDataFrame(
        [(i, [i], 1) for i in range(200)],
        "chunk_id long, tokens array<int>, n_docs long")
    a = {r.chunk_id: (r.shard, r.pos)
         for r in shard_chunks(chunks, 4, seed=1).collect()}
    b = {r.chunk_id: (r.shard, r.pos)
         for r in shard_chunks(chunks.repartition(7), 4, seed=1).collect()}
    assert a == b                                   # layout-invariant
    # dense 0..k-1 positions per shard, hash-balanced within 3x of even
    from collections import Counter
    sizes = Counter(s for s, _ in a.values())
    assert sorted(sizes) == [0, 1, 2, 3]
    assert max(sizes.values()) < 3 * 200 // 4
    for s in sizes:
        got = sorted(p for sh, p in a.values() if sh == s)
        assert got == list(range(sizes[s]))
    # a different seed produces a different permutation
    c = {r.chunk_id: (r.shard, r.pos)
         for r in shard_chunks(chunks, 4, seed=2).collect()}
    assert c != a
