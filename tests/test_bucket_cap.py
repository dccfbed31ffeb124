"""Bounded bucket pair expansion (``_capped_pairs``): exact output parity
with the uncapped path, degenerate-bucket completion without unbounded
array rows, the ``max_bucket`` drop policy, and the audit helper.

This is the round-4 scale-hazard fix: a plain groupBy+collect_list bucket
expansion puts every member of one LSH band / inverted-index bucket into a
single aggregation buffer and one O(m^2) pair array — a boilerplate bucket
at 10^12-doc scale is one multi-million-element array in one task.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from wotan_spark.spark.datapipe import (_block_index, _capped_pairs,
                                        bucket_size_stats,
                                        minhash_lsh_pairs,
                                        ngram_jaccard_pairs,
                                        ngram_jaccard_pairs_prefix)

SF_DIR = "/root/testdata/sf0.001"


def test_capped_pairs_exact_parity_all_ops(spark):
    """A tiny cap forces the blocked path everywhere; output must be
    identical to the effectively-uncapped run for all three public ops."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cases = [
        (minhash_lsh_pairs, {}),
        (ngram_jaccard_pairs, {"threshold": 0.4}),
        (ngram_jaccard_pairs_prefix, {"threshold": 0.4}),
    ]
    for fn, kw in cases:
        uncapped = {tuple(r) for r in
                    fn(docs, bucket_cap=10 ** 9, **kw).collect()}
        capped = {tuple(r) for r in fn(docs, bucket_cap=3, **kw).collect()}
        assert uncapped, f"{fn.__name__}: fixture should produce pairs"
        assert capped == uncapped, fn.__name__


def test_capped_pairs_complete_and_ordered(spark):
    """One 1000-member bucket with cap=64: all C(1000,2) pairs, each
    exactly once, a < b throughout."""
    ex = spark.createDataFrame([("k", i) for i in range(1000)],
                               "key string, m int")
    p = _capped_pairs(ex, ["key"], "m", cap=64)
    n = p.count()
    assert n == 1000 * 999 // 2
    assert p.select("p.a", "p.b").distinct().count() == n
    assert p.filter(F.col("p.a") >= F.col("p.b")).count() == 0


def test_block_index_bounded_by_cap(spark):
    """The block index never materializes an array over ``cap`` distinct
    members — the property that bounds per-task memory.  Small buckets are
    their own single block; duplicate members (hash-collision stand-ins)
    collapse inside one block instead of straddling blocks (dense_rank
    ties), so pair output stays deduped."""
    rows = [("hot", i) for i in range(1000)] + [("hot", 7)] * 5 \
        + [("cold", i) for i in range(10)]
    ex = spark.createDataFrame(rows, "key string, m int")
    blocks = _block_index(ex, ["key"], "m", cap=64, max_bucket=None)
    sizes = blocks.select(F.size("ms").alias("s"))
    assert sizes.agg(F.max("s")).collect()[0][0] <= 64
    # the cold bucket is one block of all 10 members; the hot bucket's
    # blocks hold every distinct member exactly once
    cold = blocks.filter(F.col("key") == "cold").collect()
    assert len(cold) == 1 and len(cold[0].ms) == 10
    total = blocks.filter(F.col("key") == "hot") \
        .agg(F.sum(F.size("ms"))).collect()[0][0]
    assert total == 1000
    # and the full expansion still emits each pair once despite the dups
    p = _capped_pairs(ex, ["key"], "m", cap=64)
    hot = p.filter(F.col("key") == "hot")
    assert hot.count() == 1000 * 999 // 2
    assert hot.select("p.a", "p.b").distinct().count() == 1000 * 999 // 2


def test_minhash_degenerate_band_bucket_completes(spark):
    """The verdict's done-criterion: a degenerate band bucket (identical
    docs -> identical signatures -> one bucket per band) completes via the
    blocked path and yields the exact pair set."""
    n_docs = 1000
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta")
         for i in range(n_docs)], "doc_id long, text string")
    out = minhash_lsh_pairs(docs, bucket_cap=64)
    rows = out.collect()
    assert len(rows) == n_docs * (n_docs - 1) // 2
    # identical docs share all four bands
    assert all(r.n_bands == 4 for r in rows)


def test_minhash_max_bucket_drops_degenerate(spark):
    """Drop policy: a 10k-member degenerate bucket is excluded outright
    (its O(m^2) pairs carry no curation signal — exact dedup owns identical
    boilerplate), while normal near-dup buckets still pair."""
    boiler = [(i, "spam spam spam spam spam spam") for i in range(10_000)]
    real = [(20_000, "one two three four five six seven"),
            (20_001, "one two three four five six seven")]
    docs = spark.createDataFrame(boiler + real, "doc_id long, text string")
    out = minhash_lsh_pairs(docs, bucket_cap=64, max_bucket=100).collect()
    pairs = {(r.doc_a, r.doc_b) for r in out}
    assert pairs == {(20_000, 20_001)}


def test_bucket_size_stats_audit(spark):
    ex = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", 0), ("b", 1)],
        "key string, m int")
    stats = bucket_size_stats(ex, ["key"]).collect()
    assert [(r.key, r.n_members) for r in stats] == [("a", 5), ("b", 2)]


def test_block_cache_lru_refresh_and_release(spark):
    """Cache lifecycle (round-4 ADVICE): a semantically identical re-issued
    plan refreshes its tracked handle's LRU position (so 8 distinct newer
    indexes can't evict the shared CacheManager entry out from under it),
    and clear_block_caches() releases every live handle."""
    import wotan_spark.spark.datapipe as dp
    from wotan_spark.spark.datapipe import clear_block_caches

    clear_block_caches()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # first plan, then a stack of distinct plans to fill the LRU behind it
    minhash_lsh_pairs(docs, bucket_cap=3)
    first = dp._LIVE_BLOCK_CACHE[0]
    for cap in (4, 5, 6):
        minhash_lsh_pairs(docs, bucket_cap=cap)
    assert len(dp._LIVE_BLOCK_CACHE) == 4
    # re-issue the first plan: no duplicate entry, handle moves to the end
    minhash_lsh_pairs(docs, bucket_cap=3)
    assert len(dp._LIVE_BLOCK_CACHE) == 4
    assert dp._LIVE_BLOCK_CACHE[-1] is first
    released = clear_block_caches()
    assert released == 4
    assert dp._LIVE_BLOCK_CACHE == []


def test_block_cache_hit_skips_repersist_but_reads_cache(spark):
    """A re-issued identical plan must not call persist() again (that is
    the CacheManager \"already cached\" warning), yet its reads still hit
    the live InMemoryRelation via canonical-plan rewrite."""
    import wotan_spark.spark.datapipe as dp
    from wotan_spark.spark.datapipe import clear_block_caches

    clear_block_caches()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = dp._register_session_cache(docs.select("doc_id"))
    a.count()                                # materialize the cache
    b = dp._register_session_cache(docs.select("doc_id"))
    # one tracked handle — the hit path tracked nothing new, and the
    # caller's handle is still served by the live InMemoryRelation via
    # canonical-plan rewrite (storageLevel itself resolves through
    # CacheManager, so it can't distinguish the two persist calls —
    # the plan shape can)
    assert len(dp._LIVE_BLOCK_CACHE) == 1
    assert b is not a
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    assert clear_block_caches() == 1
