"""Incrementally maintained near-dup index: parity with the one-shot
operator, O(delta) update cost, append-only guards, warm path independent
of the original corpus files."""

from __future__ import annotations

import shutil

import pytest

from wotan_spark.spark.datapipe import minhash_lsh_pairs
from wotan_spark.spark.neardup_index import NearDupIndex

SF_DIR = "/root/testdata/sf0.001"


def _pairs_set(df):
    return {(r.doc_a, r.doc_b, r.n_bands) for r in df.collect()}


def test_incremental_updates_equal_full_recompute(spark, tmp_path):
    """build(A) + update(B) + update(C) must yield exactly
    minhash_lsh_pairs(A+B+C) — the maintained index is a drop-in for the
    one-shot operator."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id % 3 = 0")
    b = docs.filter("doc_id % 3 = 1")
    c = docs.filter("doc_id % 3 = 2")
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, a)
    assert _pairs_set(idx.candidate_pairs(spark)) == \
        _pairs_set(minhash_lsh_pairs(a))
    idx.update_incremental(spark, b, run_id="u1")
    assert _pairs_set(idx.candidate_pairs(spark)) == \
        _pairs_set(minhash_lsh_pairs(a.unionByName(b)))
    idx.update_incremental(spark, c, run_id="u2")
    assert _pairs_set(idx.candidate_pairs(spark)) == \
        _pairs_set(minhash_lsh_pairs(docs))


def test_update_touches_only_the_delta(spark, tmp_path):
    """The appended band snapshot holds exactly the delta's bands (4 per
    shingle-bearing doc) and the appended pair snapshot holds exactly the
    pairs involving a delta doc — O(delta), not O(corpus)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id < 40")
    b = docs.filter("doc_id >= 40")
    n_b_docs = (b.filter("text IS NOT NULL")
                .filter("size(split(lower(text), ' ')) >= 3").count())
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, a)
    res = idx.update_incremental(spark, b, run_id="u1")
    assert res["delta_band_rows"] == 4 * n_b_docs
    full = _pairs_set(minhash_lsh_pairs(docs))
    old = _pairs_set(minhash_lsh_pairs(a))
    b_ids = {r.doc_id for r in b.select("doc_id").collect()}
    delta_pairs = {p for p in full - old
                   if p[0] in b_ids or p[1] in b_ids}
    assert res["new_pair_rows"] == len(delta_pairs)
    assert full == old | delta_pairs  # appends never rewrite old pairs


def test_warm_path_never_rereads_corpus_text(spark, tmp_path):
    """The cold build input can disappear from disk and updates still run:
    the warm path reads only the maintained band table plus the delta —
    the 'cold index build disappears from the warm path' criterion."""
    src = str(tmp_path / "corpus")
    spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter("doc_id < 60").write.parquet(src)
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, spark.read.parquet(src))
    before = _pairs_set(idx.candidate_pairs(spark))
    shutil.rmtree(src)
    delta = spark.createDataFrame(
        [(10_001, "alpha beta gamma delta epsilon", "s"),
         (10_002, "alpha beta gamma delta epsilon", "s")],
        "doc_id long, text string, source string")
    res = idx.update_incremental(spark, delta, run_id="u1")
    after = _pairs_set(idx.candidate_pairs(spark))
    assert (10_001, 10_002, 4) in after - before
    assert res["delta_band_rows"] == 8


def test_append_only_and_param_guards(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = NearDupIndex(str(tmp_path / "nd"))
    with pytest.raises(ValueError, match="build"):
        idx.candidate_pairs(spark)
    idx.build(spark, docs.filter("doc_id < 50"))
    with pytest.raises(ValueError, match="append-only"):
        idx.update_incremental(spark, docs.filter("doc_id < 10"),
                               run_id="dup")
    other = NearDupIndex(str(tmp_path / "nd"), band_size=4)
    with pytest.raises(ValueError, match="built with"):
        other.update_incremental(spark, docs.filter("doc_id >= 50"),
                                 run_id="u")


def test_update_incremental_is_idempotent_per_run_id(spark, tmp_path):
    """Crash-replay safety (round-4 review): a retry of the SAME run_id
    must not double-append pairs — whether the first attempt fully
    succeeded, or crashed between the pairs append and the bands append."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id % 3 = 0")
    b = docs.filter("doc_id % 3 = 1")
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, a)
    r1 = idx.update_incremental(spark, b, run_id="u1")
    want = _pairs_set(idx.candidate_pairs(spark))
    # full-success retry: exact no-op, same snapshot ids returned
    r2 = idx.update_incremental(spark, b, run_id="u1")
    assert r2 == r1
    assert _pairs_set(idx.candidate_pairs(spark)) == want
    # half-done crash: pairs landed, bands did not (the real crash window
    # given the append order) — simulate by crashing the bands append of
    # a SECOND batch, then retrying that run
    c = docs.filter("doc_id % 3 = 2")
    orig_append = idx.bands.append

    def boom(df, **meta):
        raise RuntimeError("simulated crash before bands append")

    idx.bands.append = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.update_incremental(spark, c, run_id="u2")
    idx.bands.append = orig_append
    assert idx.pairs.find_snapshot(run_id="u2") is not None   # half-done
    assert idx.bands.find_snapshot(run_id="u2") is None
    r4 = idx.update_incremental(spark, c, run_id="u2")        # retry
    assert idx.bands.find_snapshot(run_id="u2") is not None
    assert r4["pairs_snapshot"] == \
        idx.pairs.find_snapshot(run_id="u2")["snapshot_id"]
    # the completed index equals the one-shot operator over everything —
    # no doubled pairs from the replayed run
    assert _pairs_set(idx.candidate_pairs(spark)) == \
        _pairs_set(minhash_lsh_pairs(docs))


def test_half_done_retry_with_different_content_raises(spark, tmp_path):
    """run_id idempotence assumes the retry replays the SAME batch: after
    a crash between the pairs append and the bands append, a retry under
    the same run_id with DIFFERENT delta content must raise (the stamped
    delta fingerprint mismatches) instead of appending bands inconsistent
    with the committed pairs."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id % 3 = 0")
    b = docs.filter("doc_id % 3 = 1")
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, a)
    orig_append = idx.bands.append

    def boom(df, **meta):
        raise RuntimeError("simulated crash before bands append")

    idx.bands.append = boom
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.update_incremental(spark, b, run_id="u7")
    idx.bands.append = orig_append
    # retry with a different batch under the stamped run_id: refused
    c = docs.filter("doc_id % 3 = 2")
    with pytest.raises(ValueError, match="fingerprint"):
        idx.update_incremental(spark, c, run_id="u7")
    # the honest retry (same content) still completes the half-done update
    idx.update_incremental(spark, b, run_id="u7")
    assert _pairs_set(idx.candidate_pairs(spark)) == \
        _pairs_set(minhash_lsh_pairs(docs.filter("doc_id % 3 != 2")))


def test_update_with_build_run_id_still_indexes(spark, tmp_path):
    """Reusing build()'s default run_id for an update must still index the
    batch: the idempotence guard matches UPDATE snapshots only, so a build
    stamp cannot silently swallow a later batch (round-4 review)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id % 3 = 0")
    b = docs.filter("doc_id % 3 != 0")
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, a)                          # stamps run_id="build"
    idx.update_incremental(spark, b, run_id="build")
    assert _pairs_set(idx.candidate_pairs(spark)) == \
        _pairs_set(minhash_lsh_pairs(docs))


def test_update_retry_with_bands_already_landed(spark, tmp_path):
    """The reverse half-done window (bands landed, pairs did not — only
    reachable if the append order ever changes): the retry must probe the
    PRE-update band snapshot, skip the dup check for the delta, and still
    produce the exact pair set exactly once."""
    from wotan_spark.spark.datapipe import minhash_bands
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = docs.filter("doc_id % 3 = 0")
    b = docs.filter("doc_id % 3 != 0")
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, a)
    # inject the state: the bands append landed under run u9, pairs never
    idx.bands.append(minhash_bands(b, idx.n, idx.band_size),
                     run_id="u9", op="update", **idx._params_meta())
    r = idx.update_incremental(spark, b, run_id="u9")
    assert _pairs_set(idx.candidate_pairs(spark)) == \
        _pairs_set(minhash_lsh_pairs(docs))
    # retry after that completion stays a no-op
    r2 = idx.update_incremental(spark, b, run_id="u9")
    assert r2 == r


def test_verify_jaccard_pairs_exact_on_true_candidates(spark):
    """Feeding verify_jaccard_pairs the exact pair set as candidates must
    reproduce ngram_jaccard_pairs bit-for-bit (pairs AND jaccard values):
    verification is exact, candidates only bound recall."""
    from wotan_spark.spark.datapipe import (ngram_jaccard_pairs,
                                            verify_jaccard_pairs)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = ngram_jaccard_pairs(docs, threshold=0.4)
    got = verify_jaccard_pairs(docs, exact.select("doc_a", "doc_b"),
                               n=3, threshold=0.4)
    want = {(r.doc_a, r.doc_b, round(r.jaccard, 12)) for r in exact.collect()}
    assert {(r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in got.collect()} == want
    assert want, "fixture should produce pairs"


def test_curate_corpus_with_maintained_index(spark, tmp_path):
    """The funnel's LSH->verify warm path: kept docs are a SUPERSET of the
    exact funnel's (LSH bounds recall), every doc it removes is removed by
    the exact funnel too (verification is exact), and the funnel report
    stays coherent."""
    from wotan_spark.spark.datapipe import curate_corpus
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, docs)
    kept_exact, _ = curate_corpus(docs, min_tokens=5)
    kept_idx, funnel = curate_corpus(docs, min_tokens=5, neardup_index=idx)
    ke = {r.doc_id for r in kept_exact.collect()}
    ki = {r.doc_id for r in kept_idx.collect()}
    assert ke <= ki, "indexed funnel must never remove a non-near-dup"
    rows = {r.stage: r.n_docs for r in funnel.collect()}
    assert rows["near_dup"] == len(ki)


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _cand_set(df):
    return {(r.vec_id_a, r.vec_id_b, r.n_tables) for r in df.collect()}


def _oneshot_embedding_candidates(emb):
    """The one-shot construction the maintained index must reproduce."""
    import pyspark.sql.functions as F

    from wotan_spark.spark.datapipe import _capped_pairs, lsh_buckets
    return (_capped_pairs(lsh_buckets(emb, n_planes=4, n_tables=8, seed=7),
                          ["table_id", "bucket"], "vec_id")
            .groupBy(F.col("p.a").alias("vec_id_a"),
                     F.col("p.b").alias("vec_id_b"))
            .agg(F.countDistinct("table_id").alias("n_tables")))


def test_embedding_index_incremental_equals_oneshot(spark, tmp_path):
    """build(A) + update(B) must yield exactly the one-shot hyperplane
    candidate set over A+B (signatures are corpus-independent: seeded
    hyperplanes are identical across build and updates)."""
    from wotan_spark.spark.neardup_index import EmbeddingNearDupIndex
    emb = _emb(spark)
    a = emb.filter("vec_id % 2 = 0")
    b = emb.filter("vec_id % 2 = 1")
    idx = EmbeddingNearDupIndex(str(tmp_path / "end"))
    idx.build(spark, a)
    assert _cand_set(idx.candidate_pairs(spark)) == \
        _cand_set(_oneshot_embedding_candidates(a))
    r = idx.update_incremental(spark, b, run_id="u1")
    assert _cand_set(idx.candidate_pairs(spark)) == \
        _cand_set(_oneshot_embedding_candidates(emb))
    assert r["delta_bucket_rows"] == 8 * b.count()   # one row per table
    # idempotent retry
    assert idx.update_incremental(spark, b, run_id="u1") == r


def test_embedding_index_scored_pairs_match_lsh_operator(spark, tmp_path):
    """scored_pairs == embedding_near_dup_pairs(method='lsh') bit-for-bit
    (same planes/tables/seed -> same candidates; verification exact)."""
    from wotan_spark.spark.datapipe import embedding_near_dup_pairs
    from wotan_spark.spark.neardup_index import EmbeddingNearDupIndex
    emb = _emb(spark)
    idx = EmbeddingNearDupIndex(str(tmp_path / "end"))
    idx.build(spark, emb)
    got = {(r.vec_id_a, r.vec_id_b, r.cos_sim)
           for r in idx.scored_pairs(spark, emb, threshold=0.3).collect()}
    want = {(r.vec_id_a, r.vec_id_b, r.cos_sim)
            for r in embedding_near_dup_pairs(emb, threshold=0.3,
                                              method="lsh").collect()}
    assert got == want
    assert want, "fixture should produce scored pairs"


def test_embedding_index_param_guard(spark, tmp_path):
    from wotan_spark.spark.neardup_index import EmbeddingNearDupIndex
    emb = _emb(spark)
    idx = EmbeddingNearDupIndex(str(tmp_path / "end"), n_tables=8)
    idx.build(spark, emb.filter("vec_id < 50"))
    other = EmbeddingNearDupIndex(str(tmp_path / "end"), n_tables=4)
    with pytest.raises(ValueError, match="built with"):
        other.update_incremental(spark, emb.filter("vec_id >= 50"),
                                 run_id="u")
    with pytest.raises(ValueError, match="append-only"):
        idx.update_incremental(spark, emb.filter("vec_id < 10"),
                               run_id="u2")


def test_index_survives_lakehouse_maintenance(spark, tmp_path):
    """compact()/rewrite_manifests() commit snapshots without the param
    stamps; the param check must walk the chain instead of bricking the
    handle after routine maintenance."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, docs.filter("doc_id < 400"))
    before = set(map(tuple, idx.candidate_pairs(spark)
                     .select("doc_a", "doc_b").collect()))
    idx.sig_table.rewrite_manifests()
    idx.sig_table.compact(spark, target_file_rows=100)
    idx.pairs.rewrite_manifests()
    after = set(map(tuple, idx.candidate_pairs(spark)
                    .select("doc_a", "doc_b").collect()))
    assert after == before
    out = idx.update_incremental(spark, docs.filter("doc_id >= 400"),
                                 run_id="u-post-maint")
    assert out

def test_fully_landed_retry_with_different_content_raises(spark, tmp_path):
    """Reusing a past update's run_id with a DIFFERENT batch must raise,
    not silently drop the new batch: the old early return skipped the
    content check entirely when both appends had landed."""
    import pytest

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = NearDupIndex(str(tmp_path / "nd"))
    idx.build(spark, docs.filter("doc_id < 300"))
    batch1 = docs.filter("doc_id >= 300 and doc_id < 350")
    idx.update_incremental(spark, batch1, run_id="u1")
    # identical replay: verified no-op
    out = idx.update_incremental(spark, batch1, run_id="u1")
    assert out
    with pytest.raises(ValueError, match="identical batch content"):
        idx.update_incremental(spark, docs.filter("doc_id >= 350"),
                               run_id="u1")
