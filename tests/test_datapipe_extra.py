"""ANN LSH path: recall vs brute force on the embeddings table."""

from __future__ import annotations

import numpy as np

from wotan_spark.spark.datapipe import (cosine_topk, cosine_topk_ivf,
                                        cosine_topk_lsh,
                                        embedding_near_dup_pairs, ivf_assign,
                                        ivf_centroids, ngram_jaccard_pairs,
                                        ngram_jaccard_pairs_prefix)

SF_DIR = "/root/testdata/sf0.01"


def test_lsh_ann_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=5).collect()
    approx = cosine_topk_lsh(emb, qids, k=5, n_planes=4, n_tables=6).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # few planes + several tables: high recall on 500 vectors
    assert recall >= 0.6, f"LSH recall too low: {recall}"
    # candidates are a strict subset of the corpus; ranks well-formed
    for r in approx:
        assert 1 <= r.rank <= 5
        assert -1.0 <= r.cos_sim <= 1.0


def test_embedding_near_dups_lsh_recall(spark):
    """LSH near-dup variant: a subset of the exact pair set, with useful
    recall at this corpus size."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r.vec_id_a, r.vec_id_b)
             for r in embedding_near_dup_pairs(emb, threshold=0.3).collect()}
    approx = {(r.vec_id_a, r.vec_id_b)
              for r in embedding_near_dup_pairs(emb, threshold=0.3,
                                                method="lsh").collect()}
    assert approx <= exact          # rerank is exact -> no false positives
    assert exact, "fixture should contain near-dup pairs at tau=0.3"
    recall = len(approx) / len(exact)
    assert recall >= 0.5, f"LSH near-dup recall too low: {recall}"


def test_prefix_filtered_jaccard_equals_unfiltered(spark):
    """Prefix filtering is exact-preserving: identical pair set and
    jaccard values to the full inverted-index pass."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = {(r.doc_a, r.doc_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    pref = {(r.doc_a, r.doc_b): r.jaccard
            for r in ngram_jaccard_pairs_prefix(docs,
                                                threshold=0.4).collect()}
    assert set(full) == set(pref)
    for k in full:
        np.testing.assert_allclose(full[k], pref[k], rtol=1e-12)


def test_ivf_assignment_partitions_corpus(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    C = ivf_centroids(emb, n_centroids=8)
    assert C.shape[0] == 8
    np.testing.assert_allclose(np.linalg.norm(C, axis=1), 1.0, rtol=1e-9)
    assigned = ivf_assign(emb, C)
    assert assigned.count() == n                      # total partition
    cells = assigned.groupBy("centroid_id").count().collect()
    assert len(cells) >= 2                            # corpus actually splits
    assert sum(r["count"] for r in cells) == n


def test_ivf_ann_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(emb, qids, k=5).collect()
    approx = cosine_topk_ivf(emb, qids, k=5, n_centroids=8,
                             nprobe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing half the cells on 500 vectors: near-exact
    assert recall >= 0.7, f"IVF recall too low: {recall}"
    for r in approx:
        assert 1 <= r.rank <= 5
        assert -1.0 <= r.cos_sim <= 1.0
