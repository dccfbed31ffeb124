"""Maintained IVF-PQ ANN index (round-5 verdict item 5): persisted
quantizers + per-vector codes as SnapshotTables, O(delta) incremental
encoding, IVFADC search with exact rerank."""

from __future__ import annotations

import pytest

from wotan_spark.spark.ann_index import AnnIndex
from wotan_spark.spark.datapipe import cosine_topk

SF_DIR = "/root/testdata/sf0.01"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _topk_set(rows):
    return {(r.query_id, r.neighbor_id) for r in rows}


def test_build_then_search_recall(spark, tmp_path):
    emb = _emb(spark)
    idx = AnnIndex(str(tmp_path / "ann"))
    out = idx.build(spark, emb)
    assert set(out) == {"model_snapshot", "codes_snapshot"}
    qids = [0, 1, 2, 3, 4]
    exact = _topk_set(cosine_topk(emb, qids, k=5).collect())
    got = idx.search(spark, emb, qids, k=5, nprobe=6,
                     rerank=64).collect()
    recall = len(exact & _topk_set(got)) / len(exact)
    assert recall >= 0.6, f"IVFADC recall too low: {recall}"
    for r in got:
        assert 1 <= r.rank <= 5 and -1.0 <= r.cos_sim <= 1.0


def test_incremental_equals_full_rebuild_assignment(spark, tmp_path):
    """Frozen-model invariant: encoding a batch incrementally produces
    EXACTLY the rows a one-shot encode of the whole corpus would — codes
    are a pure function of (vector, model)."""
    emb = _emb(spark)
    a = emb.filter("vec_id % 3 != 2")
    b = emb.filter("vec_id % 3 = 2")
    idx = AnnIndex(str(tmp_path / "ann"))
    idx.build(spark, a)
    out = idx.update_incremental(spark, b, run_id="u1")
    assert out["new_rows"] == b.count()
    # one-shot encode of the SAME vectors with the SAME frozen model
    C, B, _sid = idx._load_model(spark)
    want = {(r.vec_id, r.centroid_id, tuple(r.codes))
            for r in idx._assign_encode(emb, C, B).collect()}
    got = {(r.vec_id, r.centroid_id, tuple(r.codes))
           for r in idx.codes.read(spark).collect()}
    assert got == want


def test_update_touches_o_delta_rows(spark, tmp_path):
    """The appended snapshot's new data dir holds exactly the delta's
    rows — the corpus is not re-encoded (manifest stats prove it)."""
    emb = _emb(spark)
    a = emb.filter("vec_id < 400")
    b = emb.filter("vec_id >= 400")
    n_b = b.count()
    idx = AnnIndex(str(tmp_path / "ann"))
    idx.build(spark, a)
    out = idx.update_incremental(spark, b, run_id="u1")
    sid = out["codes_snapshot"]
    last_dir = idx.codes._manifest(sid)["files"][-1]
    rows = sum(s["rows"] for s in idx.codes._load_stats(last_dir).values())
    assert rows == n_b == out["new_rows"]


def test_update_idempotent_and_content_guarded(spark, tmp_path):
    emb = _emb(spark)
    a = emb.filter("vec_id % 2 = 0")
    b = emb.filter("vec_id % 2 = 1")
    idx = AnnIndex(str(tmp_path / "ann"))
    idx.build(spark, a)
    first = idx.update_incremental(spark, b, run_id="u1")
    again = idx.update_incremental(spark, b, run_id="u1")   # replay: no-op
    assert again["codes_snapshot"] == first["codes_snapshot"]
    assert idx.codes.read(spark).count() == emb.count()
    # same run_id, different content: refused
    with pytest.raises(ValueError, match="fingerprint"):
        idx.update_incremental(spark, b.limit(5), run_id="u1")
    # already-indexed identity under a NEW run_id: refused loudly
    with pytest.raises(ValueError, match="already indexed"):
        idx.update_incremental(spark, b.limit(5), run_id="u2")


def test_search_after_incremental_update_sees_new_vectors(spark,
                                                          tmp_path):
    """New vectors are searchable immediately after their O(delta)
    update: hold out the exact top-1 neighbors of the probe queries and
    check they reappear in the results once ingested."""
    emb = _emb(spark)
    qids = [0, 1, 2]
    top1 = {r.neighbor_id
            for r in cosine_topk(emb, qids, k=1).collect()}
    rest = emb.filter(~emb.vec_id.isin([int(x) for x in top1]))
    held = emb.filter(emb.vec_id.isin([int(x) for x in top1]))
    idx = AnnIndex(str(tmp_path / "ann"))
    idx.build(spark, rest)
    before = _topk_set(idx.search(spark, emb, qids, k=5, nprobe=6,
                                  rerank=64).collect())
    assert not {n for _q, n in before} & top1
    idx.update_incremental(spark, held, run_id="u1")
    after = _topk_set(idx.search(spark, emb, qids, k=5, nprobe=6,
                                 rerank=64).collect())
    assert {n for _q, n in after} & top1, \
        "ingested exact-top-1 vectors must surface in the probed cells"


def test_param_and_retrain_guards(spark, tmp_path):
    emb = _emb(spark)
    idx = AnnIndex(str(tmp_path / "ann"), n_centroids=8)
    with pytest.raises(ValueError, match="no model"):
        idx.update_incremental(spark, emb, run_id="u0")
    idx.build(spark, emb.filter("vec_id < 300"))
    other = AnnIndex(str(tmp_path / "ann"), n_centroids=16)
    with pytest.raises(ValueError, match="built with"):
        other.search(spark, emb, [0], k=3)
    # retrain = new generation over the full corpus; codes overwritten
    idx.retrain(spark, emb)
    assert idx.codes.read(spark).count() == emb.count()
    got = idx.search(spark, emb, [0, 1], k=3, nprobe=4, rerank=32)
    assert got.count() == 6


def test_crashed_retrain_is_detected_loudly(spark, tmp_path):
    """A retrain() that commits its model but dies before the codes
    overwrite must not serve mixed generations: search and update both
    validate the codes HEAD's model_snapshot stamp and raise."""
    from wotan_spark.spark.datapipe import ivf_centroids, pq_codebooks

    emb = _emb(spark)
    a = emb.filter("vec_id < 400")
    idx = AnnIndex(str(tmp_path / "ann"))
    idx.build(spark, a)
    # simulate the crash window: a new model generation lands, codes don't
    C = ivf_centroids(a, n_centroids=idx.n_centroids)
    B = pq_codebooks(a, m=idx.m, n_centroids=idx.pq_centroids)
    idx._store_model(spark, C, B, run_id="retrain-crash", op="build")
    with pytest.raises(ValueError, match="retrain"):
        idx.search(spark, emb, [0, 1], k=3)
    with pytest.raises(ValueError, match="retrain"):
        idx.update_incremental(spark, emb.filter("vec_id >= 400"),
                               run_id="u-after-crash")
    # a completed retrain restores a consistent generation
    idx.retrain(spark, a, run_id="retrain-ok")
    assert idx.search(spark, emb, [0, 1], k=3).count() > 0


def test_crashed_build_is_detected_loudly(spark, tmp_path):
    """A build() that commits its model but dies before the codes
    overwrite (one commit earlier than the crashed-retrain window) must
    not be silently adopted: an update would land the delta as the whole
    index and search would serve neighbors from the delta only."""
    from wotan_spark.spark.datapipe import ivf_centroids, pq_codebooks

    emb = _emb(spark)
    idx = AnnIndex(str(tmp_path / "ann"))
    # simulate the crash window: model lands, codes table never written
    C = ivf_centroids(emb, n_centroids=idx.n_centroids)
    B = pq_codebooks(emb, m=idx.m, n_centroids=idx.pq_centroids)
    idx._store_model(spark, C, B, run_id="build-crash", op="build")
    with pytest.raises(ValueError, match="no snapshot"):
        idx.update_incremental(spark, emb.filter("vec_id >= 450"),
                               run_id="u-after-crashed-build")
    with pytest.raises(ValueError, match="no snapshot"):
        idx.search(spark, emb, [0, 1], k=3)
    # a completed build restores the index
    idx.build(spark, emb)
    assert idx.search(spark, emb, [0, 1], k=3).count() == 6


def test_lakehouse_maintenance_keeps_index_usable(spark, tmp_path):
    """compact() / rewrite_manifests() on the index tables commit new
    snapshots WITHOUT the model_snapshot / parameter stamps; the stamps
    must be resolved by walking the chain, not read off HEAD — otherwise
    routine maintenance bricks the index until a full retrain."""
    emb = _emb(spark)
    idx = AnnIndex(str(tmp_path / "ann"))
    idx.build(spark, emb.filter("vec_id < 400"))
    before = _topk_set(idx.search(spark, emb, [0, 1], k=3,
                                  nprobe=6, rerank=64).collect())
    idx.codes.compact(spark, target_file_rows=100)
    idx.codes.rewrite_manifests()
    idx.model.rewrite_manifests()
    after = _topk_set(idx.search(spark, emb, [0, 1], k=3,
                                 nprobe=6, rerank=64).collect())
    assert after == before
    # updates still work and stay generation-checked after maintenance
    out = idx.update_incremental(spark, emb.filter("vec_id >= 400"),
                                 run_id="u-post-compact")
    assert out["new_rows"] == emb.filter("vec_id >= 400").count()


def test_intra_batch_duplicate_vec_id_rejected(spark, tmp_path):
    """The append-only identity guard must also hold WITHIN one ingest
    batch: a vec_id duplicated by upstream join fan-out would land twice
    and occupy two top-k slots in every search that reaches it."""
    emb = _emb(spark)
    idx = AnnIndex(str(tmp_path / "ann"))
    idx.build(spark, emb.filter("vec_id < 450"))
    delta = emb.filter("vec_id >= 450")
    doubled = delta.union(delta.limit(1))
    with pytest.raises(ValueError, match="times"):
        idx.update_incremental(spark, doubled, run_id="u-dup")
    # the clean batch still lands (the failed attempt committed nothing)
    out = idx.update_incremental(spark, delta, run_id="u-clean")
    assert out["new_rows"] == delta.count()


def test_search_prunes_non_probed_cells_at_file_level(spark, tmp_path):
    """The IVF point: code writes are clustered by centroid_id, so a
    search's posting-list read skips non-probed cells' files entirely
    (where_in stats pruning), not post-scan.  Results stay identical to
    an unpruned scoring pass (existing recall/parity tests)."""
    emb = _emb(spark)
    idx = AnnIndex(str(tmp_path / "ann"), n_centroids=16)
    idx.build(spark, emb)
    got = idx.search(spark, emb, [0, 1], k=3, nprobe=2, rerank=32)
    assert got.count() > 0
    scan = idx.codes.last_scan
    # 2 queries x 2 probes <= 4 distinct cells of 16: most files skipped
    assert scan["files_pruned"] > 0, scan
    assert scan["files_read"] < scan["files_read"] + scan["files_pruned"]
    assert scan["files_read"] <= scan["files_pruned"], scan


def test_maintain_restores_posting_list_locality(spark, tmp_path):
    """After a stack of incremental appends, maintain() re-clusters the
    code table by centroid_id: identical search results, fewer data
    files, and the where_in posting-list pruning still skips non-probed
    cells."""
    emb = _emb(spark)
    idx = AnnIndex(str(tmp_path / "ann"), n_centroids=16)
    idx.build(spark, emb.filter("vec_id % 4 = 0"))
    for k in (1, 2, 3):
        idx.update_incremental(spark, emb.filter(f"vec_id % 4 = {k}"),
                               run_id=f"u{k}")
    before_files = len(idx.codes.data_files())
    before = _topk_set(idx.search(spark, emb, [0, 1], k=3,
                                  nprobe=2, rerank=32).collect())
    idx.maintain(spark, target_file_rows=200)
    assert len(idx.codes.data_files()) < before_files
    after = _topk_set(idx.search(spark, emb, [0, 1], k=3,
                                 nprobe=2, rerank=32).collect())
    assert after == before
    scan = idx.codes.last_scan
    assert scan["files_pruned"] > 0, scan
    # maintenance does not change the model generation: updates still land
    rec = idx.codes.find_snapshot(op="maintain")
    assert rec is not None and rec["meta"].get("compaction") is True
