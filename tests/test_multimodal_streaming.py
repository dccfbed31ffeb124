"""Multimodal plumbing + streaming ingestion tests."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from wotan_spark.spark.multimodal import (dedup_media_exact, extract_features,
                                          frame_sample, resize_media,
                                          synth_media)


def test_media_features_roundtrip(spark):
    media = synth_media(spark, 20)
    feats = extract_features(media).collect()
    assert len(feats) == 20
    by_id = {r.media_id: r for r in feats}
    raw = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, r in by_id.items():
        assert r.sha1 == hashlib.sha1(raw[mid]).hexdigest()
        assert r.n_bytes == len(raw[mid])
        np.testing.assert_allclose(sum(r.features), 1.0, rtol=1e-9)


def test_frame_sample_decimates(spark):
    media = synth_media(spark, 10).filter("modality = 'audio'")
    sampled = frame_sample(media, every=4)
    orig = {r.media_id: len(bytes(r.payload)) for r in media.collect()}
    for r in sampled.collect():
        expect = (orig[r.media_id] + 3) // 4
        assert len(bytes(r.payload)) == expect
        assert r.n_frames == expect


def test_resize_media_images_only(spark):
    media = synth_media(spark, 10)
    out = {r.media_id: r for r in resize_media(media, 8, 8).collect()}
    orig = {r.media_id: r for r in media.collect()}
    for mid, r in out.items():
        if r.modality == "image":
            assert (r.width, r.height) == (8, 8)
            assert len(bytes(r.payload)) == 64
            # nearest-neighbor: every output byte exists in the source image
            src = np.frombuffer(bytes(orig[mid].payload), dtype=np.uint8)
            dst = np.frombuffer(bytes(r.payload), dtype=np.uint8)
            assert np.isin(dst, src).all()
            # corner pixel is exact under the floor-index gather
            assert dst[0] == src[0]
        else:  # audio passes through untouched
            assert bytes(r.payload) == bytes(orig[mid].payload)


def test_unknown_codec_raises(spark):
    from wotan_spark.spark.multimodal import _decode_payload
    with pytest.raises(NotImplementedError):
        _decode_payload("jpeg", b"\xff\xd8")


def test_media_dedup_exact(spark):
    media = synth_media(spark, 12)
    dupes = media.union(media.limit(3))  # inject exact duplicates
    out = dedup_media_exact(dupes).collect()
    assert len(out) == 3
    assert all(r.dup_count == 2 for r in out)


def test_streaming_ingestion_incremental(spark, tmp_path):
    from wotan_spark.spark.lakehouse import SnapshotTable
    from wotan_spark.spark.rollup import detrend_rollup_fused
    from wotan_spark.spark.streaming import run_ingestion
    from wotan_spark.spark.synth import synth_sequences

    landing = str(tmp_path / "landing")
    table_root = str(tmp_path / "tier10")
    ckpt = str(tmp_path / "ckpt")

    seq_a = synth_sequences(spark, 6, median_len=150, max_len=400)
    seq_a.write.mode("overwrite").parquet(landing)
    run_ingestion(spark, landing, table_root, ckpt, method="mean",
                  window_length=17)
    t = SnapshotTable(table_root)
    n1 = t.read(spark).count()
    assert n1 > 0

    # late batch lands -> second drain only processes the new files
    seq_b = synth_sequences(spark, 12, median_len=150, max_len=400) \
        .filter("doc_id >= 'doc_00000006'")
    seq_b.write.mode("append").parquet(landing)
    run_ingestion(spark, landing, table_root, ckpt, method="mean",
                  window_length=17)
    merged = t.read(spark)
    n2 = merged.count()
    assert n2 > n1
    assert merged.select("doc_id").distinct().count() == 12

    # equivalence with a one-shot batch run over the same 12 docs
    batch = detrend_rollup_fused(
        spark.read.parquet(landing), "mean", window_length=17)
    assert batch.count() == n2
    diff = (batch.select("doc_id", "bucket", "y_sum").exceptAll(
        merged.select("doc_id", "bucket", "y_sum"))).count()
    assert diff == 0
