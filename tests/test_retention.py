"""Retention-policy enforcement + snapshot expiry (north-star: cascading
retention tiers where fine tiers age out and coarse tiers persist)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from wotan_spark.spark.lakehouse import SnapshotTable
from wotan_spark.spark.retention import (RetentionPolicy, apply_retention,
                                         cutoffs_from_policy,
                                         expire_snapshots)


@pytest.fixture()
def tier_tables(spark, tmp_path):
    t10 = SnapshotTable(str(tmp_path / "tier10"))
    t100 = SnapshotTable(str(tmp_path / "tier100"))
    rows10 = [(f"doc_{i % 3}", b, float(b)) for i in range(3)
              for b in range(20)]
    rows100 = [(f"doc_{i % 3}", b, float(b)) for i in range(3)
               for b in range(2)]
    t10.overwrite(spark.createDataFrame(
        rows10, "doc_id string, bucket long, y_sum double"), run_id="init")
    t100.overwrite(spark.createDataFrame(
        rows100, "doc_id string, bucket long, y_sum double"), run_id="init")
    return {"tier10": t10, "tier100": t100}


def test_retention_drops_fine_tier_keeps_coarse(spark, tier_tables):
    policy = RetentionPolicy({"tier10": 5, "tier100": None})
    pre_sid = tier_tables["tier10"].current_snapshot_id()
    cutoffs = cutoffs_from_policy(spark, tier_tables, policy)
    assert cutoffs == {"tier10": 15}     # max bucket 19, keep 5
    report = apply_retention(spark, tier_tables, cutoffs)
    assert report["tier10"]["dropped"] == 45 and report["tier10"]["kept"] == 15
    t10 = tier_tables["tier10"].read(spark)
    assert t10.agg(F.min("bucket")).collect()[0][0] == 15
    # the coarse tier is untouched; the policy keeps it forever
    assert tier_tables["tier100"].read(spark).count() == 6
    # retention is copy-on-write: the pre-retention snapshot still reads full
    old = tier_tables["tier10"].read(spark, snapshot_id=pre_sid)
    assert old.count() == 60


def test_expire_snapshots_reclaims_storage(spark, tier_tables):
    t10 = tier_tables["tier10"]
    apply_retention(spark, tier_tables, {"tier10": 10})
    apply_retention(spark, tier_tables, {"tier10": 15})
    assert len(t10.snapshots()) == 3
    old_dirs = set(t10._manifest(0)["files"])
    out = expire_snapshots(t10, keep_last=2)
    assert out["expired"] == 1 and out["dirs_deleted"] >= 1
    # current read unaffected; chain truncated to the kept snapshots
    assert t10.read(spark).agg(F.min("bucket")).collect()[0][0] == 15
    assert len(t10.snapshots()) == 2
    for d in old_dirs:
        assert not os.path.exists(d)


def test_expire_snapshots_preserves_retention_cutoff(spark, tier_tables):
    """Expiring the snapshot that recorded the retention cutoff must not
    disarm the late-data gate: the rewritten chain root carries the
    newest cutoff forward (ADVICE r2)."""
    from wotan_spark.spark.retention import retention_cutoff
    t10 = tier_tables["tier10"]
    apply_retention(spark, tier_tables, {"tier10": 15})
    # two post-retention commits push the retention snapshot off the tail
    for i in range(2):
        t10.overwrite(t10.read(spark), run_id=f"merge{i}")
    assert retention_cutoff(t10) == 15
    out = expire_snapshots(t10, keep_last=2)
    assert out["expired"] >= 1
    assert retention_cutoff(t10) == 15


def test_pipeline_enforce_retention_with_lineage(spark, tmp_path):
    """End-to-end: run the stage graph, then age out fine-tier buckets via
    the pipeline method — tier100 persists, lineage logs the commits."""
    from wotan_spark.spark.pipeline import Pipeline, PipelineConfig
    from wotan_spark.spark.retention import RetentionPolicy
    from wotan_spark.spark.synth import synth_sequences

    pipe = Pipeline(spark, str(tmp_path / "tables"),
                    PipelineConfig(method="mean", window_length=17.0))
    seq = synth_sequences(spark, 6, median_len=400, max_len=800)
    pipe.run(seq, run_id="r1")
    t10_before = pipe.tables["tier10"].read(spark).count()
    report = pipe.enforce_retention(
        RetentionPolicy({"tier10": 10, "tier100": None}))
    assert report["tier10"]["dropped"] > 0
    assert pipe.tables["tier10"].read(spark).count() < t10_before
    t10 = pipe.tables["tier10"].read(spark)
    hi = t10.agg(F.max("bucket")).collect()[0][0]
    assert t10.agg(F.min("bucket")).collect()[0][0] == hi - 10 + 1
    lineage = pipe.tables["lineage"].read(spark)
    assert lineage.filter("stage = 'retention-tier10'").count() >= 1


def test_late_data_does_not_resurrect_aged_out_buckets(spark, tmp_path):
    """After a retention commit, an incremental update carrying buckets
    OLDER than the cutoff must not re-insert them (while its fresh
    buckets still merge normally)."""
    from wotan_spark.spark.pipeline import Pipeline, PipelineConfig
    from wotan_spark.spark.retention import RetentionPolicy
    from wotan_spark.spark.synth import synth_sequences

    pipe = Pipeline(spark, str(tmp_path / "tables"),
                    PipelineConfig(method="mean", window_length=17.0))
    pipe.run(synth_sequences(spark, 6, median_len=400, max_len=800),
             run_id="r1")
    pipe.enforce_retention(RetentionPolicy({"tier10": 10}))
    t10 = pipe.tables["tier10"].read(spark)
    cutoff = t10.agg(F.min("bucket")).collect()[0][0]

    # a "late" full-history doc: its early buckets predate the cutoff,
    # its tail reaches past it
    import numpy as np
    from wotan_spark.spark.synth import SEQUENCES_SCHEMA
    toks = np.arange(820, dtype=np.int32) % 1000
    late = spark.createDataFrame(
        [("late_doc", toks.tolist(), 820, "synthetic")],
        schema=SEQUENCES_SCHEMA)
    pipe.update_incremental(late, run_id="late1")
    t10b = pipe.tables["tier10"].read(spark)
    assert t10b.agg(F.min("bucket")).collect()[0][0] >= cutoff
    mine = t10b.filter("doc_id = 'late_doc'")
    # fresh buckets merged; aged-out ones did not resurrect
    assert mine.count() > 0
    assert mine.agg(F.min("bucket")).collect()[0][0] >= cutoff
