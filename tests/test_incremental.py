"""Incremental continuous-aggregate update == full recompute."""

from __future__ import annotations

import pyspark.sql.functions as F

from wotan_spark.spark.pipeline import Pipeline, PipelineConfig
from wotan_spark.spark.rollup import detrend_rollup_fused
from wotan_spark.spark.synth import synth_sequences


def test_incremental_matches_full(spark, tmp_path):
    cfg = PipelineConfig(method="mean", window_length=17)
    all_seq = synth_sequences(spark, 10, median_len=150, max_len=400)
    first = all_seq.filter("doc_id < 'doc_00000006'")
    late = all_seq.filter("doc_id >= 'doc_00000006'")

    p = Pipeline(spark, str(tmp_path / "inc"), cfg)
    p.run(sequences=first, stop_after="tier100")
    p.update_incremental(late)

    merged = p.tables["tier10"].read(spark)
    full = detrend_rollup_fused(all_seq, "mean", window_length=17)
    assert merged.count() == full.count()
    diff = (full.select("doc_id", "bucket", "y_sum", "n")
            .exceptAll(merged.select("doc_id", "bucket", "y_sum", "n"))
            .count())
    assert diff == 0
    # tier100 merged too
    assert p.tables["tier100"].read(spark).filter(
        F.col("doc_id") >= "doc_00000006").count() > 0
