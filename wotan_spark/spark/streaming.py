"""Structured Streaming ingestion into the rollup tiers.

The batch engine's incremental boundary is the lakehouse snapshot; this
module adds the streaming front door: a file-source ``readStream`` over
landing parquet of sequences, ``Trigger.AvailableNow`` micro-batches, each
batch run through the fused detrend+tier rollup and MERGE-upserted into the
tier table via ``foreachBatch`` (exactly-once per batch at the snapshot
level: checkpointed source offsets + atomic snapshot commit).

The reference is a batch library with no streaming surface; this implements
the "continuous aggregate" semantics of the engine's rule set for late-
arriving sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from wotan_spark.spark.lakehouse import SnapshotTable
from wotan_spark.spark.rollup import detrend_rollup_fused
from wotan_spark.spark.synth import SEQUENCES_SCHEMA


def stream_sequences(spark: SparkSession, landing_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (spark.readStream.schema(SEQUENCES_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(landing_dir)


def run_ingestion(spark: SparkSession, landing_dir: str, table_root: str,
                  checkpoint_dir: str, method: str = "biweight",
                  window_length: float = 17.0, factor: int = 10):
    """Drain all available landing files into the tier-10 table, one
    MERGE-committed snapshot per micro-batch.  Returns the streaming query
    (already awaiting termination under AvailableNow)."""
    tier_table = SnapshotTable(table_root)
    stream = stream_sequences(spark, landing_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        t10 = detrend_rollup_fused(batch_df, method,
                                   window_length=window_length, factor=factor)
        tier_table.merge_buckets(spark, t10, keys=["doc_id", "bucket"],
                                 stream_batch=batch_id)

    q = (stream.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
