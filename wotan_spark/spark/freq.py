"""Mergeable frequent-items (top-k) sketches as continuous-aggregate tiers.

Third member of the sketch family (histogram tiers -> bounded-error
quantiles, HLL tiers -> distinct counts): "which token values dominate
each retention bucket" via Spark's native DataSketches frequent-items
integration (``approx_top_k_accumulate`` / ``approx_top_k_combine`` /
``approx_top_k_estimate`` — SQL functions, JVM-side partial
aggregation, no UDF anywhere).

Exactness envelope, same discipline as the HLL tiers: while a bucket's
distinct-token count stays at or below ``max_items``, the sketch tracks
every item exactly — tier-10 (<=10 distinct) and tier-100 (<=100
distinct) report EXACT per-item counts, so the driver oracle is a plain
GROUP BY count.  Past ``max_items`` the sketch degrades to the classic
frequent-items guarantees (counts over-estimated by at most the
eviction error bound, heavy hitters retained) while staying mergeable
and bounded-memory — the at-scale top-k path.  One caveat at small k:
the ORDER among equal counts at the k boundary is sketch-internal;
callers needing determinism should request k >= the expected distinct
count (as the contract query does) or re-sort the estimate.

Plan shape mirrors ``spark/distinct.py``: one partial-aggregated
shuffle of finished sketch rows for the fine tier, ``step`` sketches
per group for the cascade.  Gap sentinels are excluded — a gap is not a
value.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from wotan_spark.spark.distinct import bucket_col, token_points

_MAX_ITEMS_CAP = 1_000_000      # ApproxTopK maxItemsTracked hard limit


def _check_max_items(max_items: int) -> None:
    if not 1 <= max_items <= _MAX_ITEMS_CAP:
        raise ValueError(
            f"max_items must be in [1, {_MAX_ITEMS_CAP}]")


def tier_topk(sequences: DataFrame, factor: int = 10,
              max_items: int = 1024) -> DataFrame:
    """Per-(series, ``t div factor``) frequent-items sketch of token
    values from the packed sequence table: (doc_id, bucket, sk)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    _check_max_items(max_items)
    return (token_points(sequences)
            .groupBy("doc_id", bucket_col("t", factor))
            .agg(F.expr(f"approx_top_k_accumulate(token, {int(max_items)})")
                 .alias("sk")))


def cascade_topk(tier: DataFrame, step: int = 10,
                 max_items: int = 1024) -> DataFrame:
    """Coarser-tier sketches by frequent-items merge — never re-reads
    raw data."""
    if step < 1:
        raise ValueError("step must be >= 1")
    _check_max_items(max_items)
    return (tier.groupBy("doc_id", bucket_col("bucket", step))
            .agg(F.expr(f"approx_top_k_combine(sk, {int(max_items)})")
                 .alias("sk")))


def topk_estimate(tier: DataFrame, k: int = 10) -> DataFrame:
    """Materialize the top-``k`` items per sketch row, EXPLODED to
    (doc_id, bucket, token, cnt) — row-shaped so ordering among equal
    counts never matters to consumers that re-aggregate or join."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return (tier.select(
        "doc_id", "bucket",
        F.explode(F.expr(f"approx_top_k_estimate(sk, {int(k)})"))
        .alias("e"))
        .select("doc_id", "bucket",
                F.col("e.item").alias("token"),
                F.col("e.count").cast("long").alias("cnt")))
