"""Rollup / downsample / retention tiers with continuous-aggregate cascade.

Tier-10 aggregates are computed inside the same packed, shuffle-free pass
shape as the detrend itself: bucket membership (``t div 10``) is a
within-series property, so one ``mapInPandas`` over the packed arrays emits
bucket rows with no exchange.  Tier-100 is then *cascaded from tier-10*
(never from raw) as a plain ``groupBy`` over additive components — the
continuous-aggregate pattern: count/sum/min/max re-aggregate exactly;
``*_mean`` is re-derived as sum/count; the non-additive median exists only
at tier-10.

Aggregation semantics: NaN samples (gap sentinels / NaN trend regions) are
excluded; ``n`` counts non-NaN raw samples per bucket; an all-NaN bucket
yields NULL aggregates but keeps its row (n may be 0 only for flat/trend
whose estimator NaN-ed the edge).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from wotan_spark.spark.synth import decode_tokens

TIER_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("bucket", LongType(), False),
    StructField("n", LongType(), False),
    StructField("y_sum", DoubleType(), True),
    StructField("y_mean", DoubleType(), True),
    StructField("y_median", DoubleType(), True),
    StructField("y_min", DoubleType(), True),
    StructField("y_max", DoubleType(), True),
    StructField("trend_n", LongType(), False),
    StructField("trend_sum", DoubleType(), True),
    StructField("trend_mean", DoubleType(), True),
    StructField("flat_n", LongType(), False),
    StructField("flat_sum", DoubleType(), True),
    StructField("flat_mean", DoubleType(), True),
])


def _bucket_stats(t: np.ndarray, v: np.ndarray, factor: int,
                  with_median: bool = True):
    """Per-bucket (t div factor) nan-aware stats of v, vectorized via
    reduceat over the sorted (already ordered) time axis."""
    buckets = (t // factor).astype(np.int64)
    # bucket boundaries in the dense ordered array
    edges = np.flatnonzero(np.diff(buckets)) + 1
    starts = np.concatenate(([0], edges))
    ids = buckets[starts]
    ok = ~np.isnan(v)
    vz = np.where(ok, v, 0.0)
    cnt = np.add.reduceat(ok.astype(np.int64), starts)
    s = np.add.reduceat(vz, starts)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(cnt > 0, s / cnt, np.nan)
    s = np.where(cnt > 0, s, np.nan)
    mins = np.full(len(ids), np.nan)
    maxs = np.full(len(ids), np.nan)
    meds = np.full(len(ids), np.nan)
    bounds = np.concatenate((starts, [len(t)]))
    for j in range(len(ids)):
        seg = v[bounds[j]:bounds[j + 1]]
        seg = seg[~np.isnan(seg)]
        if len(seg):
            mins[j] = seg.min()
            maxs[j] = seg.max()
            if with_median:
                meds[j] = np.median(seg)
    return ids, cnt, s, mean, meds, mins, maxs


def rollup_tier10(detrended: DataFrame, factor: int = 10) -> DataFrame:
    """Packed detrended output -> tier-10 bucket rows.  No shuffle: bucket
    aggregation is within-series."""

    def roll(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "bucket", "n", "y_sum", "y_mean",
                                   "y_median", "y_min", "y_max", "trend_n",
                                   "trend_sum", "trend_mean", "flat_n",
                                   "flat_sum", "flat_mean")}
            for doc_id, tokens, flat, trend in zip(
                    pdf["doc_id"], pdf["tokens"], pdf["flat"], pdf["trend"]):
                y = decode_tokens(np.asarray(tokens, dtype=np.int32))
                flat = np.asarray(flat, dtype=np.float64)
                trend = np.asarray(trend, dtype=np.float64)
                t = np.arange(len(y), dtype=np.int64)
                ids, cnt, ysum, ymean, ymed, ymin, ymax = _bucket_stats(
                    t, y, factor)
                _, tcnt, tsum, tmean, _, _, _ = _bucket_stats(
                    t, trend, factor, with_median=False)
                _, fcnt, fsum, fmean, _, _, _ = _bucket_stats(
                    t, flat, factor, with_median=False)
                k = len(ids)
                out["doc_id"].extend([doc_id] * k)
                out["bucket"].extend(ids.tolist())
                out["n"].extend(cnt.tolist())
                out["y_sum"].extend(ysum.tolist())
                out["y_mean"].extend(ymean.tolist())
                out["y_median"].extend(ymed.tolist())
                out["y_min"].extend(ymin.tolist())
                out["y_max"].extend(ymax.tolist())
                out["trend_n"].extend(tcnt.tolist())
                out["trend_sum"].extend(tsum.tolist())
                out["trend_mean"].extend(tmean.tolist())
                out["flat_n"].extend(fcnt.tolist())
                out["flat_sum"].extend(fsum.tolist())
                out["flat_mean"].extend(fmean.tolist())
            pdf_out = pd.DataFrame(out)
            yield pdf_out

    return detrended.mapInPandas(roll, schema=TIER_SCHEMA)


def cascade_tier(tier: DataFrame, step: int = 10) -> DataFrame:
    """Continuous aggregate: next retention tier from the previous tier
    (exact for the additive components; median is tier-10-only so the
    cascaded table reports NULL there)."""
    g = tier.groupBy(
        "doc_id", (F.col("bucket") / step).cast("long").alias("bucket"))
    agg = g.agg(
        F.sum("n").alias("n"),
        F.sum("y_sum").alias("y_sum"),
        F.min("y_min").alias("y_min"),
        F.max("y_max").alias("y_max"),
        F.sum("trend_n").alias("trend_n"),
        F.sum("trend_sum").alias("trend_sum"),
        F.sum("flat_n").alias("flat_n"),
        F.sum("flat_sum").alias("flat_sum"),
    )
    return agg.select(
        "doc_id", "bucket", "n", "y_sum",
        (F.col("y_sum") / F.col("n")).alias("y_mean"),
        F.lit(None).cast("double").alias("y_median"),
        "y_min", "y_max", "trend_n", "trend_sum",
        (F.col("trend_sum") / F.col("trend_n")).alias("trend_mean"),
        "flat_n", "flat_sum",
        (F.col("flat_sum") / F.col("flat_n")).alias("flat_mean"),
    )


def explode_points(sequences: DataFrame, drop_null: bool = False) -> DataFrame:
    """Long-form view for SQL-native window operators:
    (doc_id, t, y, source).  Sentinel tokens decode to NULL."""
    pts = sequences.select(
        "doc_id", "source",
        F.posexplode("tokens").alias("t", "token"))
    y = F.when(F.col("token") == -2147483648, F.lit(None).cast("double")) \
         .otherwise(1.0 + F.col("token").cast("double") / 1e6)
    pts = pts.select("doc_id", "source", F.col("t").cast("long").alias("t"),
                     y.alias("y"))
    if drop_null:
        pts = pts.filter(F.col("y").isNotNull())
    return pts
