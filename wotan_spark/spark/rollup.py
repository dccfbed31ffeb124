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

import warnings
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from wotan_spark.spark.synth import SENTINEL, decode_tokens

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


def _bucket_stats(v: np.ndarray, factor: int, with_median: bool = True):
    """Per-bucket nan-aware stats of v over the dense time axis
    t = 0..n-1 (token index), fully vectorized: pad to a bucket multiple,
    reshape to (n_buckets, factor), reduce along rows.  No Python loop."""
    n = len(v)
    nb = (n + factor - 1) // factor
    pad = nb * factor - n
    vp = np.concatenate([v, np.full(pad, np.nan)]) if pad else v
    M = vp.reshape(nb, factor)
    ok = ~np.isnan(M)
    cnt = ok.sum(axis=1).astype(np.int64)
    s = np.where(ok, M, 0.0).sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = np.where(cnt > 0, s / cnt, np.nan)
    s = np.where(cnt > 0, s, np.nan)
    mins = np.where(ok, M, np.inf).min(axis=1)
    mins = np.where(cnt > 0, mins, np.nan)
    maxs = np.where(ok, M, -np.inf).max(axis=1)
    maxs = np.where(cnt > 0, maxs, np.nan)
    if with_median:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            meds = np.nanmedian(M, axis=1)
    else:
        meds = np.full(nb, np.nan)
    ids = np.arange(nb, dtype=np.int64)
    return ids, cnt, s, mean, meds, mins, maxs


_TIER_KEYS = ("bucket", "n", "y_sum", "y_mean", "y_median", "y_min",
              "y_max", "trend_n", "trend_sum", "trend_mean", "flat_n",
              "flat_sum", "flat_mean")


def _tier_arrays(y: np.ndarray, flat: np.ndarray, trend: np.ndarray,
                 factor: int, b0: int = 0) -> tuple:
    """The 13 ``TIER_SCHEMA`` column arrays for one series (bucket ids
    offset by ``b0`` for chunked cores) — the ONE definition of the
    tier-row layout, shared by the chained, fused and chunked passes
    (three hand-copied assembly loops had already started drifting)."""
    ids, cnt, ysum, ymean, ymed, ymin, ymax = _bucket_stats(y, factor)
    _, tcnt, tsum, tmean, _, _, _ = _bucket_stats(
        trend, factor, with_median=False)
    _, fcnt, fsum, fmean, _, _, _ = _bucket_stats(
        flat, factor, with_median=False)
    return (ids + b0 if b0 else ids, cnt, ysum, ymean, ymed, ymin, ymax,
            tcnt, tsum, tmean, fcnt, fsum, fmean)


def _tier_frame(doc_ids: list, rows: list) -> pd.DataFrame:
    """Concatenate per-series (repeated doc_id, 13-column tuple) rows into
    one ``TIER_SCHEMA`` pandas frame; empty-batch safe."""
    if not doc_ids:
        return pd.DataFrame({k: [] for k in ("doc_id",) + _TIER_KEYS})
    out = {"doc_id": np.concatenate(doc_ids)}
    for i, k in enumerate(_TIER_KEYS):
        out[k] = np.concatenate([r[i] for r in rows])
    return pd.DataFrame(out)


def rollup_tier10(detrended: DataFrame, factor: int = 10) -> DataFrame:
    """Packed detrended output -> tier-10 bucket rows.  No shuffle: bucket
    aggregation is within-series."""

    def roll(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[np.ndarray] = []
            rows: list[tuple] = []
            for doc_id, tokens, flat, trend in zip(
                    pdf["doc_id"], pdf["tokens"], pdf["flat"], pdf["trend"]):
                y = decode_tokens(np.asarray(tokens, dtype=np.int32))
                cols = _tier_arrays(y, np.asarray(flat, dtype=np.float64),
                                    np.asarray(trend, dtype=np.float64),
                                    factor)
                doc_ids.append(np.repeat(doc_id, len(cols[0])))
                rows.append(cols)
            yield _tier_frame(doc_ids, rows)

    return detrended.mapInPandas(roll, schema=TIER_SCHEMA)


def detrend_rollup_fused(df: DataFrame, method: str = "biweight",
                         factor: int = 10, mask_col: str | None = None,
                         mask_transit: tuple[float, float, float]
                         | None = None, **params) -> DataFrame:
    """Fused detrend + tier rollup in ONE ``mapInPandas`` pass: half the
    Arrow traffic of chaining the two operators (the full-resolution
    flat/trend arrays never cross back into the JVM), zero shuffle.  The
    pipeline hot path when only tier tables are needed.

    ``mask_col`` / ``mask_transit`` carry the known-signal mask exactly as
    in ``detrend_sequences`` (they become the per-row ``mask`` kernel
    parameter; forwarding them into the kernel verbatim was a crash —
    round-5b review finding)."""
    from wotan_spark.spark.detrend_op import _detrend_one
    params = dict(params, method=method)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wotan_spark.kernels.series import transit_mask as _tmask

        for pdf in batches:
            if mask_col is not None:
                masks = [np.asarray(m, dtype=bool) for m in pdf[mask_col]]
            elif mask_transit is not None:
                period, duration, t0 = mask_transit
                masks = [_tmask(np.arange(len(toks), dtype=np.float64),
                                period, duration, t0)
                         for toks in pdf["tokens"]]
            else:
                masks = None
            doc_ids: list[np.ndarray] = []
            rows: list[tuple] = []
            for row_i, (doc_id, toks) in enumerate(zip(pdf["doc_id"],
                                                       pdf["tokens"])):
                toks = np.asarray(toks, dtype=np.int32)
                p = (params if masks is None
                     else dict(params, mask=masks[row_i]))
                flat, trend = _detrend_one(toks, p)
                cols = _tier_arrays(decode_tokens(toks), flat, trend, factor)
                doc_ids.append(np.repeat(doc_id, len(cols[0])))
                rows.append(cols)
            yield _tier_frame(doc_ids, rows)

    return df.mapInPandas(run, schema=TIER_SCHEMA)


def detrend_rollup_fused_auto(df: DataFrame, method: str = "biweight",
                              factor: int = 10,
                              chunk_threshold: int | None = None,
                              chunk_size: int | None = None,
                              num_partitions: int | None = None,
                              **params) -> DataFrame:
    """Skew-safe fused detrend + tier rollup.

    Short rows take the zero-shuffle fused pass (``detrend_rollup_fused``).
    Rows past ``chunk_threshold`` tokens are overlap-chunked and salted
    across tasks — and because the chunk size is rounded to a bucket
    multiple, every tier bucket lies wholly inside exactly ONE chunk's core
    slice, so each chunk emits its core's tier rows directly: all stats
    (including the non-additive per-bucket median) are exact, the bucket
    rows of different chunks are disjoint, and no full-resolution
    flat/trend array is ever shuffled or reassembled.  Exactness vs the
    unchunked fused pass is pytest-asserted column-for-column.
    """
    from wotan_spark.spark.detrend_op import (_CHUNKABLE_METHODS,
                                              AUTO_CHUNK_THRESHOLD,
                                              _chunk_overlap, _detrend_one,
                                              split_chunks)

    if chunk_threshold is None:
        chunk_threshold = AUTO_CHUNK_THRESHOLD
    if method not in _CHUNKABLE_METHODS or "mask_col" in params \
            or "mask_transit" in params:
        # masked runs take the unchunked fused pass, which handles the
        # mask kwargs itself (a mask's irregular NaN pattern breaks the
        # chunk-core exactness argument)
        return detrend_rollup_fused(df, method, factor=factor, **params)
    if chunk_size is None:
        chunk_size = chunk_threshold
    chunk_size = max(factor, (chunk_size // factor) * factor)  # bucket-align

    run_params = dict(params, method=method)
    overlap = _chunk_overlap(run_params)

    short = df.filter(F.col("n_tok") <= chunk_threshold)
    long_ = df.filter(F.col("n_tok") > chunk_threshold)
    chunks = split_chunks(long_, chunk_size, overlap)
    if num_partitions is None:
        num_partitions = max(
            df.sparkSession.sparkContext.defaultParallelism, 8)
    # explicit count: a bare column repartition is AQE-coalescible (bytes
    # small, CPU heavy) — see detrend_sequences_chunked
    chunks = chunks.repartition(num_partitions,
                                F.col("doc_id"), F.col("chunk_id"))

    def roll_chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[np.ndarray] = []
            rows: list[tuple] = []
            for doc_id, toks, t0, lead, core in zip(
                    pdf["doc_id"], pdf["tokens"], pdf["t0"], pdf["lead"],
                    pdf["core"]):
                toks = np.asarray(toks, dtype=np.int32)
                flat, trend = _detrend_one(toks, run_params)
                sl = slice(int(lead), int(lead) + int(core))
                cols = _tier_arrays(decode_tokens(toks[sl]), flat[sl],
                                    trend[sl], factor,
                                    b0=int(t0) // factor)  # t0 bucket-aligned
                doc_ids.append(np.repeat(doc_id, len(cols[0])))
                rows.append(cols)
            yield _tier_frame(doc_ids, rows)

    long_tiers = chunks.mapInPandas(roll_chunk, schema=TIER_SCHEMA)
    return detrend_rollup_fused(short, method, factor=factor,
                                **params).unionByName(long_tiers)


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


def cascade_median_exact(tier_vals: DataFrame, key: str = "doc_id",
                         step: int = 10, vals: str = "vals") -> DataFrame:
    """Exact non-additive statistic at a coarser tier, recomputed from the
    finer tier's retained value arrays instead of from raw data.

    ``cascade_tier`` correctly reports NULL for the cascaded median (it
    does not re-aggregate); this is the escape hatch: the finer tier keeps
    ``collect_list`` value arrays per bucket, the coarser tier flattens
    ``step`` of them and takes the exact interpolated median — one shuffle
    on (key, coarse bucket), never a second scan of raw.  The median itself
    is pure Catalyst (array_sort + middle elements, numpy's even-count
    interpolation), so it stays in whole-stage codegen.
    """
    g = tier_vals.groupBy(
        key, (F.col("bucket") / step).cast("long").alias("bucket"))
    agg = g.agg(F.array_sort(F.flatten(F.collect_list(vals))).alias("sv"))
    n = F.size("sv")
    mid = F.element_at("sv", ((n + 1) / 2).cast("int"))
    lo = F.element_at("sv", (n / 2).cast("int"))
    hi = F.element_at("sv", (n / 2 + 1).cast("int"))
    med = (F.when(n == 0, F.lit(None).cast("double"))
           .when(n % 2 == 1, mid)
           .otherwise((lo + hi) / 2.0))
    return agg.select(key, "bucket", n.cast("long").alias("n"),
                      med.alias("y_median"))


def explode_points(sequences: DataFrame, drop_null: bool = False) -> DataFrame:
    """Long-form view for SQL-native window operators:
    (doc_id, t, y, source).  Sentinel tokens decode to NULL."""
    pts = sequences.select(
        "doc_id", "source",
        F.posexplode("tokens").alias("t", "token"))
    y = F.when(F.col("token") == int(SENTINEL),
               F.lit(None).cast("double")) \
         .otherwise(1.0 + F.col("token").cast("double") / 1e6)
    pts = pts.select("doc_id", "source", F.col("t").cast("long").alias("t"),
                     y.alias("y"))
    if drop_null:
        pts = pts.filter(F.col("y").isNotNull())
    return pts
