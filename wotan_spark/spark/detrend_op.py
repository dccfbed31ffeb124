"""Distributed detrend over packed token arrays.

The input table is one-series-per-row, so detrending is embarrassingly
parallel: a single ``mapInPandas`` pass decodes each row's tokens, runs the
per-series pipeline kernel (``wotan_spark.kernels.detrend.detrend_series``)
and emits packed ``flat``/``trend`` arrays — **zero shuffle**, unlike an
explode -> groupBy plan which would multiply 10^12 rows by sequence length.

Skew handling for heavy-tailed sequence lengths (the ``n_tok`` lognormal
tail): ``detrend_sequences_chunked`` splits long rows into overlapping chunk
rows, round-robin ``repartition``s them so one 50k-token doc doesn't pin a
task, detrends each chunk, and reassembles trimmed chunks with one shuffle
on doc_id.  Overlap >= window + break_tolerance makes interior points exact
(window estimators are local; verified by test against the unchunked path).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from wotan_spark.kernels.detrend import detrend_series
from wotan_spark.spark.synth import decode_tokens

DETREND_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("n_tok", IntegerType(), False),
    StructField("source", StringType(), True),
    StructField("flat", ArrayType(DoubleType(), True), True),
    StructField("trend", ArrayType(DoubleType(), True), True),
])

CHUNK_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("chunk_id", IntegerType(), False),
    StructField("t0", LongType(), False),
    StructField("lead", IntegerType(), False),
    StructField("core", IntegerType(), False),
    StructField("n_tok", IntegerType(), False),
    StructField("source", StringType(), True),
    StructField("tokens", ArrayType(IntegerType(), True), False),
])


def _detrend_one(tokens: np.ndarray, params: dict) -> tuple[np.ndarray, np.ndarray]:
    y = decode_tokens(np.asarray(tokens, dtype=np.int32))
    t = np.arange(len(y), dtype=np.float64)
    res = detrend_series(t, y, **params)
    return res.flatten_lc, res.trend_lc


def _chunk_overlap(params: dict) -> int:
    """Overlap (in tokens) that makes a chunk's core slice detrend exactly
    as the full series would: window_length + break_tolerance, ceiled, +1.
    ONE definition, shared by ``detrend_sequences_chunked`` and the fused
    rollup's chunked pass — the defaults here must stay in lockstep with
    ``detrend_series`` or chunked output silently diverges from
    unchunked."""
    wl = params.get("window_length") or 2
    bt = params.get("break_tolerance")
    if bt is None:
        bt = wl / 2
    return int(math.ceil(wl + bt)) + 1


def detrend_sequences(df: DataFrame, method: str = "biweight",
                      keep_tokens: bool = False,
                      mask_col: str | None = None,
                      mask_transit: tuple[float, float, float] | None = None,
                      outputs: tuple[str, ...] = ("flat", "trend"),
                      **params) -> DataFrame:
    """sequences(doc_id, tokens, n_tok, source) ->
    (doc_id, n_tok, source[, flat][, trend][, tokens]) with packed arrays.

    Known-signal exclusion (reference ``flatten(..., mask=)``,
    wotan/flatten.py:194-197 — True = in-transit point excluded from the
    fit): pass ``mask_col`` naming an array<boolean> column aligned with
    ``tokens``, or ``mask_transit=(period, duration, T0)`` to derive the
    periodic mask from the token index inside the same packed pass.

    ``outputs`` selects which result arrays cross back into the JVM:
    Catalyst cannot prune columns INSIDE a pandas UDF, so a caller that
    only consumes ``flat`` should pass ``outputs=("flat",)`` and skip the
    trend array's Arrow egress entirely (~40% of the UDF output bytes)."""
    params = dict(params, method=method)
    want_flat = "flat" in outputs
    want_trend = "trend" in outputs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from wotan_spark.kernels.series import transit_mask as _tmask

        for pdf in batches:
            flats, trends = [], []
            if mask_col is not None:
                masks = [np.asarray(m, dtype=bool) for m in pdf[mask_col]]
            elif mask_transit is not None:
                period, duration, t0 = mask_transit
                masks = [_tmask(np.arange(len(toks), dtype=np.float64),
                                period, duration, t0)
                         for toks in pdf["tokens"]]
            else:
                masks = None
            for row_i, toks in enumerate(pdf["tokens"]):
                p = (params if masks is None
                     else dict(params, mask=masks[row_i]))
                flat, trend = _detrend_one(np.asarray(toks, dtype=np.int32),
                                           p)
                if want_flat:
                    flats.append(flat)
                if want_trend:
                    trends.append(trend)
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_tok": pdf["n_tok"].astype("int32"),
                "source": pdf["source"],
            })
            if want_flat:
                out["flat"] = flats
            if want_trend:
                out["trend"] = trends
            if keep_tokens:
                out["tokens"] = pdf["tokens"]
            yield out

    fields = [f for f in DETREND_SCHEMA.fields
              if f.name not in ("flat", "trend")]
    if want_flat:
        fields.append(StructField("flat", ArrayType(DoubleType(), True), True))
    if want_trend:
        fields.append(StructField("trend", ArrayType(DoubleType(), True),
                                  True))
    if keep_tokens:
        fields.append(StructField("tokens", ArrayType(IntegerType(), True),
                                  False))
    return df.mapInPandas(run, schema=StructType(fields))


def detrend_points(points: DataFrame, method: str = "biweight",
                   mask_transit: tuple[float, float, float] | None = None,
                   **params) -> DataFrame:
    """Long-form entry point: (doc_id, t, y[, ...]) -> adds trend/flat.

    For callers whose data is already exploded.  One ``applyInPandas`` per
    doc_id (shuffle on doc_id — unavoidable in long form; the packed
    ``detrend_sequences`` is the shuffle-free fast path and produces
    identical values, tested).  ``mask_transit=(period, duration, T0)``
    derives the known-signal exclusion mask from ``t``, as in the packed
    op."""
    params = dict(params, method=method)
    schema = StructType([
        StructField("doc_id", StringType(), False),
        StructField("t", LongType(), False),
        StructField("y", DoubleType(), True),
        StructField("trend", DoubleType(), True),
        StructField("flat", DoubleType(), True),
    ])

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from wotan_spark.kernels.series import transit_mask as _tmask

        pdf = pdf.sort_values("t")
        t = pdf["t"].to_numpy(dtype=np.float64)
        y = pdf["y"].to_numpy(dtype=np.float64)
        p = params
        if mask_transit is not None:
            period, duration, t0 = mask_transit
            p = dict(params, mask=_tmask(t, period, duration, t0))
        res = detrend_series(t, y, **p)
        return pd.DataFrame({
            "doc_id": np.repeat(key[0], len(t)),
            "t": t.astype(np.int64),
            "y": y,
            "trend": res.trend_lc,
            "flat": res.flatten_lc,
        })

    return points.groupBy("doc_id").applyInPandas(run, schema=schema)


# routing threshold: a doc only benefits from chunking when its solo kernel
# time rivals a whole task's mean wall (the vectorized sliders run
# ~300k pts/s/core, so 64k tokens ~ 0.2s — below that, chunking's extra
# shuffle + reassembly stages cost more than the straggler they remove)
AUTO_CHUNK_THRESHOLD = 65536

# methods whose trend estimate is local (window/kernel-bounded), so
# overlap-chunking reproduces the unchunked output exactly (tested);
# global fits (splines, gp, cofiam, regressions, ...) are not chunkable
_CHUNKABLE_METHODS = frozenset(
    ["biweight", "andrewsinewave", "welsch", "hodges", "median", "mean",
     "trim_mean", "winsorize", "huber_psi", "hampelfilt", "tau",  # sliders
     "huber", "hampel", "ramsay",                    # iterative sliders
     "medfilt", "savgol", "lowess"])                 # local filters


def detrend_sequences_auto(df: DataFrame, method: str = "biweight",
                           chunk_threshold: int = AUTO_CHUNK_THRESHOLD,
                           chunk_size: int | None = None,
                           keep_tokens: bool = False,
                           outputs: tuple[str, ...] = ("flat", "trend"),
                           **params) -> DataFrame:
    """Single routing entry point for skewed sequence lengths (north_rule:
    salted repartitioning for skewed long sequences): rows with
    ``n_tok <= chunk_threshold`` take the zero-shuffle packed path; longer
    rows are overlap-chunked, salted across tasks, detrended, and
    reassembled — so one 500k-token doc no longer pins a single task for
    the whole stage.  Non-chunkable (global-fit) methods and masked runs
    fall back to the packed path for all rows.

    Plan shape: two branches of one union, each with the ``n_tok``
    predicate pushed to the parquet scan.  At 100 TB the long-branch scan
    skips every row group whose n_tok max is under the threshold (the
    lognormal tail is rare), so the second scan costs proportional to the
    skewed tail, not the corpus.
    """
    if (method not in _CHUNKABLE_METHODS or "mask_col" in params
            or "mask_transit" in params):
        return detrend_sequences(df, method=method, keep_tokens=keep_tokens,
                                 outputs=outputs, **params)
    if chunk_size is None:
        chunk_size = chunk_threshold
    short = df.filter(F.col("n_tok") <= chunk_threshold)
    long_ = df.filter(F.col("n_tok") > chunk_threshold)
    # both branches take ``outputs`` as an explicit kwarg, so the pruning
    # happens INSIDE each UDF (an unwanted array never crosses Arrow —
    # twice, for the chunked branch) and the union's schemas agree by
    # construction; **params carries only detrend_series kwargs
    chunked = detrend_sequences_chunked(long_, method=method,
                                        chunk_size=chunk_size,
                                        keep_tokens=keep_tokens,
                                        outputs=outputs, **params)
    return (detrend_sequences(short, method=method, keep_tokens=keep_tokens,
                              outputs=outputs, **params)
            .unionByName(chunked))


def split_chunks(df: DataFrame, chunk_size: int, overlap: int) -> DataFrame:
    """Explode long sequences into overlapping chunk rows.

    Each chunk row carries ``lead`` (number of overlap tokens prepended) and
    ``core`` (number of tokens this chunk owns); short rows pass through as a
    single chunk.  The per-row token-array invariant is preserved: trimming
    ``lead:lead+core`` and concatenating by chunk_id rebuilds ``tokens``
    exactly (tested).
    """

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "chunk_id", "t0", "lead", "core",
                                   "n_tok", "source", "tokens")}
            for doc_id, toks, n_tok, source in zip(
                    pdf["doc_id"], pdf["tokens"], pdf["n_tok"], pdf["source"]):
                toks = np.asarray(toks, dtype=np.int32)
                n = len(toks)
                n_chunks = max(1, math.ceil(n / chunk_size))
                for c in range(n_chunks):
                    lo = c * chunk_size
                    hi = min(lo + chunk_size, n)
                    lead = min(overlap, lo)
                    tail = min(overlap, n - hi)
                    out["doc_id"].append(doc_id)
                    out["chunk_id"].append(c)
                    out["t0"].append(lo)
                    out["lead"].append(lead)
                    out["core"].append(hi - lo)
                    out["n_tok"].append(n_tok)
                    out["source"].append(source)
                    out["tokens"].append(toks[lo - lead:hi + tail])
            yield pd.DataFrame(out)

    return df.mapInPandas(split, schema=CHUNK_SCHEMA)


def detrend_sequences_chunked(df: DataFrame, method: str = "biweight",
                              chunk_size: int = 8192,
                              overlap: int | None = None,
                              num_partitions: int | None = None,
                              keep_tokens: bool = False,
                              outputs: tuple[str, ...] = ("flat", "trend"),
                              **params) -> DataFrame:
    """Skew-safe detrend: chunk, spread, detrend, reassemble.

    Exact for the local (slider/filter) methods when
    ``overlap >= window_length + break_tolerance``.  ``keep_tokens``
    carries the core token slices through the pieces and reassembles the
    original arrays bit-exactly (the per-row invariant).  ``outputs``
    prunes result arrays at the UDF boundary like ``detrend_sequences``:
    an unwanted array is dropped before it crosses Arrow — and here it
    crosses TWICE (pieces, then reassembly), so the saving doubles.
    """
    params = dict(params, method=method)
    want_flat = "flat" in outputs
    want_trend = "trend" in outputs
    if overlap is None:
        overlap = _chunk_overlap(params)

    chunks = split_chunks(df, chunk_size, overlap)
    # salt: spread one doc's chunks across tasks by (doc_id, chunk_id) hash.
    # The partition count MUST be explicit — a bare column repartition is
    # AQE-coalescible, and chunk rows are few BYTES but heavy CPU, so AQE's
    # byte-targeted coalescing would fold them back into one task and
    # recreate the straggler this operator exists to remove.
    if num_partitions is None:
        num_partitions = max(
            df.sparkSession.sparkContext.defaultParallelism, 8)
    chunks = chunks.repartition(num_partitions,
                                F.col("doc_id"), F.col("chunk_id"))

    piece_fields = [
        StructField("doc_id", StringType(), False),
        StructField("chunk_id", IntegerType(), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), True),
    ]
    if want_flat:
        piece_fields.append(
            StructField("flat", ArrayType(DoubleType(), True), True))
    if want_trend:
        piece_fields.append(
            StructField("trend", ArrayType(DoubleType(), True), True))
    if keep_tokens:
        piece_fields.append(
            StructField("tokens", ArrayType(IntegerType(), True), False))
    piece_schema = StructType(piece_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flats, trends, toks_out = [], [], []
            for toks, lead, core in zip(pdf["tokens"], pdf["lead"], pdf["core"]):
                toks = np.asarray(toks, dtype=np.int32)
                flat, trend = _detrend_one(toks, params)
                sl = slice(int(lead), int(lead) + int(core))
                if want_flat:
                    flats.append(flat[sl])
                if want_trend:
                    trends.append(trend[sl])
                if keep_tokens:
                    toks_out.append(toks[sl])
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "chunk_id": pdf["chunk_id"].astype("int32"),
                "n_tok": pdf["n_tok"].astype("int32"),
                "source": pdf["source"],
            })
            if want_flat:
                out["flat"] = flats
            if want_trend:
                out["trend"] = trends
            if keep_tokens:
                out["tokens"] = toks_out
            yield out

    pieces = chunks.mapInPandas(run, schema=piece_schema)

    def reassemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk_id")
        out = pd.DataFrame({
            "doc_id": [key[0]],
            "n_tok": [np.int32(pdf["n_tok"].iloc[0])],
            "source": [pdf["source"].iloc[0]],
        })
        if want_flat:
            out["flat"] = [np.concatenate([np.asarray(a, dtype=np.float64)
                                           for a in pdf["flat"]])]
        if want_trend:
            out["trend"] = [np.concatenate([np.asarray(a, dtype=np.float64)
                                            for a in pdf["trend"]])]
        if keep_tokens:
            out["tokens"] = [np.concatenate(
                [np.asarray(a, dtype=np.int32) for a in pdf["tokens"]])]
        return out

    out_fields = [f for f in DETREND_SCHEMA.fields
                  if f.name not in ("flat", "trend")]
    if want_flat:
        out_fields.append(
            StructField("flat", ArrayType(DoubleType(), True), True))
    if want_trend:
        out_fields.append(
            StructField("trend", ArrayType(DoubleType(), True), True))
    if keep_tokens:
        out_fields.append(
            StructField("tokens", ArrayType(IntegerType(), True), False))
    return pieces.groupBy("doc_id").applyInPandas(
        reassemble, schema=StructType(out_fields))
