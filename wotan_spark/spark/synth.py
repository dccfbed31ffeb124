"""Deterministic synthesis of the tokenized-sequence input table.

Shape per BASELINE.json ``input_hint``:
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``.
Token index = timestamp, token value = quantized signal sample
(``y = 1 + token/1e6``); the sentinel INT32_MIN encodes a missing (NaN)
sample.  The per-series signal follows the reference test recipe
(wotan/tests.py:26-38): sin trend + gaussian noise + periodic dips/flares,
with per-doc phase/amplitude/noise variation and a skewed length
distribution (lognormal, heavy tail) to exercise salting.

Generation is distributed and *order-independent*: each doc's RNG is seeded
from its doc index alone, so the table content is identical at any
parallelism or partitioning — this is also what makes the per-row
token-array-equality invariant checkable after any repartition path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, IntegerType, StringType, StructField,
                               StructType)

SENTINEL = np.int32(-2147483648)
SCALE = 1e6
SOURCES = ("web", "books", "code", "synthetic")

SEQUENCES_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("tokens", ArrayType(IntegerType(), True), False),
    StructField("n_tok", IntegerType(), False),
    StructField("source", StringType(), False),
])


def make_tokens(doc_index: int, seed: int = 42,
                median_len: int = 1000, max_len: int = 50000) -> np.ndarray:
    """Deterministic int32 token array for one doc."""
    rng = np.random.default_rng([seed, doc_index])
    n = int(np.clip(rng.lognormal(np.log(median_len), 0.8), 16, max_len))
    t = np.linspace(0, 30, n)
    phase = rng.uniform(0, 2 * np.pi)
    amp = rng.uniform(0.5, 2.0) / n
    noise = rng.uniform(0.5, 2.0) * 1e-4
    flux = 1 + np.sin(t + phase) * amp + rng.normal(0, noise, n)
    for i in range(0, n, 75):
        flux[i:i + 5] -= 0.0004
        flux[i + 50:i + 52] += 0.0002
    tokens = np.round((flux - 1.0) * SCALE).astype(np.int64)
    tokens = np.clip(tokens, -2147483647, 2147483647).astype(np.int32)
    if rng.random() < 0.15:  # NaN block variant (gap)
        lo = int(rng.integers(0, max(n - 32, 1)))
        hi = min(lo + int(rng.integers(8, 128)), n)
        tokens[lo:hi] = SENTINEL
    return tokens


def decode_tokens(tokens: np.ndarray) -> np.ndarray:
    """int32 tokens -> float64 samples, sentinel -> NaN."""
    y = 1.0 + tokens.astype(np.float64) / SCALE
    y[tokens == SENTINEL] = np.nan
    return y


def encode_samples(y: np.ndarray) -> np.ndarray:
    """float64 samples -> int32 tokens (inverse of decode for clean values)."""
    tok = np.round((np.asarray(y, dtype=np.float64) - 1.0) * SCALE)
    out = np.where(np.isnan(tok), float(SENTINEL), tok)
    return out.astype(np.int32)


def synth_sequences(spark: SparkSession, n_docs: int, seed: int = 42,
                    median_len: int = 1000, max_len: int = 50000,
                    partitions: int | None = None) -> DataFrame:
    """Distributed deterministic sequences table over ``spark.range``."""
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 4)
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                toks = make_tokens(i, seed=seed, median_len=median_len,
                                   max_len=max_len)
                rows.append((f"doc_{i:08d}", toks.tolist(), len(toks),
                             SOURCES[i % len(SOURCES)]))
            yield pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok",
                                              "source"])

    return base.mapInPandas(gen, schema=SEQUENCES_SCHEMA)


def sequences_from_events(spark: SparkSession, sf_dir: str,
                          max_tokens: int = 4096) -> DataFrame:
    """Build a sequences table from the driver-provided ``events`` parquet:
    one doc per user, tokens = value stream quantized in event-time order.
    Deterministic given the input, so a DuckDB oracle can rebuild it."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # a NULL/NaN event value must become the SENTINEL gap token, exactly
    # like the synthetic generator's NaN blocks: round(NULL*1000) would
    # put a NULL ELEMENT inside `tokens` (crashing every downstream
    # np.asarray(..., int32) decoder), and a NaN would fail the whole
    # build under ANSI casting.  The oracle SQLs quantize with a bare
    # round(value*1000) — sound because the driver tables carry no
    # NULL/NaN values (asserted for sf0.001/0.01/0.1); the guard is for
    # real-world inputs.
    tok_of = lambda v: (F.when(v.isNull() | F.isnan(v),
                               F.lit(int(SENTINEL)))
                        .otherwise(F.round(v * 1000))).cast("int")
    w_vals = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value"))))
    agg = (ev.groupBy("user_id")
             .agg(w_vals.alias("ordered"))
             .select(
                 F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("doc_id"),
                 F.slice(F.transform("ordered", lambda s: tok_of(s["value"])),
                         1, max_tokens).alias("tokens"),
                 F.lit("events").alias("source"))
             .withColumn("n_tok", F.size("tokens").cast("int")))
    out = agg.select("doc_id", "tokens", "n_tok", "source")
    # AQE coalesces the small groupBy output to very few partitions, which
    # would starve the downstream per-series pandas-UDF stages — spread by
    # doc_id hash to the session's parallelism
    par = max(int(spark.sparkContext.defaultParallelism), 8)
    return out.repartition(par, "doc_id")
