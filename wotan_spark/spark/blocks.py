"""Compressed rollup block operators.

Packs per-series value runs into Gorilla-XOR (float) or delta-of-delta
(integer) binary blocks — the storage format of the retention tiers.  Encode
and decode are ``mapInPandas`` passes (block membership is within-series:
zero shuffle).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

from wotan_spark.codecs import dod, gorilla

BLOCKS_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("tier", IntegerType(), False),
    StructField("block_id", LongType(), False),
    StructField("t0", LongType(), False),
    StructField("n", IntegerType(), False),
    StructField("codec", StringType(), False),
    StructField("payload", BinaryType(), False),
])

DECODED_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("tier", IntegerType(), False),
    StructField("block_id", LongType(), False),
    StructField("t0", LongType(), False),
    StructField("values", ArrayType(DoubleType(), True), False),
])


def _encode_array(arr: np.ndarray, codec: str) -> bytes:
    if codec == "gorilla":
        return gorilla.encode(np.asarray(arr, dtype=np.float64))
    if codec == "dod":
        return dod.encode(np.asarray(arr, dtype=np.int64))
    raise ValueError(codec)


def _decode_payload(payload: bytes, codec: str) -> np.ndarray:
    if codec == "gorilla":
        return gorilla.decode(bytes(payload))
    if codec == "dod":
        return dod.decode(bytes(payload)).astype(np.float64)
    raise ValueError(codec)


def encode_blocks(df: DataFrame, column: str, codec: str,
                  tier: int = 0, block_size: int = 4096) -> DataFrame:
    """(doc_id, <column>: array) -> blocks(doc_id, tier, block_id, t0, n,
    codec, payload)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "tier", "block_id", "t0", "n",
                                   "codec", "payload")}
            for doc_id, arr in zip(pdf["doc_id"], pdf[column]):
                arr = np.asarray(arr)
                for b in range(0, max(len(arr), 1), block_size):
                    chunk = arr[b:b + block_size]
                    out["doc_id"].append(doc_id)
                    out["tier"].append(tier)
                    out["block_id"].append(b // block_size)
                    out["t0"].append(b)
                    out["n"].append(len(chunk))
                    out["codec"].append(codec)
                    out["payload"].append(_encode_array(chunk, codec))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=BLOCKS_SCHEMA)


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """blocks -> (doc_id, tier, block_id, t0, values:array<double>)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [_decode_payload(p, c)
                    for p, c in zip(pdf["payload"], pdf["codec"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "tier": pdf["tier"].astype("int32"),
                "block_id": pdf["block_id"],
                "t0": pdf["t0"],
                "values": vals,
            })

    return blocks.mapInPandas(run, schema=DECODED_SCHEMA)
