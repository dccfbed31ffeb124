"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` passes.  Decoding goes through a codec
REGISTRY (``register_decoder``) with four dependency-free built-ins —
``raw`` (bare samples), ``png`` (real zlib+filters decoder,
``codecs/png.py``), ``jpeg`` (real baseline-DCT decoder,
``codecs/jpeg.py``) and ``wav`` (real RIFF/PCM decoder,
``codecs/wavpcm.py``) — and a user plugs further codecs (MP3, video,
...) in without editing engine code: each operator snapshots the
registry into its closure, so registered decoders ship to executors with
the plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

from wotan_spark.codecs.jpeg import decode_jpeg
from wotan_spark.codecs.png import decode_png, encode_png
from wotan_spark.codecs.wavpcm import decode_wav, encode_wav

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("modality", StringType(), False),   # image | audio | video
    StructField("codec", StringType(), False),      # raw | jpeg | wav | ...
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
    StructField("payload", BinaryType(), False),
])

FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType(), False),
    StructField("modality", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("sha1", StringType(), False),
    StructField("features", ArrayType(DoubleType(), True), True),
])


def synth_media(spark: SparkSession, n: int, seed: int = 42,
                partitions: int | None = None,
                container: bool = False) -> DataFrame:
    """Deterministic fake media table: tiny grayscale images / pcm audio
    clips.  With ``container=False`` payloads are bare uint8 samples
    (codec ``raw``); with ``container=True`` the SAME samples are wrapped
    in real PNG (rotating through all five scanline filters) and 8-bit
    WAV containers (codecs ``png``/``wav``), so decoded content is
    identical across the two modes — the invariant the codec tests pin."""
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 4)
    base = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng([seed, i])
                if i % 2 == 0:
                    w, h = 16 + i % 16, 16
                    samples = rng.integers(0, 256, w * h, dtype=np.uint8)
                    if container:
                        codec, payload = "png", encode_png(
                            samples.reshape(h, w), channels=1,
                            filter_type=i % 5)
                    else:
                        codec, payload = "raw", samples.tobytes()
                    rows.append((f"img_{i:06d}", "image", codec, w, h,
                                 None, None, payload))
                else:
                    sr, nf = 8000, 256 + (i % 256)
                    samples = rng.integers(0, 256, nf, dtype=np.uint8)
                    if container:
                        codec, payload = "wav", encode_wav(
                            samples, sample_rate=sr, channels=1, bits=8)
                    else:
                        codec, payload = "raw", samples.tobytes()
                    rows.append((f"aud_{i:06d}", "audio", codec, None,
                                 None, sr, nf, payload))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              MEDIA_SCHEMA.fields])

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_raw(payload: bytes) -> np.ndarray:
    return np.frombuffer(payload, dtype=np.uint8)


# codec name -> callable(payload: bytes) -> flat uint8 sample array.
# Four dependency-free built-ins ship: ``raw`` plus REAL ``png``
# (zlib+filters), ``jpeg`` (baseline sequential DCT) and ``wav``
# (RIFF/PCM) decoders from wotan_spark.codecs.  Further codecs (MP3,
# video containers, progressive JPEG) plug in via register_decoder
# WITHOUT editing engine code.  Every operator snapshots
# the registry into its mapInPandas closure at plan-build time, which is
# what ships decoders to executors — so a decoder must be
# cloudpickle-able (no live handles; functions from a module ship by
# REFERENCE and that module must be importable on executors, e.g. via
# --py-files, while nested/interactive functions ship by value), and a
# driver-side mutation after a plan is built does not retroactively change
# that query.
_BUILTIN_CODECS = frozenset({"raw", "png", "jpeg", "wav"})
_DECODERS: dict = {"raw": _decode_raw, "png": decode_png,
                   "jpeg": decode_jpeg, "wav": decode_wav}


def register_decoder(codec: str, fn) -> None:
    """Register a payload decoder for ``codec`` (e.g. a PIL/soundfile
    wrapper returning a flat uint8 array).  Queries built AFTER
    registration use it; the ``raw``/``png``/``jpeg``/``wav`` built-ins
    stay the
    dependency-free paths."""
    if not callable(fn):
        raise TypeError(f"decoder for {codec!r} must be callable")
    if str(codec) in _BUILTIN_CODECS:
        # mirror unregister_decoder's guard: the built-in decoders are
        # the dependency-free paths synth_media/dedup rely on, and there
        # is no way to restore one once overwritten
        raise ValueError(
            f"the built-in {codec!r} decoder cannot be replaced")
    _DECODERS[str(codec)] = fn


def unregister_decoder(codec: str) -> None:
    if codec in _BUILTIN_CODECS:
        raise ValueError(
            f"the built-in {codec!r} decoder cannot be removed")
    _DECODERS.pop(codec, None)


def registered_codecs() -> tuple[str, ...]:
    return tuple(sorted(_DECODERS))


def _decode_payload(codec: str, payload: bytes,
                    decoders: dict | None = None) -> np.ndarray:
    """Decode a media payload to a flat uint8 sample array using the given
    registry snapshot (executor side) or the live registry (driver side)."""
    fn = (_DECODERS if decoders is None else decoders).get(codec)
    if fn is not None:
        return fn(payload)
    raise NotImplementedError(
        f"codec {codec!r}: no decoder registered — media libraries are not "
        "available in this environment; plug one in via register_decoder")


def extract_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """Per-item content features (byte histogram as a stand-in embedding)
    via one packed pass: (media_id, modality, n_bytes, sha1, features)."""

    decoders = dict(_DECODERS)   # snapshot: ships to executors via pickle

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mods, sizes, digests, feats = [], [], [], [], []
            for mid, mod, codec, payload in zip(
                    pdf["media_id"], pdf["modality"], pdf["codec"],
                    pdf["payload"]):
                raw = bytes(payload)
                arr = _decode_payload(codec, raw, decoders)
                hist = np.histogram(arr, bins=n_bins, range=(0, 256))[0]
                total = max(int(hist.sum()), 1)
                ids.append(mid)
                mods.append(mod)
                sizes.append(len(raw))
                digests.append(hashlib.sha1(raw).hexdigest())
                feats.append((hist / total).astype(np.float64))
            yield pd.DataFrame({
                "media_id": ids, "modality": mods, "n_bytes": sizes,
                "sha1": digests, "features": feats})

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame/sample decimation for video/audio payloads: keep every
    ``every``-th sample — the downsample-retention idea applied to media
    (real frame extraction plugs into _decode_payload).  Image rows pass
    through untouched (same discipline as ``resize_media``): decimating a
    raster's rows while width/height metadata survives would emit a
    payload whose length contradicts w*h and crash the next consumer."""
    # validate eagerly (the engine-wide discipline: factor<1, n_out<3, ...):
    # every==0 would crash inside executors mid-job ('slice step cannot be
    # zero') and a negative stride would silently emit time-REVERSED clips
    # with a corrupted sample_rate
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    decoders = dict(_DECODERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads, frames, codecs_out, rates = [], [], [], []
            for mod, codec, payload, nf, rate in zip(
                    pdf["modality"], pdf["codec"], pdf["payload"],
                    pdf["n_frames"], pdf["sample_rate"]):
                rate_i = None if rate is None or pd.isna(rate) else int(rate)
                nf_i = None if nf is None or pd.isna(nf) else int(nf)
                if mod not in ("audio", "video"):
                    payloads.append(bytes(payload))
                    codecs_out.append(codec)
                    frames.append(nf_i)
                    rates.append(rate_i)
                    continue
                arr = _decode_payload(codec, bytes(payload), decoders)
                # decimate FRAMES, not raw samples: when n_frames divides
                # the payload, a frame is size/n_frames samples (e.g.
                # interleaved audio channels, video rasters) and a flat
                # [::every] stride would scramble within-frame layout
                if nf_i and nf_i > 0 and arr.size % nf_i == 0 \
                        and arr.size // nf_i > 1:
                    kept2 = arr.reshape(nf_i, -1)[::every]
                    kept, new_nf = kept2.reshape(-1), kept2.shape[0]
                else:
                    kept = arr[::every]
                    new_nf = len(kept) if nf_i is not None else None
                payloads.append(kept.tobytes())
                # outputs are decoded samples, not re-wrapped containers —
                # the codec column must say so or a downstream decode breaks
                codecs_out.append("raw")
                frames.append(new_nf)
                # keeping every N-th frame divides the effective rate for
                # BOTH audio (samples/s) and video (frames/s); leaving it
                # unchanged made every downstream duration/pitch/fps
                # computation wrong by N (the payload-contradicts-metadata
                # hazard this function's image pass-through exists to avoid)
                rates.append(max(1, rate_i // every)
                             if rate_i is not None else rate_i)
            out["payload"] = payloads
            out["codec"] = codecs_out
            out["n_frames"] = pd.array(frames, dtype="Int32")
            out["sample_rate"] = pd.array(rates, dtype="Int32")
            yield out

    return media.mapInPandas(run, schema=media.schema)


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize for image payloads; non-image rows pass
    through untouched.  The gather is a vectorized ``np.ix_`` index —
    a real resampler (PIL/opencv) would plug into _decode_payload and
    replace the index arithmetic only."""
    # a zero/negative target silently produced empty payloads with 0 or
    # negative width/height metadata (np.arange(0) gathers nothing) — the
    # exact payload-contradicts-metadata hazard this module guards against
    if out_w < 1 or out_h < 1:
        raise ValueError(
            f"target size must be >= 1x1, got {out_w}x{out_h}")

    decoders = dict(_DECODERS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads, ws, hs, codecs_out = [], [], [], []
            for mod, codec, payload, w, h in zip(
                    pdf["modality"], pdf["codec"], pdf["payload"],
                    pdf["width"], pdf["height"]):
                raw = bytes(payload)
                if mod != "image" or pd.isna(w) or pd.isna(h):
                    payloads.append(raw)
                    codecs_out.append(codec)
                    ws.append(None if pd.isna(w) else int(w))
                    hs.append(None if pd.isna(h) else int(h))
                    continue
                w, h = int(w), int(h)
                arr = _decode_payload(codec, raw, decoders)
                # channel count from the decoded length: the built-in PNG
                # decoder emits h*w*c samples for RGB/RGBA payloads, and a
                # (h, w) reshape crashed on anything multi-channel
                if h <= 0 or w <= 0 or arr.size % (h * w):
                    payloads.append(raw)        # metadata contradicts
                    codecs_out.append(codec)    # payload: pass through
                    ws.append(w)
                    hs.append(h)
                    continue
                c = arr.size // (h * w)
                img = arr.reshape(h, w, c)
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                payloads.append(img[np.ix_(yi, xi)].astype(np.uint8)
                                .tobytes())
                # resized rows carry decoded samples, not containers
                codecs_out.append("raw")
                ws.append(out_w)
                hs.append(out_h)
            out["payload"] = payloads
            out["codec"] = codecs_out
            out["width"] = pd.array(ws, dtype="Int32")
            out["height"] = pd.array(hs, dtype="Int32")
            yield out

    return media.mapInPandas(run, schema=media.schema)


def dedup_media_exact(media: DataFrame) -> DataFrame:
    """Exact media dedup on content hash — pure Catalyst (sha1 over binary
    is a built-in), no UDF."""
    return (media.groupBy(F.sha1("payload").alias("content_sha1"))
            .agg(F.count("*").alias("dup_count"),
                 F.min("media_id").alias("keeper"))
            .filter(F.col("dup_count") > 1))
