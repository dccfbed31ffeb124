"""Dependency-free RIFF/WAVE PCM codec (stdlib ``struct`` + NumPy).

A minimal, real decoder for the multimodal registry: uncompressed PCM
(format tag 1) at 8 or 16 bits per sample, any channel count.  Compressed
formats (mu-law, ADPCM, float) raise loudly — a full codec plugs in via
``register_decoder``.

The matching encoder lets tests and ``synth_media`` produce real WAV
container payloads in a sandbox with no media libraries.

No reference counterpart: the reference engine (hippke/wotan) has no media
handling; this backs the training-data-pipeline multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np


def parse_wav(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Decode a WAV byte payload -> ``(samples, sample_rate, channels,
    bits)``; ``samples`` is a flat int array (uint8 for 8-bit PCM, int16
    for 16-bit), channel-interleaved as stored."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("WAV: not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        ctype = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"WAV: truncated chunk {ctype!r}")
        if ctype == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length & 1)   # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if tag != 1:
        raise ValueError(f"WAV: format tag {tag} unsupported (built-in "
                         "decoder handles uncompressed PCM only)")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        samples = np.frombuffer(data[:len(data) & ~1], dtype="<i2")
    else:
        raise ValueError(f"WAV: {bits}-bit PCM unsupported (8/16 only)")
    return samples, rate, channels, bits


def decode_wav(payload: bytes) -> np.ndarray:
    """Registry-shaped decoder: WAV payload -> flat uint8 sample array
    (16-bit PCM is mapped to the top byte, rebased to unsigned, so the
    byte-histogram features stay comparable across depths)."""
    samples, _rate, _ch, bits = parse_wav(payload)
    if bits == 8:
        return samples
    return ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000,
               channels: int = 1, bits: int = 8) -> bytes:
    """Encode a flat (channel-interleaved) sample array as a real WAV:
    uint8 input for 8-bit, int16 for 16-bit."""
    if bits == 8:
        body = np.ascontiguousarray(samples, dtype=np.uint8).tobytes()
    elif bits == 16:
        body = np.ascontiguousarray(samples,
                                    dtype="<i2").tobytes()
    else:
        raise ValueError(f"bits={bits} unsupported (8/16 only)")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bits)
    pad = b"\x00" if len(body) & 1 else b""
    riff = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body + pad)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
