"""Gorilla XOR compression for float64 series (Pelkonen et al. 2015 §4.1.2).

Per value: XOR against the previous value.
  * zero XOR            -> control bit 0
  * fits prior window   -> bits 10 + meaningful bits in the previous
                           (leading, length) window
  * new window          -> bits 11 + 5-bit leading-zero count + 6-bit
                           meaningful-bit length (64 stored as 0) + bits

NaN round-trips exactly (it is just a bit pattern).  Header: 32-bit count +
first value raw.
"""

from __future__ import annotations

import struct

import numpy as np

from wotan_spark.codecs.bits import BitReader, BitWriter


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    if x == 0:
        return 64
    return (x & -x).bit_length() - 1


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(np.asarray(values, dtype=np.float64))
    bits = v.view(np.uint64)
    n = len(v)
    if n == 0:
        return struct.pack(">I", 0)
    w = BitWriter()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    lead_prev, len_prev = 65, 0  # impossible window -> first XOR forces '11'
    for i in range(1, n):
        cur = int(bits[i])
        x = prev ^ cur
        prev = cur
        if x == 0:
            w.write(0, 1)
            continue
        lead = min(_clz64(x), 31)
        trail = _ctz64(x)
        mlen = 64 - lead - trail
        if lead >= lead_prev and trail >= 64 - lead_prev - len_prev and len_prev:
            w.write(0b10, 2)
            w.write(x >> (64 - lead_prev - len_prev), len_prev)
        else:
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mlen & 0x3F, 6)  # 64 encodes as 0
            w.write(x >> trail, mlen)
            lead_prev, len_prev = lead, mlen
    return struct.pack(">I", n) + w.getvalue()


def decode(payload: bytes) -> np.ndarray:
    (n,) = struct.unpack(">I", payload[:4])
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = BitReader(payload[4:])
    prev = r.read(64)
    out[0] = prev
    lead_prev, len_prev = 0, 0
    for i in range(1, n):
        ctrl = r.read(1)
        if ctrl == 0:
            out[i] = prev
            continue
        mode = r.read(1)
        if mode == 0:  # '10': prior window
            lead, mlen = lead_prev, len_prev
        else:          # '11': explicit window
            lead = r.read(5)
            mlen = r.read(6)
            if mlen == 0:
                mlen = 64
            lead_prev, len_prev = lead, mlen
        bits = r.read(mlen)
        x = bits << (64 - lead - mlen)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)
