"""Delta-of-delta integer compression (Gorilla timestamp scheme, Pelkonen et
al. 2015 §4.1.1, widened to 64-bit values).

Header: 32-bit count, first value (64b zigzag varint-free raw), first delta
raw 64b.  Each subsequent delta-of-delta D:
  D == 0              -> 0
  -63   <= D <= 64    -> 10 + 7 bits
  -255  <= D <= 256   -> 110 + 9 bits
  -2047 <= D <= 2048  -> 1110 + 12 bits
  else                -> 1111 + 64 bits (two's complement)
"""

from __future__ import annotations

import struct

import numpy as np

from wotan_spark.codecs.bits import BitReader, BitWriter

_MASK64 = (1 << 64) - 1


def encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return struct.pack(">I", 0)
    w = BitWriter()
    w.write(int(v[0]) & _MASK64, 64)
    if n == 1:
        return struct.pack(">I", 1) + w.getvalue()
    # modulo-2^64 delta arithmetic: wraps consistently on encode and decode,
    # so the full int64 range round-trips
    u = v.view(np.uint64)
    deltas = (u[1:] - u[:-1])  # uint64 wraparound
    w.write(int(deltas[0]), 64)
    dods = (deltas[1:] - deltas[:-1])
    for d in dods:
        d = _signed64(int(d))
        if d == 0:
            w.write(0, 1)
        elif -63 <= d <= 64:
            w.write(0b10, 2)
            w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(0b110, 3)
            w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(0b1110, 4)
            w.write(d + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(d & _MASK64, 64)
    return struct.pack(">I", n) + w.getvalue()


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def decode(payload: bytes) -> np.ndarray:
    (n,) = struct.unpack(">I", payload[:4])
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = BitReader(payload[4:])
    cur = r.read(64)
    out[0] = _signed64(cur)
    if n == 1:
        return out
    delta = r.read(64)
    cur = (cur + delta) & _MASK64
    out[1] = _signed64(cur)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _signed64(r.read(64))
        delta = (delta + dod) & _MASK64
        cur = (cur + delta) & _MASK64
        out[i] = _signed64(cur)
    return out
