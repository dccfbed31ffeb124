"""Dependency-free baseline JPEG codec (stdlib ``struct`` + NumPy).

A minimal, real decoder for the multimodal registry: baseline sequential
DCT (SOF0), 8-bit precision, grayscale or YCbCr with sampling factors up
to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, Huffman tables read from
the stream.  Progressive (SOF2), arithmetic coding, 12-bit precision and
hierarchical modes raise loudly — this is the dependency-free built-in,
not a libjpeg replacement; a full codec plugs in via ``register_decoder``
without touching engine code.

The matching encoder (baseline, Annex-K quantization + Huffman tables,
libjpeg-style quality scaling, 4:4:4 or 4:2:0) exists so tests can
produce REAL JPEG payloads in a sandbox with no media libraries, and to
exercise the decoder's subsampling/restart paths end-to-end.  JPEG is
lossy: round-trip tests assert bounded error, not identity — which is
also why ``synth_media(container=True)`` keeps using PNG/WAV (those pin
exact content identity across container and raw modes).

The entropy loop is plain Python bit I/O — the honest shape for a
spec-level reference codec; it is meant for test/interop-scale payloads.
Production media pipelines register a library-backed decoder instead.

No reference counterpart: the reference engine (hippke/wotan) has no
media handling; this backs the training-data-pipeline multimodal surface.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> row-major index of the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 base quantization tables (row-major 8x8)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 standard Huffman tables as (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    D = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    D[0, :] = 1.0 / np.sqrt(8)
    return D


_D = _dct_matrix()          # forward: D @ B @ D.T ; inverse: D.T @ F @ D


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], values: list[int]) -> dict:
    """(length, code) -> symbol for a DHT-style canonical Huffman table."""
    table, code, vi = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], values: list[int]) -> dict:
    """symbol -> (code, length), the encoder-side view of the same table."""
    return {sym: (code, length)
            for (length, code), sym in _canonical_codes(bits,
                                                        values).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.out.append(b)
            if b == 0xFF:            # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits             # pad with 1-bits (B.1.1.5)
            self.put((1 << pad) - 1, pad)
        self.acc = self.nbits = 0


class _BitReader:
    """Entropy-coded-segment reader: destuffs 0xFF00, stops at markers,
    and realigns across RSTn when the decoder asks for a restart."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("JPEG: entropy stream truncated")
        b = self.buf[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.buf):
                raise ValueError("JPEG: entropy stream truncated at 0xFF")
            nxt = self.buf[self.pos]
            if nxt == 0x00:
                self.pos += 1            # stuffed byte
            else:
                # a real marker inside the scan: losing sync here means a
                # corrupt stream (restarts are consumed via expect_rst)
                raise ValueError(
                    f"JPEG: unexpected marker 0xFF{nxt:02X} inside "
                    "entropy-coded data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker the interval promises."""
        self.acc = self.nbits = 0
        if (self.pos + 1 >= len(self.buf) or self.buf[self.pos] != 0xFF
                or self.buf[self.pos + 1] != 0xD0 + (n & 7)):
            got = self.buf[self.pos:self.pos + 2].hex()
            raise ValueError(f"JPEG: expected RST{n & 7}, got 0x{got}")
        self.pos += 2


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category s, s-bit two's-style code) per F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def parse_jpeg(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Decode a baseline JPEG payload -> ``(pixels, width, height,
    channels)`` with ``pixels`` a ``(height, width * channels)`` uint8
    array (RGB interleaved for 3-component images)."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("JPEG: bad signature (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) -> decode table
    frame = None
    restart = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at offset {pos}")
        # any number of 0xFF fill bytes may precede a marker (B.1.1.2)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                    # EOI before SOS
            raise ValueError("JPEG: no scan data before EOI")
        (seglen,) = struct.unpack(">H", payload[pos:pos + 2])
        body = payload[pos + 2:pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError(f"JPEG: truncated segment 0xFF{marker:02X}")
        if marker == 0xDB:                    # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quantization tables "
                                     "unsupported (baseline is 8-bit)")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[i + 1:i + 65],
                                            dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:                  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"JPEG: {prec}-bit precision unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: SOF marker 0xFF{marker:02X} unsupported (built-in "
                "decoder handles baseline sequential SOF0/SOF1 only)")
        elif marker == 0xDD:                  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            if ns != len(frame["comps"]):
                # returning after the first scan would silently present a
                # partial decode (e.g. just the Y plane) as the image
                raise ValueError(
                    f"JPEG: scan covers {ns} of {len(frame['comps'])} "
                    "components — multi-scan (non-interleaved) baseline "
                    "files are unsupported by the built-in decoder")
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs),
                            None)
                if comp is None:
                    raise ValueError(f"JPEG: scan references unknown "
                                     f"component {cs}")
                scan.append((comp, tdta >> 4, tdta & 0xF))
            return _decode_scan(payload, pos + seglen, frame, scan, qt,
                                huff, restart)
        # APPn / COM / others: skipped
        pos += seglen
    raise ValueError("JPEG: missing SOS marker")


def _decode_scan(buf: bytes, pos: int, frame: dict, scan: list,
                 qt: dict, huff: dict, restart: int) -> tuple:
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if len(scan) == 1:
        # single-component frame: non-interleaved layout — one block per
        # MCU over the component's own 8px block grid (A.2.2); declared
        # sampling factors are ratios against hmax and collapse to 1x1
        scan = [({**scan[0][0], "h": 1, "v": 1}, scan[0][1], scan[0][2])]
        hmax = vmax = 1
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for comp, _, _ in scan:
        planes.append(np.zeros((mcuy * comp["v"] * 8,
                                mcux * comp["h"] * 8), dtype=np.float64))
    r = _BitReader(buf, pos)
    pred = [0] * len(scan)
    rst_n = 0
    since_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and since_rst == restart:
                r.expect_rst(rst_n)
                rst_n = (rst_n + 1) & 7
                pred = [0] * len(scan)
                since_rst = 0
            for ci, (comp, td, ta) in enumerate(scan):
                dc_tbl = huff.get((0, td))
                ac_tbl = huff.get((1, ta))
                if dc_tbl is None or ac_tbl is None:
                    raise ValueError("JPEG: scan uses an undefined "
                                     "Huffman table")
                q = qt.get(comp["tq"])
                if q is None:
                    raise ValueError("JPEG: component uses an undefined "
                                     "quantization table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(r, dc_tbl)
                        diff = _extend(r.receive(s), s) if s else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_tbl)
                            rrrr, ssss = rs >> 4, rs & 0xF
                            if ssss == 0:
                                if rrrr == 15:
                                    k += 16          # ZRL
                                    continue
                                break                # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("JPEG: AC run past end "
                                                 "of block")
                            coef[k] = _extend(r.receive(ssss), ssss)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = coef * q.reshape(-1)[ZIGZAG]
                        px = _D.T @ blk.reshape(8, 8) @ _D
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            since_rst += 1
    out_planes = []
    for (comp, _, _), plane in zip(scan, planes):
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        out_planes.append(plane[:h, :w] + 128.0)
    if len(out_planes) == 1:
        px = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return px, w, h, 1
    if len(out_planes) != 3:
        raise ValueError(f"JPEG: {len(out_planes)}-component scans "
                         "unsupported (1 or 3 only)")
    y, cb, cr = out_planes
    rgb = np.empty((h, w, 3), dtype=np.float64)
    rgb[..., 0] = y + 1.402 * (cr - 128.0)
    rgb[..., 1] = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    rgb[..., 2] = y + 1.772 * (cb - 128.0)
    px = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return px.reshape(h, w * 3), w, h, 3


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Registry-shaped decoder: JPEG payload -> flat uint8 sample array."""
    pixels, _w, _h, _c = parse_jpeg(payload)
    return pixels.reshape(-1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _blocks(plane: np.ndarray) -> np.ndarray:
    """Edge-pad a (H, W) float plane to 8-multiples and return
    (by, bx, 8, 8) blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if ph != h or pw != w:
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (plane.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3))


def _encode_blocks(writer: _BitWriter, blocks: np.ndarray, q: np.ndarray,
                   dc: dict, ac: dict, pred: int) -> int:
    """Entropy-encode a sequence of (8,8) blocks; returns the new DC
    predictor.  Quantized coefficients are computed vectorized up front;
    only the bit emission is per-symbol Python."""
    n = blocks.shape[0]
    F = np.einsum("ij,njk,lk->nil", _D, blocks - 128.0, _D)
    Qz = np.rint(F / q).astype(np.int64).reshape(n, 64)[:, ZIGZAG]
    for zz in Qz:
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s, bitsv = _magnitude(diff)
        code, length = dc[s]
        writer.put(code, length)
        if s:
            writer.put(bitsv, s)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac[0xF0]          # ZRL
                writer.put(code, length)
                run -= 16
            s, bitsv = _magnitude(v)
            code, length = ac[(run << 4) | s]
            writer.put(code, length)
            writer.put(bitsv, s)
            run = 0
        if last < 63:
            code, length = ac[0x00]              # EOB
            writer.put(code, length)
    return pred


def encode_jpeg(pixels: np.ndarray, channels: int = 1, quality: int = 90,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode a ``(height, width*channels)`` (or flat-able) uint8 array as
    a real baseline JPEG.  ``channels`` 1 (grayscale) or 3 (RGB);
    ``subsampling`` '444' or '420' (3-channel only); ``restart_interval``
    emits DRI + RSTn markers every that-many MCUs (tests use it to
    exercise the decoder's restart path)."""
    if channels not in (1, 3):
        raise ValueError(f"channels={channels} unsupported (1 or 3)")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling={subsampling!r} unsupported")
    if subsampling == "420" and channels == 1:
        subsampling = "444"          # grayscale has no chroma to subsample
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 1:
        px = px.reshape(1, -1)
    if px.ndim != 2 or px.shape[1] % channels:
        raise ValueError("pixels must be (height, width*channels)")
    h, stride = px.shape
    w = stride // channels
    ql = _scaled_quant(_Q_LUMA, quality).reshape(8, 8)
    qc = _scaled_quant(_Q_CHROMA, quality).reshape(8, 8)

    if channels == 1:
        planes = [px.astype(np.float64)]
    else:
        rgb = px.reshape(h, w, 3).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            # box-average 2x2 chroma (pad odd dims by edge replication)
            def _half(p: np.ndarray) -> np.ndarray:
                hp = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (hp.reshape(hp.shape[0] // 2, 2,
                                   hp.shape[1] // 2, 2)
                        .mean(axis=(1, 3)))
            cb, cr = _half(cb), _half(cr)
        planes = [y, cb, cr]

    sub420 = channels == 3 and subsampling == "420"
    samp = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * channels
    hmax = max(s[0] for s in samp[:channels])
    vmax = max(s[1] for s in samp[:channels])
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    dc_l, ac_l = _encode_codes(*_DC_LUMA), _encode_codes(*_AC_LUMA)
    dc_c, ac_c = _encode_codes(*_DC_CHROMA), _encode_codes(*_AC_CHROMA)
    comp_tbl = [(ql, dc_l, ac_l), (qc, dc_c, ac_c), (qc, dc_c, ac_c)]

    # pre-block every plane padded to the MCU grid
    grids = []
    for ci in range(channels):
        sh, sv = samp[ci]
        need_h, need_w = mcuy * sv * 8, mcux * sh * 8
        p = planes[ci]
        p = np.pad(p, ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
                   mode="edge")
        grids.append(_blocks(p))     # (by, bx, 8, 8)

    writer = _BitWriter()
    pred = [0] * channels
    rst_n = 0
    since = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and since == restart_interval:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst_n & 7)])
                rst_n += 1
                pred = [0] * channels
                since = 0
            for ci in range(channels):
                sh, sv = samp[ci]
                q, dc, ac = comp_tbl[ci]
                blks = np.stack([grids[ci][my * sv + by, mx * sh + bx]
                                 for by in range(sv) for bx in range(sh)])
                pred[ci] = _encode_blocks(writer, blks, q, dc, ac,
                                          pred[ci])
            since += 1
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return bytes([tid]) + bytes(int(x) for x in
                                    tbl.reshape(-1)[ZIGZAG])

    def dht(tc: int, th: int, spec: tuple) -> bytes:
        bits, vals = spec
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, dqt(0, ql))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, channels))
    if channels == 1:
        sof += bytes([1, 0x11, 0])
        out += seg(0xC4, dht(0, 0, _DC_LUMA))
        out += seg(0xC4, dht(1, 0, _AC_LUMA))
    else:
        out += seg(0xDB, dqt(1, qc))
        hv0 = 0x22 if sub420 else 0x11
        sof += bytes([1, hv0, 0, 2, 0x11, 1, 3, 0x11, 1])
        out += seg(0xC4, dht(0, 0, _DC_LUMA))
        out += seg(0xC4, dht(1, 0, _AC_LUMA))
        out += seg(0xC4, dht(0, 1, _DC_CHROMA))
        out += seg(0xC4, dht(1, 1, _AC_CHROMA))
    out += seg(0xC0, bytes(sof))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    if channels == 1:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
