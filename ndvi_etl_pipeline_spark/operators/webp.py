"""WebP support: pure-spec container/bitstream-header parsing plus
pixel decode/encode through the system libwebp C ABI.

Two deliberately different layers:

1. **Container + feature sniffing — native, zero libraries.** The
   RIFF/WEBP chunk walk, the VP8 key-frame tag + start code + 14-bit
   dimensions (RFC 6386 §9.1), the VP8L signature byte + 14-bit
   dimensions + alpha/version bits, and the VP8X feature flags +
   24-bit canvas size are all parsed from the published byte layouts
   (RFC 6386; the public WebP container spec). This is what a 100 TB
   media scan needs per payload: format, dimensions, lossy/lossless,
   animation/alpha flags — METADATA, extracted without decoding a
   single pixel (`webp_info`).

2. **Lossless (VP8L) pixel decode — native, zero libraries**
   (operators/vp8l.py): a from-scratch implementation of the public
   WebP Lossless Bitstream Specification (RFC 9649) — prefix codes,
   LZ77 + color cache, meta-prefix groups, and all four inverse
   transforms — pinned bit-exact against libwebp across a fixture
   matrix in tests. Used automatically when the system library is
   absent; with the library present the C fast path serves both
   codecs.

3. **Lossy (VP8) pixel decode/encode — ctypes against the system
   libwebp** (`WebPDecodeRGB` / `WebPEncodeRGB`, the library's
   stable public ABI; no pip packages). A from-scratch VP8 entropy
   decode in the jpeg.py style requires RFC 6386's normative
   constant tables — the 1056-entry default coefficient
   probabilities, their 1056-entry update probabilities, the
   900-entry keyframe B-mode table, the 128-entry quantizer
   lookups — which cannot be reproduced reliably offline; shipping
   guessed tables would decode real files silently wrong. Honest
   boundary: when libwebp is absent, LOSSY decode raises
   NotImplementedError and scan_media quarantines the row (E1),
   while VP8L decode and `webp_info` keep working everywhere.

Animated (VP8X ANIM) and fragmented payloads raise NotImplementedError
at the container layer by design — a frame extractor is a video
operator, not an image decode.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np

__all__ = [
    "HAVE_LIBWEBP",
    "webp_info",
    "decode_webp",
    "encode_webp",
]


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGB.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = lib.WebPDecodeRGB.argtypes
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGB.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue
        return lib
    return None


_LIB = _load_libwebp()
HAVE_LIBWEBP = _LIB is not None


def _chunks(payload: bytes):
    """Walk RIFF sub-chunks: yields (fourcc, data). Chunks are
    even-aligned (odd sizes carry a pad byte — the RIFF rule)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    pos = 12
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        data = payload[pos + 8 : pos + 8 + size]
        yield fourcc, data
        pos += 8 + size + (size & 1)


def webp_info(payload: bytes) -> dict:
    """Container-level metadata without decoding pixels (pure spec):
    {"codec": "vp8"|"vp8l", "width", "height", "lossless": bool,
    "alpha": bool, "animated": bool}.

    VP8 (RFC 6386 §9.1): 3-byte frame tag — bit 0 inverted keyframe
    flag, bits 1-3 version, bit 4 show_frame, bits 5-23 first
    partition size — then the 0x9D012A start code and two 16-bit
    little-endian fields whose low 14 bits are width/height (top 2
    bits are the rescale hints). VP8L: 0x2F signature, then 28 bits
    holding width-1 / height-1 (14 each), 1 alpha bit, 3 version
    bits. VP8X: 1 flags byte (ILAX ordering per the container spec)
    and 24-bit canvas width-1 / height-1."""
    info = {
        "codec": None,
        "width": None,
        "height": None,
        "lossless": False,
        "alpha": False,
        "animated": False,
    }
    for fourcc, data in _chunks(payload):
        if fourcc == b"VP8X" and len(data) >= 10:
            flags = data[0]
            info["alpha"] = bool(flags & 0x10)
            info["animated"] = bool(flags & 0x02)
            info["width"] = 1 + int.from_bytes(data[4:7], "little")
            info["height"] = 1 + int.from_bytes(data[7:10], "little")
        elif fourcc == b"VP8 " and len(data) >= 10:
            tag = int.from_bytes(data[0:3], "little")
            if tag & 0x1:  # inverted: 0 = key frame
                raise ValueError("VP8 stream does not start with a key frame")
            if data[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 key-frame start code")
            w_raw, h_raw = struct.unpack("<HH", data[6:10])
            info["codec"] = "vp8"
            if info["width"] is None:  # VP8X canvas size wins when present
                info["width"], info["height"] = w_raw & 0x3FFF, h_raw & 0x3FFF
        elif fourcc == b"VP8L" and len(data) >= 5:
            if data[0] != 0x2F:
                raise ValueError("bad VP8L signature byte")
            bits = int.from_bytes(data[1:5], "little")
            info["codec"] = "vp8l"
            info["lossless"] = True
            if info["width"] is None:  # VP8X canvas size wins when present
                info["width"] = (bits & 0x3FFF) + 1
                info["height"] = ((bits >> 14) & 0x3FFF) + 1
            info["alpha"] = info["alpha"] or bool((bits >> 28) & 1)
        elif fourcc == b"ALPH":
            info["alpha"] = True
    if info["codec"] is None:
        raise ValueError("no VP8/VP8L image chunk in container")
    return info


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a (non-animated) WebP payload to uint8 HWC — RGB, or
    RGBA when the container declares alpha. Container features are
    checked natively first, so an animated file fails with a clear
    boundary error rather than yielding libwebp's first-frame
    composite silently."""
    info = webp_info(payload)
    if info["animated"]:
        raise NotImplementedError(
            "animated WebP: frame extraction is a video operator, "
            "not an image decode"
        )
    if not HAVE_LIBWEBP:
        if info["codec"] == "vp8l":
            # lossless decodes NATIVELY (operators/vp8l.py — pure
            # spec, pinned bit-exact against libwebp); only lossy VP8
            # pixels need the library
            from .vp8l import decode_vp8l

            data = next(d for f, d in _chunks(payload) if f == b"VP8L")
            rgba = decode_vp8l(data)
            return rgba if info["alpha"] else rgba[:, :, :3]
        raise NotImplementedError(
            "lossy (VP8) WebP pixel decode requires the system libwebp "
            "(VP8L decodes natively; container metadata via webp_info "
            "works everywhere)"
        )
    w = ctypes.c_int()
    h = ctypes.c_int()
    if info["alpha"]:
        ptr, channels = _LIB.WebPDecodeRGBA(
            payload, len(payload), ctypes.byref(w), ctypes.byref(h)
        ), 4
    else:
        ptr, channels = _LIB.WebPDecodeRGB(
            payload, len(payload), ctypes.byref(w), ctypes.byref(h)
        ), 3
    if not ptr:
        raise ValueError("libwebp failed to decode payload")
    try:
        n = w.value * h.value * channels
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        _LIB.WebPFree(ptr)
    if (w.value, h.value) != (info["width"], info["height"]):
        raise ValueError(
            f"container/bitstream dimension mismatch: "
            f"{(info['width'], info['height'])} vs {(w.value, h.value)}"
        )
    return arr.reshape(h.value, w.value, channels)


def encode_webp(
    arr: np.ndarray, quality: float = 90.0, lossless: bool = False
) -> bytes:
    """Encode uint8 HWC RGB to WebP bytes (fixture/test path; requires
    libwebp). Grayscale HW1 is broadcast to RGB first."""
    if not HAVE_LIBWEBP:
        raise NotImplementedError("WebP encode requires the system libwebp")
    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise ValueError("encode_webp expects uint8 HWC")
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    if arr.shape[2] != 3:
        raise ValueError("encode_webp expects 1 or 3 channels")
    h, w = arr.shape[:2]
    buf = np.ascontiguousarray(arr).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    if lossless:
        size = _LIB.WebPEncodeLosslessRGB(buf, w, h, w * 3, ctypes.byref(out))
    else:
        size = _LIB.WebPEncodeRGB(
            buf, w, h, w * 3, float(quality), ctypes.byref(out)
        )
    if not size:
        raise ValueError("libwebp failed to encode")
    try:
        return ctypes.string_at(out, size)
    finally:
        _LIB.WebPFree(out)
