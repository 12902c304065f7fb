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
    "webp_frame_headers",
    "webp_frames",
    "encode_webp_animation",
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
        elif fourcc == b"ANMF" and len(data) >= 20 and info["codec"] is None:
            # animated: image chunks ride INSIDE the frame; sniff the
            # first frame's fourcc for the codec field
            sub = data[16:20]
            if sub == b"VP8L":
                info["codec"], info["lossless"] = "vp8l", True
            elif sub == b"VP8 ":
                info["codec"] = "vp8"
    if info["codec"] is None and not info["animated"]:
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


# --------------------------------------------------------------------------
# animated WebP: ANMF frame walk + canvas compositing (a VIDEO operator —
# decode_webp deliberately refuses animations; this is the explicit path)
# --------------------------------------------------------------------------


def _u24(b: bytes) -> int:
    return int.from_bytes(b[:3], "little")


def webp_frame_headers(payload: bytes) -> list[dict]:
    """Parse ANMF frame metadata WITHOUT decoding pixels (pure spec):
    per frame {x, y, width, height, duration_ms, blend, dispose_bg}.
    Offsets ride the container as value/2 (frames are even-aligned on
    the canvas); width/height as value-1; the flags byte carries
    dispose-to-background in bit 0 and no-blend in bit 1 (the demuxer
    convention for the spec's D/B fields)."""
    frames = []
    for fourcc, data in _chunks(payload):
        if fourcc == b"ANMF" and len(data) >= 16:
            flags = data[15]
            frames.append(
                {
                    "x": _u24(data[0:3]) * 2,
                    "y": _u24(data[3:6]) * 2,
                    "width": _u24(data[6:9]) + 1,
                    "height": _u24(data[9:12]) + 1,
                    "duration_ms": _u24(data[12:15]),
                    "blend": not (flags & 0x02),
                    "dispose_bg": bool(flags & 0x01),
                    "_data": data[16:],
                }
            )
    return frames


def _decode_frame_chunks(data: bytes) -> np.ndarray:
    """Decode the image chunks inside one ANMF frame to uint8 RGBA.
    VP8L frames decode NATIVELY (operators/vp8l.py); lossy VP8 frames
    re-wrap into a minimal RIFF container for the libwebp path."""
    pos = 0
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            from .vp8l import decode_vp8l

            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            chunk = fourcc + struct.pack("<I", size) + body
            if size & 1:
                chunk += b"\x00"
            riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
            rgb = decode_webp(riff)
            if rgb.shape[2] == 3:
                rgb = np.concatenate(
                    [rgb, np.full(rgb.shape[:2] + (1,), 255, np.uint8)], axis=2
                )
            return rgb
        if fourcc == b"ALPH":
            raise NotImplementedError(
                "lossy-with-alpha (ALPH) animation frames unsupported"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("ANMF frame without an image chunk")


def webp_frames(payload: bytes) -> tuple[np.ndarray, list[dict]]:
    """Extract an animated WebP to (frames, meta): frames is uint8
    (n, H, W, 4) — each entry the fully COMPOSITED canvas after that
    frame (alpha-blend or replace per the frame's blend flag, then
    dispose-to-background clears the frame rect for the next one) —
    and meta the per-frame headers (duration_ms etc., `_data`
    stripped). The video-operator twin of decode_webp; still images
    yield a single frame. Works without libwebp when every frame is
    VP8L (the native decoder)."""
    info = webp_info(payload)
    if not info["animated"]:
        arr = decode_webp(payload)
        if arr.shape[2] == 3:
            arr = np.concatenate(
                [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], axis=2
            )
        return arr[None, ...], [
            {"x": 0, "y": 0, "width": info["width"], "height": info["height"],
             "duration_ms": 0, "blend": False, "dispose_bg": False}
        ]
    heads = webp_frame_headers(payload)
    if not heads:
        raise ValueError("animated container without ANMF frames")
    h, w = info["height"], info["width"]
    canvas = np.zeros((h, w, 4), dtype=np.uint8)
    out = []
    metas = []
    for fr in heads:
        rgba = _decode_frame_chunks(fr.pop("_data"))
        fy, fx = fr["y"], fr["x"]
        fh, fw = fr["height"], fr["width"]
        if rgba.shape[:2] != (fh, fw):
            raise ValueError("ANMF rect / frame bitstream size mismatch")
        region = canvas[fy : fy + fh, fx : fx + fw].astype(np.float64)
        src = rgba.astype(np.float64)
        if fr["blend"]:
            sa = src[:, :, 3:4] / 255.0
            da = region[:, :, 3:4] / 255.0
            oa = sa + da * (1.0 - sa)
            safe = np.where(oa == 0.0, 1.0, oa)
            rgb = (src[:, :, :3] * sa + region[:, :, :3] * da * (1.0 - sa)) / safe
            blended = np.concatenate([rgb, oa * 255.0], axis=2)
            blended[(oa == 0.0)[:, :, 0]] = 0.0
            canvas[fy : fy + fh, fx : fx + fw] = np.round(blended).astype(np.uint8)
        else:
            canvas[fy : fy + fh, fx : fx + fw] = rgba
        out.append(canvas.copy())
        if fr["dispose_bg"]:
            canvas[fy : fy + fh, fx : fx + fw] = 0
        metas.append(fr)
    return np.stack(out), metas


def encode_webp_animation(
    frames, durations_ms, rects=None, blend=False, dispose_bg=False,
    lossless: bool = True,
) -> bytes:
    """Build an animated WebP container (VP8X + ANIM + ANMF chunks,
    per the public container spec) from uint8 RGB/RGBA frames —
    the fixture/writer twin of webp_frames. `rects` optionally places
    each frame at (x, y) on the canvas of frame 0's size; offsets
    must be even (the container stores them halved). Frames encode as
    VP8L via libwebp (alpha dropped — the lossless RGB path)."""
    frames = [np.asarray(f) for f in frames]
    h, w = frames[0].shape[:2]
    rects = rects or [(0, 0)] * len(frames)
    body = b"WEBP"
    flags = 0x02  # ANIM
    vp8x = bytes([flags, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    body += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = struct.pack("<I", 0) + struct.pack("<H", 0)  # bg color, loop forever
    body += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for frame, dur, (x, y) in zip(frames, durations_ms, rects):
        if x % 2 or y % 2:
            raise ValueError("frame offsets must be even")
        rgb = frame[:, :, :3]
        sub = encode_webp(np.ascontiguousarray(rgb), lossless=lossless)
        img_chunks = b""
        for fourcc, data in _chunks(sub):
            if fourcc in (b"VP8 ", b"VP8L"):
                img_chunks = fourcc + struct.pack("<I", len(data)) + data
                if len(data) & 1:
                    img_chunks += b"\x00"
        fh, fw = rgb.shape[:2]
        fbits = 0
        if dispose_bg:
            fbits |= 0x01
        if not blend:
            fbits |= 0x02
        anmf = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + int(dur).to_bytes(3, "little")
            + bytes([fbits])
            + img_chunks
        )
        body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body
