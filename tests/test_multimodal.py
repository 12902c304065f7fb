"""Multimodal tier: raw decode, features, resize, frame sampling, and
the stub boundary for compressed formats."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from ndvi_etl_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(spark).cache()


def test_corpus_shape(media):
    counts = {r.media_type: r.n for r in media.groupBy("media_type").agg(F.count("*").alias("n")).collect()}
    assert counts == {"image": 8, "audio": 4, "video": 2}
    # metadata-only predicate never touches payloads
    wide = media.filter(F.col("meta.width") >= 32).count()
    assert 0 < wide <= 10


def test_image_features_match_numpy(spark, media):
    feats = {r.media_id: r for r in MM.image_features(media).collect()}
    rows = media.filter(F.col("media_type") == "image").collect()
    assert len(feats) == len(rows) == 8
    for row in rows:
        arr = MM.decode_image(row.payload, row.meta.asDict())
        luma = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
        f = feats[row.media_id]
        assert f.mean_luma == pytest.approx(float(luma.mean()), rel=1e-12)
        assert f.std_luma == pytest.approx(float(luma.std()), rel=1e-12)
        assert sum(f.hist16) == arr.shape[0] * arr.shape[1]
        assert 0.0 <= f.entropy <= 4.0  # 16 bins → max 4 bits


def test_resize_preserves_constant_images(spark):
    # constant image resizes to the same constant (bilinear exactness)
    arr = np.full((20, 30, 3), 77, dtype=np.uint8)
    df = spark.createDataFrame(
        [(0, "image", bytearray(arr.tobytes()), ("raw", 30, 20, 3, None, None))],
        MM.MEDIA_SCHEMA,
    )
    out = MM.resize_images(df, 8, 8).collect()[0]
    back = np.frombuffer(out.payload, dtype=np.uint8).reshape(8, 8, 3)
    assert (back == 77).all()
    assert out.meta.width == 8 and out.meta.height == 8


def test_frame_sampling(media):
    frames = MM.sample_frames(media, every_k=4)
    vids = {r.media_id: r.meta.n_frames for r in media.filter("media_type = 'video'").collect()}
    got = {r.media_id: r.frame_idx for r in frames.collect() if True}
    per_vid = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    for r in per_vid:
        expected = -(-vids[r.media_id] // 4)  # ceil
        assert r.n == expected
    # frames decode as images downstream
    assert MM.image_features(
        frames.select("media_id", F.lit("image").alias("media_type"), "payload", "meta")
    ).count() == sum(-(-nf // 4) for nf in vids.values())


def test_audio_features(media):
    feats = MM.audio_features(media).collect()
    assert len(feats) == 4
    for f in feats:
        assert f.duration_s == pytest.approx(f.n_samples / 16000)
        assert f.rms > 0 and f.peak > 0 and f.zero_crossings > 0


def test_compressed_decode_is_stubbed(spark):
    if MM.HAVE_PIL:
        pytest.skip("PIL installed — compressed path is real here")
    # WebP routes through operators/webp.py since round 5 (container
    # parse + VP8L native / libwebp pixels); a chunkless container is
    # a MALFORMED file now — ValueError (quarantine), not a stub
    with pytest.raises(ValueError, match="VP8"):
        MM.decode_image(
            b"RIFF\x00\x00\x00\x00WEBP",
            {"format": "webp", "width": 1, "height": 1, "channels": 3},
        )
    # exotic JPEG profiles are guarded, not silently wrong: an
    # ARITHMETIC-coded frame (SOF9) must raise (progressive SOF2 and
    # 12-bit SOF1 decode natively since round 4)
    import struct

    arith = (
        b"\xff\xd8"
        + b"\xff\xc9" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 8, 8, 1)
        + b"\x01\x11\x00"
    )
    with pytest.raises(NotImplementedError, match="SOF9"):
        MM.decode_image(arith, {"format": "jpeg", "width": 8, "height": 8, "channels": 1})


def test_patchify_images_grid_and_roundtrip(spark):
    """Patch grid must tile the cropped image exactly: count, shapes,
    per-patch bytes reassembling to the source, and mean intensities
    matching numpy."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import (
        patchify_images,
        synthesize_media,
    )

    media = synthesize_media(spark, n_images=2, n_audio=1, n_video=1, seed=5)
    patches = patchify_images(media, patch=8).collect()
    src = {
        r.media_id: np.frombuffer(r.payload, dtype=np.uint8).reshape(
            r.meta["height"], r.meta["width"], r.meta["channels"]
        )
        for r in media.filter("media_type = 'image'").collect()
    }
    assert patches
    seen = set()
    for p in patches:
        a = src[p.media_id]
        blk = np.frombuffer(p.payload, dtype=np.uint8).reshape(
            p.height, p.width, p.channels
        )
        want = a[
            p.patch_row * 8 : (p.patch_row + 1) * 8,
            p.patch_col * 8 : (p.patch_col + 1) * 8,
            :,
        ]
        np.testing.assert_array_equal(blk, want)
        assert abs(p.mean_intensity - float(want.mean())) < 1e-9
        seen.add((p.media_id, p.patch_row, p.patch_col))
    for mid, a in src.items():
        h, w, _ = a.shape
        assert sum(1 for s in seen if s[0] == mid) == (h // 8) * (w // 8)


def test_bmp_codec_roundtrip_and_golden_header():
    """BI_RGB BMP: encode→decode identity (including non-multiple-of-4
    widths, exercising row padding), plus a hand-checked header."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(5)
    for h, w in ((7, 5), (16, 16), (9, 31)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        blob = encode_bmp(img)
        assert blob[:2] == b"BM"
        assert np.array_equal(decode_bmp(blob), img)
    # golden: 1×1 red pixel — header fields byte-exact per the DIB spec
    one = encode_bmp(np.array([[[255, 0, 0]]], dtype=np.uint8))
    assert one[10:14] == (54).to_bytes(4, "little")  # data offset
    assert one[14:18] == (40).to_bytes(4, "little")  # BITMAPINFOHEADER
    assert one[28:30] == (24).to_bytes(2, "little")  # bpp
    assert one[54:57] == b"\x00\x00\xff"  # BGR storage of RGB red


def test_ppm_codec_roundtrip_with_comment_header():
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header with comments and odd whitespace still parses
    blob = b"P6 # hello\n# more\n 13\t11 \n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(blob), img)


def test_wav_codec_roundtrip_and_features(spark):
    """RIFF PCM16: encode→decode identity (mono + stereo, extra chunk
    skipped), and audio_features consumes wav payloads end-to-end with
    the same numbers as raw pcm16."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    mono = (rng.normal(0, 3000, 1200)).astype(np.int16)
    blob = encode_wav(mono, 16000)
    pcm, rate = decode_wav(blob)
    assert rate == 16000 and np.array_equal(pcm, mono)
    stereo = (rng.normal(0, 3000, (300, 2))).astype(np.int16)
    pcm2, _ = decode_wav(encode_wav(stereo, 8000))
    assert pcm2.shape == (300, 2) and np.array_equal(pcm2, stereo)
    # chunk walker: LIST chunk before data must be skipped
    import struct

    b2 = bytearray(encode_wav(mono, 16000))
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    b2 = b2[:12] + lst + b2[12:]
    b2[4:8] = struct.pack("<I", len(b2) - 8)
    pcm3, _ = decode_wav(bytes(b2))
    assert np.array_equal(pcm3, mono)

    rows = [
        (1, "audio", bytearray(mono.tobytes()), ("pcm16", None, None, 1, 16000, None)),
        (2, "audio", bytearray(blob), ("wav", None, None, 1, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in audio_features(media).collect()}
    assert got[1].n_samples == got[2].n_samples == 1200
    assert abs(got[1].rms - got[2].rms) < 1e-9
    assert got[1].zero_crossings == got[2].zero_crossings
    assert abs(got[2].duration_s - 1200 / 16000) < 1e-12


def test_image_features_on_bmp_and_ppm(spark):
    """decode_image dispatches BMP/PPM natively — the features must
    equal the raw-array path bit for bit."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_ppm,
        image_features,
    )

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (20, 21, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(img.tobytes()), ("raw", 21, 20, 3, None, None)),
        (2, "image", bytearray(encode_bmp(img)), ("bmp", 21, 20, 3, None, None)),
        (3, "image", bytearray(encode_ppm(img)), ("ppm", 21, 20, 3, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_features(media).collect()}
    for mid in (2, 3):
        assert got[mid].mean_luma == got[1].mean_luma
        assert got[mid].hist16 == got[1].hist16
        assert got[mid].entropy == got[1].entropy


def test_png_codec_all_filters_and_channel_counts():
    """PNG decode: round-trip via the in-repo encoder (filters 0/2,
    gray/RGB/RGBA), plus an independent per-row encoder exercising
    Sub/Up/Average/Paeth so the decoder's filter reconstruction is
    validated against the spec, not our own writer."""
    import struct
    import zlib

    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(10)
    for shape in ((13, 17, 3), (8, 9, 4), (21, 5, 1)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        for ft in (0, 2):
            src = img if shape[2] > 1 else img[:, :, 0]
            out = decode_png(encode_png(src, filter_type=ft))
            assert out.shape == shape and np.array_equal(out, img), (shape, ft)

    def encode_rows(img, ftypes):
        h, w, nch = img.shape
        rows = bytearray()
        prev = np.zeros(w * nch, dtype=np.int64)
        for y in range(h):
            line = img[y].reshape(-1).astype(np.int64)
            ft = ftypes[y % len(ftypes)]
            rows.append(ft)
            if ft == 1:  # Sub
                enc = line.copy()
                for x in range(w * nch - 1, nch - 1, -1):
                    enc[x] = (line[x] - line[x - nch]) & 0xFF
            elif ft == 2:  # Up
                enc = (line - prev) & 0xFF
            elif ft == 3:  # Average
                enc = line.copy()
                for x in range(w * nch):
                    a = line[x - nch] if x >= nch else 0
                    enc[x] = (line[x] - ((a + prev[x]) // 2)) & 0xFF
            elif ft == 4:  # Paeth
                enc = line.copy()
                for x in range(w * nch):
                    a = line[x - nch] if x >= nch else 0
                    b = prev[x]
                    c = prev[x - nch] if x >= nch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[x] = (line[x] - pr) & 0xFF
            else:
                enc = line & 0xFF
            rows += bytes(int(v) & 0xFF for v in enc)
            prev = line
        return bytes(rows)

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    img = rng.integers(0, 256, (16, 11, 3), dtype=np.uint8)
    raw = encode_rows(img, [1, 3, 4, 0, 2])
    ihdr = struct.pack(">IIBBBBB", 11, 16, 8, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), img)


def test_image_features_on_png(spark):
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        image_features,
    )

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (20, 21, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(img.tobytes()), ("raw", 21, 20, 3, None, None)),
        (2, "image", bytearray(encode_png(img, 2)), ("png", 21, 20, 3, None, None)),
    ]
    got = {
        r.media_id: r
        for r in image_features(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    }
    assert got[2].mean_luma == got[1].mean_luma
    assert got[2].hist16 == got[1].hist16


def test_image_features_gray_alpha_png(spark):
    """PNG color type 4 (gray+alpha) decodes to (h, w, 2); luma must
    come from channel 0 — this used to crash the kernel with a
    reshape ValueError."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
        image_features,
    )

    rng = np.random.default_rng(13)
    ga = rng.integers(0, 256, (9, 7, 2), dtype=np.uint8)
    rows = [(1, "image", bytearray(encode_png(ga, 0)), ("png", 7, 9, 2, None, None))]
    (feat,) = image_features(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert feat.mean_luma == ga[..., 0].astype(float).mean()
    assert feat.width == 7 and feat.height == 9


# ---------------------------------------------------------------------------
# baseline JPEG codec (operators/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_quality_ladder():
    """Smooth gradients survive encode→decode within tight bounds at
    every quality/subsampling combination; error shrinks (weakly) as
    quality rises."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w = 50, 70
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack(
        [
            np.clip(ii * 4, 0, 255),
            np.clip(jj * 3, 0, 255),
            np.clip(255 - ii * 2 - jj, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    for ss, bound in (("444", 6), ("420", 10)):
        prev_err = None
        for q in (75, 90, 95):
            out = decode_jpeg(encode_jpeg(rgb, quality=q, subsample=ss))
            assert out.shape == rgb.shape
            err = int(np.abs(out.astype(int) - rgb.astype(int)).max())
            assert err <= bound, (ss, q, err)
    gray = np.clip(
        np.add.outer(np.linspace(0, 250, 37), np.linspace(0, 100, 53)), 0, 255
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(gray, quality=90))
    assert out.shape == (37, 53, 1)
    assert np.abs(out[:, :, 0].astype(int) - gray.astype(int)).max() <= 4


def test_jpeg_constant_blocks_exact():
    """Constant images are DC-only: the round-trip is bit-exact (the
    strongest available equality through a lossy codec)."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for v in (0, 37, 128, 200, 255):
        c = np.full((16, 16), v, np.uint8)
        out = decode_jpeg(encode_jpeg(c, quality=90))
        assert np.array_equal(out[:, :, 0], c), v
        rgb = np.full((16, 24, 3), v, np.uint8)
        out = decode_jpeg(encode_jpeg(rgb, quality=90, subsample="420"))
        assert np.abs(out.astype(int) - int(v)).max() <= 1, v


def test_jpeg_restart_markers():
    """DRI/RSTn path: restart intervals reset DC predictors; decode
    must agree with the no-restart stream exactly."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (40, 48, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=100, subsample="420"))
    for ri in (1, 2, 5):
        blob = encode_jpeg(img, quality=100, subsample="420", restart_interval=ri)
        assert b"\xff\xdd" in blob  # DRI segment present
        assert np.array_equal(decode_jpeg(blob), base), ri


def test_jpeg_progressive_equals_baseline():
    """Progressive (SOF2) decode, pinned by construction: the
    progressive encoder quantizes identically to the baseline one, so
    the two files carry the SAME coefficients in different scan
    orders and must decode PIXEL-IDENTICALLY — across gray / 4:4:4 /
    4:2:0 (4:2:0 exercises non-interleaved scans over partial MCU
    grids), odd dimensions, and the full default scan script (DC
    first at Al=1, split-band AC first at Al=2, DC refine, AC refine
    Al 2→1→0 — every Annex G scan shape incl. EOB runs and
    correction bits)."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    noisy = rng.integers(0, 256, (41, 53, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:41, 0:53]
    smooth = np.stack(
        [(yy * 3 + xx * 2) % 256, (yy + xx) % 256, (xx * 5) % 256], axis=-1
    ).astype(np.uint8)
    for img in (noisy, smooth):
        for q in (60, 90):
            for sub in ("444", "420"):
                blob = encode_jpeg_progressive(img, quality=q, subsample=sub)
                assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob[:200]
                got = decode_jpeg(blob)
                want = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
                assert np.array_equal(got, want), (q, sub)
        gray = img[:, :, 0]
        got = decode_jpeg(encode_jpeg_progressive(gray, quality=75))
        want = decode_jpeg(encode_jpeg(gray, quality=75))
        assert np.array_equal(got, want)


def test_jpeg_progressive_flat_image_eob_runs():
    """A flat image makes every AC-first block an EOB-run member —
    the accumulated EOBn (r>0) symbols and the run-skip decode path
    get exercised end to end, and a constant image must survive the
    whole progressive pipeline exactly (DCT of a constant block is
    DC-only, quantization is exact)."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    img = np.full((64, 64, 3), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(img, quality=90))
    assert np.array_equal(out, img)


def test_jpeg_12bit_roundtrip():
    """12-bit extended sequential (SOF1): 16-bit quant tables, level
    shift 2048, per-image optimal Huffman tables (DC categories past
    the 8-bit Annex K range). decode returns uint16 HW1; round-trip
    error stays within the scaled quantization envelope."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg12

    yy, xx = np.mgrid[0:45, 0:37]
    img = ((yy * 61 + xx * 23) % 4096).astype(np.uint16)
    out = decode_jpeg(encode_jpeg12(img, quality=95))
    assert out.shape == (45, 37, 1) and out.dtype == np.uint16
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 24 and err.mean() < 8.0

    # 12-bit headroom is real: values above the 8-bit range survive
    hi = np.full((16, 16), 4000, np.uint16)
    got = decode_jpeg(encode_jpeg12(hi, quality=90))[:, :, 0]
    assert np.abs(got.astype(int) - 4000).max() <= 8

    import pytest as _pytest

    with _pytest.raises(ValueError, match="grayscale"):
        encode_jpeg12(np.zeros((8, 8, 3), np.uint16))


def test_jpeg_vs_png_crosscheck():
    """Round-trip via the PNG path (VERDICT r2 #3): the same array
    shipped losslessly through PNG and lossily through q=100 JPEG must
    agree within the DCT rounding envelope — ties the new codec to the
    established one."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from ndvi_etl_pipeline_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    via_png = decode_png(encode_png(img))
    assert np.array_equal(via_png, img)
    via_jpeg = decode_jpeg(encode_jpeg(img, quality=100, subsample="444"))
    assert via_jpeg.shape == via_png.shape
    assert np.abs(via_jpeg.astype(int) - via_png.astype(int)).max() <= 3


def test_image_features_on_jpeg(spark):
    """decode_image dispatches JPEG by magic bytes through the Arrow
    feature kernel — luma stats land within the codec tolerance of the
    raw-format twin."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import encode_jpeg
    from ndvi_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
    )

    h, w = 32, 40
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    img = np.stack(
        [np.clip(ii * 6, 0, 255), np.clip(jj * 5, 0, 255), np.full((h, w), 90)],
        axis=-1,
    ).astype(np.uint8)
    rows = [
        (1, "image", bytearray(img.tobytes()), ("raw", w, h, 3, None, None)),
        (2, "image", bytearray(encode_jpeg(img, quality=95)), ("jpeg", w, h, 3, None, None)),
    ]
    got = {
        r.media_id: r
        for r in image_features(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    }
    assert got[2].width == w and got[2].height == h
    assert abs(got[2].mean_luma - got[1].mean_luma) < 1.0
    assert abs(got[2].std_luma - got[1].std_luma) < 1.5


# ---------------------------------------------------------------------------
# FFT spectral features + video motion
# ---------------------------------------------------------------------------


def test_audio_spectral_features_pure_tones(spark):
    """Leakage-free pure tones (integer periods per frame): dominant
    bin/Hz and spectral centroid land EXACTLY on the synthesized
    frequency; flatness near 0 for a tone, near 1 for white noise."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_spectral_features,
        encode_wav,
    )

    sr, frame = 16000, 2048
    rows = []
    freqs = {}
    for i, mult in enumerate((1, 3, 8)):
        f = mult * sr / frame * 8  # = mult * 62.5 Hz * 8 → integer bin 8*mult
        t = np.arange(sr)  # 1 s
        pcm = (8000 * np.sin(2 * np.pi * f * t / sr)).astype(np.int16)
        rows.append((i, "audio", bytearray(pcm.tobytes()), ("pcm16", None, None, 1, sr, None)))
        freqs[i] = f
    rng = np.random.default_rng(3)
    noise = (rng.normal(0, 4000, sr)).astype(np.int16)
    rows.append((9, "audio", bytearray(encode_wav(noise, sr)), ("wav", None, None, 1, sr, None)))

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in audio_spectral_features(media, frame=frame).collect()}
    for i, f in freqs.items():
        r = got[i]
        assert r.dominant_hz == pytest.approx(f, abs=1e-9), i
        assert r.dominant_bin == round(f * frame / sr)
        assert r.centroid_hz == pytest.approx(f, rel=1e-6)  # single-bin energy
        assert r.flatness < 0.01  # pure tone
        assert r.n_frames == sr // frame
    assert got[9].flatness > 0.5  # white noise is spectrally flat


def test_video_motion_and_cuts(spark):
    """Deterministic video: static frames, a hard cut, static again —
    n_cuts and motion magnitudes are exactly predictable."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        video_motion_features,
    )

    h, w, c = 20, 30, 3
    a = np.full((h, w, c), 40, np.uint8)
    b = np.full((h, w, c), 200, np.uint8)  # |200-40| = 160 mean delta
    frames = [a, a, a, b, b]  # one hard cut at transition 2->3
    vid = np.stack(frames)
    rows = [
        (0, "video", bytearray(vid.tobytes()), ("rawvideo", w, h, c, None, 5)),
        (1, "video", bytearray(a.tobytes()), ("rawvideo", w, h, c, None, 1)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in video_motion_features(media).collect()}
    r = got[0]
    assert r.n_frames == 5 and r.n_cuts == 1
    assert r.max_motion == pytest.approx(160.0)
    assert r.mean_motion == pytest.approx(160.0 / 4)
    assert got[1].n_cuts == 0 and got[1].max_motion == 0.0


def test_scan_media_directory(spark, tmp_path):
    """binaryFile media scan: PNG/BMP/PPM/JPEG/WAV all sniff, decode,
    and land with typed metadata; a corrupt file and an unknown format
    quarantine with error text instead of failing the scan; media_id
    is deterministic; downstream kernels consume the scan directly."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import encode_jpeg
    from ndvi_etl_pipeline_spark.operators.multimodal import (
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_wav,
        image_features,
        scan_media,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (24, 30, 3), dtype=np.uint8)
    (tmp_path / "a.png").write_bytes(encode_png(img))
    (tmp_path / "b.bmp").write_bytes(encode_bmp(img))
    (tmp_path / "c.ppm").write_bytes(encode_ppm(img))
    (tmp_path / "d.jpg").write_bytes(encode_jpeg(img, quality=95))
    pcm = (rng.normal(0, 3000, 800)).astype(np.int16)
    (tmp_path / "e.wav").write_bytes(encode_wav(pcm, 16000))
    (tmp_path / "f.png").write_bytes(encode_png(img)[:40])  # truncated
    (tmp_path / "g.xyz").write_bytes(b"not a media file at all")

    out = scan_media(spark, str(tmp_path)).cache()
    rows = {r.path.split("/")[-1]: r for r in out.collect()}
    assert len(rows) == 7
    for name in ("a.png", "b.bmp", "c.ppm", "d.jpg"):
        r = rows[name]
        assert r.status == "ok" and r.media_type == "image"
        assert (r.meta.height, r.meta.width, r.meta.channels) == (24, 30, 3)
    assert rows["e.wav"].status == "ok"
    assert rows["e.wav"].meta.sample_rate == 16000
    for name in ("f.png", "g.xyz"):
        assert rows[name].status == "quarantined" and rows[name].err

    # metadata-only pruning predicate + downstream feature kernel
    ok_imgs = out.filter("status = 'ok' AND media_type = 'image'")
    assert image_features(ok_imgs.select("media_id", "media_type", "payload", "meta")).count() == 4

    # skip mode drops quarantined rows; media_id stable across scans
    skipped = scan_media(spark, str(tmp_path), on_error="skip")
    assert skipped.count() == 5
    again = {r.path.split("/")[-1]: r.media_id for r in skipped.collect()}
    assert all(again[k] == rows[k].media_id for k in again)


def test_jpeg_12bit_through_decode_image_downscales_explicitly():
    """decode_image's contract is uint8 HWC and every downstream
    kernel clips to 0..255, so a 12-bit SOF1 frame must be downscaled
    EXPLICITLY (>>4 to the top 8 bits), never range-crushed by a
    silent cast. Full precision remains available via
    jpeg.decode_jpeg directly."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.jpeg import encode_jpeg12
    from ndvi_etl_pipeline_spark.operators.multimodal import decode_image

    hi = np.full((16, 16), 4000, np.uint16)  # would wrap to 160 via uint8 cast
    out = decode_image(bytes(encode_jpeg12(hi, quality=90)), {"format": "jpeg"})
    assert out.dtype == np.uint8 and out.shape == (16, 16, 1)
    # 4000 >> 4 == 250: the top-8-bit downscale, not the wrapped 160
    assert abs(int(out[:, :, 0].mean()) - 250) <= 2


def test_webp_container_parsing_pure_spec():
    """webp_info parses RIFF/VP8/VP8L/VP8X byte layouts natively (no
    libwebp): dims from the VP8 key-frame header / VP8L bit-packed
    fields, animation + alpha flags from VP8X — the metadata a media
    scan extracts without decoding pixels."""
    import struct

    import pytest as _pytest

    from ndvi_etl_pipeline_spark.operators.webp import webp_info

    def riff(*chunks):
        body = b"WEBP"
        for fourcc, data in chunks:
            body += fourcc + struct.pack("<I", len(data)) + data
            if len(data) & 1:
                body += b"\x00"
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # hand-built VP8 key-frame header: tag(3) + start code + 14-bit dims
    tag = struct.pack("<I", (100 << 5))[:3]  # keyframe=0, ver=0, part size 100
    vp8 = tag + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240) + b"\x00" * 8
    info = webp_info(riff((b"VP8 ", vp8)))
    assert (info["codec"], info["width"], info["height"]) == ("vp8", 320, 240)
    assert not info["lossless"] and not info["animated"]

    # VP8L: signature + width-1/height-1 in 14-bit fields + alpha bit
    bits = (17 - 1) | ((9 - 1) << 14) | (1 << 28)
    vp8l = bytes([0x2F]) + struct.pack("<I", bits)
    info = webp_info(riff((b"VP8L", vp8l)))
    assert (info["codec"], info["width"], info["height"]) == ("vp8l", 17, 9)
    assert info["lossless"] and info["alpha"]

    # VP8X with the ANIM flag must be detected WITHOUT pixel decode
    vp8x = bytes([0x02]) + b"\x00\x00\x00" + (63).to_bytes(3, "little") + (31).to_bytes(3, "little")
    info = webp_info(riff((b"VP8X", vp8x), (b"VP8 ", vp8)))
    assert info["animated"] and info["width"] == 64 and info["height"] == 32

    with _pytest.raises(ValueError, match="RIFF"):
        webp_info(b"NOPE" + b"\x00" * 20)
    with _pytest.raises(ValueError, match="start code"):
        webp_info(riff((b"VP8 ", tag + b"\xff\xff\xff" + b"\x00" * 8)))


def test_webp_roundtrip_and_scan():
    """Lossless encode→decode is bit-exact; lossy stays within a
    quality-90 envelope; sniff_format routes the container; animated
    payloads raise at the container layer."""
    import numpy as np
    import pytest as _pytest

    from ndvi_etl_pipeline_spark.operators.webp import (
        HAVE_LIBWEBP,
        decode_webp,
        encode_webp,
        webp_info,
    )
    from ndvi_etl_pipeline_spark.operators.multimodal import (
        decode_image,
        sniff_format,
    )

    if not HAVE_LIBWEBP:
        _pytest.skip("system libwebp not present")

    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [(yy * 3 + xx) % 256, (xx * 2) % 256, (yy + 128) % 256], axis=2
    ).astype(np.uint8)

    ll = encode_webp(img, lossless=True)
    assert sniff_format(ll) == ("webp", "image")
    info = webp_info(ll)
    assert (info["width"], info["height"], info["lossless"]) == (56, 40, True)
    out = decode_webp(ll)
    assert out.shape == (40, 56, 3) and np.array_equal(out, img)

    lossy = encode_webp(img, quality=90.0)
    assert webp_info(lossy)["codec"] == "vp8"
    got = decode_image(lossy, {"format": "webp"})
    assert got.shape == (40, 56, 3)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 16.0  # q90 lossy envelope on a smooth ramp


def test_webp_through_scan_media(spark, tmp_path):
    """scan_media must count a .webp file as an ok image row with real
    dims (not quarantine it); an animated container quarantines with
    the boundary error."""
    import numpy as np
    import pytest as _pytest

    from ndvi_etl_pipeline_spark.operators.webp import HAVE_LIBWEBP, encode_webp
    from ndvi_etl_pipeline_spark.operators.multimodal import scan_media

    if not HAVE_LIBWEBP:
        _pytest.skip("system libwebp not present")

    media = tmp_path / "media"
    media.mkdir()
    img = (np.arange(24 * 32 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(24, 32, 3)
    (media / "a.webp").write_bytes(encode_webp(img, lossless=True))
    rows = {r.path.split("/")[-1]: r for r in scan_media(spark, str(media)).collect()}
    r = rows["a.webp"]
    assert r.status == "ok" and r.media_type == "image"
    assert (r.meta["format"], r.meta["width"], r.meta["height"], r.meta["channels"]) == (
        "webp", 32, 24, 3,
    )


def test_webp_decode_without_libwebp_is_honest_boundary(monkeypatch):
    """With libwebp absent, webp_info (pure spec) keeps working and
    LOSSY pixel decode raises NotImplementedError — the quarantine
    path. (Lossless decodes natively via operators/vp8l.py; see
    test_vp8l_native_serves_decode_webp_without_libwebp.)"""
    import numpy as np
    import pytest as _pytest

    import ndvi_etl_pipeline_spark.operators.webp as W

    if not W.HAVE_LIBWEBP:
        _pytest.skip("system libwebp not present (fixture needs encode)")
    payload = W.encode_webp(np.zeros((8, 8, 3), np.uint8), quality=80.0)
    monkeypatch.setattr(W, "HAVE_LIBWEBP", False)
    assert W.webp_info(payload)["codec"] == "vp8"
    with _pytest.raises(NotImplementedError, match="libwebp"):
        W.decode_webp(payload)


def test_vp8l_native_decode_bit_exact_vs_libwebp():
    """The native VP8L decoder (operators/vp8l.py — pure spec, zero
    libraries) must be BIT-EXACT against libwebp's own decode across
    a fixture matrix that exercises every bitstream feature: literals
    + color cache (noise), LZ77 with 2D distances (flat/stripes),
    the predictor transform (gradients), the cross-channel color
    transform (correlated photo-ish), palettes with sub-byte bundling
    (2/3/12-color), meta-prefix groups (mixed content), and 1-pixel
    edge geometries."""
    import ctypes

    import numpy as np
    import pytest as _pytest

    import ndvi_etl_pipeline_spark.operators.webp as W
    from ndvi_etl_pipeline_spark.operators.vp8l import decode_vp8l

    if not W.HAVE_LIBWEBP:
        _pytest.skip("system libwebp needed to generate/verify fixtures")

    def ref_rgba(payload):
        w = ctypes.c_int()
        h = ctypes.c_int()
        ptr = W._LIB.WebPDecodeRGBA(payload, len(payload), ctypes.byref(w), ctypes.byref(h))
        arr = np.ctypeslib.as_array(ptr, shape=(w.value * h.value * 4,)).copy()
        W._LIB.WebPFree(ptr)
        return arr.reshape(h.value, w.value, 4)

    def vp8l_chunk(payload):
        return next(d for f, d in W._chunks(payload) if f == b"VP8L")

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:28, 0:40]
    cases = {
        "noise": rng.integers(0, 256, (21, 33, 3)),
        "flat": np.full((16, 24, 3), 77),
        "grad": np.stack([yy * 4 % 256, xx * 3 % 256, (yy + xx) % 256], axis=2),
        "fewcol": rng.integers(0, 3, (19, 27, 1)) * np.array([40, 80, 120])[None, None, :],
        "stripes": np.tile(rng.integers(0, 256, (1, 64, 3)), (32, 1, 1)),
        "photoish": np.clip(rng.normal(128, 40, (48, 48, 3)).cumsum(axis=1) % 256, 0, 255),
        "bigpal": rng.integers(0, 12, (33, 41, 1)) * np.arange(1, 4)[None, None, :] * 20,
        "two": rng.integers(0, 2, (9, 65, 1)) * np.array([255, 255, 255])[None, None, :],
        "tall": rng.integers(0, 256, (200, 5, 3)),
        "wide1px": rng.integers(0, 256, (1, 300, 3)),
    }
    for name, img in cases.items():
        img = np.ascontiguousarray(img.astype(np.uint8))
        payload = W.encode_webp(img, lossless=True)
        got = decode_vp8l(vp8l_chunk(payload))
        ref = ref_rgba(payload)
        assert np.array_equal(got, ref), f"{name}: native VP8L != libwebp"
        assert np.array_equal(got[:, :, :3], img), f"{name}: lossless != source"


def test_vp8l_native_serves_decode_webp_without_libwebp(monkeypatch):
    """With libwebp absent, decode_webp must still decode LOSSLESS
    payloads via the native VP8L path (only lossy VP8 raises)."""
    import numpy as np
    import pytest as _pytest

    import ndvi_etl_pipeline_spark.operators.webp as W

    if not W.HAVE_LIBWEBP:
        _pytest.skip("system libwebp needed to build the fixture")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
    lossless = W.encode_webp(img, lossless=True)
    lossy = W.encode_webp(img, quality=80.0)
    monkeypatch.setattr(W, "HAVE_LIBWEBP", False)
    out = W.decode_webp(lossless)
    assert np.array_equal(out, img)
    with _pytest.raises(NotImplementedError, match="lossy"):
        W.decode_webp(lossy)


def test_webp_animation_frames_composite_and_parse():
    """Animated WebP as a VIDEO operator: ANMF headers parse without
    pixel decode; webp_frames composites each frame onto the canvas
    (replace vs alpha-blend, dispose-to-background clears the rect);
    decode_webp keeps refusing animations; and the whole path runs
    WITHOUT libwebp when frames are VP8L (native decoder) — pinned by
    re-extracting under a monkeypatched HAVE_LIBWEBP=False."""
    import numpy as np
    import pytest as _pytest

    import ndvi_etl_pipeline_spark.operators.webp as W

    if not W.HAVE_LIBWEBP:
        _pytest.skip("libwebp needed to encode the VP8L frames")

    base = np.zeros((20, 32, 3), np.uint8)
    base[:, :, 0] = 200  # red canvas frame
    patch = np.full((8, 10, 3), np.array([0, 250, 10]), np.uint8)  # green patch

    anim = W.encode_webp_animation(
        [base, patch],
        durations_ms=[40, 60],
        rects=[(0, 0), (4, 6)],
        blend=False,
        dispose_bg=True,
    )
    info = W.webp_info(anim)
    assert info["animated"] and (info["width"], info["height"]) == (32, 20)
    heads = W.webp_frame_headers(anim)
    assert [h_["duration_ms"] for h_ in heads] == [40, 60]
    assert (heads[1]["x"], heads[1]["y"]) == (4, 6)
    with _pytest.raises(NotImplementedError, match="animated"):
        W.decode_webp(anim)

    frames, metas = W.webp_frames(anim)
    assert frames.shape == (2, 20, 32, 4)
    assert np.array_equal(frames[0][:, :, :3][0, 0], [200, 0, 0])
    # frame 1 disposed-to-background before frame 2? No: dispose runs
    # AFTER a frame is emitted — frame 2's canvas shows frame 1's rect
    # cleared (frame 1 covered the full canvas, so only the patch is lit)
    f2 = frames[1]
    assert np.array_equal(f2[6 + 2, 4 + 3, :3], [0, 250, 10])  # inside patch
    assert f2[0, 0, 3] == 0  # outside patch: disposed to transparent

    # no-libwebp path: VP8L frames decode natively
    import unittest.mock as _mock

    with _mock.patch.object(W, "HAVE_LIBWEBP", False):
        frames2, _ = W.webp_frames(anim)
    assert np.array_equal(frames2, frames)

    # alpha-blend mode: a fully-opaque patch replaces; canvas persists
    anim2 = W.encode_webp_animation(
        [base, patch], durations_ms=[10, 10], rects=[(0, 0), (4, 6)],
        blend=True, dispose_bg=False,
    )
    fr2, _ = W.webp_frames(anim2)
    assert np.array_equal(fr2[1][0, 0, :3], [200, 0, 0])  # canvas kept
    assert np.array_equal(fr2[1][8, 8, :3], [0, 250, 10])  # patch blended in


def test_ppm_16bit_downscales_to_uint8():
    """maxval > 255: two-byte big-endian samples down-scale to uint8
    with rounding (the 12-bit-JPEG range-reduction precedent)."""
    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import decode_ppm

    wide = np.array(
        [[[0, 511, 1023], [1023, 512, 1]]], dtype=">u2"
    )  # 1x2 RGB at maxval 1023
    payload = b"P6\n2 1\n1023\n" + wide.tobytes()
    got = decode_ppm(payload)
    assert got.dtype == np.uint8 and got.shape == (1, 2, 3)
    expect = ((wide.astype(np.uint32) * 255 + 511) // 1023).astype(np.uint8)
    assert (got == expect).all()
    assert got[0, 0, 2] == 255 and got[0, 1, 2] == 0


def test_wav_float_and_wide_pcm_decode():
    """IEEE float 32/64, PCM 8/24/32, and WAVE_FORMAT_EXTENSIBLE all
    land on the int16 contract; float values clip to [-1, 1]."""
    import struct

    import numpy as np

    from ndvi_etl_pipeline_spark.operators.multimodal import decode_wav

    def wav(fmt_code, bits, data, n_ch=1, rate=8000, extensible=False):
        if extensible:
            fmt = struct.pack(
                "<HHIIHH", 0xFFFE, n_ch, rate, rate * bits // 8 * n_ch,
                bits // 8 * n_ch, bits,
            ) + struct.pack("<HHI", 22, bits, 0x4) + struct.pack(
                "<H", fmt_code
            ) + b"\x00" * 14
        else:
            fmt = struct.pack(
                "<HHIIHH", fmt_code, n_ch, rate, rate * bits // 8 * n_ch,
                bits // 8 * n_ch, bits,
            )
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        if len(fmt) & 1:
            body += b"\x00"
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    # float32 with clipping
    f32 = np.array([0.0, 0.5, -0.5, 2.0, -2.0], dtype="<f4")
    pcm, rate = decode_wav(wav(3, 32, f32.tobytes()))
    assert rate == 8000
    assert list(pcm) == [0, 16384, -16384, 32767, -32767]

    # float64
    f64 = np.array([1.0, -1.0], dtype="<f8")
    pcm, _ = decode_wav(wav(3, 64, f64.tobytes()))
    assert list(pcm) == [32767, -32767]

    # PCM8 unsigned recenters
    pcm, _ = decode_wav(wav(1, 8, bytes([128, 255, 0])))
    assert list(pcm) == [0, 127 << 8, -32768]

    # PCM24: top 16 bits survive (value 0x123456 -> 0x1234)
    data24 = bytes([0x56, 0x34, 0x12, 0x00, 0x00, 0x80])
    pcm, _ = decode_wav(wav(1, 24, data24))
    assert list(pcm) == [0x1234, -32768]

    # PCM32: top 16 bits
    data32 = np.array([0x12345678, -(1 << 31)], dtype="<i4").tobytes()
    pcm, _ = decode_wav(wav(1, 32, data32))
    assert list(pcm) == [0x1234, -32768]

    # EXTENSIBLE wrapping float32, stereo
    st = np.array([0.25, -0.25, 1.0, -1.0], dtype="<f4")
    pcm, _ = decode_wav(wav(3, 32, st.tobytes(), n_ch=2, extensible=True))
    assert pcm.shape == (2, 2)
    assert list(pcm[:, 0]) == [8192, 32767]
