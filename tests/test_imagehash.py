"""Perceptual image hashing (operators/imagehash.py): invariance
properties of aHash/dHash/pHash, exact-recall banded Hamming pairing,
and end-to-end near-dup detection through the real codecs."""

import numpy as np
import pytest

from ndvi_etl_pipeline_spark.operators import imagehash as IH


def ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def base_image(h=60, w=80, fy=6.0, fx=9.0, phase=0.0):
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    return np.clip(
        np.sin(ii / fy + phase) * 100 + np.cos(jj / fx) * 80 + 128, 0, 255
    ).astype(np.uint8)


def test_phash_invariances():
    base = base_image()
    _, d1, p1 = IH.compute_hashes(base)

    # pixel noise: small distance
    rng = np.random.default_rng(0)
    noisy = base.astype(int)
    idx = rng.integers(0, base.size, 200)
    noisy.ravel()[idx] += rng.integers(-30, 30, 200)
    _, _, p_noise = IH.compute_hashes(np.clip(noisy, 0, 255).astype(np.uint8))
    assert ham(p1, p_noise) <= 6

    # JPEG recompression at q60: tiny distance
    from ndvi_etl_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rec = decode_jpeg(encode_jpeg(base, quality=60))[:, :, 0]
    assert ham(p1, IH.compute_hashes(rec)[2]) <= 4

    # 2× down- and up-scale: area resampling makes pHash scale-stable
    for oh, ow in ((30, 40), (120, 160)):
        scaled = np.clip(
            IH._area_resample(base.astype(float), oh, ow), 0, 255
        ).astype(np.uint8)
        assert ham(p1, IH.compute_hashes(scaled)[2]) <= 2, (oh, ow)

    # global brightness shift: dHash exactly invariant (gradient signs)
    brighter = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    _, d_b, p_b = IH.compute_hashes(brighter)
    assert ham(d1, d_b) == 0
    assert ham(p1, p_b) <= 8

    # structurally different image: far in every hash
    other = base_image(fy=3.0, fx=4.0, phase=1.0)
    _, d_o, p_o = IH.compute_hashes(other)
    assert ham(p1, p_o) >= 20
    assert ham(d1, d_o) >= 20


def test_area_resample_exactness():
    # constant image → exact constant at any output size
    c = np.full((17, 23), 111.0)
    for oh, ow in ((8, 8), (32, 32), (40, 50)):
        out = IH._area_resample(c, oh, ow)
        assert np.allclose(out, 111.0)
    # 2x2 block-mean equals reshape-mean when sizes divide
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 255, (16, 16))
    out = IH._area_resample(a, 8, 8)
    want = a.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    assert np.allclose(out, want)


def test_bits_to_long_signed_wrap():
    bits = np.ones(64, dtype=bool)
    assert IH._bits_to_long(bits) == -1  # all-ones wraps to signed -1
    bits[0] = False
    assert IH._bits_to_long(bits) == (1 << 63) - 1


def _group_corpus(spark, n_groups=4, variants=4):
    """Deterministic corpus: n_groups structurally distinct bases;
    per group, `variants` mild perturbations (noise / brightness /
    JPEG recompress) that must hash near the base."""
    from ndvi_etl_pipeline_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from ndvi_etl_pipeline_spark.operators.multimodal import MEDIA_SCHEMA

    rows = []
    mid = 0
    for g in range(n_groups):
        base = base_image(fy=3.0 + 2.0 * g, fx=4.0 + 3.0 * g, phase=0.7 * g)
        for v in range(variants):
            img = base
            if v == 1:
                rng = np.random.default_rng(100 + g)
                noisy = base.astype(int)
                idx = rng.integers(0, base.size, 150)
                noisy.ravel()[idx] += rng.integers(-25, 25, 150)
                img = np.clip(noisy, 0, 255).astype(np.uint8)
            elif v == 2:
                img = decode_jpeg(encode_jpeg(base, quality=70))[:, :, 0]
            elif v == 3:
                img = np.clip(base.astype(int) + 15, 0, 255).astype(np.uint8)
            h, w = img.shape
            rows.append(
                (mid, "image", bytearray(img.tobytes()), ("raw", w, h, 1, None, None))
            )
            mid += 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_neardup_pairs_banded_equals_exact(spark):
    """The banded Hamming join must return EXACTLY the pairs a brute
    all-pairs popcount finds (recall proof for distance < bands), and
    those pairs must be exactly the within-group variants."""
    media = _group_corpus(spark)
    hashes = IH.image_hashes(media).cache()
    # measured: in-group max distance 14 (variant↔variant via the
    # base), cross-group min 24 — threshold 15 separates cleanly, and
    # bands=16 guarantees recall for any distance < 16
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in IH.phash_neardup_pairs(hashes, max_distance=15, bands=16).collect()
    }

    hs = {r.media_id: r.phash for r in hashes.collect()}
    brute = {}
    ids = sorted(hs)
    for i in ids:
        for j in ids:
            if i < j and ham(hs[i], hs[j]) <= 15:
                brute[(i, j)] = ham(hs[i], hs[j])
    assert got == brute  # banded blocking lost nothing

    # and the near pairs are precisely the within-group ones (4 groups
    # of 4 variants → 6 pairs each)
    want_pairs = {
        (a, b)
        for g in range(4)
        for a in range(g * 4, g * 4 + 4)
        for b in range(g * 4, g * 4 + 4)
        if a < b
    }
    assert set(got) == want_pairs


def test_neardup_distance_guard():
    with pytest.raises(ValueError, match="bands"):
        IH.phash_neardup_pairs(None, max_distance=16, bands=16)
