"""Codec round-trips, PSNR gate, phash stability."""

import numpy as np

from rasters_spark import codec


def _tile(h=32, w=16, seed=3):
    rng = np.random.default_rng(seed)
    a = (rng.integers(0, 4000, size=(h, w)).astype(np.float32)) * np.float32(0.25)
    a[rng.random((h, w)) < 0.05] = np.nan
    return a


def test_raw_roundtrip_lossless():
    a = _tile()
    b = codec.decode_tile(codec.encode_tile(a, "raw"), 16, 32, "raw")
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    np.testing.assert_array_equal(a[~np.isnan(a)], b[~np.isnan(b)])


def test_q8_roundtrip_psnr_gate():
    a = _tile(48, 64, seed=5)
    b = codec.decode_tile(codec.encode_tile(a, "q8"), 64, 48, "q8")
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
    assert codec.psnr(a, b) >= 40.0  # BASELINE.json lossy invariant
    assert np.allclose(a[~np.isnan(a)], b[~np.isnan(b)], atol=(np.nanmax(a) - np.nanmin(a)) / 254 + 1e-6)


def test_q8_constant_and_all_nan():
    const = np.full((4, 4), 7.0, dtype=np.float32)
    assert codec.psnr(const, codec.decode_tile(codec.encode_tile(const, "q8"), 4, 4, "q8")) == float("inf")
    allnan = np.full((4, 4), np.nan, dtype=np.float32)
    out = codec.decode_tile(codec.encode_tile(allnan, "q8"), 4, 4, "q8")
    assert np.isnan(out).all()


def test_phash_stable_and_sensitive():
    a = _tile(32, 32, seed=9)
    h1 = codec.phash64(a)
    assert h1 == codec.phash64(a.copy())
    b = a.copy()
    b[:16] = np.nanmax(a) * 2
    assert codec.phash64(b) != h1
    assert -(1 << 63) <= h1 < (1 << 63)
