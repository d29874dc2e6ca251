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


def test_i32_roundtrip_and_sentinel_nodata():
    """Integer tile family: lossless int32 round trip; the INT32_MIN
    sentinel decodes to NaN (float view) but stays intact in the typed
    view — ints never carry NaN (raster.py:1217-1218)."""
    iv = np.arange(12, dtype=np.int32).reshape(3, 4) - 5
    iv[1, 2] = codec.I32_NODATA
    blob = codec.encode_tile(iv, "i32")
    assert len(blob) == 48
    typed = codec.decode_tile_typed(blob, 4, 3, "i32")
    assert typed.dtype == np.int32
    np.testing.assert_array_equal(typed, iv)
    flt = codec.decode_tile(blob, 4, 3, "i32")
    assert np.isnan(flt[1, 2])
    np.testing.assert_array_equal(flt[~np.isnan(flt)], iv[iv != codec.I32_NODATA])
    assert np.isnan(codec.pixel_at(blob, 4, 3, "i32", 1, 2))
    assert codec.pixel_at(blob, 4, 3, "i32", 0, 3) == -2.0


def test_i32_rejects_nan():
    a = np.array([[1.0, np.nan]], dtype=np.float32)
    with np.testing.assert_raises(ValueError):
        codec.encode_tile(a, "i32")
    # filled input is fine, and float integral values cast exactly
    filled = np.where(np.isnan(a), float(codec.I32_NODATA), a)
    out = codec.decode_tile_typed(codec.encode_tile(filled, "i32"), 2, 1, "i32")
    np.testing.assert_array_equal(out, [[1, codec.I32_NODATA]])


def test_b1_roundtrip_uint16_shim():
    """Bool tiles decode to uint16 0/1 (the reference's bool resampling
    shim, kdtree.py:293-310); no nodata in the bool family."""
    m = np.array([[True, False], [False, True]])
    blob = codec.encode_tile(m, "b1")
    assert len(blob) == 4
    typed = codec.decode_tile_typed(blob, 2, 2, "b1")
    assert typed.dtype == np.uint16
    np.testing.assert_array_equal(typed, m.astype(np.uint16))
    flt = codec.decode_tile(blob, 2, 2, "b1")
    assert not np.isnan(flt).any()
    np.testing.assert_array_equal(flt, m.astype(np.float64))
    assert codec.pixel_at(blob, 2, 2, "b1", 0, 0) == 1.0
    assert codec.pixel_at(blob, 2, 2, "b1", 0, 1) == 0.0


def test_narrow_dtype_write_rules():
    """raster.py:1559-1567: float64→float32, int64→int32, bool→uint16."""
    assert codec.narrow_dtype(np.zeros(2, np.float64)).dtype == np.float32
    assert codec.narrow_dtype(np.zeros(2, np.int64)).dtype == np.int32
    assert codec.narrow_dtype(np.zeros(2, np.bool_)).dtype == np.uint16
    assert codec.narrow_dtype(np.zeros(2, np.float32)).dtype == np.float32
    assert codec.narrow_dtype(np.zeros(2, np.int32)).dtype == np.int32
