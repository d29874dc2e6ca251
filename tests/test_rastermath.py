"""Fused element-wise kernels + trim vs direct numpy on decoded fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasters_spark import codec, fixtures
from rasters_spark.operators import rastermath as rm
from rasters_spark.tiles import load_tiles

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _fixtures():
    fixtures.ensure_fixtures(SF)


def _decode_all(df):
    out = {}
    for r in df.collect():
        out[r.image_id] = codec.decode_tile(r.bytes, r.w, r.h, r.fmt)
    return out


def test_fused_chain_matches_numpy(spark):
    tiles = load_tiles(spark, SF).limit(20)
    kernel = rm.compose(rm.mul(2.0), rm.add(10.0), rm.clip(0.0, 1500.0), rm.mask(rm.lt(1400.0)))
    got = _decode_all(rm.elementwise(tiles, kernel))
    src = _decode_all(tiles)
    assert got.keys() == src.keys()
    for iid, a in src.items():
        with np.errstate(invalid="ignore"):
            exp = np.clip(a * 2.0 + 10.0, 0.0, 1500.0)
            exp = np.where(exp < 1400.0, exp, np.nan).astype(np.float32)
        np.testing.assert_array_equal(got[iid], exp)


def test_where_fill_validmask(spark):
    tiles = load_tiles(spark, SF).limit(10)
    src = _decode_all(tiles)
    got = _decode_all(rm.elementwise(tiles, rm.fill(-1.0)))
    for iid, a in src.items():
        np.testing.assert_array_equal(got[iid], np.where(np.isnan(a), -1.0, a).astype(np.float32))
    gotm = _decode_all(rm.elementwise(tiles, rm.valid_mask()))
    for iid, a in src.items():
        np.testing.assert_array_equal(gotm[iid], np.isfinite(a).astype(np.float32))
    gotw = _decode_all(rm.elementwise(tiles, rm.where(rm.gt(500.0), 1.0, 0.0)))
    for iid, a in src.items():
        with np.errstate(invalid="ignore"):
            np.testing.assert_array_equal(gotw[iid], np.where(a > 500.0, 1.0, 0.0).astype(np.float32))


def test_stretch(spark):
    tiles = load_tiles(spark, SF).limit(5)
    src = _decode_all(tiles)
    got = _decode_all(rm.elementwise(tiles, rm.minmaxstretch()))
    for iid, a in src.items():
        lo, hi = np.nanmin(a), np.nanmax(a)
        np.testing.assert_allclose(got[iid], ((a - lo) / (hi - lo)).astype(np.float32), rtol=1e-6)


def test_tile_binary(spark):
    tiles = load_tiles(spark, SF).limit(10)
    doubled = rm.elementwise(tiles, rm.mul(2.0))
    diff = rm.tile_binary(doubled, tiles, lambda a, b: a - b)
    got = _decode_all(diff)
    src = _decode_all(tiles)
    for iid, a in src.items():
        np.testing.assert_allclose(got[iid], a, rtol=1e-6)


def test_trim_matches_numpy(spark):
    tiles = load_tiles(spark, SF).limit(30)
    src = {r.image_id: (codec.decode_tile(r.bytes, r.w, r.h, r.fmt), r) for r in tiles.collect()}
    got = {r.image_id: r for r in rm.trim(tiles).collect()}
    for iid, (a, meta) in src.items():
        valid = np.isfinite(a)
        if not valid.any():
            assert iid not in got
            continue
        rr = np.flatnonzero(valid.any(axis=1))
        cc = np.flatnonzero(valid.any(axis=0))
        g = got[iid]
        assert (g.h, g.w) == (rr[-1] - rr[0] + 1, cc[-1] - cc[0] + 1)
        assert g.x_origin == pytest.approx(meta.x_origin + cc[0] * meta.cell_width)
        assert g.y_origin == pytest.approx(meta.y_origin + rr[0] * meta.cell_height)
        sub = codec.decode_tile(g.bytes, g.w, g.h, g.fmt)
        np.testing.assert_array_equal(sub, a[rr[0]:rr[-1] + 1, cc[0]:cc[-1] + 1])


def test_qa_flags_stats_brute(spark):
    """QA decode vs hand-computed bits on a constructed tile with NaN,
    a cloudy pixel (bit 3), a shadow pixel (bit 4), and clear pixels."""
    from rasters_spark.operators import stats as st
    # values chosen so qa = value*4 hits known bit patterns:
    # 2.0 -> qa 8 (cloud), 4.0 -> qa 16 (shadow), 8.0 -> qa 32 (snow),
    # 10.0 -> qa 40 = 32+8 (cloud+snow), 0.25 -> qa 1 (clear)
    arr = np.array([[2.0, 4.0], [8.0, 10.0], [0.25, np.nan]], dtype=np.float32)
    df = spark.createDataFrame(
        [("t", codec.encode_tile(arr, "raw"), 2, 3, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string")
    r = st.qa_flags_stats(df).collect()[0]
    assert r.n_valid == 5
    assert r.n_cloud == 2 and r.n_shadow == 1 and r.n_snow == 2
    assert r.n_clear == 3
    assert r.clear_vsum == 4.0 + 8.0 + 0.25


def test_augment_tiles_permutations(spark):
    from rasters_spark.operators import rastermath as rm2
    arr = np.arange(12, dtype=np.float32).reshape(3, 4) * 0.25
    arr[1, 2] = np.nan
    df = spark.createDataFrame(
        [("t", codec.encode_tile(arr, "raw"), 4, 3, "raw",
          0.0, 0.0, 0.25, -0.25, "EPSG:4326")],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "x_origin double, y_origin double, cell_width double, "
        "cell_height double, crs string")
    out = {r.image_id: codec.decode_tile(r.bytes, r.w, r.h, r.fmt)
           for r in rm2.augment_tiles(df).collect()}
    np.testing.assert_array_equal(out["t:hflip"], arr[:, ::-1])
    np.testing.assert_array_equal(out["t:vflip"], arr[::-1, :])
    np.testing.assert_array_equal(out["t:rot180"], arr[::-1, ::-1])
    # pixels_of round-trips positions (NaN -> NaN/None at boundary)
    px = {(r.prow, r.pcol): r.value
          for r in rm2.pixels_of(df).collect()}
    assert px[(0, 1)] == 0.25
    v = px[(1, 2)]
    assert v is None or np.isnan(v)


def test_reclassify_bands_and_validation(spark):
    from rasters_spark.operators import rastermath as rm3
    k = rm3.reclassify([256.0, 512.0], [1.0, 2.0, 3.0])
    a = np.array([0.0, 255.75, 256.0, 511.75, 512.0, 1000.0, np.nan])
    out = k(a)
    np.testing.assert_array_equal(out[:6], [1, 1, 2, 2, 3, 3])
    assert np.isnan(out[6])
    with pytest.raises(ValueError):
        rm3.reclassify([1.0, 1.0], [1, 2, 3])
    with pytest.raises(ValueError):
        rm3.reclassify([1.0], [1])


def test_equalize_lut_ranks(spark):
    from rasters_spark.operators import stats as st
    arr = np.array([[1.0, 2.0], [2.0, np.nan], [0.5, 2.0]], dtype=np.float32)
    df = spark.createDataFrame(
        [("t", codec.encode_tile(arr, "raw"), 2, 3, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string")
    got = {r.value: (r.n_at, r.cum, r.cdf) for r in st.equalize_lut(df).collect()}
    assert got == {0.5: (1, 1, 1 / 5), 1.0: (1, 2, 2 / 5), 2.0: (3, 5, 1.0)}


def test_integral_image_brute(spark):
    from rasters_spark.operators import stats as st
    arr = np.array([[1.0, 2.0], [np.nan, 4.0]], dtype=np.float32)
    df = spark.createDataFrame(
        [("t", codec.encode_tile(arr, "raw"), 2, 2, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string")
    got = {(r.prow, r.pcol): (r.sat, r.nsat) for r in st.integral_image(df).collect()}
    assert got == {(0, 0): (1.0, 1), (0, 1): (3.0, 2),
                   (1, 0): (1.0, 1), (1, 1): (7.0, 3)}
