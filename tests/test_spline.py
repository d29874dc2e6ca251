"""Spline resize (orders 0-5) + RasterGeolocation.resize pins.

scipy/skimage are absent, so the Unser prefilter implementation in
rasters_spark/spline.py is pinned by its mathematical contracts
instead of library parity: the interpolation condition (orders >= 2
reproduce the samples at integer positions), identity resize, order-1
equivalence with naive bilinear, and the reference's antimeridian
shift behavior (raster_geolocation.py:294-333).
"""

import numpy as np
import pytest

from rasters_spark import codec, spline
from rasters_spark.datapipe import multimodal
from rasters_spark.operators import swath as swathops


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_interpolation_condition(order):
    rng = np.random.default_rng(3)
    arr = rng.uniform(0, 100, (17, 23))
    coeff = spline.prefilter(arr, order)
    R, C = np.meshgrid(np.arange(17, dtype=float), np.arange(23, dtype=float), indexing="ij")
    got = spline.sample(coeff, R.ravel(), C.ravel(), order).reshape(17, 23)
    assert np.abs(got - arr).max() < 1e-6


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
def test_identity_resize(order):
    rng = np.random.default_rng(4)
    arr = rng.uniform(0, 50, (16, 16))
    out = spline.resize(arr, 16, 16, order)
    assert np.abs(out - arr).max() < 1e-6


def test_order1_matches_naive_bilinear():
    rng = np.random.default_rng(5)
    arr = rng.uniform(0, 10, (17, 23))
    out = spline.resize(arr, 5, 7, 1)
    fr = (np.arange(5) + 0.5) * 17 / 5 - 0.5
    fc = (np.arange(7) + 0.5) * 23 / 7 - 0.5
    for i, r in enumerate(fr):
        for j, c in enumerate(fc):
            r0, c0 = int(np.floor(r)), int(np.floor(c))
            dr, dc = r - r0, c - c0
            g = lambda a, b: arr[min(max(a, 0), 16), min(max(b, 0), 22)]
            exp = ((1 - dr) * ((1 - dc) * g(r0, c0) + dc * g(r0, c0 + 1))
                   + dr * ((1 - dc) * g(r0 + 1, c0) + dc * g(r0 + 1, c0 + 1)))
            assert out[i, j] == pytest.approx(exp, rel=1e-12)


def test_unsupported_orders_raise():
    arr = np.zeros((4, 4))
    with pytest.raises(ValueError):
        spline.resize(arr, 2, 2, 6)
    # name map: all six reference names resolve; unknown names get a
    # DISTINCT error, not a KeyError (constants.py:30-37)
    assert [spline.order_for_method(m) for m in
            ["nearest", "linear", "quadratic", "cubic", "quartic", "quintic"]] == [0, 1, 2, 3, 4, 5]
    with pytest.raises(ValueError, match="unsupported resampling method"):
        spline.order_for_method("lanczos")


@pytest.mark.parametrize("order", [4, 5])
def test_quartic_quintic_polynomial_reproduction(order):
    """Spline interpolation of order n reproduces polynomials of degree
    ≤ 3 exactly away from the boundary (mirror effects decay as |z|^d;
    at 56 px margin they are < 1e-11 relative)."""
    x = np.arange(128, dtype=float)
    X, Y = np.meshgrid(x, x, indexing="ij")
    f = 0.5 * X**3 - 2 * X * Y + Y**2 + 3
    g = spline.resize(f, 256, 256, order)
    xs = (np.arange(256) + 0.5) * 128 / 256 - 0.5
    XS, YS = np.meshgrid(xs, xs, indexing="ij")
    exact = 0.5 * XS**3 - 2 * XS * YS + YS**2 + 3
    sl = (slice(112, 144), slice(112, 144))
    rel = np.abs(g - exact)[sl].max() / np.abs(exact[sl]).max()
    assert rel < 1e-11


def test_resize_spline_spark_roundtrip(spark):
    # encode two synthetic NaN-free tiles, resize order 2 through Spark,
    # compare to the direct spline.resize of the same arrays
    rng = np.random.default_rng(6)
    arrs = {f"t{i}": rng.uniform(0, 100, (12, 16)).astype(np.float32) for i in range(2)}
    rows = [(k, codec.encode_tile(a, "raw"), 16, 12, "raw") for k, a in arrs.items()]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int, fmt string")
    out = {r.image_id: codec.decode_tile(r.bytes, r.w, r.h, r.fmt)
           for r in multimodal.resize_spline(df, 8, 6, order=2).collect()}
    for k, a in arrs.items():
        exp = spline.resize(a, 6, 8, 2).astype(np.float32)
        assert out[k].shape == (6, 8)
        assert np.abs(out[k] - exp).max() < 1e-4


def test_swath_resize_identity_and_antimeridian(spark):
    # swath crossing the antimeridian: x walks 179.0 -> 179.9 -> wraps to -179.x
    rows = []
    for r in range(6):
        for c in range(10):
            x = 179.0 + 0.2 * c
            if x >= 180.0:
                x -= 360.0
            rows.append((0, r, c, x, 45.0 - 0.1 * r))
    df = spark.createDataFrame(rows, "swath_id long, row long, col long, x double, y double")
    # identity-shape resize (order 2): interpolation condition → x/y reproduced
    same = {(r.row, r.col): (r.x, r.y)
            for r in swathops.swath_resize(df, 6, 10, order=2).collect()}
    for (sid, r, c, x, y) in rows:
        gx, gy = same[(r, c)]
        assert gx == pytest.approx(x, abs=1e-6) and gy == pytest.approx(y, abs=1e-6)
    # upsample: all x must stay in [-180, 180] (the post-shift fixup) and
    # the x field must stay monotonic along each row modulo the wrap
    up = swathops.swath_resize(df, 6, 20, order=2).toPandas()
    assert up.shape[0] == 120
    assert ((up.x >= -180.0) & (up.x <= 180.0)).all()
    # non-decreasing across the seam (the outermost output pixels clamp
    # to the edge under center mapping, so ties occur at the borders)
    row0 = up[up.row == 0].sort_values("col").x.to_numpy()
    unwrapped = np.where(row0 < 0, row0 + 360.0, row0)
    assert (np.diff(unwrapped) >= 0).all()
    assert unwrapped.max() - unwrapped.min() > 1.5  # seam actually spanned


def test_raster_rescale_shape_and_values(spark):
    from rasters_spark.datapipe.multimodal import raster_rescale
    rng = np.random.default_rng(8)
    a = rng.uniform(0, 100, (16, 16)).astype(np.float32)
    # 1-degree footprint at 1/16-degree cells → rescale to 1/8-degree: 8x8
    df = spark.createDataFrame(
        [("t0", codec.encode_tile(a, "raw"), 16, 16, "raw", 10.0, 50.0, 1/16, -1/16)],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "x_origin double, y_origin double, cell_width double, cell_height double")
    out = raster_rescale(df, 1 / 8, order=1).collect()[0]
    assert (out.w, out.h) == (8, 8)
    assert out.cell_width == 1 / 8 and out.cell_height == -1 / 8
    assert out.x_origin == 10.0 and out.y_origin == 50.0
    got = codec.decode_tile(out.bytes, out.w, out.h, out.fmt)
    exp = spline.resize(a, 8, 8, 1).astype(np.float32)
    assert np.abs(got - exp).max() < 1e-5
