"""to_grid kernel family vs the independent npref scalar goldens.

The reference's 13 resampling methods (constants.py:13-28) split into:
- convolution kernels (linear/cubic/cubic_spline: JVM-sliced SQL blend;
  lanczos/gauss: vectorized mapInPandas) — pinned here against
  npref.conv_sample_naive, a deliberately scalar transcription;
- aggregation kernels (max/min/med/mode/q1/q3) — pinned against
  npref.segment_stat_naive plus the DuckDB oracle in the contract.
"""

import numpy as np
import pytest

from rasters_spark import codec, fixtures, npref
from rasters_spark.operators import resample
from rasters_spark.tiles import load_tiles

SF = "/root/testdata/sf0.001"
TARGET = dict(x_origin=-180.0, y_origin=90.0, cell_width=0.25, cell_height=-0.25,
              rows=720, cols=1440, crs="EPSG:4326")


@pytest.fixture(scope="module", autouse=True)
def _fixtures():
    fixtures.ensure_fixtures(SF)


def _naive_conv(tiles_pd, kind: str, normalize: bool):
    """Scalar recomputation of every candidate value (NaN → None)."""
    exp = {}
    for r in tiles_pd.itertuples(index=False):
        arr = codec.decode_tile(r.bytes, r.w, r.h, r.fmt)
        rs, cs, re_, ce, oob = npref.window_for_bbox(
            r.x_origin, r.y_origin + r.cell_height * r.h,
            r.x_origin + r.cell_width * r.w, r.y_origin,
            TARGET["x_origin"], TARGET["y_origin"],
            TARGET["cell_width"], TARGET["cell_height"], TARGET["rows"], TARGET["cols"])
        if oob or re_ <= rs or ce <= cs:
            continue
        for trow in range(rs, re_):
            for tcol in range(cs, ce):
                tx, ty = npref.cell_center(trow, tcol, TARGET["x_origin"], TARGET["y_origin"],
                                           TARGET["cell_width"], TARGET["cell_height"])
                fr = (ty - r.y_origin) / r.cell_height - 0.5
                fc = (tx - r.x_origin) / r.cell_width - 0.5
                prow, pcol = int(np.round(fr)), int(np.round(fc))
                if not (0 <= prow < r.h and 0 <= pcol < r.w):
                    continue
                v = npref.conv_sample_naive(arr, fr, fc, kind, normalize=normalize)
                exp[(r.image_id, trow, tcol)] = None if np.isnan(v) else v
    return exp


@pytest.mark.parametrize("kind", ["linear", "cubic", "cubic_spline"])
def test_to_grid_conv_sql_matches_naive(spark, kind):
    tiles = load_tiles(spark, SF).filter("fmt = 'raw' and image_id < 'img000000000020'")
    got = {(r.image_id, r.trow, r.tcol): r.value
           for r in resample.to_grid_conv(tiles, TARGET, kind).collect()}
    exp = _naive_conv(tiles.toPandas(), kind, normalize=False)
    assert got.keys() == exp.keys()
    n_null = 0
    for k, e in exp.items():
        if e is None:
            assert got[k] is None
            n_null += 1
        else:
            assert got[k] == pytest.approx(e, rel=1e-9, abs=1e-9)
    assert n_null > 0  # NaN-neighbour propagation exercised


@pytest.mark.parametrize("kind", ["lanczos", "gauss"])
def test_to_grid_conv_py_matches_naive(spark, kind):
    tiles = load_tiles(spark, SF).filter("fmt = 'raw' and image_id < 'img000000000020'")
    got = {(r.image_id, r.trow, r.tcol): r.value
           for r in resample.to_grid_conv_py(tiles, TARGET, kind).collect()}
    exp = _naive_conv(tiles.toPandas(), kind, normalize=True)
    assert got.keys() == exp.keys()
    for k, e in exp.items():
        if e is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(e, rel=1e-9, abs=1e-9)


def test_q8_slice_path_in_conv(spark):
    # the slice decode must also handle q8 tiles (header + 1 byte per tap)
    tiles = load_tiles(spark, SF).filter("fmt = 'q8' and image_id < 'img000000000100'")
    assert tiles.count() > 0
    got = {(r.image_id, r.trow, r.tcol): r.value
           for r in resample.to_grid_conv(tiles, TARGET, "linear").collect()}
    exp = _naive_conv(tiles.toPandas(), "linear", normalize=False)
    assert got.keys() == exp.keys()
    for k, e in exp.items():
        if e is None:
            assert got[k] is None
        else:
            # q8 decode is float32 arithmetic — compare loosely
            assert got[k] == pytest.approx(e, rel=1e-5, abs=1e-4)


@pytest.mark.parametrize("stat", ["max", "min", "med", "q1", "q3", "mode", "sum"])
def test_segment_stat_matches_naive(stat):
    rng = np.random.default_rng(7)
    key = rng.integers(0, 40, size=500)
    val = rng.integers(0, 12, size=500).astype(np.float64) * 0.25  # many ties → mode exercised
    gk, gv, gn = resample._segment_stat(key, val, stat)
    ek, ev, en = npref.segment_stat_naive(key, val, stat)
    assert np.array_equal(gk, ek) and np.array_equal(gn, en)
    assert np.allclose(gv, ev)


@pytest.mark.parametrize("stat", ["med", "mode", "sum"])
def test_to_grid_stat_matches_naive(spark, stat):
    tiles = load_tiles(spark, SF).filter("fmt = 'raw' and image_id < 'img000000000010'")
    got = {(r.image_id, r.trow, r.tcol): (r.value, r.n)
           for r in resample.to_grid_stat(tiles, TARGET, stat).collect()}
    exp: dict = {}
    for r in tiles.toPandas().itertuples(index=False):
        arr = codec.decode_tile(r.bytes, r.w, r.h, r.fmt)
        hh, ww = arr.shape
        px = r.x_origin + r.cell_width * (np.arange(ww) + 0.5)
        py = r.y_origin + r.cell_height * (np.arange(hh) + 0.5)
        PX, PY = np.meshgrid(px, py)
        trow, tcol = npref.index_point(PX.ravel(), PY.ravel(), TARGET["x_origin"], TARGET["y_origin"],
                                       TARGET["cell_width"], TARGET["cell_height"])
        v = arr.ravel().astype(np.float64)
        ok = np.isfinite(v)
        key = trow[ok] * TARGET["cols"] + tcol[ok]
        ks, vs, ns = npref.segment_stat_naive(key, v[ok], stat)
        for k, vv, nn in zip(ks, vs, ns):
            exp[(r.image_id, k // TARGET["cols"], k % TARGET["cols"])] = (float(vv), int(nn))
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k][1] == exp[k][1]
        assert got[k][0] == pytest.approx(exp[k][0], rel=1e-12)


def test_to_grid_dispatch_all_13_methods(spark):
    tiles = load_tiles(spark, SF).filter("fmt = 'raw' and image_id < 'img000000000005'")
    for method in ("nearest", "linear", "cubic", "cubic_spline", "lanczos",
                   "average", "mode", "gauss", "max", "min", "med", "q1", "q3"):
        assert resample.to_grid(tiles, TARGET, method).count() > 0
    with pytest.raises(ValueError):
        resample.to_grid(tiles, TARGET, "bogus")


def test_to_geometry_dispatch(spark):
    from pyspark.sql import functions as F
    tiles = load_tiles(spark, SF).filter("fmt = 'raw' and image_id < 'img000000000005'")
    # grid dict → to_grid
    assert resample.to_geometry(tiles, TARGET, "nearest").count() > 0
    # swath long table → grid_to_geolocation_nn (place it inside tile 0's
    # footprint: hot origin 10.25, 45.75)
    r = spark.range(5).select(F.col("id").alias("row"))
    c = spark.range(5).select(F.col("id").alias("col"))
    sw = r.crossJoin(c).select(
        F.lit(0).cast("long").alias("swath_id"), "row", "col",
        (10.3 + F.col("col") * 0.1).alias("x"), (45.7 - F.col("row") * 0.1).alias("y"))
    out = resample.to_geometry(tiles, sw)
    assert {"swath_id", "row", "col", "value"} <= set(out.columns)
    assert out.count() > 0
    # point table → nearest sampling
    pts = spark.createDataFrame([(1, 10.5, 45.5)], "point_id long, x double, y double")
    ps = resample.to_geometry(tiles, pts)
    assert ps.count() > 0 and "value" in ps.columns
    import pytest as _pt
    with _pt.raises(ValueError):
        resample.to_geometry(tiles, 42)
