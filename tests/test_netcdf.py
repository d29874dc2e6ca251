"""Classic NetCDF-3 ingest driver: pure codec + per-partition sink +
distributed source (functions/netcdf3.py; reference multi-driver open
raster.py:634-771, debug_reading_netcdf.py:1-11)."""

import tempfile
from pathlib import Path

import numpy as np
import pytest
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from rasters_spark.functions import netcdf3 as nc
from rasters_spark.tiles import load_tiles, open_tiles


def test_nc_header_fields_and_bad_magic():
    tiles = [dict(image_id="img000000000001", arr=np.ones((4, 5), np.float32),
                  x_origin=1.0, y_origin=2.0, cell_width=0.5, cell_height=-0.5)]
    blob = nc.encode_nc(tiles)
    assert blob[:4] == b"CDF\x02"
    hdr = nc.parse_header(blob)
    assert hdr["vars"]["data0"]["shape"] == (1, 4, 5)
    assert hdr["vars"]["data0"]["type"] == nc.NC_FLOAT
    assert hdr["vars"]["x00"]["type"] == nc.NC_DOUBLE
    with pytest.raises(ValueError, match="magic"):
        nc.parse_header(b"HDF\x05" + blob)


def test_nc_pure_roundtrip_mixed_shapes():
    rng = np.random.default_rng(11)
    tiles = []
    for i in range(7):
        h, w = [(6, 6), (8, 12), (16, 4)][i % 3]
        a = rng.integers(0, 4000, (h, w)).astype(np.float32) * np.float32(0.25)
        a[rng.random((h, w)) < 0.1] = np.nan
        tiles.append(dict(image_id=f"img{i:012d}", arr=a, x_origin=float(i),
                          y_origin=80.0 - i, cell_width=0.0625, cell_height=-0.0625))
    back = {t["image_id"]: t for t in nc.decode_nc(nc.encode_nc(tiles))}
    assert len(back) == 7
    for t in tiles:
        b = back[t["image_id"]]
        np.testing.assert_array_equal(np.isnan(t["arr"]), np.isnan(b["arr"]))
        np.testing.assert_array_equal(t["arr"][~np.isnan(t["arr"])],
                                      b["arr"][~np.isnan(b["arr"])])
        for k in ("x_origin", "y_origin", "cell_width", "cell_height"):
            assert b[k] == t[k]


def test_nc_spark_sink_source_roundtrip(spark, sf_dir):
    """save (one container per partition) → load (driver header parse +
    executor pixel fetch) reproduces the raw tile table BIT-EXACTLY:
    the big-endian↔little-endian float32 swap preserves every bit
    pattern including NaN payloads."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw' and image_id < 'img000000000040'")
    src = {r.image_id: r for r in t.collect()}
    with tempfile.TemporaryDirectory(prefix="nc-rt-") as d:
        n_parts = nc.save_netcdf_tiles(t.repartition(3), d)
        assert 1 <= n_parts <= 3
        assert len(list(Path(d).glob("*.nc"))) == n_parts
        got = {r.image_id: r for r in open_tiles(spark, d).collect()}
    assert set(got) == set(src)
    for iid, r in got.items():
        s = src[iid]
        assert bytes(r.bytes) == bytes(s.bytes)
        assert (r.w, r.h, r.fmt) == (s.w, s.h, "raw")
        assert (r.x_origin, r.y_origin, r.cell_width, r.cell_height) == \
               (s.x_origin, s.y_origin, s.cell_width, s.cell_height)
        assert r.grid.rows == s.h and r.bbox is not None


def test_open_tiles_dispatch(spark, sf_dir):
    from rasters_spark import fixtures

    fdir = fixtures.ensure_fixtures(sf_dir)
    pq = open_tiles(spark, str(fdir / "tiles.parquet"))
    assert "grid" in pq.columns and "bbox" in pq.columns
    with pytest.raises(ValueError, match="ingest driver"):
        open_tiles(spark, "/tmp/nope.xyz")


def test_nc_preserves_crs_and_guards_lengths():
    """Review fixes: per-tile CRS survives the container (no silent
    EPSG:4326 rewrite); over-long ids/crs and >2 GiB variables raise
    instead of silently truncating/corrupting."""
    t = dict(image_id="img000000000001", arr=np.ones((2, 2), np.float32),
             x_origin=0.0, y_origin=0.0, cell_width=25000.0, cell_height=-25000.0,
             crs="EPSG:3413")
    back = nc.decode_nc(nc.encode_nc([t]))[0]
    assert back["crs"] == "EPSG:3413"
    # default spelling for legacy dicts without crs
    t2 = {k: v for k, v in t.items() if k != "crs"}
    assert nc.decode_nc(nc.encode_nc([t2]))[0]["crs"] == "EPSG:4326"
    with pytest.raises(ValueError, match="ID_LEN"):
        nc.encode_nc([dict(t, image_id="x" * 17)])
    with pytest.raises(ValueError, match="CRS_LEN"):
        nc.encode_nc([dict(t, crs="+proj=" + "x" * 40)])


def test_nc_cdf5_roundtrip_small_forced():
    """CDF-5 (PnetCDF 64-bit extension of the Unidata classic spec):
    a forced-v5 container round-trips bit-identically through the same
    decode path — every NON_NEG field widened to i64."""
    t = dict(image_id="img000000000007", arr=np.arange(6, dtype=np.float32).reshape(2, 3),
             x_origin=1.0, y_origin=2.0, cell_width=0.5, cell_height=-0.5,
             crs="EPSG:3035")
    blob = nc.encode_nc([t], version=5)
    assert blob[:4] == b"CDF\x05"
    back = nc.decode_nc(blob)[0]
    assert back["image_id"] == t["image_id"] and back["crs"] == "EPSG:3035"
    np.testing.assert_array_equal(back["arr"], t["arr"])
    # and the auto-pick stays CDF-2 for small data
    assert nc.encode_nc([t])[:4] == b"CDF\x02"


@given(st.integers(24_000, 80_000), st.integers(24_000, 80_000),
       st.integers(1, 7))
@settings(max_examples=25, deadline=None)
def test_nc_cdf5_big_vsize_header_property(h, w, n):
    """VERDICT r04 #9 'done' criterion: a >2 GiB-vsize variable (a
    10⁹-pixel group) round-trips through the CDF-5 header — built and
    parsed header-only, no gigabyte allocation. vsize must exceed the
    i32 bound and survive as i64."""
    vsize = n * h * w * 4
    assume(vsize > nc.VSIZE_MAX)
    dims = [("n0", n), ("y0", h), ("x0", w)]
    vars_ = [{"name": "data0", "type": nc.NC_FLOAT, "dimids": [0, 1, 2],
              "shape": (n, h, w), "vsize": vsize, "begin": 4321}]
    hdr = nc.parse_header(nc._build_header(dims, vars_, 5, with_begins=True))
    v = hdr["vars"]["data0"]
    assert hdr["version"] == 5
    assert v["vsize"] == vsize > 2**31 - 1
    assert v["begin"] == 4321
    assert v["shape"] == (n, h, w)


def test_nc_header_truncation_detected():
    """ADVICE r04: a read window that ends inside the header raises the
    typed HeaderTruncated (so the loader can grow the window), never an
    opaque struct.error."""
    t = dict(image_id="img000000000001", arr=np.ones((4, 4), np.float32),
             x_origin=0.0, y_origin=0.0, cell_width=1.0, cell_height=-1.0)
    blob = nc.encode_nc([t])
    for cut in (9, 24, 60, 100):
        with pytest.raises(nc.HeaderTruncated):
            nc.parse_header(blob[:cut])
