"""GeoTIFF writer/reader pins (pure-python TIFF 6.0 + GeoTIFF 1.1 subset)."""

import glob

import numpy as np
import pytest

from rasters_spark import codec
from rasters_spark.functions import geotiff
from rasters_spark.tiles import load_tiles

SF = "/root/testdata/sf0.001"


def test_roundtrip_bit_exact():
    rng = np.random.default_rng(2)
    a = (rng.integers(0, 4000, (13, 21)).astype(np.float32)) * np.float32(0.25)
    a[0, 0] = np.nan
    t = geotiff.encode_geotiff(a, -47.125, 12.5, 0.125, -0.0625)
    assert len(t) == geotiff.HEADER_BYTES + 4 * 13 * 21
    b, meta = geotiff.decode_geotiff(t)
    assert b.dtype == np.float32 and b.shape == (13, 21)
    assert np.array_equal(np.nan_to_num(a), np.nan_to_num(b)) and np.isnan(b[0, 0])
    assert meta == {"x_origin": -47.125, "y_origin": 12.5,
                    "cell_width": 0.125, "cell_height": -0.0625, "epsg": 4326}


def test_projected_epsg_key():
    a = np.zeros((2, 2), np.float32)
    _, meta = geotiff.decode_geotiff(geotiff.encode_geotiff(a, 0, 0, 30, -30, epsg=32633))
    assert meta["epsg"] == 32633


def test_save_geotiffs_sink(spark, tmp_path):
    t = load_tiles(spark, SF).filter("image_id < 'img000000000010'")
    out = str(tmp_path / "tifs")
    geotiff.save_geotiffs(t, out)
    files = sorted(glob.glob(out + "/*.tif"))
    assert len(files) == 10
    # q8 tiles also pass through (decoded to float32 before encoding)
    src = {r.image_id: r for r in t.collect()}
    with open(files[3], "rb") as fh:
        arr, meta = geotiff.decode_geotiff(fh.read())
    iid = files[3].split("/")[-1][:-4]
    r = src[iid]
    exp = codec.decode_tile(r.bytes, r.w, r.h, r.fmt)
    assert np.array_equal(np.nan_to_num(arr), np.nan_to_num(exp))
    assert meta["x_origin"] == r.x_origin and meta["cell_width"] == r.cell_width


def test_reader_rejects_garbage():
    with pytest.raises(ValueError):
        geotiff.decode_geotiff(b"MM\x00*not-a-little-endian-tiff")


def test_cog_levels_and_overviews():
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 100, (700, 600)).astype(np.float32)
    a[10, 10] = np.nan
    blob = geotiff.encode_cog(a, -50.0, 30.0, 0.001, -0.001)
    levels = geotiff.decode_cog(blob)
    shapes = [arr.shape for arr, _ in levels]
    assert shapes == [(700, 600), (350, 300), (175, 150)]
    assert [m["is_overview"] for _, m in levels] == [False, True, True]
    full, meta = levels[0]
    assert np.array_equal(np.nan_to_num(full), np.nan_to_num(a)) and np.isnan(full[10, 10])
    assert meta["x_origin"] == -50.0 and meta["epsg"] == 4326
    # overview 1 = nan-aware 2x2 block mean (GDAL 'average')
    exp = geotiff._block_mean_2x(a)
    assert np.allclose(np.nan_to_num(levels[1][0]), np.nan_to_num(exp))
    # COG layout rule: every IFD offset precedes all tile data
    import struct
    (ifd0,) = struct.unpack_from("<I", blob, 4)
    assert ifd0 == 8


def test_cog_single_tile_deterministic_size():
    a = np.zeros((16, 32), np.float32)
    blob = geotiff.encode_cog(a, 0, 0, 1, -1)
    assert len(blob) == 286 + 4 * 256 * 256
    levels = geotiff.decode_cog(blob)
    assert len(levels) == 1 and np.array_equal(levels[0][0], a)
