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
