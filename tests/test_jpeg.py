"""Baseline JPEG codec (functions/jpeg.py, ITU T.81) — round-trip,
PSNR ≥ 40 dB lossy gate (BASELINE per-row invariant), multimodal wiring,
and the to_geojpeg distributed sink."""

import glob
import struct

import numpy as np
import pytest

from rasters_spark import codec
from rasters_spark.functions import jpeg as J


def _smooth(h, w):
    """Smooth synthetic raster — the render-output content class the
    PSNR gate is about (colormapped stretches are band-limited)."""
    y, x = np.mgrid[0:h, 0:w]
    return (96 + 80 * np.sin(x / 17.0) * np.cos(y / 23.0)
            + 40 * np.cos((x + y) / 31.0))


def test_jpeg_gray_roundtrip_psnr40():
    g = np.clip(np.rint(_smooth(96, 80)), 0, 255).astype(np.uint8)
    blob = J.encode_jpeg(g, quality=95)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    back = J.decode_jpeg(blob)
    assert back.shape == g.shape and back.dtype == np.uint8
    assert J.psnr(g, back) >= 40.0


def test_jpeg_rgb_roundtrip_psnr40():
    base = _smooth(64, 72)
    rgb = np.clip(np.rint(np.stack(
        [base, base[::-1], 255 - base], axis=-1)), 0, 255).astype(np.uint8)
    blob = J.encode_jpeg(rgb, quality=95)
    back = J.decode_jpeg(blob)
    assert back.shape == rgb.shape
    assert J.psnr(rgb, back) >= 40.0


def test_jpeg_odd_dimensions_and_markers():
    g = np.clip(np.rint(_smooth(77, 61)), 0, 255).astype(np.uint8)
    blob = J.encode_jpeg(g, quality=90)
    # third-party-checkable structure: JFIF APP0 right after SOI, SOF0
    # advertises the exact dims
    assert blob[2:4] == b"\xff\xe0" and blob[6:10] == b"JFIF"
    sof = blob.index(b"\xff\xc0")
    _len, _prec, hh, ww, _n = struct.unpack_from(">HBHHB", blob, sof + 2)
    assert (hh, ww) == (77, 61)
    back = J.decode_jpeg(blob)
    assert back.shape == (77, 61)
    assert J.psnr(g, back) >= 38.0  # q90 on odd-padded content


def test_jpeg_decoder_rejects_non_baseline():
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x00\x01")
    g = np.zeros((8, 8), np.uint8)
    blob = bytearray(J.encode_jpeg(g))
    blob[blob.index(b"\xff\xc0") + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(bytes(blob))


def test_multimodal_jpeg_is_real_now(spark):
    from rasters_spark.datapipe import multimodal

    g = np.clip(np.rint(_smooth(32, 32)), 0, 255).astype(np.uint8)
    blob = J.encode_jpeg(g, quality=95)
    df = spark.createDataFrame(
        [("j1", blob, 32, 32, "jpeg")],
        "image_id string, bytes binary, w int, h int, fmt string")
    feats = multimodal.extract_features(df).collect()[0]
    assert feats.width == 32 and feats.height == 32
    assert feats.mean == pytest.approx(float(g.mean()), abs=1.5)  # lossy
    assert feats.phash is not None


def test_save_geojpegs_sink(spark, tmp_path):
    from rasters_spark.functions import render
    from rasters_spark.tiles import load_tiles

    t = load_tiles(spark, "/root/testdata/sf0.001").filter(
        "fmt = 'raw' and image_id < 'img000000000004'")
    n = t.count()
    assert n > 0
    out = str(tmp_path / "jpg_out")
    render.save_geojpegs(t, out, mode="gray")
    jpgs = sorted(glob.glob(out + "/*.jpg"))
    jgws = sorted(glob.glob(out + "/*.jgw"))
    assert len(jpgs) == n and len(jgws) == n
    # decode one back; its shape matches the tile, its world file parses
    with open(jpgs[0], "rb") as fh:
        img = J.decode_jpeg(fh.read())
    row = t.orderBy("image_id").first()
    assert img.shape == (row.h, row.w)
    with open(jgws[0]) as fh:
        vals = [float(line) for line in fh.read().strip().splitlines()]
    assert len(vals) == 6
    assert vals[0] == pytest.approx(row.cell_width)
    assert vals[3] == pytest.approx(row.cell_height)
    assert vals[4] == pytest.approx(row.x_origin + row.cell_width / 2)


def test_render_jpeg_dataframe_stage(spark):
    from rasters_spark.functions import render
    from rasters_spark.tiles import load_tiles

    t = load_tiles(spark, "/root/testdata/sf0.001").filter(
        "fmt = 'raw' and image_id < 'img000000000003'")
    out = render.render_jpeg(t, mode="rgb", quality=95).collect()
    assert len(out) == 3
    for r in out:
        img = J.decode_jpeg(bytes(r.jpeg))
        assert img.shape == (r.h, r.w, 3)
