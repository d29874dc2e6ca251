"""The BASELINE.json per-row invariants, verified end-to-end:

- decoded pixels allclose to the source values, PSNR ≥ 40 dB for lossy
  ``fmt`` (input_hint);
- caption equality preserved through every join/stage;
- tile-to-cell assignments reproducible from the closed-form rules.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasters_spark import codec, fixtures, npref
from rasters_spark.operators import point_join, sample
from rasters_spark.tiles import load_points, load_tiles, tiles_with_cells

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _fx():
    fixtures.ensure_fixtures(SF)


def test_q8_psnr_per_row_gate(spark):
    """Every lossy tile in the fixture corpus must decode within the
    PSNR ≥ 40 dB gate against its pre-encoding values."""
    rows = load_tiles(spark, SF).filter("fmt = 'q8'").collect()
    assert rows, "fixture must contain lossy tiles"
    for r in rows:
        i = int(r.image_id[3:])
        _, _, _, original = fixtures._tile_payload(i, 42, 17)  # decoded == roundtrip
        # regenerate the PRE-encoding values independently
        rng = np.random.default_rng(42 * 1_000_003 + i)
        pre = (rng.integers(0, 4000, size=(r.h, r.w)).astype(np.float32)) * np.float32(0.25)
        pre[rng.random((r.h, r.w)) < 0.02] = np.nan
        decoded = codec.decode_tile(r.bytes, r.w, r.h, r.fmt)
        np.testing.assert_array_equal(np.isnan(pre), np.isnan(decoded))
        p = codec.psnr(pre, decoded)
        assert p >= 40.0, (r.image_id, p)
        span = np.nanmax(pre) - np.nanmin(pre)
        assert np.allclose(pre[np.isfinite(pre)], decoded[np.isfinite(decoded)],
                           atol=span / 254 + 1e-6)


def test_raw_tiles_decode_exact(spark):
    for r in load_tiles(spark, SF).filter("fmt = 'raw'").limit(25).collect():
        i = int(r.image_id[3:])
        rng = np.random.default_rng(42 * 1_000_003 + i)
        pre = (rng.integers(0, 4000, size=(r.h, r.w)).astype(np.float32)) * np.float32(0.25)
        pre[rng.random((r.h, r.w)) < 0.02] = np.nan
        decoded = codec.decode_tile(r.bytes, r.w, r.h, r.fmt)
        np.testing.assert_array_equal(np.isnan(pre), np.isnan(decoded))
        np.testing.assert_array_equal(pre[np.isfinite(pre)], decoded[np.isfinite(decoded)])


def test_caption_preserved_through_flagship(spark):
    t = tiles_with_cells(load_tiles(spark, SF))
    p = load_points(spark, SF)
    out = sample.sample_nearest(point_join.point_in_tile_join(p, t)).select("image_id", "caption")
    src = {r.image_id: r.caption for r in load_tiles(spark, SF).collect()}
    for r in out.collect():
        assert r.caption == src[r.image_id]  # byte-identical round trip
    # caption content itself encodes the tile's cell (fixture contract)
    one = load_tiles(spark, SF).first()
    cx, cy = one.x_origin + 0.5, one.y_origin - 0.5
    assert f"at cell {int(npref.np_cell_id(cx, cy, fixtures.CELL_LEVEL))}" in one.caption