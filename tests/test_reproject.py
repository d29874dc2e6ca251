"""UTM reprojection composite pipeline (EP: reproject → warp)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rasters_spark import fixtures
from rasters_spark.functions import crs as C
from rasters_spark.operators import resample
from rasters_spark.tiles import load_tiles

SF = "/root/testdata/sf0.001"


def test_reproject_utm_geometry_and_values(spark):
    fixtures.ensure_fixtures(SF)
    # tiles around lon -120 → UTM zone 10N (EPSG:32610); sf0.001 tiles
    # all sit at y_origin = 80 (first fixture row band)
    t = load_tiles(spark, SF).filter(
        "x_origin between -123 and -117 and y_origin between 70 and 85 and fmt = 'raw'"
    )
    n = t.count()
    if n == 0:
        pytest.skip("no tiles in the zone at this sf")
    out = resample.reproject_utm(t, 32610, cell_size_m=5000.0)
    rows = out.collect()
    assert rows
    g = rows[0].grid
    assert g.crs == "EPSG:32610" and g.cell_width == 5000.0
    # every output cell center must inverse-project back inside the
    # source tiles' geographic extent (± one cell slack)
    ext = t.agg(F.min("x_origin").alias("xmin"),
                F.max(F.col("x_origin") + F.col("cell_width") * F.col("w")).alias("xmax"),
                F.min(F.col("y_origin") + F.col("cell_height") * F.col("h")).alias("ymin"),
                F.max("y_origin").alias("ymax")).collect()[0]
    cx = np.array([g.x_origin + g.cell_width * (r.tcol + 0.5) for r in rows])
    cy = np.array([g.y_origin + g.cell_height * (r.trow + 0.5) for r in rows])
    lon, lat = C.transform_xy_np(cx, cy, "EPSG:32610", "EPSG:4326")
    # slack: grid derivation pads a half cell and cell centers sit up to
    # half a cell out; at ~80°N a 5 km cell spans ~0.27° of longitude
    lon_pad = 2 * 5000.0 / (111_320 * np.cos(np.radians(80)))
    lat_pad = 2 * 5000.0 / 111_320
    assert (lon >= ext.xmin - lon_pad).all() and (lon <= ext.xmax + lon_pad).all()
    assert (lat >= ext.ymin - lat_pad).all() and (lat <= ext.ymax + lat_pad).all()
    # values come from real pixels (exact quarter-integers)
    vals = np.array([r.value for r in rows])
    assert np.all(np.isfinite(vals)) and np.allclose(vals * 4, np.round(vals * 4))
    assert all(r.n_sources >= 1 for r in rows)
