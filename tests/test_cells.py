"""Cell index: Spark SQL vs numpy mirror, ring/parent/bbox coverage."""

import numpy as np
from pyspark.sql import functions as F

from rasters_spark import cells, npref

LEVEL = 7


def test_cell_id_matches_numpy(spark):
    rng = np.random.default_rng(11)
    lons = np.concatenate([rng.uniform(-180, 180, 300), [-180.0, 180.0, 0.0, -1e-12]])
    lats = np.concatenate([rng.uniform(-90, 90, 300), [90.0, -90.0, 0.0, 1e-12]])
    df = spark.createDataFrame([(float(a), float(b)) for a, b in zip(lons, lats)], "lon double, lat double")
    got = df.select(cells.cell_id("lon", "lat", LEVEL).alias("c")).toPandas()["c"].to_numpy()
    np.testing.assert_array_equal(got, npref.np_cell_id(lons, lats, LEVEL))


def test_cell_id_sql_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(12)
    lons, lats = rng.uniform(-180, 180, 200), rng.uniform(-90, 90, 200)
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"lon": lons, "lat": lats}))
    sql = cells.cell_id_sql("lon", "lat", LEVEL)
    got = con.sql(f"select {sql} as c from t").fetchnumpy()["c"]
    np.testing.assert_array_equal(got, npref.np_cell_id(lons, lats, LEVEL))


def test_cells_for_bbox(spark):
    from rasters_spark.grid import bbox_struct

    df = spark.range(1)
    bb = bbox_struct(F.lit(10.0), F.lit(40.0), F.lit(12.5), F.lit(42.5))
    got = sorted(df.select(cells.cells_for_bbox(bb, LEVEL).alias("a")).collect()[0].a)
    assert got == sorted(npref.np_cells_for_bbox(10.0, 40.0, 12.5, 42.5, LEVEL))


def test_ring_and_parent(spark):
    df = spark.range(1).select(cells.cell_id(F.lit(10.5), F.lit(45.5), LEVEL).alias("cid"))
    row = df.select(
        "cid",
        cells.ring_cells("cid", LEVEL, 1).alias("ring"),
        cells.parent("cid", LEVEL, LEVEL - 2).alias("par"),
    ).collect()[0]
    assert len(row.ring) == 9 and row.cid in row.ring
    # the parent must contain the child's centroid cell at the coarser level
    assert row.par == int(npref.np_cell_id(10.5, 45.5, LEVEL - 2))
    # rings at the pole clamp + dedup
    pole = spark.range(1).select(cells.cell_id(F.lit(0.0), F.lit(89.9), LEVEL).alias("cid"))
    pr = pole.select(cells.ring_cells("cid", LEVEL, 1).alias("r")).collect()[0].r
    assert len(pr) == 6  # 3x3 minus 3 clamped duplicates


def test_z_cell_id_interleave_and_locality(spark):
    """Morton id: bit-exact vs an independent per-bit python interleave,
    and the locality property that justifies it — any aligned 2^k×2^k
    cell block occupies ONE contiguous id range (that's what parquet
    min-max pruning consumes)."""
    def spread(v):
        out = 0
        for i in range(28):
            out |= ((v >> i) & 1) << (2 * i)
        return out

    import math

    def ref(lon, lat, L):
        size = 180.0 / (1 << L)
        ix = max(0, min(2 * (1 << L) - 1, int(math.floor((lon + 180.0) / size))))
        iy = max(0, min((1 << L) - 1, int(math.floor((90.0 - lat) / size))))
        return (L << 57) | (spread(iy) << 1) | spread(ix)

    pts = [(10.3, 45.2), (-120.0, -33.0), (179.9, 89.9), (-180.0, -90.0), (0.015, 0.02)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = [r.z for r in df.select(cells.z_cell_id("lon", "lat", 8).alias("z")).collect()]
    assert got == [ref(a, b, 8) for a, b in pts]

    # locality: the 4 cells of any aligned 2x2 block are consecutive ids
    L = 8
    size = 180.0 / (1 << L)
    base_lon, base_lat = -180.0 + 40 * size, 90.0 - 40 * size  # aligned: ix=40, iy=40 (both even)
    block = [(base_lon + dx * size + size / 2, base_lat - dy * size - size / 2)
             for dy in (0, 1) for dx in (0, 1)]
    bdf = spark.createDataFrame(block, "lon double, lat double")
    ids = sorted(r.z for r in bdf.select(cells.z_cell_id("lon", "lat", L).alias("z")).collect())
    assert ids == list(range(ids[0], ids[0] + 4))
