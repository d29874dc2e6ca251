"""Driver contract for the rasters_spark engine.

``entry``      — flagship point-in-tile spatial join + nearest sampling
                 at sf0.001 (SURVEY §7.1).
``queries``    — one callable per implemented operator (SURVEY §2).
``oracle_sql`` — DuckDB-equivalent SQL. Spatial queries run on the
                 deterministic fixture parquet under
                 /root/repo/.fixtures/<sf>/ (FIXTURES.md; generated at
                 import so the oracle can run in any order); queries on
                 the driver's own tables use the pre-registered views.

Cross-engine parity rules (see SURVEY §7.3):
- banker's rounding: Spark ``bround`` ↔ DuckDB ``round_even`` (= numpy);
- NaN pixels cross the relational boundary as SQL NULL on both sides;
- fixture pixels are exact quarter-integers → sums/avgs are exact in
  double, so aggregates hash identically regardless of order (lossy q8
  tiles are excluded from pixel-sum oracles and pinned by PSNR tests).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rasters_spark import cells, fixtures, grid
from rasters_spark.datapipe import (chips, dedup, multimodal, shards,
                                    similarity, split, textstats)
from rasters_spark.functions import crs as crsfn
from rasters_spark.functions import render as renderfn
from rasters_spark.functions import vector as vecfn
from rasters_spark.operators import (bands, contour, focal, neighbors,
                                     polygonize, retile, terrain)
from rasters_spark.operators import joins, knn, point_join, resample, sample, stats
from rasters_spark.operators import swath as swathops
from rasters_spark.operators import rastermath as rm
from rasters_spark.tiles import load_points, load_polygons, load_tiles, tiles_with_cells, with_grid

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
# oracle SQL strings are static → pin the sf0.01 fixture dir (driver runs t2 there)
FD = str(fixtures.ensure_fixtures(SF01))
fixtures.ensure_fixtures(SF001)

LEVEL = fixtures.CELL_LEVEL  # 7 → 1.40625° cells
CSZ = repr(cells.cell_size_deg(LEVEL))
NX, NY = 2 * (1 << LEVEL), 1 << LEVEL
PACK = 1 << cells.LEVEL_SHIFT
IYS = 1 << cells.IY_SHIFT


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_point_sample_join(spark, SF001)


# --- spatial queries (fixture tables) -----------------------------------------

def q_point_chips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-chip extraction (datapipe.chips.point_chips — the
    vision-dataset patch cutter; EXTENSION beyond the reference's
    single-pixel sampling raster.py:1319): every point ⋈ containing
    raw tile yields the clamped 5×5 chip around its pixel, cut with
    JVM substring row-segments (≤100 B/point crosses to Python —
    never the tile blob), reduced to (chip_w, chip_h, n_valid, exact
    vsum, vmin, vmax). The oracle recomputes the same window with a
    relational range join; all-NaN chips report NULL aggregates on
    both engines."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    p = load_points(spark, sf_dir)
    return chips.point_chips(point_join.point_in_tile_join(p, t), 2)


def q_point_sample_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir)  # unexploded: skinny index built inside the join
    p = load_points(spark, sf_dir)
    j = point_join.point_in_tile_join(p, t)
    return sample.sample_nearest(j).select(
        "point_id", "image_id", "prow", "pcol", "value", "caption"
    )


def q_point_sample_join_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HUGE-point-side flagship strategy (round-4 scale fix): the
    matched index rows aggregate per tile and the payload streams
    against that aggregate, with O(1) pixel_at reads in the kernel —
    nothing is driver-serial in the matched-pair count and pixel bytes
    never cross an exchange (sample.sample_nearest_grouped). Measured
    at 1M points / 400k tiles: 2→8-core efficiency 0.84 vs 0.47 for
    the matched-broadcast default. Same oracle as point_sample_join —
    the two strategies are certified value-identical."""
    t = load_tiles(spark, sf_dir)
    p = load_points(spark, sf_dir)
    idx = point_join.point_in_tile_join(p, t, payload_cols=())
    return sample.sample_nearest_grouped(idx, t).select(
        "point_id", "image_id", "prow", "pcol", "value", "caption"
    )


def q_xyz_pyramid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ pyramid build, oracle-checkable core: every raw-tile pixel
    assigned to the global zoom-4 Web-Mercator pyramid (shared-SQL-text
    Mercator forward + FLOOR cell rule, functions/xyz.py) and composited
    per z/x/y tile — (xtile, ytile, n_pixels, exact vsum). The DuckDB
    oracle recomputes the identical assignment from the pixels table
    (same centroid arithmetic as vector.pixel_centroids, same formula
    characters), so a hash match certifies the whole pyramid routing."""
    from rasters_spark.functions import xyz as xyzfn

    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return xyzfn.xyz_pyramid_stats(t, z=4)


def q_stream_xyz_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental pyramid maintenance as Structured Streaming: the
    tile table split into 3 files drains availableNow (1 file per
    micro-batch), each batch committing its (xtile, ytile, n, vsum)
    partials as one exactly-once TableIO snapshot; the final reduce
    over partials is bit-identical to the one-shot batch build (exact
    quarter-integer sums), so the oracle IS xyz_pyramid_stats' SQL."""
    import os
    import shutil
    import tempfile

    from rasters_spark.streaming import stream_xyz_pyramid_available_now
    from rasters_spark.tableio import TableIO

    fdir = fixtures.ensure_fixtures(sf_dir)
    work = os.path.join(tempfile.gettempdir(),
                        f"stream-xyz-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "in")
    spark.read.parquet(str(fdir / "tiles.parquet")).repartition(3) \
        .write.mode("overwrite").parquet(src)
    tbl = TableIO(os.path.join(work, "tbl"))
    return stream_xyz_pyramid_available_now(
        spark, src, tbl, os.path.join(work, "ckpt"), z=4)


def q_stream_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental global histogram as Structured Streaming: the tile
    table split into 3 files drains availableNow (1 file/micro-batch),
    each batch committing its ≤64-row per-bin partial counts as one
    exactly-once TableIO snapshot; the final reduce over partials is
    pure integer addition, so the result EXACTLY equals the one-shot
    batch histogram and the oracle IS tile_histogram's SQL."""
    import os
    import shutil
    import tempfile

    from rasters_spark.streaming import stream_histogram_available_now
    from rasters_spark.tableio import TableIO

    fdir = fixtures.ensure_fixtures(sf_dir)
    work = os.path.join(tempfile.gettempdir(),
                        f"stream-hist-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "in")
    spark.read.parquet(str(fdir / "tiles.parquet")).repartition(3) \
        .write.mode("overwrite").parquet(src)
    tbl = TableIO(os.path.join(work, "tbl"))
    return stream_histogram_available_now(
        spark, src, tbl, os.path.join(work, "ckpt"), 0.0, 1024.0, 64)


def q_stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental decontamination at ingest (streaming.
    stream_decontaminate_available_now): the TRAIN docs split into 3
    files drain availableNow; the eval 4-gram digest set is built
    once (the persisted benchmark-digest table) and stream-static
    joined per micro-batch, per-doc overlap partials committed
    exactly-once. Each doc lives in one batch, so the partial union
    IS the batch answer — the oracle is decontaminate's SQL
    verbatim."""
    import os
    import shutil
    import tempfile

    from rasters_spark.streaming import stream_decontaminate_available_now
    from rasters_spark.tableio import TableIO

    d = _docs(spark, sf_dir)
    work = os.path.join(tempfile.gettempdir(),
                        f"stream-dc-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "in")
    d.filter("doc_id % 10 != 0").repartition(3).write.mode("overwrite").parquet(src)
    tbl = TableIO(os.path.join(work, "tbl"))
    return stream_decontaminate_available_now(
        spark, src, d.filter("doc_id % 10 = 0"), tbl,
        os.path.join(work, "ckpt"), 4)


def q_stream_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental greatest-value composite as Structured Streaming
    (streaming.stream_composite_available_now): the tile table split
    into 3 files drains availableNow, each batch committing per-cell
    (max, attaining-epoch, n_obs) partials exactly-once to the
    TableIO ledger; the final merge is the SAME associative
    (value, −epoch) struct-max + integer n_obs sum, so the result
    EXACTLY equals the one-shot temporal_composite and shares its
    oracle. A rolling best-pixel mosaic: new scenes only raise
    cells."""
    import os
    import shutil
    import tempfile

    from rasters_spark.streaming import stream_composite_available_now
    from rasters_spark.tableio import TableIO

    fdir = fixtures.ensure_fixtures(sf_dir)
    work = os.path.join(tempfile.gettempdir(),
                        f"stream-comp-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "in")
    spark.read.parquet(str(fdir / "tiles.parquet")).repartition(3) \
        .write.mode("overwrite").parquet(src)
    tbl = TableIO(os.path.join(work, "tbl"))
    return stream_composite_available_now(
        spark, src, tbl, os.path.join(work, "ckpt"), RASTERIZE_TARGET)


def q_xyz_tile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ (slippy-map / Web-Mercator z/x/y) tile assignment at zoom 8
    — the web pyramid counterpart of the engine's equirectangular cell
    index (pairs with the EPSG:3857 kernel in functions/crs.py). The
    ln/tan formula TEXT is shared verbatim with the DuckDB oracle
    (CLAUDE.md transcendental-parity rule); points outside the
    ±85.051° Web-Mercator band are excluded on both sides."""
    p = load_points(spark, sf_dir).filter(
        (F.col("y") > -cells.WEBMERC_LAT_MAX) & (F.col("y") < cells.WEBMERC_LAT_MAX))
    xt, yt = cells.xyz_tile("x", "y", 8)
    return p.select("point_id", xt.alias("xtile"), yt.alias("ytile"))


def q_point_sample_join_i32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer tile family end-to-end (VERDICT r03 #2): raw tiles cast
    to i32 (pixels ×4 — exact quarter-integers → exact ints), NaN
    filled with the I32_NODATA sentinel (NaN nodata forbidden for int
    rasters, raster.py:1217-1218), then the flagship point join +
    nearest sampling OVER THE INT TILES (integer rasters always sample
    nearest, raster.py:1295-1322). Values surface as exact BIGINT with
    sentinel → NULL — an exact-integer oracle, no float parity caveats."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    it = with_grid(rm.astype_tiles(t, "i32", rm.mul(4.0)))
    p = load_points(spark, sf_dir)
    j = point_join.point_in_tile_join(p, it)
    return sample.sample_nearest(j).select(
        "point_id", "image_id", "prow", "pcol",
        F.col("value").cast("long").alias("ivalue"))


def q_bool_mask_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bool tile family: threshold mask (pixel > 500, NaN→False like
    numpy) cast to b1, decoded back through the uint16 shim
    (kdtree.py:293-310) and reduced per tile — vsum over 0/1 pixels IS
    the true-count; bool tiles carry no nodata so n_valid ≡ n_pixels."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    bt = rm.astype_tiles(t, "b1", rm.gt(500.0))
    s = stats.tile_stats(bt)
    return s.select("image_id", "n_pixels", F.col("vsum").cast("long").alias("n_true"))


def q_netcdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic NetCDF-3 ingest driver end-to-end (reference multi-driver
    open raster.py:634-771 + debug_reading_netcdf.py entry flow): the
    first 150 raw tiles sink to one .nc container per partition
    (no driver funnel), open_tiles re-ingests them via the distributed
    (path, offset) index — pixels fetched executor-side — and the
    output carries the re-read georeferencing plus exact finite-pixel
    sums. The oracle recomputes all of it from the tiles+pixels tables,
    so a hash match proves sink AND source are real."""
    import os
    import shutil
    import tempfile

    from rasters_spark.functions import netcdf3
    from rasters_spark.tiles import open_tiles

    t = load_tiles(spark, sf_dir).filter("fmt = 'raw' and image_id < 'img000000000150'")
    # fixed per-sf path, recreated each run — repeated gate runs reuse
    # the slot instead of accumulating mkdtemp leftovers
    work = os.path.join(tempfile.gettempdir(),
                        f"nc-contract-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    netcdf3.save_netcdf_tiles(t.repartition(4), work)
    back = open_tiles(spark, work)
    s = stats.tile_stats(back)
    geo = back.select("image_id", "w", "h", "x_origin", "y_origin")
    return s.join(geo, "image_id").select(
        "image_id", "w", "h", "x_origin", "y_origin", "n_pixels", "n_valid", "vsum")


def q_netcdf_cdf5_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-5 (PnetCDF 64-bit) variant of the NetCDF ingest round trip
    (VERDICT r04 #9): raw tiles 150-299 sink as FORCED-v5 containers
    (every NON_NEG header field i64 — the layout a >2 GiB-vsize
    10⁹-pixel group requires) and re-ingest through the same
    distributed (path, offset) index. Same oracle shape as
    netcdf_roundtrip on the shifted id range: a hash match proves the
    64-bit header codec end-to-end, not just in the unit tests."""
    import os
    import shutil
    import tempfile

    from rasters_spark.functions import netcdf3
    from rasters_spark.tiles import open_tiles

    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id >= 'img000000000150' and image_id < 'img000000000300'")
    work = os.path.join(tempfile.gettempdir(),
                        f"nc5-contract-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    netcdf3.save_netcdf_tiles(t.repartition(4), work, version=5)
    back = open_tiles(spark, work)
    s = stats.tile_stats(back)
    geo = back.select("image_id", "w", "h", "x_origin", "y_origin")
    return s.join(geo, "image_id").select(
        "image_id", "w", "h", "x_origin", "y_origin", "n_pixels", "n_valid", "vsum")


def q_focal_halo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focal (3×3 neighborhood) statistics with CROSS-TILE halo
    exchange — an extension beyond the reference (no focal family
    there): each tile's edge cells see the abutting tiles' edge pixels
    via a skinny r-wide strip exchange (operators/focal.py). The
    fixture's native tiles don't abut, so the query first re-origins
    the first 300 raw tiles onto a dense row-major lattice
    (``lattice_remap`` — metadata only, replicated in the oracle with
    the identical row_number() window), which makes the halo path
    load-bearing: dropping or misplacing a single strip changes the
    per-tile focal sums. Quarter-integer fixture pixels keep every
    window sum exact in double, so the oracle — which sums the same
    (center, neighbor) pairs relationally via a 9-offset equi-join on
    global pixel coordinates — matches bit-for-bit."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return focal.focal_stats(focal.lattice_remap(t, per_row=40), radius=1)


def q_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius proximity (focal.proximity_stats —
    gdal_proximity-with-maxdist analogue, EXTENSION beyond the
    reference): per valid cell the Euclidean pixel distance to the
    nearest target (value ≥ 750) within the 5×5 window (radius-2 halo
    strips), NULL beyond, 0 on targets, plus the in-window target
    count. Distances are sqrt of small ints — correctly-rounded IEEE
    with the expression shared verbatim, and the min over distinct
    constants has no tie — so doubles + counts hash identically."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return focal.proximity_stats(focal.lattice_remap(t, per_row=40), 750.0, 2)


def q_focal_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focal MEDIAN + MAJORITY rank filters (focal.focal_rank_stats —
    despeckle / categorical smoothing; EXTENSION beyond the reference)
    over the same halo-exchanged lattice as ``focal_halo_stats``:
    per-pixel (med, maj, n) for every cell with a non-empty 3×3
    window. Median of an even window = mean of the two middles —
    numpy's (a+b)/2 and DuckDB quantile_cont(0.5)'s lo·0.5+hi·0.5 are
    both exact on quarter-integer pixels, so doubles hash
    bit-identically (no printf); majority tie-break is total-ordered
    (count desc, value asc) on both engines."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return focal.focal_rank_stats(focal.lattice_remap(t, per_row=40), 1)


def q_focal_convolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted focal convolution (3×3 binomial blur kernel) with
    cross-tile halo exchange — the blur/sharpen map-algebra operator
    (operators/focal.py convolve_stats; EXTENSION beyond the reference,
    which has no convolution family). Same lattice + strip machinery as
    ``focal_halo_stats`` but each (center, neighbor) pair carries a
    kernel WEIGHT: dropping a strip, misplacing a slab, or flipping the
    kernel orientation changes the per-tile weighted sums. The binomial
    weights are sixteenths (dyadic) and fixture pixels quarter-integers,
    so every w·v product and partial sum is exact in double — the
    relational twin joining the same (center, neighbor, weight) triples
    matches bit-for-bit in any accumulation order."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return focal.convolve_stats(focal.lattice_remap(t, per_row=40), focal.BINOMIAL3)


def q_flow_d8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow direction (terrain.flow_d8 — O'Callaghan & Mark 1984,
    the ESRI/GDAL FlowDirection operator; EXTENSION beyond the
    reference) over the halo-exchanged lattice: per valid cell the
    ESRI code of the steepest positive drop (ties → smallest code,
    0 on pits/flats) plus the positive-drop neighbor count. Every
    drop is an exact dyadic difference ÷ (1.0 | shared sqrt(2.0)) —
    correctly-rounded IEEE on both engines, so the argmax and counts
    are pure-integer identical; no printf."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return terrain.flow_d8(focal.lattice_remap(t, per_row=40))


def q_terrain_curvature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zevenbergen–Thorne curvature (terrain.curvature_zt — the
    GDAL/ESRI Curvature operator; EXTENSION beyond the reference):
    strict 3×3 windows over the halo lattice; D/E/F/G/H are exact
    dyadic (power-of-two cell sizes), the flatness test G²+H²=0 is
    exact, products/divisions correctly rounded with shared text —
    raw doubles hash bit-identically, plan/profile NULL on flat."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    out = terrain.curvature_zt(focal.lattice_remap(t, per_row=40))
    return out.select(
        "image_id", "prow", "pcol", "curv",
        F.when(~F.isnan("plan_curv"), F.col("plan_curv")).alias("plan_curv"),
        F.when(~F.isnan("prof_curv"), F.col("prof_curv")).alias("prof_curv"))


def q_lattice_chips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seamless cross-tile chip extraction (chips.lattice_chips —
    closes point_chips' clamp-at-edges seam): stride-7 probe cells on
    the halo-exchanged lattice get their FULL 5×5 window across tile
    boundaries (radius-2 strips); lattice-edge chips see NaN halo ≡
    the twin's absent rows. Exact chip stats on global pixel keys."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return chips.lattice_chips(focal.lattice_remap(t, per_row=40), 2, 7)


def q_terrain_horn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn slope / aspect / hillshade (operators/terrain.py; Horn 1981
    stencil, the GDAL/ESRI DEM convention — EXTENSION beyond the
    reference) over the halo-exchanged lattice, STRICT 3×3 window (all
    9 pixels finite). The Horn weighted differences are exact dyadic
    doubles here (quarter-integer pixels, power-of-two cell sizes), so
    gx/gy are bit-identical cross-engine; slope/aspect go through
    atan/atan2 (≤1 ulp libm drift) and are printf-quantized on both
    engines (CLAUDE.md rule); hillshade uses the normal·light
    dot-product form — every op deterministic IEEE with the light
    vector inlined bit-identically into both expressions — and is
    quantized for uniformity. Aspect is NULL on flat cells (the exact
    gx=gn=0 case, deterministic on both engines).

    Quantization measurement (the VERDICT r04 #2 protocol): at %.9e
    exactly 1 slope cell of 261,412 straddles a decimal rounding
    boundary under the atan ulp drift (the fixture's steep gradients
    saturate slope toward 90°, where atan compresses input spread into
    sub-ulp output differences) — slope is therefore pinned at %.8e
    (9 significant digits); aspect and hillshade hash clean at %.9e
    (aspect's atan2 operates far from saturation, hillshade is
    deterministic IEEE end-to-end — 0 mismatches measured for both)."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    out = terrain.slope_aspect_hillshade(focal.lattice_remap(t, per_row=40))
    return out.select(
        "image_id", "prow", "pcol",
        F.format_string("%.8e", F.col("slope_deg")).alias("slope_q"),
        F.when(~F.isnan(F.col("aspect_deg")),
               F.format_string("%.9e", F.col("aspect_deg"))).alias("aspect_q"),
        F.format_string("%.9e", F.col("hillshade")).alias("hs_q"))


#: dyadic (eighth-integer) iso-levels inside the fixture's 0..999.75
#: quarter-integer pixel range — never exactly equal to a pixel value,
#: and exact in double on both engines.
CONTOUR_LEVELS = (250.125, 500.25)


def q_contour_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares contour extraction (operators/contour.py) —
    raster→vector iso-lines (gdal_contour analogue, EXTENSION beyond
    the reference) over the halo-exchanged lattice: per 2×2 pixel
    block, the level-L segments with edge crossings at
    t=(L−a)/(b−a) — every input exact dyadic (quarter-integer pixels,
    eighth-integer levels, power-of-two cell sizes), every op
    correctly-rounded IEEE, so segment endpoints are BIT-IDENTICAL to
    the relational twin (4-corner pivot → forced 2-crossing pairing in
    the shared (top,bottom,left,right) coalesce order → center-mean
    saddle disambiguation), no printf needed. Blocks are owned by
    their top-left tile (single ownership — seam segments emitted
    once, by the tile whose E/S/SE halo serves the block)."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return contour.contour_segments(
        focal.lattice_remap(t, per_row=40), CONTOUR_LEVELS)


def q_retile_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retile (operators/retile.py — gdal_retile analogue, split
    direction): every raw tile < 300 splits map-only into 4×4
    children; certified by each child's georeferencing (closed-form
    origin arithmetic, bit-identical CR float expressions both
    engines) plus its exact pixel accounting (n_pixels, n_valid,
    exact vsum) — the oracle re-partitions the pixels table with pure
    integer division and must agree row-for-row."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    kids = retile.retile_split(t, 4)
    st = stats.tile_stats(kids).select("image_id", "n_pixels", "n_valid", "vsum")
    return kids.select("image_id", "x_origin", "y_origin", "w", "h").join(st, "image_id")


def q_pansharpen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brovey pansharpening (bands.pansharpen_brovey — Gillespie 1987,
    the gdal_pansharpen 'brovey' algorithm; EXTENSION beyond the
    reference): 16×16 raw tiles rank-stacked 4 deep (bands 0-2 = MS,
    3 = pan; the row_number stacking is fixture plumbing replicated
    verbatim in SQL), then per pixel valid in all four bands
    sharp_b = (ms_b·pan)/(ms_0+ms_1+ms_2), NULL where the exact
    dyadic MS sum is 0. Product + single division are correctly
    rounded with shared expression text — doubles hash
    bit-identically; NaN→NULL at the boundary."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and w = 16 and h = 16 and image_id < 'img000000001200'")
    out = bands.pansharpen_brovey(bands.stack_by_rank(t, 4))
    return out.select(
        "stack_id", "band", "prow", "pcol",
        F.when(~F.isnan("sharp"), F.col("sharp")).alias("sharp"))


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pixel temporal forward-fill (bands.gap_fill_stack — the
    LOCF cloud-gap-filling operator; EXTENSION beyond the reference):
    16×16 raw tiles rank-stacked 3 deep as epochs (the q8 format
    cycle leaves gaps, so BOTH engines qualify to complete 3-tile
    stacks — kernel: len != 3 skip; oracle: HAVING count(*) = 3),
    invalid pixels take their
    most recent valid predecessor. ZERO float math (values are exact
    copies), so the oracle is DuckDB's last_value(v IGNORE NULLS)
    ordered window verbatim. The cogroup ships TILES across the
    exchange where the window form would ship every pixel row."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and w = 16 and h = 16 and image_id < 'img000000001188'")
    return bands.gap_fill_stack(bands.stack_by_rank(t, 3), 3)


def q_reclassify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range reclassification (rm.reclassify — the GDAL/ESRI
    Reclassify operator; EXTENSION beyond the reference): raw pixels
    banded at [256, 512, 768) into classes 1-4 (half-open,
    searchsorted-right ≡ the SQL case-when ladder), certified by
    per-tile class counts — pure integers, NaN excluded on both
    engines."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    px = rm.pixels_of(rm.elementwise(t, rm.reclassify([256.0, 512.0, 768.0],
                                                      [1.0, 2.0, 3.0, 4.0])))
    return (px.filter(F.col("value").isNotNull() & ~F.isnan("value"))
            .groupBy("image_id", F.col("value").cast("int").alias("cls"))
            .agg(F.count("*").alias("n")))


def q_augment_flips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric training-data augmentation (rm.augment_tiles — the
    standard vision flips; EXTENSION beyond the reference): raw tiles
    < 100 emit hflip/vflip/rot180 variants (byte-exact value
    permutations, no arithmetic), certified PER PIXEL via
    rm.pixels_of — the oracle permutes the pixels table's indices
    relationally ((r,c) ← (r,w−1−c) etc.), so every misplaced mirror
    axis flips rows. NaN→NULL at the boundary."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000100'")
    px = rm.pixels_of(rm.augment_tiles(t))
    return px.select("image_id", "prow", "pcol",
                     F.when(~F.isnan("value"), F.col("value")).alias("value"))


def q_epoch_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pixel change-detection trend (bands.epoch_trend — OLS slope
    over 3 equally-spaced epochs; EXTENSION beyond the reference):
    same complete-3-stack qualification as gap_fill; slope =
    (v2−v0)/2 exact dyadic, mean = ((v0+v1)+v2)/3 one CR division
    with shared expression text — doubles hash bit-identically."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and w = 16 and h = 16 and image_id < 'img000000001188'")
    return bands.epoch_trend(bands.stack_by_rank(t, 3), 3)


def q_qa_cloud_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed QA-bitmask decode + cloud masking (stats.qa_flags_stats
    — the USGS Landsat QA_PIXEL workflow, EXTENSION beyond the
    reference): QA word = floor(value·4) (exact on quarter-integer
    pixels), CFMask bits 3/4/5 (cloud/shadow/snow) counted per tile,
    and the cloud bit masks the tile (n_clear + exact clear_vsum).
    Pure integers + exact dyadic sums; the oracle extracts the same
    bits with (qa//2^b)%2 — identical to (qa>>b)&1 on the
    non-negative QA range."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return stats.qa_flags_stats(t)


def q_tile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-bin histogram (stats.histogram — gdalinfo -hist
    analogue): 64 bins of width 16 over [0, 1024) across every valid
    raw pixel. Map-side partial bincounts (≤64 skinny rows per task
    regardless of pixel count) → one groupBy(bin); dyadic lo/width
    make floor((v−lo)/16) exact in double, so the oracle bins the same
    pixels relationally — pure integer counts, no float aggregation."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return stats.histogram(t, 0.0, 1024.0, 64)


def q_layer_ndvi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-LAYER band math (rastermath.layer_algebra — the NDVI
    shape): raw tiles i<100 paired with raw tiles i+153 (same (w,h) by
    the fixture's size cycles: 153 ≡ 0 mod 3 and 51 ≡ 0 mod 3), then
    per-pixel (a−b)/(a+b) for pixels finite in BOTH layers, NULL where
    a+b=0 (exact test). Numerator/denominator are exact dyadic
    differences of quarter-integer pixels and the single division is
    correctly rounded, so the doubles hash BIT-IDENTICALLY against the
    relational twin — no printf. NaN→NULL at the boundary per the
    CLAUDE.md rule."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    idx = F.expr("cast(substring(image_id, 4, 12) as bigint)")
    a = t.filter(idx < 100).withColumn("pid", idx)
    b = (t.filter((idx >= 153) & (idx < 253)).withColumn("pid", idx - 153)
         .select("pid", F.col("fmt").alias("fmt_b"), F.col("bytes").alias("bytes_b")))
    pairs = (a.select("image_id", "pid", "w", "h",
                      F.col("fmt").alias("fmt_a"), F.col("bytes").alias("bytes_a"))
             .join(b, "pid"))
    out = rm.layer_algebra(pairs, "ndiff")
    return out.select(
        "image_id", "prow", "pcol",
        F.when(~F.isnan(F.col("value")), F.col("value")).alias("ndiff"))


def q_polygonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed polygonize (operators/polygonize.py — GDAL
    polygonize analogue, EXTENSION beyond the reference): 4-adjacency
    connected components of the mask ``value >= 750`` across the
    lattice, seams included — tile-local run union-find → skinny
    boundary-pixel seam joins → global label propagation with the SAME
    operator that clusters near-dup documents (dedup.dup_groups).
    Region id = the component's min global pixel key (gy·2³²+gx) —
    visit-order independent, so the DuckDB twin can recompute it with
    a recursive-CTE transitive closure + min-ancestor fold. One layout
    group (w=64, h=48 — keys are lattice-local), per_row=6 so BOTH
    seam directions carry merges; threshold 750 keeps the mask
    subcritical (p=0.25) so the closure stays small."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300' and w = 64 and h = 48")
    return polygonize.polygonize(focal.lattice_remap(t, per_row=6), 750.0)


def q_sieve_small_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sieve speckle removal (polygonize.sieve — GDAL sieve analogue,
    drop variant): masked regions smaller than 3 pixels are NULLed
    out; certified by per-tile (n_pixels, n_valid, vsum) after the
    rewrite — the oracle recomputes the same components with the
    recursive-CTE closure, filters the small roots, and subtracts
    their members relationally (pure integer counts + exact dyadic
    sums). Same single-layout lattice as ``polygonize``."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300' and w = 64 and h = 48")
    out = polygonize.sieve(focal.lattice_remap(t, per_row=6), 750.0, 3)
    return stats.tile_stats(out).select("image_id", "n_pixels", "n_valid", "vsum")


def q_stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup filtering at ingest (round 5): the
    documents table split into 3 files drains availableNow; each
    micro-batch MinHash-bands its docs, probes the disk-backed band
    -table state (TableIO snapshots, never recomputed from text),
    exact-Jaccard-verifies candidates, and commits (doc_id, dup_of, j)
    partials exactly-once. A pair is evaluated exactly once (in the
    later doc's batch), so the final per-doc min reduce equals the
    batch answer — the oracle is the exact-Jaccard pair set grouped
    per doc (complete LSH recall on the fixtures, as for
    minhash_lsh_pairs)."""
    import os
    import shutil
    import tempfile

    from rasters_spark.streaming import stream_minhash_dedup_available_now
    from rasters_spark.tableio import TableIO

    work = os.path.join(tempfile.gettempdir(),
                        f"stream-dedup-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "in")
    _docs(spark, sf_dir).select("doc_id", "text").repartition(3) \
        .write.mode("overwrite").parquet(src)
    return stream_minhash_dedup_available_now(
        spark, src, TableIO(os.path.join(work, "out")),
        TableIO(os.path.join(work, "docs_state")),
        TableIO(os.path.join(work, "bands_state")),
        os.path.join(work, "ckpt"))


def q_pq_topk_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk-query ADC over PQ codes (VERDICT r04 #3): the dedup-sweep
    shape — raw query vectors broadcast once, LUTs built chunk-wise on
    the executors (chunk=64 here, forcing the multi-chunk path), local
    top-k with the total-order (adc, vec_id) tie-break. Rows-only: the
    codebook means are float k-means with no SQL twin (CLAUDE.md
    float-sum rule); identity with the interactive collect-path at 10⁴
    queries and partitioning-independence are pinned in
    tests/test_datapipe.py."""
    e = _emb(spark, sf_dir)
    books = similarity.pq_fit(e, m=8, k=64, iters=2)
    codes = similarity.pq_encode(e, books)
    return similarity.pq_topk_bulk(codes, e.filter("vec_id < 200"), books,
                                   k=5, chunk=64)


def q_tile_cell_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tiles_with_cells(load_tiles(spark, sf_dir)).select("image_id", "cell_id")


def q_tile_z_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) id of each tile's center — the data-LAYOUT key
    (cells.z_cell_id): sorting/bucketing the 10^12-row table by this id
    keeps spatial neighborhoods in O(1) contiguous id ranges so
    parquet/Iceberg min-max stats prune range scans (Delta/Iceberg
    Z-ORDER clustering, re-expressed as closed-form magic-mask integer
    SQL). Oracle: the identical bit math in DuckDB (cells.z_cell_id_sql)
    — bit-for-bit, all 56 interleaved bits hash-checked."""
    from rasters_spark import cells as C

    t = load_tiles(spark, sf_dir)
    cx = F.col("x_origin") + F.col("cell_width") * F.col("w").cast("double") / 2.0
    cy = F.col("y_origin") + F.col("cell_height") * F.col("h").cast("double") / 2.0
    return t.select("image_id", C.z_cell_id(cx, cy, fixtures.CELL_LEVEL).alias("z_id"))


def q_tile_windows_for_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped read-windows of each tile for each rectangle polygon —
    the reference's RasterGrid.window (raster_grid.py:770-815) as a join.

    Candidate generation is a cell-bucketed EQUI-join (tiles explode
    into covered cells, polygon bboxes likewise; VERDICT r02 #9 — the
    round-2 crossJoin evaluated tiles × polys as BroadcastNestedLoop,
    fine at 20 polygons, quadratic at many). A pair sharing several
    cells dedups SHUFFLE-FREE by the report-once anchor trick: keep the
    row only where the joined cell is the overlap bbox's north-west
    anchor cell (every overlapping pair covers its own overlap anchor,
    so exactly one copy survives). Plan: BroadcastHashJoin on cell_id,
    zero added exchanges (asserted in tests/test_operators2.py)."""
    t = tiles_with_cells(load_tiles(spark, sf_dir))
    polys = load_polygons(spark, sf_dir).filter("is_rect").select(
        "poly_id", grid.bbox_struct("xmin", "ymin", "xmax", "ymax").alias("pbox")
    )
    pc = polys.withColumn("cell_id", F.explode(cells.cells_for_bbox(F.col("pbox"), LEVEL)))
    j = t.join(F.broadcast(pc), "cell_id")
    w = grid.window_for_bbox(F.col("grid"), F.col("pbox"))
    j = j.withColumn("win", w).filter(~F.col("win")["oob"])
    # overlap anchor: NW cell of (tile bbox ∩ poly bbox) — defined for
    # every surviving (non-oob ⇒ overlapping) pair
    anchor = cells.pack(
        LEVEL,
        cells.cell_iy(F.least(F.col("bbox")["ymax"], F.col("pbox")["ymax"]), LEVEL),
        cells.cell_ix(F.greatest(F.col("bbox")["xmin"], F.col("pbox")["xmin"]), LEVEL),
    )
    return (
        j.filter(F.col("cell_id") == anchor)
        .select(
            "image_id", "poly_id",
            F.col("win")["row_start"].alias("row_start"),
            F.col("win")["col_start"].alias("col_start"),
            F.col("win")["row_end"].alias("row_end"),
            F.col("win")["col_end"].alias("col_end"),
        )
    )


def q_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return stats.tile_stats(t)


def q_stretch_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile 2/98-percentile stretch statistics
    (generate_percentilecut's parameter half) — manual quantile
    interpolation matching DuckDB quantile_cont bit-for-bit on the
    exact quarter-integer fixture values."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return stats.stretch_params(t)


def q_grid_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BBox.merge / RasterGrid.merge aggregates (bbox.py:81-108,
    raster_grid.py:324-348): union extent + finest cell size."""
    t = load_tiles(spark, sf_dir)
    bb = F.col("bbox")
    return t.agg(
        F.min(bb["xmin"]).alias("xmin"), F.min(bb["ymin"]).alias("ymin"),
        F.max(bb["xmax"]).alias("xmax"), F.max(bb["ymax"]).alias("ymax"),
        F.min(F.col("grid")["cell_width"]).alias("min_cell_width"),
        F.max(F.col("grid")["cell_height"]).alias("max_cell_height"),
        F.count("*").alias("n_tiles"),
    )


RASTERIZE_TARGET = dict(
    x_origin=-180.0, y_origin=90.0, cell_width=0.25, cell_height=-0.25,
    rows=720, cols=1440, crs="EPSG:4326",
)


def q_points_in_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PIP join (ray-cast kernel); rect subset so the DuckDB oracle
    can assert the identical half-open bbox semantics. Convex/concave
    rings are pinned by tests/test_joins.py instead."""
    pts = load_points(spark, sf_dir)
    polys = load_polygons(spark, sf_dir).filter("is_rect")
    return joins.points_in_polygons(pts, polys).select("point_id", "poly_id", "x", "y", "burn_value")


def q_multipolygon_pip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiPolygon PIP end-to-end: rect polygons pair into MultiPolygon
    GeoJSON STRINGS (written by vecfn.rings-writer SQL), parse back via
    geojson_to_rings (wrap_geometry.py:74-79 Multi* dispatch), explode
    into (poly_id, part, ring) rows, exact ray-cast join, membership in
    ANY part by distinct. Member bounds snap to quarter+0.125 (odd
    eighths — exact in double, %.3f round-trips, and no fixture point
    sits on an odd eighth so half-open boundaries can't flip between
    the ray-cast and the oracle's bbox test)."""
    from pyspark.sql import Window

    pts = load_points(spark, sf_dir)
    polys = load_polygons(spark, sf_dir).filter("is_rect")

    def snap(c):
        return F.bround(F.col(c) * 4) / 4 + 0.125

    r = polys.select(
        "poly_id", snap("xmin").alias("x0"), snap("ymin").alias("y0"),
        snap("xmax").alias("x1"), snap("ymax").alias("y1"),
    ).withColumn("rn", F.row_number().over(Window.orderBy("poly_id")) - 1)
    r = r.withColumn("mp_id", F.floor(F.col("rn") / 2))
    member = F.format_string(
        "[[[%.3f,%.3f],[%.3f,%.3f],[%.3f,%.3f],[%.3f,%.3f],[%.3f,%.3f]]]",
        F.col("x0"), F.col("y0"), F.col("x1"), F.col("y0"),
        F.col("x1"), F.col("y1"), F.col("x0"), F.col("y1"),
        F.col("x0"), F.col("y0"))
    gj = r.withColumn("m", member).groupBy("mp_id").agg(
        F.concat(
            F.lit('{"type": "MultiPolygon", "coordinates": ['),
            F.concat_ws(",", F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("rn"), F.col("m").alias("m")))),
                lambda s: s["m"])),
            F.lit("]}"),
        ).alias("gj"))
    parts = gj.select(
        F.col("mp_id").alias("poly_id"),
        F.posexplode(vecfn.geojson_to_rings(F.col("gj"))).alias("part", "ring"))
    bb = vecfn.ring_bbox(F.col("ring"))
    pp = parts.select(
        "poly_id", "part", "ring",
        bb["xmin"].alias("xmin"), bb["ymin"].alias("ymin"),
        bb["xmax"].alias("xmax"), bb["ymax"].alias("ymax"))
    out = joins.points_in_polygons(pts, pp)
    return out.select("point_id", "poly_id").distinct()


def q_rasterize_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys = load_polygons(spark, sf_dir).filter("is_rect")
    return joins.rasterize(polys, RASTERIZE_TARGET, merge_alg="add")


def q_rasterize_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys = load_polygons(spark, sf_dir).filter("is_rect")
    return joins.rasterize(polys, RASTERIZE_TARGET, merge_alg="replace")


def q_tiles_in_polygons_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir)
    p = load_polygons(spark, sf_dir)
    return joins.tiles_intersecting_polygons(t, p, semi=True).select("image_id")


def q_knn_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir)
    p = load_points(spark, sf_dir)
    return knn.knn_tiles(p, t, k=3, ring=2)


COARSE_TARGET = dict(
    x_origin=-180.0, y_origin=90.0, cell_width=1.0, cell_height=-1.0,
    rows=180, cols=360, crs="EPSG:4326",
)


def q_raster_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused element-wise chain (×2, +10, clip, threshold-mask) in ONE
    Arrow pass, then per-tile stats — SURVEY §3 EP3 as a single stage."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    kernel = rm.compose(rm.mul(2.0), rm.add(10.0), rm.clip(0.0, 1500.0), rm.mask(rm.lt(1400.0)))
    return stats.tile_stats(rm.elementwise(t, kernel))


def q_trim_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir)
    return rm.trim(t).select("image_id", "w", "h", "x_origin", "y_origin")


def q_merge_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return resample.merge_mean(t, RASTERIZE_TARGET, fmts=("raw",))


def q_temporal_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greatest-value temporal compositing (resample.composite_max —
    max-NDVI-composite shape, EXTENSION beyond the reference's
    merge=mean raster.py:2014 / mosaic=first raster.py:2064): the tile
    stack is treated as a 3-epoch time series (epoch = tile_index % 3
    — the hot footprint genuinely stacks all three epochs), and per
    0.25° target cell the composite keeps the MAX valid observation,
    the epoch that attained it (ties → EARLIEST epoch, fused into the
    ONE hash aggregate via a struct max ordered (value, −epoch)), and
    the observation count. Max of quarter-integer pixels is exact, so
    the DuckDB twin (group-max + join-back min(epoch)) agrees
    bit-for-bit — no printf."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return resample.composite_max(t, RASTERIZE_TARGET, fmts=("raw",))


def q_mosaic_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir)
    return resample.mosaic_first(t, RASTERIZE_TARGET)


def q_to_grid_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return resample.to_grid_average(t, RASTERIZE_TARGET)


def q_bias_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bias_correct pipeline over two rasterized layers (fine 0.25°,
    coarse 1°) — avg-upsample, bias, nearest-downsample, all SQL."""
    polys = load_polygons(spark, sf_dir).filter("is_rect")
    fine = joins.rasterize(polys, RASTERIZE_TARGET, merge_alg="add")
    coarse = joins.rasterize(polys, COARSE_TARGET, merge_alg="add")
    return resample.bias_correct(coarse, fine, COARSE_TARGET, RASTERIZE_TARGET)


def q_linear_downscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linear_downscale with gap-filling and scale/bias output layers
    (linear_downscale.py:8-53). The oracle-checked variant runs the
    multiplicative pass + gap-fill (every float op is a single
    division/product of exact operands → order-independent across
    engines); the additive pass is oracle-covered by ``bias_correct``
    and the combined scale+bias path is pinned by
    tests/test_resample.py (a second averaging pass over value·scale
    doubles would be accumulation-order-dependent, SURVEY §7.3)."""
    polys = load_polygons(spark, sf_dir).filter("is_rect")
    fine = joins.rasterize(polys, RASTERIZE_TARGET, merge_alg="add")
    coarse = joins.rasterize(polys, COARSE_TARGET, merge_alg="add")
    return resample.linear_downscale(
        coarse, fine, COARSE_TARGET, RASTERIZE_TARGET,
        apply_scale=True, apply_bias=False,
        use_gap_filling=True, return_scale_and_bias=True)


# --- registered-view queries (no fixture dependency) ---------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_docs(spark, sf_dir))


def q_ngram_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), k=3, threshold=0.85)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch candidates, exact-verified: output equals the brute-force
    ≥0.85 pair set whenever LSH recall is complete (asserted in tests
    on the deterministic fixtures) — the oracle IS the brute force."""
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.85)


def q_minhash_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION minhash shape (VERDICT r03 #9): band table
    persisted bucketed+sorted on (band, bucket) via tableio, candidate
    self-join reads the bucketed scans back (zero Exchange on the join
    key — plan-asserted in tests/test_datapipe.py), exact verify on the
    candidates. Emits the identical pair set as the inline variant, so
    the same brute-force Jaccard oracle certifies the bucketed path."""
    return dedup.minhash_lsh_pairs_bucketed(
        spark, _docs(spark, sf_dir), table_name="contract_minhash_bands", threshold=0.85)


def q_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over the ≥0.85
    Jaccard pair graph (iterative label propagation; oracle = recursive
    CTE transitive closure). The ORACLE-CHECKED entry pins the exact
    pair source — the DuckDB CTE is exact Jaccard, and MinHash-band
    recall near the threshold is probabilistic, so tying the gate to
    LSH would make it flakeable under fixture bumps (ADVICE r02).
    dedup.dup_groups defaults to method='lsh' (the 100-TB path); the
    two are asserted identical on the fixtures in tests/test_datapipe.py."""
    return dedup.dup_groups(_docs(spark, sf_dir), method="exact")


def q_simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc (rows-only check: xxhash64 exists only in
    Spark; pinned by pytest recomputation — see q_simhash_md5 for the
    fully oracle-checked md5-bit variant of the same operator)."""
    return dedup.simhash64(_docs(spark, sf_dir))


def q_audio_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV audio path (multimodal.decode_wav — stdlib RIFF/PCM):
    synthesize a deterministic 800-sample PCM16 waveform per doc_id
    (s_i = ((i·(3+d%7) + 11d) mod 65536) − 32768), run it through
    encode_wav → decode_wav → audio_features. Every feature is exact
    int64 arithmetic (plus two exact divisions), so the oracle
    recomputes them from the same closed form in SQL — a hash match
    certifies the WAV container round trip AND the feature kernel."""
    import pandas as pd

    from rasters_spark.datapipe.multimodal import audio_features, encode_wav

    d = _docs(spark, sf_dir).select("doc_id").filter("doc_id < 100")

    def make(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                i = np.arange(800, dtype=np.int64)
                s = ((i * (3 + int(did) % 7) + int(did) * 11) % 65536 - 32768).astype(np.int16)
                rows.append({"image_id": str(did), "bytes": encode_wav(s, 16000)})
            yield pd.DataFrame(rows)

    wav = d.mapInPandas(make, schema="image_id string, bytes binary")
    out = audio_features(wav)
    return out.select(F.col("image_id").cast("long").alias("doc_id"),
                      "sample_rate", "n_samples", "duration_s",
                      "mean_amp", "sum_sq", "zero_crossings")


def q_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash with md5-derived bits (dedup.simhash_md5): the one hash
    both engines compute identically, so the per-bit majority votes and
    the packed 60-bit signature are exact-integer oracle-checked — the
    cross-engine witness for the SimHash family's vote/pack semantics
    (SURVEY §2 dedup row)."""
    return dedup.simhash_md5(_docs(spark, sf_dir))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counts (datapipe/textstats.py);
    the regex pattern text is shared verbatim with the oracle and stays
    inside the Java-regex ∩ RE2 dialect (no lookaheads)."""
    return textstats.token_counts(_docs(spark, sf_dir))


def q_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report (textstats.source_quality —
    quality_filter verdicts grouped by the source column): exact
    counts + one keep_rate division. The monitoring query a corpus
    pipeline runs per crawl snapshot."""
    return textstats.source_quality(_docs(spark, sf_dir))


def q_equalize_lut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-equalization LUT (stats.equalize_lut): per raw tile
    the full cumulative distribution of distinct values — exact
    counts/cumulative ranks plus cdf = cum/n (single division). The
    relational twin's ordered window must reproduce every rank."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return stats.equalize_lut(t)


def q_rgb_to_gray(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rec.601 luma collapse (bands.to_gray — ITU-R BT.601 weights):
    same complete-3-stack qualification as gap_fill/epoch_trend;
    (0.299·r + 0.587·g) + 0.114·b with shared expression text — raw
    doubles hash bit-identically."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and w = 16 and h = 16 and image_id < 'img000000001188'")
    return bands.to_gray(bands.stack_by_rank(t, 3))


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (the Catalyst gap-window
    primitive) certified against the relational lag → running-sum twin
    that event_sessions uses: both merge on gap <= 30 min (probed: an
    exactly-30-min gap merges on both) and report identical
    (first_us, last_us, counts) per session — last_us recovered as
    window.end − gap (Spark's end = last event + gap). One native
    aggregate, no window functions at all on the Spark side."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (ev.groupBy("user_id", sw.alias("sw"))
            .agg(F.count("*").alias("n_events"),
                 F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"))
            .select("user_id",
                    F.unix_micros("sw.start").alias("first_us"),
                    (F.unix_micros("sw.end") - F.lit(30 * 60_000_000)).alias("last_us"),
                    "n_events", "n_error"))


def q_terrain_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRI (Riley 1999) + TPI (Weiss 2001) over the halo lattice
    (terrain.terrain_indices — the remaining DEMProcessing modes):
    valid-neighbor semantics; squared-difference sums are exact
    dyadic, so the sqrt and the single division are CR with shared
    text — raw doubles hash bit-identically; n_nbr certifies the
    window population."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return terrain.terrain_indices(focal.lattice_remap(t, per_row=40))


def q_zonal_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT zonal quantiles via the quantized-domain histogram trick
    (stats.zonal_quantiles — no global sort, no per-zone collect):
    per-(zone, value) count partials from the broadcast-zones pass,
    one keyed merge, cumulative read-off with DuckDB quantile_cont's
    exact interpolation v[lo]·(1−f)+v[hi]·f — the oracle IS
    quantile_cont over the shared 48-zone rect lattice."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return stats.zonal_quantiles(t, _zone_lattice(spark))


def q_polygon_area_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shoelace area + centroid for EVERY fixture polygon — rect,
    convex AND concave (vecfn.area_centroid): the cross-term sums run
    through a sequential HOF fold on both engines (F.aggregate ≡
    list_reduce), so inexact products accumulate in the identical
    order and the doubles hash bit-for-bit."""
    return vecfn.area_centroid(load_polygons(spark, sf_dir))


def q_point_geodesics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance + initial bearing (vecfn.geodesic_sql —
    haversine + forward azimuth on the IUGG mean sphere, EXTENSION
    beyond the reference's planar Point.distance): the expression
    TEXT is shared verbatim between F.expr and the DuckDB oracle, so
    the only drift is last-ulp libm — absorbed by %.9e printf
    quantization (the aspect/hillshade rule). Pairs are the id-offset
    join point i ⋈ point i+2000 (id-range rule, no limit())."""
    p = load_points(spark, sf_dir)
    a = p.filter("point_id < 2000").select(
        F.col("point_id").alias("point_a"), F.col("x").alias("ax"),
        F.col("y").alias("ay"))
    b = p.filter("point_id >= 2000 and point_id < 4000").select(
        F.col("point_id").alias("point_b"), F.col("x").alias("bx"),
        F.col("y").alias("by"))
    j = a.join(b, a["point_a"] + 2000 == b["point_b"])
    dist, brg = vecfn.geodesic_sql("ax", "ay", "bx", "by")
    return j.select(
        "point_a", "point_b",
        F.format_string("%.9e", F.expr(dist)).alias("dist_q"),
        F.format_string("%.9e", F.expr(brg)).alias("bearing_q"))


def q_phash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IMAGE near-dup clustering: the phash band-LSH pair
    generator (q_phash_near_dups' planted-variant pool) feeds the SAME
    label-propagation operator that clusters text and embedding dups
    (dedup.dup_groups pairs= hook) → (doc_id = image id, group_id =
    component min id). Zero-padded ids make lexicographic min ≡
    numeric min; the oracle recomputes the components with the
    recursive-CTE closure over the same brute-forced pair set."""
    t = load_tiles(spark, sf_dir).select("image_id", "phash").withColumn(
        "i", F.expr("cast(substring(image_id, 4, 12) as bigint)"))
    mask = ("shiftleft(cast(1 as bigint), cast(i % 63 as int))"
            " | shiftleft(cast(1 as bigint), cast((i div 7) % 63 as int))"
            " | shiftleft(cast(1 as bigint), cast((i div 13) % 63 as int))")
    variants = t.filter("i % 10 = 0").select(
        F.concat("image_id", F.lit("~v")).alias("image_id"),
        F.expr(f"phash ^ ({mask})").alias("phash"))
    pool = t.select("image_id", "phash").unionByName(variants)
    pairs = dedup.hamming_band_pairs(pool, threshold=3, bands=4).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return dedup.dup_groups(None, pairs=pairs)


def q_integral_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summed-area table (stats.integral_image — Crow 1984, the O(1)
    box-filter primitive): per-pixel 2-D prefix sums of values (NaN as
    0) AND of the valid mask. Exact dyadic prefix sums ≡ the twin's
    two chained cumulative windows, bit-for-bit."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    return stats.integral_image(t)


def q_morph_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grayscale morphological OPENING (erosion ∘ dilation = focal min
    then focal max, 3×3 structuring element — the despeckle/shape
    filter; EXTENSION beyond the reference): TWO chained halo passes —
    the intermediate eroded tiles re-derive and re-exchange their edge
    strips, which is the composition story the halo family is built
    for (each pass: payload ≤ one exchange, map-only kernel).
    NaN-ignoring semantics at both levels (nodata-aware morphology);
    cells whose opened window is empty drop out on both engines.
    Per-pixel output vs a TWO-HOP relational twin (min-aggregate then
    max-aggregate over the same lattice offsets)."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300'")
    lat = focal.lattice_remap(t, per_row=40)
    opened = focal.focal_tiles(focal.focal_tiles(lat, 1, "min"), 1, "max")
    px = rm.pixels_of(opened)
    return px.filter(F.col("value").isNotNull() & ~F.isnan("value"))


def q_flow_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow accumulation (terrain.flow_accumulation — the
    hydrology workhorse): exact fixpoint over the strictly-descending
    D8 forest, one skinny equi-join + keyed sum per round with a
    monotone-Σ convergence test (longest-path rounds; measured 6 on
    this lattice). The oracle re-walks every cell's downstream path
    with a recursive CTE and counts arrivals — pure integers."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300' and w = 16 and h = 16")
    return terrain.flow_accumulation(focal.lattice_remap(t, per_row=40))


def q_watersheds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watershed delineation (terrain.watersheds — every cell labeled
    by its terminal D8 sink via POINTER DOUBLING: one skinny self-join
    per round, ⌈log₂(path)⌉ rounds, changed-pointer fixpoint test).
    The oracle walks every cell's path with a recursive CTE and keeps
    the terminal — pure integer keys."""
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300' and w = 16 and h = 16")
    return terrain.watersheds(focal.lattice_remap(t, per_row=40))


def q_cost_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-distance surface (operators/costdist.cost_distance — the
    ESRI CostDistance shape): ≤8-hop Bellman-Ford relaxation to the
    nearest low-cost source over the 8-neighbor lattice graph,
    ENTIRELY DataFrame ops (skinny-key joins + keyed mins + least;
    NULL = unreached, skipped identically by both engines' least/min).
    The oracle unrolls the SAME 8 rounds as nested CTEs; candidate
    distances are built by identical expression chains, so every min
    compares identical doubles. The contract is the K-BOUNDED
    distance (the oracle unrolls the same K — equality holds whether
    or not K reaches the diameter); pytest asserts true convergence
    for a denser-source configuration and monotone reach for this
    sparse one."""
    from rasters_spark.operators import costdist
    t = load_tiles(spark, sf_dir).filter(
        "fmt = 'raw' and image_id < 'img000000000300' and w = 16 and h = 16")
    return costdist.cost_distance(t, 8.0, 8)


def q_stream_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cohort retention (streaming.
    stream_cohort_available_now): per-batch distinct (user, day)
    activity partials exactly-once to the ledger; the final reduce
    dedups across batches and recomputes cohorts — pure integers,
    EXACTLY the batch answer, oracle = cohort_retention's SQL."""
    import os
    import shutil
    import tempfile

    from rasters_spark.streaming import stream_cohort_available_now
    from rasters_spark.tableio import TableIO

    work = os.path.join(tempfile.gettempdir(),
                        f"stream-cohort-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "in")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(3) \
        .write.mode("overwrite").parquet(src)
    tbl = TableIO(os.path.join(work, "tbl"))
    return stream_cohort_available_now(spark, src, tbl, os.path.join(work, "ckpt"))


def q_zonal_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority value per zone (stats.zonal_mode — the categorical
    zonal statistic over the shared per-(zone,value) count partials):
    highest count, ties → smallest value (total-order rule); the
    oracle ranks the same relational histogram."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return stats.zonal_mode(t, _zone_lattice(spark))


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch incremental sessionization (streaming.
    stream_sessionize_available_now): the event log split into 3
    strictly TIME-ORDERED files (ascending mtimes force batch order);
    each batch sessionizes locally and merges with the state table's
    open sessions (TableIO replace snapshots, replay-idempotent via
    completed_chunks) — sessions spanning batch boundaries merge
    link-by-link, so the final state EXACTLY equals the one-shot
    sessionize and the oracle is event_sessions' SQL verbatim."""
    import os
    import shutil
    import tempfile

    from rasters_spark.streaming import stream_sessionize_available_now
    from rasters_spark.tableio import TableIO

    work = os.path.join(tempfile.gettempdir(),
                        f"stream-sess-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    src = os.path.join(work, "in")
    os.makedirs(src)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    import datetime as _dt
    span = (hi - lo) / 3
    cuts = [lo + span, lo + span + span]
    parts = [ev.filter(F.col("ts") < cuts[0]),
             ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
             ev.filter(F.col("ts") >= cuts[1])]
    for k, part in enumerate(parts):
        tmp = os.path.join(work, f"tmp{k}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        pf = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"{k:02d}.parquet")
        shutil.move(os.path.join(tmp, pf), dst)
        os.utime(dst, (1700000000 + k * 3600, 1700000000 + k * 3600))
    tbl = TableIO(os.path.join(work, "tbl"))
    return stream_sessionize_available_now(
        spark, src, tbl, os.path.join(work, "ckpt"), 30)


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gating cascade (textstats.quality_filter — the
    Gopher/C4-style rule stack, Rae 2021 table A1): first failing
    rule wins (too_short → repetitive → top_heavy), thresholds chosen
    to split the fixture corpus (min_tokens 16, dup_frac 0.05,
    top_frac 0.1). Signals are exact-int counts and single divisions,
    so verdict booleans and reason codes hash identically."""
    return textstats.quality_filter(_docs(spark, sf_dir))


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (textstats.doc_repetition —
    Rae et al. 2021 §A1.1): per-doc word-bigram totals, distinct
    count, top-gram count, and the duplicate/top fractions used to
    filter repetitive text. Scan-side explode → two combiner-friendly
    keyed aggs; fractions are single divisions of exact int64 counts,
    so the doubles hash identically against the DuckDB lead()-window
    twin (shared whitespace tokenization with doc_stats)."""
    return textstats.doc_repetition(_docs(spark, sf_dir), 2)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination by 4-gram overlap (textstats.
    decontaminate — GPT-3 appendix-C / Dolma protocol; 4-grams here
    because the synthetic docs are short, production uses 13-grams —
    same plan shape): eval set = doc_id % 10 = 0 (id-range rule, no
    limit()), train = the rest;
    contaminated train docs report distinct shared grams + covered
    instances. Grams join on md5 digests (equal strings → equal
    digests on both engines); explode → distinct → ONE hash join →
    keyed agg, nothing driver-side."""
    d = _docs(spark, sf_dir)
    return textstats.decontaminate(
        d.filter("doc_id % 10 != 0"), d.filter("doc_id % 10 = 0"), 4)


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.doc_stats(_docs(spark, sf_dir))


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.langid(_docs(spark, sf_dir))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprint(_docs(spark, sf_dir))


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (Jégou et al. 2011): fit 16×256 L2
    codebooks, encode the corpus to 16-byte codes (16× compression),
    ADC top-k via per-query lookup tables. Rows-only: the codebook
    means are float k-means with no SQL twin (CLAUDE.md float-sum
    rule); recall-vs-budget monotonicity and bit-determinism are
    pinned in tests/test_datapipe.py."""
    e = _emb(spark, sf_dir)
    books = similarity.pq_fit(e, m=16, k=256, iters=3)
    codes = similarity.pq_encode(e, books)
    return similarity.pq_topk(codes, e.filter("vec_id < 10"), books, k=5)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return similarity.cosine_topk(e, e.filter("vec_id < 20"), k=5)


def q_lsh_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN variant (rows-only: approximate by construction; recall vs
    the exact brute force is asserted in tests)."""
    e = _emb(spark, sf_dir)
    return similarity.lsh_cosine_topk(e, e.filter("vec_id < 20"), k=5)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: spherical-k-means coarse quantizer (deterministic
    id-prefix init, fixed Lloyd rounds) → probe nprobe/nlist of the
    corpus per query, exact cosine within. Rows-only: the centroid
    means are float sums whose accumulation order differs across
    engines (CLAUDE.md oracle rule — never oracle a float SUM over
    inexact products); recall ≥0.7 vs the exact brute force and full
    determinism are asserted in tests/test_datapipe.py instead."""
    e = _emb(spark, sf_dir)
    return similarity.ivf_cosine_topk(e, e.filter("vec_id < 20"), k=5,
                                      nlist=16, nprobe=4, iters=3)


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs at cos ≥ 0.999 via BANDED
    sign-LSH (4 bands × 12 planes) + exact verify, over the embeddings
    table with planted exact-duplicate copies of vec_id < 50 (relabeled
    +1,000,000) — identical vectors agree on every band, so recall is
    provably complete and the brute-force oracle is an equality check."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    copies = e.filter("vec_id < 50").select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    pool = e.unionByName(copies)
    return similarity.embedding_near_dup_pairs(
        pool, threshold=0.999, bands=4, planes_per_band=12)


def q_embedding_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS in vector space: connected components
    over the banded-LSH embedding pair graph (pairs exact-verified at
    cos ≥ 0.999, so the clusters are exact too). Reuses dup_groups'
    min-label propagation with the embedding pair source — closing the
    dedup family loop: every pair generator (minhash / phash /
    embedding) now feeds the same clustering operator. Oracle: the
    brute-force pair set + a recursive-CTE fixpoint in DuckDB."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    copies = e.filter("vec_id < 50").select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    pool = e.unionByName(copies)
    pairs = similarity.embedding_near_dup_pairs(
        pool, threshold=0.999, bands=4, planes_per_band=12
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return dedup.dup_groups(None, pairs=pairs).select(
        F.col("doc_id").alias("vec_id"), "group_id")


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction; oracle checks the recomputed phash
    against the INDEPENDENTLY stored fixture column plus exact means
    from the pixels table (raw tiles)."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    f = multimodal.extract_features(t)
    return f.select("image_id", "n_bytes", "width", "height", "phash", "mean")


def q_local_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both reference UTM zone formulas side by side (they disagree on
    purpose — SURVEY §1.3(6)) + AEQD proj4, on events-derived lon/lat."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    x = F.col("value") - F.floor(F.col("value") / 360.0) * 360.0 - 180.0
    y = (F.col("user_id") % 180).cast("double") - 90.0 + 0.5
    d = ev.select("event_id", x.alias("lon"), y.alias("lat"))
    return d.select(
        "event_id",
        crsfn.local_utm_proj4("lat", "lon").alias("utm_proj4"),
        crsfn.local_utm_epsg("lat", "lon").alias("utm_epsg"),
        # %.3f formatting: double→string rendering is engine-specific
        # (Java scientific notation vs DuckDB decimal) — C-style printf
        # is portable; the API function (center_aeqd_proj4) keeps the
        # reference's raw float repr for users
        F.format_string("+proj=aeqd +lat_0=%.3f +lon_0=%.3f", F.col("lat"), F.col("lon")).alias("aeqd_proj4"),
    )


def q_transform_cyl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cylindrical CRS families under a FULL DuckDB oracle — the
    first oracle-green `transform_xy` entry (`reproject_utm` stays
    rows-only because Snyder TM is a long series, but Mercator /
    cylindrical-equal-area / equidistant-cylindrical are short closed
    forms both engines can spell identically). Events-derived lon/lat
    (the `local_utm` derivation, reference transform_xy.py:5-54
    surface), each point exploded to three targets: EPSG:3395 (World
    Mercator, Snyder eq. 7-6/7-7), EPSG:6933 (EASE-Grid 2.0 global,
    eq. 10-1/10-2) and EPSG:4087 (equidistant cylindrical, EPSG method
    1028 / eq. 3-21 meridian series). Coordinates are %.9e-printf-
    quantized on BOTH engines (the CLAUDE.md sin/exp oracle rule:
    Java format_string ≡ C printf for doubles, absorbing libm last-ulp
    drift while pinning 9 significant digits; outputs stay in metre
    magnitude — no near-zero cancellation). The oracle SQL inlines the
    ellipsoid-derived constants computed by the SAME Python
    expressions the kernel parser uses, so only per-row libm calls
    can drift. Explode is on the streamed scan side; the transform is
    one Arrow kernel pass grouped per (src,dst) pair — map-only, zero
    exchanges at any scale."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lon = F.col("value") - F.floor(F.col("value") / 360.0) * 360.0 - 180.0
    lat = (F.col("user_id") % 180).cast("double") - 90.0 + 0.5
    d = ev.select(
        "event_id", lon.alias("lon"), lat.alias("lat"),
        F.lit("EPSG:4326").alias("src"),
        F.explode(F.array(F.lit("EPSG:3395"), F.lit("EPSG:6933"),
                          F.lit("EPSG:4087"))).alias("dst"))
    t = crsfn.transform_xy(d, x="lon", y="lat", src="src", dst="dst")
    return t.select(
        "event_id", "dst",
        F.format_string("%.9e", F.col("x_t")).alias("x_q"),
        F.format_string("%.9e", F.col("y_t")).alias("y_q"))


def _transform_cyl_sql() -> str:
    """DuckDB twin of q_transform_cyl: same formulas, constants inlined
    from the same Python expressions the kernel's _parse_crs uses
    (bit-identical parse-time doubles), %.9e quantization."""
    import numpy as np

    _a, _e2 = crsfn._ELLPS["WGS84"]

    def dbl(v: float) -> str:
        # DuckDB types bare decimal literals as DECIMAL (a 19-digit
        # repr overflows DECIMAL multiplication) — force DOUBLE
        return f"cast({v!r} as double)"

    a, e2 = dbl(_a), dbl(_e2)
    e = dbl(float(np.sqrt(_e2)))
    k0cea = dbl(float(crsfn._ell_m(np.radians(30.0), _e2)))
    one_m_e2 = dbl(1 - _e2)
    c0 = dbl(1 - _e2 / 4 - 3 * _e2**2 / 64 - 5 * _e2**3 / 256)
    c2 = dbl(3 * _e2 / 8 + 3 * _e2**2 / 32 + 45 * _e2**3 / 1024)
    c4 = dbl(15 * _e2**2 / 256 + 45 * _e2**3 / 1024)
    c6 = dbl(35 * _e2**3 / 3072)
    return f"""
        with pts as (
          select event_id,
                 value - floor(value / 360.0) * 360.0 - 180.0 as lon,
                 cast(user_id % 180 as double) - 90.0 + 0.5 as lat
          from events
        ), g as (
          select event_id, radians(lon) as dlam, radians(lat) as phi,
                 sin(radians(lat)) as s
          from pts
        )
        select event_id, 'EPSG:3395' as dst,
               printf('%.9e', {a} * dlam) as x_q,
               printf('%.9e', -{a} * ln(tan(pi()/4 - phi/2)
                 / pow((1 - {e}*s)/(1 + {e}*s), {e}/2))) as y_q
        from g
        union all
        select event_id, 'EPSG:6933' as dst,
               printf('%.9e', {a} * {k0cea} * dlam) as x_q,
               printf('%.9e', {a} * ({one_m_e2} * (s/(1 - {e2}*s*s)
                 - (1/(2*{e})) * ln((1 - {e}*s)/(1 + {e}*s))))
                 / (2 * {k0cea})) as y_q
        from g
        union all
        select event_id, 'EPSG:4087' as dst,
               printf('%.9e', {a} * dlam) as x_q,
               printf('%.9e', {a} * ({c0}*phi - {c2}*sin(2*phi)
                 + {c4}*sin(4*phi) - {c6}*sin(6*phi))) as y_q
        from g
    """


def q_table_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Iceberg-maintenance seam end-to-end under a FULL row-level
    oracle: documents ingested as 5 chunked append snapshots (each
    repartition(4) → 20 small parquet files — the streaming small-files
    problem in miniature), then ``TableIO.compact`` bin-packs the live
    set into one ``replace`` snapshot (the ``rewrite_data_files``
    analogue) and ``expire_snapshots(keep_last=1)`` physically deletes
    the 20 pre-compaction files (``expireSnapshots``). Rows are read
    back AFTER both maintenance ops — a hash match against
    ``select doc_id, n_chars, lang from documents`` proves compaction
    and expiration preserve row-level content exactly. File-count,
    horizon, idempotence and the typed time-travel error are pinned in
    tests/test_tableio_streaming.py."""
    import os
    import shutil
    import tempfile

    from rasters_spark.tableio import TableIO

    work = os.path.join(tempfile.gettempdir(),
                        f"compact-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(work, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tbl = TableIO(os.path.join(work, "tbl"))
    for i in range(5):
        tbl.write(docs.filter(F.col("doc_id") % 5 == i).repartition(4),
                  job_id="chunked-ingest", chunk_id=f"c{i}")
    n_small = len(tbl._live_files(tbl.snapshots()))
    entry = tbl.compact(spark)
    assert entry is not None and entry["rewritten_files"] == n_small
    tbl.expire_snapshots(keep_last=1)
    return tbl.read(spark).select("doc_id", "n_chars", "lang")


def q_spatial_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked spatial train/val split (datapipe/split.py): every tile
    of a 1°-block shares a split, blocks go to val iff
    md5(block‖salt)/2⁶⁰ < 0.2 — deterministic, map-only, no rand(),
    no spatial leakage across the split boundary. Oracle: the
    identical md5-prefix arithmetic in DuckDB (the simhash_md5
    cross-engine hash pattern)."""
    return split.spatial_split(load_tiles(spark, sf_dir)).select(
        "image_id", "block_x", "block_y", "split")


def q_stratified_cell_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell balanced sampling (split.cap_per_group): at most 3
    tiles per coverage cell, chosen as the smallest md5(image_id‖salt)
    values with the id itself as the total-order tie-break — the
    skew-flattening primitive for web-scraped imagery (hot cells are
    capped at n BY CONSTRUCTION, so output skew cannot exist). One
    window over the exploded cell assignment; oracle repeats the same
    row_number() in DuckDB over the shared cell CTE."""
    t = tiles_with_cells(load_tiles(spark, sf_dir))
    return split.cap_per_group(t, "cell_id", 3).select("cell_id", "image_id")


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-threshold sampling (split.hash_sample): keep
    a document iff md5(doc_id‖salt)/2⁶⁰ < 0.1 — reproducible across
    engines/retries and NESTED (the 5% sample is a subset of this 10%
    one under the same salt), unlike df.sample(). The subset property
    is pinned in tests; the oracle recomputes the same threshold."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return split.hash_sample(docs, 0.1, key="doc_id").select("doc_id", "lang")


def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard packing (datapipe/shards.py): every
    document joins shard ``exclusive_prefix // target`` in the global
    md5(doc_id‖salt) order — the webdataset-style shard assignment a
    100-TB training build writes files from. The Spark side is the
    scale-correct TWO-PHASE distributed prefix sum (fixed md5-range
    buckets → P-row totals aggregate → per-bucket cumsum + driver
    offsets), NOT a global unpartitioned window (one task at any
    scale); the oracle IS that global window —
    ``sum(n_chars) over (order by hkey, doc_id rows between unbounded
    preceding and 1 preceding) // target`` — so a hash match proves the
    distributed decomposition reproduces the sequential semantics
    exactly (pure int64 arithmetic, no float anywhere)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shards.pack_shards(docs, 4096).select("doc_id", "n_chars", "shard_id")


def _zone_lattice(spark: SparkSession) -> DataFrame:
    """48 rect zones tiling the fixture's tile band (lon −180+⅓ step
    30 × lat 45+⅓ step 9): the ⅓ offsets keep every zone edge off the
    dyadic pixel-centroid lattice so the half-open bbox rule and the
    ray-cast kernel cannot disagree on a boundary. The identical
    bounds are regenerated in the oracle from the same expressions."""
    z = spark.range(48).select(
        F.col("id").alias("poly_id"),
        (F.lit(-180.0) + (F.col("id") % 12) * 30.0 + F.lit(1.0) / 3.0).alias("xmin"),
        (F.lit(45.0) + (F.col("id") / 12).cast("long") * 9.0 + F.lit(1.0) / 3.0).alias("ymin"),
    ).withColumn("xmax", F.col("xmin") + 30.0).withColumn("ymax", F.col("ymin") + 9.0)
    pt = lambda xc, yc: F.struct(F.col(xc).alias("x"), F.col(yc).alias("y"))  # noqa: E731
    return z.withColumn("ring", F.array(
        pt("xmin", "ymin"), pt("xmax", "ymin"), pt("xmax", "ymax"),
        pt("xmin", "ymax"), pt("xmin", "ymin"))).withColumn("is_rect", F.lit(True))


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics (stats.zonal_stats): per-zone
    (n_valid, vsum, vmin, vmax, vmean) over finite pixel CENTROIDS
    inside each zone — mask-then-reduce fused into one Arrow pass.
    Payload-free cell join → zones folded per tile → bytes cross ONE
    equi-join → 4-double partials → one groupBy(poly_id). Exact-sum
    oracle on fmt='raw' quarter-integer pixels over the shared
    48-zone rect lattice."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return stats.zonal_stats(t, _zone_lattice(spark)).select(
        "poly_id", "n_valid", "vsum", "vmin", "vmax", "vmean")


def q_pixel_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster→vector: every valid pixel as a value-attached point.
    Deterministic 200-tile slice (id-range filter, not limit — limit
    order is not a contract)."""
    t = load_tiles(spark, sf_dir).filter("image_id < 'img000000000200'")
    return vecfn.pixel_centroids(t)


def q_latlon_matrices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """latlon_matrices with the out-of-range→NaN guards. The id-range
    slice includes tile 359 (x_origin 179.022 → centroids past 180°E)
    so the lon guard actually FIRES, not merely exists."""
    t = load_tiles(spark, sf_dir).filter(
        "image_id >= 'img000000000340' and image_id < 'img000000000420'")
    return vecfn.latlon_matrices(t)


def q_tile_unique_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile exact distinct-value count + the reference's <10
    few-values rendering flag."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return stats.tile_unique_values(t)


def q_bbox_accessors(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir)
    bb = F.col("bbox")
    return t.select(
        "image_id",
        vecfn.bbox_width(bb).alias("width"),
        vecfn.bbox_height(bb).alias("height"),
        vecfn.bbox_centroid_x(bb).alias("cx"),
        vecfn.bbox_centroid_y(bb).alias("cy"),
        vecfn.bbox_buffer(bb, 0.5)["xmin"].alias("buf_xmin"),
        vecfn.bbox_round(bb, 1)["ymax"].alias("round_ymax"),
    )


SWATH_TARGET = dict(x_origin=-120.0, y_origin=40.0, cell_width=0.1, cell_height=-0.1,
                    rows=10, cols=10, crs="EPSG:4326")


def _swath(spark: SparkSession) -> DataFrame:
    """Deterministic 50×50 meshgrid swath (FIXTURES.md §5) — generated
    by identical closed-form SQL on both engines."""
    r = spark.range(50).select(F.col("id").alias("row"))
    c = spark.range(50).select(F.col("id").alias("col"))
    return r.crossJoin(c).select(
        F.lit(0).cast("long").alias("swath_id"), "row", "col",
        (-120.0 + F.col("col") / 49.0).alias("x"),
        (40.0 - F.col("row") / 49.0).alias("y"),
        ((F.col("row") * 50 + F.col("col")).cast("double") * 0.25).alias("value"),
    )


_SWATH_SQL = """
    select cast(0 as bigint) as swath_id, r.row, c.col,
           -120.0 + c.col / 49.0 as x,
           40.0 - r.row / 49.0 as y,
           cast(r.row * 50 + c.col as double) * 0.25 as value
    from range(50) r(row), range(50) c(col)
"""


def q_swath_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return swathops.swath_window(_swath(spark), -119.7, 39.3, -119.3, 39.7, buffer=2)


def q_swath_to_grid_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return swathops.swath_to_grid_nn(_swath(spark), SWATH_TARGET)


def q_to_grid_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return resample.to_grid_bilinear(t, RASTERIZE_TARGET)


def q_to_grid_cubic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_grid(resampling='cubic') — Keys bicubic (a=-0.5), 16 taps
    sliced JVM-side; the SQL blend text is SHARED with the oracle."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return resample.to_grid_conv(t, RASTERIZE_TARGET, "cubic")


def q_to_grid_cubicspline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_grid(resampling='cubic_spline') — cubic B-spline smoothing."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return resample.to_grid_conv(t, RASTERIZE_TARGET, "cubic_spline")


def _quantize_conv_py(out: DataFrame) -> DataFrame:
    """%.9e quantization for the sin/exp kernels (VERDICT r04 #2): the
    engines' libm differ in the last ulp, so BOTH sides hash the
    9-significant-digit printf rendering instead of the raw double
    (CLAUDE.md: printf for float→string). Java's %e and C's %e agree
    on format (d.dddddddddE±xx, sign-preserving); the remaining
    mismatch window is a value within ~1 ulp of a 10th-digit rounding
    boundary — not observed on the fixture (and the raw doubles stay
    npref-pinned in tests/test_resample_kernels.py)."""
    return out.select(
        "image_id", "trow", "tcol",
        F.when(F.col("value").isNotNull(),
               F.format_string("%.9e", F.col("value"))).alias("value_q"))


def q_to_grid_lanczos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_grid(resampling='lanczos') — a=3 windowed sinc, 6×6 taps,
    weight-sum normalized; value printf-quantized (%.9e) on both
    engines so the sin() ulp drift is absorbed and the full kernel
    (window/taps/weights/accumulation order) is oracle-certified."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return _quantize_conv_py(resample.to_grid_conv_py(t, RASTERIZE_TARGET, "lanczos"))


def q_to_grid_gauss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_grid(resampling='gauss') — σ=1 gaussian, 4×4 taps; value
    printf-quantized (%.9e) on both engines (exp() ulp absorbed)."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return _quantize_conv_py(resample.to_grid_conv_py(t, RASTERIZE_TARGET, "gauss"))


def _q_to_grid_stat(stat: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
        return resample.to_grid_stat(t, RASTERIZE_TARGET, stat)
    q.__name__ = f"q_to_grid_{stat}"
    q.__doc__ = (f"to_grid(resampling='{stat}') — aggregation-family kernel "
                 "(constants.py:13-28): source pixels binned per containing "
                 "target cell, per-(tile,cell) statistic.")
    return q


q_to_grid_max = _q_to_grid_stat("max")
q_to_grid_min = _q_to_grid_stat("min")
q_to_grid_med = _q_to_grid_stat("med")
q_to_grid_q1 = _q_to_grid_stat("q1")
q_to_grid_q3 = _q_to_grid_stat("q3")
q_to_grid_mode = _q_to_grid_stat("mode")
q_to_grid_sum = _q_to_grid_stat("sum")


def _swath_north(spark: SparkSession) -> DataFrame:
    """50×50 target swath INSIDE fixture tile img…031's footprint
    (x∈[-148.970,-147.970], y∈[79,80] — the jitter formula of
    FIXTURES.md §1), so grid→swath sampling has real matches at every
    scale."""
    r = spark.range(50).select(F.col("id").alias("row"))
    c = spark.range(50).select(F.col("id").alias("col"))
    return r.crossJoin(c).select(
        F.lit(0).cast("long").alias("swath_id"), "row", "col",
        (-148.9 + F.col("col") / 49.0 * 0.8).alias("x"),
        (79.9 - F.col("row") / 49.0 * 0.8).alias("y"),
    )


_SWATH_NORTH_SQL = """
    select cast(0 as bigint) as swath_id, r.row, c.col,
           -148.9 + c.col / 49.0 * 0.8 as x,
           79.9 - r.row / 49.0 * 0.8 as y
    from range(50) r(row), range(50) c(col)
"""


def q_to_geolocation_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster.to_geolocation — grid→swath NN sampling (the reverse
    direction of swath_to_grid_nn, closing the resample dispatch
    matrix). Point-in-tile join with a 50×50 swath positioned over
    fixture tile coverage as the point side; full SQL oracle (cell
    math on both sides)."""
    t = load_tiles(spark, sf_dir)
    return swathops.grid_to_geolocation_nn(t, _swath_north(spark))


def q_cell_size_meters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cell_size (MIN of cw/|ch|, raster_geometry.py:667-668) and the
    cell_size_meters quirk (deg/180×40,075,017 — 2× physical,
    raster_geometry.py:683-693) + the default KD-tree radius factor
    (2.0×, kdtree.py:27) per tile."""
    t = load_tiles(spark, sf_dir)
    g = F.col("grid")
    csm = grid.cell_size_meters(g)
    return t.select(
        "image_id",
        grid.cell_size(g).alias("cell_size"),
        csm.alias("cell_size_m"),
        (F.lit(2.0) * csm).alias("radius_m"),
    )


def q_resize_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster.resize order-1 (raster.py:1262-1281) in relational long
    form: 8×8 thumbnail of each raw tile, 4 taps JVM-sliced, shared
    blend text with the oracle. Deterministic 200-tile id-range slice."""
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw' and image_id < 'img000000000200'")
    return multimodal.resize_bilinear_long(t, 8, 8)


def q_swath_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RasterGeolocation.resize to 75×80 at spline order 2 (rows-only:
    the prefiltered quadratic spline has no SQL twin; interpolation/
    identity/antimeridian behavior pinned by tests/test_spline.py)."""
    return swathops.swath_resize(_swath(spark).drop("value"), 75, 80, order=2)


def q_neighbour_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neighbors.neighbour_distances(_swath(spark).drop("value"))


def q_swath_cell_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    return neighbors.swath_cell_size(_swath(spark).drop("value"))


def q_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir).filter("fmt = 'raw'")
    return bands.band_stats(bands.with_bands(t, 3))


def q_boundary_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tiles(spark, sf_dir).filter("image_id < 'img000000000050'")
    ring = neighbors.boundary_ring(F.col("grid"))
    return (
        t.select("image_id", F.posexplode(ring).alias("pos", "pt"))
        .select("image_id", "pos", F.col("pt.row").alias("row"), F.col("pt.col").alias("col"))
    )


def q_snap_grids(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys = load_polygons(spark, sf_dir).filter("is_rect")
    bb = grid.bbox_struct("xmin", "ymin", "xmax", "ymax")
    g = grid.geographic_grid_from_bbox(bb, 0.5)
    return polys.select(
        "poly_id", g["x_origin"].alias("x_origin"), g["y_origin"].alias("y_origin"),
        g["rows"].alias("rows"), g["cols"].alias("cols"),
    )


def q_gpkg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VectorGeometry → GeoPackage → parse back (functions/geopackage.py,
    stdlib-sqlite3 OGC 1.2 container + WKB). Each Arrow batch encodes
    its polygons into a complete in-memory .gpkg, decodes it, and emits
    per-feature facts recomputed FROM THE DECODED BYTES (vertex count,
    first-vertex coords, ring bbox, attribute round-trip) — the oracle
    recomputes them from the polygons table, so a hash match proves the
    container encode AND decode are real."""
    import pandas as pd

    from rasters_spark.functions import geopackage as gpkg

    polys = load_polygons(spark, sf_dir).select("poly_id", "ring", "burn_value")
    schema = ("poly_id long, n_points int, x0 double, y0 double, "
              "rxmin double, rymax double, burn_value double")

    def run(batches):
        for pdf in batches:
            feats = [{"wkb": gpkg.polygon_wkb([[(p["x"], p["y"]) for p in r.ring]]),
                      "poly_id": int(r.poly_id), "burn_value": float(r.burn_value)}
                     for r in pdf.itertuples(index=False)]
            if not feats:
                yield pd.DataFrame({k: [] for k in
                                    ["poly_id", "n_points", "x0", "y0",
                                     "rxmin", "rymax", "burn_value"]})
                continue
            blob = gpkg.encode_gpkg("polys", "POLYGON", feats,
                                    [("poly_id", "INTEGER"), ("burn_value", "REAL")])
            rows = []
            for f in gpkg.decode_gpkg(blob)["polys"]:
                kind, rings = f["geom"]
                assert kind == "Polygon"
                xs = [p[0] for p in rings[0]]
                ys = [p[1] for p in rings[0]]
                rows.append({
                    "poly_id": f["poly_id"], "n_points": len(rings[0]),
                    "x0": rings[0][0][0], "y0": rings[0][0][1],
                    "rxmin": min(xs), "rymax": max(ys),
                    "burn_value": f["burn_value"],
                })
            yield pd.DataFrame(rows)

    return polys.mapInPandas(run, schema=schema)


def q_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_geojpeg's codec under the gate: per raw tile, stretch to a
    gray image, encode with the pure-numpy T.81 codec, decode the bytes
    back, and emit dims + the BASELINE lossy invariant (PSNR ≥ 40 dB)
    as a recomputed boolean. The oracle pins dims and asserts the gate
    held for every row — a hash match proves the encode AND decode ran
    and met the fidelity contract (exact pixel equality is impossible
    for a lossy codec by design, so the CONTRACT is the oracle)."""
    import pandas as pd

    from rasters_spark import codec
    from rasters_spark.functions import jpeg as jpeglib

    t = load_tiles(spark, sf_dir).filter("fmt = 'raw' and image_id < 'img000000000200'")
    schema = "image_id string, width int, height int, psnr_ge_40 boolean"

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode_tile(r.bytes, int(r.w), int(r.h), r.fmt)
                lo, hi = np.nanmin(arr), np.nanmax(arr)
                span = (hi - lo) or 1.0
                img = np.clip(np.rint(np.nan_to_num((arr - lo) / span, nan=0.0) * 255),
                              0, 255).astype(np.uint8)
                back = jpeglib.decode_jpeg(jpeglib.encode_jpeg(img, quality=95))
                rows.append({
                    "image_id": r.image_id,
                    "width": int(back.shape[1]), "height": int(back.shape[0]),
                    "psnr_ge_40": bool(jpeglib.psnr(img, back) >= 40.0),
                })
            yield pd.DataFrame(rows)

    return t.mapInPandas(run, schema=schema)


def q_gpkg_tiles_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster.to_geopackage (raster.py:1715-1741) as a tiles-type OGC
    container: render each raw tile to PNG, write a one-tile GeoPackage
    pyramid (zoom 0, 1×1 matrix, bbox from the grid), decode the
    container back. Oracle pins the bbox doubles (exact grid arithmetic,
    same order both engines) and the lossless png_exact/meta_ok flags —
    a hash match certifies the sqlite container + tile-matrix metadata +
    PNG payload all survived the round trip."""
    import pandas as pd

    from rasters_spark.functions import geopackage as gpkg

    t = load_tiles(spark, sf_dir).filter("fmt = 'raw' and image_id < 'img000000000100'")
    schema = ("image_id string, xmin double, ymin double, xmax double, ymax double, "
              "meta_ok boolean, png_exact boolean")

    def run(batches):
        import numpy as np

        from rasters_spark import codec
        from rasters_spark.functions.render import encode_png

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode_tile(r.bytes, int(r.w), int(r.h), r.fmt)
                lo, hi = np.nanmin(arr), np.nanmax(arr)
                span = (hi - lo) or 1.0
                img = np.clip(np.rint(np.nan_to_num((arr - lo) / span, nan=0.0) * 255),
                              0, 255).astype(np.uint8)
                png = encode_png(img)
                xmin, ymax = r.x_origin, r.y_origin
                xmax = r.x_origin + r.cell_width * int(r.w)
                ymin = r.y_origin + r.cell_height * int(r.h)
                blob = gpkg.encode_gpkg_tiles(
                    "tiles", [{"tile_column": 0, "tile_row": 0, "png": png}],
                    (xmin, ymin, xmax, ymax), zoom=0, matrix_w=1, matrix_h=1,
                    tile_w=int(r.w), tile_h=int(r.h),
                    pixel_x=abs(r.cell_width), pixel_y=abs(r.cell_height))
                back = gpkg.decode_gpkg_tiles(blob)
                rows.append({
                    "image_id": r.image_id,
                    "xmin": back["bbox"][0], "ymin": back["bbox"][1],
                    "xmax": back["bbox"][2], "ymax": back["bbox"][3],
                    "meta_ok": bool(back["zoom"] == 0 and back["matrix"] == (1, 1)
                                    and back["tile_size"] == (int(r.w), int(r.h))),
                    "png_exact": bool(len(back["tiles"]) == 1
                                      and bytes(back["tiles"][0]["png"]) == png),
                })
            yield pd.DataFrame(rows)

    return t.mapInPandas(run, schema=schema)


def q_geotiff_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster.to_geotiff → decode back (functions/geotiff.py, pure-python
    TIFF 6.0 + GeoTIFF 1.1 subset). Output carries the deterministic
    byte length (298 + 4wh), the re-parsed georeferencing (bit-exact
    double round-trip through the tags) and the exact finite-pixel sum
    of the DECODED array — the oracle recomputes all of it from the
    tiles+pixels tables, so a hash match proves the encode AND decode
    are real."""
    import pandas as pd

    from rasters_spark import codec
    from rasters_spark.functions import geotiff

    t = load_tiles(spark, sf_dir).filter("fmt = 'raw' and image_id < 'img000000000200'")
    schema = ("image_id string, n_bytes long, width int, height int, "
              "x_origin double, y_origin double, cell_width double, cell_height double, "
              "epsg int, vsum double")

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode_tile(r.bytes, int(r.w), int(r.h), r.fmt)
                blob = geotiff.encode_geotiff(arr, r.x_origin, r.y_origin,
                                              r.cell_width, r.cell_height)
                back, meta = geotiff.decode_geotiff(blob)
                v = back.astype(np.float64)
                rows.append({
                    "image_id": r.image_id, "n_bytes": len(blob),
                    "width": back.shape[1], "height": back.shape[0],
                    "x_origin": meta["x_origin"], "y_origin": meta["y_origin"],
                    "cell_width": meta["cell_width"], "cell_height": meta["cell_height"],
                    "epsg": meta["epsg"],
                    "vsum": float(v[np.isfinite(v)].sum()),
                })
            yield pd.DataFrame(rows)

    cols = ["image_id", "bytes", "w", "h", "fmt",
            "x_origin", "y_origin", "cell_width", "cell_height"]
    return t.select(*cols).mapInPandas(run, schema=schema)


def q_cog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster.to_COG → decode back (tiled GeoTIFF, IFDs at the head,
    internal 2× overviews). Fixture tiles fit one 256² tile at one
    level, so the layout is a DETERMINISTIC 286 + 4·256² bytes, which
    the oracle recomputes along with the re-parsed georeferencing and
    exact pixel sums of the decoded full-res level."""
    import numpy as np
    import pandas as pd

    from rasters_spark import codec
    from rasters_spark.functions import geotiff

    t = load_tiles(spark, sf_dir).filter("fmt = 'raw' and image_id < 'img000000000200'")
    schema = ("image_id string, n_bytes long, n_levels int, width int, height int, "
              "x_origin double, y_origin double, vsum double")

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode_tile(r.bytes, int(r.w), int(r.h), r.fmt)
                blob = geotiff.encode_cog(arr, r.x_origin, r.y_origin,
                                          r.cell_width, r.cell_height)
                levels = geotiff.decode_cog(blob)
                full, meta = levels[0]
                v = full.astype(np.float64)
                rows.append({
                    "image_id": r.image_id, "n_bytes": len(blob),
                    "n_levels": len(levels),
                    "width": meta["width"], "height": meta["height"],
                    "x_origin": meta["x_origin"], "y_origin": meta["y_origin"],
                    "vsum": float(v[np.isfinite(v)].sum()),
                })
            yield pd.DataFrame(rows)

    cols = ["image_id", "bytes", "w", "h", "fmt",
            "x_origin", "y_origin", "cell_width", "cell_height"]
    return t.select(*cols).mapInPandas(run, schema=schema)


def q_grid_to_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grid_to_size at 5 km via the AEQD intermediate
    (raster_geometry.py:695-757) on the rect polygons (rows-only: the
    Snyder AEQD kernel has no ulp-safe SQL twin; the trunc/max shape
    rules are pinned by tests/test_crs_vector.py)."""
    polys = load_polygons(spark, sf_dir).filter("is_rect")
    return crsfn.grid_to_size(polys, 5000.0)


def q_media_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG colormap render (raster.py:2158-2219 pipeline), oracle-checked
    via the lossless-codec invariant: decode the rendered PNG back and
    re-encode it — `roundtrip_exact` is true iff the bytes are identical
    (PNG is lossless and the encoder is deterministic, so this proves
    the encode AND decode ran correctly per row). The oracle pins dims
    and asserts the flag for every row; a hash match certifies the whole
    render→encode→decode→encode chain (was rows-only before r3)."""
    import pandas as pd

    t = load_tiles(spark, sf_dir).filter("image_id < 'img000000000050'")
    out = renderfn.render_png(t)
    schema = "image_id string, width int, height int, roundtrip_exact boolean"

    def check(batches):
        from rasters_spark.functions.render import decode_png, encode_png

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_png(r.png)
                rows.append({
                    "image_id": r.image_id,
                    "width": int(img.shape[1]), "height": int(img.shape[0]),
                    "roundtrip_exact": bool(encode_png(img) == bytes(r.png)),
                })
            yield pd.DataFrame(rows)

    return out.mapInPandas(check, schema=schema)


def q_polygons_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoJSON round-trip: ring → GeoJSON string → parsed back; output
    carries the string plus re-parsed bbox so the oracle verifies both
    serialization and parsing."""
    polys = load_polygons(spark, sf_dir)
    js = vecfn.ring_to_geojson(F.col("ring"))
    back = vecfn.geojson_to_ring(js)
    bb = vecfn.ring_bbox(back)
    return polys.select(
        "poly_id", js.alias("geojson"),
        bb["xmin"].alias("xmin_rt"), bb["ymax"].alias("ymax_rt"),
        F.size(back).alias("n_vertices"),
    )


def _fixed_workdir(prefix: str, sf_dir: str):
    """Fixed per-(prefix, sf) temp slot, recreated each run — repeated
    gate runs reuse the slot instead of accumulating mkdtemp leftovers
    (code-review r4)."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    work = Path(tempfile.gettempdir()) / f"{prefix}{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    return work


def q_stream_point_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship join as stream-static (oracle-checked: availableNow
    drain of the points stream ⋈ static tiles equals the batch query
    bit-for-bit — the oracle IS point_sample_join's SQL)."""
    import shutil
    import tempfile
    from pathlib import Path

    from rasters_spark.streaming import stream_point_sample_join_available_now
    from rasters_spark.tableio import TableIO

    fdir = fixtures.ensure_fixtures(sf_dir)
    work = _fixed_workdir("stream_join_q_", sf_dir)
    src = work / "in"
    src.mkdir()
    shutil.copy(fdir / "points.parquet", src / "points.parquet")
    tiles = tiles_with_cells(load_tiles(spark, sf_dir))
    tbl = TableIO(str(work / "tbl"))
    return stream_point_sample_join_available_now(
        spark, str(src), tiles, tbl, str(work / "ckpt"))


def q_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming ingest smoke (rows-only): drain the fixture
    tiles through readStream→foreachBatch→TableIO and return the
    indexed rows. Exercises checkpointing + snapshot-ledger commits."""
    import shutil
    import tempfile
    from pathlib import Path

    from rasters_spark.streaming import ingest_available_now
    from rasters_spark.tableio import TableIO

    fdir = fixtures.ensure_fixtures(sf_dir)
    work = _fixed_workdir("stream_q_", sf_dir)
    src = work / "in"
    src.mkdir()
    shutil.copy(fdir / "tiles.parquet", src / "tiles.parquet")
    tbl = TableIO(str(work / "tbl"))
    ingest_available_now(spark, str(src), tbl, str(work / "ckpt"))
    return tbl.read(spark).select("image_id", "cell_id", "caption")


def _stream_workdir(sf_dir: str, prefix: str):
    import shutil

    work = _fixed_workdir(prefix, sf_dir)
    src = work / "in"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    return str(src), str(work / "ckpt")


def q_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming watermarked 1-hour tumbling windows over the
    events feed, drained availableNow in append mode — only windows
    whose end has passed the final watermark (max ts − 2 h) emit, which
    the DuckDB oracle recomputes as batch SQL."""
    import uuid

    from rasters_spark import streaming

    src, ckpt = _stream_workdir(sf_dir, "stream_w_")
    return streaming.windowed_counts_available_now(
        spark, src, ckpt, delay="2 hours", query_name="winq_" + uuid.uuid4().hex[:8])


def q_stream_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user cumulative counts carried in GroupState; the drained final
    totals equal the batch groupBy counts (the oracle)."""
    import uuid

    from rasters_spark import streaming

    src, ckpt = _stream_workdir(sf_dir, "stream_s_")
    return streaming.stateful_user_counts_available_now(
        spark, src, ckpt, query_name="stateq_" + uuid.uuid4().hex[:8])


def q_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs by perceptual-hash Hamming distance ≤ 3 via
    4×16-bit band LSH (dedup.hamming_band_pairs) — bucketed equi-join
    with pigeonhole-perfect recall, NOT an all-pairs crossJoin, over the
    FULL tile set. Near-dup structure is planted in-query: every 10th
    tile gets a deterministic ≤3-bit-perturbed variant (the oracle
    brute-forces the same union'd set, so the banded join's exactness
    is what the hash check asserts)."""
    t = load_tiles(spark, sf_dir).select("image_id", "phash").withColumn(
        "i", F.expr("cast(substring(image_id, 4, 12) as bigint)"))
    mask = ("shiftleft(cast(1 as bigint), cast(i % 63 as int))"
            " | shiftleft(cast(1 as bigint), cast((i div 7) % 63 as int))"
            " | shiftleft(cast(1 as bigint), cast((i div 13) % 63 as int))")
    variants = t.filter("i % 10 = 0").select(
        F.concat("image_id", F.lit("~v")).alias("image_id"),
        F.expr(f"phash ^ ({mask})").alias("phash"))
    pool = t.select("image_id", "phash").unionByName(variants)
    return dedup.hamming_band_pairs(pool, threshold=3, bands=4)


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/events.sessionize — the
    web-analytics lag → flag → running-sum window pattern, 30-min
    inactivity gap): one row per session keyed by its MIN event_id
    (engine-stable), with counts and exact integer-microsecond
    duration (unix_micros ≡ DuckDB epoch_us). Total-order tie-break
    (ts, event_id). All JVM window functions; one user_id exchange
    reused by the session aggregate."""
    from rasters_spark.operators import events as eventops
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return eventops.sessionize(ev, 30)


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (operators/events.cohort_retention):
    first-active-day cohorts × day offsets with distinct-user counts —
    pure integer epoch-day arithmetic (UTC-pinned session ≡ DuckDB),
    two combiner-friendly aggregates + one user_id join."""
    from rasters_spark.operators import events as eventops
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return eventops.cohort_retention(ev)


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (operators/events.funnel —
    view → click → purchase with strict at-or-after ordering): one
    keyed min-agg per step joined to the previous frontier; integer
    microsecond comparisons, exact counts."""
    from rasters_spark.operators import events as eventops
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return eventops.funnel(ev)


def q_events_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (the batch shape of the
    streaming windowed agg): epoch-hour buckets for engine-portable
    window boundaries."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hour = (F.unix_timestamp("ts") / 3600).cast("long")
    return ev.groupBy(hour.alias("epoch_hour")).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        # min/max are order-independent; a float SUM of arbitrary doubles
        # would be accumulation-order-dependent across engines
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


def q_reproject_utm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite reprojection pipeline: pixel centroids → numpy TM
    transform → derived UTM target grid → nearest composite (rows-only:
    the Snyder transform kernel has no SQL twin; geometry round-trips
    are pinned by tests/test_reproject.py)."""
    t = load_tiles(spark, sf_dir).filter(
        "x_origin between -123 and -117 and y_origin between 70 and 85 and fmt = 'raw'")
    out = resample.reproject_utm(t, 32610, cell_size_m=5000.0)
    return out.select("trow", "tcol", "value", "n_sources")


def q_swath_twohop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop swath→grid resample (non-NN path, raster.py:1350-1358):
    NN onto the swath's own derived grid, then average onto the target."""
    return swathops.swath_to_grid_twohop(_swath(spark), SWATH_TARGET, own_cell_size=0.05)


def q_events_cell_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events reinterpreted as points (FIXTURES.md §7b): deterministic
    x/y from value/user_id, counted per level-5 cell."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    x = F.col("value") - F.floor(F.col("value") / 360.0) * 360.0 - 180.0
    y = (F.col("user_id") % 180).cast("double") - 90.0 + 0.5
    return (
        ev.withColumn("cell_id", cells.cell_id(x, y, 5))
        .groupBy("cell_id")
        .agg(F.count("*").alias("n_events"), F.count_distinct("user_id").alias("n_users"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry ORDER is a coverage lever: the driver's correctness gate
    certifies the first 50 entries each round (rotation policy in
    CLAUDE.md; the window is now ⌈149/50⌉ = 3 rounds). Round-5 head
    (exactly 50): the 34 brand-new round-5 entries (14 from the
    continuation session + 20 from earlier in the round — none has
    ever held a driver row, so they outrank everything), then
    to_grid_lanczos / to_grid_gauss (rows-only in r04, now carrying
    printf-quantized oracles that need a first oracle-green row) and
    point_sample_join_grouped (aggregate resharded this round), then
    the 13 r03-green entries whose kernel path has NO in-window
    sibling: mosaic_first / to_grid_average (ADVICE r04 #1 promised
    them a fresh row), knn_tiles (ring/top-k), tile_windows_for_
    polygons (window clamp), points_in_polygons (ray-cast PIP),
    rasterize_add (rasterize kernel), resize_bilinear (spline),
    cog_roundtrip (TIFF codec), media_render (T.81 + render),
    gpkg_roundtrip (GeoPackage), stream_window_counts +
    stream_window_counts (watermark machinery). quality_filter and
    reclassify (added after the first rotation pass) take the last
    slots; stream_user_counts steps aside with them (stream_window_
    counts certifies the watermark/streaming surface in-window and
    the applyInPandasWithState operator stays pinned by
    tests/test_tableio_streaming.py — it heads r06 with the rest).

    SIXTEEN r03-green entries step aside for the brand-new work and
    MUST head the r06 rotation (each with an in-window sibling
    certifying its kernel path this round): phash_near_dups
    (stream_minhash_dedup exercises the band-LSH probe/verify shape;
    decontaminate the md5 hash-join machinery), bias_correct +
    linear_downscale (rasterize_add + to_grid_average cover the
    rasterize/avg-resample SQL machinery), tile_cell_assignment
    (point_chips' oracle reuses the identical round_even cell
    assignment), grid_union (tile_windows_for_polygons exercises the
    bbox/window math), events_cell_count (built-in groupBy surface —
    lowest risk), tiles_in_polygons_semi (points_in_polygons covers
    ray-cast + bbox semi), ngram_dedup_pairs (doc_repetition +
    decontaminate exercise the shared tokenizer/gram machinery),
    neighbour_distances (knn_tiles covers the ring/shift family),
    band_stats (pansharpen / gap_fill / epoch_trend exercise the band
    stack machinery; qa_cloud_mask the per-tile stats kernel),
    polygons_geojson + multipolygon_pip (points_in_polygons covers
    wrap + ray-cast incl. rings), simhash_md5 (phash_near_dups covers
    band-hash aggregation; decontaminate covers md5), tile_z_order
    (table_compaction covers the TableIO rewrite path),
    audio_wav_features (media_render covers the codec-roundtrip
    family). Also still deferred from r04: swath_cell_size,
    gpkg_tiles_roundtrip, snap_grids, stream_ingest, boundary_ring,
    events_hour_window, jpeg_roundtrip, geotiff_roundtrip,
    rasterize_replace, swath_twohop (r06 debt list, ahead of the
    r04-green remainder).
    Every entry stays green under tools/check_contract.py regardless
    of position."""
    return {
        # -- brand-new (round-5 continuation session)
        "temporal_composite": q_temporal_composite,
        "focal_median": q_focal_median,
        "flow_d8": q_flow_d8,
        "proximity": q_proximity,
        "doc_repetition": q_doc_repetition,
        "decontaminate": q_decontaminate,
        "qa_cloud_mask": q_qa_cloud_mask,
        "pansharpen": q_pansharpen,
        "gap_fill": q_gap_fill,
        "point_chips": q_point_chips,
        "epoch_trend": q_epoch_trend,
        "stream_composite": q_stream_composite,
        "to_grid_sum": q_to_grid_sum,
        "augment_flips": q_augment_flips,
        "quality_filter": q_quality_filter,
        "reclassify": q_reclassify,
        # -- brand-new (round 5, earlier sessions)
        "netcdf_cdf5_roundtrip": q_netcdf_cdf5_roundtrip,
        "pq_topk_bulk": q_pq_topk_bulk,
        "stream_minhash_dedup": q_stream_minhash_dedup,
        "focal_halo_stats": q_focal_halo_stats,
        "transform_cyl": q_transform_cyl,
        "table_compaction": q_table_compaction,
        "spatial_split": q_spatial_split,
        "stratified_cell_cap": q_stratified_cell_cap,
        "hash_sample": q_hash_sample,
        "zonal_stats": q_zonal_stats,
        "focal_convolve": q_focal_convolve,
        "terrain_horn": q_terrain_horn,
        "pack_shards": q_pack_shards,
        "contour_segments": q_contour_segments,
        "polygonize": q_polygonize,
        "tile_histogram": q_tile_histogram,
        "layer_ndvi": q_layer_ndvi,
        "stream_histogram": q_stream_histogram,
        "retile_split": q_retile_split,
        "sieve_small_regions": q_sieve_small_regions,
        # -- newly oracled / kernel-touched this round
        "to_grid_lanczos": q_to_grid_lanczos,
        "to_grid_gauss": q_to_grid_gauss,
        "point_sample_join_grouped": q_point_sample_join_grouped,
        # -- r03-green, no in-window sibling (positions 38-50)
        "mosaic_first": q_mosaic_first,
        "to_grid_average": q_to_grid_average,
        "knn_tiles": q_knn_tiles,
        "tile_windows_for_polygons": q_tile_windows_for_polygons,
        "points_in_polygons": q_points_in_polygons,
        "rasterize_add": q_rasterize_add,
        "resize_bilinear": q_resize_bilinear,
        "cog_roundtrip": q_cog_roundtrip,
        "media_render": q_media_render,
        "gpkg_roundtrip": q_gpkg_roundtrip,
        "stream_window_counts": q_stream_window_counts,
        # ---- position 50+ from here ----------------------------------
        # terrain_curvature is brand-new but deliberately sits below the
        # marker: terrain_horn (in-window) certifies the identical
        # lattice/halo/pivot machinery and raw-double hash family this
        # round, and every remaining in-window stale entry guards a
        # kernel path with NO sibling; it heads the r06 debt list.
        "terrain_curvature": q_terrain_curvature,
        # lattice_chips: same deliberate below-marker placement — its two
        # halves (halo placement, chip-stat reduction) are certified
        # in-window by the focal family and point_chips; heads r06.
        "lattice_chips": q_lattice_chips,
        # stream_decontaminate: same note — stream_minhash_dedup (in-
        # window) certifies the availableNow+ledger machinery and
        # decontaminate (in-window) the gram/digest join; heads r06.
        "stream_decontaminate": q_stream_decontaminate,
        # event_sessions/cohort_retention/event_funnel/source_quality/
        # equalize_lut/rgb_to_gray/session_window_native/terrain_indices/
        # zonal_quantiles/polygon_area_centroid/point_geodesics/
        # phash_dup_groups/integral_image/morph_open/flow_accumulation/
        # watersheds/cost_distance/stream_cohort/zonal_mode/stream_sessions:
        # below-marker brand-new,
        # sibling-covered (events_cell_count / stream_window_counts
        # certify the events scan + windowed-agg surface; the
        # lag/running-sum and cohort patterns are pinned by their own
        # pytest brute forces); both head r06.
        "event_sessions": q_event_sessions,
        "cohort_retention": q_cohort_retention,
        "event_funnel": q_event_funnel,
        "source_quality": q_source_quality,
        "equalize_lut": q_equalize_lut,
        "rgb_to_gray": q_rgb_to_gray,
        "session_window_native": q_session_window_native,
        "terrain_indices": q_terrain_indices,
        "zonal_quantiles": q_zonal_quantiles,
        "polygon_area_centroid": q_polygon_area_centroid,
        "point_geodesics": q_point_geodesics,
        "phash_dup_groups": q_phash_dup_groups,
        "integral_image": q_integral_image,
        "morph_open": q_morph_open,
        "flow_accumulation": q_flow_accumulation,
        "watersheds": q_watersheds,
        "cost_distance": q_cost_distance,
        "stream_cohort": q_stream_cohort,
        "zonal_mode": q_zonal_mode,
        "stream_sessions": q_stream_sessions,
        # -- displaced r03-green -> MUST head r06 (siblings in docstring)
        "stream_user_counts": q_stream_user_counts,
        "phash_near_dups": q_phash_near_dups,
        "bias_correct": q_bias_correct,
        "linear_downscale": q_linear_downscale,
        "tile_cell_assignment": q_tile_cell_assignment,
        "grid_union": q_grid_union,
        "events_cell_count": q_events_cell_count,
        "tiles_in_polygons_semi": q_tiles_in_polygons_semi,
        "ngram_dedup_pairs": q_ngram_dedup_pairs,
        "neighbour_distances": q_neighbour_distances,
        "band_stats": q_band_stats,
        "polygons_geojson": q_polygons_geojson,
        "multipolygon_pip": q_multipolygon_pip,
        "simhash_md5": q_simhash_md5,
        "tile_z_order": q_tile_z_order,
        "audio_wav_features": q_audio_wav_features,
        # -- r04-deferred + r04-green remainder
        "swath_cell_size": q_swath_cell_size,
        "gpkg_tiles_roundtrip": q_gpkg_tiles_roundtrip,
        "snap_grids": q_snap_grids,
        "stream_ingest": q_stream_ingest,
        "boundary_ring": q_boundary_ring,
        "events_hour_window": q_events_hour_window,
        "jpeg_roundtrip": q_jpeg_roundtrip,
        "geotiff_roundtrip": q_geotiff_roundtrip,
        "rasterize_replace": q_rasterize_replace,
        "swath_twohop": q_swath_twohop,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "swath_resize": q_swath_resize,
        "grid_to_size": q_grid_to_size,
        "reproject_utm": q_reproject_utm,
        "simhash_sigs": q_simhash_sigs,
        "doc_stats": q_doc_stats,
        "langid": q_langid,
        "doc_fingerprint": q_doc_fingerprint,
        "cosine_topk": q_cosine_topk,
        "lsh_cosine_topk": q_lsh_cosine_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "media_features": q_media_features,
        "local_utm": q_local_utm,
        "pixel_centroids": q_pixel_centroids,
        "latlon_matrices": q_latlon_matrices,
        "tile_unique_values": q_tile_unique_values,
        "bbox_accessors": q_bbox_accessors,
        "swath_window": q_swath_window,
        "swath_to_grid_nn": q_swath_to_grid_nn,
        "to_grid_bilinear": q_to_grid_bilinear,
        "to_grid_cubic": q_to_grid_cubic,
        "to_grid_cubicspline": q_to_grid_cubicspline,
        "to_grid_max": q_to_grid_max,
        "to_grid_min": q_to_grid_min,
        "to_grid_med": q_to_grid_med,
        "to_grid_q1": q_to_grid_q1,
        "to_grid_q3": q_to_grid_q3,
        "to_grid_mode": q_to_grid_mode,
        "to_geolocation_nn": q_to_geolocation_nn,
        "cell_size_meters": q_cell_size_meters,
        "embedding_dup_groups": q_embedding_dup_groups,
        "pq_adc_topk": q_pq_adc_topk,
        "token_counts": q_token_counts,
        "stream_xyz_pyramid": q_stream_xyz_pyramid,
        "xyz_pyramid_stats": q_xyz_pyramid_stats,
        "xyz_tile_assignment": q_xyz_tile_assignment,
        "point_sample_join_i32": q_point_sample_join_i32,
        "bool_mask_counts": q_bool_mask_counts,
        "netcdf_roundtrip": q_netcdf_roundtrip,
        "minhash_lsh_bucketed": q_minhash_lsh_bucketed,
        "ivf_topk": q_ivf_topk,
        "point_sample_join": q_point_sample_join,
        "stream_point_join": q_stream_point_join,
        "tile_stats": q_tile_stats,
        "raster_algebra": q_raster_algebra,
        "trim_grid": q_trim_grid,
        "dup_groups": q_dup_groups,
        "exact_dedup": q_exact_dedup,
        "stretch_params": q_stretch_params,
        "merge_mean": q_merge_mean,
    }


def _rasterize_sql(polys: str, csz: float, rows: int, cols: int, agg: str) -> str:
    """DuckDB replication of joins.rasterize on rect polygons for a
    global grid with cell size ``csz``: window via round_even, candidate
    range explode, half-open center test, sum / arg_max composite."""
    val = "sum(burn_value)" if agg == "sum" else "arg_max(burn_value, poly_id)"
    return f"""
        with win_r as (
          select poly_id, burn_value, xmin, ymin, xmax, ymax,
            greatest(cast(round_even((ymax - 90.0)/(-{csz}) - 0.5, 0) as bigint), 0) as rs,
            greatest(cast(round_even((xmin + 180.0)/{csz} - 0.5, 0) as bigint), 0) as cs,
            least(cast(round_even((ymin - 90.0)/(-{csz}) - 0.5, 0) as bigint) + 1, {rows}) as re,
            least(cast(round_even((xmax + 180.0)/{csz} - 0.5, 0) as bigint) + 1, {cols}) as ce
          from {polys} where is_rect
        ),
        burned_r as (
          select w.poly_id, w.burn_value, r.row_, c.col_
          from win_r w,
               unnest(range(w.rs, w.re)) as r(row_),
               unnest(range(w.cs, w.ce)) as c(col_)
          where (-180.0 + {csz} * (c.col_ + 0.5)) >= w.xmin and (-180.0 + {csz} * (c.col_ + 0.5)) < w.xmax
            and (90.0 + (-{csz}) * (r.row_ + 0.5)) >= w.ymin and (90.0 + (-{csz}) * (r.row_ + 0.5)) < w.ymax
        )
        select row_ as row, col_ as col, {val} as value
        from burned_r group by 1, 2
    """


def _resample_cte(tiles: str, pixels: str, fmt_filter: str) -> str:
    """Shared CTE chain: tiles → 0.25° target-cell candidates → nearest
    source-pixel sample (mirrors resample.target_candidates exactly)."""
    return f"""
        with t as (select * from {tiles} {fmt_filter}),
        win as (
          select image_id, x_origin, y_origin, cell_width, cell_height, w, h,
            greatest(cast(round_even((y_origin - 90.0)/(-0.25) - 0.5, 0) as bigint), 0) as rs,
            greatest(cast(round_even((x_origin + 180.0)/0.25 - 0.5, 0) as bigint), 0) as cs,
            least(cast(round_even(((y_origin + cell_height * h) - 90.0)/(-0.25) - 0.5, 0) as bigint) + 1, 720) as re,
            least(cast(round_even(((x_origin + cell_width * w) + 180.0)/0.25 - 0.5, 0) as bigint) + 1, 1440) as ce
          from t
        ),
        cand as (
          select w_.image_id, w_.x_origin, w_.y_origin, w_.cell_width, w_.cell_height, w_.w, w_.h,
                 r.trow, c.tcol
          from win w_,
               unnest(range(w_.rs, w_.re)) as r(trow),
               unnest(range(w_.cs, w_.ce)) as c(tcol)
        ),
        idx as (
          select image_id, trow, tcol, h, w,
            cast(round_even(((90.0 + (-0.25) * (trow + 0.5)) - y_origin)/cell_height - 0.5, 0) as bigint) as prow,
            cast(round_even(((-180.0 + 0.25 * (tcol + 0.5)) - x_origin)/cell_width - 0.5, 0) as bigint) as pcol
          from cand
        ),
        sampled as (
          select i.image_id, i.trow, i.tcol, px.value
          from idx i join {pixels} px
            on px.image_id = i.image_id and px.prow = i.prow and px.pcol = i.pcol
          where i.prow between 0 and i.h - 1 and i.pcol between 0 and i.w - 1
        )
    """


def _conv_oracle_sql(tiles: str, pixels: str, resampling: str) -> str:
    """DuckDB twin of resample.to_grid_conv: identical window/candidate
    CTEs, identical tap clamping, and the IDENTICAL blend expression
    text (resample.conv_blend_sql) — both engines evaluate the same
    IEEE op sequence, so value hashes match bit-for-bit."""
    from rasters_spark.operators.resample import CONV_KERNELS, _lbl, conv_blend_sql

    weights_fn, taps = CONV_KERNELS[resampling]
    blend = conv_blend_sql(weights_fn, taps)
    tap_exprs = ",\n            ".join(
        f"least(greatest(cast(floor(fr) as bigint) + ({i}), 0), h - 1) as rr_{_lbl(i)},\n"
        f"            least(greatest(cast(floor(fc) as bigint) + ({i}), 0), w - 1) as cc_{_lbl(i)}"
        for i in taps
    )
    v_cols = ",\n            ".join(
        f"cast(p_{_lbl(i)}_{_lbl(j)}.value as double) as v_{_lbl(i)}_{_lbl(j)}"
        for i in taps for j in taps
    )
    v_joins = "\n          ".join(
        f"join {pixels} p_{_lbl(i)}_{_lbl(j)} on p_{_lbl(i)}_{_lbl(j)}.image_id = nb.image_id"
        f" and p_{_lbl(i)}_{_lbl(j)}.prow = nb.rr_{_lbl(i)} and p_{_lbl(i)}_{_lbl(j)}.pcol = nb.cc_{_lbl(j)}"
        for i in taps for j in taps
    )
    return f"""
        with t as (select * from {tiles} where fmt = 'raw'),
        win as (
          select image_id, x_origin, y_origin, cell_width, cell_height, w, h,
            greatest(cast(round_even((y_origin - 90.0)/(-0.25) - 0.5, 0) as bigint), 0) as rs,
            greatest(cast(round_even((x_origin + 180.0)/0.25 - 0.5, 0) as bigint), 0) as cs,
            least(cast(round_even(((y_origin + cell_height * h) - 90.0)/(-0.25) - 0.5, 0) as bigint) + 1, 720) as re,
            least(cast(round_even(((x_origin + cell_width * w) + 180.0)/0.25 - 0.5, 0) as bigint) + 1, 1440) as ce
          from t
        ),
        cand as (
          select w_.*, r.trow, c.tcol,
                 (-180.0 + 0.25 * (c.tcol + 0.5)) as tx, (90.0 + (-0.25) * (r.trow + 0.5)) as ty
          from win w_,
               unnest(range(w_.rs, w_.re)) as r(trow), unnest(range(w_.cs, w_.ce)) as c(tcol)
        ),
        frac as (
          select image_id, trow, tcol, w, h,
            (tx - x_origin)/cell_width - 0.5 as fc, (ty - y_origin)/cell_height - 0.5 as fr,
            cast(round_even((ty - y_origin)/cell_height - 0.5, 0) as bigint) as prow,
            cast(round_even((tx - x_origin)/cell_width - 0.5, 0) as bigint) as pcol
          from cand
        ),
        nb as (
          select image_id, trow, tcol, fc - floor(fc) as dc, fr - floor(fr) as dr,
            {tap_exprs}
          from frac
          where prow between 0 and h - 1 and pcol between 0 and w - 1
        ),
        v as (
          select nb.image_id, nb.trow, nb.tcol, nb.dc, nb.dr,
            {v_cols}
          from nb
          {v_joins}
        ),
        b as (
          select image_id, trow, tcol, {blend} as value from v
        )
        select image_id, trow, tcol,
               case when isnan(value) then NULL else value end as value
        from b
    """


def _sinc_sql(t: str) -> str:
    """np.sinc in SQL: sin(π·x)/(π·x) with sinc(0)=1 (numpy substitutes
    x=1e-20 at 0, giving exactly 1.0 in double — the case-branch here is
    bit-identical)."""
    return f"(case when {t} = 0.0 then 1.0 else sin(pi()*{t})/(pi()*{t}) end)"


def _conv_py_weights_sql(d: str, kind: str) -> tuple[tuple, dict]:
    """DuckDB twins of resample._conv_weights_np — the same tap offsets
    and the same op ORDER numpy evaluates (x = d − tap; lanczos
    sinc(x)·sinc(x/3), gauss exp((−0.5·x)·x))."""
    if kind == "lanczos":
        taps = tuple(range(-2, 4))
        return taps, {
            i: f"({_sinc_sql(f'({d} - ({float(i)}))')} * "
               f"{_sinc_sql(f'(({d} - ({float(i)}))/3.0)')})"
            for i in taps}
    taps = tuple(range(-1, 3))
    return taps, {
        i: f"exp(-0.5 * ({d} - ({float(i)})) * ({d} - ({float(i)})))"
        for i in taps}


def _conv_py_oracle_sql(tiles: str, pixels: str, kind: str) -> str:
    """DuckDB twin of resample.to_grid_conv_py (lanczos/gauss), value
    quantized with printf('%.9e') on BOTH engines (VERDICT r04 #2): the
    only cross-engine divergence in these kernels is the last ulp of
    sin()/exp(), which 9-significant-digit formatting absorbs while
    still pinning the full kernel — window, tap clamping, weight
    formulas, accumulation order (left-assoc in tap order, matching the
    numpy += loops), and weight-sum normalization."""
    from rasters_spark.operators.resample import _lbl

    taps, wr = _conv_py_weights_sql("dr", kind)
    _, wc = _conv_py_weights_sql("dc", kind)
    tap_exprs = ",\n            ".join(
        f"least(greatest(cast(floor(fr) as bigint) + ({i}), 0), h - 1) as rr_{_lbl(i)},\n"
        f"            least(greatest(cast(floor(fc) as bigint) + ({i}), 0), w - 1) as cc_{_lbl(i)}"
        for i in taps
    )
    # ONE pixels join per candidate + a conditional-aggregation pivot
    # for the 36 (lanczos) / 16 (gauss) tap values — the per-tap-pair
    # join form sent DuckDB's greedy join-order search into a >25 GB
    # intermediate at 37 relations; this shape is one hash join and one
    # group-by. Exactly one pixel row matches each (rr_i, cc_j), so
    # max() just selects it (NaN included — one non-NULL input).
    v_aggs = ",\n            ".join(
        f"max(case when px.prow = nb.rr_{_lbl(i)} and px.pcol = nb.cc_{_lbl(j)} "
        f"then cast(px.value as double) end) as v_{_lbl(i)}_{_lbl(j)}"
        for i in taps for j in taps
    )
    # numpy: row_acc += wc[b]·v (b ascending), num += wr[a]·row_acc
    # (a ascending) — left-assoc " + " joins replicate both loops
    num = " + ".join(
        f"{wr[i]} * ({' + '.join(f'{wc[j]} * v_{_lbl(i)}_{_lbl(j)}' for j in taps)})"
        for i in taps)
    den = (f"({' + '.join(wr[i] for i in taps)}) * "
           f"({' + '.join(wc[j] for j in taps)})")
    return f"""
        with t as (select * from {tiles} where fmt = 'raw'),
        win as (
          select image_id, x_origin, y_origin, cell_width, cell_height, w, h,
            greatest(cast(round_even((y_origin - 90.0)/(-0.25) - 0.5, 0) as bigint), 0) as rs,
            greatest(cast(round_even((x_origin + 180.0)/0.25 - 0.5, 0) as bigint), 0) as cs,
            least(cast(round_even(((y_origin + cell_height * h) - 90.0)/(-0.25) - 0.5, 0) as bigint) + 1, 720) as re,
            least(cast(round_even(((x_origin + cell_width * w) + 180.0)/0.25 - 0.5, 0) as bigint) + 1, 1440) as ce
          from t
        ),
        cand as (
          select w_.*, r.trow, c.tcol,
                 (-180.0 + 0.25 * (c.tcol + 0.5)) as tx, (90.0 + (-0.25) * (r.trow + 0.5)) as ty
          from win w_,
               unnest(range(w_.rs, w_.re)) as r(trow), unnest(range(w_.cs, w_.ce)) as c(tcol)
        ),
        frac as (
          select image_id, trow, tcol, w, h,
            (tx - x_origin)/cell_width - 0.5 as fc, (ty - y_origin)/cell_height - 0.5 as fr,
            cast(round_even((ty - y_origin)/cell_height - 0.5, 0) as bigint) as prow,
            cast(round_even((tx - x_origin)/cell_width - 0.5, 0) as bigint) as pcol
          from cand
        ),
        nb as (
          select image_id, trow, tcol, fc - floor(fc) as dc, fr - floor(fr) as dr,
            {tap_exprs}
          from frac
          where prow between 0 and h - 1 and pcol between 0 and w - 1
        ),
        v as (
          select nb.image_id, nb.trow, nb.tcol,
            any_value(nb.dc) as dc, any_value(nb.dr) as dr,
            {v_aggs}
          from nb
          join {pixels} px on px.image_id = nb.image_id
          group by nb.image_id, nb.trow, nb.tcol
        ),
        b as (
          select image_id, trow, tcol, ({num}) / ({den}) as value from v
        )
        select image_id, trow, tcol,
               case when isnan(value) then NULL else printf('%.9e', value) end as value_q
        from b
    """


def _resize_bilinear_oracle_sql(tiles: str, out: int = 8) -> str:
    """DuckDB twin of multimodal.resize_bilinear_long: identical output-
    grid explode, tap clamping, and shared blend text."""
    from rasters_spark.operators.resample import bilinear_weights_sql, conv_blend_sql

    pixels = f"read_parquet('{FD}/pixels.parquet')"
    blend = conv_blend_sql(bilinear_weights_sql, (0, 1))
    return f"""
        with t as (
          select image_id, w, h from {tiles}
          where fmt = 'raw' and image_id < 'img000000000200'
        ),
        g as (
          select image_id, w, h, r.orow, c.ocol,
                 (r.orow + 0.5) * h / {out}.0 - 0.5 as fr,
                 (c.ocol + 0.5) * w / {out}.0 - 0.5 as fc
          from t, unnest(range(0, {out})) as r(orow), unnest(range(0, {out})) as c(ocol)
        ),
        nb as (
          select image_id, orow, ocol, fc - floor(fc) as dc, fr - floor(fr) as dr,
            least(greatest(cast(floor(fr) as bigint) + (0), 0), h - 1) as rr_0,
            least(greatest(cast(floor(fr) as bigint) + (1), 0), h - 1) as rr_1,
            least(greatest(cast(floor(fc) as bigint) + (0), 0), w - 1) as cc_0,
            least(greatest(cast(floor(fc) as bigint) + (1), 0), w - 1) as cc_1
          from g
        ),
        v as (
          select nb.image_id, nb.orow, nb.ocol, nb.dc, nb.dr,
            cast(p_0_0.value as double) as v_0_0, cast(p_0_1.value as double) as v_0_1,
            cast(p_1_0.value as double) as v_1_0, cast(p_1_1.value as double) as v_1_1
          from nb
          join {pixels} p_0_0 on p_0_0.image_id = nb.image_id and p_0_0.prow = nb.rr_0 and p_0_0.pcol = nb.cc_0
          join {pixels} p_0_1 on p_0_1.image_id = nb.image_id and p_0_1.prow = nb.rr_0 and p_0_1.pcol = nb.cc_1
          join {pixels} p_1_0 on p_1_0.image_id = nb.image_id and p_1_0.prow = nb.rr_1 and p_1_0.pcol = nb.cc_0
          join {pixels} p_1_1 on p_1_1.image_id = nb.image_id and p_1_1.prow = nb.rr_1 and p_1_1.pcol = nb.cc_1
        ),
        b as (select image_id, orow, ocol, {blend} as value from v)
        select image_id, orow, ocol,
               case when isnan(value) then NULL else value end as value
        from b
    """


def _stat_oracle_sql(tiles: str, pixels: str, stat: str) -> str:
    """DuckDB twin of resample.to_grid_stat: source-pixel binning CTE
    (same as to_grid_average) + the named statistic. Quantiles are exact
    on the quarter-integer fixture values (interpolation fractions are
    binary), so quantile_cont ≡ the kernel's lo + frac·(hi−lo)."""
    base = f"""
        with p as (
          select px.image_id, cast(px.value as double) as value,
            cast(round_even(((t.x_origin + t.cell_width * (px.pcol + 0.5)) - (-180.0)) / 0.25 - 0.5, 0) as bigint) as tcol,
            cast(round_even(((t.y_origin + t.cell_height * (px.prow + 0.5)) - 90.0) / (-0.25) - 0.5, 0) as bigint) as trow
          from {tiles} t join {pixels} px using (image_id)
          where t.fmt = 'raw' and not isnan(px.value)
        ),
        q as (select * from p where trow between 0 and 719 and tcol between 0 and 1439)
    """
    if stat == "mode":
        return base + """
        , vc as (
          select image_id, trow, tcol, value, count(*) as c
          from q group by image_id, trow, tcol, value
        ),
        r as (
          select image_id, trow, tcol, value,
                 row_number() over (partition by image_id, trow, tcol
                                    order by c desc, value asc) as rn,
                 sum(c) over (partition by image_id, trow, tcol) as n
          from vc
        )
        select image_id, trow, tcol, value, cast(n as bigint) as n from r where rn = 1
        """
    agg = {
        "max": "max(value)",
        "min": "min(value)",
        "sum": "sum(value)",
        "med": "median(value)",
        "q1": "quantile_cont(value, 0.25)",
        "q3": "quantile_cont(value, 0.75)",
    }[stat]
    return base + f"""
        select image_id, trow, tcol, {agg} as value, count(*) as n
        from q group by image_id, trow, tcol
    """


_JACCARD_SQL = """
    with g as (
      select doc_id,
        unnest(list_distinct([substring(text, i, 3)
                              for i in range(1, greatest(len(text) - 2, 1) + 1)])) as sh
      from documents
    ),
    sizes as (select doc_id, count(*) as n from g group by 1),
    inter as (
      select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as i
      from g a join g b on a.sh = b.sh and a.doc_id < b.doc_id
      group by 1, 2
    )
    select doc_a, doc_b, cast(i as double) / cast(sa.n + sb.n - i as double) as j
    from inter
    join sizes sa on sa.doc_id = doc_a
    join sizes sb on sb.doc_id = doc_b
    where cast(i as double) / cast(sa.n + sb.n - i as double) >= 0.85
"""


def _langid_sql() -> str:
    """Marker scoring replicated via the same length-arithmetic formulas
    (generated from textstats.LANG_MARKERS so both engines share one
    source of truth)."""
    def occ(w: str) -> str:
        pad = "(' ' || text || ' ')"
        return f"(len({pad}) - len(replace({pad}, ' {w} ', ''))) / {len(w) + 2}.0"

    scores = {lang: " + ".join(occ(w) for w in ws) for lang, ws in textstats.LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(f"s_{L}" for L in scores) + ")"
    case = " ".join(f"when s_{L} = best then '{L}'" for L in scores)
    inner = ", ".join(f"({expr}) as s_{L}" for L, expr in scores.items())
    return f"""
        with s as (select doc_id, lang, {inner} from documents),
        b as (select doc_id, lang, {best} as best, * exclude (doc_id, lang) from s)
        select doc_id, lang, case {case} else 'unknown' end as predicted_lang, best as score
        from b
    """


from rasters_spark.datapipe.textstats import BPE_PATTERN as _BPE_PAT  # noqa: E402


def _xyz_pyramid_oracle() -> str:
    from rasters_spark.functions import xyz as xyzfn

    px_x = "(t.x_origin + t.cell_width * (px.pcol + 0.5))"
    px_y = "(t.y_origin + t.cell_height * (px.prow + 0.5))"
    row, col = xyzfn.pixel_cell_sql(px_x, px_y, 4)
    return f"""
        select cast(({col}) // 256 as bigint) as xtile,
               cast(({row}) // 256 as bigint) as ytile,
               count(*) as n_pixels,
               sum(cast(px.value as double)) as vsum
        from read_parquet('{FD}/pixels.parquet') px
        join read_parquet('{FD}/tiles.parquet') t using (image_id)
        where t.fmt = 'raw' and not isnan(px.value)
          and {px_y} > -{xyzfn.LAT_MAX} and {px_y} < {xyzfn.LAT_MAX}
        group by 1, 2
    """


def _xyz_oracle() -> str:
    from rasters_spark import cells

    xs, ys = cells.xyz_tile_sql("x", "y", 8)
    return f"""
        select point_id, {xs} as xtile, {ys} as ytile
        from read_parquet('{FD}/points.parquet')
        where y > -{cells.WEBMERC_LAT_MAX} and y < {cells.WEBMERC_LAT_MAX}
    """


def _terrain_horn_sql(tiles: str, pixels: str) -> str:
    """DuckDB twin of q_terrain_horn. The 3×3 window is pivoted with
    ONE neighbor join + conditional max() (the CLAUDE.md join-stack
    rule), strictness is the 9/9 valid count, and the Horn/light
    constants are inlined from the SAME Python floats the numpy kernel
    uses (terrain.light_vector) so both engines start from bit-identical
    doubles; the gradient expressions mirror the kernel text verbatim."""
    from rasters_spark.operators import terrain as _t
    lx, ly, lz = _t.light_vector()
    zf = 1.0
    piv = ", ".join(
        f"max(case when cand.dx = {dx} and cand.dy = {dy} then n.value end) as z{i + 1}"
        for i, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)))
    return f"""
        with tl as (
          select image_id, crs, cell_width, cell_height, w, h,
                 row_number() over (partition by crs, cell_width, cell_height, w, h
                                    order by image_id) - 1 as rn
          from {tiles}
          where fmt = 'raw' and image_id < 'img000000000300'
        ),
        tl2 as (
          select image_id, crs, cell_width, cell_height, w, h,
                 rn % 40 as tx, rn // 40 as ty
          from tl
        ),
        px as (
          select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                 t.tx, t.ty,
                 t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                 case when isnan(p.value) then NULL
                      else cast(p.value as double) end as value
          from tl2 t join {pixels} p using (image_id)
        ),
        offs(dx, dy) as (values (-1,-1),(0,-1),(1,-1),(-1,0),(0,0),
                                (1,0),(-1,1),(0,1),(1,1)),
        cand as (
          select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                 c.tx, c.ty, c.gx, c.gy,
                 c.gx + o.dx as ngx, c.gy + o.dy as ngy, o.dx, o.dy
          from px c cross join offs o
        ),
        win as (
          select cand.image_id, cand.cell_width, cand.cell_height,
                 cast(cand.gx - cand.tx * cand.w as integer) as pcol,
                 cast(cand.gy - cand.ty * cand.h as integer) as prow,
                 {piv},
                 count(n.value) as nv
          from cand
          join px n
            on n.crs = cand.crs and n.cell_width = cand.cell_width
           and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
           and n.gx = cand.ngx and n.gy = cand.ngy
          group by 1, 2, 3, 4, 5
        ),
        g as (
          select image_id, prow, pcol,
                 {zf!r} * (((z3 + 2.0*z6 + z9) - (z1 + 2.0*z4 + z7))
                           / (8.0 * abs(cell_width))) as gx,
                 case when cell_height < 0
                      then -({zf!r} * (((z7 + 2.0*z8 + z9) - (z1 + 2.0*z2 + z3))
                                       / (8.0 * abs(cell_height))))
                      else {zf!r} * (((z7 + 2.0*z8 + z9) - (z1 + 2.0*z2 + z3))
                                     / (8.0 * abs(cell_height)))
                 end as gn
          from win where nv = 9
        )
        select image_id, prow, pcol,
               printf('%.8e', degrees(atan(sqrt(gx*gx + gn*gn)))) as slope_q,
               case when gx = 0.0 and gn = 0.0 then NULL
                    else printf('%.9e', fmod(degrees(atan2(-gx, gn)) + 360.0, 360.0))
               end as aspect_q,
               printf('%.9e', 255.0 * ({lx!r} * (-gx) + {ly!r} * (-gn) + {lz!r})
                              / sqrt(1.0 + gx*gx + gn*gn)) as hs_q
        from g
    """


def _contour_sql(tiles: str, pixels: str) -> str:
    """DuckDB twin of q_contour_segments: pivot the 4 block corners
    with ONE join + conditional max (join-stack rule), cross the
    levels, compute the same exact-dyadic crossings, pair the forced
    2-crossing case by the shared coalesce order, disambiguate saddles
    by the center mean, canonicalize endpoints lexicographically.
    Every expression mirrors the kernel text — all inputs dyadic and
    all ops correctly rounded, so the doubles hash bit-identically."""
    lvs = ", ".join(f"({lv!r})" for lv in CONTOUR_LEVELS)
    return f"""
        with tl as (
          select image_id, crs, cell_width, cell_height, w, h,
                 row_number() over (partition by crs, cell_width, cell_height, w, h
                                    order by image_id) - 1 as rn
          from {tiles}
          where fmt = 'raw' and image_id < 'img000000000300'
        ),
        tl2 as (
          select image_id, crs, cell_width, cell_height, w, h,
                 rn % 40 as tx, rn // 40 as ty
          from tl
        ),
        px as (
          select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                 t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                 case when isnan(p.value) then NULL
                      else cast(p.value as double) end as value
          from tl2 t join {pixels} p using (image_id)
        ),
        offs(dx, dy) as (values (0,0),(1,0),(0,1),(1,1)),
        cand as (
          select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                 c.gx, c.gy, c.gx + o.dx as ngx, c.gy + o.dy as ngy, o.dx, o.dy
          from px c cross join offs o
        ),
        blk as (
          select cand.image_id, cand.cell_width as cw, cand.cell_height as ch,
                 cand.gx, cand.gy,
                 max(case when cand.dx = 0 and cand.dy = 0 then n.value end) as za,
                 max(case when cand.dx = 1 and cand.dy = 0 then n.value end) as zb,
                 max(case when cand.dx = 0 and cand.dy = 1 then n.value end) as zc,
                 max(case when cand.dx = 1 and cand.dy = 1 then n.value end) as zd,
                 count(n.value) as nv
          from cand
          join px n
            on n.crs = cand.crs and n.cell_width = cand.cell_width
           and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
           and n.gx = cand.ngx and n.gy = cand.ngy
          group by 1, 2, 3, 4, 5
        ),
        c2 as (
          select b.image_id, cast(l.level as double) as level,
                 b.za, b.zb, b.zc, b.zd,
                 (b.gx + 0.5) * b.cw as xa, (b.gx + 1.5) * b.cw as xb,
                 (b.gy + 0.5) * b.ch as ya, (b.gy + 1.5) * b.ch as yc,
                 (b.za >= l.level) as ia, (b.zb >= l.level) as ib,
                 (b.zc >= l.level) as ic, (b.zd >= l.level) as idd
          from blk b cross join (values {lvs}) l(level)
          where b.nv = 4
        ),
        cr as (
          select image_id, level, ia, ib, ic, idd, za, zb, zc, zd,
                 case when ia != ib
                      then xa + ((level - za) / (zb - za)) * (xb - xa) end as tx,
                 case when ia != ib then ya end as tyy,
                 case when ic != idd
                      then xa + ((level - zc) / (zd - zc)) * (xb - xa) end as bx,
                 case when ic != idd then yc end as byy,
                 case when ia != ic then xa end as lx,
                 case when ia != ic
                      then ya + ((level - za) / (zc - za)) * (yc - ya) end as ly,
                 case when ib != idd then xb end as rx,
                 case when ib != idd
                      then ya + ((level - zb) / (zd - zb)) * (yc - ya) end as ry,
                 cast(ia != ib as int) + cast(ic != idd as int)
                   + cast(ia != ic as int) + cast(ib != idd as int) as nc,
                 ((za + zb + zc + zd) / 4.0 >= level) as cin
          from c2
        ),
        rawseg as (
          -- forced case: exactly two crossings, first/last in the
          -- (top, bottom, left, right) edge order
          select image_id, level,
                 coalesce(tx, bx, lx, rx) as p1x, coalesce(tyy, byy, ly, ry) as p1y,
                 coalesce(rx, lx, bx, tx) as p2x, coalesce(ry, ly, byy, tyy) as p2y
          from cr where nc = 2
          union all
          -- saddles: q = connect-the-(top,right)/(left,bottom) pairing
          select image_id, level,
                 case when (ia and cin) or (ib and not cin) then tx else tx end as p1x,
                 case when (ia and cin) or (ib and not cin) then tyy else tyy end as p1y,
                 case when (ia and cin) or (ib and not cin) then rx else lx end as p2x,
                 case when (ia and cin) or (ib and not cin) then ry else ly end as p2y
          from cr where nc = 4
          union all
          select image_id, level,
                 case when (ia and cin) or (ib and not cin) then lx else rx end as p1x,
                 case when (ia and cin) or (ib and not cin) then ly else ry end as p1y,
                 bx as p2x, byy as p2y
          from cr where nc = 4
        )
        select image_id, level,
               case when (p1x < p2x) or (p1x = p2x and p1y <= p2y)
                    then p1x else p2x end as x1,
               case when (p1x < p2x) or (p1x = p2x and p1y <= p2y)
                    then p1y else p2y end as y1,
               case when (p1x < p2x) or (p1x = p2x and p1y <= p2y)
                    then p2x else p1x end as x2,
               case when (p1x < p2x) or (p1x = p2x and p1y <= p2y)
                    then p2y else p1y end as y2
        from rawseg
    """


def _terrain_curvature_sql(tiles: str, pixels: str) -> str:
    """DuckDB twin of q_terrain_curvature: the Horn pivot CTE with the
    Zevenbergen-Thorne coefficient expressions mirrored verbatim from
    terrain.curvature_zt — D/E/F/G/H are exact dyadic so the G²+H²=0
    flatness branch and the raw-double hashes agree bit-for-bit."""
    piv = ", ".join(
        f"max(case when cand.dx = {dx} and cand.dy = {dy} then n.value end) as z{i + 1}"
        for i, (dy, dx) in enumerate((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)))
    return f"""
        with tl as (
          select image_id, crs, cell_width, cell_height, w, h,
                 row_number() over (partition by crs, cell_width, cell_height, w, h
                                    order by image_id) - 1 as rn
          from {tiles}
          where fmt = 'raw' and image_id < 'img000000000300'
        ),
        tl2 as (
          select image_id, crs, cell_width, cell_height, w, h,
                 rn % 40 as tx, rn // 40 as ty
          from tl
        ),
        px as (
          select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                 t.tx, t.ty,
                 t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                 case when isnan(p.value) then NULL
                      else cast(p.value as double) end as value
          from tl2 t join {pixels} p using (image_id)
        ),
        offs(dx, dy) as (values (-1,-1),(0,-1),(1,-1),(-1,0),(0,0),
                                (1,0),(-1,1),(0,1),(1,1)),
        cand as (
          select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                 c.tx, c.ty, c.gx, c.gy,
                 c.gx + o.dx as ngx, c.gy + o.dy as ngy, o.dx, o.dy
          from px c cross join offs o
        ),
        win as (
          select cand.image_id, cand.cell_width, cand.cell_height,
                 cast(cand.gx - cand.tx * cand.w as integer) as pcol,
                 cast(cand.gy - cand.ty * cand.h as integer) as prow,
                 {piv},
                 count(n.value) as nv
          from cand
          join px n
            on n.crs = cand.crs and n.cell_width = cand.cell_width
           and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
           and n.gx = cand.ngx and n.gy = cand.ngy
          group by 1, 2, 3, 4, 5
        ),
        co as (
          select image_id, prow, pcol,
                 ((z4 + z6) / 2.0 - z5) / (abs(cell_width) * abs(cell_width)) as d_,
                 ((z2 + z8) / 2.0 - z5) / (abs(cell_height) * abs(cell_height)) as e_,
                 (-z1 + z3 + z7 - z9) / (4.0 * abs(cell_width) * abs(cell_height)) as f_,
                 (-z4 + z6) / (2.0 * abs(cell_width)) as g_,
                 (z2 - z8) / (2.0 * abs(cell_height)) as h_
          from win where nv = 9
        )
        select image_id, prow, pcol,
               -2.0 * (d_ + e_) as curv,
               case when g_ * g_ + h_ * h_ = 0.0 then NULL
                    else 2.0 * (d_ * h_ * h_ + e_ * g_ * g_ - f_ * g_ * h_)
                         / (g_ * g_ + h_ * h_) end as plan_curv,
               case when g_ * g_ + h_ * h_ = 0.0 then NULL
                    else -2.0 * (d_ * g_ * g_ + e_ * h_ * h_ + f_ * g_ * h_)
                         / (g_ * g_ + h_ * h_) end as prof_curv
        from co
    """


def oracle_sql() -> dict[str, str]:
    tiles = f"read_parquet('{FD}/tiles.parquet')"
    points = f"read_parquet('{FD}/points.parquet')"
    pixels = f"read_parquet('{FD}/pixels.parquet')"
    polys = f"read_parquet('{FD}/polygons.parquet')"

    def prow(y="p.y"):
        return f"cast(round_even(({y} - t.y_origin)/t.cell_height - 0.5, 0) as bigint)"

    def pcol(x="p.x"):
        return f"cast(round_even(({x} - t.x_origin)/t.cell_width - 0.5, 0) as bigint)"

    sql = {
        "point_sample_join": f"""
            with j as (
              select p.point_id, t.image_id, {prow()} as prow, {pcol()} as pcol, t.caption
              from {points} p cross join {tiles} t
              where {prow()} between 0 and t.h - 1 and {pcol()} between 0 and t.w - 1
            )
            select j.point_id, j.image_id, j.prow, j.pcol,
                   case when isnan(px.value) then NULL else cast(px.value as double) end as value,
                   j.caption
            from j join {pixels} px
              on px.image_id = j.image_id and px.prow = j.prow and px.pcol = j.pcol
        """,
        "xyz_tile_assignment": _xyz_oracle(),
        "xyz_pyramid_stats": _xyz_pyramid_oracle(),
        "stream_xyz_pyramid": _xyz_pyramid_oracle(),
        "point_sample_join_i32": f"""
            with j as (
              select p.point_id, t.image_id, {prow()} as prow, {pcol()} as pcol
              from {points} p cross join {tiles} t
              where t.fmt = 'raw'
                and {prow()} between 0 and t.h - 1 and {pcol()} between 0 and t.w - 1
            )
            select j.point_id, j.image_id, j.prow, j.pcol,
                   case when isnan(px.value) then NULL
                        else cast(round_even(px.value * 4, 0) as bigint) end as ivalue
            from j join {pixels} px
              on px.image_id = j.image_id and px.prow = j.prow and px.pcol = j.pcol
        """,
        "netcdf_roundtrip": f"""
            select t.image_id, t.w, t.h, t.x_origin, t.y_origin,
                   count(*) as n_pixels,
                   count(*) filter (not isnan(px.value)) as n_valid,
                   coalesce(sum(cast(px.value as double)) filter (not isnan(px.value)), 0.0) as vsum
            from {tiles} t join {pixels} px using (image_id)
            where t.fmt = 'raw' and t.image_id < 'img000000000150'
            group by 1, 2, 3, 4, 5
        """,
        "netcdf_cdf5_roundtrip": f"""
            select t.image_id, t.w, t.h, t.x_origin, t.y_origin,
                   count(*) as n_pixels,
                   count(*) filter (not isnan(px.value)) as n_valid,
                   coalesce(sum(cast(px.value as double)) filter (not isnan(px.value)), 0.0) as vsum
            from {tiles} t join {pixels} px using (image_id)
            where t.fmt = 'raw' and t.image_id >= 'img000000000150'
              and t.image_id < 'img000000000300'
            group by 1, 2, 3, 4, 5
        """,
        "focal_halo_stats": f"""
            with tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            offs(dx, dy) as (values (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                    (0,1),(1,-1),(1,0),(1,1)),
            -- expand centers x offsets BEFORE the neighbor join so its
            -- gx/gy keys are plain columns: leaving the +dx arithmetic
            -- inside a 3-relation join lets the join-order search pick
            -- the layout-columns-only c><n pairing first (a near cross
            -- product -- the CLAUDE.md DuckDB join-order pitfall)
            cand as (
              select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                     c.gx, c.gy, c.gx + o.dx as ngx, c.gy + o.dy as ngy
              from px c cross join offs o
            ),
            nb as (
              select cand.image_id, cand.gx, cand.gy, n.value
              from cand
              join px n
                on n.crs = cand.crs and n.cell_width = cand.cell_width
               and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
               and n.gx = cand.ngx and n.gy = cand.ngy
              where n.value is not null
            ),
            cellagg as (
              select image_id, gx, gy, sum(value) as s from nb group by 1, 2, 3
            )
            select image_id, count(*) as focal_cells, sum(s) as focal_sum
            from cellagg group by 1
        """,
        "proximity": f"""
            with tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                     p.prow, p.pcol,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            offs(dy, dx) as (values
              {", ".join(f"({dy},{dx})" for dy in range(-2, 3) for dx in range(-2, 3))}),
            cand as (
              select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                     c.prow, c.pcol, c.gx + o.dx as ngx, c.gy + o.dy as ngy,
                     sqrt(cast(o.dx*o.dx + o.dy*o.dy as double)) as dist
              from px c cross join offs o
              where c.value is not null
            ),
            tg as (
              select cand.image_id, cand.prow, cand.pcol, cand.dist
              from cand
              join px n
                on n.crs = cand.crs and n.cell_width = cand.cell_width
               and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
               and n.gx = cand.ngx and n.gy = cand.ngy
              where n.value is not null and n.value >= 750.0
            ),
            agg as (
              select image_id, prow, pcol, min(dist) as prox, count(*) as n_t
              from tg group by 1, 2, 3
            )
            select c.image_id, c.prow, c.pcol, a.prox, coalesce(a.n_t, 0) as n_t
            from px c
            left join agg a on a.image_id = c.image_id and a.prow = c.prow and a.pcol = c.pcol
            where c.value is not null
        """,
        "focal_median": f"""
            with tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                     p.prow, p.pcol,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            offs(dx, dy) as (values
              (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
            cand as (
              select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                     c.prow, c.pcol, c.gx + o.dx as ngx, c.gy + o.dy as ngy
              from px c cross join offs o
            ),
            nb as (
              select cand.image_id, cand.prow, cand.pcol, n.value
              from cand
              join px n
                on n.crs = cand.crs and n.cell_width = cand.cell_width
               and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
               and n.gx = cand.ngx and n.gy = cand.ngy
              where n.value is not null
            ),
            med as (
              select image_id, prow, pcol, median(value) as med, count(*) as n
              from nb group by 1, 2, 3
            ),
            cnt as (
              select image_id, prow, pcol, value, count(*) as c
              from nb group by 1, 2, 3, 4
            ),
            rk as (
              select image_id, prow, pcol, value as maj,
                     row_number() over (partition by image_id, prow, pcol
                                        order by c desc, value asc) as rn
              from cnt
            )
            select m.image_id, m.prow, m.pcol, m.med, r.maj, m.n
            from med m join rk r
              on r.image_id = m.image_id and r.prow = m.prow
             and r.pcol = m.pcol and r.rn = 1
        """,
        "flow_d8": f"""
            with tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                     p.prow, p.pcol,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            -- ESRI D8 codes, pixel-space (dy = Δprow, dx = Δpcol);
            -- diagonal distance shares the kernel's sqrt(2.0) constant
            offs(dy, dx, code, dist) as (values
              (0,1,1,1.0),(1,1,2,sqrt(2.0)),(1,0,4,1.0),(1,-1,8,sqrt(2.0)),
              (0,-1,16,1.0),(-1,-1,32,sqrt(2.0)),(-1,0,64,1.0),(-1,1,128,sqrt(2.0))),
            cand as (
              select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                     c.prow, c.pcol, c.value as cval,
                     c.gx + o.dx as ngx, c.gy + o.dy as ngy, o.code, o.dist
              from px c cross join offs o
              where c.value is not null
            ),
            nb as (
              select cand.image_id, cand.prow, cand.pcol, cand.code,
                     (cand.cval - n.value) / cand.dist as drop_
              from cand
              join px n
                on n.crs = cand.crs and n.cell_width = cand.cell_width
               and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
               and n.gx = cand.ngx and n.gy = cand.ngy
              where n.value is not null
            ),
            agg as (
              select image_id, prow, pcol, max(drop_) as best,
                     count(*) filter (where drop_ > 0.0) as n_down
              from nb group by 1, 2, 3
            ),
            bd as (
              select nb.image_id, nb.prow, nb.pcol, min(nb.code) as code
              from nb join agg a
                on a.image_id = nb.image_id and a.prow = nb.prow and a.pcol = nb.pcol
              where nb.drop_ = a.best
              group by 1, 2, 3
            )
            select c.image_id, c.prow, c.pcol,
                   cast(case when a.best > 0.0 then b.code else 0 end as int) as d8,
                   coalesce(a.n_down, 0) as n_down
            from px c
            left join agg a on a.image_id = c.image_id and a.prow = c.prow and a.pcol = c.pcol
            left join bd b on b.image_id = c.image_id and b.prow = c.prow and b.pcol = c.pcol
            where c.value is not null
        """,
        "focal_convolve": f"""
            with tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            -- 3x3 binomial weights: sixteenths (dyadic -> w*v exact)
            offs(dx, dy, wt) as (values
              (-1,-1,0.0625),(-1,0,0.125),(-1,1,0.0625),
              ( 0,-1,0.125 ),( 0,0,0.25 ),( 0,1,0.125 ),
              ( 1,-1,0.0625),( 1,0,0.125),( 1,1,0.0625)),
            cand as (
              select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                     c.gx, c.gy, c.gx + o.dx as ngx, c.gy + o.dy as ngy, o.wt
              from px c cross join offs o
            ),
            nb as (
              select cand.image_id, cand.gx, cand.gy, cand.wt, n.value
              from cand
              join px n
                on n.crs = cand.crs and n.cell_width = cand.cell_width
               and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
               and n.gx = cand.ngx and n.gy = cand.ngy
              where n.value is not null
            ),
            cellagg as (
              select image_id, gx, gy, sum(wt * value) as s from nb group by 1, 2, 3
            )
            select image_id, count(*) as conv_cells, sum(s) as conv_sum
            from cellagg group by 1
        """,
        "lattice_chips": f"""
            with tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            offs(dy, dx) as (values
              {", ".join(f"({dy},{dx})" for dy in range(-2, 3) for dx in range(-2, 3))}),
            cand as (
              select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                     c.gx, c.gy, c.gx + o.dx as ngx, c.gy + o.dy as ngy
              from px c cross join offs o
              where c.gx % 7 = 0 and c.gy % 7 = 0 and c.value is not null
            )
            select cand.image_id, cand.gx, cand.gy,
                   count(*) as n_valid, sum(n.value) as vsum,
                   min(n.value) as vmin, max(n.value) as vmax
            from cand
            join px n
              on n.crs = cand.crs and n.cell_width = cand.cell_width
             and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
             and n.gx = cand.ngx and n.gy = cand.ngy
            where n.value is not null
            group by 1, 2, 3
        """,
        "terrain_horn": _terrain_horn_sql(tiles, pixels),
        "terrain_curvature": _terrain_curvature_sql(tiles, pixels),
        "contour_segments": _contour_sql(tiles, pixels),
        "retile_split": f"""
            select t.image_id || '_' || cast(p.prow // (t.h // 4) as varchar)
                     || '_' || cast(p.pcol // (t.w // 4) as varchar) as image_id,
                   t.x_origin + (p.pcol // (t.w // 4)) * (t.w / 4) * t.cell_width
                     as x_origin,
                   t.y_origin + (p.prow // (t.h // 4)) * (t.h / 4) * t.cell_height
                     as y_origin,
                   cast(t.w // 4 as integer) as w,
                   cast(t.h // 4 as integer) as h,
                   count(*) as n_pixels,
                   count(*) filter (not isnan(p.value)) as n_valid,
                   coalesce(sum(cast(p.value as double))
                            filter (not isnan(p.value)), 0.0) as vsum
            from {tiles} t join {pixels} p using (image_id)
            where t.fmt = 'raw' and t.image_id < 'img000000000300'
            group by all
        """,
        "augment_flips": f"""
            with t as (
              select image_id, w, h from {tiles}
              where fmt = 'raw' and image_id < 'img000000000100'
            ),
            allpx as (
              select t.image_id || ':hflip' as image_id,
                     p.prow, cast(t.w - 1 - p.pcol as int) as pcol, p.value
              from t join {pixels} p using (image_id)
              union all
              select t.image_id || ':vflip' as image_id,
                     cast(t.h - 1 - p.prow as int) as prow, p.pcol, p.value
              from t join {pixels} p using (image_id)
              union all
              select t.image_id || ':rot180' as image_id,
                     cast(t.h - 1 - p.prow as int) as prow,
                     cast(t.w - 1 - p.pcol as int) as pcol, p.value
              from t join {pixels} p using (image_id)
            )
            select image_id, prow, pcol,
                   case when isnan(value) then NULL
                        else cast(value as double) end as value
            from allpx
        """,
        "epoch_trend": f"""
            with tl as (
              select image_id, w, h,
                     row_number() over (partition by w, h order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and w = 16 and h = 16
                and image_id < 'img000000001188'
            ),
            st as (select image_id, rn % 3 as epoch, rn // 3 as stack_id from tl),
            full_st as (
              select stack_id from st group by stack_id having count(*) = 3
            ),
            px as (
              select s.stack_id, s.epoch, p.prow, p.pcol,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as v
              from st s
              join full_st using (stack_id)
              join {pixels} p using (image_id)
            ),
            pv as (
              select stack_id, prow, pcol,
                     max(case when epoch = 0 then v end) as v0,
                     max(case when epoch = 1 then v end) as v1,
                     max(case when epoch = 2 then v end) as v2
              from px group by 1, 2, 3
            )
            select stack_id, prow, pcol,
                   (v2 - v0) / 2.0 as slope,
                   ((v0 + v1) + v2) / 3.0 as mean
            from pv
            where v0 is not null and v1 is not null and v2 is not null
        """,
        "point_chips": f"""
            with j as (
              select p.point_id, t.image_id, t.w, t.h,
                     {prow()} as prow, {pcol()} as pcol
              from {points} p cross join {tiles} t
              where t.fmt = 'raw'
                and {prow()} between 0 and t.h - 1 and {pcol()} between 0 and t.w - 1
            ),
            b as (
              select point_id, image_id, w, h,
                     greatest(pcol - 2, 0) as c0, least(pcol + 2, w - 1) as c1,
                     greatest(prow - 2, 0) as r0, least(prow + 2, h - 1) as r1
              from j
            ),
            px as (
              select b.point_id, b.image_id,
                     cast(b.c1 - b.c0 + 1 as int) as chip_w,
                     cast(b.r1 - b.r0 + 1 as int) as chip_h,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as v
              from b join {pixels} p
                on p.image_id = b.image_id
               and p.prow between b.r0 and b.r1 and p.pcol between b.c0 and b.c1
            )
            select point_id, image_id, chip_w, chip_h,
                   count(v) as n_valid, sum(v) as vsum, min(v) as vmin, max(v) as vmax
            from px group by 1, 2, 3, 4
        """,
        "gap_fill": f"""
            with tl as (
              select image_id, w, h,
                     row_number() over (partition by w, h order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and w = 16 and h = 16
                and image_id < 'img000000001188'
            ),
            st as (select image_id, rn % 3 as epoch, rn // 3 as stack_id from tl),
            -- the kernel skips incomplete stacks (len != 3); qualify the
            -- same way (q8-format gaps make the raw-tile count non-divisible)
            full_st as (
              select stack_id from st group by stack_id having count(*) = 3
            ),
            px as (
              select s.stack_id, s.epoch, p.prow, p.pcol,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as v
              from st s
              join full_st using (stack_id)
              join {pixels} p using (image_id)
            ),
            f as (
              select stack_id, cast(epoch as int) as epoch, prow, pcol,
                     last_value(v ignore nulls) over (
                       partition by stack_id, prow, pcol order by epoch
                       rows between unbounded preceding and current row) as filled
              from px
            )
            select * from f where filled is not null
        """,
        "pansharpen": f"""
            with tl as (
              select image_id, w, h,
                     row_number() over (partition by w, h order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and w = 16 and h = 16
                and image_id < 'img000000001200'
            ),
            st as (select image_id, rn % 4 as band, rn // 4 as stack_id from tl),
            px as (
              select s.stack_id, s.band, p.prow, p.pcol,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as v
              from st s join {pixels} p using (image_id)
            ),
            pv as (
              select stack_id, prow, pcol,
                     max(case when band = 0 then v end) as v0,
                     max(case when band = 1 then v end) as v1,
                     max(case when band = 2 then v end) as v2,
                     max(case when band = 3 then v end) as v3
              from px group by 1, 2, 3
            ),
            ok as (
              select * from pv
              where v0 is not null and v1 is not null
                and v2 is not null and v3 is not null
            )
            select stack_id, cast(0 as int) as band, prow, pcol,
                   case when (v0 + v1 + v2) = 0 then NULL
                        else (v0 * v3) / (v0 + v1 + v2) end as sharp from ok
            union all
            select stack_id, cast(1 as int) as band, prow, pcol,
                   case when (v0 + v1 + v2) = 0 then NULL
                        else (v1 * v3) / (v0 + v1 + v2) end as sharp from ok
            union all
            select stack_id, cast(2 as int) as band, prow, pcol,
                   case when (v0 + v1 + v2) = 0 then NULL
                        else (v2 * v3) / (v0 + v1 + v2) end as sharp from ok
        """,
        "reclassify": f"""
            select image_id,
                   cast(case when value < 256.0 then 1
                             when value < 512.0 then 2
                             when value < 768.0 then 3
                             else 4 end as int) as cls,
                   count(*) as n
            from {pixels}
            where not isnan(value)
              and image_id in (select image_id from {tiles} where fmt = 'raw')
            group by 1, 2
        """,
        "qa_cloud_mask": f"""
            with v as (
              select image_id, cast(value as double) as value,
                     cast(floor(cast(value as double) * 4.0) as bigint) as qa
              from {pixels} where not isnan(value)
            ),
            agg as (
              select image_id, count(*) as n_valid,
                     count(*) filter (where (qa // 8) % 2 = 1) as n_cloud,
                     count(*) filter (where (qa // 16) % 2 = 1) as n_shadow,
                     count(*) filter (where (qa // 32) % 2 = 1) as n_snow,
                     count(*) filter (where (qa // 8) % 2 = 0) as n_clear,
                     coalesce(sum(value) filter (where (qa // 8) % 2 = 0), 0.0) as clear_vsum
              from v group by image_id
            )
            select t.image_id,
                   coalesce(a.n_valid, 0) as n_valid,
                   coalesce(a.n_cloud, 0) as n_cloud,
                   coalesce(a.n_shadow, 0) as n_shadow,
                   coalesce(a.n_snow, 0) as n_snow,
                   coalesce(a.n_clear, 0) as n_clear,
                   coalesce(a.clear_vsum, 0.0) as clear_vsum
            from {tiles} t left join agg a using (image_id)
            where t.fmt = 'raw'
        """,
        "tile_histogram": f"""
            select cast(floor((cast(p.value as double) - 0.0) / 16.0) as bigint) as bin,
                   count(*) as n_pixels
            from {tiles} t join {pixels} p using (image_id)
            where t.fmt = 'raw' and not isnan(p.value)
              and cast(p.value as double) >= 0.0 and cast(p.value as double) < 1024.0
            group by 1
        """,
        "layer_ndvi": f"""
            with ids as (
              select image_id,
                     cast(substring(image_id, 4, 12) as bigint) as i
              from {tiles} where fmt = 'raw'
            ),
            pr as (
              select a.image_id as image_id, b.image_id as bid
              from ids a join ids b on b.i = a.i + 153
              where a.i < 100
            )
            select pr.image_id, pa.prow, pa.pcol,
                   case when (cast(pa.value as double) + cast(pb.value as double)) = 0.0
                        then NULL
                        else (cast(pa.value as double) - cast(pb.value as double))
                             / (cast(pa.value as double) + cast(pb.value as double))
                   end as ndiff
            from pr
            join {pixels} pa on pa.image_id = pr.image_id
            join {pixels} pb on pb.image_id = pr.bid
                            and pb.prow = pa.prow and pb.pcol = pa.pcol
            where not isnan(pa.value) and not isnan(pb.value)
        """,
        # recursive-CTE transitive closure over the masked-pixel
        # adjacency graph; min-ancestor per node = the same canonical
        # region id the distributed three-stage CCL produces
        "polygonize": f"""
            with recursive tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
                and w = 64 and h = 48
            ),
            tl2 as (
              select image_id, w, h, rn % 6 as tx, rn // 6 as ty from tl
            ),
            n as (
              select (t.ty * t.h + p.prow) * 4294967296 + (t.tx * t.w + p.pcol) as k,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy
              from tl2 t join {pixels} p using (image_id)
              where not isnan(p.value) and p.value >= 750.0
            ),
            e as (
              select a.k as src, b.k as dst
              from n a join n b on b.gx = a.gx + 1 and b.gy = a.gy
              union all
              select a.k as src, b.k as dst
              from n a join n b on b.gx = a.gx and b.gy = a.gy + 1
            ),
            eu as (
              select src, dst from e union all select dst as src, src as dst from e
            ),
            r as (
              select k as node, k as anc from n
              union
              select eu.dst as node, r.anc from r join eu on eu.src = r.node
            ),
            comp as (
              select node, min(anc) as root from r group by node
            )
            select root as region_id, count(*) as n_pixels,
                   min(node % 4294967296) as gx_min,
                   max(node % 4294967296) as gx_max,
                   min(node // 4294967296) as gy_min,
                   max(node // 4294967296) as gy_max
            from comp group by root
        """,
        # sieve = the polygonize closure + small-root member removal,
        # subtracted relationally from the per-tile stats
        "sieve_small_regions": f"""
            with recursive tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
                and w = 64 and h = 48
            ),
            tl2 as (
              select image_id, w, h, rn % 6 as tx, rn // 6 as ty from tl
            ),
            base as (
              select t.image_id,
                     (t.ty * t.h + p.prow) * 4294967296 + (t.tx * t.w + p.pcol) as k,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as v
              from tl2 t join {pixels} p using (image_id)
            ),
            n as (select k, gx, gy from base where v >= 750.0),
            e as (
              select a.k as src, b.k as dst
              from n a join n b on b.gx = a.gx + 1 and b.gy = a.gy
              union all
              select a.k as src, b.k as dst
              from n a join n b on b.gx = a.gx and b.gy = a.gy + 1
            ),
            eu as (
              select src, dst from e union all select dst as src, src as dst from e
            ),
            r as (
              select k as node, k as anc from n
              union
              select eu.dst as node, r.anc from r join eu on eu.src = r.node
            ),
            comp as (select node, min(anc) as root from r group by node),
            sizes as (select root, count(*) as nsz from comp group by root),
            rm as (
              select c.node from comp c join sizes s using (root) where s.nsz < 3
            )
            select b.image_id,
                   count(*) as n_pixels,
                   count(b.v) filter (rm.node is null) as n_valid,
                   coalesce(sum(b.v) filter (rm.node is null), 0.0) as vsum
            from base b left join rm on rm.node = b.k
            group by 1
        """,
        "bool_mask_counts": f"""
            select t.image_id, count(*) as n_pixels,
                   count(*) filter (not isnan(px.value) and px.value > 500.0) as n_true
            from {tiles} t join {pixels} px using (image_id)
            where t.fmt = 'raw'
            group by t.image_id
        """,
        "tile_cell_assignment": f"""
            with t as (
              select image_id,
                greatest(0, least({NX - 1}, cast(floor((x_origin + 180.0) / {CSZ}) as bigint))) as ix0,
                greatest(0, least({NX - 1}, cast(floor((x_origin + cell_width * w + 180.0) / {CSZ}) as bigint))) as ix1,
                greatest(0, least({NY - 1}, cast(floor((90.0 - y_origin) / {CSZ}) as bigint))) as iy0,
                greatest(0, least({NY - 1}, cast(floor((90.0 - (y_origin + cell_height * h)) / {CSZ}) as bigint))) as iy1
              from {tiles}
            )
            select image_id, ({LEVEL} * {PACK} + iy * {IYS} + ix) as cell_id
            from t, unnest(range(t.iy0, t.iy1 + 1)) as ry(iy), unnest(range(t.ix0, t.ix1 + 1)) as rx(ix)
        """,
        "tile_z_order": f"""
            select image_id,
                   {cells.z_cell_id_sql("x_origin + cell_width * w / 2.0",
                                        "y_origin + cell_height * h / 2.0", LEVEL)} as z_id
            from {tiles}
        """,
        "tile_windows_for_polygons": f"""
            with w as (
              select t.image_id, p.poly_id, t.h as rows_, t.w as cols_,
                {prow("p.ymax")} as row_start, {pcol("p.xmin")} as col_start,
                {prow("p.ymin")} + 1 as row_end, {pcol("p.xmax")} + 1 as col_end
              from {tiles} t cross join (select * from {polys} where is_rect) p
            )
            select image_id, poly_id,
              greatest(row_start, 0) as row_start, greatest(col_start, 0) as col_start,
              least(row_end, rows_) as row_end, least(col_end, cols_) as col_end
            from w
            where not (row_end < 0 or col_end < 0 or row_start > rows_ or col_start > cols_)
        """,
        "tile_stats": f"""
            select t.image_id,
                   count(*) as n_pixels,
                   count(*) filter (not isnan(px.value)) as n_valid,
                   coalesce(sum(cast(px.value as double)) filter (not isnan(px.value)), 0.0) as vsum,
                   min(cast(px.value as double)) filter (not isnan(px.value)) as vmin,
                   max(cast(px.value as double)) filter (not isnan(px.value)) as vmax
            from {tiles} t join {pixels} px using (image_id)
            where t.fmt = 'raw'
            group by t.image_id
        """,
        "stretch_params": f"""
            select t.image_id,
                   quantile_cont(cast(px.value as double), 0.02)
                     filter (not isnan(px.value)) as lo,
                   quantile_cont(cast(px.value as double), 0.98)
                     filter (not isnan(px.value)) as hi,
                   count(*) filter (not isnan(px.value)) as n_valid
            from {tiles} t join {pixels} px using (image_id)
            where t.fmt = 'raw'
            group by t.image_id
        """,
        "grid_union": f"""
            select min(x_origin) as xmin,
                   min(y_origin + cell_height * h) as ymin,
                   max(x_origin + cell_width * w) as xmax,
                   max(y_origin) as ymax,
                   min(cell_width) as min_cell_width,
                   max(cell_height) as max_cell_height,
                   count(*) as n_tiles
            from {tiles}
        """,
        "points_in_polygons": f"""
            select p.point_id, g.poly_id, p.x, p.y, g.burn_value
            from {points} p cross join (select * from {polys} where is_rect) g
            where p.x >= g.xmin and p.x < g.xmax and p.y >= g.ymin and p.y < g.ymax
        """,
        "jpeg_roundtrip": f"""
            select image_id, w as width, h as height, true as psnr_ge_40
            from {tiles} where fmt = 'raw' and image_id < 'img000000000200'
        """,
        "media_render": f"""
            select image_id, w as width, h as height, true as roundtrip_exact
            from {tiles} where image_id < 'img000000000050'
        """,
        "gpkg_tiles_roundtrip": f"""
            select image_id,
                   x_origin as xmin,
                   y_origin + cell_height * h as ymin,
                   x_origin + cell_width * w as xmax,
                   y_origin as ymax,
                   true as meta_ok, true as png_exact
            from {tiles} where fmt = 'raw' and image_id < 'img000000000100'
        """,
        "gpkg_roundtrip": f"""
            select poly_id,
                   cast(len(ring) as int) as n_points,
                   ring[1].x as x0, ring[1].y as y0,
                   list_min(list_transform(ring, p -> p.x)) as rxmin,
                   list_max(list_transform(ring, p -> p.y)) as rymax,
                   burn_value
            from {polys}
        """,
        "multipolygon_pip": f"""
            with r as (
              select round_even(xmin*4, 0)/4 + 0.125 as x0, round_even(ymin*4, 0)/4 + 0.125 as y0,
                     round_even(xmax*4, 0)/4 + 0.125 as x1, round_even(ymax*4, 0)/4 + 0.125 as y1,
                     cast(floor((row_number() over (order by poly_id) - 1) / 2.0) as bigint) as poly_id
              from {polys} where is_rect
            )
            select distinct p.point_id, r.poly_id
            from {points} p join r
              on p.x >= r.x0 and p.x < r.x1 and p.y >= r.y0 and p.y < r.y1
        """,
        "rasterize_add": f"""
            with win as (
              select poly_id, burn_value, xmin, ymin, xmax, ymax,
                greatest(cast(round_even((ymax - 90.0)/(-0.25) - 0.5, 0) as bigint), 0) as rs,
                greatest(cast(round_even((xmin + 180.0)/0.25 - 0.5, 0) as bigint), 0) as cs,
                least(cast(round_even((ymin - 90.0)/(-0.25) - 0.5, 0) as bigint) + 1, 720) as re,
                least(cast(round_even((xmax + 180.0)/0.25 - 0.5, 0) as bigint) + 1, 1440) as ce
              from {polys} where is_rect
            ),
            burned as (
              select w.poly_id, w.burn_value, r.row_, c.col_
              from win w,
                   unnest(range(w.rs, w.re)) as r(row_),
                   unnest(range(w.cs, w.ce)) as c(col_)
              where (-180.0 + 0.25 * (c.col_ + 0.5)) >= w.xmin and (-180.0 + 0.25 * (c.col_ + 0.5)) < w.xmax
                and (90.0 + (-0.25) * (r.row_ + 0.5)) >= w.ymin and (90.0 + (-0.25) * (r.row_ + 0.5)) < w.ymax
            )
            select row_ as row, col_ as col, sum(burn_value) as value
            from burned group by 1, 2
        """,
        "rasterize_replace": f"""
            with win as (
              select poly_id, burn_value, xmin, ymin, xmax, ymax,
                greatest(cast(round_even((ymax - 90.0)/(-0.25) - 0.5, 0) as bigint), 0) as rs,
                greatest(cast(round_even((xmin + 180.0)/0.25 - 0.5, 0) as bigint), 0) as cs,
                least(cast(round_even((ymin - 90.0)/(-0.25) - 0.5, 0) as bigint) + 1, 720) as re,
                least(cast(round_even((xmax + 180.0)/0.25 - 0.5, 0) as bigint) + 1, 1440) as ce
              from {polys} where is_rect
            ),
            burned as (
              select w.poly_id, w.burn_value, r.row_, c.col_
              from win w,
                   unnest(range(w.rs, w.re)) as r(row_),
                   unnest(range(w.cs, w.ce)) as c(col_)
              where (-180.0 + 0.25 * (c.col_ + 0.5)) >= w.xmin and (-180.0 + 0.25 * (c.col_ + 0.5)) < w.xmax
                and (90.0 + (-0.25) * (r.row_ + 0.5)) >= w.ymin and (90.0 + (-0.25) * (r.row_ + 0.5)) < w.ymax
            )
            select row_ as row, col_ as col, arg_max(burn_value, poly_id) as value
            from burned group by 1, 2
        """,
        "tiles_in_polygons_semi": f"""
            select t.image_id from {tiles} t
            where exists (
              select 1 from {polys} g
              where t.x_origin < g.xmax and (t.x_origin + t.cell_width * t.w) > g.xmin
                and (t.y_origin + t.cell_height * t.h) < g.ymax and t.y_origin > g.ymin
            )
        """,
        "knn_tiles": f"""
            with tc as (
              select image_id,
                x_origin + cell_width * w / 2.0 as cx,
                y_origin + cell_height * h / 2.0 as cy,
                greatest(0, least({NX - 1}, cast(floor((x_origin + 180.0) / {CSZ}) as bigint))) as ix0,
                greatest(0, least({NX - 1}, cast(floor((x_origin + cell_width * w + 180.0) / {CSZ}) as bigint))) as ix1,
                greatest(0, least({NY - 1}, cast(floor((90.0 - y_origin) / {CSZ}) as bigint))) as iy0,
                greatest(0, least({NY - 1}, cast(floor((90.0 - (y_origin + cell_height * h)) / {CSZ}) as bigint))) as iy1
              from {tiles}
            ),
            tcell as (
              select image_id, cx, cy, (iy * {IYS} + ix) as cyx
              from tc, unnest(range(tc.iy0, tc.iy1 + 1)) as ry(iy), unnest(range(tc.ix0, tc.ix1 + 1)) as rx(ix)
            ),
            pc as (
              select point_id, x, y,
                greatest(0, least({NX - 1}, cast(floor((x + 180.0) / {CSZ}) as bigint))) as ix,
                greatest(0, least({NY - 1}, cast(floor((90.0 - y) / {CSZ}) as bigint))) as iy
              from {points}
            ),
            pcell as (
              select distinct point_id, x, y,
                (greatest(0, least({NY - 1}, iy + d0.dy)) * {IYS}
                 + ((ix + d1.dx) % {NX} + {NX}) % {NX}) as cyx
              from pc, unnest(range(-2, 3)) as d0(dy), unnest(range(-2, 3)) as d1(dx)
            ),
            cand as (
              select distinct p.point_id, p.x, p.y, t.image_id, t.cx, t.cy
              from pcell p join tcell t using (cyx)
            ),
            ranked as (
              select point_id, image_id,
                sqrt((cx - x) * (cx - x) + (cy - y) * (cy - y)) as dist,
                row_number() over (
                  partition by point_id
                  order by sqrt((cx - x) * (cx - x) + (cy - y) * (cy - y)) asc, image_id asc
                ) as rank
              from cand
            )
            select point_id, image_id, rank, dist from ranked where rank <= 3
        """,
        "raster_algebra": f"""
            with v as (
              select px.image_id, px.value,
                     least(greatest(cast(px.value as double) * 2.0 + 10.0, 0.0), 1500.0) as v2
              from {tiles} t join {pixels} px using (image_id)
              where t.fmt = 'raw'
            )
            select image_id,
                   count(*) as n_pixels,
                   count(*) filter (not isnan(value) and v2 < 1400.0) as n_valid,
                   coalesce(sum(v2) filter (not isnan(value) and v2 < 1400.0), 0.0) as vsum,
                   min(v2) filter (not isnan(value) and v2 < 1400.0) as vmin,
                   max(v2) filter (not isnan(value) and v2 < 1400.0) as vmax
            from v group by image_id
        """,
        "trim_grid": f"""
            select t.image_id,
                   cast(max(px.pcol) - min(px.pcol) + 1 as int) as w,
                   cast(max(px.prow) - min(px.prow) + 1 as int) as h,
                   t.x_origin + min(px.pcol) * t.cell_width as x_origin,
                   t.y_origin + min(px.prow) * t.cell_height as y_origin
            from {tiles} t join {pixels} px using (image_id)
            where not isnan(px.value)
            group by t.image_id, t.x_origin, t.y_origin, t.cell_width, t.cell_height
        """,
        "merge_mean": f"""
            {_resample_cte(tiles, pixels, fmt_filter="where fmt = 'raw'")}
            select trow, tcol,
                   sum(cast(value as double)) / count(*) as value,
                   count(*) as n
            from sampled where not isnan(value)
            group by trow, tcol
        """,
        "temporal_composite": f"""
            {_resample_cte(tiles, pixels, fmt_filter="where fmt = 'raw'")}
            , obs as (
              select trow, tcol, cast(value as double) as value,
                     cast(substring(image_id, 4, 12) as bigint) % 3 as epoch
              from sampled where not isnan(value)
            ),
            m as (
              select trow, tcol, max(value) as value, count(*) as n_obs
              from obs group by trow, tcol
            )
            select m.trow, m.tcol, m.value, min(o.epoch) as epoch, m.n_obs
            from m join obs o
              on o.trow = m.trow and o.tcol = m.tcol and o.value = m.value
            group by m.trow, m.tcol, m.value, m.n_obs
        """,
        "mosaic_first": f"""
            {_resample_cte(tiles, pixels, fmt_filter="")}
            select trow, tcol, arg_min(cast(value as double), image_id) as value
            from sampled where not isnan(value)
            group by trow, tcol
        """,
        "to_grid_average": f"""
            with p as (
              select px.image_id, cast(px.value as double) as value,
                cast(round_even(((t.x_origin + t.cell_width * (px.pcol + 0.5)) - (-180.0)) / 0.25 - 0.5, 0) as bigint) as tcol,
                cast(round_even(((t.y_origin + t.cell_height * (px.prow + 0.5)) - 90.0) / (-0.25) - 0.5, 0) as bigint) as trow
              from {tiles} t join {pixels} px using (image_id)
              where t.fmt = 'raw' and not isnan(px.value)
            )
            select image_id, trow, tcol, sum(value) / count(*) as value, count(*) as n
            from p
            where trow between 0 and 719 and tcol between 0 and 1439
            group by image_id, trow, tcol
        """,
        "bias_correct": f"""
            with fine as ({_rasterize_sql(polys, 0.25, 720, 1440, "sum")}),
                 coarse as ({_rasterize_sql(polys, 1.0, 180, 360, "sum")}),
                 f as (
                   select row, col, value,
                     cast(round_even(((90.0 + (-0.25) * (row + 0.5)) - 90.0) / (-1.0) - 0.5, 0) as bigint) as crow,
                     cast(round_even(((-180.0 + 0.25 * (col + 0.5)) + 180.0) / 1.0 - 0.5, 0) as bigint) as ccol
                   from fine
                 ),
                 up as (select crow, ccol, sum(value) / count(value) as up from f group by 1, 2),
                 bias as (
                   select up.crow, up.ccol, up.up - c.value as bias
                   from up join coarse c on c.row = up.crow and c.col = up.ccol
                 )
            select f.row, f.col, f.value - b.bias as value
            from f join bias b using (crow, ccol)
        """,
        "linear_downscale": f"""
            with fine as ({_rasterize_sql(polys, 0.25, 720, 1440, "sum")}),
                 coarse as ({_rasterize_sql(polys, 1.0, 180, 360, "sum")}),
                 f as (
                   select row, col, value,
                     cast(round_even(((90.0 + (-0.25) * (row + 0.5)) - 90.0) / (-1.0) - 0.5, 0) as bigint) as crow,
                     cast(round_even(((-180.0 + 0.25 * (col + 0.5)) + 180.0) / 1.0 - 0.5, 0) as bigint) as ccol
                   from fine
                 ),
                 up as (select crow, ccol, sum(value) / count(value) as up from f group by 1, 2),
                 sc as (
                   select up.crow, up.ccol,
                     case when c.value = 0 then 0.0
                          when up.up = 0 then 0.0
                          else c.value / up.up end as scale
                   from up join coarse c on c.row = up.crow and c.col = up.ccol
                 ),
                 f2 as (
                   select f.row, f.col, f.value * sc.scale as value, sc.scale
                   from f join sc using (crow, ccol)
                 ),
                 lattice as (
                   select r.frow, cc.fcol, c.value as vc
                   from coarse c,
                        unnest(range(c.row * 4, c.row * 4 + 4)) as r(frow),
                        unnest(range(c.col * 4, c.col * 4 + 4)) as cc(fcol)
                 )
            select l.frow as row, l.fcol as col,
                   coalesce(f2.value, l.vc) as value,
                   coalesce(f2.scale, 1.0) as scale,
                   0.0 as bias
            from lattice l
            left join f2 on f2.row = l.frow and f2.col = l.fcol
        """,
        "exact_dedup": """
            select min(doc_id) as doc_id, count(*) as n_dups
            from documents group by text
        """,
        "ngram_dedup_pairs": _JACCARD_SQL,
        "minhash_lsh_pairs": _JACCARD_SQL,
        # streaming incremental dedup: pair (a<b) evaluated exactly once
        # (in the later doc's micro-batch) → per-doc min reduce equals
        # the batch exact-Jaccard answer; same recall license as
        # minhash_lsh_pairs
        "stream_minhash_dedup": f"""
            select doc_b as doc_id, min(doc_a) as dup_of,
                   arg_min(j, doc_a) as j
            from ( {_JACCARD_SQL} ) pairs
            group by doc_b
        """,
        "minhash_lsh_bucketed": _JACCARD_SQL,
        # blocked split / deterministic sampling: the md5-prefix hash is
        # the simhash_md5 cross-engine pattern (60 bits, exact in int64
        # and in the single double division)
        "spatial_split": f"""
            with t as (
              select image_id,
                     cast(floor(x_origin / 1.0) as bigint) as block_x,
                     cast(floor(y_origin / 1.0) as bigint) as block_y
              from {tiles}
            )
            select image_id, block_x, block_y,
                   case when cast(('0x' || substr(md5(concat_ws('_',
                            cast(block_x as varchar), cast(block_y as varchar),
                            'v1')), 1, 15)) as bigint)
                          / 1152921504606846976.0 < 0.2
                        then 'val' else 'train' end as split
            from t
        """,
        "stratified_cell_cap": f"""
            with t as (
              select image_id,
                greatest(0, least({NX - 1}, cast(floor((x_origin + 180.0) / {CSZ}) as bigint))) as ix0,
                greatest(0, least({NX - 1}, cast(floor((x_origin + cell_width * w + 180.0) / {CSZ}) as bigint))) as ix1,
                greatest(0, least({NY - 1}, cast(floor((90.0 - y_origin) / {CSZ}) as bigint))) as iy0,
                greatest(0, least({NY - 1}, cast(floor((90.0 - (y_origin + cell_height * h)) / {CSZ}) as bigint))) as iy1
              from {tiles}
            ),
            c as (
              select image_id, ({LEVEL} * {PACK} + iy * {IYS} + ix) as cell_id
              from t, unnest(range(t.iy0, t.iy1 + 1)) as ry(iy), unnest(range(t.ix0, t.ix1 + 1)) as rx(ix)
            ),
            r as (
              select cell_id, image_id,
                     row_number() over (partition by cell_id order by
                       cast(('0x' || substr(md5(concat_ws('|', image_id, 'v1')), 1, 15)) as bigint) asc,
                       image_id asc) as rk
              from c
            )
            select cell_id, image_id from r where rk <= 3
        """,
        "hash_sample": """
            select doc_id, lang from documents
            where cast(('0x' || substr(md5(concat_ws('|',
                    cast(doc_id as varchar), 'v1')), 1, 15)) as bigint)
                  / 1152921504606846976.0 < 0.1
        """,
        # the sequential spelling of the shard assignment: one global
        # window in hash order; the Spark side must reproduce it with
        # the two-phase distributed prefix sum. Pure int64 arithmetic.
        "pack_shards": """
            with o as (
              select doc_id, n_chars,
                     cast(('0x' || substr(md5(concat_ws('|',
                         cast(doc_id as varchar), 'v1')), 1, 15)) as bigint) as hkey
              from documents
            )
            select doc_id, n_chars,
                   coalesce(sum(n_chars) over (order by hkey, doc_id
                       rows between unbounded preceding and 1 preceding), 0)
                   // 4096 as shard_id
            from o
        """,
        # the 48-zone rect lattice is regenerated from the same literal
        # expressions as _zone_lattice; pixel centroids use the
        # pixel_centroids formula, sums exact (quarter-integer raw pixels)
        "zonal_stats": f"""
            with z as (
              select range as i,
                     -180.0 + (range % 12) * 30.0 + 1.0 / 3.0 as xmin,
                     45.0 + (range // 12) * 9.0 + 1.0 / 3.0 as ymin
              from range(48)
            ),
            zz as (select i as poly_id, xmin, ymin,
                          xmin + 30.0 as xmax, ymin + 9.0 as ymax from z),
            px as (
              select g.poly_id, cast(px.value as double) as v
              from {pixels} px
              join {tiles} t using (image_id)
              join zz g
                on t.x_origin + t.cell_width * (px.pcol + 0.5) >= g.xmin
               and t.x_origin + t.cell_width * (px.pcol + 0.5) <  g.xmax
               and t.y_origin + t.cell_height * (px.prow + 0.5) >= g.ymin
               and t.y_origin + t.cell_height * (px.prow + 0.5) <  g.ymax
              where t.fmt = 'raw' and not isnan(px.value)
            )
            select poly_id, count(*) as n_valid, sum(v) as vsum,
                   min(v) as vmin, max(v) as vmax,
                   sum(v) / count(*) as vmean
            from px group by poly_id
        """,
        "audio_wav_features": """
            with d as (select doc_id from documents where doc_id < 100),
            s as (
              select d.doc_id, i.range as i,
                     ((i.range * (3 + d.doc_id % 7) + d.doc_id * 11) % 65536) - 32768 as v
              from d cross join range(800) i
            ),
            s2 as (
              select doc_id, i, v,
                     lead(v) over (partition by doc_id order by i) as nv
              from s
            )
            select doc_id,
                   16000 as sample_rate,
                   cast(800 as bigint) as n_samples,
                   800 / 16000.0 as duration_s,
                   sum(v) / 800.0 as mean_amp,
                   cast(sum(v * v) as bigint) as sum_sq,
                   cast(sum(case when nv is not null and ((v < 0) <> (nv < 0))
                            then 1 else 0 end) as bigint) as zero_crossings
            from s2 group by doc_id
        """,
        "simhash_md5": """
            with tok as (
              select doc_id, unnest(list_filter(string_split(text, ' '), t -> len(t) > 0)) as tok
              from documents
            ),
            th as (
              select doc_id, cast(('0x' || substr(md5(tok), 1, 15)) as bigint) as h from tok
            ),
            vote as (
              select doc_id, b.range as b,
                     sum(case when (h >> b.range) & 1 = 1 then 1 else -1 end) as s
              from th cross join range(60) b
              group by doc_id, b.range
            )
            select doc_id,
                   cast(sum(case when s > 0 then (cast(1 as bigint) << b) else cast(0 as bigint) end) as bigint) as simhash
            from vote group by doc_id
        """,
                "token_counts": f"""
            select doc_id,
                   len(list_filter(string_split(text, ' '), x -> length(x) > 0)) as n_ws_tokens,
                   len(regexp_extract_all(text, '{_BPE_PAT}', 0)) as n_bpe_tokens,
                   cast(length(text) as double)
                     / len(regexp_extract_all(text, '{_BPE_PAT}', 0)) as chars_per_bpe
            from documents
        """,
"cost_distance": f"""
            with tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
                and w = 16 and h = 16
            ),
            tl2 as (
              select image_id, w, h, rn % 40 as tx, rn // 40 as ty from tl
            ),
            px as (
              select t.image_id, p.prow, p.pcol,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     cast(p.value as double) as cost
              from tl2 t join {pixels} p using (image_id)
              where not isnan(p.value)
            ),
            offs(dy, dx, dist) as (values
              (-1,-1,sqrt(2.0)),(-1,0,1.0),(-1,1,sqrt(2.0)),(0,-1,1.0),
              (0,1,1.0),(1,-1,sqrt(2.0)),(1,0,1.0),(1,1,sqrt(2.0))),
            cand as (
              select c.gx, c.gy, c.cost,
                     c.gx + o.dx as ngx, c.gy + o.dy as ngy, o.dist
              from px c cross join offs o
            ),
            edges as (
              select cand.gx, cand.gy, cand.ngx, cand.ngy,
                     ((n.cost + cand.cost) / 2.0) * cand.dist as w
              from cand join px n on n.gx = cand.ngx and n.gy = cand.ngy
            ),
            d0 as (
              select gx, gy,
                     case when cost < 8.0 then 0.0 end as d
              from px
            ),
            m1 as (
              select e.gx, e.gy, min(p.d + e.w) as reach
              from edges e join d0 p on p.gx = e.ngx and p.gy = e.ngy
              where p.d is not null
              group by e.gx, e.gy
            ),
            d1 as (
              select d.gx, d.gy, least(d.d, m.reach) as d
              from d0 d left join m1 m using (gx, gy)
            ),
            m2 as (
              select e.gx, e.gy, min(p.d + e.w) as reach
              from edges e join d1 p on p.gx = e.ngx and p.gy = e.ngy
              where p.d is not null
              group by e.gx, e.gy
            ),
            d2 as (
              select d.gx, d.gy, least(d.d, m.reach) as d
              from d1 d left join m2 m using (gx, gy)
            ),
            m3 as (
              select e.gx, e.gy, min(p.d + e.w) as reach
              from edges e join d2 p on p.gx = e.ngx and p.gy = e.ngy
              where p.d is not null
              group by e.gx, e.gy
            ),
            d3 as (
              select d.gx, d.gy, least(d.d, m.reach) as d
              from d2 d left join m3 m using (gx, gy)
            ),
            m4 as (
              select e.gx, e.gy, min(p.d + e.w) as reach
              from edges e join d3 p on p.gx = e.ngx and p.gy = e.ngy
              where p.d is not null
              group by e.gx, e.gy
            ),
            d4 as (
              select d.gx, d.gy, least(d.d, m.reach) as d
              from d3 d left join m4 m using (gx, gy)
            ),
            m5 as (
              select e.gx, e.gy, min(p.d + e.w) as reach
              from edges e join d4 p on p.gx = e.ngx and p.gy = e.ngy
              where p.d is not null
              group by e.gx, e.gy
            ),
            d5 as (
              select d.gx, d.gy, least(d.d, m.reach) as d
              from d4 d left join m5 m using (gx, gy)
            ),
            m6 as (
              select e.gx, e.gy, min(p.d + e.w) as reach
              from edges e join d5 p on p.gx = e.ngx and p.gy = e.ngy
              where p.d is not null
              group by e.gx, e.gy
            ),
            d6 as (
              select d.gx, d.gy, least(d.d, m.reach) as d
              from d5 d left join m6 m using (gx, gy)
            ),
            m7 as (
              select e.gx, e.gy, min(p.d + e.w) as reach
              from edges e join d6 p on p.gx = e.ngx and p.gy = e.ngy
              where p.d is not null
              group by e.gx, e.gy
            ),
            d7 as (
              select d.gx, d.gy, least(d.d, m.reach) as d
              from d6 d left join m7 m using (gx, gy)
            ),
            m8 as (
              select e.gx, e.gy, min(p.d + e.w) as reach
              from edges e join d7 p on p.gx = e.ngx and p.gy = e.ngy
              where p.d is not null
              group by e.gx, e.gy
            ),
            d8 as (
              select d.gx, d.gy, least(d.d, m.reach) as d
              from d7 d left join m8 m using (gx, gy)
            )
            select p.image_id, p.prow, p.pcol, p.gx, p.gy, d8.d
            from px p join d8 on d8.gx = p.gx and d8.gy = p.gy
        """,
"watersheds": f"""
            with recursive tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
                and w = 16 and h = 16
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, p.prow, p.pcol,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            offs(dy, dx, code, dist) as (values
              (0,1,1,1.0),(1,1,2,sqrt(2.0)),(1,0,4,1.0),(1,-1,8,sqrt(2.0)),
              (0,-1,16,1.0),(-1,-1,32,sqrt(2.0)),(-1,0,64,1.0),(-1,1,128,sqrt(2.0))),
            cand as (
              select c.gx, c.gy, c.value as cval,
                     c.gx + o.dx as ngx, c.gy + o.dy as ngy, o.code, o.dist
              from px c cross join offs o
              where c.value is not null
            ),
            nb as (
              select cand.gx, cand.gy, cand.code, cand.ngx, cand.ngy,
                     (cand.cval - n.value) / cand.dist as drop_
              from cand join px n on n.gx = cand.ngx and n.gy = cand.ngy
              where n.value is not null
            ),
            agg as (select gx, gy, max(drop_) as best from nb group by 1, 2),
            rk as (
              select nb.gx, nb.gy, nb.ngx, nb.ngy,
                     row_number() over (partition by nb.gx, nb.gy
                                        order by nb.code) as rn
              from nb join agg a on a.gx = nb.gx and a.gy = nb.gy
              where nb.drop_ = a.best and a.best > 0
            ),
            edges as (select gx, gy, ngx as tgx, ngy as tgy from rk where rn = 1),
            walk(gx, gy, cgx, cgy, d) as (
              select gx, gy, gx, gy, 0 from px where value is not null
              union all
              select w.gx, w.gy, e.tgx, e.tgy, w.d + 1
              from walk w join edges e on e.gx = w.cgx and e.gy = w.cgy
            ),
            term as (
              select gx, gy, arg_max(cgx, d) as sink_gx, arg_max(cgy, d) as sink_gy
              from walk group by 1, 2
            )
            select p.image_id, p.prow, p.pcol, p.gx, p.gy, t.sink_gx, t.sink_gy
            from px p join term t on t.gx = p.gx and t.gy = p.gy
            where p.value is not null
        """,
"flow_accumulation": f"""
            with recursive tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
                and w = 16 and h = 16
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, p.prow, p.pcol,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            offs(dy, dx, code, dist) as (values
              (0,1,1,1.0),(1,1,2,sqrt(2.0)),(1,0,4,1.0),(1,-1,8,sqrt(2.0)),
              (0,-1,16,1.0),(-1,-1,32,sqrt(2.0)),(-1,0,64,1.0),(-1,1,128,sqrt(2.0))),
            cand as (
              select c.gx, c.gy, c.value as cval,
                     c.gx + o.dx as ngx, c.gy + o.dy as ngy, o.code, o.dist
              from px c cross join offs o
              where c.value is not null
            ),
            nb as (
              select cand.gx, cand.gy, cand.code, cand.ngx, cand.ngy,
                     (cand.cval - n.value) / cand.dist as drop_
              from cand join px n on n.gx = cand.ngx and n.gy = cand.ngy
              where n.value is not null
            ),
            agg as (select gx, gy, max(drop_) as best from nb group by 1, 2),
            rk as (
              select nb.gx, nb.gy, nb.ngx, nb.ngy,
                     row_number() over (partition by nb.gx, nb.gy
                                        order by nb.code) as rn
              from nb join agg a on a.gx = nb.gx and a.gy = nb.gy
              where nb.drop_ = a.best and a.best > 0
            ),
            edges as (select gx, gy, ngx as tgx, ngy as tgy from rk where rn = 1),
            walk(gx, gy, cgx, cgy) as (
              select gx, gy, gx, gy from px where value is not null
              union all
              select w.gx, w.gy, e.tgx, e.tgy
              from walk w join edges e on e.gx = w.cgx and e.gy = w.cgy
            ),
            acc as (
              select cgx as gx, cgy as gy, count(*) as acc
              from walk group by 1, 2
            )
            select p.image_id, p.prow, p.pcol, p.gx, p.gy, a.acc
            from px p join acc a on a.gx = p.gx and a.gy = p.gy
            where p.value is not null
        """,
"morph_open": f"""
            with tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                     p.prow, p.pcol,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            offs(dx, dy) as (values
              (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
            -- centers x offsets expanded to plain key columns BEFORE each
            -- big join (the focal-oracle planner rule)
            cand1 as (
              select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                     c.prow, c.pcol, c.gx, c.gy,
                     c.gx + o.dx as ngx, c.gy + o.dy as ngy
              from px c cross join offs o
            ),
            m1 as (
              select cand1.image_id, cand1.crs, cand1.cell_width,
                     cand1.cell_height, cand1.w, cand1.h,
                     cand1.prow, cand1.pcol, cand1.gx, cand1.gy,
                     min(n.value) as v
              from cand1
              join px n
                on n.crs = cand1.crs and n.cell_width = cand1.cell_width
               and n.cell_height = cand1.cell_height and n.w = cand1.w and n.h = cand1.h
               and n.gx = cand1.ngx and n.gy = cand1.ngy
              where n.value is not null
              group by 1, 2, 3, 4, 5, 6, 7, 8, 9, 10
            ),
            cand2 as (
              select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                     c.prow, c.pcol,
                     c.gx + o.dx as ngx, c.gy + o.dy as ngy
              from m1 c cross join offs o
            )
            select cand2.image_id, cand2.prow, cand2.pcol, max(n.v) as value
            from cand2
            join m1 n
              on n.crs = cand2.crs and n.cell_width = cand2.cell_width
             and n.cell_height = cand2.cell_height and n.w = cand2.w and n.h = cand2.h
             and n.gx = cand2.ngx and n.gy = cand2.ngy
            group by 1, 2, 3
        """,
"integral_image": f"""
            with px as (
              select p.image_id, p.prow, p.pcol,
                     case when isnan(p.value) then 0.0
                          else cast(p.value as double) end as v,
                     case when isnan(p.value) then 0 else 1 end as m
              from {pixels} p join {tiles} t using (image_id)
              where t.fmt = 'raw' and t.image_id < 'img000000000300'
            ),
            colcum as (
              select image_id, prow, pcol,
                     sum(v) over (partition by image_id, pcol order by prow
                                  rows between unbounded preceding and current row) as cv,
                     sum(m) over (partition by image_id, pcol order by prow
                                  rows between unbounded preceding and current row) as cm
              from px
            )
            select image_id, prow, pcol,
                   sum(cv) over (partition by image_id, prow order by pcol
                                 rows between unbounded preceding and current row) as sat,
                   cast(sum(cm) over (partition by image_id, prow order by pcol
                                      rows between unbounded preceding and current row) as bigint) as nsat
            from colcum
        """,
"phash_dup_groups": f"""
            with recursive
            t as (
              select image_id, phash,
                     cast(substring(image_id, 4, 12) as bigint) as i
              from {tiles}
            ),
            pool as (
              select image_id, phash from t
              union all
              select image_id || '~v' as image_id,
                     xor(phash,
                         (cast(1 as bigint) << cast(i % 63 as int))
                         | (cast(1 as bigint) << cast((i // 7) % 63 as int))
                         | (cast(1 as bigint) << cast((i // 13) % 63 as int))) as phash
              from t where i % 10 = 0
            ),
            pairs as (
              select a.image_id as doc_a, b.image_id as doc_b
              from pool a cross join pool b
              where a.image_id < b.image_id
                and bit_count(xor(a.phash, b.phash)) <= 3
            ),
            edges as (
              select doc_a, doc_b from pairs
              union
              select doc_b, doc_a from pairs
            ),
            walk(doc_id, reach) as (
              select doc_a, doc_a from edges
              union
              select e.doc_a, w.reach from edges e join walk w on w.doc_id = e.doc_b
            )
            select doc_id, min(reach) as group_id
            from walk group by doc_id
        """,
"point_geodesics": f"""
            select a.point_id as point_a, b.point_id as point_b,
                   printf('%.9e', (2.0 * 6371008.8 * asin(least(1.0, sqrt((sin((radians(b.y) - radians(a.y)) / 2.0) * sin((radians(b.y) - radians(a.y)) / 2.0) + cos(radians(a.y)) * cos(radians(b.y)) * sin((radians(b.x) - radians(a.x)) / 2.0) * sin((radians(b.x) - radians(a.x)) / 2.0))))))) as dist_q,
                   printf('%.9e', cast((((degrees(atan2(sin((radians(b.x) - radians(a.x))) * cos(radians(b.y)), cos(radians(a.y)) * sin(radians(b.y)) - sin(radians(a.y)) * cos(radians(b.y)) * cos((radians(b.x) - radians(a.x))))) % 360.0) + 360.0) % 360.0) as double)) as bearing_q
            from {points} a join {points} b
              on a.point_id + 2000 = b.point_id
            where a.point_id < 2000
              and b.point_id >= 2000 and b.point_id < 4000
        """,
"polygon_area_centroid": f"""
            with t as (
              select poly_id, ring,
                     list_reduce(
                       list_prepend({{'a': 0.0, 'x': 0.0, 'y': 0.0}},
                         [{{'a': ring[i].x * ring[i+1].y - ring[i+1].x * ring[i].y,
                            'x': (ring[i].x + ring[i+1].x)
                                 * (ring[i].x * ring[i+1].y - ring[i+1].x * ring[i].y),
                            'y': (ring[i].y + ring[i+1].y)
                                 * (ring[i].x * ring[i+1].y - ring[i+1].x * ring[i].y)}}
                          for i in range(1, len(ring))]),
                       (a, t) -> {{'a': a.a + t.a, 'x': a.x + t.x, 'y': a.y + t.y}}) as acc
              from read_parquet('{FD}/polygons.parquet')
            )
            select poly_id, acc.a / 2.0 as area,
                   case when acc.a != 0.0 then acc.x / (3.0 * acc.a) end as cx,
                   case when acc.a != 0.0 then acc.y / (3.0 * acc.a) end as cy
            from t
        """,
"zonal_mode": f"""
            with z as (
              select range as i,
                     -180.0 + (range % 12) * 30.0 + 1.0 / 3.0 as xmin,
                     45.0 + (range // 12) * 9.0 + 1.0 / 3.0 as ymin
              from range(48)
            ),
            zz as (select i as poly_id, xmin, ymin,
                          xmin + 30.0 as xmax, ymin + 9.0 as ymax from z),
            px as (
              select g.poly_id, cast(px.value as double) as v
              from {pixels} px
              join {tiles} t using (image_id)
              join zz g
                on t.x_origin + t.cell_width * (px.pcol + 0.5) >= g.xmin
               and t.x_origin + t.cell_width * (px.pcol + 0.5) <  g.xmax
               and t.y_origin + t.cell_height * (px.prow + 0.5) >= g.ymin
               and t.y_origin + t.cell_height * (px.prow + 0.5) <  g.ymax
              where t.fmt = 'raw' and not isnan(px.value)
            ),
            vc as (
              select poly_id, v as value, count(*) as cnt
              from px group by 1, 2
            ),
            rk as (
              select poly_id, value, cnt,
                     row_number() over (partition by poly_id
                                        order by cnt desc, value asc) as rn,
                     sum(cnt) over (partition by poly_id) as n_valid
              from vc
            )
            select poly_id, value as mode, cnt as mode_n,
                   cast(n_valid as bigint) as n_valid
            from rk where rn = 1
        """,
"zonal_quantiles": f"""
            with z as (
              select range as i,
                     -180.0 + (range % 12) * 30.0 + 1.0 / 3.0 as xmin,
                     45.0 + (range // 12) * 9.0 + 1.0 / 3.0 as ymin
              from range(48)
            ),
            zz as (select i as poly_id, xmin, ymin,
                          xmin + 30.0 as xmax, ymin + 9.0 as ymax from z),
            px as (
              select g.poly_id, cast(px.value as double) as v
              from {pixels} px
              join {tiles} t using (image_id)
              join zz g
                on t.x_origin + t.cell_width * (px.pcol + 0.5) >= g.xmin
               and t.x_origin + t.cell_width * (px.pcol + 0.5) <  g.xmax
               and t.y_origin + t.cell_height * (px.prow + 0.5) >= g.ymin
               and t.y_origin + t.cell_height * (px.prow + 0.5) <  g.ymax
              where t.fmt = 'raw' and not isnan(px.value)
            )
            select poly_id, cast(count(*) as bigint) as n,
                   quantile_cont(v, 0.25) as q_25,
                   quantile_cont(v, 0.5) as q_5,
                   quantile_cont(v, 0.75) as q_75
            from px group by poly_id
        """,
"terrain_indices": f"""
            with tl as (
              select image_id, crs, cell_width, cell_height, w, h,
                     row_number() over (partition by crs, cell_width, cell_height, w, h
                                        order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and image_id < 'img000000000300'
            ),
            tl2 as (
              select image_id, crs, cell_width, cell_height, w, h,
                     rn % 40 as tx, rn // 40 as ty
              from tl
            ),
            px as (
              select t.image_id, t.crs, t.cell_width, t.cell_height, t.w, t.h,
                     p.prow, p.pcol,
                     t.tx * t.w + p.pcol as gx, t.ty * t.h + p.prow as gy,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as value
              from tl2 t join {pixels} p using (image_id)
            ),
            offs(dy, dx) as (values
              (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
            cand as (
              select c.image_id, c.crs, c.cell_width, c.cell_height, c.w, c.h,
                     c.prow, c.pcol, c.value as cval,
                     c.gx + o.dx as ngx, c.gy + o.dy as ngy
              from px c cross join offs o
              where c.value is not null
            ),
            nb as (
              select cand.image_id, cand.prow, cand.pcol, cand.cval, n.value
              from cand
              join px n
                on n.crs = cand.crs and n.cell_width = cand.cell_width
               and n.cell_height = cand.cell_height and n.w = cand.w and n.h = cand.h
               and n.gx = cand.ngx and n.gy = cand.ngy
              where n.value is not null
            )
            select image_id, prow, pcol,
                   sqrt(sum((cval - value) * (cval - value))) as tri,
                   any_value(cval) - (sum(value) / count(*)) as tpi,
                   count(*) as n_nbr
            from nb group by image_id, prow, pcol
        """,
"rgb_to_gray": f"""
            with tl as (
              select image_id, w, h,
                     row_number() over (partition by w, h order by image_id) - 1 as rn
              from {tiles}
              where fmt = 'raw' and w = 16 and h = 16
                and image_id < 'img000000001188'
            ),
            st as (select image_id, rn % 3 as band, rn // 3 as stack_id from tl),
            full_st as (
              select stack_id from st group by stack_id having count(*) = 3
            ),
            px as (
              select s.stack_id, s.band, p.prow, p.pcol,
                     case when isnan(p.value) then NULL
                          else cast(p.value as double) end as v
              from st s
              join full_st using (stack_id)
              join {pixels} p using (image_id)
            ),
            pv as (
              select stack_id, prow, pcol,
                     max(case when band = 0 then v end) as v0,
                     max(case when band = 1 then v end) as v1,
                     max(case when band = 2 then v end) as v2
              from px group by 1, 2, 3
            )
            select stack_id, prow, pcol,
                   (0.299 * v0 + 0.587 * v1) + 0.114 * v2 as gray
            from pv
            where v0 is not null and v1 is not null and v2 is not null
        """,
"equalize_lut": f"""
            with v as (
              select p.image_id, cast(p.value as double) as value
              from {pixels} p
              join {tiles} t using (image_id)
              where t.fmt = 'raw' and t.image_id < 'img000000000300'
                and not isnan(p.value)
            ),
            c as (
              select image_id, value, count(*) as n_at
              from v group by 1, 2
            )
            select image_id, value, n_at,
                   sum(n_at) over (partition by image_id order by value
                                   rows between unbounded preceding
                                        and current row) as cum,
                   cast(sum(n_at) over (partition by image_id order by value
                                        rows between unbounded preceding
                                             and current row) as double)
                     / cast(sum(n_at) over (partition by image_id) as double) as cdf
            from c
        """,
"source_quality": """
            with qf as (
            with tk as (
              select doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) as l
              from documents
            ),
            tok as (
              select doc_id, unnest(l) as tok, generate_subscripts(l, 1) as pos from tk
            ),
            g as (
              select doc_id,
                     tok || ' ' || lead(tok) over (partition by doc_id order by pos) as gram
              from tok
            ),
            cnt as (
              select doc_id, gram, count(*) as c from g
              where gram is not null group by 1, 2
            ),
            rep as (
              select doc_id,
                     cast(sum(c) - count(*) as double) / cast(sum(c) as double) as dup_frac,
                     cast(max(c) as double) / cast(sum(c) as double) as top_frac
              from cnt group by 1
            ),
            st as (
              select doc_id,
                     cast(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) as int) as n_tokens
              from documents
            ),
            j as (
              select st.doc_id, st.n_tokens,
                     coalesce(rep.dup_frac, 0.0) as dup_frac,
                     coalesce(rep.top_frac, 0.0) as top_frac
              from st left join rep using (doc_id)
            )
            select doc_id, n_tokens, dup_frac, top_frac,
                   (case when n_tokens < 16 then 'too_short'
                         when dup_frac > 0.05 then 'repetitive'
                         when top_frac > 0.1 then 'top_heavy' end) is null as keep,
                   case when n_tokens < 16 then 'too_short'
                        when dup_frac > 0.05 then 'repetitive'
                        when top_frac > 0.1 then 'top_heavy' end as reason
            from j
                    )
            select d.source,
                   cast(count(*) as bigint) as n_docs,
                   cast(count(case when qf.keep then 1 end) as bigint) as n_keep,
                   cast(count(case when qf.keep then 1 end) as double)
                     / cast(count(*) as double) as keep_rate,
                   cast(count(case when qf.reason = \'too_short\' then 1 end) as bigint) as n_too_short,
                   cast(count(case when qf.reason = \'repetitive\' then 1 end) as bigint) as n_repetitive,
                   cast(count(case when qf.reason = \'top_heavy\' then 1 end) as bigint) as n_top_heavy
            from qf join documents d using (doc_id)
            group by d.source
        """,
"quality_filter": """
            with tk as (
              select doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) as l
              from documents
            ),
            tok as (
              select doc_id, unnest(l) as tok, generate_subscripts(l, 1) as pos from tk
            ),
            g as (
              select doc_id,
                     tok || ' ' || lead(tok) over (partition by doc_id order by pos) as gram
              from tok
            ),
            cnt as (
              select doc_id, gram, count(*) as c from g
              where gram is not null group by 1, 2
            ),
            rep as (
              select doc_id,
                     cast(sum(c) - count(*) as double) / cast(sum(c) as double) as dup_frac,
                     cast(max(c) as double) / cast(sum(c) as double) as top_frac
              from cnt group by 1
            ),
            st as (
              select doc_id,
                     cast(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) as int) as n_tokens
              from documents
            ),
            j as (
              select st.doc_id, st.n_tokens,
                     coalesce(rep.dup_frac, 0.0) as dup_frac,
                     coalesce(rep.top_frac, 0.0) as top_frac
              from st left join rep using (doc_id)
            )
            select doc_id, n_tokens, dup_frac, top_frac,
                   (case when n_tokens < 16 then 'too_short'
                         when dup_frac > 0.05 then 'repetitive'
                         when top_frac > 0.1 then 'top_heavy' end) is null as keep,
                   case when n_tokens < 16 then 'too_short'
                        when dup_frac > 0.05 then 'repetitive'
                        when top_frac > 0.1 then 'top_heavy' end as reason
            from j
        """,
"doc_repetition": """
            with tk as (
              select doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) as l
              from documents
            ),
            tok as (
              select doc_id, unnest(l) as tok, generate_subscripts(l, 1) as pos from tk
            ),
            g as (
              select doc_id,
                     tok || ' ' || lead(tok) over (partition by doc_id order by pos) as gram
              from tok
            ),
            cnt as (
              select doc_id, gram, count(*) as c from g
              where gram is not null group by 1, 2
            )
            select doc_id,
                   cast(sum(c) as bigint) as n_grams,
                   cast(count(*) as bigint) as n_distinct,
                   cast(max(c) as bigint) as top_cnt,
                   cast(sum(c) - count(*) as double) / cast(sum(c) as double) as dup_frac,
                   cast(max(c) as double) / cast(sum(c) as double) as top_frac
            from cnt group by doc_id
        """,
"decontaminate": """
            with tk as (
              select doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) as l
              from documents
            ),
            tok as (
              select doc_id, unnest(l) as tok, generate_subscripts(l, 1) as pos from tk
            ),
            g as (
              select doc_id,
                     tok || ' ' || lead(tok, 1) over w || ' ' || lead(tok, 2) over w
                         || ' ' || lead(tok, 3) over w as gram
              from tok
              window w as (partition by doc_id order by pos)
            ),
            gg as (select doc_id, md5(gram) as g from g where gram is not null),
            ev as (select distinct g from gg where doc_id % 10 = 0),
            hit as (
              select t.doc_id, t.g from gg t join ev using (g)
              where t.doc_id % 10 != 0
            )
            select doc_id,
                   cast(count(distinct g) as bigint) as n_overlap_grams,
                   cast(count(*) as bigint) as n_overlap_instances
            from hit group by doc_id
        """,
"doc_stats": """
            select doc_id,
              cast(len(text) as int) as n_chars,
              cast(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) as int) as n_tokens,
              cast(len(text) - (len(text) - len(replace(text, ' ', ''))) as double)
                / cast(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) as double) as avg_token_len,
              cast(len(list_distinct(list_filter(string_split(text, ' '), x -> len(x) > 0))) as int) as n_distinct_tokens,
              cast(len(list_distinct(list_filter(string_split(text, ' '), x -> len(x) > 0))) as double)
                / cast(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) as double) as ttr
            from documents
        """,
        "langid": _langid_sql(),
        "doc_fingerprint": """
            select doc_id,
              list_reduce(
                list_prepend(cast(0 as bigint),
                  [cast(ascii(substring(text, i, 1)) as bigint) for i in range(1, len(text) + 1)]),
                (a, b) -> (a * 31 + b) % 1000000007) as fp
            from documents
        """,
        "cosine_topk": """
            with q as (select vec_id as query_id, embedding as qe from embeddings where vec_id < 20),
            j as (
              select c.vec_id, q.query_id,
                list_reduce(list_prepend(cast(0.0 as double),
                  [cast(c.embedding[i] as double) * cast(q.qe[i] as double) for i in range(1, 65)]),
                  (a, b) -> a + b) as dot,
                sqrt(list_reduce(list_prepend(cast(0.0 as double),
                  [cast(c.embedding[i] as double) * cast(c.embedding[i] as double) for i in range(1, 65)]),
                  (a, b) -> a + b)) as nc,
                sqrt(list_reduce(list_prepend(cast(0.0 as double),
                  [cast(q.qe[i] as double) * cast(q.qe[i] as double) for i in range(1, 65)]),
                  (a, b) -> a + b)) as nq
              from embeddings c cross join q
              where c.vec_id <> q.query_id
            ),
            r as (
              select query_id, vec_id, dot / (nc * nq) as cos,
                row_number() over (partition by query_id order by dot / (nc * nq) desc, vec_id asc) as rank
              from j
            )
            select query_id, vec_id, rank, cos from r where rank <= 5
        """,
        "embedding_dup_groups": """
            with recursive pool as (
              select vec_id, embedding from embeddings
              union all
              select vec_id + 1000000 as vec_id, embedding
              from embeddings where vec_id < 50
            ),
            j as (
              select a.vec_id as id_a, b.vec_id as id_b,
                list_reduce(list_prepend(cast(0.0 as double),
                  [cast(a.embedding[i] as double) * cast(b.embedding[i] as double) for i in range(1, 65)]),
                  (x, y) -> x + y) as dot,
                sqrt(list_reduce(list_prepend(cast(0.0 as double),
                  [cast(a.embedding[i] as double) * cast(a.embedding[i] as double) for i in range(1, 65)]),
                  (x, y) -> x + y)) as na,
                sqrt(list_reduce(list_prepend(cast(0.0 as double),
                  [cast(b.embedding[i] as double) * cast(b.embedding[i] as double) for i in range(1, 65)]),
                  (x, y) -> x + y)) as nb
              from pool a join pool b on a.vec_id < b.vec_id
            ),
            pairs as (
              select id_a as doc_a, id_b as doc_b from j
              where dot / (na * nb) >= 0.999
            ),
            edges as (
              select doc_a, doc_b from pairs
              union
              select doc_b, doc_a from pairs
            ),
            walk(doc_id, reach) as (
              select doc_a, doc_a from edges
              union
              select e.doc_a, w.reach from edges e join walk w on w.doc_id = e.doc_b
            )
            select doc_id as vec_id, min(reach) as group_id
            from walk group by doc_id
        """,
        "embedding_near_dups": """
            with pool as (
              select vec_id, embedding from embeddings
              union all
              select vec_id + 1000000 as vec_id, embedding
              from embeddings where vec_id < 50
            ),
            j as (
              select a.vec_id as id_a, b.vec_id as id_b,
                list_reduce(list_prepend(cast(0.0 as double),
                  [cast(a.embedding[i] as double) * cast(b.embedding[i] as double) for i in range(1, 65)]),
                  (x, y) -> x + y) as dot,
                sqrt(list_reduce(list_prepend(cast(0.0 as double),
                  [cast(a.embedding[i] as double) * cast(a.embedding[i] as double) for i in range(1, 65)]),
                  (x, y) -> x + y)) as na,
                sqrt(list_reduce(list_prepend(cast(0.0 as double),
                  [cast(b.embedding[i] as double) * cast(b.embedding[i] as double) for i in range(1, 65)]),
                  (x, y) -> x + y)) as nb
              from pool a join pool b on a.vec_id < b.vec_id
            )
            select id_a, id_b, dot / (na * nb) as cos
            from j where dot / (na * nb) >= 0.999
        """,
        "media_features": f"""
            select t.image_id,
              octet_length(t.bytes) as n_bytes,
              t.w as width, t.h as height, t.phash,
              sum(cast(px.value as double)) filter (not isnan(px.value))
                / count(*) filter (not isnan(px.value)) as mean
            from {tiles} t join {pixels} px using (image_id)
            where t.fmt = 'raw'
            group by t.image_id, t.bytes, t.w, t.h, t.phash
        """,
        "transform_cyl": _transform_cyl_sql(),
        "table_compaction": """
            select doc_id, n_chars, lang from documents
        """,
        "local_utm": """
            with e as (
              select event_id,
                     value - floor(value / 360.0) * 360.0 - 180.0 as lon,
                     cast(user_id % 180 as double) - 90.0 + 0.5 as lat
              from events
            )
            select event_id,
              case when lon between -180 and 180 then
                '+proj=utm +zone=' || cast(greatest(1, least(60, cast(floor((lon + 180.0) / 6.0) as int))) as varchar)
                || (case when lat < 0 then ' +south' else '' end)
                || ' +ellps=WGS84 +datum=WGS84 +units=m +no_defs'
              end as utm_proj4,
              cast((case when lat >= 0 then 32600 else 32700 end)
                   + (cast(floor((lon + 180.0) / 6.0) as bigint) % 60 + 1) as int) as utm_epsg,
              printf('+proj=aeqd +lat_0=%.3f +lon_0=%.3f', lat, lon) as aeqd_proj4
            from e
        """,
        "pixel_centroids": f"""
            select px.image_id, px.prow, px.pcol,
                   t.x_origin + t.cell_width * (px.pcol + 0.5) as x,
                   t.y_origin + t.cell_height * (px.prow + 0.5) as y,
                   cast(px.value as double) as value
            from {pixels} px join {tiles} t using (image_id)
            where px.image_id < 'img000000000200' and not isnan(px.value)
        """,
        "latlon_matrices": f"""
            select px.image_id, px.prow, px.pcol,
                   case when (t.x_origin + t.cell_width * (px.pcol + 0.5)) between -180.0 and 180.0
                        then t.x_origin + t.cell_width * (px.pcol + 0.5) end as lon,
                   case when (t.y_origin + t.cell_height * (px.prow + 0.5)) between -90.0 and 90.0
                        then t.y_origin + t.cell_height * (px.prow + 0.5) end as lat
            from {pixels} px join {tiles} t using (image_id)
            where px.image_id >= 'img000000000340' and px.image_id < 'img000000000420'
              and not isnan(px.value)
        """,
        "tile_unique_values": f"""
            select t.image_id,
                   count(distinct px.value) filter (not isnan(px.value)) as n_unique,
                   count(distinct px.value) filter (not isnan(px.value)) < 10 as few_values
            from {tiles} t join {pixels} px using (image_id)
            where t.fmt = 'raw'
            group by t.image_id
        """,
        "bbox_accessors": f"""
            select image_id,
              (x_origin + cell_width * w) - x_origin as width,
              y_origin - (y_origin + cell_height * h) as height,
              (x_origin + (x_origin + cell_width * w)) / 2.0 as cx,
              ((y_origin + cell_height * h) + y_origin) / 2.0 as cy,
              x_origin - 0.5 as buf_xmin,
              round_even(y_origin, 1) as round_ymax
            from {tiles}
        """,
        "swath_window": f"""
            with sw as ({_SWATH_SQL}),
            masked as (
              select * from sw
              where x >= -119.7 and x <= -119.3 and y >= 39.3 and y <= 39.7
            ),
            ext as (select swath_id, max(row) as max_row, max(col) as max_col from sw group by 1),
            w as (
              select swath_id, min(row) as r0, max(row) as r1, min(col) as c0, max(col) as c1
              from masked group by 1
            )
            select w.swath_id,
                   greatest(w.r0 - 2, 0) as row_start, least(w.r1 + 2, ext.max_row) as row_end,
                   greatest(w.c0 - 2, 0) as col_start, least(w.c1 + 2, ext.max_col) as col_end
            from w join ext using (swath_id)
        """,
        "swath_to_grid_nn": f"""
            with sw as ({_SWATH_SQL}),
            assigned as (
              select swath_id, row, col, value, x, y,
                cast(round_even((y - 40.0)/(-0.1) - 0.5, 0) as bigint) as trow,
                cast(round_even((x - (-120.0))/0.1 - 0.5, 0) as bigint) as tcol
              from sw
            ),
            d as (
              select *, sqrt((x - (-120.0 + 0.1 * (tcol + 0.5))) * (x - (-120.0 + 0.1 * (tcol + 0.5)))
                           + (y - (40.0 + (-0.1) * (trow + 0.5))) * (y - (40.0 + (-0.1) * (trow + 0.5)))) as dist
              from assigned
              where trow between 0 and 9 and tcol between 0 and 9
            )
            select swath_id, trow, tcol, value, dist
            from (
              select swath_id, trow, tcol, value, dist,
                     row_number() over (partition by swath_id, trow, tcol
                                        order by dist, row, col) as rn
              from d where dist <= 0.2
            ) where rn = 1
        """,
        "to_grid_bilinear": _conv_oracle_sql(tiles, pixels, "linear"),
        "to_grid_cubic": _conv_oracle_sql(tiles, pixels, "cubic"),
        "to_grid_cubicspline": _conv_oracle_sql(tiles, pixels, "cubic_spline"),
        "to_grid_lanczos": _conv_py_oracle_sql(tiles, pixels, "lanczos"),
        "to_grid_gauss": _conv_py_oracle_sql(tiles, pixels, "gauss"),
        "to_grid_max": _stat_oracle_sql(tiles, pixels, "max"),
        "to_grid_sum": _stat_oracle_sql(tiles, pixels, "sum"),
        "to_grid_min": _stat_oracle_sql(tiles, pixels, "min"),
        "to_grid_med": _stat_oracle_sql(tiles, pixels, "med"),
        "to_grid_q1": _stat_oracle_sql(tiles, pixels, "q1"),
        "to_grid_q3": _stat_oracle_sql(tiles, pixels, "q3"),
        "to_grid_mode": _stat_oracle_sql(tiles, pixels, "mode"),
        "to_geolocation_nn": f"""
            with sw as ({_SWATH_NORTH_SQL}),
            j as (
              select sw.swath_id, sw.row, sw.col, t.image_id,
                     {prow("sw.y")} as prow, {pcol("sw.x")} as pcol
              from sw cross join {tiles} t
              where {prow("sw.y")} between 0 and t.h - 1
                and {pcol("sw.x")} between 0 and t.w - 1
            )
            select j.swath_id, j.row, j.col, j.image_id, j.prow, j.pcol,
                   case when isnan(px.value) then NULL else cast(px.value as double) end as value
            from j join {pixels} px
              on px.image_id = j.image_id and px.prow = j.prow and px.pcol = j.pcol
        """,
        "geotiff_roundtrip": f"""
            select t.image_id,
                   298 + 4 * t.w * t.h as n_bytes,
                   t.w as width, t.h as height,
                   t.x_origin, t.y_origin, t.cell_width, t.cell_height,
                   cast(4326 as int) as epsg,
                   coalesce(sum(cast(px.value as double)) filter (not isnan(px.value)), 0.0) as vsum
            from {tiles} t join {pixels} px using (image_id)
            where t.fmt = 'raw' and t.image_id < 'img000000000200'
            group by t.image_id, t.w, t.h, t.x_origin, t.y_origin, t.cell_width, t.cell_height
        """,
        "cog_roundtrip": f"""
            select t.image_id,
                   cast(286 + 4 * 256 * 256 as bigint) as n_bytes,
                   cast(1 as int) as n_levels,
                   t.w as width, t.h as height,
                   t.x_origin, t.y_origin,
                   coalesce(sum(cast(px.value as double)) filter (not isnan(px.value)), 0.0) as vsum
            from {tiles} t join {pixels} px using (image_id)
            where t.fmt = 'raw' and t.image_id < 'img000000000200'
            group by t.image_id, t.w, t.h, t.x_origin, t.y_origin
        """,
        "resize_bilinear": _resize_bilinear_oracle_sql(tiles),
        "cell_size_meters": f"""
            select image_id,
                   least(cell_width, abs(cell_height)) as cell_size,
                   least(cell_width, abs(cell_height)) / 180.0 * 40075017.0 as cell_size_m,
                   2.0 * (least(cell_width, abs(cell_height)) / 180.0 * 40075017.0) as radius_m
            from {tiles}
        """,
        "neighbour_distances": f"""
            with sw as ({_SWATH_SQL})
            select swath_id, row, col,
              sqrt((x - lag(x) over (partition by swath_id, col order by row)) * (x - lag(x) over (partition by swath_id, col order by row))
                 + (y - lag(y) over (partition by swath_id, col order by row)) * (y - lag(y) over (partition by swath_id, col order by row))) as row_dist,
              sqrt((x - lag(x) over (partition by swath_id, row order by col)) * (x - lag(x) over (partition by swath_id, row order by col))
                 + (y - lag(y) over (partition by swath_id, row order by col)) * (y - lag(y) over (partition by swath_id, row order by col))) as col_dist
            from sw
        """,
        "swath_cell_size": f"""
            with sw as ({_SWATH_SQL}),
            lagged as (
              select swath_id,
                x - lag(x) over (partition by swath_id, col order by row) as rdx,
                y - lag(y) over (partition by swath_id, col order by row) as rdy,
                x - lag(x) over (partition by swath_id, row order by col) as cdx,
                y - lag(y) over (partition by swath_id, row order by col) as cdy
              from sw
            ),
            d as (
              select swath_id,
                sqrt(rdx * rdx + rdy * rdy) as row_dist,
                sqrt(cdx * cdx + cdy * cdy) as col_dist
              from lagged
            )
            select swath_id, least(median(row_dist), median(col_dist)) as cell_size
            from d group by swath_id
        """,
        "band_stats": f"""
            with t as (
              select *, cast(substring(image_id, 4, 12) as bigint) % 3 as band
              from {tiles} where fmt = 'raw'
            ),
            per_tile as (
              select t.image_id, t.band,
                count(*) filter (not isnan(px.value)) as n_valid,
                coalesce(sum(cast(px.value as double)) filter (not isnan(px.value)), 0.0) as vsum,
                min(cast(px.value as double)) filter (not isnan(px.value)) as vmin,
                max(cast(px.value as double)) filter (not isnan(px.value)) as vmax
              from t join {pixels} px using (image_id)
              group by t.image_id, t.band
            )
            select cast(band as int) as band, count(*) as n_tiles,
                   cast(sum(n_valid) as bigint) as n_valid,
                   sum(vsum) as vsum, min(vmin) as vmin, max(vmax) as vmax
            from per_tile group by band
        """,
        "boundary_ring": f"""
            with t as (select image_id, w, h from {tiles} where image_id < 'img000000000050')
            select image_id, pos, row, col from (
              select image_id, c.col_ as pos, 0 as row, c.col_ as col
              from t, unnest(range(0, w)) as c(col_)
              union all
              select image_id, w + r.row_ - 1, r.row_, w - 1
              from t, unnest(range(1, h)) as r(row_)
              union all
              select image_id, w + h - 1 + (w - 2 - c.col_), h - 1, c.col_
              from t, unnest(range(0, w - 1)) as c(col_)
              union all
              select image_id, 2 * w + h - 3 + (h - 1 - r.row_), r.row_, 0
              from t, unnest(range(1, h - 1)) as r(row_)
            )
        """,
        "snap_grids": f"""
            select poly_id,
              trunc(xmin / 0.5) * 0.5 as x_origin,
              trunc(ymax / 0.5) * 0.5 as y_origin,
              cast(greatest(trunc((ymax - ymin) / 0.5), 1) as int) as rows,
              cast(greatest(trunc((xmax - xmin) / 0.5), 1) as int) as cols
            from {polys} where is_rect
        """,
        "stream_ingest": f"""
            with t as (
              select image_id, caption,
                greatest(0, least({NX - 1}, cast(floor((x_origin + 180.0) / {CSZ}) as bigint))) as ix0,
                greatest(0, least({NX - 1}, cast(floor((x_origin + cell_width * w + 180.0) / {CSZ}) as bigint))) as ix1,
                greatest(0, least({NY - 1}, cast(floor((90.0 - y_origin) / {CSZ}) as bigint))) as iy0,
                greatest(0, least({NY - 1}, cast(floor((90.0 - (y_origin + cell_height * h)) / {CSZ}) as bigint))) as iy1
              from {tiles}
            )
            select image_id, ({LEVEL} * {PACK} + iy * {IYS} + ix) as cell_id, caption
            from t, unnest(range(t.iy0, t.iy1 + 1)) as ry(iy), unnest(range(t.ix0, t.ix1 + 1)) as rx(ix)
        """,
        "stream_window_counts": """
            with e as (
              select cast(trunc(epoch(ts) / 3600.0) as bigint) as epoch_hour, value
              from events
            ),
            wm as (select max(epoch(ts)) - 7200 as w from events)
            select epoch_hour, count(*) as n_events,
                   min(value) as value_min, max(value) as value_max
            from e, wm
            where (epoch_hour + 1) * 3600 <= w
            group by epoch_hour, w
        """,
        "stream_user_counts": """
            select user_id, count(*) as n_events from events group by user_id
        """,
        "polygons_geojson": f"""
            select poly_id,
              '{{"type": "Polygon", "coordinates": [[' ||
                list_aggr([printf('[%.6f,%.6f]', p.x, p.y) for p in ring], 'string_agg', ',')
              || ']]}}' as geojson,
              list_min([cast(printf('%.6f', p.x) as double) for p in ring]) as xmin_rt,
              list_max([cast(printf('%.6f', p.y) as double) for p in ring]) as ymax_rt,
              cast(len(ring) as int) as n_vertices
            from {polys}
        """,
        "dup_groups": f"""
            with recursive
            g as (
              select doc_id,
                unnest(list_distinct([substring(text, i, 3)
                                      for i in range(1, greatest(len(text) - 2, 1) + 1)])) as sh
              from documents
            ),
            sizes as (select doc_id, count(*) as n from g group by 1),
            inter as (
              select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as i
              from g a join g b on a.sh = b.sh and a.doc_id < b.doc_id
              group by 1, 2
            ),
            pairs as (
              select doc_a, doc_b from inter
              join sizes sa on sa.doc_id = doc_a
              join sizes sb on sb.doc_id = doc_b
              where cast(i as double) / cast(sa.n + sb.n - i as double) >= 0.85
            ),
            edges as (
              select doc_a, doc_b from pairs
              union
              select doc_b, doc_a from pairs
            ),
            walk(doc_id, reach) as (
              select doc_a, doc_a from edges
              union
              select e.doc_a, w.reach from edges e join walk w on w.doc_id = e.doc_b
            )
            select doc_id, min(reach) as group_id
            from walk group by doc_id
        """,
        "phash_near_dups": f"""
            with t as (
              select image_id, phash,
                     cast(substring(image_id, 4, 12) as bigint) as i
              from {tiles}
            ),
            pool as (
              select image_id, phash from t
              union all
              select image_id || '~v' as image_id,
                     xor(phash,
                         (cast(1 as bigint) << cast(i % 63 as int))
                         | (cast(1 as bigint) << cast((i // 7) % 63 as int))
                         | (cast(1 as bigint) << cast((i // 13) % 63 as int))) as phash
              from t where i % 10 = 0
            )
            select a.image_id as id_a, b.image_id as id_b,
                   cast(bit_count(xor(a.phash, b.phash)) as int) as hamming
            from pool a cross join pool b
            where a.image_id < b.image_id
              and bit_count(xor(a.phash, b.phash)) <= 3
        """,
        "event_funnel": """
            with e as (
              select user_id, event_type, epoch_us(ts) as us from events
            ),
            s1 as (
              select user_id, min(us) as t from e
              where event_type = \'view\' group by 1
            ),
            s2 as (
              select e.user_id, min(e.us) as t from e join s1 using (user_id)
              where e.event_type = \'click\' and e.us >= s1.t group by 1
            ),
            s3 as (
              select e.user_id, min(e.us) as t from e join s2 using (user_id)
              where e.event_type = \'purchase\' and e.us >= s2.t group by 1
            )
            select cast(1 as int) as step, \'view\' as event_type,
                   cast(count(*) as bigint) as n_users from s1
            union all
            select cast(2 as int), \'click\', cast(count(*) as bigint) from s2
            union all
            select cast(3 as int), \'purchase\', cast(count(*) as bigint) from s3
        """,
        "cohort_retention": """
            with active as (
              select distinct user_id,
                     cast(floor(epoch_us(ts) / 86400000000) as bigint) as day
              from events
            ),
            first as (
              select user_id, min(day) as day0 from active group by user_id
            )
            select f.day0 as cohort_day, a.day - f.day0 as day_offset,
                   cast(count(distinct a.user_id) as bigint) as n_users
            from active a join first f using (user_id)
            group by 1, 2
        """,
        "session_window_native": """
            with t as (
              select user_id, event_id, event_type, ts, epoch_us(ts) as us,
                     case when lag(ts) over w is null
                               or epoch_us(ts) - epoch_us(lag(ts) over w)
                                  > 30 * 60000000
                          then 1 else 0 end as is_new
              from events
              window w as (partition by user_id order by ts, event_id)
            ),
            tagged as (
              select user_id, event_type, us,
                     sum(is_new) over (partition by user_id
                                       order by ts, event_id
                                       rows between unbounded preceding
                                            and current row) as sess
              from t
            )
            select user_id, min(us) as first_us, max(us) as last_us,
                   cast(count(*) as bigint) as n_events,
                   cast(count(case when event_type = \'error\' then 1 end) as bigint) as n_error
            from tagged group by user_id, sess
        """,
        "event_sessions": """
            with t as (
              select user_id, event_id, event_type, ts, epoch_us(ts) as us,
                     case when lag(ts) over w is null
                               or epoch_us(ts) - epoch_us(lag(ts) over w)
                                  > 30 * 60000000
                          then 1 else 0 end as is_new
              from events
              window w as (partition by user_id order by ts, event_id)
            ),
            tagged as (
              select user_id, event_id, event_type, us,
                     sum(is_new) over (partition by user_id
                                       order by ts, event_id
                                       rows between unbounded preceding
                                            and current row) as sess
              from t
            )
            select user_id, min(event_id) as session_id,
                   cast(count(*) as bigint) as n_events,
                   cast(count(case when event_type = \'error\' then 1 end) as bigint) as n_error,
                   min(us) as first_us, max(us) as last_us,
                   max(us) - min(us) as duration_us
            from tagged group by user_id, sess
        """,
        "events_hour_window": """
            select cast(trunc(epoch(ts) / 3600.0) as bigint) as epoch_hour,
                   count(*) as n_events,
                   count(distinct user_id) as n_users,
                   min(value) as value_min,
                   max(value) as value_max
            from events
            group by 1
        """,
        "swath_twohop": f"""
            with sw as ({_SWATH_SQL}),
            params as (
              select min(x) - 0.05/2 as x0, max(y) + 0.05/2 as y0,
                     cast(ceil((max(x) + 0.05/2 - (min(x) - 0.05/2)) / 0.05) as bigint) as cols_,
                     cast(ceil(((max(y) + 0.05/2) - (min(y) - 0.05/2)) / 0.05) as bigint) as rows_
              from sw
            ),
            assigned as (
              select sw.swath_id, sw.row, sw.col, sw.value, sw.x, sw.y, p.x0, p.y0, p.rows_, p.cols_,
                cast(round_even((sw.y - p.y0)/(-0.05) - 0.5, 0) as bigint) as orow,
                cast(round_even((sw.x - p.x0)/0.05 - 0.5, 0) as bigint) as ocol
              from sw cross join params p
            ),
            d as (
              select *, sqrt((x - (x0 + 0.05 * (ocol + 0.5))) * (x - (x0 + 0.05 * (ocol + 0.5)))
                           + (y - (y0 + (-0.05) * (orow + 0.5))) * (y - (y0 + (-0.05) * (orow + 0.5)))) as dist
              from assigned
              where orow >= 0 and orow < rows_ and ocol >= 0 and ocol < cols_
            ),
            hop1 as (
              select swath_id, orow, ocol, value, x0, y0 from (
                select *, row_number() over (partition by swath_id, orow, ocol
                                             order by dist, row, col) as rn
                from d where dist <= 0.1
              ) where rn = 1
            ),
            hop2 as (
              select swath_id, value,
                cast(round_even(((y0 + (-0.05) * (orow + 0.5)) - 40.0)/(-0.1) - 0.5, 0) as bigint) as trow,
                cast(round_even(((x0 + 0.05 * (ocol + 0.5)) - (-120.0))/0.1 - 0.5, 0) as bigint) as tcol
              from hop1
            )
            select swath_id, trow, tcol, sum(value) / count(value) as value, count(value) as n
            from hop2
            where trow between 0 and 9 and tcol between 0 and 9
            group by swath_id, trow, tcol
        """,
        "events_cell_count": f"""
            with e as (
              select user_id,
                     value - floor(value / 360.0) * 360.0 - 180.0 as x,
                     cast(user_id % 180 as double) - 90.0 + 0.5 as y
              from events
            )
            select {cells.cell_id_sql("x", "y", 5)} as cell_id,
                   count(*) as n_events, count(distinct user_id) as n_users
            from e group by 1
        """,
    }
    # the streamed flagship drains to the identical row set (see
    # streaming.stream_point_sample_join_available_now) — same oracle
    sql["stream_point_join"] = sql["point_sample_join"]
    # the grouped-fetch strategy is value-identical to the flagship —
    # one oracle certifies both plans
    sql["point_sample_join_grouped"] = sql["point_sample_join"]
    # the streamed histogram's partial-count reduce is pure integer
    # addition — exactly the batch histogram, same oracle
    sql["stream_histogram"] = sql["tile_histogram"]
    sql["stream_composite"] = sql["temporal_composite"]
    sql["stream_decontaminate"] = sql["decontaminate"]
    sql["stream_cohort"] = sql["cohort_retention"]
    sql["stream_sessions"] = sql["event_sessions"]
    return sql
