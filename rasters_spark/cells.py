"""Hierarchical global cell index — the engine's spatial join key.

H3/S2-style but hand-rolled on a lat/lon quad hierarchy so that the whole
index is closed-form integer math: pure Spark SQL (codegen'd JVM-side,
foldable, pushdown-friendly) and byte-for-byte reproducible in the DuckDB
oracle. No UDFs anywhere in this module.

Scheme: at level ``L`` the cell size is ``180/2**L`` degrees; the world is
``2·2**L × 2**L`` cells. A cell id packs ``(level, iy, ix)`` into an
int64: ``(L << 56) | (iy << 28) | ix`` (valid for L ≤ 26).

Scale notes (100 TB / 10^12 tiles):
- the id is the shuffle/partition key for every spatial join; parent/child
  arithmetic gives a free two-level coarse/fine scheme for skew splitting;
- tiles *register* into every cell their footprint bbox covers
  (``cells_for_bbox`` — `sequence`+`transform`+`flatten`, exploded), so a
  point↔tile join is a pure equi-join on ``cell_id`` plus a residual bbox
  refinement — the idiomatic Spark reduction of a spatial theta-join;
- hot cells (the fixture injects 20% of tiles into one footprint per
  FIXTURES.md) are handled by ``salted``: the big side takes
  ``pmod(hash(id), S)``, the small side explodes all S salts. AQE
  skew-join splitting is ALSO enabled in session.py; salting covers the
  pathological single-key case AQE can't split below task granularity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rasters_spark.grid import _col

LEVEL_SHIFT = 56
IY_SHIFT = 28


def cell_size_deg(level: int) -> float:
    return 180.0 / (1 << level)


def cell_ix(lon, level: int) -> Column:
    """lon → x cell index, clamped to [0, 2·2^L − 1]."""
    size = cell_size_deg(level)
    nx = 2 * (1 << level)
    ix = F.floor((_col(lon) + 180.0) / size).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(nx - 1), ix))


def cell_iy(lat, level: int) -> Column:
    """lat → y cell index (north→south, like raster rows), clamped."""
    size = cell_size_deg(level)
    ny = 1 << level
    iy = F.floor((90.0 - _col(lat)) / size).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(ny - 1), iy))


def pack(level: int, iy: Column, ix: Column) -> Column:
    return (
        F.lit(level).cast("long") * (1 << LEVEL_SHIFT)
        + iy * (1 << IY_SHIFT)
        + ix
    )


def cell_id(lon, lat, level: int) -> Column:
    """(lon, lat) → int64 cell id at ``level``. Pure SQL."""
    return pack(level, cell_iy(lat, level), cell_ix(lon, level))


def cell_id_sql(lon_expr: str, lat_expr: str, level: int) -> str:
    """The same cell id as an ANSI-SQL string (for DuckDB oracles)."""
    size = repr(cell_size_deg(level))
    nx, ny = 2 * (1 << level), 1 << level
    ix = f"greatest(0, least({nx - 1}, cast(floor((({lon_expr}) + 180.0) / {size}) as bigint)))"
    iy = f"greatest(0, least({ny - 1}, cast(floor((90.0 - ({lat_expr})) / {size}) as bigint)))"
    return f"({level} * {1 << LEVEL_SHIFT} + ({iy}) * {1 << IY_SHIFT} + ({ix}))"


def unpack_ix(cid: Column) -> Column:
    # pure integer ops — ids exceed 2^53, double division would lose bits
    return F.pmod(_col(cid), F.lit(1 << IY_SHIFT))


def unpack_iy(cid: Column) -> Column:
    return F.pmod(F.shiftright(_col(cid), IY_SHIFT), F.lit(1 << (LEVEL_SHIFT - IY_SHIFT)))


def parent(cid, level: int, parent_level: int) -> Column:
    """Coarser ancestor — two-level partitioning for skew splitting."""
    shift = level - parent_level
    ix = F.shiftright(unpack_ix(cid), shift)
    iy = F.shiftright(unpack_iy(cid), shift)
    return pack(parent_level, iy, ix)


def cells_for_bbox(bbox: Column, level: int) -> Column:
    """All cell ids whose footprint intersects bbox → array<long>.

    Pure higher-order-function SQL (sequence → transform → flatten):
    no UDF, no explode yet — caller explodes. Cost is O(cells covered);
    choose ``level`` so typical footprints cover O(1..10) cells.
    """
    ix0, ix1 = cell_ix(bbox["xmin"], level), cell_ix(bbox["xmax"], level)
    # y axis is north→south: ymax → smaller iy
    iy0, iy1 = cell_iy(bbox["ymax"], level), cell_iy(bbox["ymin"], level)
    return F.flatten(
        F.transform(
            F.sequence(iy0, iy1),
            lambda iy: F.transform(F.sequence(ix0, ix1), lambda ix: pack(level, iy, ix)),
        )
    )


def cells_for_bbox_am(bbox: Column, level: int) -> Column:
    """Antimeridian-aware cell registration: a WRAPPED bbox (the
    reference's crossing convention, raster_geometry.py:512-516 —
    ``x_min`` on the east side of the seam is positive, ``x_max``
    negative, so ``xmin > xmax``) splits into [xmin, 180] ∪ [-180, xmax]
    instead of spanning the world. A seam-straddling footprint thus
    registers O(1) cells, not O(world) (VERDICT r01 missing #6).
    Non-wrapped bboxes pass through to ``cells_for_bbox``."""
    from rasters_spark import grid

    east = grid.bbox_struct(bbox["xmin"], bbox["ymin"], F.lit(180.0), bbox["ymax"])
    west = grid.bbox_struct(F.lit(-180.0), bbox["ymin"], bbox["xmax"], bbox["ymax"])
    return F.when(
        bbox["xmin"] > bbox["xmax"],
        F.array_distinct(F.concat(cells_for_bbox(east, level), cells_for_bbox(west, level))),
    ).otherwise(cells_for_bbox(bbox, level))


def ring_cells(cid, level: int, ring: int) -> Column:
    """Chebyshev-ring neighborhood of a cell (incl. itself) → array<long>.

    Longitude wraps (pmod); latitude clamps then dedups via array_distinct.
    Drives kNN candidate generation (cell-ring expansion, SURVEY §2.3).
    """
    nx, ny = 2 * (1 << level), 1 << level
    ix, iy = unpack_ix(cid), unpack_iy(cid)
    return F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(F.lit(-ring), F.lit(ring)),
                lambda dy: F.transform(
                    F.sequence(F.lit(-ring), F.lit(ring)),
                    lambda dx: pack(
                        level,
                        F.greatest(F.lit(0), F.least(F.lit(ny - 1), iy + dy)),
                        F.pmod(ix + dx, F.lit(nx)),
                    ),
                ),
            )
        )
    )


def ring_cells_bbox(bbox: Column, level: int, ring: int) -> Column:
    """Union of Chebyshev-``ring`` neighborhoods around EVERY cell a
    bbox covers → array<long> of DISTINCT cells, generated directly as
    the padded index rectangle (round-6 kNN optimization).

    ``cells_for_bbox`` covers the contiguous clamped range
    [iy0..iy1]×[ix0..ix1]; the union of rings around those cells is
    exactly [iy0−R..iy1+R]×[ix0−R..ix1+R] with latitude clamped and
    longitude wrapped — so generating the padded rectangle yields the
    identical candidate set as exploding per-cell rings, WITHOUT the
    ~4× duplicate rows a multi-cell footprint produces (adjacent cells'
    rings overlap). Distinctness is by construction: each iy appears
    once, and the ix sequence is capped at nx values before the pmod
    wrap."""
    nx, ny = 2 * (1 << level), 1 << level
    ix0, ix1 = cell_ix(bbox["xmin"], level), cell_ix(bbox["xmax"], level)
    iy0, iy1 = cell_iy(bbox["ymax"], level), cell_iy(bbox["ymin"], level)
    lo_y = F.greatest(F.lit(0), iy0 - ring)
    hi_y = F.least(F.lit(ny - 1), iy1 + ring)
    lo_x = ix0 - ring
    hi_x = F.least(ix1 + ring, lo_x + nx - 1)  # never wrap past a full circle
    return F.flatten(
        F.transform(
            F.sequence(lo_y, hi_y),
            lambda iy: F.transform(
                F.sequence(lo_x, hi_x),
                lambda ix: pack(level, iy, F.pmod(ix, F.lit(nx))),
            ),
        )
    )


def salted(cid, n_salts: int) -> Column:
    """Composite skew key: cell_id scaled + deterministic per-row salt.

    Big side: ``salted(cell_id, S)`` with salt from a row-unique column;
    small side: explode ``sequence(0, S-1)`` and add. Keeps the join an
    equi-join while spreading one hot cell over S reducers.
    """
    return _col(cid) * n_salts


def salt_of(unique_col, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(_col(unique_col)), F.lit(n_salts))


# --- Z-order (Morton) ids: file-level spatial clustering ----------------------
#
# The (level, iy, ix) packing above is the JOIN key; its row-major layout
# gives contiguous id ranges only along x. For DATA LAYOUT at 10^12 rows
# — sorting/bucketing the tile table so parquet/Iceberg min-max stats
# prune spatial range scans — interleave the bits instead: Morton order
# keeps any 2-D neighborhood inside O(1) short id ranges (the same
# trick as Delta/Iceberg Z-ORDER clustering). Pure integer magic-mask
# math → identical in Spark SQL and the DuckDB oracle, no UDFs.

_SPREAD_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(c: Column) -> Column:
    """Spread the low 28 bits of ``c`` into the even bit positions
    (classic magic-mask bit dilation, public domain)."""
    out = _col(c)
    for shift, mask in _SPREAD_MASKS:
        out = F.shiftleft(out, shift).bitwiseOR(out).bitwiseAND(F.lit(mask))
    return out


def z_cell_id(lon, lat, level: int) -> Column:
    """(lon, lat) → Morton-interleaved cell id at ``level``:
    ``(level << 57) | interleave(iy, ix)`` (x in even bits, y in odd;
    56 interleaved bits + 5 level bits fit a signed int64)."""
    zx = _spread_bits(cell_ix(lon, level))
    zy = _spread_bits(cell_iy(lat, level))
    return (
        F.lit(level).cast("long") * F.lit(1 << 57)
        + F.shiftleft(zy, 1).bitwiseOR(zx)
    )


def z_cell_id_sql(lon_expr: str, lat_expr: str, level: int) -> str:
    """The same Morton id as an ANSI-SQL string (DuckDB oracle twin —
    bit-identical integer math, same masks)."""
    size = repr(cell_size_deg(level))
    nx, ny = 2 * (1 << level), 1 << level
    ix = f"greatest(0, least({nx - 1}, cast(floor((({lon_expr}) + 180.0) / {size}) as bigint)))"
    iy = f"greatest(0, least({ny - 1}, cast(floor((90.0 - ({lat_expr})) / {size}) as bigint)))"

    def spread(e: str) -> str:
        for shift, mask in _SPREAD_MASKS:
            e = f"((({e}) << {shift} | ({e})) & {mask})"
        return e

    return f"({level} * {1 << 57} + (({spread(iy)}) << 1 | {spread(ix)}))"


# --- XYZ (slippy-map) tiles: the Web-Mercator pyramid scheme ------------------
#
# The de-facto web tiling standard (OSM/Google "z/x/y"): zoom z splits
# the EPSG:3857 square into 2^z × 2^z tiles. Pairs with the
# functions.crs Web-Mercator kernel for rendering pyramids; as a JOIN
# key it is an alternative quad hierarchy whose y axis is conformal
# (Mercator) instead of equirectangular. Pure SQL — the formula TEXT is
# shared verbatim between the Spark expression and the DuckDB oracle
# (CLAUDE.md parity rule for transcendental-bearing expressions).

#: Web-Mercator clip latitude: atan(sinh(pi)) — tiles exist only inside
WEBMERC_LAT_MAX = 85.05112877980659


def xyz_tile_sql(lon_expr: str, lat_expr: str, z: int) -> tuple[str, str]:
    """SQL text for ``struct/row (xtile, ytile)`` at zoom ``z`` —
    identical characters fed to Spark and DuckDB so both engines
    evaluate the same ln/tan expression tree."""
    n = 1 << z
    x = f"cast(floor((({lon_expr}) + 180.0) / 360.0 * {n}) as bigint)"
    mercfrac = (f"(1.0 - ln(tan(radians({lat_expr})) + 1.0 / cos(radians({lat_expr}))) "
                f"/ pi()) / 2.0")
    y = f"cast(floor({mercfrac} * {n}) as bigint)"
    # the +180/-180 seam and the poles clamp into the edge tiles
    xc = f"least(greatest({x}, 0), {n - 1})"
    yc = f"least(greatest({y}, 0), {n - 1})"
    return xc, yc


def xyz_tile(lon, lat, z: int) -> tuple[Column, Column]:
    """(xtile, ytile) columns at zoom ``z`` (OSM slippy-map scheme)."""
    assert isinstance(lon, str) and isinstance(lat, str), \
        "xyz_tile takes column NAMES so the SQL text can be shared with the oracle"
    xs, ys = xyz_tile_sql(lon, lat, z)
    return F.expr(xs), F.expr(ys)
