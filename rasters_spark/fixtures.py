"""Deterministic synthetic fixture tables (FIXTURES.md; seed 42).

Writes, per scale directory, single-file parquet tables under
``/root/repo/.fixtures/<sfname>/``:

- ``tiles``    — the primary input table of BASELINE.json `input_hint`:
  ``(image_id, bytes, w, h, fmt, caption, phash)`` + the derived grid
  columns ``(x_origin, y_origin, cell_width, cell_height, crs)`` stored
  redundantly so the DuckDB oracle can reproduce cell assignment from
  the same rows. All grid params are ALSO closed-form functions of the
  tile index ``i`` (deterministic jitter, no RNG), per FIXTURES.md §1.
- ``pixels``   — decoded pixels exploded ``(image_id, prow, pcol, value)``
  (only for small scales; independent materialization of the same
  generator output, so a Spark binary-decode path and a DuckDB SQL path
  can be value-hash-compared).
- ``points``   — query probes incl. adversarial banker's-rounding pins.
- ``polygons`` — rect + convex + concave rings (+ bbox columns; rect
  polygons are oracle-checkable in pure SQL, complex ones are pinned by
  pytest golden tests).

Pixel values are exact quarter-integers (k·0.25) so float sums are
EXACT in double — cross-engine aggregates match bit-for-bit regardless
of accumulation order. Skew: tiles with ``i % 5 == 0`` (20%) share one
hot footprint (north-rule skew handling exercise).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rasters_spark import codec, npref

FIXTURE_VERSION = "v3"
# small row groups → Spark gets splittable scan partitions (a single-file
# single-row-group parquet pins every Arrow kernel stage to ONE task)
TILE_ROW_GROUP = 512
PIXEL_ROW_GROUP = 262_144
FIXTURE_ROOT = Path(os.environ.get("SPARK_GRAFT_FIXTURES", "/root/repo/.fixtures"))
CELL_LEVEL = 7  # 180/2^7 = 1.40625° cells; ~1° tile footprints cover 1-4 cells

W_CYCLE = (16, 32, 64)
H_CYCLE = (16, 32, 48)
HOT_X, HOT_Y = 10.25, 45.75  # shared hot-spot footprint origin (20% of tiles)


def scale_of(sf_dir: str) -> float:
    name = Path(sf_dir).name  # e.g. "sf0.01"
    return float(name[2:]) if name.startswith("sf") else 0.01


def n_tiles_for(sf: float) -> int:
    return max(200, int(round(sf * 200_000)))


def n_points_for(sf: float) -> int:
    return max(500, int(round(sf * 500_000)))


# --- closed-form per-tile georeferencing (FIXTURES.md §1) ----------------------

def tile_origin(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic, RNG-free: reproducible in SQL from the tile index."""
    i = np.asarray(i, dtype=np.int64)
    jitter = ((i * 16807) % 97).astype(np.float64) / 1000.0  # < 0.097°
    x0 = -180.0 + (i % 360).astype(np.float64) * 1.0 + jitter
    y0 = 80.0 - ((i // 360) % 160).astype(np.float64) * 1.0
    hot = (i % 5) == 0
    x0 = np.where(hot, HOT_X, x0)
    y0 = np.where(hot, HOT_Y, y0)
    return x0, y0


def tile_origin_sql(i_expr: str) -> tuple[str, str]:
    """Same origins as ANSI SQL (DuckDB oracle)."""
    jitter = f"cast((({i_expr}) * 16807) % 97 as double) / 1000.0"
    x0 = f"(case when ({i_expr}) % 5 = 0 then {HOT_X} else -180.0 + cast(({i_expr}) % 360 as double) + {jitter} end)"
    y0 = f"(case when ({i_expr}) % 5 = 0 then {HOT_Y} else 80.0 - cast((({i_expr}) // 360) % 160 as double) end)"
    return x0, y0


def _tile_payload(i: int, seed: int, lossy_every: int):
    """One tile's deterministic payload — seeded PER TILE so generation
    parallelizes without changing any byte."""
    w, h = W_CYCLE[i % 3], H_CYCLE[(i // 3) % 3]
    rng = np.random.default_rng(seed * 1_000_003 + i)
    # exact quarter-integers → order-independent exact double sums
    vals = (rng.integers(0, 4000, size=(h, w)).astype(np.float32)) * np.float32(0.25)
    vals[rng.random((h, w)) < 0.02] = np.nan
    fmt = "q8" if (i % lossy_every) == 3 else "raw"
    blob = codec.encode_tile(vals, fmt)
    decoded = codec.decode_tile(blob, w, h, fmt)
    return blob, fmt, codec.phash64(decoded), decoded


def _tile_chunk(args):
    lo, hi, seed, lossy_every, keep_pixels = args
    out = []
    for i in range(lo, hi):
        blob, fmt, ph, decoded = _tile_payload(i, seed, lossy_every)
        out.append((i, blob, fmt, ph, decoded if keep_pixels else None))
    return out


def make_tiles(n: int, seed: int = 42, lossy_every: int = 17):
    """Generate the tiles table + exploded pixels as pyarrow tables.
    Parallel across a process pool for large n (deterministic: every
    tile is seeded independently)."""
    idx = np.arange(n, dtype=np.int64)
    x0s, y0s = tile_origin(idx)
    ws = np.array([W_CYCLE[i % 3] for i in range(n)], dtype=np.int32)
    hs = np.array([H_CYCLE[(i // 3) % 3] for i in range(n)], dtype=np.int32)

    ids, blobs, fmts, captions, phashes = [], [], [], [], []
    px_img, px_row, px_col, px_val = [], [], [], []
    cws, chs = [], []
    keep_pixels = n <= 5000

    chunk = 10_000
    tasks = [(lo, min(lo + chunk, n), seed, lossy_every, keep_pixels) for lo in range(0, n, chunk)]
    if len(tasks) > 1:
        import multiprocessing as mp

        with mp.Pool(min(16, len(tasks))) as pool:
            chunks = pool.map(_tile_chunk, tasks)
    else:
        chunks = [_tile_chunk(t) for t in tasks]

    for payloads in chunks:
        for i, blob, fmt, ph, decoded in payloads:
            w, h = int(ws[i]), int(hs[i])
            cw, ch = 1.0 / w, -1.0 / h  # ~1°×1° footprint
            cx, cy = x0s[i] + 0.5, y0s[i] - 0.5
            cell = int(npref.np_cell_id(cx, cy, CELL_LEVEL))
            ids.append(f"img{i:012d}")
            blobs.append(blob)
            fmts.append(fmt)
            captions.append(f"caption for tile {i} at cell {cell}")
            phashes.append(ph)
            cws.append(cw)
            chs.append(ch)
            if keep_pixels:
                rr, cc = np.indices((h, w))
                px_img.extend([ids[-1]] * (h * w))
                px_row.extend(rr.ravel().tolist())
                px_col.extend(cc.ravel().tolist())
                px_val.extend(decoded.ravel().tolist())

    tiles = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
            "x_origin": pa.array(x0s, pa.float64()),
            "y_origin": pa.array(y0s, pa.float64()),
            "cell_width": pa.array(cws, pa.float64()),
            "cell_height": pa.array(chs, pa.float64()),
            "crs": pa.array(["EPSG:4326"] * n, pa.string()),
        }
    )
    pixels = None
    if keep_pixels:
        pixels = pa.table(
            {
                "image_id": pa.array(px_img, pa.string()),
                "prow": pa.array(px_row, pa.int32()),
                "pcol": pa.array(px_col, pa.int32()),
                "value": pa.array(np.array(px_val, dtype=np.float32), pa.float32()),
            }
        )
    return tiles, pixels


def make_points(n: int, seed: int = 43):
    """Query probes: uniform over the tile extent + adversarial pins."""
    rng = np.random.default_rng(seed)
    xs = rng.uniform(-180.0, 180.0, n)
    ys = rng.uniform(-80.0, 80.0, n)
    # adversarial block (overwrites the first rows; deterministic):
    adv = [
        (HOT_X + 0.5, HOT_Y - 0.5),          # hot-cell center
        (HOT_X, HOT_Y),                       # exact tile corner
        (HOT_X + 1.0 / 32, HOT_Y - 1.0 / 32), # exact cell edge of a 32-wide tile
        (HOT_X + 0.5 / 16, HOT_Y - 0.5 / 16), # half-integer inverse-affine pin
        (-179.999, 0.0),                      # antimeridian west
        (179.999, 0.0),                       # antimeridian east
        (0.0, 89.9),                          # outside all tiles (north of 80)
        (12.345, -85.0),                      # outside all tiles (south)
    ]
    for j, (ax, ay) in enumerate(adv):
        if j < n:
            xs[j], ys[j] = ax, ay
    return pa.table(
        {
            "point_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "x": pa.array(xs, pa.float64()),
            "y": pa.array(ys, pa.float64()),
            "crs": pa.array(["EPSG:4326"] * n, pa.string()),
        }
    )


def make_polygons(seed: int = 44, n_rect: int = 24):
    """Rect polygons (oracle-checkable via bbox) + convex/concave/sliver."""
    rng = np.random.default_rng(seed)
    rows = []
    for p in range(n_rect):
        cx = float(rng.uniform(-170, 170))
        cy = float(rng.uniform(-70, 70))
        hw = float(rng.uniform(0.2, 8.0))
        hh = float(rng.uniform(0.2, 8.0))
        ring = [(cx - hw, cy - hh), (cx + hw, cy - hh), (cx + hw, cy + hh), (cx - hw, cy + hh), (cx - hw, cy - hh)]
        rows.append((p, ring, True, float(p + 1)))
    # one rect over the hot footprint (skew-join exercise)
    rows.append((n_rect, [(HOT_X - 1, HOT_Y - 3), (HOT_X + 3, HOT_Y - 3), (HOT_X + 3, HOT_Y + 1), (HOT_X - 1, HOT_Y + 1), (HOT_X - 1, HOT_Y - 3)], True, 100.0))
    # convex pentagon
    ang = np.linspace(0, 2 * np.pi, 6)[:-1]
    pent = [(float(20 + 3 * np.cos(a)), float(20 + 3 * np.sin(a))) for a in ang]
    rows.append((n_rect + 1, pent + [pent[0]], False, 101.0))
    # concave (arrow)
    rows.append((n_rect + 2, [(40.0, 10.0), (44.0, 10.0), (42.0, 12.0), (44.0, 14.0), (40.0, 14.0), (40.0, 10.0)], False, 102.0))
    # degenerate sliver
    rows.append((n_rect + 3, [(60.0, 0.0), (61.0, 0.001), (62.0, 0.0), (60.0, 0.0)], False, 103.0))

    poly_ids, rings, is_rect, burns = [], [], [], []
    bxmin, bymin, bxmax, bymax = [], [], [], []
    for pid, ring, rect, burn in rows:
        poly_ids.append(pid)
        rings.append([{"x": float(x), "y": float(y)} for x, y in ring])
        is_rect.append(rect)
        burns.append(burn)
        xs = [x for x, _ in ring]
        ys = [y for _, y in ring]
        bxmin.append(min(xs)); bymin.append(min(ys)); bxmax.append(max(xs)); bymax.append(max(ys))
    ring_type = pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))
    return pa.table(
        {
            "poly_id": pa.array(poly_ids, pa.int64()),
            "ring": pa.array(rings, ring_type),
            "is_rect": pa.array(is_rect, pa.bool_()),
            "burn_value": pa.array(burns, pa.float64()),
            "xmin": pa.array(bxmin, pa.float64()),
            "ymin": pa.array(bymin, pa.float64()),
            "xmax": pa.array(bxmax, pa.float64()),
            "ymax": pa.array(bymax, pa.float64()),
            "crs": pa.array(["EPSG:4326"] * len(poly_ids), pa.string()),
        }
    )


def fixture_dir(sf_dir: str) -> Path:
    return FIXTURE_ROOT / Path(sf_dir).name


def ensure_fixtures(sf_dir: str) -> Path:
    """Idempotent: write fixtures for the scale of ``sf_dir`` if missing."""
    out = fixture_dir(sf_dir)
    marker = out / f".complete-{FIXTURE_VERSION}"
    if marker.exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    sf = scale_of(sf_dir)
    tiles, pixels = make_tiles(n_tiles_for(sf))
    pq.write_table(tiles, out / "tiles.parquet", row_group_size=TILE_ROW_GROUP)
    if pixels is not None:
        pq.write_table(pixels, out / "pixels.parquet", row_group_size=PIXEL_ROW_GROUP)
    pq.write_table(make_points(n_points_for(sf)), out / "points.parquet", row_group_size=65_536)
    pq.write_table(make_polygons(), out / "polygons.parquet")
    marker.touch()
    return out
