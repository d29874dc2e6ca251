"""NumPy transcription of the reference formulas — the golden oracle.

The reference package itself is not importable here (rasterio/shapely/
pyproj absent — SURVEY §7.5), so correctness is pinned by this module:
a direct, minimal transcription of the cited formulas from
/root/reference, used by tests and by the fixture generator. It is NOT
used in any Spark execution path (engine math lives in grid.py/cells.py
as SQL and in operators/ as Arrow kernels).
"""

from __future__ import annotations

import numpy as np

from rasters_spark.cells import IY_SHIFT, LEVEL_SHIFT


# --- grid math (rasters/raster_grid.py) --------------------------------------

def index_point(x, y, x0, y0, cw, ch):
    """raster_grid.py:717-735 — inverse center affine + banker's round."""
    # expression order matches the SQL side exactly: (x - x0)/cw - 0.5
    col = np.round((np.asarray(x, dtype=np.float64) - x0) / cw - 0.5).astype(np.int64)
    row = np.round((np.asarray(y, dtype=np.float64) - y0) / ch - 0.5).astype(np.int64)
    return row, col


def window_for_bbox(xmin, ymin, xmax, ymax, x0, y0, cw, ch, rows, cols, buffer=None):
    """raster_grid.py:770-815 — returns (row_start, col_start, row_end,
    col_end, oob)."""
    row_start, col_start = index_point(xmin, ymax, x0, y0, cw, ch)
    row_end, col_end = index_point(xmax, ymin, x0, y0, cw, ch)
    row_end, col_end = row_end + 1, col_end + 1
    oob = (row_end < 0) | (col_end < 0) | (row_start > rows) | (col_start > cols)
    if buffer is not None:
        row_start, col_start = row_start - buffer, col_start - buffer
        row_end, col_end = row_end + buffer, col_end + buffer
    return (
        np.maximum(row_start, 0),
        np.maximum(col_start, 0),
        np.minimum(row_end, rows),
        np.minimum(col_end, cols),
        oob,
    )


def cell_center(row, col, x0, y0, cw, ch):
    """affine_center × (col, row) — raster_grid.py:687-715."""
    return x0 + cw * (np.asarray(col) + 0.5), y0 + ch * (np.asarray(row) + 0.5)


def idw(values, px, py, qx, qy, power=2.0):
    """raster.py:1494-1545 — IDW over all pixel centroids, NaN-aware."""
    d = np.hypot(px - qx, py - qy)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = 1.0 / d**power
    if np.any(d == 0):
        return float(values.flat[np.argmin(d)])
    return float(np.nansum(values * w) / np.sum(w[np.isfinite(values)]))


# --- global cell index (mirror of cells.py) -----------------------------------

def np_cell_id(lon, lat, level: int):
    size = 180.0 / (1 << level)
    nx, ny = 2 * (1 << level), 1 << level
    ix = np.clip(np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / size), 0, nx - 1).astype(np.int64)
    iy = np.clip(np.floor((90.0 - np.asarray(lat, dtype=np.float64)) / size), 0, ny - 1).astype(np.int64)
    return (np.int64(level) << LEVEL_SHIFT) | (iy << IY_SHIFT) | ix


def np_cells_for_bbox(xmin, ymin, xmax, ymax, level: int):
    size = 180.0 / (1 << level)
    nx, ny = 2 * (1 << level), 1 << level
    ix0 = int(np.clip(np.floor((xmin + 180.0) / size), 0, nx - 1))
    ix1 = int(np.clip(np.floor((xmax + 180.0) / size), 0, nx - 1))
    iy0 = int(np.clip(np.floor((90.0 - ymax) / size), 0, ny - 1))
    iy1 = int(np.clip(np.floor((90.0 - ymin) / size), 0, ny - 1))
    out = []
    for iy in range(iy0, iy1 + 1):
        for ix in range(ix0, ix1 + 1):
            out.append((level << LEVEL_SHIFT) | (iy << IY_SHIFT) | ix)
    return out


# --- CRS scalar functions ------------------------------------------------------

def local_utm_proj4(lat: float, lon: float) -> str:
    """local_UTM_proj4.py:9-44 — NOTE: zone = floor((lon+180)/6) WITHOUT +1,
    clamped to [1, 60] (the reference's quirk; test pins lon −120 → zone 10)."""
    if not -180 <= lon <= 180:
        raise ValueError(f"longitude out of range: {lon}")
    zone = int((lon + 180) / 6)
    zone = max(1, min(zone, 60))
    south = " +south" if lat < 0 else ""
    return f"+proj=utm +zone={zone}{south} +ellps=WGS84 +datum=WGS84 +units=m +no_defs"


# --- resampling-kernel goldens (independent scalar transcriptions) -------------
#
# Naive per-candidate loops used ONLY by pytest to pin the vectorized
# engine kernels in operators/resample.py (GDAL kernel formulas are
# public: Keys 1981 bicubic a=-0.5, cubic B-spline, Lanczos a=3,
# Gaussian). Deliberately written as scalar code so an indexing bug in
# the vectorized path can't hide in its own golden.

def _kernel_weight(x: float, kind: str) -> float:
    ax = abs(x)
    if kind == "linear":
        return max(1.0 - ax, 0.0)
    if kind == "cubic":  # Keys, a=-0.5
        a = -0.5
        if ax <= 1:
            return (a + 2) * ax**3 - (a + 3) * ax**2 + 1
        if ax < 2:
            return a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a
        return 0.0
    if kind == "cubic_spline":  # B3
        if ax <= 1:
            return 2.0 / 3.0 - ax**2 + ax**3 / 2.0
        if ax < 2:
            return (2.0 - ax) ** 3 / 6.0
        return 0.0
    if kind == "lanczos":  # a=3
        if ax >= 3:
            return 0.0
        return float(np.sinc(x) * np.sinc(x / 3.0))
    if kind == "gauss":
        return float(np.exp(-0.5 * x * x))
    raise ValueError(kind)


_KERNEL_TAPS = {
    "linear": (0, 1), "cubic": (-1, 0, 1, 2), "cubic_spline": (-1, 0, 1, 2),
    "lanczos": (-2, -1, 0, 1, 2, 3), "gauss": (-1, 0, 1, 2),
}


def conv_sample_naive(arr: np.ndarray, fr: float, fc: float, kind: str,
                      normalize: bool = False) -> float:
    """One target sample at fractional source position (fr, fc):
    separable tap stencil, edge-clamped, NaN propagates."""
    hh, ww = arr.shape
    r0, c0 = int(np.floor(fr)), int(np.floor(fc))
    dr, dc = fr - r0, fc - c0
    taps = _KERNEL_TAPS[kind]
    num, den = 0.0, 0.0
    for i in taps:
        wi = _kernel_weight(dr - i, kind)
        for j in taps:
            wj = _kernel_weight(dc - j, kind)
            v = float(arr[min(max(r0 + i, 0), hh - 1), min(max(c0 + j, 0), ww - 1)])
            num += wi * wj * v
            den += wi * wj
    return num / den if normalize else num


def segment_stat_naive(key, val, stat: str):
    """Per-key statistic via plain dict grouping (golden for
    resample._segment_stat)."""
    groups: dict = {}
    for k, v in zip(key, val):
        groups.setdefault(int(k), []).append(float(v))
    keys = sorted(groups)
    out, counts = [], []
    for k in keys:
        vs = sorted(groups[k])
        n = len(vs)
        counts.append(n)
        if stat == "min":
            out.append(vs[0])
        elif stat == "sum":
            out.append(float(np.sum(vs)))
        elif stat == "max":
            out.append(vs[-1])
        elif stat in ("med", "q1", "q3"):
            q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[stat]
            pos = (n - 1) * q
            lo, hi = int(np.floor(pos)), int(np.ceil(pos))
            out.append(vs[lo] + (pos - lo) * (vs[hi] - vs[lo]))
        elif stat == "mode":
            best_v, best_c = None, -1
            for v in vs:  # ascending → ties resolve to smallest value
                c = vs.count(v)
                if c > best_c:
                    best_v, best_c = v, c
            out.append(best_v)
    return np.array(keys), np.array(out), np.array(counts)


def local_utm_epsg(lat: float, lon: float) -> int:
    """raster_geometry.py:231-238 — standard zone formula WITH +1."""
    zone = int((np.floor((lon + 180) / 6) % 60) + 1)
    return int(f"{326 if lat >= 0 else 327}{zone:02d}")
