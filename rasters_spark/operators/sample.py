"""Point-sampling kernels (Arrow-vectorized; one Python step per tile).

Reference semantics (raster.py:1295-1322): sampling method dispatches on
dtype — integer rasters → nearest, float rasters → IDW over all pixel
centroids with power 2 (raster.py:1494-1545). Out-of-bounds → NaN
(here: dropped by the join / NULL). NaN pixels surface as SQL NULL.

The kernels receive the *joined* rows (point × matched tile) so each
batch decodes each distinct tile once (LRU per batch) and does pure
numpy indexing — no per-pixel Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from rasters_spark import codec


@pandas_udf(DoubleType())
def _nearest_kernel(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series,
                    prow: pd.Series, pcol: pd.Series) -> pd.Series:
    out = np.empty(len(data), dtype=np.float64)
    for i, (b, wi, hi, f, r, c) in enumerate(zip(data, w, h, fmt, prow, pcol)):
        # O(1) offset read per pair — no whole-tile decode on the hot path
        out[i] = codec.pixel_at(b, int(wi), int(hi), f, int(r), int(c))
    # Arrow's pandas→arrow conversion maps NaN→null: NaN pixels surface as SQL NULL
    return pd.Series(out)


@pandas_udf(DoubleType())
def _nearest_slice_kernel(sl: pd.Series, fmt: pd.Series) -> pd.Series:
    """Decode pre-sliced pixel payloads: 4 bytes (raw) or 9 bytes
    (q8 header+byte) per row — fully vectorized numpy, no per-pixel math
    left in Python beyond frombuffer."""
    out = np.empty(len(sl), dtype=np.float64)
    is_raw = (fmt == "raw").to_numpy()
    if is_raw.any():
        raw = b"".join(sl[is_raw])
        out[is_raw] = np.frombuffer(raw, dtype="<f4")
    if (~is_raw).any():
        qi = np.flatnonzero(~is_raw)
        for i in qi:
            b = sl.iloc[i]
            vmin, vmax = np.frombuffer(b, dtype="<f4", count=2)
            q = b[8]
            if q == 255:
                out[i] = np.nan
            else:
                span = float(vmax - vmin) or 1.0
                out[i] = float(np.float32(vmin) + np.float32(q) / np.float32(254.0) * np.float32(span))
    return pd.Series(out)


@pandas_udf(DoubleType())
def _idw_kernel(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series,
                x0: pd.Series, y0: pd.Series, cw: pd.Series, ch: pd.Series,
                qx: pd.Series, qy: pd.Series) -> pd.Series:
    """IDW power-2 over ALL pixel centroids of the tile
    (raster.py:1494-1545: w = 1/d^p, nansum(v·w)/sum of valid w)."""
    out = np.empty(len(data), dtype=np.float64)
    decode_cache: dict[bytes, np.ndarray] = {}
    mesh_cache: dict[tuple, tuple] = {}
    for i in range(len(data)):
        key = data.iloc[i]
        arr = decode_cache.get(key)
        if arr is None:
            arr = codec.decode_tile(key, int(w.iloc[i]), int(h.iloc[i]), fmt.iloc[i])
            if len(decode_cache) < 256:  # hot tiles repeat across skewed pairs
                decode_cache[key] = arr
        hh, ww = arr.shape
        mkey = (x0.iloc[i], y0.iloc[i], cw.iloc[i], ch.iloc[i], ww, hh)
        mesh = mesh_cache.get(mkey)
        if mesh is None:
            px = x0.iloc[i] + cw.iloc[i] * (np.arange(ww) + 0.5)
            py = y0.iloc[i] + ch.iloc[i] * (np.arange(hh) + 0.5)
            mesh = np.meshgrid(px, py)
            if len(mesh_cache) < 256:
                mesh_cache[mkey] = mesh
        PX, PY = mesh
        d = np.hypot(PX - qx.iloc[i], PY - qy.iloc[i])
        exact = d == 0
        if exact.any():
            out[i] = arr[exact][0]
            continue
        wgt = 1.0 / d**2
        valid = np.isfinite(arr)
        denom = wgt[valid].sum()
        out[i] = np.nan if denom == 0 else float((arr[valid] * wgt[valid]).sum() / denom)
    return pd.Series(out)


def slice_pixel(row_col: str, col_col: str):
    """JVM-side single-pixel byte slice for a (bytes, w, fmt) row given
    pixel coordinates in columns ``row_col``/``col_col``: 4 bytes (raw)
    or 9 bytes (q8 header+byte). Decode the result with
    ``_nearest_slice_kernel`` — Arrow then ships ~8 B/row to Python
    instead of the whole tile blob (CLAUDE.md: never carry bytes
    through join fanout)."""
    off = f"({row_col}*w+{col_col})"
    return F.when(
        F.col("fmt") == "raw",
        F.expr(f"substring(bytes, cast(4*{off} as int) + 1, 4)"),
    ).otherwise(
        F.concat(F.expr("substring(bytes, 1, 8)"),
                 F.expr(f"substring(bytes, cast({off} as int) + 9, 1)"))
    )


def decode_slice(sl, fmt):
    """Decode a ``slice_pixel`` payload column to a double (NaN→NULL)."""
    return _nearest_slice_kernel(sl, fmt)


def sample_nearest(joined: DataFrame, value_name: str = "value") -> DataFrame:
    """Nearest-pixel sampling with JVM-side byte slicing.

    The joined rows carry the full tile blob; slicing the 4 (raw) / 9
    (q8) relevant bytes with binary ``substring`` INSIDE the join stage
    means Arrow ships ~8 bytes/row to Python instead of the whole tile
    — on skewed cells (one tile matched by thousands of points) this is
    the difference between ~4 MB and ~GBs per stage."""
    return joined.withColumn("_sl", slice_pixel("prow", "pcol")).withColumn(
        value_name, _nearest_slice_kernel(F.col("_sl"), F.col("fmt"))
    ).drop("_sl")


def sample_idw(joined: DataFrame, value_name: str = "value") -> DataFrame:
    g = F.col("grid")
    v = _idw_kernel(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"),
                    g["x_origin"], g["y_origin"], g["cell_width"], g["cell_height"],
                    F.col("x"), F.col("y"))
    return joined.withColumn(value_name, v)
