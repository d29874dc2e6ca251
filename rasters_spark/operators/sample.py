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
def _idw_kernel(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series,
                x0: pd.Series, y0: pd.Series, cw: pd.Series, ch: pd.Series,
                qx: pd.Series, qy: pd.Series) -> pd.Series:
    """IDW power-2 over ALL pixel centroids of the tile
    (raster.py:1494-1545: w = 1/d^p, nansum(v·w)/sum of valid w)."""
    out = np.empty(len(data), dtype=np.float64)
    for i in range(len(data)):
        arr = codec.decode_tile(data.iloc[i], int(w.iloc[i]), int(h.iloc[i]), fmt.iloc[i])
        hh, ww = arr.shape
        px = x0.iloc[i] + cw.iloc[i] * (np.arange(ww) + 0.5)
        py = y0.iloc[i] + ch.iloc[i] * (np.arange(hh) + 0.5)
        PX, PY = np.meshgrid(px, py)
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


def sample_nearest(joined: DataFrame, value_name: str = "value") -> DataFrame:
    return joined.withColumn(
        value_name,
        _nearest_kernel(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"),
                        F.col("prow"), F.col("pcol")),
    )


def sample_idw(joined: DataFrame, value_name: str = "value") -> DataFrame:
    g = F.col("grid")
    v = _idw_kernel(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"),
                    g["x_origin"], g["y_origin"], g["cell_width"], g["cell_height"],
                    F.col("x"), F.col("y"))
    return joined.withColumn(value_name, v)
