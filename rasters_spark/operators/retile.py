"""Retile: split tiles into an f×f grid of children (gdal_retile
analogue, split direction).

Re-tiling is how a layer with cluster-unfriendly tile sizes (huge
scenes, whole-image strips) becomes the small splittable units every
other operator here wants. ``retile_split`` is MAP-ONLY: each tile row
yields f² child rows — no shuffle, no neighbor traffic; at any scale
it is one pass over the payload (the opposite merge direction would
need an origin-grouped 4-way join and is not implemented until an
operator needs it).

Child georeferencing: child (ci, cj) of an (h, w) tile keeps the cell
size and CRS and gets ``x_origin + cj·(w/f)·cell_width`` /
``y_origin + ci·(h/f)·cell_height`` — the same closed-form float
expressions a relational twin can evaluate (correctly-rounded IEEE,
bit-identical), and ``image_id || '_' || ci || '_' || cj`` as its id.
Pixel content is an exact integer re-partition of the parent: child
pixel (r, c) = parent pixel (ci·h/f + r, cj·w/f + c) — so an exact
per-child (n_pixels, n_valid, vsum) oracle certifies the split with
pure arithmetic.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rasters_spark import codec

_COLS = ("image_id", "x_origin", "y_origin", "cell_width", "cell_height",
         "crs", "w", "h", "fmt", "bytes")


def retile_split(tiles: DataFrame, factor: int) -> DataFrame:
    """Split every tile into ``factor``×``factor`` children (tile
    dims must divide evenly — loud error otherwise). Returns the same
    tile schema; children are encoded with the PARENT's fmt (q8
    re-quantizes per child; raw/i32/b1 are lossless crops)."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    f = int(factor)
    src = tiles.select(*_COLS)
    schema = ", ".join(
        ["image_id string", "x_origin double", "y_origin double",
         "cell_width double", "cell_height double", "crs string",
         "w int", "h int", "fmt string", "bytes binary"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in _COLS}
            arrs = codec.decode_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            for i, arr in enumerate(arrs):
                hh, ww = arr.shape
                if hh % f or ww % f:
                    raise ValueError(
                        f"tile {pdf['image_id'].iloc[i]} is {ww}x{hh}: "
                        f"not divisible by factor {f}")
                cw = float(pdf["cell_width"].iloc[i])
                ch = float(pdf["cell_height"].iloc[i])
                x0 = float(pdf["x_origin"].iloc[i])
                y0 = float(pdf["y_origin"].iloc[i])
                fmt = pdf["fmt"].iloc[i]
                cwd, chd = ww // f, hh // f
                for ci in range(f):
                    for cj in range(f):
                        sub = np.ascontiguousarray(
                            arr[ci * chd:(ci + 1) * chd, cj * cwd:(cj + 1) * cwd])
                        rows["image_id"].append(
                            f"{pdf['image_id'].iloc[i]}_{ci}_{cj}")
                        rows["x_origin"].append(x0 + cj * (ww / f) * cw)
                        rows["y_origin"].append(y0 + ci * (hh / f) * ch)
                        rows["cell_width"].append(cw)
                        rows["cell_height"].append(ch)
                        rows["crs"].append(pdf["crs"].iloc[i])
                        rows["w"].append(cwd)
                        rows["h"].append(chd)
                        rows["fmt"].append(fmt)
                        rows["bytes"].append(
                            codec.encode_tile(sub.astype(np.float32), fmt))
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=schema)
