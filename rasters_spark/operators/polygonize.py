"""Polygonize: connected-component regions over a thresholded tile set.

Raster→vector region labeling (the GDAL ``polygonize`` analogue —
EXTENSION beyond the reference, which has no region family):
4-adjacent connected components of the mask ``value >= threshold``
across the WHOLE lattice, tile seams included. The canonical region id
is the component's minimum global pixel key ``gy·2³² + gx`` —
engine-reproducible with no dependence on visit order.

Scale design — the three-stage shape every distributed CCL uses
(tile-local labeling + boundary graph + tiny global reduction):
1. **map-only local CCL** per tile (row-run union-find — O(rows)
   Python steps, all per-pixel work vectorized) → per-region summary
   rows (node key = tile-local min pixel key, pixel count) and masked
   BOUNDARY-pixel rows. Both outputs are skinny: O(regions) and
   O(perimeter) per tile; the tile payload never leaves its task.
2. **seam edges**: two self-equi-joins of the boundary rows on global
   (gx+1, gy) / (gx, gy+1) adjacency — the joined set is perimeter
   pixels only, ~4/√A of the data.
3. **global label propagation** over the (node, node) seam graph —
   ``datapipe.dedup.dup_groups`` (iterative min-label broadcast joins,
   the same operator that clusters near-duplicate documents); the
   graph has one node per tile-local REGION, orders of magnitude
   smaller than pixels. Region summaries then fold with
   ``sum(n_pixels)`` per root.

Mixed layouts: the global pixel key is layout-local (two layout groups
can reuse (gx, gy)); process one layout group per call — the contract
entry filters the (w=64, h=48) group and the docstring of
``polygonize`` makes the requirement loud.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rasters_spark import codec

_KEY_STRIDE = 1 << 32


def _local_ccl(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Tile-local 4-adjacency CCL via row-run union-find: labels are
    0..n_runs-1 run ids resolved to component roots. Returns the
    per-pixel root-run grid (-1 outside the mask) and the run count.
    Python work is O(rows + overlapping run pairs); per-pixel work is
    vectorized."""
    h, w = mask.shape
    run_id = np.full((h, w), -1, dtype=np.int64)
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    prev_runs = None  # (starts, ends, ids) of the previous row
    for i in range(h):
        row = mask[i]
        if not row.any():
            prev_runs = None
            continue
        d = np.diff(np.concatenate(([0], row.view(np.int8), [0])))
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0]          # exclusive
        ids = np.arange(len(parent), len(parent) + len(starts), dtype=np.int64)
        parent.extend(range(len(parent), len(parent) + len(starts)))
        for s, e, rid in zip(starts, ends, ids):
            run_id[i, s:e] = rid
        if prev_runs is not None:
            ps, pe, pid = prev_runs
            # overlapping column ranges → union (two-pointer sweep)
            a = b = 0
            while a < len(starts) and b < len(ps):
                if starts[a] < pe[b] and ps[b] < ends[a]:
                    union(int(ids[a]), int(pid[b]))
                if ends[a] < pe[b]:
                    a += 1
                else:
                    b += 1
        prev_runs = (starts, ends, ids)

    if parent:
        roots = np.array([find(r) for r in range(len(parent))], dtype=np.int64)
        m = run_id >= 0
        run_id[m] = roots[run_id[m]]
    return run_id, len(parent)


def _tile_regions(arr: np.ndarray, threshold: float, gx0: int, gy0: int):
    """(summary, boundary) frames for one tile: summary rows
    (node, n_pixels) keyed by the region's min global pixel key;
    boundary rows (gx, gy, node) for masked perimeter pixels."""
    h, w = arr.shape
    with np.errstate(invalid="ignore"):
        mask = np.isfinite(arr) & (arr >= threshold)
    root, n_runs = _local_ccl(mask)
    if n_runs == 0:
        return None, None
    jj, ii = np.meshgrid(np.arange(w, dtype=np.int64),
                         np.arange(h, dtype=np.int64))
    key = (gy0 + ii) * _KEY_STRIDE + (gx0 + jj)
    m = root >= 0
    # min pixel key per root (node id), pixel count per root
    minkey = np.full(n_runs, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(minkey, root[m], key[m])
    counts = np.zeros(n_runs, dtype=np.int64)
    np.add.at(counts, root[m], 1)
    gxmin = np.full(n_runs, np.iinfo(np.int64).max, dtype=np.int64)
    gxmax = np.full(n_runs, np.iinfo(np.int64).min, dtype=np.int64)
    gymin = np.full(n_runs, np.iinfo(np.int64).max, dtype=np.int64)
    gymax = np.full(n_runs, np.iinfo(np.int64).min, dtype=np.int64)
    np.minimum.at(gxmin, root[m], gx0 + jj[m])
    np.maximum.at(gxmax, root[m], gx0 + jj[m])
    np.minimum.at(gymin, root[m], gy0 + ii[m])
    np.maximum.at(gymax, root[m], gy0 + ii[m])
    live = counts > 0
    summary = pd.DataFrame({"node": minkey[live], "n_pixels": counts[live],
                            "gx_min": gxmin[live], "gx_max": gxmax[live],
                            "gy_min": gymin[live], "gy_max": gymax[live]})
    edge = m & ((ii == 0) | (ii == h - 1) | (jj == 0) | (jj == w - 1))
    boundary = pd.DataFrame({
        "gx": (gx0 + jj[edge]), "gy": (gy0 + ii[edge]),
        "node": minkey[root[edge]]})
    return summary, boundary


def _scan(tiles: DataFrame, threshold: float) -> DataFrame:
    """One decode pass emitting the union of summary and boundary rows
    (row_type 's'/'b')."""
    src = tiles.select("image_id", "x_origin", "y_origin", "cell_width",
                       "cell_height", "w", "h", "fmt", "bytes")
    schema = ("image_id string, row_type string, gx long, gy long, node long, "
              "n_pixels long, gx_min long, gx_max long, gy_min long, gy_max long")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            arrs = codec.decode_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            for i, arr in enumerate(arrs):
                cw = float(pdf["cell_width"].iloc[i])
                ch = float(pdf["cell_height"].iloc[i])
                gx0 = round(float(pdf["x_origin"].iloc[i]) / cw)
                gy0 = round(float(pdf["y_origin"].iloc[i]) / ch)
                s, b = _tile_regions(arr, threshold, gx0, gy0)
                if s is None:
                    continue
                iid = pdf["image_id"].iloc[i]
                s = s.assign(image_id=iid, row_type="s", gx=-1, gy=-1)
                b = b.assign(image_id=iid, row_type="b", n_pixels=-1,
                             gx_min=-1, gx_max=-1, gy_min=-1, gy_max=-1)
                cols = ["image_id", "row_type", "gx", "gy", "node", "n_pixels",
                        "gx_min", "gx_max", "gy_min", "gy_max"]
                frames.append(s[cols])
                frames.append(b[cols])
            yield (pd.concat(frames, ignore_index=True) if frames else
                   pd.DataFrame({"image_id": pd.Series([], dtype=str),
                                 "row_type": pd.Series([], dtype=str),
                                 **{c: pd.Series([], dtype=np.int64)
                                    for c in ("gx", "gy", "node", "n_pixels",
                                              "gx_min", "gx_max", "gy_min", "gy_max")}}))

    return src.mapInPandas(run, schema=schema)


def _region_mapping(tiles: DataFrame, threshold: float):
    """Shared CCL machinery: one decode pass → (summaries with
    image_id, node→root mapping from the seam-graph label
    propagation)."""
    scan = _scan(tiles, threshold).localCheckpoint()  # one decode pass
    summaries = scan.filter("row_type = 's'").select(
        "image_id", "node", "n_pixels", "gx_min", "gx_max", "gy_min", "gy_max")
    boundary = scan.filter("row_type = 'b'").select("gx", "gy", "node")

    from rasters_spark.datapipe import dedup
    a, b = boundary.alias("a"), boundary.alias("b")
    pairs = (
        a.join(b, (F.col("a.gx") + 1 == F.col("b.gx"))
               & (F.col("a.gy") == F.col("b.gy")))
        .select(F.col("a.node").alias("doc_a"), F.col("b.node").alias("doc_b"))
        .union(
            a.join(b, (F.col("a.gx") == F.col("b.gx"))
                   & (F.col("a.gy") + 1 == F.col("b.gy")))
            .select(F.col("a.node").alias("doc_a"), F.col("b.node").alias("doc_b")))
        .filter("doc_a != doc_b"))
    mapping = dedup.dup_groups(None, pairs=pairs).withColumnRenamed(
        "doc_id", "node").withColumnRenamed("group_id", "root")
    return summaries, mapping


def sieve(tiles: DataFrame, threshold: float, min_pixels: int) -> DataFrame:
    """GDAL sieve analogue (drop variant): NULL OUT every masked pixel
    whose global connected region holds fewer than ``min_pixels``
    pixels — speckle removal before vectorization/training. Returns
    the tile set with ``bytes`` rewritten (fmt raw; unmasked pixels
    untouched).

    Scale shape: the polygonize machinery (one decode pass + skinny
    seam graph + label propagation) finds the small-region NODE list;
    the per-tile node lists fold into one bounded row each
    (collect_list of the tile's own small regions — bounded by
    regions-per-tile, a fixture/data property, not a hot-key) and join
    the payload 1:1; a second map-only pass recomputes the tile-local
    labels (deterministic — same run union-find) and NULLs members.
    Same layout requirement as ``polygonize``."""
    summaries, mapping = _region_mapping(tiles, threshold)
    labeled = (summaries.join(mapping, "node", "left")
               .withColumn("root", F.coalesce("root", "node")))
    totals = labeled.groupBy("root").agg(F.sum("n_pixels").alias("tot"))
    small = (labeled.join(totals.filter(F.col("tot") < min_pixels), "root")
             .groupBy("image_id")
             .agg(F.collect_list("node").alias("small_nodes")))
    t = tiles.join(small, "image_id", "left")
    src = t.select("image_id", "x_origin", "y_origin", "cell_width",
                   "cell_height", "crs", "w", "h", "fmt", "bytes", "small_nodes")
    schema = ", ".join(
        ["image_id string", "x_origin double", "y_origin double",
         "cell_width double", "cell_height double", "crs string",
         "w int", "h int", "fmt string", "bytes binary"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in ("image_id", "x_origin", "y_origin", "cell_width",
                                    "cell_height", "crs", "w", "h", "fmt", "bytes")}
            arrs = codec.decode_batch(pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])
            for i, arr in enumerate(arrs):
                arr = arr.astype(np.float64)
                small_nodes = pdf["small_nodes"].iloc[i]
                if small_nodes is not None and len(small_nodes):
                    cw = float(pdf["cell_width"].iloc[i])
                    ch = float(pdf["cell_height"].iloc[i])
                    gx0 = round(float(pdf["x_origin"].iloc[i]) / cw)
                    gy0 = round(float(pdf["y_origin"].iloc[i]) / ch)
                    h, w = arr.shape
                    with np.errstate(invalid="ignore"):
                        mask = np.isfinite(arr) & (arr >= threshold)
                    root, n_runs = _local_ccl(mask)
                    if n_runs:
                        jj, ii = np.meshgrid(np.arange(w, dtype=np.int64),
                                             np.arange(h, dtype=np.int64))
                        key = (gy0 + ii) * _KEY_STRIDE + (gx0 + jj)
                        minkey = np.full(n_runs, np.iinfo(np.int64).max,
                                         dtype=np.int64)
                        m = root >= 0
                        np.minimum.at(minkey, root[m], key[m])
                        kill = np.isin(minkey,
                                       np.asarray(list(small_nodes), dtype=np.int64))
                        drop = m & kill[np.where(m, root, 0)]
                        arr = np.where(drop, np.nan, arr)
                for c in ("image_id", "x_origin", "y_origin", "cell_width",
                          "cell_height", "crs", "w", "h"):
                    rows[c].append(pdf[c].iloc[i])
                rows["fmt"].append("raw")
                rows["bytes"].append(arr.astype(np.float32).tobytes())
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=schema)


def polygonize(tiles: DataFrame, threshold: float) -> DataFrame:
    """Global 4-adjacency regions of ``value >= threshold`` →
    ``(region_id, n_pixels, gx_min, gx_max, gy_min, gy_max)`` with
    ``region_id`` the component's min global pixel key and the bbox in
    global pixel coordinates. REQUIRES a single layout group (one lattice):
    filter to one (crs, cell sizes, w, h) — or loop layout groups —
    before calling; keys are lattice-local. Tiles must be
    lattice-aligned (origins = integer multiples of the cell size), as
    ``focal.lattice_remap`` produces."""
    summaries, mapping = _region_mapping(tiles, threshold)
    return (summaries.join(mapping, "node", "left")
            .select(F.coalesce("root", "node").alias("region_id"), "n_pixels",
                    "gx_min", "gx_max", "gy_min", "gy_max")
            .groupBy("region_id").agg(
                F.sum("n_pixels").alias("n_pixels"),
                F.min("gx_min").alias("gx_min"), F.max("gx_max").alias("gx_max"),
                F.min("gy_min").alias("gy_min"), F.max("gy_max").alias("gy_max")))
