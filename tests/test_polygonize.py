"""Distributed connected-component polygonize (operators/polygonize.py).

Brute ground truth: BFS over the assembled global mask — region
multisets {(min pixel key, n_pixels)} must match exactly, which proves
the local run union-find, the seam joins, and the label propagation
together.
"""

from collections import deque

import numpy as np

from rasters_spark.operators import polygonize

from tests.test_focal import (  # noqa: F401
    CW, CH, H, NX, NY, W, _global_array, lattice,
)

KEY = 1 << 32


def _brute_regions(g, threshold):
    mask = np.isfinite(g) & (g >= threshold)
    gh, gw = g.shape
    seen = np.zeros_like(mask, dtype=bool)
    out = {}
    for i in range(gh):
        for j in range(gw):
            if not mask[i, j] or seen[i, j]:
                continue
            q = deque([(i, j)])
            seen[i, j] = True
            cells = []
            while q:
                y, x = q.popleft()
                cells.append((y, x))
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < gh and 0 <= nx < gw and mask[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True
                        q.append((ny, nx))
            rid = min(y * KEY + x for y, x in cells)
            out[rid] = (len(cells),
                        min(x for _, x in cells), max(x for _, x in cells),
                        min(y for y, _ in cells), max(y for y, _ in cells))
    return out


def test_polygonize_matches_global_bfs(spark, lattice):
    threshold = 5.0
    got = {r.region_id: (r.n_pixels, r.gx_min, r.gx_max, r.gy_min, r.gy_max)
           for r in polygonize.polygonize(lattice, threshold).collect()}
    want = _brute_regions(_global_array(), threshold)
    assert got == want
    assert len(want) >= 5


def test_polygonize_merges_across_seams(spark, lattice):
    """With a threshold low enough that almost everything is masked,
    the lattice collapses to few huge cross-tile regions — far fewer
    than per-tile counts would give, proving seam merging."""
    got = polygonize.polygonize(lattice, 0.5).collect()
    want = _brute_regions(_global_array(), 0.5)
    assert {r.region_id: (r.n_pixels, r.gx_min, r.gx_max, r.gy_min, r.gy_max)
            for r in got} == want
    # at least one region spans multiple tiles
    assert any(n > W * H for n, *_ in want.values())


def test_polygonize_empty_mask(spark, lattice):
    assert polygonize.polygonize(lattice, 1e9).count() == 0


def test_sieve_drops_small_regions_only(spark, lattice):
    """Sieve vs brute: masked pixels in regions < min_pixels become
    NaN, everything else (including unmasked pixels) is untouched."""
    from rasters_spark import codec

    threshold, min_px = 5.0, 9   # the lattice's smallest region is 8 px
    regions = _brute_regions(_global_array(), threshold)
    g = _global_array()
    # brute: the set of global pixels to kill
    mask = np.isfinite(g) & (g >= threshold)
    kill = set()
    for rid, (n, *_bbox) in regions.items():
        if n < min_px:
            kill.add(rid)
    # recompute membership by BFS again (reuse _brute_regions' walk)
    from collections import deque
    gh, gw = g.shape
    seen = np.zeros_like(mask, dtype=bool)
    killpix = set()
    for i in range(gh):
        for j in range(gw):
            if not mask[i, j] or seen[i, j]:
                continue
            q = deque([(i, j)]); seen[i, j] = True; cells = []
            while q:
                y, x = q.popleft(); cells.append((y, x))
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < gh and 0 <= nx < gw and mask[ny, nx] and not seen[ny, nx]:
                        seen[ny, nx] = True; q.append((ny, nx))
            rid = min(y * KEY + x for y, x in cells)
            if rid in kill:
                killpix.update(cells)
    assert killpix, "fixture produced no small regions — tune min_px"

    out = polygonize.sieve(lattice, threshold, min_px)
    got = {}
    for r in out.collect():
        got[r["image_id"]] = codec.decode_tile(r["bytes"], r["w"], r["h"], "raw")
    for ty in range(2):
        for tx in range(3):
            tile = got[f"t{ty}{tx}"]
            for i in range(tile.shape[0]):
                for j in range(tile.shape[1]):
                    gy, gx = ty * 4 + i, tx * 4 + j
                    want = np.nan if (gy, gx) in killpix else g[gy, gx]
                    if np.isnan(want):
                        assert np.isnan(tile[i, j]), (gy, gx)
                    else:
                        assert tile[i, j] == np.float32(want), (gy, gx)
