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
