"""Marching-squares contours (operators/contour.py).

Brute ground truth walks every 2×2 block of the assembled global
array with the same rules (>= threshold, first/last edge pairing,
center-mean saddles) — multiset equality over segments proves the
distributed kernel, the halo seams, and the single-ownership rule.
"""

from collections import Counter

import numpy as np
import pytest

from rasters_spark import codec
from rasters_spark.operators import contour

from tests.test_focal import (  # noqa: F401
    COLS, CW, CH, H, NX, NY, W, _global_array, lattice,
)

LEVELS = [3.125, 6.25]


def _brute_segments(g, level):
    gh, gw = g.shape
    segs = []
    for i in range(gh - 1):
        for j in range(gw - 1):
            za, zb = g[i, j], g[i, j + 1]
            zc, zd = g[i + 1, j], g[i + 1, j + 1]
            if not all(np.isfinite(v) for v in (za, zb, zc, zd)):
                continue
            xa, xb = (j + 0.5) * CW, (j + 1.5) * CW
            ya, yc = (i + 0.5) * CH, (i + 1.5) * CH
            ia, ib, ic, idd = za >= level, zb >= level, zc >= level, zd >= level
            cross = {}
            if ia != ib:
                t = (level - za) / (zb - za)
                cross["top"] = (xa + t * (xb - xa), ya)
            if ic != idd:
                t = (level - zc) / (zd - zc)
                cross["bottom"] = (xa + t * (xb - xa), yc)
            if ia != ic:
                t = (level - za) / (zc - za)
                cross["left"] = (xa, ya + t * (yc - ya))
            if ib != idd:
                t = (level - zb) / (zd - zb)
                cross["right"] = (xb, ya + t * (yc - ya))

            def seg(e1, e2):
                p1, p2 = cross[e1], cross[e2]
                return (p1 + p2) if p1 <= p2 else (p2 + p1)

            if len(cross) == 2:
                e1, e2 = [e for e in contour._EDGES if e in cross]
                segs.append(seg(e1, e2))
            elif len(cross) == 4:
                center_in = (za + zb + zc + zd) / 4.0 >= level
                if (ia and idd and center_in) or (ib and ic and not center_in):
                    segs.append(seg("top", "right"))
                    segs.append(seg("left", "bottom"))
                else:
                    segs.append(seg("top", "left"))
                    segs.append(seg("right", "bottom"))
    return segs


def test_contours_match_global_brute(spark, lattice):
    got = Counter()
    for r in contour.contour_segments(lattice, LEVELS).collect():
        got[(r["level"], r["x1"], r["y1"], r["x2"], r["y2"])] += 1
    want = Counter()
    for lv in LEVELS:
        for s in _brute_segments(_global_array(), lv):
            want[(lv,) + s] += 1
    assert got == want
    assert sum(want.values()) > 50  # the fixture actually produces contours


def test_contours_cross_tile_seams(spark, lattice):
    """At least one segment must touch a tile seam (x = k·W·CW interior
    line) — the halo path is load-bearing for the lattice fixture."""
    rows = contour.contour_segments(lattice, [LEVELS[0]]).collect()
    # block rows/cols that straddle a seam use halo pixels; find
    # segments whose endpoints lie in different tiles
    def tile_of(x, y):
        return (int(np.floor(x / (W * CW))), int(np.floor(y / (H * CH))))
    crossers = [r for r in rows
                if tile_of(r["x1"], r["y1"]) != tile_of(r["x2"], r["y2"])]
    assert crossers, "no seam-crossing segments — halo not exercised"


def test_contour_closed_loop_on_bump(spark):
    """A radial bump inside one tile yields a closed loop: every
    endpoint appears in exactly two segments."""
    r, c = np.mgrid[0:8, 0:8]
    arr = 10.0 - ((r - 3.5) ** 2 + (c - 3.5) ** 2) * 0.25
    rows = [("bump", codec.encode_tile(arr.astype(np.float32), "raw"),
             8, 8, "raw", "EPSG:4326", 0.0, 0.0, 1.0, -1.0)]
    df = spark.createDataFrame(rows, COLS)
    segs = contour.contour_segments(df, [8.0]).collect()
    assert segs
    ends = Counter()
    for s in segs:
        ends[(s["x1"], s["y1"])] += 1
        ends[(s["x2"], s["y2"])] += 1
    assert all(n == 2 for n in ends.values()), ends


def test_contour_out_of_range_levels(spark, lattice):
    assert contour.contour_segments(lattice, [1e9]).count() == 0
    assert contour.contour_segments(lattice, [-1e9]).count() == 0
