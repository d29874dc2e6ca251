"""Focal statistics with cross-tile halo exchange (operators/focal.py).

Ground truth: assemble the synthetic lattice into ONE global numpy
array, NaN-pad it, take brute-force windows, and crop per tile — if
halo exchange is correct, the distributed per-tile answer equals the
global-array answer at every cell (including tile-edge cells, which is
where a missing/misplaced strip would show).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from rasters_spark import codec
from rasters_spark.operators import focal

W, H = 4, 4
CW, CH = 0.25, -0.25   # binary fractions: lattice origins are exact
NX, NY = 3, 2          # 3 tiles across, 2 down


def _values(tx, ty):
    """Deterministic quarter-integer tile with a couple of NaN holes."""
    r, c = np.mgrid[0:H, 0:W]
    v = (((tx * 31 + ty * 17 + r * 13 + c * 7) % 40) * 0.25).astype(np.float64)
    if (tx + ty) % 2 == 0:
        v[(tx + r[0, 0]) % H, (ty + 1) % W] = np.nan
        v[ty % H, tx % W] = np.nan
    return v


def _lattice_rows():
    rows = []
    for ty in range(NY):
        for tx in range(NX):
            arr = _values(tx, ty)
            rows.append((f"t{ty}{tx}", codec.encode_tile(arr.astype(np.float32), "raw"),
                         W, H, "raw", "EPSG:4326",
                         tx * W * CW, ty * H * CH, CW, CH))
    return rows


COLS = ["image_id", "bytes", "w", "h", "fmt", "crs",
        "x_origin", "y_origin", "cell_width", "cell_height"]


@pytest.fixture(scope="module")
def lattice(spark):
    return spark.createDataFrame(_lattice_rows(), COLS).cache()


def _global_array():
    g = np.full((NY * H, NX * W), np.nan)
    for ty in range(NY):
        for tx in range(NX):
            g[ty * H:(ty + 1) * H, tx * W:(tx + 1) * W] = \
                codec.decode_tile(codec.encode_tile(_values(tx, ty).astype(np.float32), "raw"), W, H, "raw")
    return g


def _brute(g, radius, stat):
    gh, gw = g.shape
    pad = np.full((gh + 2 * radius, gw + 2 * radius), np.nan)
    pad[radius:radius + gh, radius:radius + gw] = g
    out = np.full((gh, gw), np.nan)
    cnt = np.zeros((gh, gw), dtype=np.int64)
    for i in range(gh):
        for j in range(gw):
            win = pad[i:i + 2 * radius + 1, j:j + 2 * radius + 1]
            vals = win[np.isfinite(win)]
            cnt[i, j] = len(vals)
            if len(vals):
                out[i, j] = {"sum": vals.sum(), "mean": vals.mean(),
                             "min": vals.min(), "max": vals.max(),
                             "count": float(len(vals))}[stat]
            elif stat == "count":
                out[i, j] = 0.0
    return out, cnt


def _collect_tiles(df):
    got = {}
    for row in df.collect():
        got[row["image_id"]] = codec.decode_tile(row["bytes"], row["w"], row["h"], "raw")
    return got


@pytest.mark.parametrize("stat", ["sum", "mean", "min", "max", "count"])
def test_focal_tiles_match_global_brute(spark, lattice, stat):
    g = _global_array()
    want, _ = _brute(g, 1, stat)
    got = _collect_tiles(focal.focal_tiles(lattice, radius=1, stat=stat))
    for ty in range(NY):
        for tx in range(NX):
            crop = want[ty * H:(ty + 1) * H, tx * W:(tx + 1) * W]
            np.testing.assert_allclose(
                got[f"t{ty}{tx}"], crop.astype(np.float32),
                rtol=0, atol=1e-6, equal_nan=True,
                err_msg=f"tile t{ty}{tx} stat={stat}")


def test_focal_radius2_crosses_corners(spark, lattice):
    g = _global_array()
    want, _ = _brute(g, 2, "sum")
    got = _collect_tiles(focal.focal_tiles(lattice, radius=2, stat="sum"))
    for ty in range(NY):
        for tx in range(NX):
            crop = want[ty * H:(ty + 1) * H, tx * W:(tx + 1) * W]
            np.testing.assert_allclose(got[f"t{ty}{tx}"], crop.astype(np.float32),
                                       rtol=0, atol=1e-6, equal_nan=True)


def test_halo_actually_crosses_tiles(spark, lattice):
    """Re-origin the tiles far apart: edge sums MUST change (the
    adjacent run saw neighbor pixels, the isolated run NaN halo)."""
    from pyspark.sql import functions as F
    isolated = lattice.withColumn(
        "x_origin", F.col("x_origin") * 1000.0).withColumn(
        "y_origin", F.col("y_origin") * 1000.0)
    adj = _collect_tiles(focal.focal_tiles(lattice, 1, "sum"))
    iso = _collect_tiles(focal.focal_tiles(isolated, 1, "sum"))
    # interior cells identical, edge columns between t00 and t01 differ
    a, b = adj["t00"], iso["t00"]
    assert np.allclose(a[1:-1, 1:-1], b[1:-1, 1:-1], equal_nan=True)
    assert not np.allclose(a[:, -1], b[:, -1], equal_nan=True)


def test_layout_mismatch_is_isolated(spark):
    """An abutting tile with a DIFFERENT cell size must not leak into
    the window (separate lattice)."""
    rows = [("a", codec.encode_tile(np.full((H, W), 1.0, np.float32), "raw"),
             W, H, "raw", "EPSG:4326", 0.0, 0.0, CW, CH),
            ("b", codec.encode_tile(np.full((H, W), 100.0, np.float32), "raw"),
             W, H, "raw", "EPSG:4326", W * CW, 0.0, CW / 2, CH)]
    df = spark.createDataFrame(rows, COLS)
    got = _collect_tiles(focal.focal_tiles(df, 1, "max"))
    assert got["a"].max() == 1.0  # no 100s leaked across the layout seam


def test_radius_larger_than_tile_raises(spark, lattice):
    with pytest.raises(Exception, match="radius"):
        focal.focal_tiles(lattice, radius=5, stat="sum").collect()


def test_focal_stats_matches_brute_and_duckdb(spark, lattice):
    g = _global_array()
    s, cnt = _brute(g, 1, "sum")
    want = {}
    for ty in range(NY):
        for tx in range(NX):
            cs = s[ty * H:(ty + 1) * H, tx * W:(tx + 1) * W]
            cc = cnt[ty * H:(ty + 1) * H, tx * W:(tx + 1) * W]
            want[f"t{ty}{tx}"] = (int((cc > 0).sum()),
                                  float(np.where(cc > 0, cs, 0.0).sum()))
    got = {r["image_id"]: (r["focal_cells"], r["focal_sum"])
           for r in focal.focal_stats(lattice, 1).collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-9), k

    # relational twin (the contract-oracle shape): exact equality —
    # quarter-integer pixels make every summation order exact
    px = []
    for ty in range(NY):
        for tx in range(NX):
            arr = codec.decode_tile(
                codec.encode_tile(_values(tx, ty).astype(np.float32), "raw"), W, H, "raw")
            for r in range(H):
                for c in range(W):
                    v = arr[r, c]
                    px.append((f"t{ty}{tx}", tx * W + c, ty * H + r,
                               None if np.isnan(v) else float(v)))
    con = duckdb.connect()
    con.register("px", pd.DataFrame(px, columns=["image_id", "gx", "gy", "value"]))
    oracle = con.sql("""
        with offs(dx, dy) as (values (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                     (0,1),(1,-1),(1,0),(1,1)),
        nb as (select c.image_id, c.gx, c.gy, n.value
               from px c join offs o on true
               join px n on n.gx = c.gx + o.dx and n.gy = c.gy + o.dy
               where n.value is not null),
        cellagg as (select image_id, gx, gy, sum(value) s
                    from nb group by 1, 2, 3)
        select image_id, count(*) focal_cells, sum(s) focal_sum
        from cellagg group by 1
    """).df().set_index("image_id")
    for k in want:
        assert int(oracle.loc[k, "focal_cells"]) == got[k][0]
        assert float(oracle.loc[k, "focal_sum"]) == got[k][1], k


def test_lattice_remap_abuts_and_is_sql_replicable(spark, lattice):
    from pyspark.sql import functions as F
    remapped = focal.lattice_remap(lattice, per_row=2)
    rows = {r["image_id"]: (r["x_origin"], r["y_origin"])
            for r in remapped.collect()}
    # row_number over image_id order: t00,t01,t02,t10,t11,t12 → per_row=2
    assert rows["t00"] == (0.0, 0.0)
    assert rows["t01"] == (W * CW, 0.0)
    assert rows["t02"] == (0.0, H * CH)
    assert rows["t10"] == (W * CW, H * CH)
    # every origin is an exact lattice multiple → strips join exactly
    out = focal.focal_stats(remapped, 1)
    assert out.count() == NX * NY


def test_focal_rank_stats_match_global_brute(spark, lattice):
    """Median/majority per cell vs a per-cell Python brute force over the
    assembled global array — including tile-edge cells (halo path) and
    the tie-break rule (max count, then SMALLEST value)."""
    g = _global_array()
    out = focal.focal_rank_stats(lattice, 1).collect()
    got = {(r.image_id, r.prow, r.pcol): (r.med, r.maj, r.n) for r in out}
    gh, gw = g.shape
    pad = np.full((gh + 2, gw + 2), np.nan)
    pad[1:-1, 1:-1] = g
    n_checked = 0
    for gi in range(gh):
        for gj in range(gw):
            win = pad[gi:gi + 3, gj:gj + 3]
            vals = sorted(win[np.isfinite(win)].tolist())
            iid = f"t{gi // H}{gj // W}"
            key = (iid, gi % H, gj % W)
            if not vals:
                assert key not in got
                continue
            m = len(vals)
            med = vals[m // 2] if m % 2 else (vals[m // 2 - 1] + vals[m // 2]) / 2.0
            from collections import Counter
            cnt = Counter(vals)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            assert got[key] == (med, best, m)
            n_checked += 1
    assert n_checked == len(got)


def test_focal_majority_tie_breaks_to_smallest_value(spark):
    # a single 3x3 tile whose center window holds {1.0 x4, 2.0 x4, 3.0}:
    # counts tie at 4 -> majority must be the SMALLER value 1.0
    arr = np.array([[1.0, 2.0, 1.0],
                    [2.0, 3.0, 2.0],
                    [1.0, 2.0, 1.0]], dtype=np.float32)
    df = spark.createDataFrame(
        [("t", codec.encode_tile(arr, "raw"), 3, 3, "raw", "EPSG:4326",
          0.0, 0.0, CW, CH)], COLS)
    out = {(r.prow, r.pcol): r.maj for r in focal.focal_rank_stats(df, 1).collect()}
    assert out[(1, 1)] == 1.0


def test_proximity_matches_global_brute(spark, lattice):
    """Radius-2 proximity vs per-cell brute force over the global array
    (threshold chosen mid-range so both targets and far cells exist)."""
    import math
    g = _global_array()
    thr = 5.0
    got = {(r.image_id, r.prow, r.pcol): (r.prox, r.n_t)
           for r in focal.proximity_stats(lattice, thr, 2).collect()}
    gh, gw = g.shape
    n_checked = 0
    for gi in range(gh):
        for gj in range(gw):
            if not np.isfinite(g[gi, gj]):
                continue
            best, n_t = None, 0
            for dy in range(-2, 3):
                for dx in range(-2, 3):
                    ni, nj = gi + dy, gj + dx
                    if 0 <= ni < gh and 0 <= nj < gw and np.isfinite(g[ni, nj]) \
                            and g[ni, nj] >= thr:
                        n_t += 1
                        d = math.sqrt(float(dx * dx + dy * dy))
                        if best is None or d < best:
                            best = d
            key = (f"t{gi // H}{gj // W}", gi % H, gj % W)
            exp_prox, exp_n = got[key]
            assert exp_n == n_t, key
            if best is None:
                assert exp_prox is None or np.isnan(exp_prox), key
            else:
                assert exp_prox == best, key
            n_checked += 1
    assert n_checked == len(got)


def test_morph_open_two_pass_composition(spark, lattice):
    """Opening = dilation of the erosion — verify the two chained halo
    passes against a global-array brute force (NaN-ignoring at both
    levels), including tile-seam cells."""
    g = _global_array()
    eroded, _ = _brute(g, 1, "min")
    opened, _ = _brute(eroded, 1, "max")
    out = focal.focal_tiles(focal.focal_tiles(lattice, 1, "min"), 1, "max")
    got = {}
    for row in out.collect():
        arr = codec.decode_tile(row["bytes"], row["w"], row["h"], "raw")
        got[row["image_id"]] = arr
    for ty in range(NY):
        for tx in range(NX):
            crop = opened[ty * H:(ty + 1) * H, tx * W:(tx + 1) * W]
            np.testing.assert_allclose(
                got[f"t{ty}{tx}"], crop.astype(np.float32),
                rtol=0, atol=0, equal_nan=True, err_msg=f"tile t{ty}{tx}")
