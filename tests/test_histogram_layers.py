"""Exact histogram (stats.histogram) + cross-layer algebra
(rastermath.align_layers / layer_algebra)."""

import numpy as np
import pytest

from rasters_spark import codec
from rasters_spark.operators import rastermath, stats

from tests.test_focal import (  # noqa: F401
    COLS, CW, CH, H, NX, NY, W, _global_array, _values, lattice,
)


def test_histogram_matches_numpy(spark, lattice):
    got = {r.bin: r.n_pixels for r in stats.histogram(lattice, 0.0, 10.0, 20).collect()}
    g = _global_array()
    v = g[np.isfinite(g)]
    b = np.floor((v - 0.0) / 0.5).astype(int)
    b = b[(b >= 0) & (b < 20)]
    want = {int(k): int(n) for k, n in zip(*np.unique(b, return_counts=True))}
    assert got == want
    assert sum(got.values()) == int(np.isfinite(g).sum())


def test_histogram_drops_out_of_range(spark, lattice):
    got = stats.histogram(lattice, 2.0, 4.0, 4).collect()
    g = _global_array()
    v = g[np.isfinite(g)]
    inside = ((v >= 2.0) & (v < 4.0)).sum()
    assert sum(r.n_pixels for r in got) == int(inside)
    with pytest.raises(ValueError):
        stats.histogram(lattice, 4.0, 2.0, 4)


def _two_layers(spark):
    rows = []
    for name, seed in (("la", 0), ("lb", 1)):
        arr = _values(seed, 0)
        rows.append((f"{name}", codec.encode_tile(arr.astype(np.float32), "raw"),
                     W, H, "raw", "EPSG:4326", 0.0, 0.0, CW, CH))
    df = spark.createDataFrame(rows, COLS)
    return df.filter("image_id = 'la'"), df.filter("image_id = 'lb'")


def test_align_layers_and_ndiff(spark):
    a, b = _two_layers(spark)
    pairs = rastermath.align_layers(a, b)
    assert pairs.count() == 1
    out = {(r.prow, r.pcol): r.value
           for r in rastermath.layer_algebra(pairs, "ndiff").collect()}
    va = _values(0, 0)
    vb = _values(1, 0)
    both = np.isfinite(va) & np.isfinite(vb)
    assert len(out) == int(both.sum())
    for (i, j), v in out.items():
        s = va[i, j] + vb[i, j]
        if s == 0.0:
            assert np.isnan(v)
        else:
            assert v == (va[i, j] - vb[i, j]) / s


def test_layer_diff_and_ratio(spark):
    a, b = _two_layers(spark)
    pairs = rastermath.align_layers(a, b)
    va, vb = _values(0, 0), _values(1, 0)
    d = {(r.prow, r.pcol): r.value
         for r in rastermath.layer_algebra(pairs, "diff").collect()}
    for (i, j), v in d.items():
        assert v == va[i, j] - vb[i, j]
    r_ = {(r.prow, r.pcol): r.value
          for r in rastermath.layer_algebra(pairs, "ratio").collect()}
    for (i, j), v in r_.items():
        if vb[i, j] == 0.0:
            assert np.isnan(v)
        else:
            assert v == va[i, j] / vb[i, j]
    with pytest.raises(ValueError):
        rastermath.layer_algebra(pairs, "nope")


def test_retile_split_roundtrip(spark, lattice):
    """4 children per 4×4 tile at factor 2; reassembling the children
    reproduces the parent exactly, origins follow the closed form."""
    from rasters_spark.operators import retile

    kids = {r.image_id: r for r in retile.retile_split(lattice, 2).collect()}
    assert len(kids) == NX * NY * 4
    for ty in range(NY):
        for tx in range(NX):
            parent = _values(tx, ty).astype(np.float32)
            for ci in range(2):
                for cj in range(2):
                    k = kids[f"t{ty}{tx}_{ci}_{cj}"]
                    got = codec.decode_tile(k.bytes, k.w, k.h, k.fmt)
                    want = parent[ci * 2:(ci + 1) * 2, cj * 2:(cj + 1) * 2]
                    np.testing.assert_array_equal(
                        got, want.astype(np.float32))
                    assert k.x_origin == tx * W * CW + cj * (W / 2) * CW
                    assert k.y_origin == ty * H * CH + ci * (H / 2) * CH
                    assert (k.w, k.h) == (W // 2, H // 2)


def test_retile_split_indivisible_raises(spark, lattice):
    from rasters_spark.operators import retile

    with pytest.raises(Exception, match="not divisible"):
        retile.retile_split(lattice, 3).collect()
