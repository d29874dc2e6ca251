"""Raw-multiprocessing host-contention probe (VERDICT r04 #8).

BENCH.md's run ledger showed the same engine measuring 0.72-1.03 on the
2->8 raw-multiprocessing baseline across hours on this shared VM — rule
runs taken in a contended window are unusable. This probe measures the
box's OWN 2->8-process scaling with a single-threaded numpy kernel (no
Spark, elementwise ufuncs only so BLAS threading cannot skew it):
efficiency = wall(2 procs)/wall(8 procs) with identical fixed work per
process — 1.0 on an idle machine, below ~0.9 when something else is
eating cores. bench_scaling refuses (or SKIP-annotates, with
SPARK_GRAFT_FORCE_SCALING=1) a rule run whenever the same-hour probe is
below PROBE_MIN.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time

PROBE_MIN = 0.95  # below this the window is contended: not rule-grade


def _work(seed: int) -> float:
    """~1 s of single-threaded elementwise numpy (ALU-dense, small
    footprint): immune to BLAS thread pools and memory-bandwidth noise,
    so the ratio isolates scheduler/frequency contention."""
    import numpy as np

    rs = np.random.RandomState(seed)
    x = rs.rand(200_000)
    s = 0.0
    for _ in range(220):
        s += float(np.sin(x).sum())
        x = (x * 1.000001) % 1.0
    return s


def _wall(nproc: int) -> float:
    ctx = mp.get_context("spawn")  # fresh interpreters: no inherited state
    with ctx.Pool(nproc) as pool:
        t0 = time.time()
        pool.map(_work, range(nproc))
        return time.time() - t0


def probe(p_small: int = 2, p_big: int = 8, repeats: int = 2) -> float:
    """2->8 raw-multiprocessing efficiency, best of ``repeats`` (the max
    is the right statistic: contention only ever LOWERS a repeat)."""
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    best = 0.0
    for _ in range(repeats):
        t_s = _wall(p_small)
        t_b = _wall(p_big)
        best = max(best, t_s / t_b)
    return round(best, 3)


if __name__ == "__main__":
    print(probe())
