#!/usr/bin/env python
"""Single-node kernel throughput at the reference's standard test load.

The reference exercises every method on a 20,076-point light curve
(wotan/tests.py:71); this measures our pure-NumPy kernels on the same-size
seeded synthetic series (wotan/tests.py:26-38 recipe) so the per-method
points/sec can be compared against any single-node baseline.  Methods the
reference itself caps for complexity use the reference's caps (hodges
1,000; gp/cofiam 2,000 — wotan/tests.py:107,155,181).

Prints ONE JSON line: {"n": ..., "methods": {name: {"sec": s, "pts_per_sec":
p, "n": n}}, "total_sec": ...}.  Single process, single thread (the engine's
per-core unit of work; cluster throughput = this x cores x executors).
"""

from __future__ import annotations

import json
import os
import sys
import time

for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from wotan_spark.kernels.detrend import detrend_series  # noqa: E402

N_FULL = 20076
CAPS = {"hodges": 1000, "gp_squared_exp": 2000, "gp_matern": 2000,
        "gp_periodic": 2000, "gp_periodic_auto": 2000, "cofiam": 2000,
        "cosine": 2000}

METHODS = [
    "mean", "median", "biweight", "andrewsinewave", "welsch", "hodges",
    "trim_mean", "winsorize", "hampelfilt", "huber_psi", "tau",
    "huber", "hampel", "ramsay",
    "savgol", "medfilt",
    "rspline", "hspline", "pspline",
    "ridge", "lasso", "elasticnet",
    "lowess", "supersmoother",
    "cofiam", "cosine",
    "gp_squared_exp", "gp_matern", "gp_periodic", "gp_periodic_auto",
]


def series(points: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 30, points)
    y = 1 + np.sin(t) / points + rng.normal(0, 1e-4, points)
    return t, y


def main() -> None:
    reps = int(os.environ.get("WOTAN_REFLOAD_REPS", "2"))
    out: dict[str, dict] = {}
    total = 0.0
    # *_masked lines exercise the ragged slider path (mask sentinel-drops
    # ~10% of points from every window, so window contents differ per
    # center) — per-window Python before round 3, kept-length regrouped
    # vectorization since
    for m in METHODS + ["biweight_masked", "hampel_masked"]:
        base = m.removesuffix("_masked")
        n = CAPS.get(base, N_FULL)
        t, y = series(n)
        kwargs: dict = {"window_length": 0.5}
        if m.startswith("gp_"):
            kwargs = {"method": "gp", "kernel": m[3:], "kernel_size": 0.5}
            if m == "gp_periodic":
                kwargs["kernel_period"] = 1.0
        elif m in ("savgol", "medfilt"):
            # cadence-count window for the filter methods (docs/Usage.rst)
            kwargs = {"method": m, "window_length": 31}
        else:
            kwargs["method"] = base
        if m.endswith("_masked"):
            mask = np.zeros(n, dtype=bool)
            mask[::10] = True                 # reference convention:
            kwargs["mask"] = mask             # True = exclude from fits
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            with np.errstate(all="ignore"):
                detrend_series(t.copy(), y.copy(), **kwargs)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[m] = {"sec": round(best, 4), "n": n,
                  "pts_per_sec": round(n / best)}
        total += best
    print(json.dumps({"n_full": N_FULL, "single_thread": True,
                      "methods": out, "total_sec": round(total, 2)}))


if __name__ == "__main__":
    main()
