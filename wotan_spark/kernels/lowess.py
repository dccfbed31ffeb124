"""LOWESS — locally weighted scatterplot smoothing with robustness weights.

Re-creates the reference's custom LOWESS (wotan/lowess.py:7-51): tricube
x-weights over a cadence window of ``int(W/span * n)`` points that advances
when ``x_i`` passes the window midpoint, a linear "projection vector" fit,
and bisquare robustness reweighting (scale = 6 * median |resid|), up to 30
iterations with ftol=1e-6.

Vectorization: window bounds come from one two-pointer sweep; the per-center
linear fits are evaluated as dense row-wise NumPy over groups of
equal-length windows (the reference runs a numba-jitted per-point loop).
Reference quirks kept: the tricube radius uses the window's second-to-last
point; weights are not clipped at zero outside the radius; a NaN anywhere in
the trend makes the convergence test False so iteration continues.
"""

from __future__ import annotations

import numpy as np


def _window_bounds(x: np.ndarray, width: int) -> tuple[np.ndarray, np.ndarray]:
    n = len(x)
    lefts = np.empty(n, dtype=np.int64)
    rights = np.empty(n, dtype=np.int64)
    left, right = 0, width
    for i in range(n):
        while right < n and x[i] > (x[left] + x[right]) / 2.0:
            left += 1
            right += 1
        lefts[i] = left
        rights[i] = right
    return lefts, rights


def _fit_rows(XW: np.ndarray, YW: np.ndarray, W: np.ndarray,
              xi: np.ndarray, bufT: np.ndarray,
              bufD: np.ndarray) -> np.ndarray:
    """Row-wise linear projection fit (reference calc_y_fit).

    Buffered: every elementwise step writes into a preallocated scratch
    matrix instead of a fresh temporary — the window matrices are ~50 MB at
    the reference load, so allocation + memory traffic dominates the flops.
    Bit-identical to the naive expression: elementwise multiplies are
    reordered only commutatively and every axis-1 reduction is the same
    pairwise ``np.sum`` over the same values."""
    np.multiply(W, XW, out=bufT)
    w1 = np.sum(bufT, axis=1)
    np.subtract(XW, w1[:, None], out=bufD)          # d
    np.multiply(bufD, bufD, out=bufT)
    np.multiply(bufT, W, out=bufT)                  # W * d**2
    w2 = np.sum(bufT, axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        np.multiply(bufD, (xi - w1)[:, None], out=bufT)
        np.divide(bufT, w2[:, None], out=bufT)
        np.add(bufT, 1.0, out=bufT)
        np.multiply(bufT, YW, out=bufT)
        np.multiply(bufT, W, out=bufT)
        out = np.sum(bufT, axis=1)
    out[w2 == 0.0] = np.nan
    return out


def lowess(x: np.ndarray, y: np.ndarray, mask: np.ndarray,
           window_length: float, maxiter: int = 30, ftol: float = 1e-6) -> np.ndarray:
    n = len(x)
    span = np.max(x) - np.min(x)
    if span == 0.0:
        return np.full(n, np.nan)
    width = int((window_length / span) * n)
    lefts, rights = _window_bounds(x, width)
    lengths = rights - lefts
    groups = [(L, np.where(lengths == L)[0]) for L in np.unique(lengths)]

    y_weights = np.zeros(n)
    y_fit_previous = np.ones(n)
    trend = np.full(n, np.nan)
    use_y_weights = False

    # the window gathers and the tricube distance weights depend only on x
    # (identical every robustness iteration) — hoist them out of the loop;
    # the cached values are bit-identical to recomputing, so the iteration
    # trace is unchanged (ref-exact tier)
    staged = []
    for L, idx in groups:
        if L <= 0:
            continue
        rows = lefts[idx][:, None] + np.arange(L)[None, :]
        XW = x[rows]
        YW = y[rows]
        xi = x[idx]
        # tricube distance weights; radius uses the window's
        # second-to-last point, as in the reference
        radius = np.maximum(xi - XW[:, 0], XW[:, -2] - xi) if L >= 2 \
            else np.maximum(xi - XW[:, 0], np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            Wd = (1.0 - (np.abs(XW - xi[:, None]) / radius[:, None]) ** 3) ** 3
        # three scratch matrices per length group, reused every iteration:
        # the working weight matrix, a general temp, and the centered-x
        # matrix — buffering removes ~10 full-size temporaries per pass
        bufW = np.empty_like(Wd)
        bufT = np.empty_like(Wd)
        bufD = np.empty_like(Wd)
        staged.append((idx, rows, XW, YW, xi, Wd, bufW, bufT, bufD))
    nan_idx = [idx for L, idx in groups if L <= 0]

    for _ in range(maxiter):
        trend = np.zeros(n)
        for idx in nan_idx:
            trend[idx] = np.nan
        for idx, rows, XW, YW, xi, Wd, bufW, bufT, bufD in staged:
            if use_y_weights:
                rw = y_weights[rows]
                has = np.any(rw != 0.0, axis=1)
                np.multiply(Wd, rw, out=bufW)
                no_rw = ~has
                if no_rw.any():
                    bufW[no_rw] = Wd[no_rw]
            else:
                np.copyto(bufW, Wd)
            # row-normalize in place; the NaN-as-zero sum is nansum's exact
            # semantics without its internal full-matrix copy
            np.copyto(bufT, bufW)
            bufT[np.isnan(bufT)] = 0.0
            with np.errstate(invalid="ignore", divide="ignore"):
                np.divide(bufW, np.sum(bufT, axis=1)[:, None], out=bufW)
            trend[idx] = _fit_rows(XW, YW, bufW, xi, bufT, bufD)

        diff = np.abs(y - trend)
        med = np.nanmedian(diff)
        diff = diff / (6.0 * med + 1e-100)
        diff[diff > 1.0] = 1.0
        y_weights = (1.0 - diff ** 2) ** 2
        y_weights[mask == 0] = 0.0
        use_y_weights = True
        if np.max(np.abs(y_fit_previous - trend)) < ftol:
            break
        y_fit_previous = trend
    return trend
