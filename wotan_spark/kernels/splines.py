"""Spline detrenders: rspline (iteratively clipped LSQ spline), hspline
(Huber-robust B-spline regression), pspline (penalized spline with GCV).

Reference semantics: wotan/iter_spline.py, wotan/huber_spline.py,
wotan/pspline.py.  The scipy/sklearn/pygam internals are re-derived in pure
NumPy; structural quirks of the reference are kept:

* rspline's clip loop always runs all SPLINE_MAXITER rounds (its convergence
  break tests the index array of the previous round, which is never empty —
  see SURVEY.md Q5 discussion) and keeps only points with
  ``1 - flat < 2*std`` i.e. clips *downward* outliers only;
* pspline's outer loop runs exactly ``stdev_cut`` (default 2) rounds, refits
  on the surviving points, then fits once more and predicts over the full
  unclipped time axis; ``edge_cutoff`` NaNs the edges; returns
  ``ceil(edof)`` as the chosen spline count;
* hspline: ``int(span/knot_distance)`` evenly spaced knots (< 4 knots ->
  all-NaN), cubic B-spline features, Huber-loss linear fit.
"""

from __future__ import annotations

import numpy as np

from wotan_spark.constants import (SPLINE_MAXITER, SPLINE_STDEV_CUT, Z75)
from wotan_spark.kernels import bspline
from wotan_spark.kernels.series import clean_pair_fast


def rspline(time: np.ndarray, flux: np.ndarray, mask: np.ndarray,
            window_length: float) -> np.ndarray:
    masked_flux = flux[mask == 1]
    masked_time = time[mask == 1]
    no_knots = int((np.max(time) - np.min(time)) / window_length)
    newtime, newflux = clean_pair_fast(masked_time.copy(), masked_flux.copy())
    detrended = masked_flux.copy()
    spl = None
    for _ in range(SPLINE_MAXITER):
        keep = np.where(1.0 - detrended < SPLINE_STDEV_CUT * np.nanstd(detrended))[0]
        newtime, newflux = clean_pair_fast(newtime[keep], newflux[keep])
        if len(newtime) < 5:
            return np.full(len(time), np.nan)
        knots = np.linspace(np.min(newtime), np.max(newtime), no_knots)[1:-1]
        try:
            spl = bspline.LsqSpline(newtime, newflux, knots)
        except Exception:
            return np.full(len(time), np.nan)
        detrended = newflux / spl(newtime)
        # the reference's break condition never fires (Q5) — loop all rounds
    return spl(time)


def _huber_fit(B: np.ndarray, y: np.ndarray, epsilon: float = 1.35,
               alpha: float = 1e-4, maxiter: int = 100,
               tol: float = 1e-6) -> np.ndarray:
    """Huber-loss ridge-regularized linear fit via IRLS with MAD scale.

    Stand-in for sklearn's HuberRegressor (same epsilon/alpha defaults);
    robust-fit agreement is at the reference's decimal=1..2 golden tolerance,
    not bitwise.
    """
    n, p = B.shape
    coef, *_ = np.linalg.lstsq(B, y, rcond=None)
    eye = np.eye(p)
    for _ in range(maxiter):
        resid = y - B @ coef
        scale = np.median(np.abs(resid)) / Z75
        if scale <= 0:
            return coef
        z = np.abs(resid) / scale
        w = np.where(z <= epsilon, 1.0, epsilon / np.maximum(z, 1e-300))
        BW = B * w[:, None]
        new_coef = np.linalg.solve(B.T @ BW + alpha * eye, BW.T @ y)
        if np.max(np.abs(new_coef - coef)) <= tol * max(1.0, np.max(np.abs(new_coef))):
            return new_coef
        coef = new_coef
    return coef


def hspline(time: np.ndarray, flux: np.ndarray, mask: np.ndarray,
            knot_distance: float) -> np.ndarray:
    masked_flux = flux[mask == 1]
    masked_time = time[mask == 1]
    if len(masked_time) == 0:
        return np.full(len(time), np.nan)
    duration = np.max(masked_time) - np.min(masked_time)
    no_knots = int(duration / knot_distance)
    knots = np.linspace(np.min(masked_time), np.max(masked_time), no_knots)
    if len(knots) < 4:
        return np.full(len(time), np.nan)
    # cubic basis over the knot grid (interior = knots[2:-2], FITPACK-style
    # interpolating knot choice used by the reference's splrep basis)
    T = bspline.clamped_knots(knots[2:-2], knots[0], knots[-1])
    B = bspline.design(masked_time, T)
    B1 = np.column_stack([np.ones(len(masked_time)), B])  # intercept
    coef = _huber_fit(B1, masked_flux)
    Bf = np.column_stack([np.ones(len(time)), bspline.design(time, T)])
    return Bf @ coef


def _pspline_fit(x: np.ndarray, y: np.ndarray, n_splines: int,
                 lams: np.ndarray | None = None):
    """Penalized cubic spline with 2nd-order difference penalty, lambda chosen
    by GCV over a log grid (the pygam LinearGAM(s(0)).gridsearch recipe)."""
    if lams is None:
        lams = np.logspace(-3, 3, 11)
    lo, hi = float(np.min(x)), float(np.max(x))
    B, T = bspline.uniform_basis(x, lo, hi, n_splines)
    n, p = B.shape
    D = np.diff(np.eye(p), n=2, axis=0)
    P = D.T @ D
    BtB = B.T @ B
    Bty = B.T @ y
    best = None
    for lam in lams:
        A = BtB + lam * P
        try:
            coef = np.linalg.solve(A, Bty)
            Ainv_BtB = np.linalg.solve(A, BtB)
        except np.linalg.LinAlgError:
            continue
        edof = np.trace(Ainv_BtB)
        resid = y - B @ coef
        rss = float(resid @ resid)
        denom = (n - edof)
        gcv = n * rss / (denom * denom) if denom > 0 else np.inf
        if best is None or gcv < best[0]:
            best = (gcv, coef, edof, lam)
    if best is None:
        raise np.linalg.LinAlgError("pspline fit failed for all lambdas")
    _, coef, edof, _ = best
    return T, coef, edof


def pspline(time: np.ndarray, flux: np.ndarray, edge_cutoff: float,
            max_splines: int = 50, stdev_cut: int = SPLINE_STDEV_CUT,
            ) -> tuple[np.ndarray, float]:
    newflux = flux.copy()
    newtime = time.copy()
    detrended = flux.copy() / np.nanmedian(newflux)
    stdev = np.std(detrended)
    for _ in range(stdev_cut):
        keep = np.where(np.abs(1.0 - detrended) < stdev_cut * np.std(detrended))[0]
        if len(keep) != 0:
            newtime, newflux = clean_pair_fast(newtime[keep], newflux[keep])
        T, coef, edof = _pspline_fit(newtime, newflux, max_splines)
        detrended = newflux / (bspline.design(newtime, T) @ coef)
        stdev = np.std(detrended)
    keep = np.where(np.abs(1.0 - detrended) < stdev_cut * stdev)[0]
    if len(keep) != 0:
        newtime, newflux = clean_pair_fast(newtime[keep], newflux[keep])
    T, coef, edof = _pspline_fit(newtime, newflux, max_splines)
    trend = bspline.design(time, T) @ coef
    if edge_cutoff > 0:
        low_index = np.argmax(time > (np.min(time) + edge_cutoff))
        hi_index = np.argmax(time > (np.max(time) - edge_cutoff))
        trend[:low_index] = np.nan
        trend[hi_index:] = np.nan
    return trend, float(np.ceil(edof))
