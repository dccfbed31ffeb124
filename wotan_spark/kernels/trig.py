"""Trigonometric trend fits: CoFiAM and (robust) cosine filtering.

Reference: wotan/cofiam.py.  Design matrix columns are
``[1, t, sin(2*pi*t*k/dur), cos(2*pi*t*k/dur) ...]`` for k=1..degree with
``dur = 2 * (max(t)-min(t))`` and ``degree = int(span / window_length)``.

Reference quirks kept:

* Q8 — ``detrend_cofiam``'s Durbin-Watson loop regenerates the *full-degree*
  matrix every iteration, so every candidate fit is identical and the loop is
  behaviorally a single full-degree least-squares fit.  We compute that fit
  directly.
* ``detrend_cosine`` weights masked rows by multiplying the design matrix and
  target by the mask (1e-10 for clipped outliers), clips *downward* 2-sigma
  outliers of ``y/trend`` each round, and stops when the outlier count
  repeats (or immediately when ``robust=False``).
"""

from __future__ import annotations

import numpy as np

from wotan_spark.constants import SPLINE_MAXITER, SPLINE_STDEV_CUT


def design_matrix(t: np.ndarray, degree: int) -> np.ndarray:
    dur = 2.0 * (np.max(t) - np.min(t))
    k = np.arange(1, degree + 1, dtype=np.float64)
    # evaluation order (2*pi*t*k)/dur matters: the matrix is near-singular,
    # so bitwise-equal construction keeps lstsq fits aligned with the oracle
    phase = (2.0 * np.pi * t[:, None] * k[None, :]) / dur
    cols = [np.ones_like(t), t]
    for j in range(degree):
        cols.append(np.sin(phase[:, j]))
        cols.append(np.cos(phase[:, j]))
    return np.column_stack(cols)


def _lstsq_trend(M: np.ndarray, y: np.ndarray) -> np.ndarray:
    coef, *_ = np.linalg.lstsq(M, y, rcond=-1)
    return M @ coef


def detrend_cofiam(t: np.ndarray, y: np.ndarray, window_length: float) -> np.ndarray:
    degree = int((np.max(t) - np.min(t)) / window_length)
    M = design_matrix(t, degree)
    return _lstsq_trend(M, y)


def detrend_cosine(t: np.ndarray, y: np.ndarray, window_length: float,
                   robust: bool, mask: np.ndarray) -> np.ndarray:
    degree = int((np.max(t) - np.min(t)) / window_length)
    mask = mask.copy()
    converged = not robust
    no_clip_previous = np.inf
    trend = np.full(len(t), np.nan)
    for _ in range(SPLINE_MAXITER):
        M = design_matrix(t, degree)
        Aw = M * mask[:, None]
        Bw = y * mask
        coef, *_ = np.linalg.lstsq(Aw, Bw, rcond=None)
        trend = M @ coef
        detrended = y / trend
        outliers = np.where(1.0 - detrended > SPLINE_STDEV_CUT * np.std(detrended))[0]
        mask[outliers] = 1e-10
        if no_clip_previous == len(outliers):
            converged = True
        no_clip_previous = len(outliers)
        if converged:
            break
    return trend
