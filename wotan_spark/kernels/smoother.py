"""Friedman's SuperSmoother (variable-span local linear smoother).

Re-creates the behavior the reference gets from the external
``supersmoother`` package (wotan/flatten.py:256-278): three primary local
linear smooths with spans ``(1*win, win, 3*win)``, leave-one-out
cross-validated absolute residuals smoothed at ``3*win`` (middle span),
per-point best-span selection with optional bass enhancement ``alpha``
(0 < alpha < 10), span smoothing, and a final smooth at ``2*win``
(constants wotan/constants.py:63-68).  Algorithm from the published
supsmu description (Friedman 1984); agreement with the reference package is
at the trend level, not bitwise.

``win`` is the window length divided by the **full input** time span
(quirk Q7) — the caller (detrend pipeline) computes it.
"""

from __future__ import annotations

import numpy as np

from wotan_spark.constants import (FINAL_SPAN, MIDDLE_SPAN,
                                   PRIMARY_SPAN_LOWER, PRIMARY_SPAN_UPPER)


def _linear_smooth(t: np.ndarray, y: np.ndarray, span: float,
                   cv: bool = False) -> np.ndarray:
    """Local linear fit over a moving window of k = span*n nearest points
    (by index, symmetric), evaluated at every t.  With ``cv`` the
    leave-one-out prediction is returned (computed from the hat diagonal).

    Moving sums make this O(n) per span.
    """
    n = len(t)
    k = int(np.clip(span * n, 3, n))
    half = k // 2
    # window [lo, hi) per point, clamped at the edges (constant width k)
    lo = np.clip(np.arange(n) - half, 0, max(n - k, 0))
    hi = np.minimum(lo + k, n)

    cs_1 = np.concatenate(([0.0], np.cumsum(np.ones(n))))
    cs_t = np.concatenate(([0.0], np.cumsum(t)))
    cs_y = np.concatenate(([0.0], np.cumsum(y)))
    cs_tt = np.concatenate(([0.0], np.cumsum(t * t)))
    cs_ty = np.concatenate(([0.0], np.cumsum(t * y)))

    m = cs_1[hi] - cs_1[lo]
    st = cs_t[hi] - cs_t[lo]
    sy = cs_y[hi] - cs_y[lo]
    stt = cs_tt[hi] - cs_tt[lo]
    sty = cs_ty[hi] - cs_ty[lo]

    tbar = st / m
    ybar = sy / m
    cov = sty - st * sy / m
    var = stt - st * st / m
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = np.where(var > 0, cov / var, 0.0)
    fit = ybar + slope * (t - tbar)
    if not cv:
        return fit
    # hat diagonal of the local linear smoother
    with np.errstate(invalid="ignore", divide="ignore"):
        h = 1.0 / m + np.where(var > 0, (t - tbar) ** 2 / var, 0.0)
    denom = np.clip(1.0 - h, 1e-10, None)
    return y + (fit - y) / denom  # loo prediction: y + (fit-y)/(1-h)


def supersmoother_trend(t: np.ndarray, y: np.ndarray, win: float,
                        alpha: float | None = None) -> np.ndarray:
    n = len(t)
    if n < 5:
        return np.full(n, np.nan)
    spans = np.array([PRIMARY_SPAN_LOWER * win, win, PRIMARY_SPAN_UPPER * win])
    spans = np.clip(spans, 3.0 / n, 1.0)
    middle = float(np.clip(MIDDLE_SPAN * win, 3.0 / n, 1.0))
    final = float(np.clip(FINAL_SPAN * win, 3.0 / n, 1.0))

    fits = np.stack([_linear_smooth(t, y, s) for s in spans])
    loo = np.stack([_linear_smooth(t, y, s, cv=True) for s in spans])
    resid = np.abs(y[None, :] - loo)
    sm_resid = np.stack([_linear_smooth(t, r, middle) for r in resid])

    best = np.argmin(sm_resid, axis=0)
    span_star = spans[best]
    if alpha is not None and 0 < alpha < 10:
        r_best = sm_resid[best, np.arange(n)]
        r_big = sm_resid[-1]
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = np.where(r_big > 0, r_best / r_big, 1.0)
        ratio = np.clip(ratio, 0.0, 1.0)
        span_star = span_star + (spans[-1] - span_star) * ratio ** (10.0 - alpha)

    span_smooth = np.clip(_linear_smooth(t, span_star, middle),
                          spans[0], spans[-1])
    # interpolate between the primary fits at the smoothed span
    trend = np.empty(n)
    below = span_smooth <= spans[0]
    above = span_smooth >= spans[-1]
    trend[below] = fits[0][below]
    trend[above] = fits[-1][above]
    mid = ~(below | above)
    if mid.any():
        idx = np.searchsorted(spans, span_smooth[mid], side="right") - 1
        idx = np.clip(idx, 0, len(spans) - 2)
        s0, s1 = spans[idx], spans[idx + 1]
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(s1 > s0,
                            (span_smooth[mid] - s0) / (s1 - s0), 0.0)
        cols = np.flatnonzero(mid)
        trend[mid] = (fits[idx, cols] * (1 - frac)
                      + fits[idx + 1, cols] * frac)
    return _linear_smooth(t, trend, final)
