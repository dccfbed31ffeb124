"""Cubic B-spline basis evaluation (Cox-de Boor), pure NumPy.

Used by the rspline / hspline / pspline detrenders in place of
scipy.interpolate.  Evaluation outside the knot range extrapolates the end
polynomial piece (the same convention as scipy's default ``ext=0``),
implemented by clamping the span index.
"""

from __future__ import annotations

import numpy as np


def clamped_knots(interior: np.ndarray, lo: float, hi: float, k: int = 3) -> np.ndarray:
    """Open/clamped knot vector: (k+1) copies of each end around the interior."""
    return np.concatenate([np.full(k + 1, lo), np.asarray(interior, dtype=np.float64),
                           np.full(k + 1, hi)])


def design(x: np.ndarray, knots: np.ndarray, k: int = 3) -> np.ndarray:
    """Dense (len(x), n_basis) B-spline design matrix, n_basis = len(knots)-k-1."""
    x = np.asarray(x, dtype=np.float64)
    T = np.asarray(knots, dtype=np.float64)
    n_basis = len(T) - k - 1
    m = len(x)
    # span index: greatest i with T[i] <= x, clamped into [k, n_basis-1]
    span = np.searchsorted(T, x, side="right") - 1
    span = np.clip(span, k, n_basis - 1)

    # triangular scheme (NURBS book A2.2), vectorized over x
    N = np.zeros((m, k + 1))
    N[:, 0] = 1.0
    left = np.zeros((m, k + 1))
    right = np.zeros((m, k + 1))
    for j in range(1, k + 1):
        left[:, j] = x - T[span + 1 - j]
        right[:, j] = T[span + j] - x
        saved = np.zeros(m)
        for r in range(j):
            denom = right[:, r + 1] + left[:, j - r]
            with np.errstate(invalid="ignore", divide="ignore"):
                temp = np.where(denom != 0.0, N[:, r] / denom, 0.0)
            N[:, r] = saved + right[:, r + 1] * temp
            saved = left[:, j - r] * temp
        N[:, j] = saved

    B = np.zeros((m, n_basis))
    cols = span[:, None] - k + np.arange(k + 1)[None, :]
    np.put_along_axis(B, cols, N, axis=1)
    return B


class LsqSpline:
    """Least-squares cubic B-spline fit with given interior knots
    (semantics of scipy LSQUnivariateSpline as used by wotan's rspline)."""

    def __init__(self, x: np.ndarray, y: np.ndarray, interior: np.ndarray, k: int = 3):
        x = np.asarray(x, dtype=np.float64)
        interior = np.asarray(interior, dtype=np.float64)
        if len(x) <= k:
            raise ValueError("not enough points for spline fit")
        if len(interior) and (interior[0] <= x[0] or interior[-1] >= x[-1]):
            raise ValueError("interior knots must lie strictly inside the data range")
        self.k = k
        self.T = clamped_knots(interior, x[0], x[-1], k)
        B = design(x, self.T, k)
        # Schoenberg-Whitney-style guard: every basis needs support
        if np.any(B.sum(axis=0) == 0.0):
            raise ValueError("knot placement leaves an unsupported basis function")
        self.coef, *_ = np.linalg.lstsq(B, y, rcond=None)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return design(np.asarray(x, dtype=np.float64), self.T, self.k) @ self.coef


def uniform_basis(x: np.ndarray, lo: float, hi: float, n_splines: int,
                  k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Evenly spaced cubic basis with ``n_splines`` functions over [lo, hi]
    (the penalized-spline basis shape used by pspline)."""
    n_interior = max(n_splines - k - 1, 0)
    if n_interior:
        interior = np.linspace(lo, hi, n_interior + 2)[1:-1]
    else:
        interior = np.array([])
    T = clamped_knots(interior, lo, hi, k)
    return design(x, T, k), T
