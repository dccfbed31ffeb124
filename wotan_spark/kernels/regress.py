"""Gaussian-basis regressions: ridge / lasso / elasticnet.

Reference: wotan/regression.py — N = int(span/window_length) Gaussian
features with centers on linspace(min,max,N) and width 2x the center
spacing, fed to sklearn Ridge / Lasso(alpha*1e-6) / ElasticNet(alpha*1e-6).
Ridge is solved in closed form; lasso/elasticnet by coordinate descent on
the sklearn objective (1/(2n)||y-Xw-b||^2 + penalties), all with intercept.
"""

from __future__ import annotations

import numpy as np


def gaussian_features(x: np.ndarray, n_centers: int,
                      width_factor: float = 2.0) -> np.ndarray:
    centers = np.linspace(np.min(x), np.max(x), n_centers)
    width = width_factor * (centers[1] - centers[0]) if n_centers > 1 else 1.0
    arg = (x[:, None] - centers[None, :]) / width
    return np.exp(-0.5 * arg ** 2)


def _ridge(X: np.ndarray, y: np.ndarray, alpha: float) -> tuple[np.ndarray, float]:
    xm = X.mean(axis=0)
    ym = y.mean()
    Xc = X - xm
    yc = y - ym
    p = X.shape[1]
    w = np.linalg.solve(Xc.T @ Xc + alpha * np.eye(p), Xc.T @ yc)
    return w, ym - xm @ w


def _coordinate_descent(X: np.ndarray, y: np.ndarray, l1: float, l2: float,
                        max_iter: int = 10000, tol: float = 1e-8
                        ) -> tuple[np.ndarray, float]:
    """min_w 1/(2n)||y - Xw - b||^2 + l1||w||_1 + l2/2 ||w||^2 (intercept
    unpenalized, handled by centering)."""
    n, p = X.shape
    xm = X.mean(axis=0)
    ym = y.mean()
    Xc = X - xm
    yc = y - ym
    col_sq = (Xc ** 2).sum(axis=0) / n
    w = np.zeros(p)
    resid = yc.copy()
    for _ in range(max_iter):
        max_delta = 0.0
        for j in range(p):
            if col_sq[j] == 0.0:
                continue
            rho = (Xc[:, j] @ resid) / n + col_sq[j] * w[j]
            new = np.sign(rho) * max(abs(rho) - l1, 0.0) / (col_sq[j] + l2)
            delta = new - w[j]
            if delta != 0.0:
                resid -= delta * Xc[:, j]
                w[j] = new
                max_delta = max(max_delta, abs(delta))
        if max_delta < tol:
            break
    return w, ym - xm @ w


def regression_trend(time: np.ndarray, flux: np.ndarray, method: str,
                     window_length: float, cval: float) -> np.ndarray:
    duration = np.max(time) - np.min(time)
    n_centers = int(duration / window_length)
    X = gaussian_features(time, n_centers)
    offset = 1e-6  # sklearn-alpha rescale used by the reference for l1 methods
    if method == "ridge":
        w, b = _ridge(X, flux, alpha=float(cval))
    elif method == "lasso":
        w, b = _coordinate_descent(X, flux, l1=float(cval) * offset, l2=0.0)
    elif method == "elasticnet":
        a = float(cval) * offset
        w, b = _coordinate_descent(X, flux, l1=0.5 * a, l2=0.5 * a)
    else:  # pragma: no cover
        raise ValueError(method)
    return X @ w + b
