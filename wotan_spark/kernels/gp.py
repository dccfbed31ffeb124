"""Gaussian-process trend estimation, pure NumPy.

Re-creates the reference GP detrender (wotan/gp.py:8-108): median-offset
flux, RBF / Matern-3/2 / periodic (ExpSineSquared + RBF) kernels with the
reference's bounds and the matern x1000 length rescale, the 2-sigma robust
clip loop, and the Lomb-Scargle period pre-search for ``periodic_auto``
(period = 2*pi / omega_peak, quirk Q15).

The reference delegates hyperparameter tuning to sklearn's L-BFGS maximum
marginal likelihood; here the log-marginal-likelihood is maximized by golden
-section search over the log length-scale inside the same (0.5x, 2x) bounds
— agreement is at trend level (the reference's own goldens are decimal=1-2
aggregates), not optimizer-trace level.  O(n^3) per fit — the reference's
test suite caps GP inputs at 2,000 points and so do we in practice.
"""

from __future__ import annotations

import numpy as np

from wotan_spark.constants import LS_FREQS, SPLINE_MAXITER, SPLINE_STDEV_CUT


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _sqdist(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a[:, None] - b[None, :]) ** 2


def k_rbf(a, b, ls):
    return np.exp(-0.5 * _sqdist(a, b) / ls ** 2)


def k_matern32(a, b, ls):
    d = np.abs(a[:, None] - b[None, :]) * (np.sqrt(3.0) / ls)
    return (1.0 + d) * np.exp(-d)


def k_expsine(a, b, ls, period):
    d = np.abs(a[:, None] - b[None, :])
    return np.exp(-2.0 * (np.sin(np.pi * d / period) ** 2) / ls ** 2)


def _chol_solve(K: np.ndarray, y: np.ndarray, jitter: float = 1e-10):
    n = len(K)
    for j in (jitter, 1e-8, 1e-6, 1e-4):
        try:
            L = np.linalg.cholesky(K + j * np.eye(n))
            alpha = np.linalg.solve(L.T, np.linalg.solve(L, y))
            return L, alpha
        except np.linalg.LinAlgError:
            continue
    raise np.linalg.LinAlgError("kernel matrix not PD")


def _lml(K: np.ndarray, y: np.ndarray) -> float:
    try:
        L, alpha = _chol_solve(K, y)
    except np.linalg.LinAlgError:
        return -np.inf
    return float(-0.5 * y @ alpha - np.sum(np.log(np.diag(L)))
                 - 0.5 * len(y) * np.log(2 * np.pi))


def _golden_opt(fn, lo: float, hi: float, iters: int = 20) -> float:
    """Golden-section maximization of fn over [lo, hi] (log-space caller)."""
    gr = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c, d = b - gr * (b - a), a + gr * (b - a)
    fc, fd = fn(c), fn(d)
    for _ in range(iters):
        if fc >= fd:
            b, d, fd = d, c, fc
            c = b - gr * (b - a)
            fc = fn(c)
        else:
            a, c, fc = c, d, fd
            d = a + gr * (b - a)
            fd = fn(d)
    return (a + b) / 2.0


def _fit_predict(x, y, x_pred, kernel_fn, ls0, bounds):
    """Fit length scale by max LML within bounds, predict the mean."""
    def score(log_ls):
        return _lml(kernel_fn(x, x, np.exp(log_ls)), y)
    ls = np.exp(_golden_opt(score, np.log(bounds[0]), np.log(bounds[1])))
    K = kernel_fn(x, x, ls)
    _, alpha = _chol_solve(K, y)
    return kernel_fn(x_pred, x, ls) @ alpha, ls


# ---------------------------------------------------------------------------
# Lomb-Scargle (classic unnormalized periodogram, as scipy.signal.lombscargle)
# ---------------------------------------------------------------------------

def lombscargle(t: np.ndarray, y: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    out = np.empty(len(freqs))
    for i, w in enumerate(freqs):
        wt = w * t
        s2 = np.sum(np.sin(2 * wt))
        c2 = np.sum(np.cos(2 * wt))
        tau = 0.5 * np.arctan2(s2, c2) / w
        arg = w * (t - tau)
        cs, sn = np.cos(arg), np.sin(arg)
        out[i] = 0.5 * ((y @ cs) ** 2 / (cs @ cs) + (y @ sn) ** 2 / (sn @ sn))
    return out


# ---------------------------------------------------------------------------
# reference pipeline
# ---------------------------------------------------------------------------

def gp_trend(time: np.ndarray, flux: np.ndarray, mask: np.ndarray,
             kernel: str | None, kernel_size: float | None,
             kernel_period: float | None, robust: bool) -> np.ndarray:
    if kernel_size is None:
        raise ValueError("kernel_size must be specified")
    if kernel_size <= 0 or not np.isfinite(kernel_size):
        raise ValueError("kernel_size must be finite and positive")

    masked_flux = flux[mask == 1].copy()
    masked_time = time[mask == 1].copy()
    offset = np.median(masked_flux)
    masked_flux -= offset

    if kernel == "matern":
        kernel_size = kernel_size * 1000
    bounds = (0.5 * kernel_size, 2 * kernel_size)

    if kernel in (None, "squared_exp", "matern"):
        kfn = k_matern32 if kernel == "matern" else k_rbf
        converged = not robust
        newtime, newflux = masked_time.copy(), masked_flux.copy()
        detrended = masked_flux.copy()
        alpha_vec, ls = None, kernel_size
        for _ in range(SPLINE_MAXITER):
            if abs(np.median(detrended)) < 0.5:
                detrended = detrended + 1
            keep = np.where(
                1 - detrended < SPLINE_STDEV_CUT * np.std(detrended))[0]
            newtime, newflux = newtime[keep], newflux[keep]
            pred, ls = _fit_predict(newtime, newflux, newtime, kfn,
                                    kernel_size, bounds)
            detrended = (newflux + offset) / (pred + offset)
            outliers = np.where(
                1 - detrended > SPLINE_STDEV_CUT * np.std(detrended))[0]
            if converged or len(outliers) == 0:
                break
        K = kfn(newtime, newtime, ls)
        _, alpha_vec = _chol_solve(K, newflux)
        trend = kfn(time, newtime, ls) @ alpha_vec
        return trend + offset

    # periodic kernels: single pass
    if kernel in ("periodic", "periodic_auto"):
        if kernel == "periodic_auto":
            span = np.max(masked_time) - np.min(masked_time)
            cadence = np.nanmedian(np.diff(masked_time))
            freqs = np.geomspace(1 / span, 1 / cadence, LS_FREQS)
            pgram = lombscargle(masked_time, masked_flux, freqs)
            kernel_period = 1 / freqs[np.argmax(pgram)] * 2 * np.pi
        else:
            if kernel_period is None:
                raise ValueError("kernel_period must be specified")
            if kernel_period <= 0 or not np.isfinite(kernel_period):
                raise ValueError("kernel_period must be finite and positive")

        def kfn(a, b, ls):
            return (k_expsine(a, b, ls, kernel_period)
                    + k_rbf(a, b, kernel_size))

        trend, _ = _fit_predict(masked_time, masked_flux, time, kfn,
                                kernel_size, bounds)
        return trend + offset

    raise ValueError(f"unknown GP kernel {kernel!r}")
