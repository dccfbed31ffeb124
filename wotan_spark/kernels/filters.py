"""Cadence-based filters: Savitzky-Golay and median filter.

The reference delegates to ``scipy.signal.savgol_filter`` /
``scipy.signal.medfilt`` (wotan/flatten.py:285-290).  Implemented here from
the published filter definitions:

* ``savgol``: linear-phase polynomial least-squares convolution; interior via
  a precomputed kernel, edges via an explicit polynomial fit to the first and
  last window evaluated at the edge positions (scipy's ``mode='interp'``
  default behavior).
* ``medfilt``: zero-padded sliding median (scipy's documented edge handling).
"""

from __future__ import annotations

import numpy as np


def savgol_coeffs(window_length: int, polyorder: int) -> np.ndarray:
    """Kernel h with (h * y)[i] = value of the LSQ polynomial of degree
    ``polyorder`` fit over the centered window, evaluated at the center."""
    if window_length % 2 == 0:
        raise ValueError("window_length must be odd")
    half = window_length // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    V = np.vander(x, polyorder + 1, increasing=True)      # (w, p+1)
    # center-evaluation row of the hat matrix: e0^T (V^T V)^-1 V^T
    G = np.linalg.pinv(V)                                  # (p+1, w)
    return G[0]


def savgol_filter(y: np.ndarray, window_length: int, polyorder: int) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if window_length > n:
        # fit a single polynomial to everything (degenerate window)
        x = np.arange(n, dtype=np.float64)
        if n == 0:
            return y.copy()
        deg = min(polyorder, n - 1)
        c = np.polyfit(x, y, deg)
        return np.polyval(c, x)
    h = savgol_coeffs(window_length, polyorder)
    half = window_length // 2
    out = np.convolve(y, h[::-1], mode="same")
    # edge windows: polynomial fit over the first/last window, evaluated at
    # the actual edge positions ("interp" behavior)
    x = np.arange(window_length, dtype=np.float64)
    if n >= window_length:
        c_lo = np.polyfit(x, y[:window_length], polyorder)
        out[:half] = np.polyval(c_lo, x[:half])
        c_hi = np.polyfit(x, y[-window_length:], polyorder)
        out[-half:] = np.polyval(c_hi, x[-half:])
    return out


def medfilt(y: np.ndarray, kernel_size: int) -> np.ndarray:
    """Zero-padded sliding median."""
    y = np.asarray(y, dtype=np.float64)
    if kernel_size % 2 == 0:
        raise ValueError("kernel_size must be odd")
    half = kernel_size // 2
    padded = np.concatenate([np.zeros(half), y, np.zeros(half)])
    windows = np.lib.stride_tricks.sliding_window_view(padded, kernel_size)
    return np.median(windows, axis=1)
