"""Sliding-window outlier clipper (reference ``slide_clip``,
wotan/slide_clipper.py:4-79).

This operator is order-dependent: each center's window *overwrites* the
output slice, so later windows replace earlier results (quirk Q9b).  It
therefore stays a sequential pass within one series; across series it
parallelizes freely.

Replicated reference quirks:

* ``clipit`` compares ``center == 'mad'`` and ``method == 'median'`` — so the
  documented defaults (center='median', method='mad') actually select the
  *mean* midpoint and *standard deviation* cutoff;
* the window is NaN->0 substituted before the cutoff computation, and
  surviving (non-clipped) NaN inputs come out as 0;
* centers run over indexes [0, n-2] with strict ``min(t) < t_i < max(t)``
  bounds, windows are ``[t_i - W/2, t_i + W/2)`` with the end pointer capped
  at n-1 (the last point never enters any window).
"""

from __future__ import annotations

import numpy as np


def _clip_window(data: np.ndarray, low: float, high: float,
                 method: str, center: str) -> np.ndarray:
    if center == "mad":          # reference comparison quirk (see module doc)
        mid = np.nanmedian(data)
    else:
        mid = np.nanmean(data)
    data = np.nan_to_num(data)
    diff = data - mid
    if method == "median":       # reference comparison quirk
        cutoff = np.nanmedian(np.abs(data - mid))
    else:
        cutoff = np.nanstd(data)
    data[diff > high * cutoff] = np.nan
    data[diff < -low * cutoff] = np.nan
    return data


def slide_clip(time: np.ndarray, data: np.ndarray, window_length: float,
               low: float = 3, high: float = 3, method: str | None = None,
               center: str | None = None) -> np.ndarray:
    if method is None:
        method = "mad"
    if center is None:
        center = "median"
    time = np.asarray(time, dtype=np.float64)
    data = np.asarray(data, dtype=np.float64)
    n = len(time)
    lo_t, hi_t = np.min(time), np.max(time)
    half_window = window_length / 2.0
    out = np.full(n, np.nan)
    starts = np.searchsorted(time, time - half_window, side="left")
    ends = np.minimum(np.searchsorted(time, time + half_window, side="left"), n - 1)
    for i in range(n - 1):
        if lo_t < time[i] < hi_t:
            s, e = starts[i], ends[i]
            out[s:e] = _clip_window(data[s:e].copy(), low, high, method, center)
    return out
