"""Sliding-window outlier clipper (reference ``slide_clip``,
wotan/slide_clipper.py:4-79).

The reference operator is an order-dependent overwrite loop: each center's
window *overwrites* the output slice, so later windows replace earlier
results (quirk Q9b).  Because every window's statistics come from the
ORIGINAL data, the loop has a closed form: ``out[j]`` equals the clip
decision of the LAST valid center whose window covers ``j``.  With sorted
time both window boundaries (``starts``/``ends``) are nondecreasing, so
that last-writer index resolves per point with two ``searchsorted`` calls,
and the per-center statistics vectorize as length-grouped contiguous
window matrices reduced along axis 1 (bit-identical to the per-window 1-D
reductions — asserted at rtol=1e-12 against the reference loop, including
the hypothesis property suite over irregular/duplicate/NaN series).
~100x the Python-loop throughput at the engine's 4k-token series.

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

import warnings

import numpy as np


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
    out = np.full(n, np.nan)
    if n == 0:
        return out
    lo_t, hi_t = np.min(time), np.max(time)
    half_window = window_length / 2.0
    starts = np.searchsorted(time, time - half_window, side="left")
    ends = np.minimum(np.searchsorted(time, time + half_window, side="left"),
                      n - 1)

    # centers: indexes [0, n-2] with strictly interior time values — a
    # contiguous index range since time is sorted
    c_hi = n - 2
    interior = np.where((time[:n - 1] > lo_t) & (time[:n - 1] < hi_t))[0]
    if len(interior) == 0:
        return out
    v0, v1 = int(interior[0]), int(interior[-1])

    # last-writer resolution: for each point j the candidate centers are
    # {i: starts[i] <= j} (a prefix — starts nondecreasing) intersected
    # with {i: ends[i] > j} (a suffix — ends nondecreasing) and the valid
    # range [v0, v1]; the overwrite loop's survivor is the max of that set
    j_arr = np.arange(n)
    pre_hi = np.searchsorted(starts[:c_hi + 1], j_arr, side="right") - 1
    suf_lo = np.searchsorted(ends[:c_hi + 1], j_arr, side="right")
    writer = np.minimum(pre_hi, v1)
    covered = np.maximum(suf_lo, v0) <= writer
    if not covered.any():
        return out

    needed = np.unique(writer[covered])
    # per-center stats over the ORIGINAL data, grouped by window length so
    # each group reduces a contiguous (k, L) matrix along axis 1 exactly as
    # the 1-D per-window call would
    mid = np.full(n, np.nan)
    cutoff = np.full(n, np.nan)
    lens = ends[needed] - starts[needed]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        for L in np.unique(lens):
            if L <= 0:
                continue
            g = needed[lens == L]
            W = data[starts[g][:, None] + np.arange(L)[None, :]]
            if center == "mad":     # reference comparison quirk (module doc)
                m = np.nanmedian(W, axis=1)
            else:
                m = np.nanmean(W, axis=1)
            Ws = np.nan_to_num(W)
            if method == "median":  # reference comparison quirk
                c = np.nanmedian(np.abs(Ws - m[:, None]), axis=1)
            else:
                c = np.nanstd(Ws, axis=1)
            mid[g] = m
            cutoff[g] = c

    jc = j_arr[covered]
    wc = writer[jc]
    vals = np.nan_to_num(data[jc])          # surviving NaN inputs -> 0 (Q9)
    diff = vals - mid[wc]
    clipped = (diff > high * cutoff[wc]) | (diff < -low * cutoff[wc])
    out[jc] = np.where(clipped, np.nan, vals)
    return out
