"""Time-windowed sliding robust estimation over one series segment.

Re-creates the window semantics of the reference slider
(``wotan/slider.py:12-91``) with vectorized NumPy instead of a numba
per-point loop:

* window for center ``i`` is the half-open time range
  ``[t_i - W/2, t_i + W/2)`` expressed as index range
  ``[searchsorted(t, t_i - W/2), min(searchsorted(t, t_i + W/2), n-1))`` —
  the ``n-1`` cap means the final point of a segment is never inside any
  window (quirk Q1);
* centers outside ``[min(t)+edge_cutoff, max(t)-edge_cutoff]`` are NaN, with
  ``edge_cutoff`` clamped to ``W/2``;
* masked points are dropped via the reference's negative-sentinel trick
  (``mask 0 -> -1``, keep ``flux*mask > -1e-12``), which also drops genuinely
  negative flux (quirk Q2);
* an empty window yields NaN.

Vectorization strategy: window index bounds come from two ``searchsorted``
calls (identical results to the reference's monotone two-pointer sweep);
centers are then grouped by window *length* so each group is a dense
``(n_windows, L)`` matrix evaluated by one vectorized estimator call.  On a
regular token-index grid almost all interior windows share one length, so
this runs at NumPy speed without numba.
"""

from __future__ import annotations

import numpy as np

from wotan_spark.constants import PROPORTIONTOCUT
from wotan_spark.kernels import robust

_NEG_SENTINEL = -1e-12


def window_bounds(time: np.ndarray, half_window: float) -> tuple[np.ndarray, np.ndarray]:
    """Per-center [start, end) index bounds of the sliding time window."""
    n = len(time)
    starts = np.searchsorted(time, time - half_window, side="left")
    ends = np.minimum(np.searchsorted(time, time + half_window, side="left"), n - 1)
    return starts, ends


_FAST_2D = {
    "mean": lambda F, cval: robust.mean_2d(F),
    "median": lambda F, cval: robust.median_2d(F),
    "biweight": lambda F, cval: robust.m_location_2d(F, cval, "biweight"),
    "andrewsinewave": lambda F, cval: robust.m_location_2d(F, cval, "andrewsinewave"),
    "welsch": lambda F, cval: robust.m_location_2d(F, cval, "welsch"),
    "hodges": lambda F, cval: robust.hodges_2d(F),
    "trim_mean": lambda F, cval: robust.trim_mean_2d(F, cval),
    "winsorize": lambda F, cval: robust.winsorize_2d(F, cval),
    "hampelfilt": lambda F, cval: robust.hampelfilt_2d(F, cval),
    "huber_psi": lambda F, cval: robust.huber_psi_2d(F, cval),
    "tau": lambda F, cval: robust.tau_2d(F, cval),
}

_ITER_2D = {
    "huber": lambda F, cval: robust.huber_location_2d(F, cval),
    "hampel": lambda F, cval: robust.irls_intercept_2d(F, "hampel", cval),
    "ramsay": lambda F, cval: robust.irls_intercept_2d(F, "ramsay", cval),
}


def _grouped_ragged(out: np.ndarray, centers: np.ndarray,
                    starts: np.ndarray, ends: np.ndarray,
                    keep: np.ndarray, values: np.ndarray,
                    est, cval, min_len: int) -> None:
    """Batch ragged windows (mask/NaN-dropped contents) through the
    row-vectorized estimators: windows are regrouped by their KEPT length —
    ``kept_idx[pos[s] : pos[e]]`` enumerates a window's surviving values in
    order — so each group is one dense (rows, K) matrix instead of a
    per-window Python call.  The 2-D estimators are row-independent
    (row-frozen iteration), so results are bit-equal to the per-window
    path."""
    kept_idx = np.where(keep)[0]
    pos = np.concatenate(([0], np.cumsum(keep)))
    ks, ke = pos[starts], pos[ends]
    counts = ke - ks
    for K in np.unique(counts):
        if K < min_len:
            continue  # too-small windows stay NaN
        g = np.where(counts == K)[0]
        offs = np.arange(K)[None, :]
        block = max(int(32768 / max(K, 1)), 256)
        for b in range(0, len(g), block):
            gb = g[b:b + block]
            rows = kept_idx[ks[gb][:, None] + offs]
            out[centers[gb]] = est(values[rows], cval)


def _center_selection(time: np.ndarray, window_length: float,
                      edge_cutoff: float) -> np.ndarray:
    half_window = window_length / 2.0
    if edge_cutoff > half_window:
        edge_cutoff = half_window
    lo = np.min(time) + edge_cutoff
    hi = np.max(time) - edge_cutoff
    return (time >= lo) & (time <= hi)


def running_slider(time: np.ndarray, flux: np.ndarray, mask: np.ndarray,
                   window_length: float, edge_cutoff: float, cval,
                   method: str) -> np.ndarray:
    """Fast-path slider (reference ``running_segment``, wotan/slider.py:12-91)."""
    est = _FAST_2D[method]
    n = len(time)
    out = np.full(n, np.nan)
    if n == 0:
        return out
    sel = _center_selection(time, window_length, edge_cutoff)
    centers = np.where(sel)[0]
    if len(centers) == 0:
        return out

    sentinel = np.where(mask == 0.0, -1.0, mask)
    mf = flux * sentinel
    starts, ends = window_bounds(time, window_length / 2.0)
    starts, ends = starts[centers], ends[centers]
    lengths = ends - starts

    # Ragged path only when sentinel-dropping can change window contents:
    # regroup by kept length and run the same row-vectorized estimators.
    ragged = bool(np.any(mf <= _NEG_SENTINEL))
    if ragged:
        _grouped_ragged(out, centers, starts, ends, mf > _NEG_SENTINEL,
                        mf, est, cval, min_len=1)
        return out

    # evaluate in row blocks sized to keep the gathered (block, L) window
    # matrix inside L2 cache — materially better scaling under many
    # concurrent workers (memory-bandwidth-bound otherwise)
    for L in np.unique(lengths):
        g = np.where(lengths == L)[0]
        if L == 0:
            continue  # empty window stays NaN
        block = max(int(32768 / max(L, 1)), 256)
        offs = np.arange(L)[None, :]
        for b in range(0, len(g), block):
            gb = g[b:b + block]
            rows = starts[gb][:, None] + offs
            out[centers[gb]] = est(mf[rows], cval)
    return out


def running_slider_iterative(time: np.ndarray, flux: np.ndarray, mask: np.ndarray,
                             window_length: float, edge_cutoff: float, cval,
                             method: str) -> np.ndarray:
    """Iterative-estimator slider (reference ``running_segment_slow``,
    wotan/slider.py:94-165): NaN-masking, windows with <=1 point give NaN.
    Both the dense and the ragged path run the row-vectorized 2-D IRLS
    (bit-equal per row to the 1-D reference twins in kernels/robust.py)."""
    if method not in _ITER_2D:
        raise ValueError(method)
    n = len(time)
    out = np.full(n, np.nan)
    if n == 0:
        return out
    sel = _center_selection(time, window_length, edge_cutoff)
    centers = np.where(sel)[0]
    if len(centers) == 0:
        return out

    mf = flux * np.where(mask == 0.0, np.nan, mask)
    starts, ends = window_bounds(time, window_length / 2.0)

    # dense path: no NaN anywhere -> group equal-length windows into one
    # (rows, L) matrix per length and run the row-vectorized IRLS (bit-equal
    # per row to the 1D loop via freeze-at-convergence)
    if not np.any(np.isnan(mf)):
        est2 = _ITER_2D[method]
        cs, ce = starts[centers], ends[centers]
        lengths = ce - cs
        for L in np.unique(lengths):
            if L <= 1:
                continue  # reference: windows with <=1 point stay NaN
            g = np.where(lengths == L)[0]
            offs = np.arange(L)[None, :]
            block = max(int(32768 / L), 256)
            for b in range(0, len(g), block):
                gb = g[b:b + block]
                rows = cs[gb][:, None] + offs
                out[centers[gb]] = est2(mf[rows], cval)
        return out

    # ragged (NaN-masked) path: same kept-length regrouping into the
    # row-vectorized IRLS (reference: windows with <=1 kept point stay NaN)
    _grouped_ragged(out, centers, starts[centers], ends[centers],
                    ~np.isnan(mf), mf, _ITER_2D[method], cval, min_len=2)
    return out


def default_cval(method: str, proportiontocut: float = PROPORTIONTOCUT):
    """Per-method default tuning constant (reference wotan/flatten.py:146-173)."""
    defaults = {
        "biweight": 5,
        "andrewsinewave": 1.339,
        "welsch": 2.11,
        "huber": 1.5,
        "huber_psi": 1.28,
        "trim_mean": proportiontocut,
        "winsorize": proportiontocut,
        "hampelfilt": 3,
        "tau": 4.5,
        "hampel": (1.7, 3.4, 8.5),
        "ramsay": 0.3,
        "savgol": 2,
        "ridge": 1,
        "lasso": 1,
        "elasticnet": 1,
    }
    return defaults.get(method, 0)
