"""Visualization-grade downsampling kernels: M4 and LTTB.

Complements the statistical tier rollups (``spark/rollup.py``): tiers
answer aggregate queries, these answer "draw 10^7 points on a 2k-pixel
screen without lying".  Both operate on one dense series (token index =
time axis) with NaN gap sentinels, fully deterministic, and are applied
per-series inside the packed ``mapInPandas`` pass (``spark/downsample.py``)
so the distributed form stays shuffle-free.

M4: Jugel et al., "M4: A Visualization-Oriented Time Series Data
Aggregation" (PVLDB 7(10), 2014) — per pixel-bucket keep first/last/min/max
points; error-free line rendering at the bucket width.

LTTB: Steinarsson, "Downsampling Time Series for Visual Representation"
(MSc thesis, U. Iceland 2013) — fixed point budget, greedy
largest-triangle selection with the next bucket's centroid as the third
vertex.
"""

from __future__ import annotations

import numpy as np


def m4_stats(y: np.ndarray, factor: int):
    """Per-bucket M4 tuple over the dense axis t = 0..n-1, vectorized
    (pad -> reshape -> row reductions, no Python loop).

    Returns arrays ``(bucket, n, t_first, y_first, t_last, y_last,
    t_min, y_min, t_max, y_max)`` for buckets with >=1 valid point; an
    all-NaN bucket draws nothing at this resolution so it emits no row.
    Ties on min/max resolve to the EARLIEST t (np.argmin/argmax first
    occurrence), the convention an order-independent SQL twin can
    reproduce with ``min(t) FILTER (WHERE y = extremum)``.
    """
    if factor < 1:
        raise ValueError("factor must be >= 1")
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        zf = np.empty(0, dtype=np.float64)
        return z, z, z, zf, z, zf, z, zf, z, zf
    nb = (n + factor - 1) // factor
    pad = nb * factor - n
    vp = np.concatenate([y, np.full(pad, np.nan)]) if pad else y
    M = vp.reshape(nb, factor)
    ok = ~np.isnan(M)
    cnt = ok.sum(axis=1).astype(np.int64)
    off = np.arange(factor)
    first_off = np.where(ok, off, factor).min(axis=1)
    last_off = np.where(ok, off, -1).max(axis=1)
    min_off = np.argmin(np.where(ok, M, np.inf), axis=1)
    max_off = np.argmax(np.where(ok, M, -np.inf), axis=1)
    keep = cnt > 0
    rows = np.flatnonzero(keep)
    base = rows * factor
    first_off, last_off = first_off[rows], last_off[rows]
    min_off, max_off = min_off[rows], max_off[rows]
    return (rows.astype(np.int64), cnt[rows],
            base + first_off, M[rows, first_off],
            base + last_off, M[rows, last_off],
            base + min_off, M[rows, min_off],
            base + max_off, M[rows, max_off])


def lttb_indices(y: np.ndarray, n_out: int) -> np.ndarray:
    """Indices into the dense axis selected by LTTB with a budget of
    ``n_out`` points.  NaN samples (gap sentinels) are skipped before
    bucketing; returned indices refer to the ORIGINAL axis and are
    strictly increasing.  If the series has <= n_out valid points, all
    of them are returned (downsampling is a no-op).

    Deterministic: the area argmax breaks ties at the earliest t.
    """
    if n_out < 3:
        raise ValueError("n_out must be >= 3 (first + last + interior)")
    y = np.asarray(y, dtype=np.float64)
    valid = np.flatnonzero(~np.isnan(y))
    m = len(valid)
    if m <= n_out:
        return valid.astype(np.int64)
    t = valid.astype(np.float64)
    v = y[valid]
    # canonical bucketing: endpoints are their own buckets; the m-2
    # interior points split evenly across n_out-2 buckets
    edges = 1 + np.floor(
        np.arange(n_out - 1) * (m - 2) / (n_out - 2)).astype(np.int64)
    edges[-1] = m - 1  # the final interior bucket ends before the last point
    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    a = 0  # previously selected (index into the valid arrays)
    for i in range(n_out - 2):
        lo, hi = edges[i], edges[i + 1]
        if hi <= lo:          # degenerate when n_out-2 ~ m-2
            hi = lo + 1
        nlo, nhi = edges[i + 1], (edges[i + 2] if i + 2 < n_out - 1 else m)
        if nhi <= nlo:
            nhi = nlo + 1
        t_avg = t[nlo:nhi].mean()
        v_avg = v[nlo:nhi].mean()
        area = np.abs((t[a] - t_avg) * (v[lo:hi] - v[a])
                      - (t[a] - t[lo:hi]) * (v_avg - v[a]))
        a = lo + int(np.argmax(area))
        sel[i + 1] = a
    sel[-1] = m - 1
    return valid[sel].astype(np.int64)
