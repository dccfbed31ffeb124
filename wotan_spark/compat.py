"""Drop-in single-series API compatibility with the reference library.

``flatten`` mirrors the reference entry point (wotan/flatten.py:24-44:
same parameter list, same return-shape contract driven by ``return_trend``
/ ``return_nsplines``) so existing reference call sites run unchanged on
this engine's kernels.  Distributed callers use
``wotan_spark.spark.detrend_op`` instead; this wrapper is the
one-series convenience surface.
"""

from __future__ import annotations

from wotan_spark import constants
from wotan_spark.kernels.detrend import detrend_series


def flatten(
    time,
    flux,
    window_length=None,
    edge_cutoff=0,
    break_tolerance=None,
    cval=None,
    return_trend=False,
    method="biweight",
    kernel=None,
    kernel_size=None,
    kernel_period=None,
    proportiontocut=constants.PROPORTIONTOCUT,
    robust=False,
    max_splines=constants.SPLINE_MAX_SPLINES,
    stdev_cut=constants.SPLINE_STDEV_CUT,
    return_nsplines=False,
    mask=None,
    verbose=False,
):
    """Reference-compatible flatten: returns ``flatten_lc``, optionally
    ``(flatten_lc, trend_lc)`` or ``(flatten_lc, trend_lc, nsplines)``
    as the reference does.  Deliberate divergence: for
    ``return_nsplines=True`` without ``return_trend`` the reference has no
    matching branch and falls through returning ``None``
    (wotan/flatten.py:331-336); this wrapper returns the saner
    ``(flatten_lc, nsplines)`` instead.  ``verbose`` is accepted for
    signature parity (the engine kernels do not print)."""
    res = detrend_series(
        time, flux,
        window_length=window_length,
        edge_cutoff=edge_cutoff,
        break_tolerance=break_tolerance,
        cval=cval,
        method=method,
        kernel=kernel,
        kernel_size=kernel_size,
        kernel_period=kernel_period,
        proportiontocut=proportiontocut,
        robust=robust,
        max_splines=max_splines,
        stdev_cut=stdev_cut,
        mask=mask,
    )
    if return_trend and return_nsplines:
        return res.flatten_lc, res.trend_lc, res.nsplines
    if return_trend:
        return res.flatten_lc, res.trend_lc
    if return_nsplines:
        return res.flatten_lc, res.nsplines
    return res.flatten_lc
