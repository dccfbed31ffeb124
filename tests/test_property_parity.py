"""Property-based parity: random irregular series through engine kernels vs
the reference oracle — exercises duplicate timestamps, uneven cadence, tiny
segments, NaN runs, masks, and both slide_clip variants."""

from __future__ import annotations

import numpy as np
import numpy.testing as npt
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from tests.conftest import reference_module
from wotan_spark.kernels import clipper
from wotan_spark.kernels.detrend import detrend_series
from wotan_spark.kernels.windows import running_slider


def _series(seed: int, n: int, dup_frac: float, gap_frac: float):
    rng = np.random.RandomState(seed)
    dt = rng.exponential(0.03, n)
    dt[rng.rand(n) < dup_frac] = 0.0          # duplicate timestamps
    dt[rng.rand(n) < gap_frac] = rng.uniform(1.0, 3.0)  # segment gaps
    time = np.cumsum(dt)
    flux = 1 + 0.001 * np.sin(time) + rng.normal(0, 1e-4, n)
    return time, flux


@given(seed=st.integers(0, 10_000), n=st.integers(30, 400),
       dup=st.sampled_from([0.0, 0.1]), gap=st.sampled_from([0.0, 0.05]),
       method=st.sampled_from(["biweight", "median", "mean", "trim_mean",
                               "huber_psi", "tau", "hampelfilt",
                               "winsorize"]))
@settings(max_examples=40, deadline=None)
def test_slider_property_parity(seed, n, dup, gap, method):
    ref_slider = reference_module("slider")
    codes = {"biweight": 1, "median": 5, "mean": 6, "trim_mean": 7,
             "winsorize": 8, "hampelfilt": 9, "huber_psi": 10, "tau": 11}
    cvals = {"biweight": 5.0, "trim_mean": 0.1, "winsorize": 0.1,
             "hampelfilt": 3.0, "huber_psi": 1.28, "tau": 4.5}
    time, flux = _series(seed, n, dup, gap)
    cval = cvals.get(method, 0.0)
    with np.errstate(all="ignore"):
        try:
            ref = ref_slider.running_segment(time.copy(), flux.copy(),
                                             np.ones(n), 0.4, 0.0, cval,
                                             codes[method])
        except (IndexError, ZeroDivisionError):
            # The reference itself crashes on these inputs (winsorize with a
            # 1-point window hits sorted_data[idx] out of bounds,
            # wotan/location_estimates.py:132; tau divides by a zero weight
            # denominator, :85).  Parity is undefined where the oracle has no
            # defined output — our engine returns NaN for those windows.
            got = running_slider(time, flux, np.ones(n), 0.4, 0.0, cval,
                                 method)
            assert got.shape == (n,)
            assume(False)
        got = running_slider(time, flux, np.ones(n), 0.4, 0.0, cval, method)
    npt.assert_allclose(got, ref, rtol=1e-8, atol=1e-11, equal_nan=True)


@given(seed=st.integers(0, 10_000), n=st.integers(40, 300),
       method=st.sampled_from(["mad", "std"]),
       center=st.sampled_from(["median", "mean"]))
@settings(max_examples=25, deadline=None)
def test_slide_clip_property_parity(seed, n, method, center):
    ref_clip = reference_module("slide_clipper")
    time, flux = _series(seed, n, 0.05, 0.02)
    rng = np.random.RandomState(seed + 1)
    flux[rng.rand(n) < 0.05] = np.nan
    with np.errstate(all="ignore"):
        ref = ref_clip.slide_clip(time, flux.copy(), 0.5, 3, 2, method, center)
        got = clipper.slide_clip(time, flux.copy(), 0.5, 3, 2, method, center)
    npt.assert_allclose(got, ref, rtol=1e-12, equal_nan=True)


def test_masked_lowess_and_cosine_exact():
    ref_lowess = reference_module("lowess")
    ref_cofiam = reference_module("cofiam")
    helpers = reference_module("helpers")
    time, flux = _series(3, 500, 0.0, 0.0)
    raw = helpers.transit_mask(time, 2.0, 0.3, 0.5)
    mask = np.array(~raw, dtype=np.float64)

    from wotan_spark.kernels import lowess as lowess_mod, trig
    got = lowess_mod.lowess(time, flux, mask, 1.0)
    ref = ref_lowess.lowess(time, flux, mask.copy(), 1.0)
    npt.assert_allclose(got, ref, rtol=1e-7, atol=1e-10, equal_nan=True)

    got_c = trig.detrend_cosine(time, flux, 1.0, True, mask.copy())
    ref_c = ref_cofiam.detrend_cosine(time, flux, 1.0, True, mask.copy())
    npt.assert_allclose(got_c, ref_c, rtol=1e-8, atol=1e-10)


@given(seed=st.integers(0, 5000))
@settings(max_examples=15, deadline=None)
def test_full_pipeline_nan_and_gap_property(seed):
    """detrend_series (biweight) vs composed reference stages under random
    NaN runs + time gaps."""
    ref_slider = reference_module("slider")
    ref_gaps = reference_module("gaps")
    rng = np.random.RandomState(seed)
    n = 300
    time, flux = _series(seed, n, 0.0, 0.03)
    lo = rng.randint(0, n - 20)
    flux[lo:lo + rng.randint(5, 20)] = np.nan

    W, bt = 0.4, 0.2
    keep = ~np.isnan(time * flux)
    t_c, f_c = time[keep], flux[keep]
    bounds = ref_gaps.get_gaps_indexes(t_c, bt)
    parts = []
    with np.errstate(all="ignore"):
        for i in range(len(bounds) - 1):
            tv = t_c[bounds[i]:bounds[i + 1]]
            fv = f_c[bounds[i]:bounds[i + 1]]
            if len(tv) == 0:
                continue
            parts.append(ref_slider.running_segment(
                tv.copy(), fv.copy(), np.ones(len(tv)), W, 0.0, 5.0, 1))
    ref_trend = np.full(n, np.nan)
    if parts:
        ref_trend[np.where(keep)[0]] = np.concatenate(parts)
    ref_trend[ref_trend == 0] = np.nan

    res = detrend_series(time, flux, window_length=W, break_tolerance=bt,
                         method="biweight")
    npt.assert_allclose(res.trend_lc, ref_trend, rtol=1e-8, atol=1e-11,
                        equal_nan=True)
