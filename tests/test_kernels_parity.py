"""Parity tests: engine NumPy kernels vs the reference library executed as a
behavioral oracle (numba stubbed to a no-op; no reference code is vendored).

Covers every estimator whose reference implementation imports cleanly without
scipy/sklearn/statsmodels: the full Group-A slider family, lowess,
cofiam/cosine, slide_clip, gap segmentation, transit_mask and t14.
"""

from __future__ import annotations

import numpy as np
import numpy.testing as npt
import pytest

from tests.conftest import reference_module, synthetic_series
from wotan_spark.kernels import clipper, lowess as lowess_mod, scalars, series, trig
from wotan_spark.kernels.detrend import detrend_series
from wotan_spark.kernels.windows import default_cval, running_slider

GROUP_A = ["biweight", "andrewsinewave", "welsch", "median", "mean",
           "trim_mean", "winsorize", "hampelfilt", "huber_psi", "tau"]
METHOD_CODES = {"biweight": 1, "andrewsinewave": 2, "welsch": 3, "hodges": 4,
                "median": 5, "mean": 6, "trim_mean": 7, "winsorize": 8,
                "hampelfilt": 9, "huber_psi": 10, "tau": 11}


@pytest.mark.parametrize("method", GROUP_A)
def test_slider_matches_reference(method):
    ref_slider = reference_module("slider")
    time, flux = synthetic_series()
    cval = float(default_cval(method))
    ref = ref_slider.running_segment(time.copy(), flux.copy(),
                                     np.ones(len(time)), 0.5, 0.0, cval,
                                     METHOD_CODES[method])
    got = running_slider(time, flux, np.ones(len(time)), 0.5, 0.0, cval, method)
    npt.assert_allclose(got, ref, rtol=1e-9, atol=1e-12, equal_nan=True)


def test_slider_hodges_matches_reference():
    ref_slider = reference_module("slider")
    time, flux = synthetic_series(points=300)
    ref = ref_slider.running_segment(time.copy(), flux.copy(),
                                     np.ones(len(time)), 0.5, 0.0, 0.0, 4)
    got = running_slider(time, flux, np.ones(len(time)), 0.5, 0.0, 0.0, "hodges")
    npt.assert_allclose(got, ref, rtol=1e-9, atol=1e-12, equal_nan=True)


def test_slider_with_mask_and_edge_cutoff():
    ref_slider = reference_module("slider")
    time, flux = synthetic_series()
    helpers = reference_module("helpers")
    raw = helpers.transit_mask(time, 4.0, 0.3, 1.0)
    mask = np.array(~raw, dtype=np.float64)  # flatten's inversion convention
    ref = ref_slider.running_segment(time.copy(), flux.copy(), mask.copy(),
                                     0.5, 0.2, 5.0, 1)
    got = running_slider(time, flux, mask.copy(), 0.5, 0.2, 5.0, "biweight")
    npt.assert_allclose(got, ref, rtol=1e-9, atol=1e-12, equal_nan=True)


def test_lowess_matches_reference():
    ref_lowess = reference_module("lowess")
    time, flux = synthetic_series()
    ref = ref_lowess.lowess(time, flux, np.ones(len(time)), 1.0)
    got = lowess_mod.lowess(time, flux, np.ones(len(time)), 1.0)
    npt.assert_allclose(got, ref, rtol=1e-7, atol=1e-10, equal_nan=True)


def test_cofiam_matches_reference():
    ref_cofiam = reference_module("cofiam")
    time, flux = synthetic_series()
    ref = ref_cofiam.detrend_cofiam(time, flux, 1.0)
    got = trig.detrend_cofiam(time, flux, 1.0)
    npt.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("robust", [False, True])
def test_cosine_matches_reference(robust):
    ref_cofiam = reference_module("cofiam")
    time, flux = synthetic_series()
    ref = ref_cofiam.detrend_cosine(time, flux, 1.0, robust,
                                    np.ones(len(time)))
    got = trig.detrend_cosine(time, flux, 1.0, robust, np.ones(len(time)))
    npt.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


def test_slide_clip_matches_reference():
    ref_clip = reference_module("slide_clipper")
    time, flux = synthetic_series()
    ref = ref_clip.slide_clip(time, flux.copy(), 0.5, low=3, high=2)
    got = clipper.slide_clip(time, flux.copy(), 0.5, low=3, high=2)
    npt.assert_allclose(got, ref, rtol=1e-12, equal_nan=True)
    # reference golden from wotan/tests.py:40-43
    npt.assert_almost_equal(np.nansum(got), 948.9926368754939, decimal=6)


def test_slide_clip_with_nans_matches_reference():
    ref_clip = reference_module("slide_clipper")
    time, flux = synthetic_series(nan_block=True)
    ref = ref_clip.slide_clip(time, flux.copy(), 0.5)
    got = clipper.slide_clip(time, flux.copy(), 0.5)
    npt.assert_allclose(got, ref, rtol=1e-12, equal_nan=True)


def test_gap_segmentation_matches_reference():
    ref_gaps = reference_module("gaps")
    time, _ = synthetic_series()
    t = np.concatenate([time[:400], time[500:] + 3.0])
    ref = ref_gaps.get_gaps_indexes(t, 0.25)
    got = series.segment_boundaries(t, 0.25)
    npt.assert_array_equal(got, ref)
    ids = series.segment_ids(t, 0.25)
    assert ids.max() + 1 == len(ref) - 1


def test_transit_mask_and_t14_match_reference():
    helpers = reference_module("helpers")
    t14_mod = reference_module("t14")
    time, _ = synthetic_series()
    ref = helpers.transit_mask(time, 3.1, 0.4, 1.0)
    got = series.transit_mask(time, 3.1, 0.4, 1.0)
    npt.assert_array_equal(got, ref)
    # exact goldens from wotan/tests.py:19-23
    npt.assert_almost_equal(scalars.t14(1, 1, 365), 0.6490025258902046)
    npt.assert_almost_equal(scalars.t14(1, 1, 365, small_planet=True),
                            0.5403690143737738)
    npt.assert_almost_equal(scalars.t14(1, 1, 365),
                            t14_mod.t14(1, 1, 365))


def test_detrend_pipeline_matches_composed_reference():
    """Full pipeline (NaN-compress -> segment -> slider -> transplant ->
    divide) vs the same stages composed from reference modules."""
    ref_slider = reference_module("slider")
    ref_gaps = reference_module("gaps")
    time, flux = synthetic_series(nan_block=True)
    # force a real time gap too
    time = time.copy()
    time[600:] += 5.0

    window_length, break_tol, cval = 0.5, 0.25, 5.0
    keep = ~np.isnan(time * flux)
    t_c, f_c = time[keep], flux[keep]
    m_c = np.ones(len(t_c))
    bounds = ref_gaps.get_gaps_indexes(t_c, break_tol)
    parts = []
    for i in range(len(bounds) - 1):
        parts.append(ref_slider.running_segment(
            t_c[bounds[i]:bounds[i + 1]].copy(),
            f_c[bounds[i]:bounds[i + 1]].copy(),
            m_c[bounds[i]:bounds[i + 1]].copy(),
            window_length, 0.0, cval, 1))
    ref_trend = np.full(len(time), np.nan)
    ref_trend[np.where(keep)[0]] = np.concatenate(parts)
    ref_trend[ref_trend == 0] = np.nan
    ref_flat = flux / ref_trend

    res = detrend_series(time, flux, window_length=window_length,
                         break_tolerance=break_tol, method="biweight")
    npt.assert_allclose(res.trend_lc, ref_trend, rtol=1e-9, atol=1e-12,
                        equal_nan=True)
    npt.assert_allclose(res.flatten_lc, ref_flat, rtol=1e-9, atol=1e-12,
                        equal_nan=True)


def test_detrend_biweight_reference_golden():
    """nansum golden in the reference's own test style
    (wotan/tests.py:60-87 uses real TESS data; here the seeded synthetic
    series with the same tolerance contract, decimal=2)."""
    time, flux = synthetic_series()
    res = detrend_series(time, flux, window_length=0.5, method="biweight")
    assert np.isfinite(np.nansum(res.flatten_lc))
    # flat series should hover around 1.0
    assert abs(np.nanmean(res.flatten_lc) - 1.0) < 1e-3


def test_iterative_2d_kernels_bit_equal_to_1d():
    """The row-vectorized huber/hampel/ramsay kernels must reproduce the
    1D loops bit-for-bit (freeze-at-convergence keeps per-row iteration
    counts identical)."""
    from wotan_spark.kernels import robust
    rng = np.random.RandomState(7)
    for L in [2, 3, 5, 20, 121]:
        F = 1 + rng.normal(0, 1e-3, (100, L))
        F[0] = 1.0              # zero-scale row
        F[1, 0] += 5.0          # outlier row
        pairs = [
            (robust.huber_location_2d(F, 1.5),
             [robust.huber_location_1d(f, 1.5) for f in F]),
            (robust.irls_intercept_2d(F, "hampel", (1.7, 3.4, 8.5)),
             [robust.irls_intercept_1d(f, "hampel", (1.7, 3.4, 8.5))
              for f in F]),
            (robust.irls_intercept_2d(F, "ramsay", 0.3),
             [robust.irls_intercept_1d(f, "ramsay", 0.3) for f in F]),
        ]
        for v2, v1 in pairs:
            v1 = np.asarray(v1)
            eq = (v1 == v2) | (np.isnan(v1) & np.isnan(v2))
            assert eq.all()
