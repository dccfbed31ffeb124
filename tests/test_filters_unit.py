"""Unit goldens for the from-scratch filter kernels against published
closed-form values (no scipy available to compare at runtime)."""

from __future__ import annotations

import numpy as np
import numpy.testing as npt

from wotan_spark.kernels.filters import medfilt, savgol_coeffs, savgol_filter


def test_savgol_kernel_matches_published_values():
    # classic Savitzky-Golay smoothing kernels (Savitzky & Golay 1964)
    npt.assert_allclose(savgol_coeffs(5, 2),
                        np.array([-3, 12, 17, 12, -3]) / 35.0, atol=1e-12)
    npt.assert_allclose(savgol_coeffs(7, 2),
                        np.array([-2, 3, 6, 7, 6, 3, -2]) / 21.0, atol=1e-12)
    npt.assert_allclose(savgol_coeffs(9, 4),
                        np.array([15, -55, 30, 135, 179, 135, 30, -55, 15])
                        / 429.0, atol=1e-10)


def test_savgol_preserves_polynomials():
    # a degree-p polynomial must pass through unchanged (including edges)
    x = np.arange(60, dtype=np.float64)
    y = 0.5 + 0.03 * x - 0.002 * x ** 2
    out = savgol_filter(y, 11, polyorder=2)
    npt.assert_allclose(out, y, atol=1e-9)


def test_medfilt_zero_padded_edges():
    y = np.array([4.0, 1.0, 3.0, 2.0, 5.0])
    out = medfilt(y, 3)
    # zero padding: first window [0,4,1] -> 1, last [2,5,0] -> 2
    npt.assert_array_equal(out, [1.0, 3.0, 2.0, 3.0, 2.0])


def test_medfilt_constant_series():
    y = np.full(10, 7.0)
    # kernel 5: first window [0,0,7,7,7] -> median still 7
    npt.assert_array_equal(medfilt(y, 5), y)
    # zero-pads become the median when they are the window majority:
    # kernel 7 on a 4-point series -> edge windows hold 3 pads + 4 values
    short = np.array([7.0, 7.0, 7.0, 0.5])
    out = medfilt(short, 7)
    # window at index 0: [0,0,0,7,7,7,.5] -> median 0.5
    assert out[0] == 0.5
