"""Engine tuning constants.

These mirror the published tuning constants of the reference library
(hippke/wotan, ``wotan/constants.py:36-76``) so that detrended outputs
agree with the reference test-suite tolerances.
"""

from __future__ import annotations

import math

# --- astrophysical constants (used by t14 only) -------------------------
G = 6.67384e-11          # gravitational constant [m^3 / kg / s^2]
R_SUN = 695508000        # [m]
R_EARTH = 6371000        # [m]
R_JUP = 69911000         # [m]
M_SUN = 1.989e30         # [kg]
SECONDS_PER_DAY = 86400

# --- robust-estimator tuning --------------------------------------------
FTOL = 1e-6              # Newton-Raphson convergence threshold (1 ppm)
MAXITER_HUBER = 1000     # joint Huber location/scale iteration cap
PROPORTIONTOCUT = 0.1    # default two-tail trim fraction
LS_FREQS = 10000         # Lomb-Scargle frequency grid size

# SuperSmoother span multipliers (relative to window/span ratio)
PRIMARY_SPAN_LOWER = 1
PRIMARY_SPAN_UPPER = 3
MIDDLE_SPAN = 3
FINAL_SPAN = 2

# Spline clipping loops
SPLINE_MAXITER = 10
SPLINE_MAX_SPLINES = 50
SPLINE_STDEV_CUT = 2

# Gaussian quantities used by the joint Huber location/scale estimator
# (Huber's "Proposal 2"; public formulation, cf. Huber 1981).
Z75 = 0.6744897501960817          # Phi^-1(0.75)


def gaussian_cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def gaussian_pdf(x: float) -> float:
    return math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)


# Every detrending method the engine accepts.
METHODS = [
    "biweight", "lowess", "andrewsinewave", "welsch", "hodges", "median",
    "mean", "trim_mean", "hspline", "pspline", "cofiam", "supersmoother",
    "savgol", "medfilt", "gp", "rspline", "huber", "winsorize", "hampelfilt",
    "huber_psi", "hampel", "tau", "ramsay", "cosine", "ridge", "lasso",
    "elasticnet",
]

# Methods computed by the time-windowed robust slider (vectorized fast path).
SLIDER_METHODS = [
    "biweight", "andrewsinewave", "welsch", "hodges", "median", "mean",
    "trim_mean", "winsorize", "huber_psi", "hampelfilt", "tau",
]

# Methods computed by the iterative (location/scale or IRLS) slider.
SLOW_SLIDER_METHODS = ["huber", "hampel", "ramsay"]
