"""Scalar astro helpers: transit duration t14 (reference wotan/t14.py:7-39)."""

from __future__ import annotations

import math

from wotan_spark import constants


def t14(R_s: float, M_s: float, P: float, small_planet: bool = False) -> float:
    """Central-transit duration in days for a circular orbit."""
    planet_size = 0.0 if small_planet else 2 * constants.R_JUP
    return (
        (constants.R_SUN * R_s + planet_size)
        * ((4 * P * constants.SECONDS_PER_DAY)
           / (math.pi * constants.G * constants.M_SUN * M_s)) ** (1 / 3)
    ) / constants.SECONDS_PER_DAY
