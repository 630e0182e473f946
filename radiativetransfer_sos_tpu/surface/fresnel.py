"""Fresnel reflection matrix and its Legendre/GSF expansion.

Re-design of ``SOS_MAT_FRESNEL`` (``src/SOS_SURFACE.F:1235``): the Fresnel
matrix elements R11/R12/R33 sampled at the Gauss grid are projected on
Legendre polynomials (R11, R33) and the s=2 generalized functions (R12), and
alpha/zeta are reconstructed — producing the coefficient set consumed by the
Fourier kernel builder exactly like an aerosol expansion.
"""

from __future__ import annotations

import numpy as np

from ..legendre import alpha_zeta_from, gsf2_table, legendre_table


def fresnel_elements(mu_signed: np.ndarray, ind: float):
    """R11/R12/R33 per signed direction cosine.

    The signed mu is the complement of the scattering angle:
    scattering angle = pi - 2*reflection angle (``src/SOS_SURFACE.F:1370``);
    RL carries the reference's sign flip (DEM 2, ``:1380``).
    """
    c = np.sqrt(0.5 * (1.0 + mu_signed))
    a = np.sqrt(ind * ind - 1.0 + c * c)
    b = ind * ind * c
    rl = -(b - a) / (b + a)
    rr = (c - a) / (c + a)
    r11 = 0.5 * (rl * rl + rr * rr)
    r12 = 0.5 * (rl * rl - rr * rr)
    r33 = rl * rr
    return r11, r12, r33


def flat_sea_fresnel(mu_pos: np.ndarray, mus: float, ind: float,
                     ipolar: bool = True):
    """Flat-sea Fresnel reflection vectors for the solver's IFRESNEL path.

    Returns (f11, f12, f33), each (N+1,) with slot 0 the solar incidence
    (mu = -mus) and slot j the Gauss angle j
    (``SOS_MAT_FRESNEL_PLAN_REFL``, ``src/SOS_OS.F:1719``).
    """
    mu = np.concatenate([[-mus], mu_pos])
    ind2 = ind * ind
    x = np.sqrt(ind2 - 1.0 + mu * mu)
    rl = (ind2 * mu - x) / (ind2 * mu + x)
    rr = (mu - x) / (mu + x)
    f11 = 0.5 * (rl * rl + rr * rr)
    if ipolar:
        f12 = 0.5 * (rl * rl - rr * rr)
        f33 = rl * rr
    else:
        f12 = np.zeros_like(f11)
        f33 = np.zeros_like(f11)
    return f11, f12, f33


def fresnel_expansion(mu_pos: np.ndarray, w_pos: np.ndarray, ind: float,
                      os_ns: int):
    """(alpha, beta, gamma, zeta) expansions of the Fresnel matrix.

    ``mu_pos``/``w_pos``: positive radiance-grid cosines / weights (any
    order).  Quadrature runs over the full signed axis excluding the center
    (``src/SOS_SURFACE.F:1392-1460``).
    """
    mu_s = np.concatenate([-mu_pos, mu_pos])
    w_s = np.concatenate([w_pos, w_pos])
    r11, r12, r33 = fresnel_elements(mu_s, ind)

    ll = 2 * np.arange(os_ns + 1) + 1.0
    pl = legendre_table(mu_s, os_ns)
    pol = gsf2_table(mu_s, os_ns)
    beta = (pl * (w_s * r11)).sum(axis=1) * ll * 0.5
    delta = (pl * (w_s * r33)).sum(axis=1) * ll * 0.5
    gamma = (pol * (w_s * r12)).sum(axis=1) * ll * 0.5
    alpha, zeta = alpha_zeta_from(beta, delta)
    return alpha, beta, gamma, zeta
