"""Aerosol optical properties: size-distribution integration, truncation,
Legendre/GSF expansion, multi-modal mixing.

Re-design of reference ``SOS_AEROSOLS`` (``src/SOS_AEROSOLS.F:680``):

* ``SOS_GRANU`` (:4392) — integration of the Mie quantities over a size
  distribution; here a weighted reduction over the in-memory Mie sweep
  (no per-alpha record files);
* ``SOS_DECOMPO_LEGENDRE`` (:3924) — forward-peak truncation (log-linear
  segment between the Gauss angles bracketing mu = 0.8 / 0.94,
  ``inc/SOS.h:166-167``) and projection on Legendre / generalized spherical
  functions; the projections are (D x L) matmuls over precomputed polynomial
  tables;
* mixture handling (WMO / Shettle-Fenn / bimodal LND / user mixtures) —
  extinction-weighted sums of per-component phase matrices
  (``src/SOS_AEROSOLS.F:1310-2200``).

All of this is setup-path code (per wavelength, cached); it runs in float64
(NumPy on host or jnp; sizes are tiny compared to the solver).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from . import constants as cte
from .legendre import alpha_zeta_from, gsf2_table as _gsf2_table_shared, \
    legendre_table as _legendre_table_shared
from .mie import MieResult


@dataclasses.dataclass(frozen=True)
class PhaseMatrix:
    """Size-integrated phase matrix on the Mie angle grid + cross sections."""
    p11: np.ndarray      # (D,) signed-axis phase function
    p12: np.ndarray
    p22: np.ndarray
    p33: np.ndarray
    sigma_ext: np.ndarray   # extinction cross-section (micron^2/particle)
    sigma_sca: np.ndarray   # scattering cross-section
    nb_particles: float     # integral of n(r) dr

    @property
    def single_scattering_albedo(self):
        return self.sigma_sca / self.sigma_ext


@dataclasses.dataclass(frozen=True)
class AerosolExpansion:
    """GSF expansion of the (possibly truncated) aerosol phase matrix.

    Coefficient naming follows the reference output (``Aerosols.txt``):
    alpha(k), beta(k), gamma(k), zeta(k) normalized by beta(0); plus the
    truncation coefficient and the single-scattering albedos before/after
    truncation (``src/SOS_PROC.F:481``, ``src/SOS.F:521-543``).
    """
    alpha: np.ndarray
    beta: np.ndarray
    gamma: np.ndarray
    zeta: np.ndarray
    coef_tronca: float
    piz: float           # single-scattering albedo (true)
    piz_tronc: float     # albedo after truncation adjustment
    sigma_ext: float
    sigma_sca: float


def size_distribution(igranu: int, r, v1, v2, v3):
    """n(r) for the supported analytic distributions
    (``src/SOS_AEROSOLS.F:4556-4590``)."""
    r = np.asarray(r)
    if igranu == 1:          # log-normal: rm, sigma
        rm, sig = v1, v2
        b = np.log(r / rm) / sig
        return np.exp(-b * b / 2.0) / (r * sig * np.sqrt(2.0 * np.pi))
    if igranu == 2:          # Junge power law: r0, nu, rmax
        r0, xnu, rmax = v1, v2, v3
        nr0 = r0 ** (-xnu)
        nr = np.where(r <= r0, nr0, r ** (-xnu))
        return np.where(r > rmax, 0.0, nr)
    raise ValueError(f"unknown granulometry {igranu}")


def _alpha_steps(alpha):
    """The PAS value associated with each alpha of the reference sweep
    (``src/SOS_MIE.F:404-409``): the step used to advance FROM alpha."""
    pas = np.full_like(alpha, 1.0e-4)
    pas = np.where(alpha > 0.1, 1.0e-3, pas)
    pas = np.where(alpha > 1.0, 1.0e-2, pas)
    pas = np.where(alpha > 10.0, 5.0e-2, pas)
    pas = np.where(alpha > 30.0, 1.0e-1, pas)
    pas = np.where(alpha > 100.0, 1.0, pas)
    return pas


def integrate_granulometry(mie: MieResult, igranu: int, v1, v2, v3,
                           wavelength: float) -> PhaseMatrix:
    """Integrate the Mie sweep over a size distribution (``SOS_GRANU``).

    The reference accumulates rectangle-rule terms while streaming the Mie
    file (``src/SOS_AEROSOLS.F:4530-4620``, excluding the final record at
    alphaF); identical quadrature here as a vector reduction.
    """
    alpha = np.asarray(mie.alpha, dtype=np.float64)
    keep = alpha < (np.max(alpha) - 1.0e-4)     # ALPHA >= ALPHAF-PAS exits
    r = alpha * wavelength / (2.0 * np.pi)
    nr = size_distribution(igranu, r, v1, v2, v3)
    if igranu == 2:
        keep &= (r <= v3)
    pr = wavelength * _alpha_steps(alpha) / (2.0 * np.pi)
    w = np.where(keep, nr * pr, 0.0)

    x1 = w * np.pi * r ** 2
    kmat1 = np.sum(x1 * mie.qext)
    kmat2 = np.sum(x1 * mie.qsca)
    xs = (x1 * mie.qsca)[:, None]
    p11 = np.sum(xs * mie.imie, axis=0) / kmat2
    p12 = np.sum(xs * mie.qmie, axis=0) / kmat2
    p33 = np.sum(xs * mie.umie, axis=0) / kmat2
    somme_nr = np.sum(w)
    return PhaseMatrix(p11=p11, p12=p12, p22=p11.copy(), p33=p33,
                       sigma_ext=kmat1 / somme_nr, sigma_sca=kmat2 / somme_nr,
                       nb_particles=somme_nr)


def mix_phase_matrices(components: Sequence[PhaseMatrix],
                       number_fractions: Sequence[float]) -> PhaseMatrix:
    """Extinction-weighted multi-modal mixture (``src/SOS_AEROSOLS.F`` WMO /
    SF / bimodal blocks): phase functions weighted by scattering cross
    section x number density of each mode."""
    nf = np.asarray(number_fractions, dtype=np.float64)
    sca = np.array([c.sigma_sca for c in components])
    ext = np.array([c.sigma_ext for c in components])
    wsca = nf * sca
    wext = nf * ext
    tot_sca = np.sum(wsca)
    mix = lambda f: sum(w * getattr(c, f) for w, c in zip(wsca, components)) / tot_sca
    return PhaseMatrix(p11=mix("p11"), p12=mix("p12"), p22=mix("p22"),
                       p33=mix("p33"),
                       sigma_ext=np.sum(wext) / np.sum(nf),
                       sigma_sca=tot_sca / np.sum(nf),
                       nb_particles=float(np.sum(nf)))


_legendre_table = _legendre_table_shared
_gsf2_table = _gsf2_table_shared


def truncate_phase(p11: np.ndarray, mu: np.ndarray, w: np.ndarray):
    """Forward-peak log-linear truncation (``src/SOS_AEROSOLS.F:4030-4087``).

    ``mu``/``w``: positive Mie-grid cosines/weights (ascending).  Returns the
    truncated p11 (signed axis) — the caller checks the resulting truncation
    coefficient against the cancel threshold.
    """
    n = mu.shape[0]
    p11 = np.array(p11)
    # last Gauss (weighted) angle with mu <= threshold, reference indexes the
    # first mu > threshold minus one (:4056-4070)
    def bracket(thr):
        for j in range(n):
            if mu[j] > thr and w[j] != 0.0:
                return j - 1
        return n - 1
    k = bracket(cte.AER_MU1_TRONCA)
    kk = bracket(cte.AER_MU2_TRONCA)

    def pos(j):          # signed-axis index of positive angle j (0-based)
        return n + 1 + j

    aa = (np.log10(p11[pos(kk)]) - np.log10(p11[pos(k)])) \
        / (np.arccos(mu[kk]) - np.arccos(mu[k]))
    x1 = np.log10(p11[pos(kk)])
    x2 = np.arccos(mu[kk])
    for j in range(kk + 1, n):
        coef = x1 + aa * (np.arccos(mu[j]) - x2)
        p11[pos(j)] = 10.0 ** coef
    return p11


def decompose_legendre(phase: PhaseMatrix, mu: np.ndarray, w: np.ndarray,
                       os_nb: int, itronc: bool) -> AerosolExpansion:
    """Truncation + GSF expansion (``SOS_DECOMPO_LEGENDRE``,
    ``src/SOS_AEROSOLS.F:3924-4270``).

    ``mu``/``w``: positive Mie-grid cosines/weights ascending; phase arrays
    are on the signed axis (size 2n+1, center slot unused).
    """
    n = mu.shape[0]
    sidx = np.concatenate([np.arange(n, 0, -1) * -1, [0], np.arange(1, n + 1)])
    mu_signed = np.concatenate([-mu[::-1], [0.0], mu])
    w_signed = np.concatenate([w[::-1], [0.0], w])

    ttt = np.array(phase.p11)
    p11 = np.array(phase.p11)

    def project(p11_t):
        pl = _legendre_table(mu_signed, os_nb)
        beta11 = (pl * (w_signed * p11_t)).sum(axis=1)
        return beta11 * (2 * np.arange(os_nb + 1) + 1.0) * 0.5

    applied_tronc = bool(itronc)
    if applied_tronc:
        p11 = truncate_phase(p11, mu, w)
    beta11 = project(p11)
    if applied_tronc:
        coef_tronca = 2.0 * (1.0 - beta11[0])
        if coef_tronca < cte.PH_SEUIL_TRONCA:
            # truncation auto-cancel (:4125-4152)
            applied_tronc = False
            p11 = np.array(ttt)
            beta11 = project(p11)
            coef_tronca = 0.0
    else:
        coef_tronca = 0.0

    ratio = np.divide(p11, ttt, out=np.ones_like(p11), where=ttt != 0.0)
    pl = _legendre_table(mu_signed, os_nb)
    pol = _gsf2_table(mu_signed, os_nb)
    ll = 2 * np.arange(os_nb + 1) + 1.0

    gamma12 = (pol * (w_signed * phase.p12 * ratio)).sum(axis=1) * ll * 0.5
    beta22 = (pl * (w_signed * phase.p22 * ratio)).sum(axis=1) * ll * 0.5
    delta33 = (pl * (w_signed * phase.p33 * ratio)).sum(axis=1) * ll * 0.5

    # alpha(k), zeta(k) from beta22/delta33 (:4279-4304)
    alp, zet = alpha_zeta_from(beta22, delta33)

    z1 = beta11[0]
    piz = phase.single_scattering_albedo
    coef = coef_tronca if applied_tronc else 0.0
    # truncated-atmosphere albedo: piz' = piz(1-A/2)/(1-piz*A/2)
    # (the profile rescaling of src/SOS.F:521-543 uses piz and piztr)
    piz_tronc = piz * (1.0 - coef / 2.0) / (1.0 - piz * coef / 2.0)
    return AerosolExpansion(
        alpha=alp / z1, beta=beta11 / z1, gamma=gamma12 / z1, zeta=zet / z1,
        coef_tronca=float(coef), piz=float(piz), piz_tronc=float(piz_tronc),
        sigma_ext=float(phase.sigma_ext), sigma_sca=float(phase.sigma_sca))
