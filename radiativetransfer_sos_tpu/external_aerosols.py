"""User-supplied external phase functions (IMOD=4) and model mixtures (IMOD=5).

Reference: the IMOD=4 branch of ``SOS_AEROSOLS`` reads a header-tagged ASCII
file — extinction coefficient, scattering coefficient, angle count, then
rows ``angle(deg)  F11  -F12/F11  F22/F11  F33/F11`` — and cubic-spline
resamples each matrix element onto the Mie angle grid
(``src/SOS_AEROSOLS.F:2143-2260``, spline ``SOS_INTERPO_SPLINT :4822``).
"""

from __future__ import annotations

import numpy as np

from .absorption.absprofile import _spline_second_derivs
from .aerosols import PhaseMatrix


def parse_external_file(path: str):
    """(kmat1, kmat2, ang_deg, f11, f12, f22, f33) from the user file.

    Header lines carry the value after the last ``:``
    (``src/SOS_AEROSOLS.F:2150-2162``); the ratio columns are converted to
    absolute elements ``F12 = -(−F12/F11)·F11`` etc. (``:2200-2206``).
    """
    with open(path) as f:
        kmat1 = float(f.readline().rsplit(":", 1)[1])
        kmat2 = float(f.readline().rsplit(":", 1)[1])
        n = int(f.readline().rsplit(":", 1)[1])
        f.readline()                                  # column header
        rows = np.array([[float(v) for v in f.readline().split()]
                         for _ in range(n)])
    ang = rows[:, 0]
    f11 = rows[:, 1]
    f12 = -rows[:, 2] * f11
    f22 = rows[:, 3] * f11
    f33 = rows[:, 4] * f11
    return kmat1, kmat2, ang, f11, f12, f22, f33


def spline_resample(mu_src: np.ndarray, y: np.ndarray,
                    mu_dst: np.ndarray) -> np.ndarray:
    """Natural-ish cubic spline (secant end conditions) resampling — the
    ``SOS_INTERPO_SPLINT`` scheme shared with the CKD T-interpolation."""
    order = np.argsort(mu_src)
    x = mu_src[order]
    yy = y[order]
    d2 = _spline_second_derivs(x, yy)
    klo = np.clip(np.searchsorted(x, mu_dst, side="right") - 1, 0,
                  x.shape[0] - 2)
    khi = klo + 1
    h = x[khi] - x[klo]
    a = (x[khi] - mu_dst) / h
    b = (mu_dst - x[klo]) / h
    return (a * yy[klo] + b * yy[khi]
            + ((a ** 3 - a) * d2[klo] + (b ** 3 - b) * d2[khi]) * h * h / 6.0)


def external_phase_matrix(path: str, mie_grid) -> PhaseMatrix:
    """PhaseMatrix on the signed Mie axis from a user external-data file."""
    kmat1, kmat2, ang, f11, f12, f22, f33 = parse_external_file(path)
    mu_src = np.cos(np.radians(ang))
    mu_dst = np.concatenate([-mie_grid.mu[::-1], [0.0], mie_grid.mu])
    vals = [spline_resample(mu_src, f, mu_dst) for f in (f11, f12, f22, f33)]
    return PhaseMatrix(p11=vals[0], p12=vals[1], p22=vals[2], p33=vals[3],
                       sigma_ext=np.float64(kmat1), sigma_sca=np.float64(kmat2),
                       nb_particles=1.0)


# ---------------------------------------------------------------------------
# IMOD=5: user-defined mixture of LND/Junge modes
# ---------------------------------------------------------------------------

import dataclasses

from . import constants as cte
from .aerosols import integrate_granulometry, mix_phase_matrices
from .mie import run_mie_sweep_cached as run_mie_sweep


@dataclasses.dataclass(frozen=True)
class MixtureMode:
    """One mode of a -AER.DefMixture file (``src/SOS_AEROSOLS.F:2296-2390``).

    ``p1/p2/p3``: LND (modal radius, sigma, -) or Junge (rmin, slope, rmax),
    matching the MEL_MODEL_PARAM slot layout.
    """
    sdtype: int                 # 1 = LND, 2 = JUNGE
    p1: float
    p2: float
    p3: float
    mr_wa: float
    mi_wa: float
    mr_waref: float
    mi_waref: float
    aot_ratio: float            # AOT fraction of this mode at waref


def parse_mixture_file(path: str) -> list[MixtureMode]:
    """Header-tagged ``label : value`` lines, one block per mode."""
    with open(path) as f:
        val = lambda: f.readline().rsplit(":", 1)[1].strip()
        n = int(val())
        modes = []
        for _ in range(n):
            kind = val().split()[0].upper()
            if kind == "LND":
                p1, p2, p3 = float(val()), float(val()), 0.0
                sdtype = 1
            elif kind == "JUNGE":
                p2 = float(val())            # slope first in the file
                p1 = float(val())            # min radius
                p3 = float(val())            # max radius
                sdtype = 2
            else:
                raise ValueError(f"unknown mixture mode type {kind!r}")
            mr_wa, mi_wa = float(val()), float(val())
            mr_ref, mi_ref = float(val()), float(val())
            ratio = float(val())
            modes.append(MixtureMode(sdtype, p1, p2, p3, mr_wa, mi_wa,
                                     mr_ref, mi_ref, ratio))
    tot = sum(m.aot_ratio for m in modes)
    if abs(tot - 1.0) > cte.GAP_TOLER_SUM_RATES:
        raise ValueError(f"mixture AOT ratios sum to {tot}, not 1 "
                         "(CTE_GAP_TOLER_SUM_RATES)")
    if tot != 1.0:               # renormalize exactly (:2455-2470)
        modes = [dataclasses.replace(m, aot_ratio=m.aot_ratio / tot)
                 for m in modes]
    return modes


def _mode_alpha_max(m: MixtureMode, alpha_cap=None) -> float:
    """ALPHAF from the n(r)/Nmax radius cut, evaluated at CTE_WAMIN
    (``src/SOS_AEROSOLS.F:2503-2515``)."""
    if m.sdtype == 1:
        x = m.p2
        rmax = m.p1 * np.exp(x * x) * np.exp(
            x * np.sqrt(-2.0 * np.log(cte.COEF_NRMAX)))
    else:
        rmax = m.p3
    a = float(100 + 100 * np.floor(2.0 * np.pi * rmax / (100.0 * cte.WAMIN)))
    return min(a, alpha_cap) if alpha_cap else a


def mixture_phase_matrices(mu_signed: np.ndarray, wavelength: float,
                           waref: float, ta_waref: float,
                           modes: list[MixtureMode], alpha_cap=None):
    """(pm_sim, pm_ref): mixture phase matrices at the simulation and AOT
    reference wavelengths with shared mode weights.

    Mode weights are extinction-derived at waref:
    ``coef_alpha = ratio*TA/sigma_ext_waref`` normalized
    (``src/SOS_AEROSOLS.F:2566-2580``), then applied as number densities in
    the wasimu mixing loop (``:2590-2660``).
    """
    def granu(m: MixtureMode, wa: float, mr: float, mi: float):
        mie = run_mie_sweep(mu_signed, mr, mi, cte.MIE_ALPHAMIN,
                            _mode_alpha_max(m, alpha_cap))
        return integrate_granulometry(mie, m.sdtype, m.p1, m.p2, m.p3, wa)

    ref = [granu(m, waref, m.mr_waref, m.mi_waref) for m in modes]
    coef = np.array([m.aot_ratio * ta_waref / r.sigma_ext
                     for m, r in zip(modes, ref)])
    coef = coef / coef.sum()
    sim = [granu(m, wavelength, m.mr_wa, m.mi_wa) for m in modes]
    return (mix_phase_matrices(sim, coef), mix_phase_matrices(ref, coef))
