"""WMO and Shettle & Fenn multi-component aerosol models (IMOD 1 / 2).

Data-driven mixtures of Mie components, re-designed from the reference's
``SOS_INIT_PARAMWMO`` (``src/SOS_AEROSOLS.F:3334``), ``SOS_INIT_PARAMSF``
(``:3557``) and the IMOD=1/2 branches (``:1312-1709``).  The ASCII
micro-physics tables ship with the reference data tree
(``fic/Data_WMO_cor_2015_12_16``, ``fic/Data_SF_cor_2015_12_16``,
``fic/IRefrac_{SR,LR,SU,LU,OM}*``) and are located via ``$SOS_ABS_ROOT``
like the CKD tables.  Each component is one vectorized Mie sweep +
log-normal granulometry integration; the mixture is a number-density
weighted combination (here a single :func:`mix_phase_matrices` call instead
of the reference's streaming accumulations ``src/SOS_AEROSOLS.F:1480-1496``).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from . import constants as cte
from .absorption.atmospheres import data_root
from .aerosols import PhaseMatrix, integrate_granulometry, mix_phase_matrices
from .mie import run_mie_sweep_cached as run_mie_sweep

_DATA_WMO = "Data_WMO_cor_2015_12_16"
_DATA_SF = "Data_SF_cor_2015_12_16"
_IREFRAC_SF = ("IRefrac_SR_cor_2015_12_16", "IRefrac_LR",
               "IRefrac_SU_cor_2015_12_16", "IRefrac_LU_cor_2015_12_16",
               "IRefrac_OM_cor_2015_12_16")

#: volume mixing ratios of the 3 standard WMO models over (DL, WS, OC, SO)
#: (``src/SOS_AEROSOLS.F:1341-1356``)
WMO_VOLUME_MIX = {
    1: np.array([0.70, 0.29, 0.00, 0.01]),   # continental
    2: np.array([0.00, 0.05, 0.95, 0.00]),   # maritime
    3: np.array([0.17, 0.61, 0.00, 0.22]),   # urban
}

#: max Mie size parameter per WMO component (``inc/SOS.h:122-125``)
WMO_ALPHA_MAX = np.array([cte.ALPHAMAX_WMO_DL, cte.ALPHAMAX_WMO_WS,
                          cte.ALPHAMAX_WMO_OC, cte.ALPHAMAX_WMO_SO])

#: number densities of the 4 standard S&F models over
#: (small rural, large rural, small urban, large urban, oceanic)
#: (``src/SOS_AEROSOLS.F:1539-1556``)
SF_NUMBER_MIX = {
    1: np.array([1.0, 0.0, 0.0, 0.0, 0.0]),           # tropospheric
    2: np.array([0.0, 0.0, 0.999875, 0.000125, 0.0]),  # urban
    3: np.array([0.99, 0.0, 0.0, 0.0, 0.01]),          # maritime
    4: np.array([0.995, 0.0, 0.0, 0.0, 0.005]),        # coastal
}


def _interp_rows(table: np.ndarray, x: float) -> np.ndarray:
    """Linear interpolation of row values at coordinate ``x`` (first column
    ascending) — the streaming bracket search of ``SOS_INTERPOL`` callers."""
    xs = table[:, 0]
    return np.array([np.interp(x, xs, table[:, c])
                     for c in range(1, table.shape[1])])


def _round_index(mr: np.ndarray, mi: np.ndarray):
    """Reference rounds the interpolated index to its file formats F5.3 /
    F8.5 (``src/SOS_AEROSOLS.F:3436-3439, 3779-3781``)."""
    mr = np.round(mr * 1000.0) / 1000.0
    mi = -np.round(-mi * 100000.0) / 100000.0
    return mr, mi


@dataclasses.dataclass(frozen=True)
class WmoParams:
    rm: np.ndarray      # (4,) modal radii (micron)
    var: np.ndarray     # (4,) LND variance ln(10)*log10-var
    vol: np.ndarray     # (4,) volume of one particle of each component
    mr: np.ndarray      # (4,) real refractive index at wavelength
    mi: np.ndarray      # (4,) imaginary index (negative, absorbing)


def load_wmo_params(wavelength: float, root: str | None = None) -> WmoParams:
    """Parse ``Data_WMO`` and interpolate the indices to ``wavelength``
    (``SOS_INIT_PARAMWMO``, ``src/SOS_AEROSOLS.F:3334-3480``)."""
    path = os.path.join(root or data_root(), _DATA_WMO)
    with open(path) as f:
        rm = np.array([float(v) for v in f.readline().split()])
        log_var = np.array([float(v) for v in f.readline().split()])
        vol = np.array([float(v) for v in f.readline().split()])
        rows = np.array([[float(v) for v in line.split()]
                         for line in f if line.strip()])
    idx = _interp_rows(rows, wavelength).reshape(4, 2)
    mr, mi = _round_index(idx[:, 0], idx[:, 1])
    return WmoParams(rm=rm, var=log_var * np.log(10.0), vol=vol,
                     mr=mr, mi=mi)


@dataclasses.dataclass(frozen=True)
class SfParams:
    rm: np.ndarray      # (5,) modal radii at RH (micron)
    var: np.ndarray     # (5,) LND variances
    mr: np.ndarray      # (5,) real index at (wavelength, RH)
    mi: np.ndarray      # (5,)


def load_sf_params(wavelength: float, rh: float,
                   root: str | None = None) -> SfParams:
    """Parse ``Data_SF`` + the five ``IRefrac_*`` tables; bilinear
    (wavelength, RH) interpolation (``SOS_INIT_PARAMSF``,
    ``src/SOS_AEROSOLS.F:3557-3800``)."""
    root = root or data_root()
    with open(os.path.join(root, _DATA_SF)) as f:
        log_var = np.array([float(v) for v in f.readline().split()])
        rows = np.array([[float(v) for v in line.split()]
                         for line in f if line.strip()])
    rh_grid = rows[:, 0]
    rm = np.array([np.interp(rh, rh_grid, rows[:, 1 + i]) for i in range(5)])

    mr = np.zeros(5)
    mi = np.zeros(5)
    for i, name in enumerate(_IREFRAC_SF):
        tab = np.loadtxt(os.path.join(root, name))
        wa_grid = tab[:, 0]
        # columns 1+2h / 2+2h = (MR, MI) at rh_grid[h]
        mr_wa = np.array([np.interp(wavelength, wa_grid, tab[:, 1 + 2 * h])
                          for h in range(rh_grid.shape[0])])
        mi_wa = np.array([np.interp(wavelength, wa_grid, tab[:, 2 + 2 * h])
                          for h in range(rh_grid.shape[0])])
        mr[i] = np.interp(rh, rh_grid, mr_wa)
        mi[i] = np.interp(rh, rh_grid, mi_wa)
    mr, mi = _round_index(mr, mi)
    return SfParams(rm=rm, var=log_var * np.log(10.0), mr=mr, mi=mi)


def _sf_alpha_max(i: int, rm: float, var: float, wavelength: float) -> float:
    """Per-component max size parameter (``src/SOS_AEROSOLS.F:1586-1595``):
    fixed for the small rural/urban modes, n(r)/Nmax-cut otherwise."""
    if i == 0:
        return cte.ALPHAMAX_SF_SR
    if i == 2:
        return cte.ALPHAMAX_SF_SU
    rmax = rm * np.exp(var * var) * np.exp(
        var * np.sqrt(-2.0 * np.log(cte.COEF_NRMAX)))
    return float(100 + 100 * np.floor(2.0 * np.pi * rmax
                                      / (100.0 * wavelength)))


def wmo_phase_matrix(mie_grid_mu_signed: np.ndarray, wavelength: float,
                     wmo_model: int, user_volumes: np.ndarray | None = None,
                     root: str | None = None,
                     alpha_cap: float | None = None) -> PhaseMatrix:
    """Size-integrated phase matrix of a WMO mixture.

    ``user_volumes``: (DL, WS, OC, SO) volume fractions for model 4.
    ``alpha_cap`` optionally bounds the per-component Mie sweep (testing).
    """
    p = load_wmo_params(wavelength, root)
    if wmo_model == 4:
        if user_volumes is None:
            raise ValueError("WMO model 4 requires user volume fractions")
        c = np.asarray(user_volumes, dtype=np.float64)
        if c.max() > 1.0:           # tolerate percentage input
            c = c / 100.0
    else:
        c = WMO_VOLUME_MIX[wmo_model]
    n = np.where(c > 0.0, c / p.vol, 0.0)    # number densities (:1370-1373)

    comps, weights = [], []
    for i in range(4):
        if n[i] == 0.0:
            continue
        a_max = WMO_ALPHA_MAX[i]
        if alpha_cap is not None:
            a_max = min(a_max, alpha_cap)
        mie = run_mie_sweep(mie_grid_mu_signed, p.mr[i], p.mi[i],
                            cte.MIE_ALPHAMIN, float(a_max))
        comps.append(integrate_granulometry(mie, 1, p.rm[i], p.var[i], 0.0,
                                            wavelength))
        weights.append(n[i])
    return mix_phase_matrices(comps, np.asarray(weights))


def sf_phase_matrix(mie_grid_mu_signed: np.ndarray, wavelength: float,
                    sf_model: int, rh: float, root: str | None = None,
                    alpha_cap: float | None = None) -> PhaseMatrix:
    """Size-integrated phase matrix of a Shettle & Fenn mixture at relative
    humidity ``rh`` (%)."""
    p = load_sf_params(wavelength, rh, root)
    n = SF_NUMBER_MIX[sf_model]
    comps, weights = [], []
    for i in range(5):
        if n[i] == 0.0:
            continue
        a_max = _sf_alpha_max(i, p.rm[i], p.var[i], wavelength)
        if alpha_cap is not None:
            a_max = min(a_max, alpha_cap)
        mie = run_mie_sweep(mie_grid_mu_signed, p.mr[i], p.mi[i],
                            cte.MIE_ALPHAMIN, float(a_max))
        comps.append(integrate_granulometry(mie, 1, p.rm[i], p.var[i], 0.0,
                                            wavelength))
        weights.append(n[i])
    return mix_phase_matrices(comps, np.asarray(weights))
