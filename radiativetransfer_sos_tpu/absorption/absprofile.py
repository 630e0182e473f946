"""Per-layer CKD absorption coefficients and batched tau_abs profiles.

Re-design of ``COEFF_ABS_CKD`` (``src/SOS_SUB_TRS.F:171``) and
``SOS_ABSPROFILE`` (``src/SOS_ABSPROFILE.F:184``).  The reference
recomputes the (P, T, conc) interpolation inside its 8-deep CKD loop for
every exponential tuple; here the interpolation runs ONCE per wavelength
for every (gas, exponential, layer) — a (8, nai, 49) tensor — and the
optical-depth profile of every CKD tuple is an outer SUM over that tensor:
the 8-nested loop collapses to a batch axis for the vmapped solver.
"""

from __future__ import annotations

import itertools

import numpy as np

from .. import constants as cte
from .atmospheres import GasColumns
from .ckd import CkdTables


# ---------------------------------------------------------------------------
# vectorized clamped cubic spline (SOS_SPLINE/SOS_SPLINT over the T axis)
# ---------------------------------------------------------------------------

def _spline_second_derivs(x, y):
    """Second derivatives with first-derivative end conditions equal to the
    end-segment secants (``SOS_INTERPO_SPLINT``,
    ``src/SOS_AEROSOLS.F:4880-4886`` + ``SOS_SPLINE :4952``).

    ``x``: (n,); ``y``: (..., n).  Returns (..., n).
    """
    n = x.shape[0]
    d2 = np.zeros_like(y)
    u = np.zeros_like(y)
    dy1 = (y[..., 1] - y[..., 0]) / (x[1] - x[0])
    dyn = (y[..., n - 1] - y[..., n - 2]) / (x[n - 1] - x[n - 2])
    d2[..., 0] = -0.5
    u[..., 0] = (3.0 / (x[1] - x[0])) * ((y[..., 1] - y[..., 0])
                                         / (x[1] - x[0]) - dy1)
    for k in range(1, n - 1):
        sig = (x[k] - x[k - 1]) / (x[k + 1] - x[k - 1])
        p = sig * d2[..., k - 1] + 2.0
        d2[..., k] = (sig - 1.0) / p
        u[..., k] = (6.0 * ((y[..., k + 1] - y[..., k]) / (x[k + 1] - x[k])
                            - (y[..., k] - y[..., k - 1]) / (x[k] - x[k - 1]))
                     / (x[k + 1] - x[k - 1]) - sig * u[..., k - 1]) / p
    qn = 0.5
    un = (3.0 / (x[n - 1] - x[n - 2])) * (dyn - (y[..., n - 1]
                                                 - y[..., n - 2])
                                          / (x[n - 1] - x[n - 2]))
    d2[..., n - 1] = (un - qn * u[..., n - 2]) / (qn * d2[..., n - 2] + 1.0)
    for k in range(n - 2, -1, -1):
        d2[..., k] = d2[..., k] * d2[..., k + 1] + u[..., k]
    return d2


def _splint(x, y, d2, xv):
    """Cubic-spline evaluation at ``xv`` (..., broadcast against y[..., n])."""
    klo = np.clip(np.searchsorted(x, xv, side="right") - 1, 0, x.shape[0] - 2)
    khi = klo + 1
    h = x[khi] - x[klo]
    a = (x[khi] - xv) / h
    b = (xv - x[klo]) / h
    ylo = np.take_along_axis(y, np.broadcast_to(klo, y[..., 0].shape)[
        ..., None], axis=-1)[..., 0]
    yhi = np.take_along_axis(y, np.broadcast_to(khi, y[..., 0].shape)[
        ..., None], axis=-1)[..., 0]
    d2lo = np.take_along_axis(d2, np.broadcast_to(klo, y[..., 0].shape)[
        ..., None], axis=-1)[..., 0]
    d2hi = np.take_along_axis(d2, np.broadcast_to(khi, y[..., 0].shape)[
        ..., None], axis=-1)[..., 0]
    return (a * ylo + b * yhi
            + ((a ** 3 - a) * d2lo + (b ** 3 - b) * d2hi) * h * h / 6.0)


# ---------------------------------------------------------------------------
# ki(P_layer, T_layer, conc_layer) for every gas and exponential
# ---------------------------------------------------------------------------

def ki_per_layer(tables: CkdTables, lamb: int, cols: GasColumns):
    """(8, nai_max, nlayers) absorption cross sections (cm^2/particle).

    Exactly ``COEFF_ABS_CKD`` per layer: clamp T/conc into the table range,
    ki = 0 where layer pressure <= first table pressure, linear
    interpolation in H2O mole fraction then pressure, cubic spline in T
    with a linear-interpolation fallback wherever the spline goes negative
    (``src/SOS_SUB_TRS.F:252-336``).  Layers are ordered TOA -> ground
    (the SOS_ABSPROFILE loop order, ``src/SOS_ABSPROFILE.F:317``).
    """
    nlev = cols.p.shape[0]
    # layer means, TOA -> ground (level j=NLEVEL-J descending)
    p_asc = 0.5 * (cols.p[:-1] + cols.p[1:])
    t_asc = 0.5 * (cols.t[:-1] + cols.t[1:])
    c_asc = 0.5 * (cols.h2o_ppmv[:-1] + cols.h2o_ppmv[1:]) * 1.0e-6
    prs = p_asc[::-1].copy()
    tmp = t_asc[::-1].copy()
    conc = c_asc[::-1].copy()

    tt, pp, cc = tables.temps, tables.pres, tables.conc_h2o
    nt, npres, nc = tt.shape[0], pp.shape[0], cc.shape[0]

    tmp_c = np.clip(tmp, tt[0], tt[-1])
    zero_p = prs <= pp[0]
    prs_c = np.clip(prs, pp[0], pp[-1])
    conc_c = np.clip(conc, cc[0], cc[-1]) if nc > 1 else conc

    nai_max = tables.ai.shape[0]
    nlay = nlev - 1
    xki = np.zeros((8, nai_max, nlay, nt))

    # pressure bracketing (common to all gases)
    ip_lo = np.clip(np.searchsorted(pp[:npres], prs_c, side="right") - 1,
                    0, npres - 2)
    wp = (prs_c - pp[ip_lo]) / (pp[ip_lo + 1] - pp[ip_lo])

    # H2O: conc interpolation first
    ic_lo = np.clip(np.searchsorted(cc[:nc], conc_c, side="right") - 1,
                    0, max(nc - 2, 0))
    wc = (conc_c - cc[ic_lo]) / (cc[ic_lo + 1] - cc[ic_lo])
    kih = tables.ki_h2o[:nt, :npres, :nc, :, lamb]   # (nt, np, nc, nai)
    k_lo = kih[:, :, ic_lo, :]                   # (nt, np, nlay, nai)
    k_hi = kih[:, :, ic_lo + 1, :]
    k_c = k_lo + (k_hi - k_lo) * wc[None, None, :, None]
    k_cp_lo = np.take_along_axis(
        k_c, ip_lo[None, None, :, None], axis=1)[:, 0]        # (nt, nlay, nai)
    k_cp_hi = np.take_along_axis(
        k_c, (ip_lo + 1)[None, None, :, None], axis=1)[:, 0]
    k_p = k_cp_lo + (k_cp_hi - k_cp_lo) * wp[None, :, None]
    xki[0] = k_p.transpose(2, 1, 0)              # (nai, nlay, nt)

    # other gases: pressure interpolation only
    kio = tables.ki[:nt, :npres, :, 1:, lamb]    # (nt, np, nai, 7)
    kp_lo = kio[:, ip_lo]                        # (nt, nlay, nai, 7)
    kp_hi = kio[:, ip_lo + 1]
    k_p = kp_lo + (kp_hi - kp_lo) * wp[None, :, None, None]
    xki[1:] = k_p.transpose(3, 2, 1, 0)          # (7, nai, nlay, nt)

    # spline in T, linear fallback where negative
    d2 = _spline_second_derivs(tt[:nt], xki)
    xk = _splint(tt[:nt], xki, d2, np.broadcast_to(
        tmp_c, xki[..., 0].shape))
    neg = xk < 0.0
    if np.any(neg):
        it_lo = np.clip(np.searchsorted(tt[:nt], tmp_c, side="right") - 1,
                        0, nt - 2)
        wt = (tmp_c - tt[it_lo]) / (tt[it_lo + 1] - tt[it_lo])
        lay = np.arange(nlay)
        lin = (xki[..., lay, it_lo[lay]]
               + (xki[..., lay, it_lo[lay] + 1]
                  - xki[..., lay, it_lo[lay]]) * wt)
        xk = np.where(neg, lin, xk)
        if np.any(xk < 0.0):
            raise ValueError("negative CKD ki after linear fallback "
                             "(reference error exit COEFF_ABS_CKD:923)")
    xk = np.where(zero_p[None, None, :], 0.0, xk)
    return xk


# ---------------------------------------------------------------------------
# tau_abs for all CKD exponential tuples (the batch axis)
# ---------------------------------------------------------------------------

def aik_weights(tables: CkdTables, lamb: int):
    """(terms, 8) index tuples and normalized AIK weights
    (``src/SOS_PROC.F:3381-3414,3481-3487``)."""
    nexp = tables.nexp[:, lamb]
    idx = np.array(list(itertools.product(*[range(n) for n in nexp])),
                   dtype=np.int64)
    ai = tables.ai[:, :, lamb]                  # (nai, 8)
    aik = np.prod(ai[idx, np.arange(8)], axis=1)
    s = aik.sum()
    if abs(s - 1.0) >= cte.GAP_TOLER_SUM_RATES:
        raise ValueError(f"sum of CKD AIK weights = {s}, expected ~1 "
                         "(reference error exit SOS_PROC:3414)")
    return idx, aik / s


def tau_abs_all_terms(tables: CkdTables, lamb: int, cols: GasColumns):
    """Cumulative tau_abs(level) for every CKD tuple, plus AIK weights.

    Returns (tau, aik): ``tau`` (terms, 50) TOA -> ground cumulative
    optical depth (tau[.,0] = 0), capped at CTE_TAUABS_MAX where the
    transmission underflows (``src/SOS_ABSPROFILE.F:350-358``);
    ``aik`` (terms,) normalized weights.
    """
    xk = ki_per_layer(tables, lamb, cols)       # (8, nai, nlay) TOA->ground
    ro_desc = cols.ro[:, ::-1]                  # layers TOA -> ground
    tau_gas = xk * ro_desc[:, None, :]          # (8, nai, nlay)

    idx, aik = aik_weights(tables, lamb)
    # tau_layer for tuple = sum_g tau_gas[g, idx_g, :]
    tau_layer = tau_gas[np.arange(8)[None, :], idx, :].sum(axis=1)
    tau = np.concatenate([np.zeros((tau_layer.shape[0], 1)),
                          np.cumsum(tau_layer, axis=1)], axis=1)
    trans = np.exp(-tau)
    tau = np.where(trans > 0.0, tau, cte.TAUABS_MAX)
    return tau, aik


def tau_abs_mode2(tables: CkdTables, lamb: int, cols: GasColumns):
    """Mode-2 effective profile: transmission-weighted CKD average
    tau(level) = -ln(sum_k AIK_k exp(-tau_k)) clipped at 0
    (``src/SOS_PROC.F:3657-3676``).  Returns (tau, aik_sum=1)."""
    tau_all, aik = tau_abs_all_terms(tables, lamb, cols)
    trs = (aik[:, None] * np.exp(-tau_all)).sum(axis=0)
    return np.maximum(-np.log(trs), 0.0)
