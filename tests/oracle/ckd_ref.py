"""Loop-level NumPy transcription of the reference CKD interpolation and
absorption-profile computation (test oracle ONLY; see fortran_ref.py).

Transcribes ``COEFF_ABS_CKD`` (``src/SOS_SUB_TRS.F:171``),
``SOS_INTERPO_SPLINT``/``SOS_SPLINE``/``SOS_SPLINT``
(``src/SOS_AEROSOLS.F:4822-5105``) and the layer loop of
``SOS_ABSPROFILE`` (``src/SOS_ABSPROFILE.F:310-360``) with scalar
control flow.
"""

from __future__ import annotations

import numpy as np

TAUABS_MAX = 999.0


def spline(x, y, dy1, dyn):
    n = len(x)
    d2 = np.zeros(n)
    u = np.zeros(n)
    d2[0] = -0.5
    u[0] = (3.0 / (x[1] - x[0])) * ((y[1] - y[0]) / (x[1] - x[0]) - dy1)
    for k in range(1, n - 1):
        sig = (x[k] - x[k - 1]) / (x[k + 1] - x[k - 1])
        p = sig * d2[k - 1] + 2.0
        d2[k] = (sig - 1.0) / p
        u[k] = (6.0 * ((y[k + 1] - y[k]) / (x[k + 1] - x[k])
                       - (y[k] - y[k - 1]) / (x[k] - x[k - 1]))
                / (x[k + 1] - x[k - 1]) - sig * u[k - 1]) / p
    qn = 0.5
    un = (3.0 / (x[n - 1] - x[n - 2])) * (dyn - (y[n - 1] - y[n - 2])
                                          / (x[n - 1] - x[n - 2]))
    d2[n - 1] = (un - qn * u[n - 2]) / (qn * d2[n - 2] + 1.0)
    for k in range(n - 2, -1, -1):
        d2[k] = d2[k] * d2[k + 1] + u[k]
    return d2


def splint(x, y, d2, xv):
    klo, khi = 0, len(x) - 1
    while khi - klo > 1:
        k = (khi + klo) // 2
        if x[k] > xv:
            khi = k
        else:
            klo = k
    h = x[khi] - x[klo]
    a = (x[khi] - xv) / h
    b = (xv - x[klo]) / h
    return (a * y[klo] + b * y[khi]
            + ((a ** 3 - a) * d2[klo] + (b ** 3 - b) * d2[khi]) * h * h / 6.0)


def interpo_splint(xin, yin, xv):
    dy1 = (yin[1] - yin[0]) / (xin[1] - xin[0])
    dyn = (yin[-1] - yin[-2]) / (xin[-1] - xin[-2])
    d2 = spline(xin, yin, dy1, dyn)
    return splint(xin, yin, d2, xv)


def lin(y1, y2, x1, x2, x):
    return y1 + (y2 - y1) * (x - x1) / (x2 - x1)


def coeff_abs_ckd(nabs, lamb, ik, prs, tmp, conc_h2o,
                  tab_pres, tab_temp, tab_conc, ki, ki_h2o):
    """COEFF_ABS_CKD for one (gas nabs 1-based, band lamb 0-based, exp ik).

    ``ki``: (nt, np, nai, 8, nwvl); ``ki_h2o``: (nt, np, nc, nai, nwvl).
    """
    nt, npres, nc = len(tab_temp), len(tab_pres), len(tab_conc)
    tmp = min(max(tmp, tab_temp[0]), tab_temp[-1])
    if prs <= tab_pres[0]:
        return 0.0
    prs = min(prs, tab_pres[-1])
    conc_h2o = min(max(conc_h2o, tab_conc[0]), tab_conc[-1])

    ip = 0
    while tab_pres[ip] <= prs and ip < npres - 1:
        ip += 1
    ip -= 1
    if ip < 0:
        ip = 0
    if ip > npres - 2:
        ip = npres - 2

    xki = np.zeros(nt)
    if nabs == 1:
        ic = 0
        while tab_conc[ic] <= conc_h2o and ic < nc - 1:
            ic += 1
        ic -= 1
        ic = min(max(ic, 0), nc - 2)
        xki_h2o = np.zeros((nt, npres))
        for jp in range(npres):
            for it in range(nt):
                xki_h2o[it, jp] = lin(ki_h2o[it, jp, ic, ik, lamb],
                                      ki_h2o[it, jp, ic + 1, ik, lamb],
                                      tab_conc[ic], tab_conc[ic + 1],
                                      conc_h2o)
        for it in range(nt):
            xki[it] = lin(xki_h2o[it, ip], xki_h2o[it, ip + 1],
                          tab_pres[ip], tab_pres[ip + 1], prs)
    else:
        for it in range(nt):
            xki[it] = lin(ki[it, ip, ik, nabs - 1, lamb],
                          ki[it, ip + 1, ik, nabs - 1, lamb],
                          tab_pres[ip], tab_pres[ip + 1], prs)

    xk = interpo_splint(tab_temp, xki, tmp)
    if xk < 0.0:
        it = 0
        while tab_temp[it] <= tmp and it < nt - 1:
            it += 1
        it -= 1
        it = min(max(it, 0), nt - 2)
        xk = lin(xki[it], xki[it + 1], tab_temp[it], tab_temp[it + 1], tmp)
        assert xk >= 0.0
    return xk


def absprofile(lamb, iks, userprofil_p, userprofil_t, userprofil_h2o_ppmv,
               ro, nexp, tab_pres, tab_temp, tab_conc, ki, ki_h2o):
    """SOS_ABSPROFILE layer loop.  ``iks``: 8 zero-based exp indices.
    ``ro``: (8, 49) ground-based layers.  Returns tau(50) TOA -> ground."""
    nlevel = len(userprofil_p)
    tau = np.zeros(nlevel)
    trs = 1.0
    for j in range(1, nlevel):          # layer j: levels (nlevel-j-1, nlevel-j)
        prs = (userprofil_p[nlevel - j - 1] + userprofil_p[nlevel - j]) / 2.0
        tmp = (userprofil_t[nlevel - j - 1] + userprofil_t[nlevel - j]) / 2.0
        conc = (userprofil_h2o_ppmv[nlevel - j - 1]
                + userprofil_h2o_ppmv[nlevel - j]) / 2.0 * 1.0e-6
        t1c = 0.0
        for k in range(8):
            if nexp[k, lamb] >= 1:
                xk = coeff_abs_ckd(k + 1, lamb, iks[k], prs, tmp, conc,
                                   tab_pres, tab_temp, tab_conc, ki, ki_h2o)
            else:
                xk = 0.0
            t1c += xk * ro[k, nlevel - j - 1]
        trs *= np.exp(-t1c)
        tau[j] = -np.log(trs) if trs > 0.0 else TAUABS_MAX
    return tau
