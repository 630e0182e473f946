"""Loop-level NumPy transcription of the reference SOS_TRPHI output chain.

Test oracle ONLY (same methodology as ``fortran_ref.py``: no Fortran
compiler exists in this environment, so differential testing runs against
this independent loop-level transcription of
``/root/reference/src/SOS_TRPHI.F`` instead of the compiled binary).  It is
deliberately structured like the Fortran — signed-index arrays, one azimuth
at a time, per-direction scalar loops — so that agreement with the
vectorized ``recompose`` module is strong evidence both encode the
reference algorithm.

Covers: azimuth recomposition (``SOS_TRPHI``, :908-937), the analytic
direct-reflection add-backs for glitter / flat-sea Fresnel / Roujean /
Rondeaux / Breon / Nadal / Maignan (:946-1200), the Q/U zeroing
(:1212-1218), and ``SOS_POLAR`` (:1843).
"""

from __future__ import annotations

import numpy as np

SEUIL_Z = 1.0e-10          # CTE_SEUIL_Z (inc/SOS.h)
SEUIL_X = 1.0e-10          # CTE_SEUIL_X
THRESHOLD_Q_U_NULL = 1.0e-15
SOLAR_DISC_SOLID_ANGLE = 6.8e-5
VALEUR_INDEF = -999.0


def sos_glitte(sig, c0, c1, phi):
    """SOS_GLITTE (src/SOS_TRPHI.F:1278)."""
    x1 = np.sqrt(1 - c1 ** 2) - np.cos(phi) * np.sqrt(1 - c0 ** 2)
    x2 = np.sqrt(1 - c0 ** 2) * np.sin(phi)
    x3 = c0 + c1
    c0n = x3 / np.sqrt(x1 ** 2 + x2 ** 2 + x3 ** 2)
    xxx = -(1 - c0n ** 2) / (sig * c0n ** 2)
    if xxx < -100.0:
        return 0.0
    pp = (1.0 / sig) * np.exp(xxx)
    return pp / (4.0 * c1 * c0n ** 4)


def sos_angle(c0, c1, phi):
    """SOS_ANGLE (src/SOS_TRPHI.F:1347): (coskip, cosdif)."""
    s = 1.0
    if np.sin(phi) > 0.0:
        s = -1.0
    cosdif = -c0 * c1 + np.sqrt(1 - c0 ** 2) * np.sqrt(1 - c1 ** 2) \
        * np.cos(phi)
    z = s * np.sqrt(1 - cosdif ** 2) * np.sqrt(1 - c1 * c1)
    coskip = 0.0
    if abs(z) > SEUIL_Z:
        coskip = (c1 * cosdif + c0) / z
    return coskip, cosdif


def sos_reflex(cosdif, ind):
    """SOS_REFLEX (src/SOS_TRPHI.F:1433): (r11, r12, r33)."""
    ind2 = ind * ind
    cosw = np.sqrt(0.5 * (1 - cosdif))
    v = 0.5 * (1 + cosdif)
    x = np.sqrt(ind2 - v)
    rl = (ind2 * cosw - x) / (ind2 * cosw + x)
    rr = (cosw - x) / (cosw + x)
    return (rl ** 2 + rr ** 2) / 2.0, (rl ** 2 - rr ** 2) / 2.0, rr * rl


def sos_matric(coskip, r11, r12):
    """SOS_MATRIC (src/SOS_TRPHI.F:1505): (m11, m21, m31)."""
    x = 1.0 - abs(coskip)
    c2, s2 = 1.0, 0.0
    if x >= SEUIL_X:
        c2 = 2.0 * coskip * coskip - 1.0
        s2 = 2.0 * coskip * np.sqrt(1.0 - coskip * coskip)
    if coskip == 0.0:
        r12 = 0.0
    return r11, c2 * r12, s2 * r12


def sos_calc_f_roujean(k0, k1, k2, c0, s0, c1, s1, phi):
    """SOS_CALC_F_ROUJEAN (src/SOS_ROUJEAN.F:891): f * cos(incidence)."""
    t0 = s0 / c0
    t1 = s1 / c1
    cphi = np.cos(phi)
    phin = abs(phi) % (2 * np.pi)
    if phin > np.pi:
        phin = 2 * np.pi - phin
    delta = np.sqrt(max(t0 ** 2 + t1 ** 2 - 2 * t0 * t1 * cphi, 0.0))
    f1 = (1.0 / (2.0 * np.pi)) * ((np.pi - phin) * cphi + np.sin(phin)) \
        * t0 * t1 - (1.0 / np.pi) * (t0 + t1 + delta)
    cos_xi = min(max(c0 * c1 + s0 * s1 * cphi, -1.0), 1.0)
    xi = np.arccos(cos_xi)
    f2 = (4.0 / (3.0 * np.pi)) / (c0 + c1) \
        * ((np.pi / 2.0 - xi) * cos_xi + np.sin(xi)) - 1.0 / 3.0
    return (k0 + k1 * f1 + k2 * f2) * c0


def sos_calcg_maignan(c0, c1, s12, phi, coef_c):
    """SOS_CALCG_MAIGNAN (src/SOS_TRPHI.F:1606)."""
    cosdif = -c0 * c1 + s12 * np.cos(phi)
    cosw = np.sqrt(0.5 * (1.0 - cosdif))
    sinw = np.sqrt(max(1.0 - cosw ** 2, 0.0))
    return coef_c * np.exp(-sinw / cosw)


def sos_trphi(records, nbmu, rmu, tau, tauout, phi, n0,
              igli=0, wind=0.0, ind_surf=1.34, ifresnel=0,
              iroujean=0, k0=0.0, k1=0.0, k2=0.0,
              irondeaux=0, ibreon=0,
              inadal=0, alpha_nadal=0.0, beta_nadal=0.0,
              imaignan=0, coef_c_maignan=0.0, ipolar=1):
    """SOS_TRPHI (src/SOS_TRPHI.F:749) for ONE azimuth.

    ``records``: list over IS of (q3, u3, i3), each a signed array of
    length 2*nbmu+1 (offset +nbmu) — the FICOS file records.  ``rmu``:
    signed Gauss cosines (same layout).  Returns (xit, xqt, xut, angdiff)
    signed arrays.
    """
    n = nbmu

    def s(j):
        return j + n

    size = 2 * n + 1
    xit = np.zeros(size)
    xqt = np.zeros(size)
    xut = np.zeros(size)
    angdiff = np.zeros(size)

    c0 = rmu[s(n0)]
    for j in range(-n, n + 1):
        cosdif = -c0 * rmu[s(j)] + np.sin(np.arccos(c0)) \
            * np.sin(np.arccos(rmu[s(j)])) * np.cos(phi)
        angdiff[s(j)] = np.degrees(np.arccos(min(max(cosdif, -1.0), 1.0)))

    # recomposition (:908-937)
    q3, u3, i3 = records[0]
    for j in range(-n, n + 1):
        if j == 0:
            continue
        xqt[s(j)] = q3[s(j)]
        xut[s(j)] = u3[s(j)]
        xit[s(j)] = i3[s(j)]
    for is_order in range(1, len(records)):
        q3, u3, i3 = records[is_order]
        xphi = is_order * phi
        for j in range(-n, n + 1):
            if j == 0:
                continue
            xqt[s(j)] += 2.0 * q3[s(j)] * np.cos(xphi)
            xut[s(j)] += 2.0 * u3[s(j)] * np.sin(xphi)
            xit[s(j)] += 2.0 * i3[s(j)] * np.cos(xphi)

    # glitter direct reflection (:946-1001)
    if igli == 1:
        c0 = rmu[s(n0)]
        at0 = np.exp(-tau / c0)
        sigma2 = 0.003 + 0.00512 * wind
        for j in range(1, n + 1):
            c1 = rmu[s(j)]
            atj = at0 * np.exp(-(tau - tauout) / c1)
            p = sos_glitte(sigma2, c0, c1, phi)
            coskip, cosdif = sos_angle(c0, c1, phi)
            r11, r12, _ = sos_reflex(cosdif, ind_surf)
            m11, m21, m31 = sos_matric(coskip, r11, r12)
            xit[s(j)] += m11 * atj * p
            if ipolar == 1:
                xqt[s(j)] += m21 * atj * p
                xut[s(j)] += m31 * atj * p

    # flat-sea specular sun (:1008-1039)
    if ifresnel == 1 and np.cos(phi) == 1.0 and n0 > 0:
        c0 = rmu[s(n0)]
        at0 = np.exp(-tau / c0)
        atj = at0 * np.exp(-(tau - tauout) / c0)
        cosdif = 1.0 - 2.0 * c0 * c0
        r11, r12, _ = sos_reflex(cosdif, ind_surf)
        coef_sun = np.pi / SOLAR_DISC_SOLID_ANGLE
        xit[s(n0)] += r11 * coef_sun * atj
        if ipolar == 1:
            xqt[s(n0)] += r12 * coef_sun * atj

    # Roujean (:1047-1076)
    if iroujean == 1:
        c0 = rmu[s(n0)]
        at0 = np.exp(-tau / c0)
        s0 = np.sqrt(1.0 - c0 * c0)
        for j in range(1, n + 1):
            c1 = rmu[s(j)]
            atj = at0 * np.exp(-(tau - tauout) / c1)
            s1 = np.sqrt(1.0 - c1 * c1)
            phirj = np.pi - phi
            f = sos_calc_f_roujean(k0, k1, k2, c0, s0, c1, s1, phirj)
            xit[s(j)] += atj * f / c1

    # Rondeaux / Breon / Maignan (:1084-1136)
    if irondeaux == 1 or ibreon == 1 or imaignan == 1:
        c0 = rmu[s(n0)]
        at0 = np.exp(-tau / c0)
        s0 = np.sqrt(1.0 - c0 * c0)
        for j in range(1, n + 1):
            c1 = rmu[s(j)]
            atj = at0 * np.exp(-(tau - tauout) / c1)
            coskip, cosdif = sos_angle(c0, c1, phi)
            r11, r12, _ = sos_reflex(cosdif, ind_surf)
            m11, m21, m31 = sos_matric(coskip, r11, r12)
            if irondeaux == 1:
                p = 1.0 / (4.0 * (1.0 + c1 / c0))
            if ibreon == 1:
                p = 1.0 / (4.0 * c1)
            if imaignan == 1:
                s1 = np.sqrt(1.0 - c1 * c1)
                s12 = s0 * s1
                p = sos_calcg_maignan(c0, c1, s12, phi, coef_c_maignan)
                p = p / (4.0 * c1)
            xit[s(j)] += m11 * atj * p
            if ipolar == 1:
                xqt[s(j)] += m21 * atj * p
                xut[s(j)] += m31 * atj * p

    # Nadal (:1145-1200)
    if inadal == 1:
        c0 = rmu[s(n0)]
        at0 = np.exp(-tau / c0)
        for j in range(1, n + 1):
            c1 = rmu[s(j)]
            atj = at0 * np.exp(-(tau - tauout) / c1)
            coskip, cosdif = sos_angle(c0, c1, phi)
            r11, r12, _ = sos_reflex(cosdif, ind_surf)
            m11, m21, m31 = sos_matric(coskip, r11, r12)
            f21fresnel = -r12
            f21nadal = alpha_nadal * (1.0 - np.exp(
                -beta_nadal * f21fresnel / (c0 + c1)))
            if f21fresnel < 1.0e-10:
                p = alpha_nadal * beta_nadal / (c0 + c1)
            else:
                p = f21nadal / f21fresnel
            xit[s(j)] += m11 * atj * p
            if ipolar == 1:
                xqt[s(j)] += m21 * atj * p
                xut[s(j)] += m31 * atj * p

    # zeroing thresholds (:1212-1218)
    for j in range(size):
        if xit[j] <= 1.0e-99:
            xit[j] = 0.0
        if abs(xqt[j]) < THRESHOLD_Q_U_NULL:
            xqt[j] = 0.0
        if abs(xut[j]) < THRESHOLD_Q_U_NULL:
            xut[j] = 0.0
    return xit, xqt, xut, angdiff


def sos_polar(xi, xq, xu):
    """SOS_POLAR (src/SOS_TRPHI.F:1843): (pol angle, pol rate %, Lpol)."""
    if xq != 0.0:
        xt = xu / xq
        if xq > 0.0:
            xan = 90.0 * np.arctan(xt) / np.pi
        elif xu > 0.0:
            xan = 90.0 + 90.0 * np.arctan(xt) / np.pi
        else:
            xan = -90.0 + 90.0 * np.arctan(xt) / np.pi
    else:
        if xu > 0.0:
            xan = 45.0
        elif xu < 0.0:
            xan = -45.0
        else:
            xan = VALEUR_INDEF
    lpol = np.sqrt(xq * xq + xu * xu)
    if xi != 0.0:
        tpol = 100.0 * lpol / xi
    else:
        tpol = VALEUR_INDEF
    return xan, tpol, lpol
