"""Loop-level NumPy transcription of the reference BRDF/BPDF Fourier
decompositions (test oracle ONLY; see fortran_ref.py preamble).

Transcribes the per-pair IS loops of ``SOS_FSF_ROUJEAN``
(``src/SOS_ROUJEAN.F:417``) and ``SOS_F21SF_NADAL``
(``src/SOS_SURFACE_BPDF.F:686``) with explicit scalar control flow.
"""

from __future__ import annotations

import numpy as np

PH_NU = 1024


def roujean_f_scalar(k0, k1, k2, c1, s1, c2, s2, phi_rj,
                     lim_s=60.0, lim_v=60.0):
    """SOS_CALC_F_ROUJEAN (src/SOS_ROUJEAN.F:891)."""
    pi = np.pi
    xphi = abs(phi_rj)
    if xphi > pi:
        xphi = 2.0 * pi - xphi
    xc1, xs1, xc2, xs2 = c1, s1, c2, s2
    if np.degrees(np.arccos(c1)) > lim_s:
        xc1 = np.cos(np.radians(lim_s))
        xs1 = np.sin(np.radians(lim_s))
    if np.degrees(np.arccos(c2)) > lim_v:
        xc2 = np.cos(np.radians(lim_v))
        xs2 = np.sin(np.radians(lim_v))
    cosphi = np.cos(xphi)
    tants = xs1 / xc1
    tantv = xs2 / xc2
    f1 = 0.5 * ((pi - xphi) * cosphi + np.sin(xphi)) * tants * tantv
    f1 = f1 - tants - tantv
    f1 = f1 - np.sqrt(tants ** 2 + tantv ** 2 - 2 * tantv * tants * cosphi)
    f1 = f1 / pi
    coszeta = xc1 * xc2 + xs1 * xs2 * cosphi
    coszeta = min(1.0, max(-1.0, coszeta))
    zeta = np.arccos(coszeta)
    f2 = 4.0 * ((pi / 2 - zeta) * coszeta + np.sin(zeta)) \
        / (3.0 * pi * (xc1 + xc2))
    f2 = f2 - 1.0 / 3.0
    return (k0 + k1 * f1 + k2 * f2) * c2 * c1


def nadal_f_scalar(ind, alpha, beta, c1, s1, c2, s2, phi):
    """SOS_CALC_F21_NADAL_SUR_FRESNEL (src/SOS_SURFACE_BPDF.F:1129)."""
    cosdif = -c1 * c2 + s1 * s2 * np.cos(phi)
    cosw = np.sqrt(0.5 * (1 - cosdif))
    v = 0.5 * (1 + cosdif)
    ind2 = ind * ind
    x = np.sqrt(ind2 - v)
    rl = (ind2 * cosw - x) / (ind2 * cosw + x)
    rr = (cosw - x) / (cosw + x)
    f21_fresnel = 0.5 * (rr * rr - rl * rl)
    f21_nadal = alpha * (1.0 - np.exp(-beta * f21_fresnel / (c1 + c2)))
    if f21_fresnel < 1.0e-10:
        f = alpha * beta / (c1 + c2)
    else:
        f = f21_nadal / f21_fresnel
    return f * (4.0 * c1 * np.pi) * c2 * c1


def fsf_pair(f_of_phios, os_max, seuil, roujean_writer):
    """One (Teta1, Teta2) pair of the Fourier loop, literal transcription
    (src/SOS_ROUJEAN.F:578-650 / src/SOS_SURFACE_BPDF.F:845-910).

    ``f_of_phios(phi_os)``: scalar weight function in the OS azimuth
    convention.  Returns (e_kept, il): e_kept are the coefficients the
    writer records (Roujean: full zero-initialized array through the last
    computed order; Nadal: only orders 0..IL).
    """
    q = np.pi / PH_NU
    u = np.array([f_of_phios(q * i) for i in range(PH_NU + 1)])
    e = np.zeros(os_max + 1)
    b1_prec = np.inf
    il = os_max
    last_computed = os_max
    for s in range(os_max + 1):
        y = 0.0
        for i in range(PH_NU + 1):
            y += u[i] * np.cos(s * i * q)
        e[s] = y * q / np.pi
        b1 = 0.0
        for i in range(PH_NU + 1):
            phi = q * i
            t1 = e[0]
            for s2 in range(1, s + 1):
                t1 += 2.0 * e[s2] * np.cos(s2 * phi)
            b1 = max(abs((t1 - u[i]) / u[i]), b1)
        if b1 <= seuil:
            il = s
            last_computed = s
            break
        if b1 >= b1_prec:
            il = s - 1
            last_computed = s
            break
        b1_prec = b1
    e_kept = e.copy()
    hi = last_computed if roujean_writer else il
    e_kept[hi + 1:] = 0.0
    return e_kept, il
