"""Loop-level NumPy transcription of the reference SOS_OS solver.

Test oracle ONLY.  This module re-implements, with explicit Fortran-shaped
loops and signed-index arrays, the algorithm of ``/root/reference/src/SOS_OS.F``
(no Fortran compiler is available in this environment, so differential testing
runs against this independent transcription instead of the compiled binary).
It is deliberately structured like the Fortran — dictionaries indexed by
signed mu index, per-IS sequential loops, GOTO-shaped control flow — so that
an agreement between this and the vectorized JAX implementation is strong
evidence both encode the reference algorithm.

Reference citations are given per routine.
"""

from __future__ import annotations

import numpy as np

SEUIL_CV_SG = 1.0e-5
SEUIL_SUMDIF = 1.0e-5
SEUIL_VALDIF = 1.0e-50
SEUIL_SF = 1.0e-5


def sos_noyaux(is_order, nbmu, rmu, os_nb, alpha, beta, gamma, zeta):
    """SOS_NOYAUX (src/SOS_OS.F:1857): GSF recurrence + kernel sums.

    ``rmu``: dict-like array indexed -nbmu..nbmu (we use offset arrays).
    Returns (xpl, xrl, xtl, bp, gr, gt, arr, art, att) with signed index
    helpers: arr2[i, j] means index (i + nbmu, j + nbmu).
    """
    n = nbmu
    size = 2 * n + 1

    def sidx(j):
        return j + n

    psl = np.zeros((os_nb + 2, size))
    rsl = np.zeros((os_nb + 2, size))
    tsl = np.zeros((os_nb + 2, size))
    rac3 = np.sqrt(3.0)
    x26 = 2.0 * np.sqrt(6.0)

    if is_order == 0:                               # :1970-1993
        for j in range(0, n + 1):
            c = rmu[sidx(j)]
            psl[0, sidx(-j)] = 1.0
            psl[0, sidx(j)] = 1.0
            psl[1, sidx(j)] = c
            psl[1, sidx(-j)] = -c
            x = (3.0 * c * c - 1.0) * 0.5
            psl[2, sidx(-j)] = x
            psl[2, sidx(j)] = x
            rsl[1, sidx(j)] = 0.0
            rsl[1, sidx(-j)] = 0.0
            x = 3.0 * (1.0 - c * c) / x26
            rsl[2, sidx(-j)] = x
            rsl[2, sidx(j)] = x
        psl[1, sidx(0)] = rmu[sidx(0)]
        rsl[1, sidx(0)] = 0.0
        k = 2
    elif is_order == 1:                             # :1997-2023
        for j in range(0, n + 1):
            c = rmu[sidx(j)]
            x = 1.0 - c * c
            psl[0, sidx(j)] = 0.0
            psl[0, sidx(-j)] = 0.0
            psl[1, sidx(-j)] = np.sqrt(x * 0.5)
            psl[1, sidx(j)] = np.sqrt(x * 0.5)
            psl[2, sidx(j)] = c * psl[1, sidx(j)] * rac3
            psl[2, sidx(-j)] = -psl[2, sidx(j)]
            rsl[2, sidx(j)] = -c * np.sqrt(x) * 0.5
            rsl[2, sidx(-j)] = -rsl[2, sidx(j)]
            tsl[2, sidx(j)] = -np.sqrt(x) * 0.5
            tsl[2, sidx(-j)] = -np.sqrt(x) * 0.5
        psl[2, sidx(0)] = -psl[2, sidx(0)]
        rsl[2, sidx(0)] = -rsl[2, sidx(0)]
        rsl[1, sidx(0)] = 0.0
        tsl[1, sidx(0)] = 0.0
        k = 2
    else:                                           # :2027-2052
        a = 1.0
        for i in range(1, is_order + 1):
            a = a * np.sqrt((i + is_order) / float(i)) * 0.5
        b = a * np.sqrt(is_order / (is_order + 1.0))
        b = b * np.sqrt((is_order - 1.0) / (is_order + 2.0))
        for j in range(0, n + 1):
            c = rmu[sidx(j)]
            xx = 1.0 - c * c
            yy = is_order * 0.5 - 1.0
            if is_order - 1 <= os_nb + 1:
                psl[is_order - 1, sidx(j)] = 0.0
                rsl[is_order - 1, sidx(j)] = 0.0
                tsl[is_order - 1, sidx(j)] = 0.0
            x = a * xx ** (is_order * 0.5)
            psl[is_order, sidx(-j)] = x
            psl[is_order, sidx(j)] = x
            x = b * (1.0 + c * c) * xx ** yy
            rsl[is_order, sidx(-j)] = x
            rsl[is_order, sidx(j)] = x
            x = 2.0 * b * c * xx ** yy
            tsl[is_order, sidx(-j)] = -x
            tsl[is_order, sidx(j)] = x
        k = is_order

    # L recurrence (:2058-2100)
    if k != os_nb:
        ig = -1
        if is_order == 1:
            ig = 1
        for l in range(k, os_nb):
            lp, lm = l + 1, l - 1
            a = (2 * l + 1.0) / np.sqrt((l + is_order + 1.0) * (l - is_order + 1.0))
            b = np.sqrt(float((l + is_order) * (l - is_order))) / (2.0 * l + 1.0)
            d = (l + 1.0) * (2 * l + 1.0) / np.sqrt(
                (l + 3.0) * (l - 1.0) * (l + is_order + 1.0) * (l - is_order + 1.0))
            e = np.sqrt((l + 2.0) * (l - 2.0) * (l + is_order) * (l - is_order)) \
                / (l * (2.0 * l + 1.0))
            f = 2.0 * is_order / (l * (l + 1.0))
            for j in range(0, n + 1):
                c = rmu[sidx(j)]
                psl[lp, sidx(j)] = a * (c * psl[l, sidx(j)] - b * psl[lm, sidx(j)])
                rsl[lp, sidx(j)] = d * (c * rsl[l, sidx(j)] - f * tsl[l, sidx(j)]
                                        - e * rsl[lm, sidx(j)])
                tsl[lp, sidx(j)] = d * (c * tsl[l, sidx(j)] - f * rsl[l, sidx(j)]
                                        - e * tsl[lm, sidx(j)])
                if j != 0:
                    psl[lp, sidx(-j)] = ig * psl[lp, sidx(j)]
                    rsl[lp, sidx(-j)] = ig * rsl[lp, sidx(j)]
                    tsl[lp, sidx(-j)] = -ig * tsl[lp, sidx(j)]
            ig = -ig

    xpl = psl[2].copy()
    xrl = rsl[2].copy()
    xtl = tsl[2].copy()

    # kernel sums (:2121-2155)
    bp = np.zeros((size, size))
    gr = np.zeros((size, size))
    gt = np.zeros((size, size))
    arr = np.zeros((size, size))
    art = np.zeros((size, size))
    att = np.zeros((size, size))
    for j in range(-n, n + 1):
        for kk in range(-n, n + 1):
            sbp = satt = sarr = sgr = sgt = sart = 0.0
            if is_order <= os_nb:
                for l in range(is_order, os_nb + 1):
                    r1 = tsl[l, sidx(j)] * tsl[l, sidx(kk)]
                    r2 = rsl[l, sidx(j)] * rsl[l, sidx(kk)]
                    sbp += beta[l] * psl[l, sidx(j)] * psl[l, sidx(kk)]
                    satt += alpha[l] * r1 + zeta[l] * r2
                    sarr += zeta[l] * r1 + alpha[l] * r2
                    sgr += gamma[l] * psl[l, sidx(j)] * rsl[l, sidx(kk)]
                    sgt += gamma[l] * psl[l, sidx(j)] * tsl[l, sidx(kk)]
                    sart += (alpha[l] * rsl[l, sidx(kk)] * tsl[l, sidx(j)]
                             + zeta[l] * rsl[l, sidx(j)] * tsl[l, sidx(kk)])
            bp[sidx(j), sidx(kk)] = sbp
            att[sidx(j), sidx(kk)] = satt
            arr[sidx(j), sidx(kk)] = sarr
            gr[sidx(j), sidx(kk)] = sgr
            gt[sidx(j), sidx(kk)] = sgt
            art[sidx(j), sidx(kk)] = sart
    return xpl, xrl, xtl, bp, gr, gt, arr, art, att


def integr_epopt(nbmu, rmu, nt, h, i2, q2, u2, i1, q1, u1):
    """SOS_INTEGR_EPOPT (src/SOS_OS.F:2222); modifies i1/q1/u1 in place."""
    n = nbmu

    def s(j):
        return j + n

    for k in range(1, n + 1):
        rmuk = rmu[s(k)]
        zi1, zq1, zu1 = i1[nt, s(k)], q1[nt, s(k)], u1[nt, s(k)]
        for i in range(nt - 1, -1, -1):
            jj = i + 1
            dtau = h[jj] - h[i]
            att = np.exp(-dtau / rmuk)
            matt = 1.0 - att
            attdtau = att * dtau
            b = i2[i, s(k)]
            a = (i2[jj, s(k)] - b) / dtau
            zi1 = zi1 * att + matt * (a * rmuk + b) - a * attdtau
            i1[i, s(k)] = zi1
            b = q2[i, s(k)]
            a = (q2[jj, s(k)] - b) / dtau
            zq1 = zq1 * att + matt * (a * rmuk + b) - a * attdtau
            q1[i, s(k)] = zq1
            b = u2[i, s(k)]
            a = (u2[jj, s(k)] - b) / dtau
            zu1 = zu1 * att + matt * (a * rmuk + b) - a * attdtau
            u1[i, s(k)] = zu1

    for k in range(-n, 0):
        rmuk = rmu[s(k)]
        i1[0, s(k)] = 0.0
        q1[0, s(k)] = 0.0
        u1[0, s(k)] = 0.0
        zi1 = zq1 = zu1 = 0.0
        for i in range(1, nt + 1):
            jj = i - 1
            dtau = h[i] - h[jj]
            att = np.exp(dtau / rmuk)
            matt = 1.0 - att
            attdtau = att * dtau
            b = i2[i, s(k)]
            a = (b - i2[jj, s(k)]) / dtau
            zi1 = zi1 * att + matt * (a * rmuk + b) + a * attdtau
            i1[i, s(k)] = zi1
            b = q2[i, s(k)]
            a = (b - q2[jj, s(k)]) / dtau
            zq1 = zq1 * att + matt * (a * rmuk + b) + a * attdtau
            q1[i, s(k)] = zq1
            b = u2[i, s(k)]
            a = (b - u2[jj, s(k)]) / dtau
            zu1 = zu1 * att + matt * (a * rmuk + b) + a * attdtau
            u1[i, s(k)] = zu1


def fsource_ordre1(is_order, nbmu, nt, xdel, ydel, beta0, beta2, gamma2,
                   xpl, xrl, xtl, bp, gr, gt, ch):
    """SOS_FSOURCE_ORDRE1 (src/SOS_OS.F:2431); JK = 0 (solar slot)."""
    n = nbmu

    def s(j):
        return j + n

    i2 = np.zeros((nt + 1, 2 * n + 1))
    q2 = np.zeros((nt + 1, 2 * n + 1))
    u2 = np.zeros((nt + 1, 2 * n + 1))
    jk = 0
    for j in range(-n, n + 1):
        if is_order <= 2:
            spl = xpl[s(jk)]
            sa1 = beta0 + beta2 * xpl[s(j)] * spl
            sa2 = bp[s(jk), s(j)]
            sb1 = gamma2 * xrl[s(j)] * spl
            sb2 = gr[s(jk), s(j)]
            sc1 = gamma2 * xtl[s(j)] * spl
            sc2 = gt[s(jk), s(j)]
        else:
            sa2 = bp[s(jk), s(j)]
            sa1 = 0.0
            sb2 = gr[s(jk), s(j)]
            sb1 = 0.0
            sc2 = gt[s(jk), s(j)]
            sc1 = 0.0
        for k in range(0, nt + 1):
            attdir = ch[k]
            i2[k, s(j)] = attdir * (sa2 * xdel[k] + sa1 * ydel[k])
            q2[k, s(j)] = attdir * (sb2 * xdel[k] + sb1 * ydel[k])
            u2[k, s(j)] = -attdir * (sc2 * xdel[k] + sc1 * ydel[k])
    return i2, q2, u2


def fsource_ordreig(is_order, nbmu, nt, xdel, ydel, beta0, beta2, gamma2,
                    alpha2, xpl, xrl, xtl, i1, q1, u1,
                    bp, gr, gt, arr, art, att, ga):
    """SOS_FSOURCE_ORDREIG (src/SOS_OS.F:2663)."""
    n = nbmu

    def s(j):
        return j + n

    i2 = np.zeros((nt + 1, 2 * n + 1))
    q2 = np.zeros((nt + 1, 2 * n + 1))
    u2 = np.zeros((nt + 1, 2 * n + 1))
    mol = is_order <= 2
    for k in range(1, n + 1):
        if mol:
            xpk, xrk, xtk = xpl[s(k)], xrl[s(k)], xtl[s(k)]
            ypk, yrk, ytk = xpl[s(-k)], xrl[s(-k)], xtl[s(-k)]
        for i in range(0, nt + 1):
            ii1 = ii2 = qq1 = qq2 = uu1 = uu2 = 0.0
            pcaer = xdel[i]
            pcray = ydel[i]
            for j in range(1, n + 1):
                if mol:
                    xpj, xrj, xtj = xpl[s(j)], xrl[s(j)], xtl[s(j)]
                    ypj, yrj, ytj = xpl[s(-j)], xrl[s(-j)], xtl[s(-j)]
                    bpjk = bp[s(j), s(k)] * pcaer + pcray * (beta0 + beta2 * xpj * xpk)
                    bpjmk = bp[s(j), s(-k)] * pcaer + pcray * (beta0 + beta2 * xpj * ypk)
                    gtjmk = gt[s(j), s(-k)] * pcaer + pcray * (gamma2 * xpj * ytk)
                    gtjk = gt[s(j), s(k)] * pcaer + pcray * (gamma2 * xpj * xtk)
                    gtkmj = gt[s(k), s(-j)] * pcaer + pcray * (gamma2 * xpk * ytj)
                    gtkj = gt[s(k), s(j)] * pcaer + pcray * (gamma2 * xpk * xtj)
                    grjk = gr[s(j), s(k)] * pcaer + pcray * (gamma2 * xpj * xrk)
                    grjmk = gr[s(j), s(-k)] * pcaer + pcray * (gamma2 * xpj * yrk)
                    grkj = gr[s(k), s(j)] * pcaer + pcray * (gamma2 * xpk * xrj)
                    grkmj = gr[s(k), s(-j)] * pcaer + pcray * (gamma2 * xpk * yrj)
                    arrjk = arr[s(j), s(k)] * pcaer + pcray * (alpha2 * xrj * xrk)
                    arrjmk = arr[s(j), s(-k)] * pcaer + pcray * (alpha2 * xrj * yrk)
                    artjk = art[s(j), s(k)] * pcaer + pcray * (alpha2 * xtj * xrk)
                    artjmk = art[s(j), s(-k)] * pcaer + pcray * (alpha2 * xtj * yrk)
                    artkj = art[s(k), s(j)] * pcaer + pcray * (alpha2 * xtk * xrj)
                    artkmj = art[s(k), s(-j)] * pcaer + pcray * (alpha2 * xtk * yrj)
                    attjmk = att[s(j), s(-k)] * pcaer + pcray * (alpha2 * xtj * ytk)
                    attjk = att[s(j), s(k)] * pcaer + pcray * (alpha2 * xtj * xtk)
                else:
                    bpjk = bp[s(j), s(k)] * pcaer
                    bpjmk = bp[s(j), s(-k)] * pcaer
                    gtjmk = gt[s(j), s(-k)] * pcaer
                    gtjk = gt[s(j), s(k)] * pcaer
                    gtkmj = gt[s(k), s(-j)] * pcaer
                    gtkj = gt[s(k), s(j)] * pcaer
                    grjk = gr[s(j), s(k)] * pcaer
                    grjmk = gr[s(j), s(-k)] * pcaer
                    grkj = gr[s(k), s(j)] * pcaer
                    grkmj = gr[s(k), s(-j)] * pcaer
                    arrjk = arr[s(j), s(k)] * pcaer
                    arrjmk = arr[s(j), s(-k)] * pcaer
                    artjk = art[s(j), s(k)] * pcaer
                    artjmk = art[s(j), s(-k)] * pcaer
                    artkj = art[s(k), s(j)] * pcaer
                    artkmj = art[s(k), s(-j)] * pcaer
                    attjmk = att[s(j), s(-k)] * pcaer
                    attjk = att[s(j), s(k)] * pcaer
                z = ga[s(j)]
                xi1, xi2 = i1[i, s(j)], i1[i, s(-j)]
                xq1, xq2 = q1[i, s(j)], q1[i, s(-j)]
                xu1, xu2 = u1[i, s(j)], u1[i, s(-j)]
                ii2 += z * (xi1 * bpjk + xi2 * bpjmk + xq1 * grkj
                            + xq2 * grkmj - xu1 * gtkj - xu2 * gtkmj)
                ii1 += z * (xi1 * bpjmk + xi2 * bpjk + xq1 * grkmj
                            + xq2 * grkj + xu1 * gtkmj + xu2 * gtkj)
                qq2 += z * (xi1 * grjk + xi2 * grjmk + xq1 * arrjk
                            + xq2 * arrjmk + xu2 * artjmk - xu1 * artjk)
                qq1 += z * (xi1 * grjmk + xi2 * grjk + xq1 * arrjmk
                            + xq2 * arrjk - xu1 * artjmk + xu2 * artjk)
                uu2 -= z * (xi1 * gtjk - xi2 * gtjmk + xq1 * artkj
                            + xq2 * artkmj - xu1 * attjk - xu2 * attjmk)
                uu1 -= z * (xi1 * gtjmk - xi2 * gtjk - xq1 * artkmj
                            - xq2 * artkj - xu1 * attjmk - xu2 * attjk)
            i2[i, s(k)] = ii2 * 0.5
            i2[i, s(-k)] = ii1 * 0.5
            q2[i, s(k)] = qq2 * 0.5
            q2[i, s(-k)] = qq1 * 0.5
            u2[i, s(k)] = uu2 * 0.5
            u2[i, s(-k)] = uu1 * 0.5
    return i2, q2, u2


def mat_fresnel_plan_refl(nbmu, rmu, ind_surf, ipolar):
    """SOS_MAT_FRESNEL_PLAN_REFL (src/SOS_OS.F:1719)."""
    n = nbmu
    f11 = np.zeros(n + 1)
    f12 = np.zeros(n + 1)
    f33 = np.zeros(n + 1)
    for j in range(0, n + 1):
        mu = -rmu[n + 0] if j == 0 else rmu[n + j]
        ind2 = ind_surf * ind_surf
        mu2 = mu * mu
        x = np.sqrt(ind2 - 1.0 + mu2)
        rl = (ind2 * mu - x) / (ind2 * mu + x)
        rr = (mu - x) / (mu + x)
        f11[j] = (rl * rl + rr * rr) / 2.0
        if ipolar == 1:
            f12[j] = (rl * rl - rr * rr) / 2.0
            f33[j] = rl * rr
    return f11, f12, f33


def fsource_diff_fresnel1(f11sun, f12sun, xdel, ydel, nt, beta0, beta2,
                          gamma2, alpha2, bp, gr, gt, arr, art,
                          xpl, xrl, xtl, is_order, nbmu, mus, h):
    """SOS_FSOURCE_DIFF_FRESNEL1 (src/SOS_OS.F:3106)."""
    n = nbmu

    def s(j):
        return j + n

    i2 = np.zeros((nt + 1, 2 * n + 1))
    q2 = np.zeros((nt + 1, 2 * n + 1))
    u2 = np.zeros((nt + 1, 2 * n + 1))
    coefnt = np.exp(2.0 * h[nt] / mus) / 4.0
    spl = xpl[s(0)]
    for k in range(0, nt):
        yr, xp = ydel[k], xdel[k]
        yyr, xxp = ydel[k + 1], xdel[k + 1]
        for j in range(1, n + 1):
            if is_order <= 2:
                bp0mj = bp[s(0), s(-j)] * xp + (beta0 + beta2 * xpl[s(-j)] * spl) * yr
                bp0j = bp[s(0), s(j)] * xxp + (beta0 + beta2 * xpl[s(j)] * spl) * yyr
                grj0 = gr[s(j), s(0)] * xxp + yyr * xrl[s(0)] * xpl[s(j)] * gamma2
                gr0j = gr[s(0), s(j)] * xxp + yyr * xrl[s(j)] * xpl[s(0)] * gamma2
                gr0mj = gr[s(0), s(-j)] * xp + yr * xrl[s(-j)] * spl * gamma2
                grmj0 = gr[s(-j), s(0)] * xp + yr * gamma2 * xrl[s(0)] * xpl[s(-j)]
                gt0mj = gt[s(0), s(-j)] * xp + yr * gamma2 * spl * xtl[s(-j)]
                gt0j = gt[s(0), s(j)] * xxp + yyr * gamma2 * spl * xtl[s(j)]
                arr0mj = arr[s(0), s(-j)] * xp + alpha2 * yr * xrl[s(0)] * xrl[s(-j)]
                arr0j = arr[s(0), s(j)] * xxp + alpha2 * yyr * xrl[s(0)] * xrl[s(j)]
                artj0 = art[s(j), s(0)] * xxp + yyr * alpha2 * xtl[s(j)] * xrl[s(0)]
                artmj0 = art[s(-j), s(0)] * xp + yr * alpha2 * xtl[s(-j)] * xrl[s(0)]
            else:
                bp0mj = bp[s(0), s(-j)] * xp
                bp0j = bp[s(0), s(j)] * xxp
                grj0 = gr[s(j), s(0)] * xxp
                gr0j = gr[s(0), s(j)] * xxp
                gr0mj = gr[s(0), s(-j)] * xp
                grmj0 = gr[s(-j), s(0)] * xp
                gt0mj = gt[s(0), s(-j)] * xp
                gt0j = gt[s(0), s(j)] * xxp
                arr0mj = arr[s(0), s(-j)] * xp
                arr0j = arr[s(0), s(j)] * xxp
                artj0 = art[s(j), s(0)] * xxp
                artmj0 = art[s(-j), s(0)] * xp
            coefk = coefnt * np.exp(-h[k] / mus)
            i2[k, s(j)] = coefk * (f11sun * bp0mj + f12sun * grmj0)
            q2[k, s(j)] = coefk * (f11sun * gr0mj + f12sun * arr0mj)
            u2[k, s(j)] = coefk * (f11sun * gt0mj + f12sun * artmj0)
            coefkp1 = coefnt * np.exp(-h[k + 1] / mus)
            i2[k + 1, s(-j)] = coefkp1 * (f11sun * bp0j + f12sun * grj0)
            q2[k + 1, s(-j)] = coefkp1 * (f11sun * gr0j + f12sun * arr0j)
            u2[k + 1, s(-j)] = coefkp1 * (f11sun * gt0j + f12sun * artj0)
    return i2, q2, u2


def sos_os(nbmu, rmu, ga, os_nb, nt, n0, tetas, ro, imat_surf, ifresnel,
           ind_surf, h, xdel, ydel, ron, alpha, beta, gamma, zeta,
           igmax, iborm, ipolar=1, rmat_records=None, zout=None,
           zprof=None):
    """SOS_OS (src/SOS_OS.F:303).

    ``zout``/``zprof``: arbitrary output altitude — per-level accumulators
    I3OUT/Q3OUT/U3OUT with the per-level geometric tail
    (``SOS_AJOUT_QUEUE`` second block, ``src/SOS_OS.F:3994-4011``),
    per-level direct-reflection store/subtract RIIOUT
    (``src/SOS_OS.F:1062-1079, 1431-1435``) and linear interpolation at the
    bracketing levels (``src/SOS_OS.F:1511-1534``).  None = the standard
    TOA/ground output (ZOUT = -1).

    ``rmu``/``ga``: signed arrays of length 2*nbmu+1 (offset by +nbmu); the
    center slot is overwritten with mus.  ``rmat_records``: list over IS of
    (9, nbmu, nbmu) surface reflection matrices ordered like the reference
    records R11,R12,R13,R21,...,R33 with [incident, outgoing] indices.

    Returns dict with per-IS records (q3z, u3z, i3z) (like the FICOS file),
    emoins, eplus.
    """
    n = nbmu

    def s(j):
        return j + n

    rmu = np.array(rmu, dtype=float)
    ga = np.array(ga, dtype=float)

    aaa = ron / (2.0 - ron)
    aaa = (1.0 - aaa) / (1.0 + 2.0 * aaa)
    beta0 = 1.0
    beta2 = 0.5 * aaa
    gamma2 = -aaa * np.sqrt(1.5)
    alpha2 = 3.0 * aaa

    alpha = np.array(alpha, dtype=float)
    beta = np.array(beta, dtype=float)
    gamma = np.array(gamma, dtype=float)
    zeta = np.array(zeta, dtype=float)
    if ipolar == 0:
        gamma2 = 0.0
        alpha2 = 0.0
        alpha[:] = 0.0
        gamma[:] = 0.0
        zeta[:] = 0.0

    if n0 > 0:
        tab = -rmu[s(n0)]
    else:
        tab = -np.cos(np.pi * tetas / 180.0)
    rmu[s(0)] = tab

    if ifresnel == 1:
        f11, f12, f33 = mat_fresnel_plan_refl(n, rmu, ind_surf, ipolar)
    else:
        f11 = f12 = f33 = None

    ch = np.exp(-h / (-tab)) / 4.0

    i4 = np.zeros(2 * n + 1)
    q4 = np.zeros(2 * n + 1)
    u4 = np.zeros(2 * n + 1)
    i5 = np.zeros(2 * n + 1)
    q5 = np.zeros(2 * n + 1)
    u5 = np.zeros(2 * n + 1)

    records = []
    emoins = eplus = 0.0
    sign = -1.0
    size = 2 * n + 1

    for is_order in range(0, iborm + 1):
        sign = -sign
        if is_order > 0:
            beta0 = 0.0

        i3 = np.zeros(size)
        q3 = np.zeros(size)
        u3 = np.zeros(size)

        if imat_surf == 1:
            rec = rmat_records[is_order]
            r11, r12, r13, r21, r22, r23, r31, r32, r33 = [rec[m] for m in range(9)]
            if ipolar == 0:
                r12 = np.zeros_like(r11); r13 = np.zeros_like(r11)
                r21 = np.zeros_like(r11); r22 = np.zeros_like(r11)
                r23 = np.zeros_like(r11); r31 = np.zeros_like(r11)
                r32 = np.zeros_like(r11); r33 = np.zeros_like(r11)

        xpl, xrl, xtl, bp, gr, gt, arr, art, att = sos_noyaux(
            is_order, n, rmu, os_nb, alpha, beta, gamma, zeta)

        i2, q2, u2 = fsource_ordre1(is_order, n, nt, xdel, ydel,
                                    beta0, beta2, gamma2,
                                    xpl, xrl, xtl, bp, gr, gt, ch)

        i1 = np.zeros((nt + 1, size))
        q1 = np.zeros((nt + 1, size))
        u1 = np.zeros((nt + 1, size))
        xr = np.zeros(n + 1)
        for k in range(1, n + 1):
            if not (ro == 0.0 or is_order != 0):
                i1[nt, s(k)] = -ro * tab * np.exp(h[nt] / tab)
                xr[k] = i1[nt, s(k)]
            if imat_surf == 1:
                rr = np.exp(h[nt] / tab) / rmu[s(k)]
                i1[nt, s(k)] += r11[n0 - 1, k - 1] * rr
                q1[nt, s(k)] = r21[n0 - 1, k - 1] * rr
                u1[nt, s(k)] = r31[n0 - 1, k - 1] * rr

        integr_epopt(n, rmu, nt, h, i2, q2, u2, i1, q1, u1)

        if ifresnel == 1:
            i2f, q2f, u2f = fsource_diff_fresnel1(
                f11[0], f12[0], xdel, ydel, nt, beta0, beta2, gamma2, alpha2,
                bp, gr, gt, arr, art, xpl, xrl, xtl, is_order, n, tab, h)
            i1f = np.zeros((nt + 1, size))
            q1f = np.zeros((nt + 1, size))
            u1f = np.zeros((nt + 1, size))
            integr_epopt(n, rmu, nt, h, i2f, q2f, u2f, i1f, q1f, u1f)
            i1 += i1f
            q1 += q1f
            u1 += u1f

        rii = np.zeros(n + 1)
        rqq = np.zeros(n + 1)
        ruu = np.zeros(n + 1)
        riiout = np.zeros((nt + 1, n + 1))
        rqqout = np.zeros((nt + 1, n + 1))
        ruuout = np.zeros((nt + 1, n + 1))
        if imat_surf == 1:
            for k in range(1, n + 1):
                a = np.exp(-h[nt] / rmu[s(k)])
                rii[k] = a * (i1[nt, s(k)] - xr[k])
                rqq[k] = a * q1[nt, s(k)]
                ruu[k] = a * u1[nt, s(k)]
                for i in range(nt + 1):
                    a = np.exp(-(h[nt] - h[i]) / rmu[s(k)])
                    riiout[i, k] = a * (i1[nt, s(k)] - xr[k])
                    rqqout[i, k] = a * q1[nt, s(k)]
                    ruuout[i, k] = a * u1[nt, s(k)]

        # store order 1
        d1 = np.zeros(size)
        e1 = np.zeros(size)
        f1v = np.zeros(size)
        a1 = np.zeros(size)
        b1 = np.zeros(size)
        c1 = np.zeros(size)
        for k in range(-n, 0):
            i3[s(k)] = i1[nt, s(k)]
            q3[s(k)] = q1[nt, s(k)]
            u3[s(k)] = u1[nt, s(k)]
            d1[s(k)] = i1[nt, s(k)]
            e1[s(k)] = q1[nt, s(k)]
            f1v[s(k)] = u1[nt, s(k)]
        for k in range(1, n + 1):
            i3[s(k)] = i1[0, s(k)]
            q3[s(k)] = q1[0, s(k)]
            u3[s(k)] = u1[0, s(k)]
            d1[s(k)] = i1[0, s(k)]
            e1[s(k)] = q1[0, s(k)]
            f1v[s(k)] = u1[0, s(k)]

        # per-level accumulators for an arbitrary output altitude
        # (I3OUT..., D1OUT..., src/SOS_OS.F:1097-1141)
        i3out, q3out, u3out = i1.copy(), q1.copy(), u1.copy()
        d1out, e1out, f1out = i1.copy(), q1.copy(), u1.copy()

        ig = 1
        while True:
            ig += 1
            if ig > igmax:
                break
            i2, q2, u2 = fsource_ordreig(
                is_order, n, nt, xdel, ydel, beta0, beta2, gamma2, alpha2,
                xpl, xrl, xtl, i1, q1, u1, bp, gr, gt, arr, art, att, ga)

            prev_dn = i1[nt].copy(), q1[nt].copy(), u1[nt].copy()
            for k in range(1, n + 1):
                i1[nt, s(k)] = 0.0
                q1[nt, s(k)] = 0.0
                u1[nt, s(k)] = 0.0
            lsol = 0.0
            for j in range(1, n + 1):
                lsol += ga[s(j)] * prev_dn[0][s(-j)] * rmu[s(j)]
            lsol = 2.0 * lsol * ro
            xr2 = np.zeros(n + 1)
            if not (ro == 0.0 or is_order != 0):
                for j in range(1, n + 1):
                    i1[nt, s(j)] = lsol
                    xr2[j] = lsol
            if imat_surf == 1:
                for k in range(1, n + 1):
                    ii2v = qq2v = uu2v = 0.0
                    rrmu = 2.0 / rmu[s(k)]
                    for j in range(1, n + 1):
                        z = ga[s(j)]
                        xi1 = prev_dn[0][s(-j)]
                        xq1 = prev_dn[1][s(-j)]
                        xu1 = prev_dn[2][s(-j)]
                        ii2v += z * (xi1 * r11[j - 1, k - 1] + xq1 * r12[j - 1, k - 1]
                                     + xu1 * r13[j - 1, k - 1])
                        qq2v += z * (xi1 * r21[j - 1, k - 1] + xq1 * r22[j - 1, k - 1]
                                     + xu1 * r23[j - 1, k - 1])
                        uu2v += z * (xi1 * r31[j - 1, k - 1] + xq1 * r32[j - 1, k - 1]
                                     + xu1 * r33[j - 1, k - 1])
                    i1[nt, s(k)] = ii2v * rrmu + xr2[k]
                    q1[nt, s(k)] = qq2v * rrmu
                    u1[nt, s(k)] = uu2v * rrmu
            if ifresnel == 1:
                for k in range(1, n + 1):
                    i1[nt, s(k)] += f11[k] * prev_dn[0][s(-k)] + f12[k] * prev_dn[1][s(-k)]
                    q1[nt, s(k)] += f12[k] * prev_dn[0][s(-k)] + f11[k] * prev_dn[1][s(-k)]
                    u1[nt, s(k)] += f33[k] * prev_dn[2][s(-k)]

            integr_epopt(n, rmu, nt, h, i2, q2, u2, i1, q1, u1)

            g1 = np.zeros(size)
            h1 = np.zeros(size)
            p1 = np.zeros(size)
            for k in range(-n, 0):
                g1[s(k)] = i1[nt, s(k)]
                h1[s(k)] = q1[nt, s(k)]
                p1[s(k)] = u1[nt, s(k)]
            for k in range(1, n + 1):
                g1[s(k)] = i1[0, s(k)]
                h1[s(k)] = q1[0, s(k)]
                p1[s(k)] = u1[0, s(k)]

            if ig != 2:
                z1 = 0.0
                for k in range(-n, n + 1):
                    if k == 0:
                        continue
                    for (aa, dd, gg, cc) in ((a1, d1, g1, i3), (b1, e1, h1, q3),
                                             (c1, f1v, p1, u3)):
                        if aa[s(k)] != 0.0 and dd[s(k)] != 0.0 and cc[s(k)] != 0.0:
                            y = ((gg[s(k)] / dd[s(k)] - dd[s(k)] / aa[s(k)])
                                 / (1.0 - gg[s(k)] / dd[s(k)]) ** 2
                                 * (gg[s(k)] / cc[s(k)]))
                            z1 = max(z1, abs(y))
                if z1 <= SEUIL_CV_SG:
                    # geometric tail (SOS_AJOUT_QUEUE)
                    for j in range(-n, n + 1):
                        if j == 0:
                            continue
                        for (dd, gg, cc) in ((d1, g1, i3), (e1, h1, q3),
                                             (f1v, p1, u3)):
                            if dd[s(j)] != 0.0:
                                cc[s(j)] += gg[s(j)] / (1.0 - gg[s(j)] / dd[s(j)])
                    # per-level tail (src/SOS_OS.F:3994-4011); G1OUT is the
                    # current order-IG field i1/q1/u1
                    for (ddo, ggo, cco) in ((d1out, i1, i3out),
                                            (e1out, q1, q3out),
                                            (f1out, u1, u3out)):
                        nz = ddo != 0.0
                        cco[nz] += ggo[nz] / (1.0 - ggo[nz] / ddo[nz])
                    break

            a1, b1, c1 = d1.copy(), e1.copy(), f1v.copy()
            d1, e1, f1v = g1.copy(), h1.copy(), p1.copy()
            d1out, e1out, f1out = i1.copy(), q1.copy(), u1.copy()

            for j in range(1, n + 1):
                i3[s(j)] += i1[0, s(j)]
                q3[s(j)] += q1[0, s(j)]
                u3[s(j)] += u1[0, s(j)]
                i3[s(-j)] += i1[nt, s(-j)]
                q3[s(-j)] += q1[nt, s(-j)]
                u3[s(-j)] += u1[nt, s(-j)]
            i3out += i1
            q3out += q1
            u3out += u1

            z1 = 0.0
            for k in range(-n, n + 1):
                if k == 0:
                    continue
                ind = nt if k < 0 else 0
                z1 = max(z1, abs(i1[ind, s(k)]), abs(q1[ind, s(k)]),
                         abs(u1[ind, s(k)]))
            if z1 <= SEUIL_VALDIF:
                break
            z1 = 0.0
            for k in range(-n, n + 1):
                if k == 0:
                    continue
                ind = nt if k < 0 else 0
                for (ff, cc) in ((i1, i3), (q1, q3), (u1, u3)):
                    if cc[s(k)] != 0.0:
                        z1 = max(z1, abs(ff[ind, s(k)] / cc[s(k)]))
            if z1 <= SEUIL_SUMDIF:
                break

        if imat_surf == 1:
            for j in range(1, n + 1):
                i3[s(j)] -= rii[j]
                q3[s(j)] -= rqq[j]
                u3[s(j)] -= ruu[j]
                i3out[:, s(j)] -= riiout[:, j]
                q3out[:, s(j)] -= rqqout[:, j]
                u3out[:, s(j)] -= ruuout[:, j]

        if is_order == 0:
            emoins = 0.0
            eplus = 0.0
            for j in range(1, n + 1):
                emoins += rmu[s(j)] * ga[s(j)] * i3[s(-j)]
                eplus += rmu[s(j)] * ga[s(j)] * i3[s(j)]
            emoins = -emoins * 2.0 / tab
            eplus = -eplus * 2.0 / tab

        coef = 2.0
        if is_order == 0:
            coef = 1.0
        for j in range(-n, n + 1):
            if j == 0:
                continue
            i4[s(j)] += coef * i3[s(j)]
            q4[s(j)] += coef * q3[s(j)]
            u4[s(j)] += coef * u3[s(j)]
            i5[s(j)] += coef * i3[s(j)] * sign
            q5[s(j)] += coef * q3[s(j)] * sign
            u5[s(j)] += coef * u3[s(j)] * sign

        if zout is None:
            records.append((q3.copy(), u3.copy(), i3.copy()))
        else:
            # interpolation at the bracketing levels (src/SOS_OS.F:1511-1534)
            j = 1
            while zout < zprof[j]:
                j += 1
            zz = (zout - zprof[j - 1]) / (zprof[j] - zprof[j - 1])
            records.append((
                (1.0 - zz) * q3out[j - 1] + zz * q3out[j],
                (1.0 - zz) * u3out[j - 1] + zz * u3out[j],
                (1.0 - zz) * i3out[j - 1] + zz * i3out[j]))

        z1 = 0.0
        for j in range(-n, n + 1):
            if j == 0:
                continue
            for (num, den) in ((q3, q4), (i3, i4), (u3, u4),
                               (q3, q5), (u3, u5), (i3, i5)):
                if den[s(j)] != 0.0:
                    z1 = max(z1, abs(num[s(j)] / den[s(j)]))
        if z1 <= SEUIL_SF:
            break

    return {"records": records, "emoins": emoins, "eplus": eplus, "tab": tab}
