"""Composition of an azimuth-decomposed weight function with the Fresnel
matrix expansion into Fourier reflection matrices.

Re-design of ``SOS_NOYAUX_FRESNEL`` + ``SOS_MAT_REFLEXION`` +
``SOS_MISE_FORMAT`` (``src/SOS_SURFACE.F:2029,1708,2307``).  The reference
streams per-pair records through three files; here the composition is a set
of einsums over the full pair grid:

* the Fresnel Fourier kernels become (S, N, N) tensors built from the GSF
  basis (same builder as the solver kernels);
* the per-output-order mixing over the G Fourier index
  (``src/SOS_SURFACE.F:1884-1920``) becomes a contraction with the weight
  tensors X/Y built from E[a,b,K+IS] +/- E[a,b,|K-IS|].

Index convention of the result: rmat[s, so, si, j_in, k_out] — matching the
solver's surface records (R_{so si}(incident, outgoing),
``src/SOS_OS.F:916-925, 1194-1220``).
"""

from __future__ import annotations

import numpy as np

from .. import gsf


def _fresnel_kernels(mu_pos, alpha, beta, gamma, zeta, os_ns):
    """Fourier kernels of the Fresnel matrix over the pair grid.

    Returns dict of (os_ns+1, N, N) arrays: bp, gr, gt, arr, att, art with
    the index semantics E[s, a, b] = sum_l c_l F(l,a) G(l,b)
    (``SOS_NOYAUX_FRESNEL``, ``src/SOS_SURFACE.F:2190-2215``).
    """
    tabs = [gsf.gsf_positive(s, mu_pos, os_ns) for s in range(os_ns + 1)]
    psl = np.stack([t[0] for t in tabs])    # (S, L+1, N)
    rsl = np.stack([t[1] for t in tabs])
    tsl = np.stack([t[2] for t in tabs])

    def pair(f, c, g):
        return np.einsum("sla,l,slb->sab", f, c, g)

    bp = pair(psl, beta, psl)
    gr = pair(psl, gamma, rsl)
    gt = pair(psl, gamma, tsl)
    arr = pair(tsl, zeta, tsl) + pair(rsl, alpha, rsl)
    att = pair(tsl, alpha, tsl) + pair(rsl, zeta, rsl)
    art = pair(tsl, alpha, rsl) + pair(rsl, zeta, tsl)
    return bp, gr, gt, arr, att, art


def reflection_matrices(e, mu_pos, fresnel_coeffs, coef, os_nb, os_ns):
    """Compose E[a,b,n] with the Fresnel expansion into rmat.

    ``e``: (N, N, >=os_nb+os_ns+1) azimuth Fourier coefficients of the
    scalar weight function (zero-padded above the useful order);
    ``fresnel_coeffs``: (alpha, beta, gamma, zeta) each (os_ns+1,);
    ``coef``: global multiplier (1/sigma^2 for glitter).
    Returns (os_nb+1, 3, 3, N, N) float64, float32-quantized like the
    reference's REAL*4 records.
    """
    alpha, beta, gamma, zeta = fresnel_coeffs
    n = mu_pos.shape[0]
    bp, gr, gt, arr, att, art = _fresnel_kernels(
        mu_pos, alpha, beta, gamma, zeta, os_ns)

    grt = gr.transpose(0, 2, 1)
    gtt = gt.transpose(0, 2, 1)
    artt = art.transpose(0, 2, 1)

    ks = np.arange(os_ns + 1)
    im = np.where(ks % 2 == 0, 1.0, -1.0)
    im[0] = 0.0                             # K=0 handled separately

    rmat = np.zeros((os_nb + 1, 3, 3, n, n), dtype=np.float64)
    for s in range(os_nb + 1):
        ip = ks + s
        imn = np.abs(ks - s)
        x = coef * im * (e[..., ip] + e[..., imn]) / 4.0     # (N, N, K)
        y = coef * im * (e[..., imn] - e[..., ip]) / 4.0
        x[..., 0] = coef * e[..., s] / 4.0
        y[..., 0] = 0.0

        cx = lambda ker: np.einsum("kab,abk->ab", ker, x)
        cy = lambda ker: np.einsum("kab,abk->ab", ker, y)

        rmat[s, 0, 0] = cx(bp)              # P11(in a, out b)
        rmat[s, 0, 1] = cx(grt)             # P12: PSL at out, RSL at in
        rmat[s, 0, 2] = cy(gtt)             # P13
        rmat[s, 1, 0] = cx(gr)              # P21
        rmat[s, 1, 1] = cx(arr)             # P22
        rmat[s, 1, 2] = cy(art)             # P23
        rmat[s, 2, 0] = -cy(gt)             # P31
        rmat[s, 2, 1] = -cy(artt)           # P32
        rmat[s, 2, 2] = -cx(att)            # P33

    return rmat.astype(np.float32).astype(np.float64)
