"""Cox-Munk sun-glint surface: wave-slope G function Fourier decomposition.

Re-design of ``SOS_GSF`` / ``SOS_CALCG`` (``src/SOS_GLITTER.F:451,755``).
The reference loops over the (Teta1, Teta2) angle pairs, adaptively shrinks
the azimuth domain when G is peaked (bisection for PHIB), samples G on 1024
azimuths and refines each Fourier coefficient dyadically with a convergence
test.  Here every step is vectorized over the full (N x N) pair grid with
fixed-iteration masked equivalents of the adaptive loops (identical
iterates, frozen at the reference's exit conditions).

The dyadic scheme is shared with the Maignan BPDF (``SOS_GSF_MAIGNAN``,
``src/SOS_SURFACE_BPDF.F:1305`` uses the identical algorithm with a
different G): ``fourier_dyadic`` takes the G evaluator as a callable.
"""

from __future__ import annotations

import numpy as np

from .. import constants as cte
from .compose import reflection_matrices
from .fresnel import fresnel_expansion


def _calc_g(cs12, c12, s12, sig, phi):
    """G(Teta1,Teta2,phi) (``SOS_CALCG``, ``src/SOS_GLITTER.F:755``)."""
    costetad = -c12 + s12 * np.cos(phi)
    x = (1.0 - costetad) / cs12
    return x * x * np.exp(-(x - 1.0) / sig)


def fourier_dyadic(g_fn, os_nm: int, n_bisect: int = 200):
    """Azimuth Fourier coefficients of a peaked weight function G.

    ``g_fn(phi)`` evaluates G over the pair grid for ``phi`` of shape
    (), (N, N) or (N, N, K) (broadcast against the grid).  Implements the
    reference's adaptive-domain + dyadic-refinement scheme
    (``src/SOS_GLITTER.F:532-687``, ``src/SOS_SURFACE_BPDF.F:1395-1530``):

    * bisection for the azimuth bound PHIB where 1e4*G(PHIB) ~ GMAX;
    * per-order dyadic refinement of the trapezoid-like estimate with a
      1e-4 relative test;
    * per-pair truncation at the first order whose cumulative recomposition
      matches GMAX to 1e-3.

    Returns (e, il): ``e`` of shape (N, N, os_nm+1) zeroed above the useful
    order ``il``.
    """
    gmax = np.asarray(g_fn(0.0), dtype=np.float64)
    gmin_pi = np.asarray(g_fn(np.pi), dtype=np.float64)
    n = gmax.shape[0]

    moderate = cte.PH_TEST * gmin_pi >= gmax

    # adaptive azimuth-domain shrink: bisect for PHIB where
    # 1e4*G(PHIB) ~ GMAX within 1% (src/SOS_GLITTER.F:557-638)
    phi1 = np.zeros_like(gmax)
    phi2 = np.full_like(gmax, np.pi)
    phib = np.full_like(gmax, np.pi)
    done = moderate.copy()
    for _ in range(n_bisect):
        mid = 0.5 * (phi1 + phi2)
        g_mid = g_fn(mid)
        x = cte.PH_TEST * g_mid
        hit = np.abs(x - gmax) < 0.01 * gmax
        newly = (~done) & hit
        phib = np.where(newly, mid, phib)
        done = done | hit
        go_up = x > gmax
        phi1 = np.where((~done) & go_up, mid, phi1)
        phi2 = np.where((~done) & (~go_up), mid, phi2)
    phib = np.where(moderate, np.pi, phib)

    nu = cte.PH_NU
    q = phib / nu                                   # (N, N)
    i_idx = np.arange(nu + 1)
    u = g_fn(q[..., None] * i_idx)                  # (N, N, NU+1)
    gmin = np.where(moderate, gmin_pi, u[..., nu])

    # Fourier coefficients with dyadic refinement (src/SOS_GLITTER.F:641-664)
    e = np.zeros((n, n, os_nm + 1))
    for s in range(os_nm + 1):
        z = 0.5 * (gmax + gmin * np.cos(s * phib))
        done_s = np.zeros_like(z, dtype=bool)
        for lvl in range(1, cte.PH_NQ + 1):
            ia = 2 ** lvl
            ip = nu // ia
            j = np.arange(1, ia, 2)
            k = ip * j                              # (ia/2,)
            cosf = np.cos(s * k * q[..., None])     # (N, N, ia/2)
            y = 2.0 * np.sum(u[..., k] * cosf, axis=-1) / ia
            # guarded z == 0: converged only if y == 0 too (a bare
            # |z-y|/z would raise and propagate inf/nan through the hit
            # mask; reference test src/SOS_GLITTER.F:655)
            diff = np.abs(z - y)
            xt = np.where(z == 0.0, np.where(diff == 0.0, 0.0, np.inf),
                          diff / np.where(z == 0.0, 1.0, z))
            hit = xt < 1.0e-4
            z = np.where(done_s | hit, z, 0.5 * (y + z))
            done_s = done_s | hit
        e[..., s] = phib * z / np.pi

    # per-pair truncation: stop at the first order whose cumulative
    # recomposition matches GMAX to 1e-3 (src/SOS_GLITTER.F:666-686)
    t1 = e[..., 0:1] + 2.0 * np.cumsum(e[..., 1:], axis=-1)
    b1 = np.abs(t1 - gmax[..., None]) / gmax[..., None]
    passing = b1 <= 1.0e-3                          # orders 1..os_nm
    first = np.argmax(passing, axis=-1) + 1
    has = np.any(passing, axis=-1)
    il = np.where(has, first, os_nm)
    mask = np.arange(os_nm + 1)[None, None, :] <= il[..., None]
    return e * mask, il


def gsf_fourier(mu_pos: np.ndarray, sig: float, os_nm: int,
                n_bisect: int = 200):
    """Fourier coefficients E[a, b, n] of the Cox-Munk G over the pair grid.

    Returns (e, il) with ``e`` of shape (N, N, os_nm+1), zero above the
    per-pair useful order ``il`` (the reference's LIM early exit,
    ``src/SOS_GLITTER.F:666-686``).
    """
    c1 = mu_pos[:, None]
    c2 = mu_pos[None, :]
    s1 = np.sqrt(1.0 - c1 * c1)
    s2 = np.sqrt(1.0 - c2 * c2)
    c12 = c1 * c2
    s12 = s1 * s2
    cs12 = 0.5 * (c1 + c2) ** 2

    def g(phi):
        phi = np.asarray(phi, dtype=np.float64)
        if phi.ndim > 2:
            return _calc_g(cs12[..., None], c12[..., None], s12[..., None],
                           sig, phi)
        return _calc_g(cs12, c12, s12, sig, phi)

    return fourier_dyadic(g, os_nm, n_bisect)


def glitter_matrices(mu_pos: np.ndarray, w_pos: np.ndarray, wind: float,
                     ind: float, os_nb: int, os_ns: int, os_nm: int):
    """Fourier reflection matrices of the wind-roughened sea.

    Full pipeline of ``SOS_GLITTER`` (``src/SOS_GLITTER.F:229``):
    G decomposition + Fresnel expansion + composition.  Returns
    (os_nb+1, 3, 3, N, N) float64 (values passed through float32 like the
    reference's REAL*4 records, ``src/SOS_SURFACE.F:2420-2442``).
    """
    sig = 0.003 + 0.00512 * wind
    e, _ = gsf_fourier(mu_pos, sig, os_nm)
    coeffs = fresnel_expansion(mu_pos, w_pos, ind, os_ns)
    return reflection_matrices(e, mu_pos, coeffs, 1.0 / sig, os_nb, os_ns)
