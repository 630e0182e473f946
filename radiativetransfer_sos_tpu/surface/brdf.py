"""Land BRDF/BPDF surfaces: Roujean kernel BRDF and the polarized BPDFs
(Rondeaux-Herman, Breon, Nadal, Maignan).

Re-design of ``SOS_ROUJEAN.F`` and ``SOS_SURFACE_BPDF.F``:

* Roujean BRDF: kernel model F = K0 + K1*F1 + K2*F2
  (``SOS_CALC_F_ROUJEAN``, ``src/SOS_ROUJEAN.F:891``), azimuth Fourier
  decomposition per angle pair on a 1025-sample Riemann grid with the
  reference's two-branch stop test (``SOS_FSF_ROUJEAN``,
  ``src/SOS_ROUJEAN.F:417``); the result feeds P11 directly — polarization
  elements are zero (``SOS_MISE_FORMAT_RJ``, ``src/SOS_ROUJEAN.F:1102``).
* BPDFs: a scalar weight function per model, decomposed in azimuth Fourier
  series and composed with the Fresnel-matrix expansion exactly like the
  glitter G (``SOS_SURFACE_BPDF``, ``src/SOS_SURFACE_BPDF.F:219``);
  the Roujean BRDF matrix is then added element-wise
  (``SOS_BPDF_AJOUT_BRDF``, ``src/SOS_SURFACE.F:2503``).

The per-pair loops of the reference become full (N x N x phi) vectorized
numpy: these matrices are computed once per configuration on the host (the
reference caches them as files) and enter the jitted solver as arrays.
"""

from __future__ import annotations

import numpy as np

from .. import constants as cte
from .compose import reflection_matrices
from .fresnel import fresnel_expansion
from .glitter import fourier_dyadic


# ---------------------------------------------------------------------------
# Riemann-grid azimuth Fourier decomposition with the reference's stop test
# ---------------------------------------------------------------------------

def _riemann_fourier(u: np.ndarray, os_max: int, threshold: float,
                     drop_riser: bool):
    """Per-pair cosine decomposition of samples ``u`` at phi_i = i*pi/NU.

    Replicates the IS loop of ``SOS_FSF_ROUJEAN`` / ``SOS_F21SF_NADAL``
    (``src/SOS_ROUJEAN.F:578-650``, ``src/SOS_SURFACE_BPDF.F:845-910``):
    E(IS) = (q/pi) * sum_i u_i cos(IS*phi_i); stop at the first order whose
    max relative recomposition error B1 <= threshold, or as soon as B1
    stops decreasing.  ``drop_riser`` selects what survives the second
    branch: the Nadal writer records only orders 0..IS-1 (True) while the
    Roujean writer keeps the already-computed order IS (False).

    ``u``: (N, N, NU+1).  Returns (e, il): e (N, N, os_max+1) zeroed above
    the kept order, il the reference's "useful order" diagnostic.
    """
    nu = u.shape[-1] - 1
    q = np.pi / nu
    phi = q * np.arange(nu + 1)

    shape = u.shape[:-1]
    t1 = np.zeros_like(u)
    e = np.zeros(shape + (os_max + 1,))
    keep = np.full(shape, os_max, dtype=np.int64)
    il = np.full(shape, os_max, dtype=np.int64)
    done = np.zeros(shape, dtype=bool)
    b1_prev = np.full(shape, np.inf)

    for s in range(os_max + 1):
        cosf = np.cos(s * phi)
        es = (u * cosf).sum(axis=-1) * q / np.pi
        e[..., s] = np.where(done, 0.0, es)
        t1 = t1 + (1.0 if s == 0 else 2.0) * es[..., None] * cosf
        b1 = np.max(np.abs(t1 - u) / u, axis=-1)

        hit = b1 <= threshold
        rise = (~hit) & (b1 >= b1_prev)
        newly_hit = (~done) & hit
        newly_rise = (~done) & rise
        keep = np.where(newly_hit, s, keep)
        il = np.where(newly_hit, s, il)
        keep = np.where(newly_rise, (s - 1) if drop_riser else s, keep)
        il = np.where(newly_rise, s - 1, il)
        done = done | hit | rise
        b1_prev = np.where(done, b1_prev, b1)

    mask = np.arange(os_max + 1) <= keep[..., None]
    return e * mask, il


# ---------------------------------------------------------------------------
# Roujean BRDF
# ---------------------------------------------------------------------------

def roujean_f(k0: float, k1: float, k2: float, c1, s1, c2, s2, phi_rj):
    """Roujean BRDF * cos(Teta1) * cos(Teta2) (``SOS_CALC_F_ROUJEAN``,
    ``src/SOS_ROUJEAN.F:891``).

    ``phi_rj`` is the relative azimuth in the Roujean convention; zenith
    angles beyond the 60 deg validity limit are clamped inside the kernels
    but the true cosines scale the reflectance->radiance conversion
    (``src/SOS_ROUJEAN.F:1015-1035``).
    """
    xphi = np.abs(np.asarray(phi_rj, dtype=np.float64))
    xphi = np.where(xphi > np.pi, 2.0 * np.pi - xphi, xphi)

    lim_s = np.cos(np.deg2rad(cte.TETAS_LIM_ROUJEAN))
    lim_v = np.cos(np.deg2rad(cte.TETAV_LIM_ROUJEAN))
    xc1 = np.where(c1 < lim_s, lim_s, c1)
    xs1 = np.where(c1 < lim_s, np.sin(np.deg2rad(cte.TETAS_LIM_ROUJEAN)), s1)
    xc2 = np.where(c2 < lim_v, lim_v, c2)
    xs2 = np.where(c2 < lim_v, np.sin(np.deg2rad(cte.TETAV_LIM_ROUJEAN)), s2)

    cosphi = np.cos(xphi)
    tants = xs1 / xc1
    tantv = xs2 / xc2

    f1 = 0.5 * ((np.pi - xphi) * cosphi + np.sin(xphi)) * tants * tantv
    f1 = f1 - tants - tantv
    f1 = f1 - np.sqrt(tants * tants + tantv * tantv
                      - 2.0 * tantv * tants * cosphi)
    f1 = f1 / np.pi

    coszeta = np.clip(xc1 * xc2 + xs1 * xs2 * cosphi, -1.0, 1.0)
    zeta = np.arccos(coszeta)
    f2 = 4.0 * ((np.pi / 2.0 - zeta) * coszeta + np.sin(zeta)) \
        / (3.0 * np.pi * (xc1 + xc2))
    f2 = f2 - 1.0 / 3.0

    return (k0 + k1 * f1 + k2 * f2) * c2 * c1


def roujean_fourier(mu_pos: np.ndarray, k0: float, k1: float, k2: float,
                    os_nb: int):
    """E[a, b, s] of the Roujean BRDF over the pair grid (a = incidence).

    Sampling phiOS = i*pi/NU, evaluated at phiRJ = pi - phiOS
    (``src/SOS_ROUJEAN.F:536-545``); stop threshold
    ``CTE_SEUIL_SF_ROUJEAN`` (``inc/SOS.h:339``).
    """
    c1 = mu_pos[:, None, None]
    c2 = mu_pos[None, :, None]
    s1 = np.sqrt(1.0 - c1 * c1)
    s2 = np.sqrt(1.0 - c2 * c2)
    phi_os = np.pi * np.arange(cte.PH_NU + 1) / cte.PH_NU
    u = roujean_f(k0, k1, k2, c1, s1, c2, s2, np.pi - phi_os)
    if np.any(u < 0.0):
        raise ValueError("Roujean BRDF < 0 for the given K0/K1/K2 "
                         "(reference error exit, src/SOS_ROUJEAN.F:545)")
    return _riemann_fourier(u, os_nb, cte.SEUIL_SF_ROUJEAN, drop_riser=False)


def roujean_matrices(mu_pos: np.ndarray, k0: float, k1: float, k2: float,
                     os_nb: int):
    """Fourier reflection matrices of the Roujean BRDF.

    P11(incident, outgoing) = E[s] directly; polarization elements zero
    (``SOS_MISE_FORMAT_RJ``, ``src/SOS_ROUJEAN.F:1150-1190``); float32
    round-trip mirrors the reference's REAL*4 records.
    """
    e, _ = roujean_fourier(mu_pos, k0, k1, k2, os_nb)
    n = mu_pos.shape[0]
    rmat = np.zeros((os_nb + 1, 3, 3, n, n))
    rmat[:, 0, 0] = np.moveaxis(e, -1, 0)
    return rmat.astype(np.float32).astype(np.float64)


# ---------------------------------------------------------------------------
# BPDF weight functions
# ---------------------------------------------------------------------------

def rondeaux_fourier(mu_pos: np.ndarray, os_nm: int):
    """Rondeaux-Herman weight: G = 1/(1/c1 + 1/c2), azimuth-independent
    (``SOS_GSF_RONDEAUX_BREON`` with IRONDEAUX=1,
    ``src/SOS_SURFACE_BPDF.F:530-545``)."""
    n = mu_pos.shape[0]
    e = np.zeros((n, n, os_nm + 1))
    c1 = mu_pos[:, None]
    c2 = mu_pos[None, :]
    e[..., 0] = 1.0 / (1.0 / c1 + 1.0 / c2)
    return e


def breon_fourier(mu_pos: np.ndarray, os_nm: int):
    """Breon weight: G = 1 (``src/SOS_SURFACE_BPDF.F:535``)."""
    n = mu_pos.shape[0]
    e = np.zeros((n, n, os_nm + 1))
    e[..., 0] = 1.0
    return e


def nadal_f(ind: float, alpha: float, beta: float, c1, s1, c2, s2, phi):
    """F21nadal/F21fresnel * 4*pi*c1^2*c2
    (``SOS_CALC_F21_NADAL_SUR_FRESNEL``, ``src/SOS_SURFACE_BPDF.F:1129``)."""
    cosdif = -c1 * c2 + s1 * s2 * np.cos(phi)
    cosw = np.sqrt(0.5 * (1.0 - cosdif))
    v = 0.5 * (1.0 + cosdif)
    ind2 = ind * ind
    x = np.sqrt(ind2 - v)
    rl = (ind2 * cosw - x) / (ind2 * cosw + x)
    rr = (cosw - x) / (cosw + x)
    f21_fresnel = 0.5 * (rr * rr - rl * rl)
    f21_nadal = alpha * (1.0 - np.exp(-beta * f21_fresnel / (c1 + c2)))
    f = np.where(f21_fresnel < 1.0e-10,
                 alpha * beta / (c1 + c2),
                 f21_nadal / np.where(f21_fresnel < 1.0e-10, 1.0,
                                      f21_fresnel))
    return f * 4.0 * c1 * np.pi * c2 * c1


def nadal_fourier(mu_pos: np.ndarray, ind: float, alpha: float, beta: float,
                  os_nb: int):
    """E[a, b, s] of the Nadal weight ratio (``SOS_F21SF_NADAL``,
    ``src/SOS_SURFACE_BPDF.F:686``); alpha/beta are quantized to the
    reference's F6.4/F4.1 cache-key formats (``src/SOS_SURFACE.F:855-860``).
    """
    alpha = np.round(alpha * 1.0e4) / 1.0e4
    beta = np.round(beta * 10.0) / 10.0
    c1 = mu_pos[:, None, None]
    c2 = mu_pos[None, :, None]
    s1 = np.sqrt(1.0 - c1 * c1)
    s2 = np.sqrt(1.0 - c2 * c2)
    phi = np.pi * np.arange(cte.PH_NU + 1) / cte.PH_NU
    u = nadal_f(ind, alpha, beta, c1, s1, c2, s2, phi)
    return _riemann_fourier(u, os_nb, cte.SEUIL_SF_NADAL, drop_riser=True)


def maignan_fourier(mu_pos: np.ndarray, coef_c: float, os_nm: int):
    """E[a, b, s] of the Maignan weight
    G = C * exp(-tan(TetaI)) / (1/c1 + 1/c2) via the glitter dyadic scheme
    (``SOS_GSF_MAIGNAN``/``SOS_CALCG_MAIGNAN``,
    ``src/SOS_SURFACE_BPDF.F:1305,1606``)."""
    c1 = mu_pos[:, None]
    c2 = mu_pos[None, :]
    s12 = np.sqrt(1.0 - c1 * c1) * np.sqrt(1.0 - c2 * c2)
    denom = 1.0 / c1 + 1.0 / c2

    def g(phi):
        phi = np.asarray(phi, dtype=np.float64)
        if phi.ndim > 2:
            c12_, s12_, den_ = (c1 * c2)[..., None], s12[..., None], \
                denom[..., None]
        else:
            c12_, s12_, den_ = c1 * c2, s12, denom
        cos_2i = c12_ - s12_ * np.cos(phi)
        tan2_i = np.maximum((1.0 - cos_2i) / (1.0 + cos_2i), 0.0)
        return coef_c * np.exp(-np.sqrt(tan2_i)) / den_

    return fourier_dyadic(g, os_nm)


# ---------------------------------------------------------------------------
# Full BPDF+BRDF reflection matrices (the ISURF 4..7 products)
# ---------------------------------------------------------------------------

def bpdf_matrices(model: str, mu_pos: np.ndarray, w_pos: np.ndarray,
                  ind: float, os_nb: int, os_ns: int, os_nm: int,
                  k0: float = 0.0, k1: float = 0.0, k2: float = 0.0,
                  alpha: float = 0.0, beta: float = 0.0,
                  coef_c: float = 0.0):
    """Fourier reflection matrices for ISURF 4 (rondeaux) / 5 (breon) /
    6 (nadal) / 7 (maignan): BPDF composed with the Fresnel expansion
    (COEFF=1, ``src/SOS_SURFACE_BPDF.F:330-338``) plus the Roujean BRDF
    matrix (``SOS_BPDF_AJOUT_BRDF``, ``src/SOS_SURFACE.F:2503``).
    Returns (os_nb+1, 3, 3, N, N) float64.
    """
    if model == "rondeaux":
        e = rondeaux_fourier(mu_pos, os_nm)
    elif model == "breon":
        e = breon_fourier(mu_pos, os_nm)
    elif model == "nadal":
        e = nadal_fourier(mu_pos, ind, alpha, beta, os_nb)[0]
    elif model == "maignan":
        e = maignan_fourier(mu_pos, coef_c, os_nm)[0]
    else:
        raise ValueError(f"unknown BPDF model {model!r}")

    need = os_nb + os_ns + 1
    if e.shape[-1] < need:      # zero above the model's decomposition order
        e = np.concatenate(
            [e, np.zeros(e.shape[:-1] + (need - e.shape[-1],))], axis=-1)
    coeffs = fresnel_expansion(mu_pos, w_pos, ind, os_ns)
    rmat = reflection_matrices(e, mu_pos, coeffs, 1.0, os_nb, os_ns)
    return rmat + roujean_matrices(mu_pos, k0, k1, k2, os_nb)
