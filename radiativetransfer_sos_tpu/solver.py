"""Core successive-orders-of-scattering solver (polarized, plane-parallel).

TPU-native re-design of reference ``SOS_OS`` (``src/SOS_OS.F:303``) and its
subroutines.  Structural mapping:

===============================  =============================================
reference                        here
===============================  =============================================
Fourier loop ``DO IS``           batch axis S — every order solved at once
  (``src/SOS_OS.F:872``)         (orders are independent; the sequential
                                 early-exit test is reproduced post-hoc in
                                 ``fourier_stop_mask``)
``SOS_NOYAUX``                   precomputed GSF basis + ``kernels.py`` matmuls
``SOS_FSOURCE_ORDRE1``           ``primary_source``
``SOS_FSOURCE_ORDREIG``          ``scatter_source`` — one batched matmul
  (``src/SOS_OS.F:2663``)        over the (3*(2N+1))^2 block kernel (MXU)
``SOS_INTEGR_EPOPT``             ``sweep_up`` / ``sweep_down`` via
  (``src/SOS_OS.F:2222``)        ``lax.associative_scan`` on affine maps
``DO 503`` scattering loop       ``lax.scan`` over IG with per-order masking
``SOS_PARAM_CONV`` etc.          ``_param_conv`` / ``_arret_diffus_*``
``SOS_AJOUT_QUEUE``              ``_queue`` (geometric-series tail)
``SOS_ARRET_FOURIER``            ``fourier_stop_mask``
===============================  =============================================

Direction layout: signed axis of size D = 2N+1; ``d = N + j`` maps to the
reference's signed Gauss index ``j`` and the center slot d = N is the solar
direction (weight 0).  Positive hemisphere view index p = 0..N-1 corresponds
to Fortran j = p+1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from . import constants as cte


class SurfaceInputs(NamedTuple):
    """Ground boundary description for one solve.

    ``rmat``: Fourier reflection matrices (S, 3, 3, N, N) indexed
    [order, out-Stokes, in-Stokes, incident angle j, outgoing angle k]
    (reference surface file records, ``src/SOS_OS.F:916-925``); None for a
    plain Lambertian ground.  ``f11/f12/f33``: flat-sea Fresnel vectors of
    length N+1 with slot 0 = solar incidence
    (``SOS_MAT_FRESNEL_PLAN_REFL``, ``src/SOS_OS.F:1719``).
    """
    rho: jnp.ndarray                      # scalar albedo
    rmat: Optional[jnp.ndarray] = None
    f11: Optional[jnp.ndarray] = None
    f12: Optional[jnp.ndarray] = None
    f33: Optional[jnp.ndarray] = None
    ind_surf: Optional[jnp.ndarray] = None


class SolveInputs(NamedTuple):
    h: jnp.ndarray          # (NT+1,) cumulative optical depth, 0 at TOA
    xdel: jnp.ndarray       # (NT+1,) aerosol scattering fraction
    ydel: jnp.ndarray       # (NT+1,) molecular scattering fraction
    k_aer: jnp.ndarray      # (S, 3, 3, D, D) aerosol Fourier kernels
    k_mol: jnp.ndarray      # (S, 3, 3, D, D) molecular Fourier kernels
    mu_pos: jnp.ndarray     # (N,) positive direction cosines
    w_pos: jnp.ndarray      # (N,) Gauss weights
    tab: jnp.ndarray        # scalar mu_s = -cos(theta_s) < 0
    n0: int                 # 0-based index of the solar angle in mu_pos
    surface: SurfaceInputs = SurfaceInputs(rho=0.0)
    zprof: Optional[jnp.ndarray] = None   # (NT+1,) level altitudes (km)
    zout_km: Optional[jnp.ndarray] = None  # scalar output altitude


class SolveOptions(NamedTuple):
    igmax: int = cte.DEFAULT_IGMAX
    imat_surf: bool = False      # BRDF/BPDF matrices present
    ifresnel: bool = False       # flat-sea Fresnel reflection
    ipolar: bool = True
    use_zout: bool = False       # output at zout_km instead of TOA/ground
    seuil_cv_sg: float = cte.PH_SEUIL_CV_SG
    seuil_sumdif: float = cte.PH_SEUIL_SUMDIF
    seuil_valdif: float = cte.PH_SEUIL_VALDIF
    seuil_sf: float = cte.PH_SEUIL_SF


class FourierResult(NamedTuple):
    """Per-Fourier-order radiances, stacked over the S axis."""
    i3z: jnp.ndarray        # (S, 3, D) Stokes (I,Q,U) at the output level(s)
    i3bnd: jnp.ndarray      # (S, 3, D) Stokes at TOA (+) / ground (-)
    emoins: jnp.ndarray     # scalar: downward diffuse flux (IS=0 slice)
    eplus: jnp.ndarray      # scalar: upward diffuse flux (IS=0 slice)
    tauout: Optional[jnp.ndarray] = None  # optical depth of the output level


# ---------------------------------------------------------------------------
# Hemisphere views of the signed direction axis
# ---------------------------------------------------------------------------

def up_view(field):
    """(..., D) -> (..., N) positive directions, p = 0..N-1 <-> j = p+1."""
    n = (field.shape[-1] - 1) // 2
    return field[..., n + 1:]


def down_view(field):
    """(..., D) -> (..., N) negative directions in the same p ordering."""
    n = (field.shape[-1] - 1) // 2
    return jnp.flip(field[..., :n], axis=-1)


def assemble_signed(up, down):
    """Inverse of (up_view, down_view); center slot zero."""
    n = up.shape[-1]
    center = jnp.zeros(up.shape[:-1] + (1,), dtype=up.dtype)
    return jnp.concatenate([jnp.flip(down, axis=-1), center, up], axis=-1)


# ---------------------------------------------------------------------------
# Optical-depth sweep (SOS_INTEGR_EPOPT, src/SOS_OS.F:2222)
# ---------------------------------------------------------------------------

def _affine_compose(prev, nxt):
    """Compose affine maps applied in sequence: z -> a2*(a1*z+b1)+b2."""
    a1, b1 = prev
    a2, b2 = nxt
    return a1 * a2, b1 * a2 + b2


def sweep_up(h, mu_pos, src_up, bc_ground):
    """Integrate the upward field from ground to TOA.

    ``src_up``: (NT+1, 3, N) source at each level; ``bc_ground``: (3, N).
    Returns the field at every level, (NT+1, 3, N).  Linear-in-tau source
    per layer (``src/SOS_OS.F:2279-2310``), evaluated with a log-depth
    associative scan instead of the sequential level loop.
    """
    dtau = (h[1:] - h[:-1])[:, None, None]              # (NT, 1, 1)
    att = jnp.exp(-dtau / mu_pos[None, None, :])        # (NT, 1, N) -> bcast
    b_lo = src_up[:-1]                                  # level i   (lower tau)
    # zero-thickness padding layers are identity steps (a=1, b=0)
    a_lin = jnp.where(dtau > 0.0,
                      (src_up[1:] - b_lo) / jnp.where(dtau > 0.0, dtau, 1.0),
                      0.0)
    step_b = (1.0 - att) * (a_lin * mu_pos + b_lo) - a_lin * att * dtau
    step_a = jnp.broadcast_to(att, step_b.shape)

    # steps are applied from i = NT-1 down to 0: reverse, prefix-compose.
    a_rev = jnp.flip(step_a, axis=0)
    b_rev = jnp.flip(step_b, axis=0)
    ca, cb = lax.associative_scan(_affine_compose, (a_rev, b_rev), axis=0)
    levels_rev = ca * bc_ground[None] + cb              # level NT-1-t
    field = jnp.concatenate([jnp.flip(levels_rev, axis=0),
                             bc_ground[None]], axis=0)
    return field


def sweep_down(h, mu_pos, src_dn):
    """Integrate the downward field from TOA (zero) to ground.

    ``src_dn``: (NT+1, 3, N) in positive-p ordering (mu = -mu_pos).
    Reference ``src/SOS_OS.F:2320-2354``.
    """
    dtau = (h[1:] - h[:-1])[:, None, None]
    att = jnp.exp(-dtau / mu_pos[None, None, :])        # exp(dtau/(-mu))
    b_hi = src_dn[1:]                                   # level i (higher tau)
    a_lin = jnp.where(dtau > 0.0,
                      (b_hi - src_dn[:-1]) / jnp.where(dtau > 0.0, dtau, 1.0),
                      0.0)
    step_b = (1.0 - att) * (a_lin * (-mu_pos) + b_hi) + a_lin * att * dtau
    step_a = jnp.broadcast_to(att, step_b.shape)

    ca, cb = lax.associative_scan(_affine_compose, (step_a, step_b), axis=0)
    zero = jnp.zeros_like(src_dn[:1])
    return jnp.concatenate([zero, cb], axis=0)          # z0 = 0 -> field = cb


def sweep(h, mu_pos, src, bc_ground):
    """Full signed-axis sweep; ``src``/(result): (NT+1, 3, D)."""
    f_up = sweep_up(h, mu_pos, up_view(src), bc_ground)
    f_dn = sweep_down(h, mu_pos, down_view(src))
    return assemble_signed(f_up, f_dn)


# ---------------------------------------------------------------------------
# Source functions
# ---------------------------------------------------------------------------

def scatter_source(k_aer, k_mol, xdel, ydel, w_signed, field):
    """Order-IG source from the order-(IG-1) field (SOS_FSOURCE_ORDREIG).

    ``field``: (NT+1, 3, D).  Computes
    ``S(i,s,k) = 0.5 * sum_{t,j} P_mix(i)[s,t](k,j) w(j) field(i,t,j)``
    with ``P_mix(i) = xdel(i) K_aer + ydel(i) K_mol``
    (``src/SOS_OS.F:2859-2905``), as two batched matmuls.
    """
    lw = field * w_signed                                # (NT+1, 3, D)
    sa = jnp.einsum("stkj,itj->isk", k_aer, lw,
                    preferred_element_type=field.dtype)
    sm = jnp.einsum("stkj,itj->isk", k_mol, lw,
                    preferred_element_type=field.dtype)
    return 0.5 * (xdel[:, None, None] * sa + ydel[:, None, None] * sm)


def primary_source(k_aer, k_mol, xdel, ydel, h, tab):
    """Primary-scattering source from the attenuated direct beam.

    Reference ``SOS_FSOURCE_ORDRE1`` (``src/SOS_OS.F:2431``): the direct beam
    enters through the solar column (center slot) of the phase kernels with
    attenuation ``CH(i) = exp(-h_i/|mu_s|)/4`` (``src/SOS_OS.F:837-839``).
    """
    n = (k_aer.shape[-1] - 1) // 2
    ch = jnp.exp(h / tab) / 4.0                          # tab < 0
    col_a = k_aer[:, 0, :, n]                            # (3, D): P[:,0](.,sun)
    col_m = k_mol[:, 0, :, n]
    mix = xdel[:, None, None] * col_a + ydel[:, None, None] * col_m
    return ch[:, None, None] * mix                       # (NT+1, 3, D)


def fresnel_primary_source(k_aer, k_mol, xdel, ydel, h, tab, f11, f12):
    """Source for the first scattering of the flat-sea-reflected sun beam.

    Transcription of ``SOS_FSOURCE_DIFF_FRESNEL1`` (``src/SOS_OS.F:3106``):
    staggered levels — the upward source at level i uses the level-i mixture,
    the downward source at level i+1 uses the level-(i+1) mixture; the beam
    travels down to the ground, reflects with (F11sun, F12sun) and climbs
    back up, hence the ``exp((2 h_NT - h_i)/|mu_s|)`` attenuations.
    """
    n = (k_aer.shape[-1] - 1) // 2
    f11s, f12s = f11[0], f12[0]

    # signed-axis index helpers
    pj = jnp.arange(1, n + 1)
    idx_pos = n + pj          # +j
    idx_neg = n - pj          # -j
    c = n                     # solar column

    def elem(so, si, a_idx, b_idx, sign=1.0):
        ka = sign * k_aer[so, si][a_idx, b_idx]
        km = sign * k_mol[so, si][a_idx, b_idx]
        return ka, km          # (P,) vectors

    # raw kernels from the block operator:
    # BP(a,b)=P00(a,b); GR(a,b)=P01(a,b); GT(a,b)=-P02(a,b);
    # ARR=P11; ART(a,b)=-P21(a,b)
    bp_0mj = elem(0, 0, c, idx_neg)                      # BP(0,-j)
    bp_0j = elem(0, 0, c, idx_pos)
    gr_mj0 = elem(0, 1, idx_neg, c)                      # GR(-j,0)
    gr_j0 = elem(0, 1, idx_pos, c)
    gr_0mj = elem(0, 1, c, idx_neg)
    gr_0j = elem(0, 1, c, idx_pos)
    gt_0mj = elem(0, 2, c, idx_neg, -1.0)                # GT(0,-j) = -P02
    gt_0j = elem(0, 2, c, idx_pos, -1.0)
    arr_0mj = elem(1, 1, c, idx_neg)
    arr_0j = elem(1, 1, c, idx_pos)
    art_mj0 = elem(2, 1, idx_neg, c, -1.0)               # ART(-j,0) = -P21
    art_j0 = elem(2, 1, idx_pos, c, -1.0)

    def mixl(pair, w_a, w_m):
        ka, km = pair
        return w_a[:, None] * ka[None, :] + w_m[:, None] * km[None, :]

    coefnt = jnp.exp(2.0 * h[-1] / tab) / 4.0
    coef = coefnt * jnp.exp(-h / tab)                    # (NT+1,)

    xp, yr = xdel, ydel
    # upward source rows, defined at levels 0..NT-1 (src/SOS_OS.F:3277-3282)
    up_i = coef[:-1, None] * (f11s * mixl(bp_0mj, xp[:-1], yr[:-1])
                              + f12s * mixl(gr_mj0, xp[:-1], yr[:-1]))
    up_q = coef[:-1, None] * (f11s * mixl(gr_0mj, xp[:-1], yr[:-1])
                              + f12s * mixl(arr_0mj, xp[:-1], yr[:-1]))
    up_u = coef[:-1, None] * (f11s * mixl(gt_0mj, xp[:-1], yr[:-1])
                              + f12s * mixl(art_mj0, xp[:-1], yr[:-1]))
    zrow = jnp.zeros((1, n), dtype=h.dtype)
    src_up = jnp.stack([jnp.concatenate([up_i, zrow]),
                        jnp.concatenate([up_q, zrow]),
                        jnp.concatenate([up_u, zrow])], axis=1)

    # downward source rows, defined at levels 1..NT (src/SOS_OS.F:3285-3289)
    dn_i = coef[1:, None] * (f11s * mixl(bp_0j, xp[1:], yr[1:])
                             + f12s * mixl(gr_j0, xp[1:], yr[1:]))
    dn_q = coef[1:, None] * (f11s * mixl(gr_0j, xp[1:], yr[1:])
                             + f12s * mixl(arr_0j, xp[1:], yr[1:]))
    dn_u = coef[1:, None] * (f11s * mixl(gt_0j, xp[1:], yr[1:])
                             + f12s * mixl(art_j0, xp[1:], yr[1:]))
    src_dn = jnp.stack([jnp.concatenate([zrow, dn_i]),
                        jnp.concatenate([zrow, dn_q]),
                        jnp.concatenate([zrow, dn_u])], axis=1)

    return assemble_signed(src_up, src_dn)


# ---------------------------------------------------------------------------
# Ground boundary conditions
# ---------------------------------------------------------------------------

def _surface_reflect(prev_dn_ground, inp: SolveInputs, opt: SolveOptions,
                     rmat_s, is0):
    """Upward ground BC for orders IG >= 2 (``src/SOS_OS.F:1164-1239``)."""
    mu, w = inp.mu_pos, inp.w_pos
    rho = inp.surface.rho
    # Lambertian: LSOL = 2 rho sum w mu I_dn(ground) at IS = 0 only
    lsol = 2.0 * rho * jnp.sum(w * mu * prev_dn_ground[0]) * is0
    bc = jnp.zeros_like(prev_dn_ground).at[0].set(lsol)
    if opt.imat_surf:
        v = jnp.einsum("xyjk,yj->xk", rmat_s, prev_dn_ground * w)
        bc = bc + 2.0 * v / mu
    if opt.ifresnel:
        f11 = inp.surface.f11[1:]
        f12 = inp.surface.f12[1:]
        f33 = inp.surface.f33[1:]
        add_i = f11 * prev_dn_ground[0] + f12 * prev_dn_ground[1]
        add_q = f12 * prev_dn_ground[0] + f11 * prev_dn_ground[1]
        add_u = f33 * prev_dn_ground[2]
        bc = bc + jnp.stack([add_i, add_q, add_u])
    return bc


def _order1_bc(inp: SolveInputs, opt: SolveOptions, rmat_s, is0):
    """Ground BC for the primary interaction (``src/SOS_OS.F:968-992``).

    Returns (bc (3,N), xr (N,)) — ``xr`` is the Lambertian part, kept apart
    for the direct-reflection bookkeeping (``src/SOS_OS.F:1047-1084``).
    """
    mu = inp.mu_pos
    h_nt = inp.h[-1]
    xr = -inp.surface.rho * inp.tab * jnp.exp(h_nt / inp.tab) * is0
    xr = jnp.broadcast_to(xr, mu.shape)
    bc = jnp.zeros((3,) + mu.shape, dtype=mu.dtype).at[0].set(xr)
    if opt.imat_surf:
        rr = jnp.exp(h_nt / inp.tab) / mu
        bc = bc + rmat_s[:, 0, inp.n0, :] * rr
    return bc, xr


# ---------------------------------------------------------------------------
# Convergence machinery (src/SOS_OS.F:3377-3796 and 3871)
# ---------------------------------------------------------------------------

def _safe_div(a, b):
    return jnp.where(b != 0.0, a / jnp.where(b != 0.0, b, 1.0), 0.0)


def _param_conv(a1, d1, g1, i3):
    """Geometric-series convergence parameter (``SOS_PARAM_CONV``)."""
    ok = (a1 != 0.0) & (d1 != 0.0) & (i3 != 0.0)
    q2 = _safe_div(g1, d1)
    q1 = _safe_div(d1, a1)
    den = (1.0 - q2) ** 2
    y = _safe_div(q2 - q1, den) * _safe_div(g1, i3)
    y = jnp.where(ok, jnp.abs(y), 0.0)
    return jnp.max(y)


def _queue(d1, g1):
    """Geometric tail G1/(1 - G1/D1) (``SOS_AJOUT_QUEUE``)."""
    return jnp.where(d1 != 0.0, g1 / (1.0 - _safe_div(g1, d1)), 0.0)


def _boundary(field):
    """(NT+1,3,D) -> (3,D): TOA for upward slots, ground for downward."""
    n = (field.shape[-1] - 1) // 2
    top = field[0]
    bot = field[-1]
    mask_up = (jnp.arange(field.shape[-1]) > n)
    return jnp.where(mask_up, top, bot)


# ---------------------------------------------------------------------------
# One Fourier order: primary interaction + scattering-order loop
# ---------------------------------------------------------------------------

def _solve_one_order(k_aer_s, k_mol_s, rmat_s, is0,
                     inp: SolveInputs, opt: SolveOptions):
    """Solve the IG loop for one Fourier order; returns accumulated fields.

    Outputs: i3out (NT+1, 3, D) accumulated Stokes, i3 (3, D) at the
    convergence boundary (TOA up / ground down).
    """
    h, xdel, ydel = inp.h, inp.xdel, inp.ydel
    mu, w = inp.mu_pos, inp.w_pos
    n = mu.shape[0]
    d = 2 * n + 1
    w_signed = jnp.concatenate([jnp.flip(w), jnp.zeros((1,), w.dtype), w])

    # ----- order IG = 1 -----
    src1 = primary_source(k_aer_s, k_mol_s, xdel, ydel, h, inp.tab)
    bc1, xr1 = _order1_bc(inp, opt, rmat_s, is0)
    field = sweep(h, mu, src1, bc1)

    if opt.ifresnel:
        srcf = fresnel_primary_source(k_aer_s, k_mol_s, xdel, ydel, h,
                                      inp.tab, inp.surface.f11,
                                      inp.surface.f12)
        field = field + sweep(h, mu, srcf, jnp.zeros_like(bc1))

    # direct-reflection contribution to be removed at the end
    # (src/SOS_OS.F:1062-1084)
    if opt.imat_surf:
        up_ground = up_view(field)[-1]                  # == bc1 (+ fresnel)
        att = jnp.exp(-(h[-1] - h)[:, None, None] / mu)
        rii_out_up = att * (up_ground - jnp.stack(
            [xr1, jnp.zeros_like(xr1), jnp.zeros_like(xr1)]))[None]
    else:
        rii_out_up = jnp.zeros((h.shape[0], 3, n), dtype=h.dtype)

    i3out = field
    i3 = _boundary(field)
    d1 = i3
    d1out = field
    a1 = jnp.zeros_like(i3)

    def body(carry, ig):
        (fld, i3_c, i3out_c, a1_c, d1_c, d1out_c, done) = carry

        prev_dn_ground = down_view(fld)[-1]
        src = scatter_source(k_aer_s, k_mol_s, xdel, ydel, w_signed, fld)
        bc = _surface_reflect(prev_dn_ground, inp, opt, rmat_s, is0)
        new = sweep(h, mu, src, bc)
        g1 = _boundary(new)

        # geometric-series test, skipped at IG == 2 (src/SOS_OS.F:1285-1293)
        z_conv = _param_conv(a1_c, d1_c, g1, i3_c)
        conv = (ig > 2) & (z_conv <= opt.seuil_cv_sg) & (~done)

        # converged: add the geometric tail, stop (src/SOS_OS.F:1299-1315)
        tail_bnd = _queue(d1_c, g1)
        tail_out = _queue(d1out_c, new)
        i3_conv = i3_c + tail_bnd
        i3out_conv = i3out_c + tail_out

        # not converged: accumulate order IG (src/SOS_OS.F:1343-1363)
        active = (~done) & (~conv)
        i3_acc = i3_c + g1
        i3out_acc = i3out_c + new

        i3_n = jnp.where(conv, i3_conv, jnp.where(active, i3_acc, i3_c))
        i3out_n = jnp.where(conv, i3out_conv,
                            jnp.where(active, i3out_acc, i3out_c))

        # stop tests on the order-IG magnitude (src/SOS_OS.F:1368-1406)
        z_abs = jnp.max(jnp.abs(g1))
        stop_abs = z_abs <= opt.seuil_valdif
        z_rel = jnp.max(jnp.where(i3_n != 0.0,
                                  jnp.abs(_safe_div(g1, i3_n)), 0.0))
        stop_rel = z_rel <= opt.seuil_sumdif
        done_n = done | conv | (active & (stop_abs | stop_rel))

        fld_n = jnp.where(active, new, fld)
        a1_n = jnp.where(active, d1_c, a1_c)
        d1_n = jnp.where(active, g1, d1_c)
        d1out_n = jnp.where(active, new, d1out_c)
        return (fld_n, i3_n, i3out_n, a1_n, d1_n, d1out_n, done_n), None

    init = (field, i3, i3out, a1, d1, d1out, jnp.asarray(False))
    igs = jnp.arange(2, opt.igmax + 1)
    (field, i3, i3out, a1, d1, d1out, done), _ = lax.scan(body, init, igs)

    # remove the stored direct-reflection term (src/SOS_OS.F:1421-1439)
    if opt.imat_surf:
        i3out = i3out.at[..., n + 1:].add(-rii_out_up)
        i3 = i3.at[..., n + 1:].add(-rii_out_up[0])
    return i3, i3out


def solve_fourier(inp: SolveInputs, opt: SolveOptions) -> FourierResult:
    """Solve every Fourier order; batched over the S axis via ``vmap``."""
    res = solve_fourier_batch(
        inp._replace(h=inp.h[None], xdel=inp.xdel[None], ydel=inp.ydel[None],
                     zprof=None if inp.zprof is None else inp.zprof[None]),
        opt)
    return jax.tree_util.tree_map(lambda x: x[0], res)


def solve_fourier_batch(inp: SolveInputs, opt: SolveOptions) -> FourierResult:
    """Multi-profile solve: ``h/xdel/ydel`` (and ``zprof``) carry a leading
    term axis T (the CKD batch); kernels/surface are shared.

    The (T x S) problem grid is flattened into ONE ``vmap`` axis of index
    pairs — every instance gathers its per-term profile and per-order
    kernel slices.  A nested ``vmap`` (terms over orders) produces the same
    results but compiles catastrophically slower on TPU (~80x at the demo
    shape), so this single-level layout is the production path.
    Results get shape (T, ...).
    """
    t_n = inp.h.shape[0]
    n_s = inp.k_aer.shape[0]
    n = inp.mu_pos.shape[0]
    is0 = jnp.zeros((n_s,), dtype=inp.h.dtype).at[0].set(1.0)

    if inp.surface.rmat is not None:
        rmat = inp.surface.rmat
    else:
        rmat = jnp.zeros((n_s, 3, 3, n, n), dtype=inp.h.dtype)

    tt, ss = jnp.meshgrid(jnp.arange(t_n), jnp.arange(n_s), indexing="ij")

    tab_batched = jnp.ndim(inp.tab) == 1       # per-term incidence (trans runs)

    def one(t_idx, s_idx):
        inner = inp._replace(
            h=inp.h[t_idx], xdel=inp.xdel[t_idx], ydel=inp.ydel[t_idx],
            tab=inp.tab[t_idx] if tab_batched else inp.tab,
            zprof=None if inp.zprof is None else inp.zprof[t_idx])
        return _solve_one_order(inp.k_aer[s_idx], inp.k_mol[s_idx],
                                rmat[s_idx], is0[s_idx], inner, opt)

    i3, i3out = jax.vmap(one)(tt.ravel(), ss.ravel())
    d = 2 * n + 1
    i3 = i3.reshape(t_n, n_s, 3, d)
    i3out = i3out.reshape((t_n, n_s) + i3out.shape[1:])

    # diffuse fluxes at IS = 0 (src/SOS_OS.F:1447-1456), per term
    i3_0 = i3[:, 0]                                  # (T, 3, D)
    dn0 = down_view(i3_0)                            # (T, 3, N)
    up0 = up_view(i3_0)
    wmu = inp.mu_pos * inp.w_pos
    emoins = -2.0 / inp.tab * jnp.sum(wmu * dn0[:, 0], axis=-1)
    eplus = -2.0 / inp.tab * jnp.sum(wmu * up0[:, 0], axis=-1)

    if opt.use_zout:
        # arbitrary output altitude: both hemispheres interpolated at the
        # bracketing profile levels (src/SOS_OS.F:1511-1534)
        i3z, tauout = jax.vmap(interp_zout, in_axes=(0, 0, 0, None))(
            i3out, inp.zprof, inp.h, inp.zout_km)
    else:
        # default: TOA for up, ground for down (src/SOS_OS.F:1484-1506)
        mask_up = jnp.arange(d) > n
        i3z = jnp.where(mask_up, i3out[:, :, 0], i3out[:, :, -1])
        tauout = jnp.zeros((t_n,), dtype=i3z.dtype)
    return FourierResult(i3z=i3z, i3bnd=i3, emoins=emoins, eplus=eplus,
                         tauout=tauout)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("opt",))
def solve_fourier_jit(inp: SolveInputs, opt: SolveOptions) -> FourierResult:
    """Jitted ``solve_fourier`` (``opt`` is compile-time static)."""
    return solve_fourier(inp, opt)


def interp_zout(i3out, zprof, h, zout):
    """Radiance and optical depth at an arbitrary output altitude.

    Linear interpolation between the two bracketing profile levels
    (``src/SOS_OS.F:1511-1534``, ``src/SOS.F:570-585``).
    """
    j = jnp.searchsorted(-zprof, -zout, side="left")
    j = jnp.clip(j, 1, zprof.shape[0] - 1)
    zz = (zout - zprof[j - 1]) / (zprof[j] - zprof[j - 1])
    i3z = (1.0 - zz) * i3out[:, j - 1] + zz * i3out[:, j]
    tauout = (1.0 - zz) * h[j - 1] + zz * h[j]
    return i3z, tauout


def fourier_stop_mask(i3bnd, seuil_sf: float = cte.PH_SEUIL_SF):
    """Replicates the sequential Fourier early exit, post-hoc.

    The reference accumulates ``I4 += coef*I3`` / ``I5 += coef*sign*I3`` per
    order and leaves the IS loop at the first order whose relative
    contribution drops below ``seuil_sf`` (``SOS_ARRET_FOURIER``,
    ``src/SOS_OS.F:3709-3796``; exit ``:1580-1589``).  Returns a boolean mask
    over the S axis selecting exactly the orders the reference would have
    produced.
    """
    n_s = i3bnd.shape[0]
    s = jnp.arange(n_s)
    coef = jnp.where(s == 0, 1.0, 2.0)[:, None, None]
    sign = jnp.where(s % 2 == 0, 1.0, -1.0)[:, None, None]
    i4 = jnp.cumsum(coef * i3bnd, axis=0)
    i5 = jnp.cumsum(coef * sign * i3bnd, axis=0)

    def ratios(den):
        r = jnp.where(den != 0.0, jnp.abs(_safe_div(i3bnd, den)), 0.0)
        return jnp.max(r.reshape(n_s, -1), axis=1)

    z1 = jnp.maximum(ratios(i4), ratios(i5))
    passed = z1 <= seuil_sf
    # first passing order ends the loop; that order is still included
    idx = jnp.argmax(passed)
    has = jnp.any(passed)
    last = jnp.where(has, idx, n_s - 1)
    return s <= last
