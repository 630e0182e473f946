"""Pallas TPU kernels for the SOS hot path.

The scattering loop of one IG order is two dense passes over the field
(reference ``SOS_FSOURCE_ORDREIG`` + ``SOS_INTEGR_EPOPT``,
``src/SOS_OS.F:2663`` / ``:2222``):

1. **Fused scatter** (:func:`scatter_fused`): source = Gauss-weighted phase
   contraction of the previous-order field.  The kernel reads a field
   chunk, applies the per-level aerosol/molecular mixing *in VMEM*, and
   multiplies by the per-order (2W, W) operator resident in VMEM — one HBM
   read of the field, one write of the source.  The former XLA path
   materialized the mixed+concatenated (.., 2W) operand (an extra
   field-sized round trip) and, before that, a per-instance gather of the
   operator.

2. **Scan sweep** (:func:`sweep_scan_batched`): the layer integration is a
   first-order affine recurrence over NT ~ 600 optical-depth levels.  Both
   hemisphere sweeps run in ONE kernel on the *natural* (B, NT+1, W)
   layout — levels ride the sublane axis and the recurrence is evaluated
   as a Hillis-Steele inclusive scan of affine maps (``pltpu.roll`` along
   sublanes + iota masks), with per-chunk carries across sequential grid
   steps.  This replaces the earlier level-sequential kernel whose
   per-level dynamic-slice steps cost ~80 cycles/level, and kills the two
   full-field XLA transposes ((B, L, W) <-> (L, B, W)) that the
   level-major layout required.

Batch layout: instances (order-major: ``inst = s*T + t``) ride the leading
axis in blocks of ``_IB = 8``; levels are chunked to ``_CH`` (a power of
two — the scan depth is log2(_CH)); lanes carry one hemisphere block
HP = ceil(3N/128)*128.  With order-major instance blocks every block of 8
instances shares one Fourier order, so the scatter kernel's operator block
is a single (2W, W) matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IB = 8           # instances per block = sublane tile height of one row-tile
_CH = 128         # levels per chunk (power of two; scan depth = log2(_CH))


def pad_levels(nt: int) -> int:
    """Level count padded to the kernel chunk size (identity pad layers)."""
    return ((nt + 1 + _CH - 1) // _CH) * _CH


# ---------------------------------------------------------------------------
# Fused scatter: mix + per-order operator matmul (SOS_FSOURCE_ORDREIG)
# ---------------------------------------------------------------------------


def _i0():
    """Index-map zero as i32: under jax_enable_x64 a literal 0 in a block
    index map traces as i64 and Mosaic rejects the kernel (``func.return``
    legalization); program ids are i32, so constants must match.  A numpy
    scalar (not ``jnp``) so evaluating the map allocates nothing."""
    return np.int32(0)


def _scatter_kernel(up_ref, dn_ref, xy_ref, mb_ref, out_u_ref, out_d_ref,
                    precision):
    ib, ch, hp = up_ref.shape
    # bf16 field mode (RTSOS_FIELD_DTYPE): blocks arrive bf16 from HBM
    # (half the traffic of the bandwidth-bound kernel); the mix runs f32
    # in VMEM and the MXU accumulates f32 — other dtypes are untouched
    dt_c = jnp.float32 if up_ref.dtype == jnp.bfloat16 else up_ref.dtype
    u = up_ref[:].astype(dt_c)
    d = dn_ref[:].astype(dt_c)
    x, y = xy_ref[:, :, 0:1], xy_ref[:, :, 1:2]      # (IB, CH, 1) each
    # rows of the flat operator are ordered [M_aer; M_mol] over the
    # [up|dn] field lanes (solver._flat_operator)
    f2 = jnp.concatenate([x * u, x * d, y * u, y * d], axis=-1)
    src = jnp.dot(f2.reshape(ib * ch, 4 * hp), mb_ref[0],
                  preferred_element_type=dt_c, precision=precision)
    src = src.reshape(ib, ch, 2 * hp)
    out_u_ref[:] = src[:, :, :hp].astype(out_u_ref.dtype)
    out_d_ref[:] = src[:, :, hp:].astype(out_d_ref.dtype)


def scatter_fused(up_h, dn_h, xy_b, mboth, blocks_per_order,
                  precision=lax.Precision.DEFAULT, interpret=False):
    """Order-IG scattering source for the whole instance batch.

    ``up_h/dn_h``: (B, LP, HP) field hemispheres; ``xy_b``: (B, LP, 2)
    per-level aerosol/molecular mixing fractions packed on the lane axis
    (ONE input stream: per-step time scales with the number of input
    buffers, ~0.6 ms per extra stream at the demo shape — r5 lab);
    ``mboth``: (S, 2W, W) per-order operators.  ``B = S*T`` order-major
    with ``T`` a multiple of ``_IB`` so each instance block maps to
    exactly one operator (``blocks_per_order = T // _IB``).  Returns the
    source as hemisphere HALVES ``(src_up, src_dn)``, each (B, LP, HP) —
    the sweep consumes the down half forward and the up half reversed, so
    separate arrays let it fetch exactly the half it needs per chunk
    instead of reading the packed (.., W) source twice (r5 lab: the sweep
    was at its memory bound with src double-read).
    """
    b_n, lp, hp = up_h.shape
    w = 2 * hp
    nb, nc = b_n // _IB, lp // _CH
    dtype = up_h.dtype

    half_blk = pl.BlockSpec((_IB, _CH, hp), lambda b, c: (b, c, _i0()),
                            memory_space=pltpu.VMEM)
    col_blk = pl.BlockSpec((_IB, _CH, 2), lambda b, c: (b, c, _i0()),
                           memory_space=pltpu.VMEM)
    # NB: the divisor must stay i32 — under jax_enable_x64 a Python-int
    # divisor weakly promotes the i32 program id to i64 and Mosaic's
    # convert-element-type lowering recurses forever on the i32->i64 cast
    mb_blk = pl.BlockSpec(
        (1, 2 * w, w),
        lambda b, c, _bpo=np.int32(blocks_per_order):
        (b // _bpo, _i0(), _i0()),
        memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((_IB, _CH, hp), lambda b, c: (b, c, _i0()),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_scatter_kernel, precision=precision)
    return pl.pallas_call(
        kern, grid=(nb, nc),
        in_specs=[half_blk, half_blk, col_blk, mb_blk],
        out_specs=(out_blk, out_blk),
        out_shape=(jax.ShapeDtypeStruct((b_n, lp, hp), dtype),
                   jax.ShapeDtypeStruct((b_n, lp, hp), dtype)),
        interpret=interpret,
    )(up_h, dn_h, xy_b, mboth)


# ---------------------------------------------------------------------------
# Scan sweep: both hemisphere integrations in one kernel (SOS_INTEGR_EPOPT)
# ---------------------------------------------------------------------------

def _scan_fwd(a, b, iota):
    """Inclusive Hillis-Steele scan of affine maps along the sublane
    (level) axis, composing toward increasing level."""
    ch = a.shape[1]
    d = 1
    while d < ch:
        a_sh = pltpu.roll(a, jnp.int32(d), 1)
        b_sh = pltpu.roll(b, jnp.int32(d), 1)
        keep = iota >= d
        b = jnp.where(keep, a * b_sh + b, b)
        a = jnp.where(keep, a * a_sh, a)
        d *= 2
    return a, b


def _scan_rev(a, b, iota):
    """Inclusive scan composing toward decreasing level (up sweep).

    ``pltpu.roll`` only takes non-negative shifts — a circular roll by
    ``ch - d`` is the backward shift by ``d``."""
    ch = a.shape[1]
    d = 1
    while d < ch:
        a_sh = pltpu.roll(a, jnp.int32(ch - d), 1)
        b_sh = pltpu.roll(b, jnp.int32(ch - d), 1)
        keep = iota < ch - d
        b = jnp.where(keep, a * b_sh + b, b)
        a = jnp.where(keep, a * a_sh, a)
        d *= 2
    return a, b


def _sweep_kernel(src_dn_ref, src_up_ref, cf_fwd_ref, cf_rev_ref,
                  mur_ref, bc_ref,
                  up_out_ref, dn_out_ref, c_dn, lo_dn, c_up, hi_up, nt):
    """One grid step integrates a forward (down) chunk and a reversed (up)
    chunk of one instance block.

    Per-level affine step (linear-in-tau source, ``src/SOS_OS.F:2279-2354``),
    re-indexed by *level* ``l``::

        down:  f[l] = att(l-1,l)   * f[l-1] + bd(l)     l = 1..NT, f[0] = 0
        up:    f[l] = att(l, l+1)  * f[l+1] + bu(l)     l = NT-1..0,
                                                        f[NT] = bc

    The ground boundary enters as the affine row (a=0, b=bc) at the global
    level ``nt``; zero-thickness padding layers have dtau = rdtau = 0 and
    reduce to identity rows automatically.  Chunk-boundary state (field
    carry + adjacent source row) lives in VMEM scratch across the
    sequential chunk steps of one instance block.

    The four per-level affine inputs are packed on the lane axis of ONE
    (B, LP, 4) array (lanes [dtau_dn, rdtau_dn, dtau_up, rdtau_up]) and
    passed twice — a forward-chunk view for the down sweep and a
    reversed-chunk view for the up sweep; ``mur`` packs (mu, 1/mu).
    Per-step kernel time scales with the number of input streams (~0.6 ms
    per extra stream at the demo shape, r5 lab), so 6 column streams
    became 3.
    """
    ch = src_dn_ref.shape[1]
    # bf16 field mode: HBM blocks may be bf16, but the recurrence runs
    # in f32 (the scratch carries are f32 too); other dtypes untouched
    dt_c = (jnp.float32 if src_dn_ref.dtype == jnp.bfloat16
            else src_dn_ref.dtype)
    mu, rmu = mur_ref[0:1], mur_ref[1:2]
    iota = lax.broadcasted_iota(jnp.int32, (1, ch, 1), 1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        c_dn[:] = jnp.zeros_like(c_dn)
        lo_dn[:] = jnp.zeros_like(lo_dn)
        c_up[:] = jnp.zeros_like(c_up)
        hi_up[:] = jnp.zeros_like(hi_up)

    # ---- down sweep, chunk index c (forward) ----
    hi = src_dn_ref[:].astype(dt_c)                      # sd[l] rows
    lo = pltpu.roll(hi, jnp.int32(1), 1)                 # sd[l-1]
    lo = jnp.where(iota == 0, lo_dn[:][:, None, :], lo)
    dt, rd = cf_fwd_ref[:, :, 0:1], cf_fwd_ref[:, :, 1:2]
    a = jnp.exp(-dt * rmu)
    al = (hi - lo) * rd
    b = (1.0 - a) * (-al * mu + hi) + al * a * dt
    a, b = _scan_fwd(a, b, iota)
    fdn = a * c_dn[:][:, None, :] + b
    dn_out_ref[:] = fdn.astype(dn_out_ref.dtype)
    c_dn[:] = fdn[:, ch - 1]
    lo_dn[:] = hi[:, ch - 1]

    # ---- up sweep, chunk index nc-1-c (reversed walk) ----
    nc = pl.num_programs(1)
    glob = (nc - 1 - pl.program_id(1)) * ch + iota       # global level
    lo = src_up_ref[:].astype(dt_c)                      # su[l] rows
    hi = pltpu.roll(lo, jnp.int32(ch - 1), 1)            # su[l+1]
    hi = jnp.where(iota == ch - 1, hi_up[:][:, None, :], hi)
    dt, rd = cf_rev_ref[:, :, 2:3], cf_rev_ref[:, :, 3:4]
    a = jnp.exp(-dt * rmu)
    al = (hi - lo) * rd
    b = (1.0 - a) * (al * mu + lo) - al * a * dt
    is_ground = glob == nt
    a = jnp.where(is_ground, 0.0, a)
    b = jnp.where(is_ground, bc_ref[:][:, None, :], b)
    a, b = _scan_rev(a, b, iota)
    fup = a * c_up[:][:, None, :] + b
    up_out_ref[:] = fup.astype(up_out_ref.dtype)
    c_up[:] = fup[:, 0]
    hi_up[:] = lo[:, 0]


def sweep_scan_batched(src_up, src_dn, coeffs, muh, bc, nt,
                       interpret=False, dimsem=False):
    """Integrate both hemispheres of the flat field batch in one kernel.

    ``src_up/src_dn``: (B, LP, HP) source hemisphere halves (as produced
    by :func:`scatter_fused` — the down half is consumed forward, the up
    half reversed, each fetched exactly once);
    ``coeffs``: (B, LP, 4) packed per-level affine inputs
    [dtau_dn, rdtau_dn, dtau_up, rdtau_up] from :func:`sweep_coeffs`
    (``dtau_dn[l] = h[l]-h[l-1]``, 0 at l = 0 and on pads;
    ``dtau_up[l] = h[l+1]-h[l]``, 0 at l >= nt); ``muh``: (HP,) direction
    cosines (pad slots 1); ``bc``: (B, HP) upward ground boundary;
    ``nt``: ground level index (static).
    Returns ``(up, dn)`` each (B, LP, HP):  ``up[l]`` for l <= nt (rows
    above nt hold bc / pad values), ``dn[l]`` with dn[0] = 0.
    """
    b_n, lp, hp = src_up.shape
    nb, nc = b_n // _IB, lp // _CH
    dtype = src_up.dtype

    up_blk = pl.BlockSpec((_IB, _CH, hp), lambda b, c, _nc=nc:
                          (b, _nc - 1 - c, _i0()),
                          memory_space=pltpu.VMEM)
    dn_blk = pl.BlockSpec((_IB, _CH, hp), lambda b, c: (b, c, _i0()),
                          memory_space=pltpu.VMEM)
    col_fwd = pl.BlockSpec((_IB, _CH, 4), lambda b, c: (b, c, _i0()),
                           memory_space=pltpu.VMEM)
    col_rev = pl.BlockSpec((_IB, _CH, 4), lambda b, c, _nc=nc:
                           (b, _nc - 1 - c, _i0()),
                           memory_space=pltpu.VMEM)
    mur_blk = pl.BlockSpec((2, hp), lambda b, c: (_i0(), _i0()),
                           memory_space=pltpu.VMEM)
    bc_blk = pl.BlockSpec((_IB, hp), lambda b, c: (b, _i0()),
                          memory_space=pltpu.VMEM)
    out_up = pl.BlockSpec((_IB, _CH, hp), lambda b, c, _nc=nc:
                          (b, _nc - 1 - c, _i0()),
                          memory_space=pltpu.VMEM)
    out_dn = pl.BlockSpec((_IB, _CH, hp), lambda b, c: (b, c, _i0()),
                          memory_space=pltpu.VMEM)
    dt_c = jnp.float32 if dtype == jnp.bfloat16 else dtype
    scratch = [pltpu.VMEM((_IB, hp), dt_c) for _ in range(4)]
    kern = functools.partial(_sweep_kernel, nt=nt)
    mur = jnp.stack([muh.astype(dt_c), 1.0 / muh.astype(dt_c)])
    kw = {}
    if dimsem:
        # instance blocks are independent (the VMEM scratch carries only
        # along the chunk axis and is re-seeded at chunk 0 of each block)
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    return pl.pallas_call(
        kern, grid=(nb, nc),
        in_specs=[dn_blk, up_blk, col_fwd, col_rev, mur_blk, bc_blk],
        out_specs=(out_up, out_dn),
        out_shape=(jax.ShapeDtypeStruct((b_n, lp, hp), dtype),
                   jax.ShapeDtypeStruct((b_n, lp, hp), dtype)),
        scratch_shapes=scratch, interpret=interpret, **kw,
    )(src_dn, src_up, coeffs, coeffs, mur, bc)


# ---------------------------------------------------------------------------
# Fused scatter + sweep: one kernel per scattering order (the hot pair)
# ---------------------------------------------------------------------------

def _fused_kernel(up_c_ref, dn_c_ref, up_r_ref, dn_r_ref, xy_c_ref,
                  xy_r_ref, mb_ref, cf_fwd_ref, cf_rev_ref,
                  mur_ref, bc_ref,
                  up_out_ref, dn_out_ref, c_dn, lo_dn, c_up, hi_up,
                  nt, precision):
    """Order-IG source *and* both hemisphere integrations in one pass.

    Motivation: the separate kernels round-trip the (B, LP, W) source
    through HBM (~40% of the pair's traffic).  Total matmul FLOPs are
    unchanged: the down sweep consumes only the downward source lanes of
    chunk ``c`` and the up sweep only the upward lanes of chunk
    ``nc-1-c``, so each half of the operator is applied exactly once per
    chunk across the whole grid.  Results are bitwise identical to
    scatter_fused -> sweep_scan_batched (verified on the v5e).

    **Measured outcome (r4, v5e, demo shape): the fusion LOSES** —
    12.6 ms vs 10.2 ms per chained pair, stable across chunk sizes 32/64/
    128.  Interpretation: the pair is not HBM-bound; inside one fused
    grid step the MXU matmul feeds the VPU scan directly, serializing the
    two units, while the two-kernel pipeline keeps each kernel's only
    unit saturated.  Production therefore stays on the two-kernel path;
    this kernel is kept as the measured negative result (bench.py
    roofline breakdown) and exercised in interpret mode by the suite.

    Sweep semantics are identical to :func:`_sweep_kernel` (reference
    ``SOS_INTEGR_EPOPT``, ``src/SOS_OS.F:2222-2354``); the in-VMEM source
    rows replace the HBM loads.  ``mb`` columns [0, HP) produce the
    upward-source lanes, [HP, 2HP) the downward ones
    (``solver._flat_operator`` layout).
    """
    ib, ch, hp = up_c_ref.shape
    mu, rmu = mur_ref[0:1], mur_ref[1:2]
    iota = lax.broadcasted_iota(jnp.int32, (1, ch, 1), 1)
    mb = mb_ref[0]

    def mix_src(u_ref, d_ref, xy_ref, cols):
        u, d = u_ref[:], d_ref[:]
        x, y = xy_ref[:, :, 0:1], xy_ref[:, :, 1:2]
        f2 = jnp.concatenate([x * u, x * d, y * u, y * d], axis=-1)
        s = jnp.dot(f2.reshape(ib * ch, 4 * hp), cols,
                    preferred_element_type=f2.dtype, precision=precision)
        return s.reshape(ib, ch, hp)

    @pl.when(pl.program_id(1) == 0)
    def _():
        c_dn[:] = jnp.zeros_like(c_dn)
        lo_dn[:] = jnp.zeros_like(lo_dn)
        c_up[:] = jnp.zeros_like(c_up)
        hi_up[:] = jnp.zeros_like(hi_up)

    # ---- down sweep, chunk index c (forward) ----
    hi = mix_src(up_c_ref, dn_c_ref, xy_c_ref, mb[:, hp:])
    lo = pltpu.roll(hi, jnp.int32(1), 1)                 # sd[l-1]
    lo = jnp.where(iota == 0, lo_dn[:][:, None, :], lo)
    dt, rd = cf_fwd_ref[:, :, 0:1], cf_fwd_ref[:, :, 1:2]
    a = jnp.exp(-dt * rmu)
    al = (hi - lo) * rd
    b = (1.0 - a) * (-al * mu + hi) + al * a * dt
    a, b = _scan_fwd(a, b, iota)
    fdn = a * c_dn[:][:, None, :] + b
    dn_out_ref[:] = fdn
    c_dn[:] = fdn[:, ch - 1]
    lo_dn[:] = hi[:, ch - 1]

    # ---- up sweep, chunk index nc-1-c (reversed walk) ----
    nc = pl.num_programs(1)
    glob = (nc - 1 - pl.program_id(1)) * ch + iota       # global level
    lo = mix_src(up_r_ref, dn_r_ref, xy_r_ref, mb[:, :hp])
    hi = pltpu.roll(lo, jnp.int32(ch - 1), 1)            # su[l+1]
    hi = jnp.where(iota == ch - 1, hi_up[:][:, None, :], hi)
    dt, rd = cf_rev_ref[:, :, 2:3], cf_rev_ref[:, :, 3:4]
    a = jnp.exp(-dt * rmu)
    al = (hi - lo) * rd
    b = (1.0 - a) * (al * mu + lo) - al * a * dt
    is_ground = glob == nt
    a = jnp.where(is_ground, 0.0, a)
    b = jnp.where(is_ground, bc_ref[:][:, None, :], b)
    a, b = _scan_rev(a, b, iota)
    fup = a * c_up[:][:, None, :] + b
    up_out_ref[:] = fup
    c_up[:] = fup[:, 0]
    hi_up[:] = lo[:, 0]


def fused_scatter_sweep(up_h, dn_h, xy_b, mboth, blocks_per_order,
                        coeffs, muh, bc, nt,
                        precision=lax.Precision.DEFAULT, interpret=False,
                        ch=None):
    """One scattering-order update: source + both sweeps, fused.

    Same operand conventions as :func:`scatter_fused` (field hemispheres,
    mixing fractions, per-order operators, order-major instance blocks)
    plus :func:`sweep_scan_batched`'s per-level affine-step inputs.
    Returns ``(up, dn)``, each (B, LP, HP).
    """
    b_n, lp, hp = up_h.shape
    if ch is None:
        ch = _CH
    nb, nc = b_n // _IB, lp // ch
    dtype = up_h.dtype
    w = 2 * hp

    fwd3 = pl.BlockSpec((_IB, ch, hp), lambda b, c: (b, c, _i0()),
                        memory_space=pltpu.VMEM)
    rev3 = pl.BlockSpec((_IB, ch, hp), lambda b, c, _nc=nc:
                        (b, _nc - 1 - c, _i0()),
                        memory_space=pltpu.VMEM)
    xy_fwd = pl.BlockSpec((_IB, ch, 2), lambda b, c: (b, c, _i0()),
                          memory_space=pltpu.VMEM)
    xy_rev = pl.BlockSpec((_IB, ch, 2), lambda b, c, _nc=nc:
                          (b, _nc - 1 - c, _i0()),
                          memory_space=pltpu.VMEM)
    col_fwd = pl.BlockSpec((_IB, ch, 4), lambda b, c: (b, c, _i0()),
                           memory_space=pltpu.VMEM)
    col_rev = pl.BlockSpec((_IB, ch, 4), lambda b, c, _nc=nc:
                           (b, _nc - 1 - c, _i0()),
                           memory_space=pltpu.VMEM)
    mb_blk = pl.BlockSpec(
        (1, 2 * w, w),
        lambda b, c, _bpo=np.int32(blocks_per_order):
        (b // _bpo, _i0(), _i0()),
        memory_space=pltpu.VMEM)
    mur_blk = pl.BlockSpec((2, hp), lambda b, c: (_i0(), _i0()),
                           memory_space=pltpu.VMEM)
    bc_blk = pl.BlockSpec((_IB, hp), lambda b, c: (b, _i0()),
                          memory_space=pltpu.VMEM)
    out_up = pl.BlockSpec((_IB, ch, hp), lambda b, c, _nc=nc:
                          (b, _nc - 1 - c, _i0()),
                          memory_space=pltpu.VMEM)
    out_dn = pl.BlockSpec((_IB, ch, hp), lambda b, c: (b, c, _i0()),
                          memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((_IB, hp), dtype) for _ in range(4)]
    kern = functools.partial(_fused_kernel, nt=nt, precision=precision)
    mur = jnp.stack([muh.astype(dtype), 1.0 / muh.astype(dtype)])
    kw = {}
    if not interpret:
        # the fused working set (two double-buffered field chunks + the
        # operator + concat/scan temporaries) peaks at ~18 MB, just past
        # Mosaic's default 16 MB scoped-vmem cap; the chip has 128 MB
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        kern, grid=(nb, nc),
        in_specs=[fwd3, fwd3, rev3, rev3, xy_fwd, xy_rev, mb_blk,
                  col_fwd, col_rev, mur_blk, bc_blk],
        out_specs=(out_up, out_dn),
        out_shape=(jax.ShapeDtypeStruct((b_n, lp, hp), dtype),
                   jax.ShapeDtypeStruct((b_n, lp, hp), dtype)),
        scratch_shapes=scratch, interpret=interpret, **kw,
    )(up_h, dn_h, up_h, dn_h, xy_b, xy_b, mboth, coeffs, coeffs, mur, bc)


def sweep_coeffs(h_b, nt):
    """Per-level affine-step inputs for :func:`sweep_scan_batched`.

    ``h_b``: (B, LP) cumulative optical depths (edge-padded past the
    ground).  Returns ONE (B, LP, 4) array with lanes
    [dtau_dn, rdtau_dn, dtau_up, rdtau_up] (packed: the sweep kernel's
    per-step cost scales with its input stream count, r5 lab).
    """
    b_n, lp = h_b.shape
    zero = jnp.zeros((b_n, 1), h_b.dtype)
    d_dn = jnp.concatenate([zero, h_b[:, 1:] - h_b[:, :-1]], axis=1)
    d_up = jnp.concatenate([h_b[:, 1:] - h_b[:, :-1], zero], axis=1)
    lvl = jnp.arange(lp)
    d_up = jnp.where(lvl[None, :] >= nt, 0.0, d_up)

    def recip(d):
        pos = d > 0.0
        return jnp.where(pos, 1.0 / jnp.where(pos, d, 1.0), 0.0)

    return jnp.stack([d_dn, recip(d_dn), d_up, recip(d_up)], axis=-1)
