"""Pallas TPU kernels for the SOS hot path.

The layer sweep (reference ``SOS_INTEGR_EPOPT``, ``src/SOS_OS.F:2222``) is a
first-order affine recurrence over NT ~ 600 optical-depth levels.  XLA's
``associative_scan`` evaluates it in ~log2(NT) full passes over HBM, which
makes it the dominant cost of the whole solver once the field layout is
lane-aligned.  The kernels here perform the recurrence *sequentially in
VMEM*: one HBM read of the per-layer affine coefficients, one HBM write of
the integrated field — the bandwidth-optimal schedule.

Batch layout: instances ride the sublane axis (B = 8 per block, the native
tile height).  Global arrays are (NT, TS, HP) so one level-slice of a block
is a native (8, HP) tile row and the per-level loop runs at full VPU width.
The level axis is split into grid chunks with the recurrence carry held in
VMEM scratch across sequential grid steps (chunks of one instance block are
consecutive; the up-sweep kernel walks its chunks in reverse via the block
index map).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 8          # instances per block = sublane tile height
_CHUNK = 256        # levels per grid step
_UNROLL = 8         # levels per loop iteration (amortizes loop overhead)


def _dn_kernel(dtau_ref, rdtau_ref, mu_ref, rmu_ref, sdsh_ref, sd0_ref,
               out_ref, carry, lo_s):
    """Forward (TOA -> ground) recurrence over one level chunk, with the
    affine step coefficients computed in VMEM.

    Per level ``i`` (``src/SOS_OS.F:2279-2354``, linear-in-tau source)::

        att = exp(-dtau_i / mu)
        al  = (sd[i+1] - sd[i]) / dtau_i          (0 on zero-thickness pads)
        bd  = (1-att) * (-al*mu + sd[i+1]) + al*att*dtau_i
        c   = att * c + bd

    Blocks: dtau/rdtau (CH, 8); mu/rmu (1, HP); ``sdsh_ref`` (CH, 8, HP) =
    downward-source rows shifted by one level (sd[i+1]); ``sd0_ref``
    (8, HP) = sd[0].  Scratch ``carry`` holds the field recurrence and
    ``lo_s`` the previous source row, both persisting across the
    sequential chunk grid steps of one instance block.  Computing the
    coefficients here (instead of materializing att/bu/bd through XLA)
    drops the sweep's HBM traffic from ~8 field-sized passes to
    read-src + write-out.
    """
    ch = sdsh_ref.shape[0]
    mu = mu_ref[:]            # (1, HP), broadcasts against (8, HP)
    rmu = rmu_ref[:]

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)
        lo_s[:] = sd0_ref[:].reshape(lo_s.shape)

    def body(i, cl):
        c, lo = cl
        base = i * _UNROLL
        for u in range(_UNROLL):
            idx = base + u
            hi = sdsh_ref[pl.ds(idx, 1)][0]          # (8, HP)
            dt = dtau_ref[pl.ds(idx, 1)][0]          # (8, 1)
            rd = rdtau_ref[pl.ds(idx, 1)][0]
            att = jnp.exp(-dt * rmu)
            al = (hi - lo) * rd
            c = att * c + ((1.0 - att) * (-al * mu + hi) + al * att * dt)
            out_ref[pl.ds(idx, 1)] = c[None]
            lo = hi
        return c, lo

    c, lo = lax.fori_loop(0, ch // _UNROLL, body, (carry[0], lo_s[0]))
    carry[0] = c
    lo_s[0] = lo


def _up_kernel(dtau_ref, rdtau_ref, mu_ref, rmu_ref, sulo_ref, suN_ref,
               bc_ref, out_ref, carry, hi_s):
    """Backward (ground -> TOA) recurrence over one level chunk, fused
    like ``_dn_kernel``.  Per level ``i`` (walked in decreasing order)::

        al = (su[i+1] - su[i]) / dtau_i
        bu = (1-att) * (al*mu + su[i]) - al*att*dtau_i
        c  = att * c + bu

    The index maps feed chunks in reverse level order; ``sulo_ref``
    (CH, 8, HP) holds the su[i] rows (pad rows beyond the ground carry
    su[NT] so the hi-chain survives the reversed walk across them);
    ``suN_ref``: (8, HP) = su[NT], seeding the hi-chain; ``bc_ref``:
    (8, HP) ground boundary."""
    ch = sulo_ref.shape[0]
    mu = mu_ref[:]            # (1, HP), broadcasts against (8, HP)
    rmu = rmu_ref[:]

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry[:] = bc_ref[:].reshape(carry.shape)
        hi_s[:] = suN_ref[:].reshape(carry.shape)

    def body(k, chi):
        c, hi = chi
        base = ch - (k + 1) * _UNROLL
        for u in range(_UNROLL):
            idx = base + (_UNROLL - 1 - u)
            lo = sulo_ref[pl.ds(idx, 1)][0]
            dt = dtau_ref[pl.ds(idx, 1)][0]          # (8, 1)
            rd = rdtau_ref[pl.ds(idx, 1)][0]
            att = jnp.exp(-dt * rmu)
            al = (hi - lo) * rd
            c = att * c + ((1.0 - att) * (al * mu + lo) - al * att * dt)
            out_ref[pl.ds(idx, 1)] = c[None]
            hi = lo
        return c, hi

    c, hi = lax.fori_loop(0, ch // _UNROLL, body, (carry[0], hi_s[0]))
    carry[0] = c
    hi_s[0] = hi


def _pad_axis(x, axis, target, value=0.0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


def sweep_flat_batched(h_b, muh, src_b, bc_b, interpret=False):
    """Batched flat-field sweep on TPU (see ``solver._sweep_flat_st``).

    ``h_b``: (TS, NT+1) cumulative optical depths; ``muh``: (HP,) direction
    cosines of one hemisphere block (pad slots 1); ``src_b``: (TS, NT+1, W)
    flat sources; ``bc_b``: (TS, HP) upward ground boundary.  Returns the
    integrated field (TS, NT+1, W).

    The affine step coefficients (linear-in-tau source integration,
    ``src/SOS_OS.F:2279-2354``) are computed *inside* the kernels from the
    per-layer (dtau, 1/dtau) columns and the source rows — the sweep's HBM
    traffic is one read of the sources plus one write of the field, instead
    of materializing att/bu/bd ((NT, TS, HP) each) through XLA first.
    """
    ts, ntp1, w = src_b.shape
    hp = w // 2
    nt = ntp1 - 1
    dtype = src_b.dtype

    h_t = jnp.swapaxes(h_b, 0, 1)                    # (NT+1, TS)
    dtau = h_t[1:] - h_t[:-1]                        # (NT, TS)
    pos = dtau > 0.0
    # zero-thickness padding layers are identity steps: dtau = rdtau = 0
    # gives att = 1 and al = 0 inside the kernels
    rdtau = jnp.where(pos, 1.0 / jnp.where(pos, dtau, 1.0), 0.0)
    src_t = jnp.swapaxes(src_b, 0, 1)                # (NT+1, TS, W)
    su, sd = src_t[:, :, :hp], src_t[:, :, hp:]

    # pad instances to the sublane block and levels to the chunk size;
    # padding levels are identity steps appended after the ground (down
    # sweep: trailing no-ops; up sweep: leading no-ops on the reversed walk)
    ch = min(_CHUNK, ((nt + _UNROLL - 1) // _UNROLL) * _UNROLL) if nt else 1
    tsp = ((ts + _BLOCK - 1) // _BLOCK) * _BLOCK
    ntp = ((nt + ch - 1) // ch) * ch
    # (NTP, TSP, 1): all level-major operands slice along the sublane axis
    # (a (CH, 8) block would violate the TPU lane-dim blocking rule)
    dtau = _pad_axis(_pad_axis(dtau, 1, tsp), 0, ntp)[:, :, None]
    rdtau = _pad_axis(_pad_axis(rdtau, 1, tsp), 0, ntp)[:, :, None]
    sdsh = _pad_axis(_pad_axis(sd[1:], 1, tsp), 0, ntp)     # sd[i+1] rows
    sd0 = _pad_axis(sd[0], 0, tsp)
    suN = _pad_axis(su[nt], 0, tsp)
    sulo = _pad_axis(su[:nt], 1, tsp)                       # su[i] rows
    if ntp > nt:
        # pad rows carry su[NT] so the up-sweep hi-chain survives the
        # reversed walk across the padding levels
        sulo = jnp.concatenate(
            [sulo, jnp.broadcast_to(suN[None], (ntp - nt, tsp, hp))], axis=0)
    bc = _pad_axis(bc_b, 0, tsp)
    mu2 = muh.astype(dtype)[None]                           # (1, HP)
    rmu2 = (1.0 / muh.astype(dtype))[None]

    nb, nc = tsp // _BLOCK, ntp // ch
    col_blk = pl.BlockSpec((ch, _BLOCK, 1), lambda g, c: (c, g, 0),
                           memory_space=pltpu.VMEM)
    col_blk_rev = pl.BlockSpec(
        (ch, _BLOCK, 1), lambda g, c, _nc=nc: (_nc - 1 - c, g, 0),
        memory_space=pltpu.VMEM)
    level_blk = pl.BlockSpec((ch, _BLOCK, hp), lambda g, c: (c, g, 0),
                             memory_space=pltpu.VMEM)
    level_blk_rev = pl.BlockSpec(
        (ch, _BLOCK, hp), lambda g, c, _nc=nc: (_nc - 1 - c, g, 0),
        memory_space=pltpu.VMEM)
    mu_blk = pl.BlockSpec((1, hp), lambda g, c: (0, 0),
                          memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((_BLOCK, hp), lambda g, c: (g, 0),
                           memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((1, _BLOCK, hp), dtype),
               pltpu.VMEM((1, _BLOCK, hp), dtype)]

    dn = pl.pallas_call(
        _dn_kernel, grid=(nb, nc),
        in_specs=[col_blk, col_blk, mu_blk, mu_blk, level_blk, row_blk],
        out_specs=level_blk,
        out_shape=jax.ShapeDtypeStruct((ntp, tsp, hp), dtype),
        scratch_shapes=scratch, interpret=interpret,
    )(dtau, rdtau, mu2, rmu2, sdsh, sd0)

    up = pl.pallas_call(
        _up_kernel, grid=(nb, nc),
        in_specs=[col_blk_rev, col_blk_rev, mu_blk, mu_blk, level_blk_rev,
                  row_blk, row_blk],
        out_specs=level_blk_rev,
        out_shape=jax.ShapeDtypeStruct((ntp, tsp, hp), dtype),
        scratch_shapes=scratch, interpret=interpret,
    )(dtau, rdtau, mu2, rmu2, sulo, suN, bc)

    # assemble (NT+1, TSP, W): up rows are levels 0..NT-1 + bc at ground;
    # down rows are zero at TOA + levels 1..NT
    up_full = jnp.concatenate([up[:nt], bc[None]], axis=0)
    dn_full = jnp.concatenate([jnp.zeros((1, tsp, hp), dtype), dn[:nt]],
                              axis=0)
    out = jnp.concatenate([up_full, dn_full], axis=-1)
    return jnp.swapaxes(out[:, :ts], 0, 1)
