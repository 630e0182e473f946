"""Scratch: sweep-kernel variant microbenchmarks (not shipped).

Variants of pallas_ops.sweep_flat_batched's down-kernel schedule:
  v0: current HEAD kernel (per-level fused coefficients), dn+up
  v1: two-phase dn kernel — vectorized (att, b) precompute over the whole
      chunk into VMEM scratch, then a tight sequential c = att*c + b loop;
      swept over instance-block size B and level-chunk CH
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT = 600
HP = 128
TS = 648          # 81 orders x 8 terms
DTYPE = jnp.float32
N_CALLS = 20


def bench_calls(fn, *args):
    out = fn(*args)                       # compile + warmup
    np.asarray(jax.device_get(out[0, 0, :8]))
    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        out = fn(*args)
    np.asarray(jax.device_get(out[0, 0, :8]))
    return (time.perf_counter() - t0) / N_CALLS


# ---------------------------------------------------------------- v1 kernel
def _dn_kernel_v1(dtau_ref, rdtau_ref, mu_ref, rmu_ref, sdsh_ref, sd0_ref,
                  out_ref, carry, lo_s, att_s, b_s, unroll):
    ch = sdsh_ref.shape[0]
    blk = sdsh_ref.shape[1]
    mu = mu_ref[:]
    rmu = rmu_ref[:]

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)
        lo_s[:] = sd0_ref[:].reshape(lo_s.shape)

    # phase 1: vectorized coefficients over the whole chunk
    dt = dtau_ref[:]                       # (CH, B, 1)
    rd = rdtau_ref[:]
    hi = sdsh_ref[:]                       # (CH, B, HP)
    att = jnp.exp(-dt * rmu)
    att_s[:] = att
    al_t = (hi[1:] - hi[:-1]) * rd[1:]
    b_s[1:] = (1.0 - att[1:]) * (-al_t * mu + hi[1:]) \
        + al_t * att[1:] * dt[1:]
    lo0 = lo_s[0]
    al0 = (hi[0] - lo0) * rd[0]
    b_s[0] = (1.0 - att[0]) * (-al0 * mu + hi[0]) + al0 * att[0] * dt[0]
    # NOTE: hi[ch - 1], NOT hi[-1] — negative static indices on values
    # lower to an unimplemented dynamic_slice in Mosaic
    lo_s[0] = hi[ch - 1]

    # phase 2: tight sequential recurrence
    def body(i, c):
        base = i * unroll
        for u in range(unroll):
            idx = base + u
            c = att_s[pl.ds(idx, 1)][0] * c + b_s[pl.ds(idx, 1)][0]
            out_ref[pl.ds(idx, 1)] = c[None]
        return c

    carry[0] = lax.fori_loop(0, ch // unroll, body, carry[0])


def sweep_dn_v1(h_b, muh, src_b, block=8, chunk=256, unroll=8):
    ts, ntp1, w = src_b.shape
    hp = w // 2
    nt = ntp1 - 1
    dtype = src_b.dtype
    h_t = jnp.swapaxes(h_b, 0, 1)
    dtau = h_t[1:] - h_t[:-1]
    pos = dtau > 0.0
    rdtau = jnp.where(pos, 1.0 / jnp.where(pos, dtau, 1.0), 0.0)
    src_t = jnp.swapaxes(src_b, 0, 1)
    sd = src_t[:, :, hp:]

    ch = min(chunk, ((nt + unroll - 1) // unroll) * unroll) if nt else 1
    tsp = ((ts + block - 1) // block) * block
    ntp = ((nt + ch - 1) // ch) * ch

    def pad(x, axis, target):
        padw = [(0, 0)] * x.ndim
        padw[axis] = (0, target - x.shape[axis])
        return jnp.pad(x, padw)

    dtau = pad(pad(dtau, 1, tsp), 0, ntp)[:, :, None]
    rdtau = pad(pad(rdtau, 1, tsp), 0, ntp)[:, :, None]
    sdsh = pad(pad(sd[1:], 1, tsp), 0, ntp)
    sd0 = pad(sd[0], 0, tsp)

    nb, nc = tsp // block, ntp // ch
    col_blk = pl.BlockSpec((ch, block, 1), lambda g, c: (c, g, 0),
                           memory_space=pltpu.VMEM)
    level_blk = pl.BlockSpec((ch, block, hp), lambda g, c: (c, g, 0),
                             memory_space=pltpu.VMEM)
    mu_blk = pl.BlockSpec((1, hp), lambda g, c: (0, 0),
                          memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((block, hp), lambda g, c: (g, 0),
                           memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((1, block, hp), dtype),
               pltpu.VMEM((1, block, hp), dtype),
               pltpu.VMEM((ch, block, hp), dtype),
               pltpu.VMEM((ch, block, hp), dtype)]
    kern = functools.partial(_dn_kernel_v1, unroll=unroll)
    return pl.pallas_call(
        kern, grid=(nb, nc),
        in_specs=[col_blk, col_blk, mu_blk, mu_blk, level_blk, row_blk],
        out_specs=level_blk,
        out_shape=jax.ShapeDtypeStruct((ntp, tsp, hp), dtype),
        scratch_shapes=scratch,
    )(dtau, rdtau, muh.astype(dtype)[None],
      (1.0 / muh.astype(dtype))[None], sdsh, sd0)


def main():
    import os
    os.makedirs("/root/.cache/jax_cc", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from radiativetransfer_sos_tpu import pallas_ops

    rng = np.random.default_rng(0)
    h = jnp.asarray(np.sort(rng.random((TS, NT + 1)), axis=1) * 5.0, DTYPE)
    muh = jnp.asarray(rng.random((HP,)) * 0.9 + 0.1, DTYPE)
    src = jnp.asarray(rng.random((TS, NT + 1, 2 * HP)), DTYPE)
    bc = jnp.asarray(rng.random((TS, HP)), DTYPE)

    full_fn = jax.jit(pallas_ops.sweep_flat_batched)
    dt0 = bench_calls(full_fn, h, muh, src, bc)
    bytes_full = 2 * src.size * 4
    print(f"v0 full sweep (dn+up): {dt0*1e6:.0f} us  "
          f"{bytes_full/dt0/1e9:.0f} GB/s", flush=True)

    # reference down-half field: full[l, :, HP:] for levels 1..NT
    ref_full = np.asarray(full_fn(h, muh, src, bc))      # (TS, NT+1, W)
    ref_dn = np.swapaxes(ref_full[:, 1:, HP:], 0, 1)     # (NT, TS, HP)

    for blk in (8, 16, 32):
        for ch in (64, 128, 256):
            if ch * blk > 2048:      # VMEM: 4 chunk buffers + dbl buffering
                continue
            f = jax.jit(functools.partial(sweep_dn_v1, block=blk, chunk=ch))
            try:
                out1 = np.asarray(f(h, muh, src))        # (NTP, TSP, HP)
                err = float(np.max(np.abs(out1[:NT, :TS] - ref_dn)))
                dt = bench_calls(f, h, muh, src)
                half = bytes_full // 2
                print(f"v1 dn B={blk} CH={ch}: {dt*1e6:.0f} us "
                      f"{half/dt/1e9:.0f} GB/s  err={err:.2e}", flush=True)
            except Exception as e:
                print(f"v1 dn B={blk} CH={ch}: FAIL {str(e)[:150]}",
                      flush=True)


if __name__ == "__main__":
    main()
