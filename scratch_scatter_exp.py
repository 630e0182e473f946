"""Scratch: scattering-source contraction layout experiments (not shipped).

v0: production layout — vmap over the flattened (T*S) instance axis with a
    per-instance gather of the (2W, W) operator matrix (solver._scatter_flat
    under solve_fourier_batch's vmap).
v1: explicit batching — field laid out (S, T*(NT+1), W), one batched matmul
    over the S axis with the operator shared across terms (no gather).
v2: v1 with the xdel/ydel row-scaling moved after two matmuls
    (src = xdel*(f@Ma) + ydel*(f@Mm)) to skip the f2 concat materialization.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from radiativetransfer_sos_tpu import solver

NT = 600
N = 41
S = 81
T = 8
DTYPE = jnp.float32
N_CALLS = 20


def bench_calls(fn, *args):
    out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[:8]))
    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[:8]))
    return (time.perf_counter() - t0) / N_CALLS


def main():
    import os
    os.makedirs("/root/.cache/jax_cc", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    hp = solver._half_pad(N)
    w = 2 * hp
    ntp1 = NT + 1
    rng = np.random.default_rng(0)
    mboth = jnp.asarray(rng.random((S, 2 * w, w)), DTYPE)    # (S, 2W, W)
    field_ts = jnp.asarray(rng.random((T * S, ntp1, w)), DTYPE)
    xdel = jnp.asarray(rng.random((T, ntp1)), DTYPE)
    ydel = jnp.asarray(rng.random((T, ntp1)), DTYPE)
    tt, ss = jnp.meshgrid(jnp.arange(T), jnp.arange(S), indexing="ij")
    ti, si = tt.ravel(), ss.ravel()

    flops = 2.0 * T * S * ntp1 * 2 * w * w

    # v0: production layout
    @jax.jit
    def v0(f):
        def one(t_idx, s_idx, fi):
            return solver._scatter_flat(mboth[s_idx], xdel[t_idx],
                                        ydel[t_idx], fi)
        return jax.vmap(one)(ti, si, f)

    dt = bench_calls(v0, field_ts)
    print(f"v0 gathered-B vmap: {dt*1e6:.0f} us  {flops/dt/1e12:.1f} TFLOP/s",
          flush=True)
    ref = np.asarray(v0(field_ts))

    # v1: (S, T*(NT+1), W) shared-B batched matmul, f2 concat on input side
    field_st = jnp.asarray(
        np.asarray(field_ts).reshape(T, S, ntp1, w).transpose(1, 0, 2, 3)
        .reshape(S, T * ntp1, w))
    xb = jnp.broadcast_to(xdel[None], (S, T, ntp1)).reshape(S, T * ntp1)
    yb = jnp.broadcast_to(ydel[None], (S, T, ntp1)).reshape(S, T * ntp1)

    @jax.jit
    def v1(f):
        f2 = jnp.concatenate([xb[:, :, None] * f, yb[:, :, None] * f],
                             axis=-1)
        return jnp.matmul(f2, mboth, preferred_element_type=DTYPE,
                          precision=solver.MATMUL_PRECISION)

    dt = bench_calls(v1, field_st)
    print(f"v1 shared-B f2-concat: {dt*1e6:.0f} us  "
          f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)
    out1 = np.asarray(v1(field_st)).reshape(S, T, ntp1, w).transpose(
        1, 0, 2, 3).reshape(T * S, ntp1, w)
    print(f"   err vs v0: {np.max(np.abs(out1 - ref)):.2e}", flush=True)

    # v2: row-scaling after the matmuls (no f2 materialization)
    ma = mboth[:, :w]
    mm = mboth[:, w:]

    @jax.jit
    def v2(f):
        ya = jnp.matmul(f, ma, preferred_element_type=DTYPE,
                        precision=solver.MATMUL_PRECISION)
        ym = jnp.matmul(f, mm, preferred_element_type=DTYPE,
                        precision=solver.MATMUL_PRECISION)
        return xb[:, :, None] * ya + yb[:, :, None] * ym

    dt = bench_calls(v2, field_st)
    print(f"v2 shared-B post-scale: {dt*1e6:.0f} us  "
          f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)
    out2 = np.asarray(v2(field_st)).reshape(S, T, ntp1, w).transpose(
        1, 0, 2, 3).reshape(T * S, ntp1, w)
    print(f"   err vs v0: {np.max(np.abs(out2 - ref)):.2e}", flush=True)

    # v3: single stacked matmul then combine (fc = f @ [Ma | Mm])
    mcat = jnp.concatenate([ma, mm], axis=-1)        # (S, W, 2W)

    @jax.jit
    def v3(f):
        fc = jnp.matmul(f, mcat, preferred_element_type=DTYPE,
                        precision=solver.MATMUL_PRECISION)
        return xb[:, :, None] * fc[..., :w] + yb[:, :, None] * fc[..., w:]

    dt = bench_calls(v3, field_st)
    print(f"v3 stacked-out matmul: {dt*1e6:.0f} us  "
          f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
