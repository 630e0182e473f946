"""Benchmark: full successive-orders RT solves per second at demo scale.

Pipeline of one measurement round:

1. **Precision gate** — the pinned demo-shape case is solved in f32 and f64
   on the same backend; the f32 throughput number is only reported if the
   radiances agree within ``precision.F32_REL_TOL`` (VERDICT round-1 #1).
2. **End-to-end throughput** — the flagship polarized solve (NBMU=40+sun,
   NT=600 layers, IBORM=80 Fourier orders, IGMAX=30 — the shape of one CKD
   term of ``exe/runSOS-ABS_demo.ksh`` with ``src/SOS.F:546-550`` bounds)
   batched over CKD terms, measured two ways: all 81 orders
   (``solve_fourier_batch``) and the production block dispatch with the
   reference's sequential Fourier early exit (``solve_fourier_blocked``).
3. **Per-kernel roofline** — the scattering-source matmul (MXU-bound) and
   the Pallas layer sweep vs its associative-scan fallback (HBM-bound),
   against the chip's peak (BASELINE.md "speed-of-light kernels").

``vs_baseline``: the reference publishes no timings (BASELINE.md) — the
ratio is a **cost-model estimate**, not a measurement: ~1.7e11 FLOP/term in
the ``SOS_FSOURCE_ORDREIG`` contraction alone at identical shapes, at an
optimistic 2 GFLOP/s sustained single-core Fortran => ~85 s/term.
"""

import json
import time

import numpy as np

FORTRAN_EST_SECONDS_PER_TERM = 85.0

#: (peak dense-matmul FLOP/s in the f32-accumulate path XLA uses for f32
#: matmuls by default, HBM GB/s) per device kind
_PEAKS = {
    "TPU v4": (275e12, 1228e9),
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v5": (459e12, 2765e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v6e": (918e12, 1640e9),
}


def _timeit(fn, n_iter=3, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        fn()
    return (time.perf_counter() - t0) / n_iter


def kernel_roofline(prob, peak_flops, peak_bw):
    """Isolated hot-kernel measurements (SURVEY.md §3.2 ranking)."""
    import jax
    import jax.numpy as jnp

    from radiativetransfer_sos_tpu import pallas_ops, solver

    inp, opt = prob.inp, prob.opt
    dtype = inp.h.dtype
    n = inp.mu_pos.shape[0]
    hp = solver._half_pad(n)
    w = 2 * hp
    ntp1 = inp.h.shape[1]
    n_s = inp.k_aer.shape[0]

    m_aer = solver._flat_operator(inp.k_aer, inp.w_pos)
    m_mol = solver._flat_operator(inp.k_mol, inp.w_pos)
    mboth = jnp.concatenate([m_aer, m_mol], axis=-2)     # (S, 2W, W)
    rng = np.random.default_rng(1)
    t_n = inp.h.shape[0]
    nt = ntp1 - 1
    lp = pallas_ops.pad_levels(nt)
    b_n = n_s * t_n
    up = jnp.asarray(rng.random((b_n, lp, hp)), dtype=dtype)
    dn = jnp.asarray(rng.random((b_n, lp, hp)), dtype=dtype)
    xdel_b = jnp.asarray(rng.random((b_n, lp, 1)), dtype=dtype)
    ydel_b = 1.0 - xdel_b

    # each jitted call chains K data-dependent iterations so the per-call
    # dispatch round trip (tens of ms through a remote-TPU tunnel) does not
    # masquerade as kernel time
    k_chain = 32

    def force(x):
        # device-to-host read of one element: the only reliable fence
        # through the remote-TPU tunnel (see run_full in main)
        return np.asarray(jax.device_get(x.ravel()[:8]))

    # --- scattering-source contraction (SOS_FSOURCE_ORDREIG): the fused
    # mix + per-order operator matmul (pallas_ops.scatter_fused)
    res = {}
    flops = 2.0 * b_n * lp * (2 * w) * w
    bpo = t_n // pallas_ops._IB

    # NOTE: every large array must be an ARGUMENT of the jitted fn — a
    # closure constant gets baked into the executable and the remote-TPU
    # compile request (HTTP 413 above ~100 MB)
    @jax.jit
    def scatter_k(u, d, xb2, yb2, mb):
        def body(_, u):
            s = pallas_ops.scatter_fused(u, d, xb2, yb2, mb, bpo,
                                         solver.MATMUL_PRECISION)
            return s[:, :, :hp]
        return jax.lax.fori_loop(0, k_chain, body, u)

    try:
        dt = _timeit(lambda: force(
            scatter_k(up, dn, xdel_b, ydel_b, mboth))) / k_chain
        res["scatter_fused"] = {
            "time_us": round(dt * 1e6, 1),
            "tflops": round(flops / dt / 1e12, 2),
            "mfu_pct": round(100.0 * flops / dt / peak_flops, 1)
            if peak_flops else None,
        }
    except Exception as e:  # CPU or unsupported backend
        res["scatter_fused"] = {"error": str(e)[:80]}

    # --- layer sweep: Pallas affine-scan kernel vs the XLA
    # associative-scan fallback, flattened (S·T) instance batch
    muh = solver._mu_half(inp.mu_pos, hp, dtype)
    h_b = jnp.broadcast_to(
        jnp.pad(inp.h[0], (0, lp - ntp1), mode="edge").astype(dtype)[None],
        (b_n, lp))
    coeffs = pallas_ops.sweep_coeffs(h_b, nt)
    bc = jnp.asarray(rng.random((b_n, hp)), dtype=dtype)
    src_b = jnp.concatenate([up, dn], axis=-1)

    @jax.jit
    def sweep_pallas_k(s, cf, bc2):
        def body(_, s):
            u, d = pallas_ops.sweep_scan_batched(s, *cf, muh, bc2, nt)
            return jnp.concatenate([u, d], axis=-1)
        return jax.lax.fori_loop(0, k_chain, body, s)

    @jax.jit
    def sweep_scan_k(s, hb2, bc2):
        def body(_, s):
            return jax.vmap(solver._sweep_flat_scan,
                            in_axes=(0, None, 0, 0))(hb2, muh, s, bc2)
        return jax.lax.fori_loop(0, k_chain, body, s)

    bytes_min = 2 * b_n * lp * w * dtype.itemsize  # src in + field out
    try:
        dt_p = _timeit(
            lambda: force(sweep_pallas_k(src_b, coeffs, bc))) / k_chain
        res["sweep_pallas"] = {
            "time_us": round(dt_p * 1e6, 1),
            "gbps": round(bytes_min / dt_p / 1e9, 1),
            "hbm_pct": round(100.0 * bytes_min / dt_p / peak_bw, 1)
            if peak_bw else None,
        }
    except Exception as e:  # CPU or unsupported backend
        res["sweep_pallas"] = {"error": str(e)[:80]}
    dt_s = _timeit(lambda: force(sweep_scan_k(src_b, h_b, bc))) / k_chain
    res["sweep_scan"] = {"time_us": round(dt_s * 1e6, 1),
                         "gbps": round(bytes_min / dt_s / 1e9, 1)}
    return res


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compile cache: ~7 distinct executables per cold run
    os.makedirs("/root/.cache/jax_cc", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cc")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from radiativetransfer_sos_tpu import precision, solver

    dev = jax.devices()[0]
    peak_flops, peak_bw = _PEAKS.get(dev.device_kind, (None, None))

    n_terms = 16     # realistic CKD batch (NEXP products run 5..3000 terms)

    # --- end-to-end throughput, f32
    prob = precision.demo_problem(jnp.float32, n_terms=n_terms)

    def run_full():
        res = solver.solve_fourier_batch_jit(prob.inp, prob.opt)
        # host transfer, not just block_until_ready: through the remote-TPU
        # tunnel only an explicit device-to-host read reliably fences the
        # computation (block_until_ready returned in ~100 us here)
        np.asarray(res.emoins)
        return res

    def run_blocked():
        res = solver.solve_fourier_blocked(prob.inp, prob.opt)
        np.asarray(res.emoins)

    res_f32 = run_full()                       # compile + warmup
    dt_full = _timeit(run_full, n_iter=2, warmup=0)
    dt_blocked = _timeit(run_blocked, n_iter=2)
    terms_per_s = n_terms / dt_blocked
    terms_per_s_full = n_terms / dt_full

    # production-scale CKD batch (VERDICT r3 #4): term-chunked blocked
    # dispatch at a realistic 1 cm^-1-product term count
    n_big = 512
    prob_big = precision.demo_problem(jnp.float32, n_terms=n_big)

    def run_big():
        res = solver.solve_fourier_blocked_chunked(prob_big.inp,
                                                   prob_big.opt)
        np.asarray(res.emoins)

    dt_big = _timeit(run_big, n_iter=1, warmup=1)
    terms_per_s_big = n_big / dt_big

    # --- precision gate: term 0 of the f32 production solve vs the f64
    # CPU-backend oracle (TPU-emulated f64 is itself unreliable at this
    # workload — precision.compare_dtypes docstring); term 0 of the
    # n_terms=16 batch is exactly the n_terms=1 problem by construction
    i32 = np.asarray(res_f32.i3bnd, dtype=np.float64)[:1]
    cpu0 = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu0):
        p64 = precision.demo_problem(jnp.float64, n_terms=1)
        i64 = np.asarray(solver.solve_fourier_batch_jit(
            p64.inp, p64.opt).i3bnd)
    gate = {
        "max_rel_err": precision.rel_err(i32, i64),
        "max_abs_err": float(np.max(np.abs(i32 - i64))),
        "ok": bool(np.all(np.abs(i32 - i64) <= precision.F32_ABS_TOL
                          + precision.F32_REL_TOL * np.abs(i64))),
    }

    roofline = kernel_roofline(prob, peak_flops, peak_bw)

    vs_baseline = terms_per_s * FORTRAN_EST_SECONDS_PER_TERM
    print(json.dumps({
        "metric": "ckd_terms_per_s_demo_shape",
        "value": round(terms_per_s, 4),
        "unit": "full SOS solves/s (NT=600, IBORM=80 w/ Fourier early exit,"
                " 30 scat, NBMU=41, f32 validated vs f64)",
        "vs_baseline": round(vs_baseline, 1),
        "vs_baseline_kind": "cost-model estimate only — the reference "
                            "publishes no timings (BASELINE.md); 85 s/term "
                            "at 2 GFLOP/s sustained Fortran",
        "all_orders_terms_per_s": round(terms_per_s_full, 4),
        "fourier_early_exit_speedup": round(dt_full / dt_blocked, 2),
        "terms_per_s_at_512": round(terms_per_s_big, 1),
        "precision_gate": {
            "max_rel_err_f32_vs_cpu_f64": round(gate["max_rel_err"], 8),
            "max_abs_err": round(gate["max_abs_err"], 10),
            "rtol": precision.F32_REL_TOL,
            "atol": precision.F32_ABS_TOL,
            "ok": gate["ok"],
        },
        "device": dev.device_kind,
        "roofline": roofline,
    }))
    if not gate["ok"]:
        raise SystemExit(
            f"precision gate FAILED: f32 drift {gate['max_rel_err']:.3e} "
            f"> {precision.F32_REL_TOL:.0e}")


if __name__ == "__main__":
    main()
