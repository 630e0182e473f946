"""Benchmark: full successive-orders RT solves per second at demo scale.

Runs the flagship polarized SOS solve (NBMU=40+sun angles, NT=600 layers,
OS_NB=IBORM=80 Fourier orders, 30 scattering orders — the shape of one CKD
term of the reference demo, ``exe/runSOS-ABS_demo.ksh`` with
``src/SOS.F:546-550`` bounds) batched over a block of CKD terms, in float32
on the attached TPU, and prints one JSON line.

``vs_baseline``: the reference publishes no timings (BASELINE.md); the ratio
is against a documented cost-model estimate of the single-core Fortran
reference at identical shapes: ~1.7e11 FLOP/term in the
``SOS_FSOURCE_ORDREIG`` contraction alone (80 orders x 30 scatterings x
600 layers x (2*41)^2 x 18 terms x 2), at an optimistic 2 GFLOP/s sustained
=> ~85 s/term.
"""

import json
import time

import numpy as np

FORTRAN_EST_SECONDS_PER_TERM = 85.0


def main():
    import jax
    import jax.numpy as jnp

    from radiativetransfer_sos_tpu import angles, gsf, kernels, solver

    dtype = jnp.float32
    n_gauss, nt, os_nb, igmax = 40, 600, 80, 30
    n_terms = 4          # CKD-term batch per step

    grid = angles.make_radiance_grid(35.0, n_gauss=n_gauss)
    psl, rsl, tsl = gsf.gsf_basis(grid.mu, grid.mus, os_nb, os_nb + 1)
    psl, rsl, tsl = (jnp.asarray(a, dtype=dtype) for a in (psl, rsl, tsl))
    ll = np.arange(os_nb + 1)
    beta = (2 * ll + 1.0) * 0.7 ** ll
    gamma = np.where(ll >= 2, -0.1 * beta, 0.0)
    alpha = np.where(ll >= 2, 0.2 * beta, 0.0)
    zeta = np.where(ll >= 2, 0.05 * beta, 0.0)
    k_aer = kernels.aerosol_kernel(psl, rsl, tsl, alpha, beta, gamma, zeta)
    k_mol = kernels.molecular_kernel(psl, rsl, tsl, 0.0279)

    h0 = np.linspace(0.0, 1.0, nt + 1) ** 1.2 * 0.5
    rng = np.random.default_rng(0)
    h_b = jnp.asarray(h0[None, :] * (1.0 + 0.3 * rng.random((n_terms, 1))),
                      dtype=dtype)
    xdel = jnp.full((n_terms, nt + 1), 0.45, dtype=dtype)
    ydel = 1.0 - xdel
    opt = solver.SolveOptions(igmax=igmax)

    def step_fn(h, xd, yd):
        inp = solver.SolveInputs(
            h=h, xdel=xd, ydel=yd, k_aer=k_aer, k_mol=k_mol,
            mu_pos=jnp.asarray(grid.mu, dtype=dtype),
            w_pos=jnp.asarray(grid.w, dtype=dtype),
            tab=jnp.asarray(grid.mus, dtype=dtype), n0=grid.imus,
            surface=solver.SurfaceInputs(rho=jnp.asarray(0.1, dtype=dtype)))
        # single flattened (term x Fourier-order) batch — a nested vmap
        # compiles ~80x slower on TPU
        res = solver.solve_fourier_batch(inp, opt)
        return res.i3z, res.emoins, res.eplus

    step = jax.jit(step_fn)

    # compile + warmup; fetch to host to defeat async dispatch
    out = step(h_b, xdel, ydel)
    np.asarray(out[1])

    n_iter = 3
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(h_b, xdel, ydel)
        np.asarray(out[1])
    dt = (time.perf_counter() - t0) / n_iter

    terms_per_s = n_terms / dt
    vs_baseline = terms_per_s * FORTRAN_EST_SECONDS_PER_TERM
    print(json.dumps({
        "metric": "ckd_terms_per_s_demo_shape",
        "value": round(terms_per_s, 4),
        "unit": "full SOS solves/s (NT=600, 81 Fourier orders, 30 scat, "
                "NBMU=41, f32)",
        "vs_baseline": round(vs_baseline, 1),
    }))


if __name__ == "__main__":
    main()
