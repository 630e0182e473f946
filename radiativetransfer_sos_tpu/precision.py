"""Precision policy of the TPU solver, and the f32-vs-f64 gate.

**Policy** (SURVEY.md §7 hard part (d)): the reference is double precision
throughout with stop thresholds down to 1e-50 (``inc/SOS.h:395,418``).
Here:

* all *setup* math (angle grids, GSF bases, Mie, surface matrices, CKD
  interpolation, profile discretization) runs in float64 NumPy;
* the *solver* runs in a configurable field dtype — float32 on TPU for
  speed (the MXU), float64 on CPU for oracle tests;
* convergence thresholds are clamped to the representable range of the
  field dtype: ``SEUIL_VALDIF = 1e-50`` underflows float32, so the
  absolute stop test degrades to an exact-zero test there (``solver``
  clamps it to ``finfo.tiny``), which keeps the semantics — the test
  exists to stop dead fields, not to measure 1e-50 radiances;
* the scattering-source matmul accumulates in the field dtype
  (``preferred_element_type``); on TPU a float32 matmul multiplies in
  bfloat16 by default with float32 accumulation, which the gate below
  validates against float64.

**Gate**: :func:`compare_dtypes` runs the *same* pinned demo-shape solve
(NT=600, IBORM=80, NBMU=41 — the shape of one CKD term of the reference
demo ``exe/runSOS-ABS_demo.ksh``) in float32 and float64 and reports the
worst relative I/Q/U disagreement above an absolute floor.  ``bench.py``
runs it on the TPU and refuses to report a throughput number whose answers
drift; ``tests/test_precision.py`` runs it on CPU.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

#: radiances below this (in normalized sr^-1) are noise for the rel-error
#: metric — the reference itself zeroes |Q|,|U| < 1e-15 at output
#: (src/SOS_TRPHI.F:1212-1218) and demo fields are O(1e-2..1e-1)
REL_FLOOR = 1.0e-6

#: acceptance thresholds for the f32 path vs the CPU f64 oracle on the
#: pinned demo-shape case, in allclose form |f32 - f64| <= ATOL + RTOL*|f64|.
#: Measured on TPU v5e: max abs error 4.5e-4 (HIGHEST matmuls) to 5.1e-4
#: (DEFAULT bf16 matmuls, the production choice — see
#: ``solver.MATMUL_PRECISION``); the bounds carry margin over both and
#: still catch the associative-scan-on-TPU drift failure mode seen during
#: bring-up (2e-1).
F32_REL_TOL = 5.0e-3
F32_ABS_TOL = 5.0e-6


class DemoProblem(NamedTuple):
    inp: object           # solver.SolveInputs (term-batched)
    opt: object           # solver.SolveOptions
    n_terms: int


def demo_problem(dtype, n_gauss: int = 40, nt: int = 600, os_nb: int = 80,
                 igmax: int = 30, n_terms: int = 4,
                 rho: float = 0.1) -> DemoProblem:
    """Pinned demo-shape solve inputs (one CKD term of the reference demo,
    ``exe/runSOS-ABS_demo.ksh`` with ``src/SOS.F:546-550`` bounds).

    Setup math is float64; operands are cast to ``dtype`` at the end (the
    production precision policy).  Deterministic: seeded profile jitter.
    """
    import jax.numpy as jnp

    from . import angles, gsf, kernels, solver

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
    h_b = h0[None, :] * (1.0 + 0.3 * rng.random((n_terms, 1)))
    xdel = np.full((n_terms, nt + 1), 0.45)
    ydel = 1.0 - xdel

    inp = solver.SolveInputs(
        h=jnp.asarray(h_b, dtype=dtype),
        xdel=jnp.asarray(xdel, dtype=dtype),
        ydel=jnp.asarray(ydel, dtype=dtype),
        k_aer=k_aer, k_mol=k_mol,
        mu_pos=jnp.asarray(grid.mu, dtype=dtype),
        w_pos=jnp.asarray(grid.w, dtype=dtype),
        tab=jnp.asarray(grid.mus, dtype=dtype), n0=grid.imus,
        surface=solver.SurfaceInputs(rho=jnp.asarray(rho, dtype=dtype)))
    opt = solver.SolveOptions(igmax=igmax)
    return DemoProblem(inp=inp, opt=opt, n_terms=n_terms)


def _solve(problem: DemoProblem):
    from . import solver

    res = solver.solve_fourier_batch_jit(problem.inp, problem.opt)
    return np.asarray(res.i3bnd, dtype=np.float64)


def rel_err(a: np.ndarray, b: np.ndarray,
            floor: float = REL_FLOOR) -> float:
    """Worst |a-b| / max(|b|, floor) over the Stokes records."""
    return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), floor)))


def compare_dtypes(n_gauss: int = 40, nt: int = 600, os_nb: int = 80,
                   igmax: int = 30, n_terms: int = 1) -> dict:
    """Solve the pinned case in f32 (production backend) and f64 (host CPU)
    and report the disagreement.

    The f64 arm ALWAYS runs on the CPU backend: TPU float64 is emulated
    and measured unreliable at this workload (abs error 4e-2 vs CPU f64 on
    the demo shape, dominated by ``lax.associative_scan`` — the in-process
    CPU backend reproduces the standalone CPU result bit-for-bit).  The
    f32 arm runs wherever production runs (the default backend), i.e. the
    Pallas sweep on TPU.

    Returns ``{"max_rel_err", "max_abs_err", "ok"}``; ``ok`` applies the
    allclose criterion (:data:`F32_REL_TOL`, :data:`F32_ABS_TOL`).
    """
    import jax
    import jax.numpy as jnp

    kw = dict(n_gauss=n_gauss, nt=nt, os_nb=os_nb, igmax=igmax,
              n_terms=n_terms)
    # scope x64 to the f64 arm: global x64 changes index dtypes inside the
    # Pallas sweep kernel (i32/i64 mixing), and the f32 production path
    # must be measured exactly as it ships
    cpu0 = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu0):
        i64 = _solve(demo_problem(jnp.float64, **kw))
    i32 = _solve(demo_problem(jnp.float32, **kw))
    err = rel_err(i32, i64)
    ok = bool(np.all(np.abs(i32 - i64)
                     <= F32_ABS_TOL + F32_REL_TOL * np.abs(i64)))
    return {
        "max_rel_err": err,
        "max_abs_err": float(np.max(np.abs(i32 - i64))),
        "ok": ok,
    }
