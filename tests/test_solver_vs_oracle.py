"""Differential test: vectorized JAX solver vs loop-level oracle (SOS_OS)."""

import numpy as np
import jax.numpy as jnp

from radiativetransfer_sos_tpu import angles, gsf, kernels, solver
from tests.oracle import fortran_ref as ref


def _signed(grid):
    n = grid.n
    rmu = np.zeros(2 * n + 1)
    rmu[n + 1:] = grid.mu
    rmu[:n] = -grid.mu[::-1]
    rmu[n] = grid.mus
    ga = np.zeros(2 * n + 1)
    ga[n + 1:] = grid.w
    ga[:n] = grid.w[::-1]
    return rmu, ga


def _exp_profile(nt, tau_tot, frac_aer=0.0):
    """Simple cumulative-tau profile with uniform mixing fractions."""
    h = tau_tot * (1.0 - np.exp(-np.linspace(0.0, 6.0, nt + 1))) \
        / (1.0 - np.exp(-6.0))
    h[0] = 0.0
    xdel = np.full(nt + 1, frac_aer)
    ydel = np.full(nt + 1, 1.0 - frac_aer)
    return h, xdel, ydel


def _hg_coeffs(os_nb, g=0.6, pol=0.2):
    """Physically-shaped synthetic phase expansion (Henyey-Greenstein-ish)."""
    l = np.arange(os_nb + 1)
    beta = (2 * l + 1.0) * g ** l
    gamma = np.zeros(os_nb + 1)
    alpha = np.zeros(os_nb + 1)
    zeta = np.zeros(os_nb + 1)
    gamma[2:] = -pol * beta[2:] * 0.5
    alpha[2:] = pol * beta[2:]
    zeta[2:] = 0.3 * pol * beta[2:]
    return alpha, beta, gamma, zeta


def _run_jax(grid, h, xdel, ydel, alpha, beta, gamma, zeta, os_nb, iborm,
             ron, rho, igmax=30, ipolar=True):
    psl, rsl, tsl = gsf.gsf_basis(grid.mu, grid.mus, os_nb, iborm + 1)
    psl, rsl, tsl = map(jnp.asarray, (psl, rsl, tsl))
    k_aer = kernels.aerosol_kernel(psl, rsl, tsl, alpha, beta, gamma, zeta)
    k_mol = kernels.molecular_kernel(psl, rsl, tsl, ron, ipolar)
    inp = solver.SolveInputs(
        h=jnp.asarray(h), xdel=jnp.asarray(xdel), ydel=jnp.asarray(ydel),
        k_aer=k_aer, k_mol=k_mol, mu_pos=jnp.asarray(grid.mu),
        w_pos=jnp.asarray(grid.w), tab=jnp.asarray(grid.mus),
        n0=grid.imus, surface=solver.SurfaceInputs(rho=jnp.asarray(rho)))
    opt = solver.SolveOptions(igmax=igmax, ipolar=ipolar)
    return solver.solve_fourier_jit(inp, opt)


def _run_oracle(grid, h, xdel, ydel, alpha, beta, gamma, zeta, os_nb, iborm,
                ron, rho, igmax=30):
    rmu, ga = _signed(grid)
    return ref.sos_os(grid.n, rmu, ga, os_nb, len(h) - 1, grid.imus + 1,
                      grid.thetas_deg, rho, 0, 0, 1.34, h, xdel.copy(),
                      ydel.copy(), ron, alpha, beta, gamma, zeta,
                      igmax, iborm)


def _compare(res, orc, grid, iborm):
    n = grid.n
    recs = orc["records"]
    i3z = np.asarray(res.i3z)
    # per-order records: oracle tuple is (Q, U, I)
    for s, (q3, u3, i3) in enumerate(recs):
        np.testing.assert_allclose(i3z[s, 0], i3, atol=1e-13, rtol=1e-10,
                                   err_msg=f"I mismatch at IS={s}")
        np.testing.assert_allclose(i3z[s, 1], q3, atol=1e-13, rtol=1e-10,
                                   err_msg=f"Q mismatch at IS={s}")
        np.testing.assert_allclose(i3z[s, 2], u3, atol=1e-13, rtol=1e-10,
                                   err_msg=f"U mismatch at IS={s}")
    # Fourier stop: oracle stops after len(recs) orders
    mask = np.asarray(solver.fourier_stop_mask(res.i3bnd))
    assert mask.sum() == len(recs), (mask.sum(), len(recs))
    np.testing.assert_allclose(float(res.emoins), orc["emoins"], rtol=1e-12)
    np.testing.assert_allclose(float(res.eplus), orc["eplus"], rtol=1e-12)


def test_rayleigh_black_surface():
    grid = angles.make_radiance_grid(35.0, n_gauss=8)
    h, xdel, ydel = _exp_profile(24, 0.25)
    os_nb, iborm, ron = 4, 2, 0.0279
    a, b, g, z = (np.zeros(os_nb + 1),) * 4
    res = _run_jax(grid, h, xdel, ydel, a, b, g, z, os_nb, iborm, ron, 0.0)
    orc = _run_oracle(grid, h, xdel, ydel, a, b, g, z, os_nb, iborm, ron, 0.0)
    _compare(res, orc, grid, iborm)


def test_rayleigh_lambertian():
    grid = angles.make_radiance_grid(50.0, n_gauss=8)
    h, xdel, ydel = _exp_profile(24, 0.35)
    os_nb, iborm, ron = 4, 2, 0.0279
    a, b, g, z = (np.zeros(os_nb + 1),) * 4
    res = _run_jax(grid, h, xdel, ydel, a, b, g, z, os_nb, iborm, ron, 0.3)
    orc = _run_oracle(grid, h, xdel, ydel, a, b, g, z, os_nb, iborm, ron, 0.3)
    _compare(res, orc, grid, iborm)


def test_aerosol_mixture():
    grid = angles.make_radiance_grid(35.0, n_gauss=8)
    h, xdel, ydel = _exp_profile(20, 0.4, frac_aer=0.55)
    os_nb = 12
    iborm = os_nb
    ron = 0.0279
    a, b, g, z = _hg_coeffs(os_nb)
    res = _run_jax(grid, h, xdel, ydel, a, b, g, z, os_nb, iborm, ron, 0.1)
    orc = _run_oracle(grid, h, xdel, ydel, a, b, g, z, os_nb, iborm, ron, 0.1)
    _compare(res, orc, grid, iborm)


def test_flux_conservation_conservative_rayleigh():
    """Energy balance for a conservative Rayleigh atmosphere, black surface:
    direct + diffuse-down + diffuse-up transmittance sums to 1."""
    grid = angles.make_radiance_grid(35.0, n_gauss=12)
    os_nb, iborm, ron = 4, 2, 0.0
    a, b, g, z = (np.zeros(os_nb + 1),) * 4
    # The linear-in-tau source scheme has O(dtau^2) discretization error
    # (like the reference, which keeps dtau <= CTE_TCOUCHE = 0.005);
    # check both the absolute balance and the quadratic convergence rate.
    errs = []
    for nt in (40, 160):
        h, xdel, ydel = _exp_profile(nt, 0.3)
        res = _run_jax(grid, h, xdel, ydel, a, b, g, z, os_nb, iborm, ron,
                       0.0, igmax=100)
        direct = np.exp(h[-1] / grid.mus)
        errs.append(float(res.emoins) + float(res.eplus) + direct - 1.0)
    assert abs(errs[1]) < 3e-5, errs
    assert abs(errs[0] / errs[1]) > 8.0, errs   # ~16x expected
